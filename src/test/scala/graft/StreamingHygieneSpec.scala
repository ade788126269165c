package graft

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._
import graft.queries.StreamingQueries

/** Operational contracts of the streaming sink queries (VERDICT r6 item 7):
  *  - the single-data-batch pin in stream_dedup_sink reads the query's own
  *    StreamingQueryProgress, so a source-batching regression fails loudly
  *    instead of silently dropping late second copies;
  *  - staging + checkpoint temp dirs are deleted EAGERLY when the query
  *    terminates (a bench run used to leak a full fixture copy per
  *    invocation); only result-sized sink dirs persist until the JVM
  *    shutdown hook removes them.
  */
class StreamingHygieneSpec extends SparkSpec {

  private def tmpDirs(prefix: String): Set[String] =
    Files.list(Paths.get(System.getProperty("java.io.tmpdir"))).iterator().asScala
      .map(_.getFileName.toString).filter(_.startsWith(prefix)).toSet

  test("stream_dedup_sink: single-batch pin holds and output collapses the 2x staging") {
    val got = StreamingQueries.queries("stream_dedup_sink")(spark, sf)
    val want = Tables.events(spark, sf).count()
    // the require(dataBatches == 1) inside runToParquet already ran; a
    // batching regression would have thrown before we got a DataFrame
    assert(got.count() === want)
  }

  test("restart from checkpoint resumes exactly-once into the file sink") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.streaming.Trigger
    import graft.streaming.EventStream
    // batch A = the events fixture; batch B = the same rows with shifted
    // ids, landed in the source dir only AFTER the first run terminates —
    // so run 2 proves the checkpoint: it must process B and ONLY B
    val src = Files.createTempDirectory("recov_src")
    val out = Files.createTempDirectory("recov_out").toString
    val cp = Files.createTempDirectory("recov_cp").toString
    val ev = Tables.events(spark, sf)
    val n = ev.count()
    ev.select(col("event_id"), col("ts_ns").as("ts"), col("user_id"),
        col("event_type"), col("value"), col("props"))
      .coalesce(1).write.mode("append").parquet(src.toString)
    def runOnce(): org.apache.spark.sql.streaming.StreamingQueryProgress = {
      val q = EventStream.readEvents(spark, src.toString)
        .select(col("event_id"), col("user_id"), col("event_type"))
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", cp)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      q.recentProgress.filter(_.numInputRows > 0).last
    }
    assert(runOnce().numInputRows == n)
    // crash-and-recover: new files arrive while the query is down
    ev.select((col("event_id") + lit(10000000L)).as("event_id"),
        col("ts_ns").as("ts"), col("user_id"), col("event_type"),
        col("value"), col("props"))
      .coalesce(1).write.mode("append").parquet(src.toString)
    val p2 = runOnce()
    // only the NEW file is processed — batch A is not replayed
    assert(p2.numInputRows == n, s"restart reprocessed: ${p2.numInputRows}")
    val sink = spark.read.parquet(out)
    assert(sink.count() == 2 * n)
    assert(sink.select("event_id").distinct().count() == 2 * n,
      "duplicate event_ids in the sink after restart")
  }

  test("left-outer join null-extension comes from watermark eviction, not flush") {
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.streaming.Trigger
    import graft.streaming.EventStream
    // stage fixture + far-future marker (the stream_left_join_sink
    // staging, inlined): the marker advances both side watermarks past
    // every click's match deadline
    val src = Files.createTempDirectory("lj_src")
    val cp = Files.createTempDirectory("lj_cp").toString
    val ev = Tables.events(spark, sf)
    ev.select(col("event_id"), col("ts_ns").as("ts"), col("user_id"),
        col("event_type"), col("value"), col("props"))
      .coalesce(1).write.mode("append").parquet(src.toString)
    val markNs = ev.agg(max(col("ts_ns"))).head().getLong(0) +
      30L * 24 * 3600 * 1000000000L
    import spark.implicits._
    Seq((-1L, markNs, -1L, "_mark", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("append").parquet(src.toString)
    // per-micro-batch (batchId, matched rows, null-extended rows)
    val batches = scala.collection.mutable.ArrayBuffer[(Long, Long, Long)]()
    val q = EventStream.clickPurchaseLeftJoin(
        EventStream.readEvents(spark, src.toString))
      .writeStream.outputMode("append")
      .foreachBatch { (df: DataFrame, id: Long) =>
        val real = df.where(col("user_id") >= 0).cache()
        val m = real.where(col("p_event").isNotNull).count()
        val n = real.where(col("p_event").isNull).count()
        real.unpersist()
        batches.synchronized { batches += ((id, m, n)) }
        ()
      }
      .option("checkpointLocation", cp)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val nullBatches = batches.filter(_._3 > 0).map(_._1)
    val matchBatches = batches.filter(_._2 > 0).map(_._1)
    assert(matchBatches.nonEmpty, "no matched rows emitted")
    assert(nullBatches.nonEmpty, "no null-extended rows emitted at all")
    // eviction semantics: every null-extension lands strictly AFTER the
    // last match emission — a batch-end flush would emit them together
    assert(nullBatches.min > matchBatches.max,
      s"null rows emitted in/before a match batch: $batches")
    // completeness: eviction released exactly the batch answer's
    // unmatched clicks
    val clicks = ev.where(col("event_type") === "click")
      .select(col("event_id").as("c_event"), col("user_id"),
        col("ts").as("c_ts"))
    val purch = ev.where(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"))
    val expUnmatched = clicks.join(purch, expr(
        "user_id = p_user AND p_ts BETWEEN c_ts - INTERVAL 1 HOUR AND c_ts"),
        "left_anti").count()
    assert(batches.map(_._3).sum == expUnmatched,
      s"eviction emitted ${batches.map(_._3).sum} nulls, batch says $expUnmatched")
  }

  test("full-outer join: BOTH sides' null-extensions come from eviction and match the batch anti-joins") {
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.streaming.Trigger
    import graft.streaming.EventStream
    val src = Files.createTempDirectory("fj_src")
    val cp = Files.createTempDirectory("fj_cp").toString
    val ev = Tables.events(spark, sf)
    ev.select(col("event_id"), col("ts_ns").as("ts"), col("user_id"),
        col("event_type"), col("value"), col("props"))
      .coalesce(1).write.mode("append").parquet(src.toString)
    val markNs = ev.agg(max(col("ts_ns"))).head().getLong(0) +
      30L * 24 * 3600 * 1000000000L
    import spark.implicits._
    Seq((-1L, markNs, -1L, "_mark", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("append").parquet(src.toString)
    // per-micro-batch (batchId, matched, left-null = unmatched purchase,
    // right-null = unmatched click)
    val batches = scala.collection.mutable.ArrayBuffer[(Long, Long, Long, Long)]()
    val q = EventStream.clickPurchaseFullJoin(
        EventStream.readEvents(spark, src.toString))
      .writeStream.outputMode("append")
      .foreachBatch { (df: DataFrame, id: Long) =>
        val real = df.where(col("uid") >= 0).cache()
        val m = real.where(col("c_event").isNotNull && col("p_event").isNotNull).count()
        val ln = real.where(col("c_event").isNull).count()
        val rn = real.where(col("p_event").isNull).count()
        real.unpersist()
        batches.synchronized { batches += ((id, m, ln, rn)) }
        ()
      }
      .option("checkpointLocation", cp)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val matchBatches = batches.filter(_._2 > 0).map(_._1)
    assert(matchBatches.nonEmpty, "no matched rows emitted")
    for ((kind, nullBatches) <- Seq(
        "unmatched-purchase" -> batches.filter(_._3 > 0).map(_._1),
        "unmatched-click" -> batches.filter(_._4 > 0).map(_._1))) {
      assert(nullBatches.nonEmpty, s"no $kind rows emitted at all")
      assert(nullBatches.min > matchBatches.max,
        s"$kind rows emitted in/before a match batch: $batches")
    }
    val clicks = ev.where(col("event_type") === "click")
      .select(col("event_id").as("c_event"), col("user_id"),
        col("ts").as("c_ts"))
    val purch = ev.where(col("event_type") === "purchase")
      .select(col("event_id").as("p_event"), col("user_id").as("p_user"),
        col("ts").as("p_ts"))
    val cond = expr(
      "user_id = p_user AND p_ts BETWEEN c_ts - INTERVAL 1 HOUR AND c_ts")
    val expUnmatchedClicks = clicks.join(purch, cond, "left_anti").count()
    val expUnmatchedPurch = purch.join(clicks, cond, "left_anti").count()
    assert(batches.map(_._4).sum == expUnmatchedClicks,
      s"click-side eviction emitted ${batches.map(_._4).sum}, batch says $expUnmatchedClicks")
    assert(batches.map(_._3).sum == expUnmatchedPurch,
      s"purchase-side eviction emitted ${batches.map(_._3).sum}, batch says $expUnmatchedPurch")
  }

  test("streaming subseq matcher emits windows that SPAN micro-batch boundaries") {
    import org.apache.spark.sql.functions._
    val got = StreamingQueries.queries("stream_subseq_sink")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(got.nonEmpty, "fixture must produce matches (the self-window at least)")
    // reconstruct the per-user global positions of the time-tertile
    // boundaries: a match whose window [pos, pos+7] crosses one can only
    // have been emitted from the carried O(m) tail state
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("ts_ns"), col("event_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val n = ev.length
    // rank by (ts_us, event_id) — the MATCHER'S staging order (see the
    // StreamingQueries staging comment): with nano-precision fixtures
    // two events can share ts_us with opposite ns/id order, and a
    // ns-ranked reconstruction would disagree with the actual staged
    // tertile split exactly at such a boundary (review finding)
    val tertOf = ev.sortBy(e => (e._2 / 1000, e._3)).zipWithIndex.map { case (e, i) =>
      // ntile(3): first n mod 3 tiles take ceil(n/3)
      val (big, rem) = (n / 3 + 1, n % 3)
      val t = if (i < big.toLong * rem) i / big + 1
        else ((i - big * rem) / (n / 3)) + rem + 1
      (e._1, e._3) -> t
    }.toMap
    val posTert = ev.groupBy(_._1).map { case (u, es) =>
      u -> es.sortBy(e => (e._2 / 1000, e._3)).map(e => tertOf((u, e._3)))
    }
    val spanning = got.filter { case (u, pos) =>
      val ts = posTert(u).slice(pos - 1, pos + 7)
      ts.distinct.length > 1
    }
    assert(spanning.nonEmpty,
      s"no emitted match spans a batch boundary — the state contract is unexercised (${got.length} matches)")
  }

  test("streaming CUSUM carries alarm accumulation ACROSS micro-batch boundaries") {
    import org.apache.spark.sql.functions._
    val got = StreamingQueries.queries("stream_cusum_sink")(spark, sf)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // sequential replay at the GLOBAL target — the online detector's
    // definition; equality across the 3-tertile staging proves the
    // per-user state composed across boundaries
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("ts_ns"), col("event_id"), col("value"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val cents = ev.map(e => math.floor(e._4 * 100.0 + 0.5).toLong)
    val mu0 = cents.sum / cents.length
    val (k, h) = (2000L, 25000L)
    val expect = ev.groupBy(_._1).map { case (u, es) =>
      val xs = es.sortBy(e => (e._2 / 1000, e._3))
        .map(e => math.floor(e._4 * 100.0 + 0.5).toLong)
      var s = 0L; var na = 0L; var fp = 0L; var pos = 0L; var smax = 0L
      xs.foreach { x =>
        val s1 = math.max(0L, s + x - mu0 - k); pos += 1
        if (s1 > h) { if (fp == 0L) fp = pos; na += 1; s = 0L } else s = s1
        smax = math.max(smax, s1)
      }
      u -> (xs.length.toLong, na, fp, smax)
    }
    assert(got == expect, "streamed CUSUM state diverged from the sequential replay")
    assert(got.values.exists(_._2 > 0L) && got.values.exists(_._2 == 0L),
      "fixture must produce both alarmed and quiet users")
    // non-vacuity of the STATE contract: some user's first alarm lands
    // beyond its batch-1 share, so its S accumulation crossed a staged
    // tertile boundary (tertile reconstruction in the staging order —
    // (ts_us, event_id), the subseq test's rule)
    val n = ev.length
    val tertOf = ev.sortBy(e => (e._2 / 1000, e._3)).zipWithIndex.map { case (e, i) =>
      val (big, rem) = (n / 3 + 1, n % 3)
      val t = if (i < big.toLong * rem) i / big + 1
        else ((i - big * rem) / (n / 3)) + rem + 1
      (e._1, e._3) -> t
    }.toMap
    val b1Count = ev.groupBy(_._1).map { case (u, es) =>
      u -> es.count(e => tertOf((u, e._3)) == 1).toLong
    }
    assert(got.exists { case (u, (_, na, fp, _)) => na > 0 && fp > b1Count(u) },
      "every first alarm fired inside batch 1 — the cross-batch state is unexercised")
  }

  test("continuous semDedup ingest equals the batch path row-for-row") {
    // the stream ran ≥2 genuine micro-batches (the query asserts it),
    // yet the final state must be indistinguishable from the one-shot
    // batch dedup — micro-batch boundaries are unobservable because
    // the drop rule is order-free and monotone
    val streamed = StreamingQueries.queries("stream_semdedup_sink")(spark, sf)
      .collect().toSeq
    val batch = graft.queries.SimilarityQueries
      .queries("dedup_semantic")(spark, sf).collect().toSeq
    assert(streamed == batch,
      s"streamed state diverged from the batch dedup: ${streamed.size} vs ${batch.size} rows")
  }

  test("staging and checkpoint dirs are removed eagerly, sinks deferred to shutdown") {
    val before = Map(
      "graft_stream_src" -> tmpDirs("graft_stream_src"),
      "graft_stream_dup" -> tmpDirs("graft_stream_dup"),
      "graft_stream_cp" -> tmpDirs("graft_stream_cp"))
    StreamingQueries.queries("stream_window_sink")(spark, sf).count()
    StreamingQueries.queries("stream_dedup_sink")(spark, sf).count()
    for ((prefix, was) <- before) {
      val now = tmpDirs(prefix)
      assert(now.subsetOf(was), s"$prefix dirs leaked: ${now -- was}")
    }
  }

  test("topk counters accumulate ACROSS micro-batches to the batch counts") {
    import spark.implicits._
    import graft.streaming.EventStream
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.streaming.OutputMode
    val dir = Files.createTempDirectory("graft_topk_acc")
    try {
      val d1 = Seq(("a", 1L), ("a", 1L), ("b", 2L)).toDF("event_type", "user_id")
      val d2 = Seq(("a", 1L), ("b", 2L), ("b", 3L)).toDF("event_type", "user_id")
      d1.coalesce(1).write.mode("append").parquet(dir.toString)
      d2.coalesce(1).write.mode("append").parquet(dir.toString)
      // one file per trigger forces >= 2 micro-batches: the state must
      // carry counts between them, not recompute per batch
      val stream = spark.readStream.schema(d1.schema)
        .option("maxFilesPerTrigger", "1").parquet(dir.toString)
      val sink = EventStream.runToMemory(spark,
        EventStream.pairCounts(stream).toDF(),
        "graft_topk_acc_sink", OutputMode.Update())
      val fin = sink.groupBy($"event_type", $"user_id")
        .agg(max($"n").as("n")).collect()
        .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(fin == Map(("a", 1L) -> 3L, ("b", 2L) -> 2L, ("b", 3L) -> 1L),
        s"final counters diverged from batch counts: $fin")
      // the hot key must have emitted an intermediate update below its
      // final count — proof the counter crossed a batch boundary
      val ups = sink.where($"event_type" === "a" && $"user_id" === 1L)
        .select($"n").collect().map(_.getLong(0)).sorted
      assert(ups.length >= 2 && ups.last == 3L && ups.head < 3L,
        s"expected incremental updates for (a,1), got ${ups.toSeq}")
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(dir.toString)).deleteRecursively()
    }
  }
}
