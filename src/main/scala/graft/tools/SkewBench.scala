package graft.tools

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Adjudicates `q_skew_join`'s salting under REAL skew (VERDICT r6 #6).
  *
  * The oracle gate proves salting is result-invisible on benign data;
  * this tool proves it WINS when a hot key exists. Fixture: 10×-unioned
  * sf0.1 lineitem (~6M rows) with l_suppkey remapped so `hotPct`% of all
  * rows land on ONE supplier key — the classic "null-ish default key"
  * shape that makes one sort-merge-join task carry half the table. The
  * build side is a 1 000-key supplier dim; auto-broadcast is disabled in
  * every arm because broadcast-join IS the answer when the dim fits —
  * salting only matters for the shuffle-join regime.
  *
  * Three arms, interleaved repeats (same JVM, fresh shuffle per run):
  *   plain      — sort-merge join under DEFAULT AQE. At this volume the
  *                hot partition (~150 MB) sits under AQE's 256 MB skew
  *                threshold, so nothing splits it: one straggler task.
  *   plain_aqe  — same join with the AQE skew-split thresholds lowered
  *                (factor 2 / 16 MB / 8 MB advisory) to emulate the
  *                100-TB regime where the hot partition DOES trip the
  *                defaults. Shows what the runtime re-planner buys.
  *   salted     — SkewJoin.saltedInnerJoin (S=32): the hot key's rows
  *                spread over 32 reducers at PLAN time, no thresholds.
  *
  * Prints one JSON line with per-arm repeats + medians and the identity
  * check (all arms must agree on the aggregate). Results recorded in
  * BASELINE.md.
  *
  * Usage: tools/run_main.sh graft.tools.SkewBench [srcDir] [workDir]
  */
object SkewBench {
  def main(args: Array[String]): Unit = {
    val src = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val work = args.lift(1).getOrElse("/tmp/graft_skew")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // ---- fixture: copies×600k probe rows, hotPct% on suppkey 1 ----
    val copies = args.lift(2).map(_.toInt).getOrElse(10)
    val keys = 1000
    val hotPct = args.lift(3).map(_.toInt).getOrElse(80)
    val OFF = 100000000L
    val base = spark.read.parquet(s"$src/lineitem.parquet")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
    val probe = (0 until copies).map { i =>
      base.withColumn("l_orderkey", col("l_orderkey") + lit(i * OFF))
    }.reduce(_ unionAll _)
      // deterministic Zipf-ish remap: hotPct% of rows → key 1, the rest
      // spread uniformly over the remaining keys
      .withColumn("suppkey",
        when(pmod(hash(col("l_orderkey"), col("l_linenumber")), lit(100))
          < lit(hotPct), lit(1L))
        .otherwise(pmod(hash(col("l_linenumber"), col("l_orderkey")),
          lit(keys.toLong - 1)) + lit(2L)))
    probe.write.mode(SaveMode.Overwrite).parquet(s"$work/probe.parquet")
    spark.range(1, keys + 1).toDF("suppkey")
      .withColumn("s_nationkey", pmod(col("suppkey"), lit(25L)))
      .write.mode(SaveMode.Overwrite).parquet(s"$work/dim.parquet")

    val probeT = spark.read.parquet(s"$work/probe.parquet")
    val dimT = spark.read.parquet(s"$work/dim.parquet")

    def agg(joined: DataFrame): DataFrame =
      joined.groupBy(col("s_nationkey"))
        .agg(count(lit(1)).as("n_items"),
          round(sum(col("l_quantity")), 2).as("sum_qty"))

    def plain(): DataFrame = agg(probeT.join(dimT, "suppkey"))
    def salted(): DataFrame = agg(graft.operators.SkewJoin.saltedInnerJoin(
      probeT, dimT, "suppkey", salts = 32,
      saltFrom = Seq("l_orderkey", "l_linenumber")))

    // broadcast off in every arm: salting targets the shuffle-join regime
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")

    def aqeSkew(on: Boolean): Unit = if (on) {
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16MB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8MB")
    } else {
      spark.conf.unset("spark.sql.adaptive.skewJoin.skewedPartitionFactor")
      spark.conf.unset(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes")
      spark.conf.unset("spark.sql.adaptive.advisoryPartitionSizeInBytes")
    }

    def time(f: () => DataFrame): Double = {
      val t0 = System.nanoTime(); f().count(); (System.nanoTime() - t0) / 1e9
    }

    // identity: every arm must produce the same aggregate
    val expect = plain().collect().map(_.toString).sorted.toSeq
    aqeSkew(on = true)
    val aqeDf = plain()
    val idAqe = aqeDf.collect().map(_.toString).sorted.toSeq == expect
    // post-execution AQE final plan: did OptimizeSkewedJoin actually fire?
    if (sys.env.contains("SKEW_EXPLAIN"))
      System.err.println(aqeDf.queryExecution.executedPlan.toString
        .linesIterator.filter(l =>
          l.contains("Join") || l.contains("skew")).mkString("\n"))
    aqeSkew(on = false)
    val idSalt = salted().collect().map(_.toString).sorted.toSeq == expect

    val reps = 3
    val t = scala.collection.mutable.Map(
      "plain" -> Vector.empty[Double],
      "plain_aqe" -> Vector.empty[Double],
      "salted" -> Vector.empty[Double])
    // one unmeasured warmup pass per arm (JIT/codegen), then interleave
    time(plain); time(salted)
    (1 to reps).foreach { _ =>
      aqeSkew(on = false)
      t("plain") :+= time(plain)
      t("salted") :+= time(salted)
      aqeSkew(on = true)
      t("plain_aqe") :+= time(plain)
      aqeSkew(on = false)
    }
    def med(v: Vector[Double]) = v.sorted.apply(v.size / 2)
    def fmt(v: Vector[Double]) = v.map(x => f"$x%.2f").mkString("[", ",", "]")
    println(s"""{"fixture":{"rows":${probeT.count()},"keys":$keys,"hot_pct":$hotPct},""" +
      s""""identity":{"plain_aqe":$idAqe,"salted":$idSalt},""" +
      s""""sec":{"plain":${fmt(t("plain"))},"plain_aqe":${fmt(t("plain_aqe"))},"salted":${fmt(t("salted"))}},""" +
      s""""median":{"plain":${f"${med(t("plain"))}%.2f"},"plain_aqe":${f"${med(t("plain_aqe"))}%.2f"},"salted":${f"${med(t("salted"))}%.2f"}},""" +
      s""""speedup_salted_vs_plain":${f"${med(t("plain")) / med(t("salted"))}%.2f"}}""")
    spark.stop()
  }
}
