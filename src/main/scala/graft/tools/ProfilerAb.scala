package graft.tools

import org.apache.spark.sql.SparkSession

/** The promised q_table_profile vs q_table_profile_sketch A/B
  * (BASELINE.md round-13): times the exact multi-distinct profiler,
  * the gated sketch form (exactPin = true — carries the exact arm for
  * the within_5pct pin), and the PRODUCTION sketch form (exactPin =
  * false — no Expand anywhere) in one JVM, cold then warm. Run via
  * tools/run_main.sh, 3 fresh-JVM repeats for the isolated protocol.
  * Usage: runMain graft.tools.ProfilerAb [sfDir]
  */
object ProfilerAb {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Tables.orders(spark, sfDir).count() // warm the scan

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val arms: Seq[(String, () => Unit)] = Seq(
      "exact (q_table_profile)" ->
        (() => graft.queries.QualityQueries
          .queries("q_table_profile")(spark, sfDir).count(): Unit),
      "sketch gated (exactPin=true)" ->
        (() => graft.queries.QualityQueries
          .profileSketch(graft.Tables.orders(spark, sfDir), exactPin = true)
          .count(): Unit),
      "sketch production (exactPin=false)" ->
        (() => graft.queries.QualityQueries
          .profileSketch(graft.Tables.orders(spark, sfDir), exactPin = false)
          .count(): Unit))
    arms.foreach { case (label, f) =>
      val cold = time(f()); val warm = time(f())
      println(f"[profiler-ab] $label: cold $cold%.2f s, warm $warm%.2f s")
    }
    spark.stop()
  }
}
