package graft.tools

import org.apache.spark.sql.{SparkSession, functions => F}

/** Stage-wise wall-clock of pipeline_select_e2e (round-15 perf
  * adjudication): which of the composed stages carries the cost.
  * Usage: runMain graft.tools.ProfileSelectE2e [sfDir]
  */
object ProfileSelectE2e {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[T](n: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $n: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    import graft.operators.{Dsir, Similarity, TextAnalysis, TrainedIvfCentroids}
    import graft.Tables
    val docs = Tables.documents(spark, dir)
    val keepOld = t("gopher-collapsed (the 19s form)") {
      val k = TextAnalysis.gopherRules(docs).where(F.col("keep"))
        .select(F.col("doc_id")); k.count(); k
    }
    val keep = t("gopher-bound (gopherKeepExpr)") {
      val k = docs.where(TextAnalysis.gopherKeepExpr)
        .select(F.col("doc_id")); k.count(); k
    }
    if (sys.env.contains("PROF_EXPLAIN")) {
      println("==== filtered gopher plan ====")
      keep.explain("formatted")
    }
    val emb = Similarity.emb(spark, dir)
    val kept = t("semDedup") {
      val x = Similarity.semDedup(emb, TrainedIvfCentroids.cells, 0.4)
      x.count(); x
    }
    val dropped = t("dropped-anti") {
      val d = emb.select(F.col("vec_id"))
        .join(kept.select(F.col("vec_id")), Seq("vec_id"), "left_anti")
      d.count(); d
    }
    val surv = t("survivors+ckpt") {
      docs.join(keep, "doc_id")
        .join(dropped.select(F.col("vec_id").as("doc_id")),
          Seq("doc_id"), "left_anti")
        .localCheckpoint(true)
    }
    t("dsir-on-ckpt")(Dsir.select(surv, "en", 64, 20).count())
    t("registered-full")(
      graft.queries.PipelineQueries
        .queries("pipeline_select_e2e")(spark, dir).count())
    t("registered-warm")(
      graft.queries.PipelineQueries
        .queries("pipeline_select_e2e")(spark, dir).count())
  }
}
