package graft.tools

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic hash-sampled sub-corpus of a derived-scale fixture
  * (VERDICT r6 #5: give the sf1.0 oracle-capacity exclusions a hard
  * gate at tractable DuckDB volume).
  *
  * documents/embeddings are sampled on the BASE id (`id mod MakeScale
  * .OFF`), so all `copies` key-shifted near-dup twins of a selected
  * base doc survive together — the 90%-dup-family structure of the
  * derived corpus is preserved exactly, at ~4/37 the volume. Sampling
  * on raw id would break dup families apart and quietly soften the
  * dedup queries' hardest input. Base ids 0..3 pass `% 37 < 4`, so the
  * similarity probes (`vec_id < nQueries`) stay populated.
  *
  * All other tables copy verbatim (the excluded query families touch
  * only documents/embeddings; the rest are re-checked so the whole
  * registry can run against the sampled dir).
  *
  * Usage: runMain graft.tools.MakeSample [srcDir] [outDir] [mod] [keep]
  */
object MakeSample {
  def main(args: Array[String]): Unit = {
    val src = args.lift(0).getOrElse("/tmp/sfdev1.0")
    val out = args.lift(1).getOrElse("/tmp/sfdev1.0s")
    val mod = args.lift(2).map(_.toInt).getOrElse(37)
    val keep = args.lift(3).map(_.toInt).getOrElse(4)
    val OFF = 100000000L // MakeScale's key-shift stride
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def copy(t: String): Long = {
      val df = spark.read.parquet(s"$src/$t.parquet")
      df.write.mode(SaveMode.Overwrite).parquet(s"$out/$t.parquet")
      df.count()
    }
    def sampled(t: String, idCol: String): Long = {
      val df = spark.read.parquet(s"$src/$t.parquet")
        .where(pmod(pmod(col(idCol), lit(OFF)), lit(mod.toLong)) < lit(keep.toLong))
      df.write.mode(SaveMode.Overwrite).parquet(s"$out/$t.parquet")
      df.count()
    }

    val counts = Seq(
      "documents" -> sampled("documents", "doc_id"),
      "embeddings" -> sampled("embeddings", "vec_id")) ++
      Seq("region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events").map(t => t -> copy(t))
    println(counts.map { case (t, n) => s""""$t":$n""" }
      .mkString("{\"sampled\":\"" + out + "\",", ",", "}"))
    spark.stop()
  }
}
