package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object AlsProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val ev = graft.Tables.events(spark, args(0))
      .select(col("user_id"), col("event_type"),
        floor(col("value") * lit(100.0) + lit(0.5)).cast("long").as("rc"))
      .groupBy(col("user_id"), col("event_type"))
      .agg(sum(col("rc")).as("r_c")).localCheckpoint(true)
    val res = graft.operators.AlsRank2.fit(ev, maxAlts = 12)
    println("ALT=" + res.alternations + " BEST=" + res.bestAlt + " CONV=" + res.converged)
    res.objHistory.zipWithIndex.foreach { case (j, i) => println(s"J[${i+1}] = $j") }
    res.objHistory.sliding(2).foreach {
      case Seq(a, b) => println(s"delta = ${a - b}  rel_ppm = ${(a - b) * BigInt(1000000) / a}")
      case _ => ()
    }
    spark.stop()
  }
}
