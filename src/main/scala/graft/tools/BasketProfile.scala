package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B timing for the basket-edge build (dev-loop only): self-join
  * form vs groupBy + higher-order pair expansion, each driven through
  * both graph consumers (triangles, k-core) interleaved so JVM/codegen
  * warmup cancels out.
  *
  * Recorded verdict (sf0.1, local[32], 3 reps, 2026-08-13): the HOF
  * build alone is ~1 s cheaper cold (2.0 vs 3.1 s — it drops the
  * (ok, p)-distinct shuffle), but steady-state under the triangle
  * consumer it is ~1 s SLOWER (6.2/5.6 vs 5.0/4.5) and neutral under
  * k-core — so GraphQueries.basketEdges keeps the self-join form.
  */
object BasketProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[basket] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val li = graft.Tables.lineitem(spark, sfDir)
    li.count()

    def selfJoinForm = {
      val op = li.select(col("l_orderkey").as("ok"), col("l_partkey").as("p"))
        .distinct()
      op.alias("a").join(op.alias("b"), col("a.ok") === col("b.ok"))
        .where(col("a.p") < col("b.p"))
        .select(col("a.p").as("u"), col("b.p").as("v"))
        .distinct()
    }
    def hofForm = {
      val baskets = li.groupBy(col("l_orderkey"))
        .agg(sort_array(collect_set(col("l_partkey"))).as("ps"))
      baskets
        .select(explode(flatten(transform(col("ps"), (x, i) =>
          transform(slice(col("ps"), i + lit(2), size(col("ps"))),
            y => struct(x.as("u"), y.as("v")))))).as("e"))
        .select(col("e.u").as("u"), col("e.v").as("v"))
        .distinct()
    }
    for (r <- 1 to 3) {
      time(s"tri(self-join) r$r")(
        println(graft.operators.Triangles.countPerNode(selfJoinForm).count()))
      time(s"tri(HOF) r$r")(
        println(graft.operators.Triangles.countPerNode(hofForm).count()))
      time(s"kcore(self-join) r$r")(
        println(graft.operators.KCore.peel(selfJoinForm, k = 3, rounds = 3).count()))
      time(s"kcore(HOF) r$r")(
        println(graft.operators.KCore.peel(hofForm, k = 3, rounds = 3).count()))
    }
    spark.stop()
  }
}
