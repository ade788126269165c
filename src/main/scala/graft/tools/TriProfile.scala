package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-by-stage timing for the triangle pipeline (dev-loop only). */
object TriProfile {
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
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[tri] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val li = graft.Tables.lineitem(spark, sfDir)
    li.count()
    if (sys.env.get("TRI_STAGED").isEmpty) {
      time("countPerNode end-to-end (cold)") {
        val q = graft.queries.GraphQueries.queries("graph_triangles")(spark, sfDir)
        println(q.count())
      }
      time("countPerNode end-to-end (warm)") {
        val q = graft.queries.GraphQueries.queries("graph_triangles")(spark, sfDir)
        println(q.count())
      }
      spark.stop()
      return
    }
    val op = li.select(col("l_orderkey").as("ok"), col("l_partkey").as("p"))
      .distinct()
    time("op distinct count")(println(op.count()))
    val e = op.alias("a").join(op.alias("b"), col("a.ok") === col("b.ok"))
      .where(col("a.p") < col("b.p"))
      .select(col("a.p").as("u"), col("b.p").as("v")).distinct()
    val ec = time("edges count")(e.count())
    println(s"edges: $ec")
    val eM = time("edges localCheckpoint")(e.localCheckpoint(true))
    val deg = eM.select(col("u").as("node"))
      .unionAll(eM.select(col("v").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("d"))
      .select(col("node"), (col("d") * lit(100000000L) + col("node")).as("rk"))
    val ew = eM
      .join(deg.select(col("node").as("u"), col("rk").as("rku")), "u")
      .join(deg.select(col("node").as("v"), col("rk").as("rkv")), "v")
    val oriented = ew.select(
      when(col("rku") < col("rkv"), col("u")).otherwise(col("v")).as("src"),
      when(col("rku") < col("rkv"), col("v")).otherwise(col("u")).as("dst"))
    val o = time("oriented localCheckpoint")(oriented.localCheckpoint(true))
    val adj = o.groupBy(col("src").as("node"))
      .agg(sort_array(collect_list(col("dst"))).as("nbrs"))
    val adjM = time("adj build")(adj.localCheckpoint(true))
    println(s"adj rows: ${adjM.count()}")
    val probed = o
      .join(adjM.select(col("node").as("src"), col("nbrs").as("nu")), "src")
      .join(adjM.select(col("node").as("dst"), col("nbrs").as("nv")),
        Seq("dst"), "left")
      .select(col("src"), col("dst"),
        array_intersect(col("nu"),
          coalesce(col("nv"), array().cast("array<bigint>"))).as("thirds"))
      .where(size(col("thirds")) > 0)
    val pM = time("probe+intersect")(probed.localCheckpoint(true))
    println(s"closing edges: ${pM.count()}")
    val out = pM.select(explode(concat(
        array(
          struct(col("src").as("node"), size(col("thirds")).cast("long").as("w")),
          struct(col("dst").as("node"), size(col("thirds")).cast("long").as("w"))),
        transform(col("thirds"),
          c => struct(c.as("node"), lit(1L).as("w"))))).as("s"))
      .select(col("s.node").as("node"), col("s.w").as("w"))
      .groupBy(col("node")).agg(sum(col("w")).as("n_tri"))
    time("attribution agg")(println(out.count()))
    val tot = out.agg(sum(col("n_tri"))).head().getLong(0)
    println(s"triangle participation total: $tot (triangles ${tot / 3})")

    // the packaged operator, exactly as the query invokes it
    time("countPerNode end-to-end") {
      val q = graft.queries.GraphQueries.queries("graph_triangles")(spark, sfDir)
      println(q.count())
    }
    spark.stop()
  }
}
