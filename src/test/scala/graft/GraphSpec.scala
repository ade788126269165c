package graft

import org.apache.spark.sql.functions._

/** Fixed-point PageRank: the distributed result must EQUAL a
  * driver-side sequential replay bit-for-bit — that is the whole point
  * of the integer formulation (order-free exact arithmetic; see
  * PageRank scaladoc).
  */
class GraphSpec extends SparkSpec {

  test("distributed integer PageRank equals the exact sequential replay") {
    import spark.implicits._
    val pairs = Tables.lineitem(spark, sf)
      .select(col("l_suppkey").as("sup"),
        (lit(100000L) + col("l_partkey")).as("prt"))
      .distinct()
    val edgesDf = pairs.select(col("sup").as("src"), col("prt").as("dst"))
      .union(pairs.select(col("prt").as("src"), col("sup").as("dst")))
    val got = graft.operators.PageRank.run(edgesDf, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    // sequential replay with identical Long arithmetic
    val edges = edgesDf.as[(Long, Long)].collect()
    val deg = edges.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    var rank = nodes.map(_ -> 1000000L).toMap
    for (_ <- 1 to 3) {
      val sums = new scala.collection.mutable.HashMap[Long, Long]()
      edges.foreach { case (s, d) =>
        sums.update(d, sums.getOrElse(d, 0L) + rank(s) / deg(s))
      }
      rank = nodes.map(n => n -> (150000L + 850L * sums.getOrElse(n, 0L) / 1000L)).toMap
    }
    assert(got.size == rank.size)
    assert(got == rank, "distributed != sequential replay")
    // sanity: total mass stays near N (damping redistributes, floors leak)
    val total = rank.values.sum
    assert(total > nodes.length * 900000L && total <= nodes.length * 1000000L)
  }
}
