package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.SpatialGrid

/** Grid-bucketed spatial operators (SpatialGrid).
  *
  * The load-bearing check is prune losslessness: the grid-pruned kNN
  * must EQUAL the brute-force ranking — verified here in-Spark at
  * sf0.001 (the one fixture scale the driver's oracle gate does not
  * cover; cell = 100 was sized so the 5th-NN bound holds even at this
  * sparsest scale) and by the DuckDB brute oracle at sf0.01+.
  */
class SpatialSpec extends SparkSpec {

  private val cell = 100.0
  private val k = 5
  private val nProbes = 10

  private def pts = Tables.points2d(spark, sf)

  test("grid kNN equals in-Spark brute force at the sparsest fixture scale") {
    val grid = SpatialGrid.knnGrid(pts, cell, nProbes, k)
      .select("probe_id", "rk", "n_ok", "n_ln", "d2")

    // brute force: same probe selection, full cross join, same ranking
    val ord = Seq(col("l_orderkey"), col("l_linenumber"), col("x"), col("y"))
    val probes = pts.distinct().orderBy(ord: _*).limit(nProbes)
      .select(row_number().over(Window.orderBy(ord: _*)).as("probe_id"),
        col("l_orderkey").as("pok"), col("l_linenumber").as("pln"),
        col("x").as("px"), col("y").as("py"))
    val brute = pts.crossJoin(broadcast(probes))
      .where(!(col("l_orderkey") === col("pok") &&
               col("l_linenumber") === col("pln") &&
               col("x") === col("px") && col("y") === col("py")))
      .withColumn("d2",
        (col("x") - col("px")) * (col("x") - col("px")) +
          (col("y") - col("py")) * (col("y") - col("py")))
      .withColumn("rk", row_number().over(Window.partitionBy(col("probe_id"))
        .orderBy(col("d2"), col("l_orderkey"), col("l_linenumber"),
          col("x"), col("y"))))
      .where(col("rk") <= k)
      .select(col("probe_id"), col("rk"),
        col("l_orderkey").cast("long").as("n_ok"),
        col("l_linenumber").cast("long").as("n_ln"), col("d2"))

    assert(grid.count() === nProbes.toLong * k)
    // duplicate neighbor tuples can swap ranks across engines-of-record;
    // compare as value sets (the driver's hash gate is order-normalized
    // the same way)
    assert(grid.exceptAll(brute).count() === 0)
    assert(brute.exceptAll(grid).count() === 0)
  }

  test("kth-NN distance clears the cell bound (prune-losslessness margin)") {
    val maxKth = SpatialGrid.knnGrid(pts, cell, nProbes, k)
      .agg(max(sqrt(col("d2")))).head.getDouble(0)
    assert(maxKth < cell,
      s"5th-NN $maxKth must stay under cell=$cell or the 3x3 prune can drop a true neighbor")
  }

  test("kNN plan broadcasts the probe cells and never goes cartesian") {
    val p = plan(SpatialGrid.knnGrid(pts, cell, nProbes, k))
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("CartesianProduct"), "grid kNN must not cross join")
  }

  test("cell stats partition the point count exactly") {
    val stats = SpatialGrid.cellStats(pts, 25.0)
    val total = stats.agg(sum(col("n"))).head.getLong(0)
    assert(total === pts.count())
    // every point's cell is present
    val missing = pts
      .select(floor(col("x") / 25.0).cast("long").as("cx"),
        floor(col("y") / 25.0).cast("long").as("cy"))
      .distinct()
      .join(stats, Seq("cx", "cy"), "left_anti")
    assert(missing.count() === 0)
  }
}
