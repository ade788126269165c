package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Grid-bucketed 2-D spatial operators over the engine's point table
  * (the reference's `points.txt` shape, `Tables.points2d` — reference
  * `mapper.py:90-93` parses the same (x, y) rows).
  *
  * Scale discipline is the LSH/IVF one (Dedup/Similarity scaladocs):
  * never a cross join. Points hash into square cells of side `cell`;
  * a probe's candidates come only from its 3x3 cell neighborhood,
  * which provably contains every point within distance `cell` of the
  * probe (a point within radius r <= cell lies at most one cell away
  * on each axis). With the k-th nearest neighbor empirically far
  * inside the cell radius (5th-NN max 65.5 at sf0.001 and 14.9 at
  * sf0.01 vs cell = 100, and point density only GROWS with scale
  * factor so the margin widens), the pruned top-k EQUALS the
  * brute-force top-k — and the
  * DuckDB oracle computes exactly the brute-force form, so that
  * equality is hash-gated every round, not assumed.
  *
  * At 100 TB: the probe-cell table is tiny (nProbes x 9 rows) and
  * broadcast, so the candidate join is a narrow map-side pass over
  * the point scan; per-probe candidate count is bounded by
  * density x 9 cell^2, independent of total volume.
  */
object SpatialGrid {

  private def cellOf(c: Column, cell: Double): Column =
    floor(c / lit(cell)).cast("long")

  /** Exact k-nearest-neighbors for the first `nProbes` DISTINCT point
    * tuples (deterministic (ok, ln, x, y) order). The fixture's
    * (l_orderkey, l_linenumber) key repeats (FIXTURES.md), so the
    * probe identity is the full tuple and "self" exclusion removes
    * every copy of the probe's exact tuple — identically expressible
    * on both engines. Duplicate NEIGHBOR tuples may tie across the
    * rank boundary, but tied copies are value-identical in every
    * output column, so the hash gate is insensitive to which copy
    * ranks where.
    */
  def knnGrid(pts: DataFrame, cell: Double, nProbes: Int, k: Int): DataFrame = {
    val ord = Seq(col("l_orderkey"), col("l_linenumber"), col("x"), col("y"))
    val probes = pts.distinct()
      .orderBy(ord: _*)
      .limit(nProbes)
      .select(
        row_number().over(Window.orderBy(ord: _*)).as("probe_id"),
        col("l_orderkey").as("pok"), col("l_linenumber").as("pln"),
        col("x").as("px"), col("y").as("py"))

    // nProbes x 9 candidate cells — the whole probe side stays broadcast
    val probeCells = probes
      .withColumn("dx", explode(array(lit(-1L), lit(0L), lit(1L))))
      .withColumn("dy", explode(array(lit(-1L), lit(0L), lit(1L))))
      .select(col("probe_id"), col("pok"), col("pln"), col("px"), col("py"),
        (cellOf(col("px"), cell) + col("dx")).as("ccx"),
        (cellOf(col("py"), cell) + col("dy")).as("ccy"))

    // each point lives in exactly one cell and the 9 probe cells are
    // distinct, so a (probe, point) pair matches at most once — no dedup
    val cand = pts
      .withColumn("cx", cellOf(col("x"), cell))
      .withColumn("cy", cellOf(col("y"), cell))
      .join(broadcast(probeCells),
        col("cx") === col("ccx") && col("cy") === col("ccy"))
      .where(!(col("l_orderkey") === col("pok") &&
               col("l_linenumber") === col("pln") &&
               col("x") === col("px") && col("y") === col("py")))
      .withColumn("d2",
        (col("x") - col("px")) * (col("x") - col("px")) +
          (col("y") - col("py")) * (col("y") - col("py")))

    val rw = Window.partitionBy(col("probe_id"))
      .orderBy(col("d2"), col("l_orderkey"), col("l_linenumber"),
        col("x"), col("y"))
    cand.withColumn("rk", row_number().over(rw))
      .where(col("rk") <= k)
      .select(col("probe_id"),
        col("pok").cast("long").as("pok"), col("pln").cast("long").as("pln"),
        col("rk"),
        col("l_orderkey").cast("long").as("n_ok"),
        col("l_linenumber").cast("long").as("n_ln"),
        col("d2"))
  }

  /** Per-cell spatial histogram: point count + coordinate sums — the
    * one-pass map-side-combined aggregate shape of `kmeans_recenter`
    * (cell id plays the centroid id). Cell count is bounded by the
    * fixed coordinate DOMAIN, not the row count, so output stays small
    * at any scale. Sums are EXACT scaled integers (x in cents — the
    * fixture's 2-dp domain — and y is integer-valued): an
    * order-dependent double sum rounded to N dp landed ON a rounding
    * boundary at the sampled derived scale (the q_tpch_q1 lesson), so
    * the integer-cents discipline applies.
    */
  def cellStats(pts: DataFrame, cell: Double): DataFrame =
    pts.groupBy(
        cellOf(col("x"), cell).as("cx"),
        cellOf(col("y"), cell).as("cy"))
      .agg(
        count(lit(1)).as("n"),
        sum(floor(col("x") * 100 + lit(0.5)).cast("long")).as("sx_cents"),
        sum(col("y").cast("long")).as("sy"))
}
