package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.SpatialGrid

/** Oracle-checked spatial queries over the engine's 2-D point table
  * (`Tables.points2d`, the reference `points.txt` shape).
  *
  * `spatial_knn_grid` is the load-bearing gate: the Spark side prunes
  * candidates through the 3x3 grid neighborhood (SpatialGrid scaladoc)
  * while the DuckDB oracle brute-forces the full probes x points
  * distance ranking — a hash match PROVES the grid prune is lossless
  * for this data/cell choice rather than assuming it. The brute oracle
  * is O(nProbes x N) = 10 x N, linear in volume, so it stays runnable
  * at the sampled derived scale.
  */
object SpatialQueries {

  // 5th-NN max: 65.5 at sf0.001, 14.9 at sf0.01 — cell = 100 clears the
  // prune-losslessness bound (kth-NN < cell) at EVERY fixture scale, and
  // the margin only widens as density grows with volume
  private val Cell = 100.0
  // histogram granularity: y = l_quantity spans [1, 50], so a 25-wide
  // cell keeps the grid genuinely 2-D (cy in {0, 1, 2})
  private val StatsCell = 25.0
  private val NProbes = 10
  private val K = 5

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "spatial_knn_grid" -> ((s, dir) =>
      SpatialGrid.knnGrid(Tables.points2d(s, dir), Cell, NProbes, K)
        .orderBy("probe_id", "rk")),

    // per-cell spatial histogram; cell ids bounded by the coordinate
    // domain; exact integer sums (x in cents, y integer-valued) — the
    // rounded-double form hit a 4dp boundary at the sampled scale
    "spatial_cell_stats" -> ((s, dir) =>
      SpatialGrid.cellStats(Tables.points2d(s, dir), StatsCell)
        .select(col("cx"), col("cy"), col("n"),
          col("sx_cents"), col("sy").as("sum_y"))
        .orderBy("cx", "cy"))
  )

  val oracleSql: Map[String, String] = Map(
    "spatial_knn_grid" ->
      s"""WITH pts AS (
         |  SELECT l_orderkey AS ok, l_linenumber AS ln,
         |         l_extendedprice AS x, l_quantity AS y
         |  FROM lineitem
         |), dpts AS (
         |  SELECT DISTINCT ok, ln, x, y FROM pts
         |), probes AS (
         |  SELECT CAST(row_number() OVER (ORDER BY ok, ln, x, y) AS INT)
         |           AS probe_id,
         |         ok AS pok, ln AS pln, x AS px, y AS py
         |  FROM (SELECT * FROM dpts ORDER BY ok, ln, x, y LIMIT $NProbes)
         |), cand AS (
         |  SELECT p.probe_id, p.pok, p.pln, q.ok, q.ln, q.x, q.y,
         |    (q.x - p.px) * (q.x - p.px) + (q.y - p.py) * (q.y - p.py) AS d2
         |  FROM probes p JOIN pts q
         |    ON NOT (q.ok = p.pok AND q.ln = p.pln
         |            AND q.x = p.px AND q.y = p.py)
         |), r AS (
         |  SELECT *, CAST(row_number() OVER (
         |      PARTITION BY probe_id ORDER BY d2, ok, ln, x, y) AS INT) AS rk
         |  FROM cand
         |)
         |SELECT probe_id, CAST(pok AS BIGINT) AS pok,
         |  CAST(pln AS BIGINT) AS pln, rk,
         |  CAST(ok AS BIGINT) AS n_ok, CAST(ln AS BIGINT) AS n_ln, d2
         |FROM r WHERE rk <= $K
         |ORDER BY probe_id, rk""".stripMargin,

    "spatial_cell_stats" ->
      s"""SELECT
         |  CAST(floor(l_extendedprice / $StatsCell) AS BIGINT) AS cx,
         |  CAST(floor(l_quantity / $StatsCell) AS BIGINT) AS cy,
         |  count(*) AS n,
         |  CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
         |       AS BIGINT) AS sx_cents,
         |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_y
         |FROM lineitem
         |GROUP BY 1, 2
         |ORDER BY cx, cy""".stripMargin
  )
}
