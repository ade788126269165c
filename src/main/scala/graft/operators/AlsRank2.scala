package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Rank-2 ALS in EXACT fixed point — the half-solves behind
  * `q_als_rank2_step`/`_step2` (moved here from AnalyticQueries when
  * the free-convergence fit landed) plus the fit driver itself.
  *
  * Scales, closing over the alternation (the r17 widening audit):
  * ratings in cents (BIGINT), user factors in MILLIS, item factors in
  * MICROS; every normal-equation accumulation stays BIGINT (per-item
  * sums ≤ 10¹⁷ at 10× derived scale, per-user sums run over ≤ |items|
  * rows at ANY corpus scale); every Cramer readout widens through
  * DECIMAL(38,0) (adj·b·10⁷ ~ 10³⁷ at observed magnitudes). The ridge
  * (λ = 1 at each side's native² scale) keeps det > 0 — the solve is
  * total.
  *
  * Distributed-ALS layout at every step: the rating matrix shuffles
  * once per half-solve on its own key (map-side-combined normal
  * equations), the ≤|items|-row factor table rides BROADCAST. The fit
  * loop truncates lineage per alternation (localCheckpoint) — the
  * iterative-algorithm discipline.
  */
object AlsRank2 {

  /** Rank-2 user factor init: x1 = the rank-1 milli-scaled mean-rating
    * solve, x2 = a deterministic milli-scaled second feature 1 +
    * (user_id mod 199) ∈ [1, 199] (real value ≤ 0.199) — linearly
    * independent of x1 by construction, small enough that every
    * normal-equation entry stays far inside BIGINT, and strictly
    * positive so the fixture's all-positive ratings keep b2 > 0 (the
    * gate still covers negative Cramer numerators — truncation toward
    * zero is verified identical in Spark DIV and DuckDB `//`).
    */
  def userInit2(r: DataFrame): DataFrame =
    r.groupBy(col("user_id"))
      .agg(sum(col("r_c")).as("sr"), count(lit(1)).as("n_u"))
      .select(col("user_id"), expr("(sr * 10) DIV (1 + n_u)").as("x1"),
        (lit(1L) + col("user_id") % 199).as("x2"))

  /** Rank-2 item half-solve — the per-key 2×2 ridge normal equations
    * solved by EXACT Cramer: A = Σ x xᵀ + λ·10⁶ I (milli² scale, λ=1),
    * b = Σ r·x (cents·milli), y = A⁻¹b read out in MICROS as
    * (adjugate·b)·10⁷ DIV det. Determinant and adjugate products are
    * decimal(38,0)-widened (num·10⁷ ~ 10³¹ at fixture magnitudes —
    * far past BIGINT, the q_als_rank1_step overflow lesson); the A/b
    * accumulations stay BIGINT (≤ 10¹⁷ at 10× derived scale; a 100-TB
    * run widens the sums through decimal the same way). The ridge
    * guarantees det > 0, so the solve is total.
    */
  def itemSolve2(r: DataFrame, xu: DataFrame): DataFrame = {
    r.join(xu, "user_id")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_users"),
        (sum(col("x1") * col("x1")) + lit(1000000L)).as("a11"),
        sum(col("x1") * col("x2")).as("a12"),
        (sum(col("x2") * col("x2")) + lit(1000000L)).as("a22"),
        sum(col("r_c") * col("x1")).as("b1"),
        sum(col("r_c") * col("x2")).as("b2"))
      .select(col("event_type"), col("n_users"),
        // y1 = (b1·a22 − b2·a12)·10⁷ DIV det
        expr("""CAST((CAST(b1 AS DECIMAL(38,0)) * CAST(a22 AS DECIMAL(38,0))
          |  - CAST(b2 AS DECIMAL(38,0)) * CAST(a12 AS DECIMAL(38,0)))
          |  * CAST(10000000 AS DECIMAL(38,0))
          |  DIV (CAST(a11 AS DECIMAL(38,0)) * CAST(a22 AS DECIMAL(38,0))
          |  - CAST(a12 AS DECIMAL(38,0)) * CAST(a12 AS DECIMAL(38,0)))
          |  AS BIGINT)""".stripMargin).as("y1_micros"),
        // y2 = (a11·b2 − a12·b1)·10⁷ DIV det
        expr("""CAST((CAST(a11 AS DECIMAL(38,0)) * CAST(b2 AS DECIMAL(38,0))
          |  - CAST(a12 AS DECIMAL(38,0)) * CAST(b1 AS DECIMAL(38,0)))
          |  * CAST(10000000 AS DECIMAL(38,0))
          |  DIV (CAST(a11 AS DECIMAL(38,0)) * CAST(a22 AS DECIMAL(38,0))
          |  - CAST(a12 AS DECIMAL(38,0)) * CAST(a12 AS DECIMAL(38,0)))
          |  AS BIGINT)""".stripMargin).as("y2_micros"))
  }

  /** Rank-2 USER half-solve from micro-scaled item factors (y1_m,
    * y2_m): per-user 2×2 ridge normal equations A = Σ y yᵀ + λ·10¹² I
    * (micros² scale, λ = 1), b = Σ r·y (cents·micros = 10⁸), solved by
    * the same exact Cramer as [[itemSolve2]] with x read out in
    * MILLIS: (adjugate·b)·10⁷ DIV det (adj·b ~ 10³⁰ · 10⁷ = 10³⁷ at
    * observed factor magnitudes — inside DECIMAL(38,0); det ~ 10³³).
    * Per-user sums run over ≤ |items| rows, so the A/b accumulations
    * stay far inside BIGINT at any corpus scale (users grow, per-user
    * item counts don't). Milli output feeds [[itemSolve2]] verbatim —
    * the rank-2 alternation closes over the same scales.
    */
  def userSolve2(r: DataFrame, y: DataFrame): DataFrame =
    r.join(broadcast(y), "event_type")
      .groupBy(col("user_id"))
      .agg(
        (sum(col("y1_m") * col("y1_m")) + lit(1000000000000L)).as("a11"),
        sum(col("y1_m") * col("y2_m")).as("a12"),
        (sum(col("y2_m") * col("y2_m")) + lit(1000000000000L)).as("a22"),
        sum(col("r_c") * col("y1_m")).as("b1"),
        sum(col("r_c") * col("y2_m")).as("b2"))
      .select(col("user_id"),
        expr("""CAST((CAST(b1 AS DECIMAL(38,0)) * CAST(a22 AS DECIMAL(38,0))
          |  - CAST(b2 AS DECIMAL(38,0)) * CAST(a12 AS DECIMAL(38,0)))
          |  * CAST(10000000 AS DECIMAL(38,0))
          |  DIV (CAST(a11 AS DECIMAL(38,0)) * CAST(a22 AS DECIMAL(38,0))
          |  - CAST(a12 AS DECIMAL(38,0)) * CAST(a12 AS DECIMAL(38,0)))
          |  AS BIGINT)""".stripMargin).as("x1"),
        expr("""CAST((CAST(a11 AS DECIMAL(38,0)) * CAST(b2 AS DECIMAL(38,0))
          |  - CAST(a12 AS DECIMAL(38,0)) * CAST(b1 AS DECIMAL(38,0)))
          |  * CAST(10000000 AS DECIMAL(38,0))
          |  DIV (CAST(a11 AS DECIMAL(38,0)) * CAST(a22 AS DECIMAL(38,0))
          |  - CAST(a12 AS DECIMAL(38,0)) * CAST(a12 AS DECIMAL(38,0)))
          |  AS BIGINT)""".stripMargin).as("x2"))

  private def asYm(y: DataFrame): DataFrame =
    y.select(col("event_type"), col("y1_micros").as("y1_m"),
      col("y2_micros").as("y2_m"))

  /** One full alternation from user factors `xu`: item solve then user
    * re-solve. Returns (item factors, re-solved user factors) — the
    * SINGLE step both [[unrolled]] and [[fit]] compose, so their
    * alternation paths are identical by construction.
    */
  private def alternate(r: DataFrame, xu: DataFrame): (DataFrame, DataFrame) = {
    val y = itemSolve2(r, xu)
    (y, userSolve2(r, asYm(y)))
  }

  /** `itemSolves` fixed alternations from the deterministic init — the
    * exactly-replayable oracle-gated twin of [[fit]] (the
    * kmeans_fit_unrolled pattern). itemSolves = 2 IS q_als_rank2_step2.
    * Output: (event_type, n_users, y1_micros, y2_micros).
    */
  def unrolled(r: DataFrame, itemSolves: Int): DataFrame = {
    require(itemSolves >= 1)
    var xu = userInit2(r).localCheckpoint(true)
    var y: DataFrame = null
    (1 to itemSolves).foreach { _ =>
      val (yk, xk) = alternate(r, xu)
      y = yk
      // truncate lineage per alternation; the last user re-solve is
      // never consumed but costs nothing (lazy)
      xu = xk.localCheckpoint(true)
    }
    y
  }

  final case class FitResult(
      factors: DataFrame, // the BEST-J alternation's item factors
      bestAlt: Int, // 1-based alternation the factors come from
      alternations: Int, // alternations executed
      converged: Boolean,
      objHistory: Seq[BigInt]) // exact J·10¹⁸ after each alternation

  /** The exact scaled ridge objective J·10¹⁸ for factors (xu millis,
    * y micros) over ratings `r` (cents):
    *
    *   J·10¹⁸ = Σ_cells (r_c·10⁷ − x1·y1_m − x2·y2_m)²
    *          + 10¹²·Σ_u (x1² + x2²) + 10⁶·Σ_i (y1_m² + y2_m²)
    *
    * (residuals at the 10⁹ scale square to 10¹⁸; milli² and micro²
    * norms lift by 10¹² and 10⁶ to the same scale). The per-cell
    * residual stays inside BIGINT (~10¹³ at fixture magnitudes); the
    * squared sums widen through the decimal(19)²→decimal(38) product
    * (the Modularity qNumExact pattern) — Σ ~ 10³⁰ at sf0.1, ~10³⁵ at
    * 10⁹ users, inside DECIMAL(38,0). Three tiny aggregates (one per
    * term), each collected as ONE row — the driver holds three
    * BigDecimals, never factors.
    */
  def objectiveScaled(r: DataFrame, xu: DataFrame, y: DataFrame): BigInt = {
    val d19 = "decimal(19,0)"
    val d38 = "decimal(38,0)"
    def sq(c: org.apache.spark.sql.Column) =
      (c.cast(d19) * c.cast(d19)).cast(d38)
    def one(df: DataFrame): BigInt = {
      val v = df.collect()(0)
      if (v.isNullAt(0)) BigInt(0)
      else BigInt(v.getDecimal(0).toBigIntegerExact)
    }
    val sse = one(r.join(xu, "user_id").join(broadcast(y), "event_type")
      .select((col("r_c") * lit(10000000L)
        - (col("x1") * col("y1_m") + col("x2") * col("y2_m"))).as("e9"))
      .agg(sum(sq(col("e9")))))
    val sx = one(xu.agg(sum(
      (sq(col("x1")) + sq(col("x2"))).cast(d38))))
    val sy = one(y.agg(sum(
      (sq(col("y1_m")) + sq(col("y2_m"))).cast(d38))))
    sse + BigInt(1000000000000L) * sx + BigInt(1000000L) * sy
  }

  /** The FREE-CONVERGENCE rank-2 ALS driver — alternate [[itemSolve2]]
    * / [[userSolve2]] from the deterministic init until the EXACT
    * integer objective plateaus: the published ALS stopping rule,
    * relative improvement (J_{k−1} − J_k)/J_{k−1} below tolerance,
    * realized in exact integers as (J_{k−1} − J_k)·10⁶ < J_{k−1} ·
    * tolPpm so the stop is deterministic cross-engine (a STRICT
    * J_k ≥ J_{k−1} plateau never fires here — measured at sf0.001 the
    * exact ladder still improves 2.3% at alternation 12; ALS objective
    * decay is sublinear, which is exactly why the published rule is
    * relative). Also covers a rising J (negative improvement < any
    * tolerance). Caps at `maxAlts`.
    *
    * Returns the BEST-J alternation's item factors (the louvainFit
    * best-of discipline; under the monotone ladder best = last, but
    * only "best" is a stable contract if truncation ever wobbles).
    *
    * Declared no-oracle (the kmeans_fit pattern): the alternation
    * count is data-dependent, so no fixed unrolled oracle exists; the
    * hash-gated twin is [[unrolled]] (q_als_rank2_fit_unrolled) and
    * AnalyticSpec pins this loop against a full driver-side BigInt
    * replay — factors, alternation counts, convergence flag, and the
    * exact objective ladder.
    */
  def fit(r: DataFrame, maxAlts: Int = 12, tolPpm: Long = 50000L): FitResult = {
    var xu = userInit2(r).localCheckpoint(true)
    var best: (BigInt, DataFrame, Int) = null
    var hist = Vector.empty[BigInt]
    var it = 0
    var converged = false
    while (it < maxAlts && !converged) {
      val (yk, xk) = alternate(r, xu)
      val y = yk.localCheckpoint(true)
      xu = xk.localCheckpoint(true)
      val jj = objectiveScaled(r, xu, asYm(y))
      hist :+= jj
      if (best == null || jj < best._1) best = (jj, y, it + 1)
      if (hist.size >= 2 &&
          (hist(hist.size - 2) - jj) * BigInt(1000000) <
            hist(hist.size - 2) * BigInt(tolPpm)) converged = true
      it += 1
    }
    FitResult(best._2, best._3, it, converged, hist)
  }
}
