package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-Min sketch as relational algebra — fixed-memory frequency
  * estimation for key domains too large to count exactly.
  *
  * [[HeavyHitters]] (Misra-Gries) answers "which keys exceed 1/k of the
  * stream" EXACTLY but needs its candidate recount pass; the CMS answers
  * point frequency queries for EVERY key from a Depth×width integer
  * grid built in one scan — the structure you keep per-window when the
  * key domain (users, URLs, n-grams) is unbounded. Estimates are biased
  * up only: est(k) = min over Depth rows of the cell count, each cell an
  * overcount of the true frequency by its hash-colliding keys.
  *
  * Like [[Bloom]], the hashes are the deterministic universal family
  * ((a·h+b) mod P) mod w, so both engines build the IDENTICAL grid and
  * the estimates — collisions included — hash-gate exactly against
  * DuckDB with no error-bound pin.
  *
  * Scale shape: the build is one narrow explode (Depth cells per row)
  * into a map-side-combined count whose output is ≤ Depth·w rows
  * regardless of input volume; estimation is Depth broadcast joins of
  * that tiny grid against the (already aggregated) key frame. Nothing
  * scales with the stream but the one scan.
  */
object CountMin {

  /** Sketch rows (independent hash functions). */
  val Depth = 3

  val coeffs: Seq[(Long, Long)] = Dedup.minhashCoeffs(Depth, seed = 877L)

  /** Cell index of hash `h` (long in [0, P)) in each of the Depth rows
    * of a width-`w` sketch. SQL twin: [[positionSql]]. */
  def positions(h: Column, w: Int): Seq[Column] =
    coeffs.map { case (a, b) =>
      (lit(a) * h + lit(b)) % lit(Dedup.MinhashP) % lit(w.toLong)
    }

  def positionSql(h: String, w: Int): Seq[String] =
    coeffs.map { case (a, b) =>
      s"((($a * $h) + $b) % ${Dedup.MinhashP}) % $w"
    }

  /** The sketch grid (j, pos, c): one narrow explode + one combined
    * count; ≤ Depth·w output rows. */
  def sketch(rows: DataFrame, keyCol: String, w: Int): DataFrame = {
    val h = pmod(col(keyCol), lit(Dedup.MinhashP))
    val cells = positions(h, w).zipWithIndex.map { case (p, j) =>
      struct(lit(j).as("j"), p.as("pos"))
    }
    rows.where(col(keyCol).isNotNull)
      .select(explode(array(cells: _*)).as("jp"))
      .groupBy(col("jp.j").as("j"), col("jp.pos").as("pos"))
      .agg(count(lit(1)).as("c"))
  }

  /** Per-key (key, exact_cnt, est_cnt): the exact count next to the
    * sketch estimate, est ≥ exact always (the CMS one-sided bound —
    * pinned in AnalyticSpec). The inner joins always match because a
    * key's own contributions populate its cells.
    */
  def estimates(rows: DataFrame, keyCol: String, w: Int): DataFrame = {
    val clean = rows.where(col(keyCol).isNotNull)
    // materialize the grid once: the foldLeft below joins it Depth
    // times, and without a checkpoint each broadcast re-runs the full
    // input scan + explode + count (the cache-release discipline used
    // by the staged layouts)
    val cms = sketch(clean, keyCol, w).localCheckpoint(true)
    val keys = clean.groupBy(col(keyCol)).agg(count(lit(1)).as("exact_cnt"))
    val h = pmod(col(keyCol), lit(Dedup.MinhashP))
    val withPos = keys.select(
      col(keyCol) +: col("exact_cnt") +:
        positions(h, w).zipWithIndex.map { case (p, j) => p.as(s"p$j") }: _*)
    val joined = (0 until Depth).foldLeft(withPos) { (df, j) =>
      df.join(broadcast(cms.where(col("j") === j)
          .select(col("pos").as(s"pos$j"), col("c").as(s"c$j"))),
          col(s"p$j") === col(s"pos$j"))
        .drop(s"pos$j", s"p$j")
    }
    joined.select(col(keyCol), col("exact_cnt"),
      least((0 until Depth).map(j => col(s"c$j")): _*).as("est_cnt"))
  }

  /** Equi-join SIZE estimation from the two sides' sketches alone —
    * the optimizer-statistics use of the CMS (the AGMS/Count-Min inner
    * product): |R ⋈ S| = Σ_k fR(k)·fS(k), estimated per depth row as
    * Σ_pos cR[pos]·cS[pos] and taken as the min over rows. Each row's
    * inner product equals the true size plus non-negative collision
    * cross terms, so the estimate is one-sided (≥ exact) — and being
    * pure integer arithmetic over the deterministic grids, it
    * hash-gates exactly, collisions included.
    *
    * Scale shape: after the two one-scan sketch builds, the estimate
    * touches only the ≤ Depth·w-cell grids — join-size planning
    * without running (or shuffling for) the join. Both inputs must
    * carry the key as column "k".
    */
  def joinSizeEstimate(r: DataFrame, s: DataFrame, w: Int): DataFrame = {
    val cr = sketch(r, "k", w)
    val cs = sketch(s, "k", w)
    cr.as("a").join(cs.as("b"),
        col("a.j") === col("b.j") && col("a.pos") === col("b.pos"))
      .groupBy(col("a.j"))
      .agg(sum(col("a.c") * col("b.c")).as("ip"))
      .agg(min(col("ip")).as("est_size"))
  }
}
