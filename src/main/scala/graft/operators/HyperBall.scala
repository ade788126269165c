package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HyperBall (Boldi & Vigna's HyperANF) — per-node neighborhood-size
  * estimation by iterated sketch union: every node carries an HLL
  * register set of the nodes it can reach; each round it folds in its
  * neighbors' sketches (elementwise register MAX), so after R rounds
  * node v's sketch describes ball(v, R). This is THE way to compute
  * per-node reachability sizes / centralities on graphs where true
  * per-node BFS (|V| traversals) is unthinkable — per round it is one
  * |E|-row edge join + one elementwise register-max aggregate; state is
  * exactly |V| rows of packed 64-register arrays whatever the graph.
  *
  * Everything gates exactly, including the float estimates:
  *  - registers/ranks come from the md5 hash via integer string ops
  *    (same family as [[DistinctSketch]], here p = 6 → 64 registers so
  *    iterated state stays lean);
  *  - the harmonic sum Σ 2^−rank is computed as `1.0 / (1L << rank)`
  *    (integer shift, exact double cast, exact power-of-two division)
  *    folded in REGISTER ORDER with the empty-register mass as the
  *    fold's start value — a fully deterministic IEEE sequence both
  *    engines replay;
  *  - the estimate is the RAW HyperLogLog estimator α·m²/S (no
  *    small-range ln correction: log library ulps are the one
  *    cross-engine hazard, and for ball-size COMPARISONS the raw
  *    estimator's small-set bias is harmless and documented).
  */
object HyperBall {

  /** Register-count exponent: 2^6 = 64 registers per node (state is
    * |V|·64 rows at saturation — lean enough to iterate). */
  val P = 6
  val Registers: Int = 1 << P

  /** 54-bit suffix after the 6 register bits: rank ∈ [1, 55]. */
  val MaxRank = 55

  /** α₆₄ · m² — the raw-estimator numerator (standard α for m = 64),
    * injected as the same double literal in oracle SQL. */
  val AlphaM2: Double = 0.709 * 4096.0

  def regCol(node: Column): Column =
    pmod(DistinctSketch.hash60(node), lit(Registers.toLong))

  def rankCol(node: Column): Column = {
    val sfx = shiftright(DistinctSketch.hash60(node), P)
    when(sfx === 0, lit(MaxRank))
      .otherwise(lit(MaxRank) - length(bin(sfx)))
      .cast("long")
  }

  /** (node, nnz, est): raw-HLL ball(v, rounds) size estimates over the
    * symmetrized `edges` (src, dst). nnz is the node's non-empty
    * register count (an integer that gates the sketch shape directly).
    */
  /** `eager = false` (plan audit only) skips the per-round
    * localCheckpoints so `.explain` shows the real round tree; the
    * production path materializes eagerly to truncate iteration
    * lineage (the standard iterative-operator discipline here).
    *
    * `broadcastSketches` is the [[PageRank.run]] two-regime gate
    * applied to the sketch frame: when the |V|-row packed state fits
    * an executor, broadcasting it makes the per-round join a narrow
    * pass over the edges (no edge shuffle/sort per round — only the
    * register-merge aggregate shuffles); for billion-node graphs the
    * default self-selects OFF by a measured node count. The cap is
    * node-count-scaled for the FAT state row (~600 B: node + 64-long
    * array ≈ 40× PageRank's (node, rank)), so 150k nodes ≈ the same
    * executor budget PageRank's 5M-node cap implies.
    */
  def neighborhoodSizes(edges: DataFrame, rounds: Int,
      eager: Boolean = true,
      broadcastSketches: Option[Boolean] = None,
      broadcastMaxNodes: Long = 150000L): DataFrame =
    estimateOf(packedStates(edges, rounds, eager, broadcastSketches,
      broadcastMaxNodes).last)

  /** The neighborhood FUNCTION + effective diameter — what HyperANF
    * exists to compute: per round r ∈ [0, rounds], the total ball mass
    * N(r) = Σ_v ⌊est(v, r)·100 + 0.5⌋ (each node's raw-HLL estimate is
    * a deterministic double, so its per-row integer cents are exact
    * and their SUM is order-free — the spatial_cell_stats lesson
    * applied pre-emptively), plus the 90%-quantile effective-diameter
    * flag 10·N(r) ≥ 9·N(rounds), all integer cross-multiplication.
    * The first flagged round IS the effective diameter at q = 0.9
    * (relative to the `rounds`-ball horizon).
    */
  def neighborhoodFunction(edges: DataFrame, rounds: Int,
      broadcastSketches: Option[Boolean] = None,
      broadcastMaxNodes: Long = 150000L): DataFrame =
    neighborhoodFunctionFrom(packedStates(edges, rounds, eager = true,
      broadcastSketches, broadcastMaxNodes))

  /** [[neighborhoodFunction]] from pre-built round states (index =
    * round) — the staged-layout entry point. */
  def neighborhoodFunctionFrom(sts: Seq[DataFrame]): DataFrame = {
    val rounds = sts.size - 1
    val masses = sts.zipWithIndex.map { case (st, r) =>
      estimateOf(st)
        .agg(sum(floor(col("est_raw") * 100 + lit(0.5)).cast("long"))
          .as("mass_c"))
        .select(lit(r).as("round"), col("mass_c"))
    }.reduce(_ unionAll _)
    val fin = masses.where(col("round") === rounds)
      .select(col("mass_c").as("mass_fin"))
    masses.crossJoin(broadcast(fin))
      .select(col("round"), col("mass_c"),
        (lit(10) * col("mass_c") >= lit(9) * col("mass_fin"))
          .as("reached_90pct"))
  }

  /** State after each round 0..rounds (each materialized when eager) —
    * shared by [[neighborhoodSizes]] (which needs only the last),
    * [[neighborhoodFunction]] (which folds every round), and the
    * per-scale-dir staging (StagedLayouts.hyperballStates) that lets
    * graph_ball_sketch and graph_eff_diameter pay the round loop
    * once. */
  def packedStates(edges: DataFrame, rounds: Int,
      eager: Boolean,
      broadcastSketches: Option[Boolean],
      broadcastMaxNodes: Long): Seq[DataFrame] = {
    def mat(df: DataFrame): DataFrame =
      if (eager) df.localCheckpoint(true) else df
    val e = edges.select(col("src").as("u"), col("dst").as("v"))
      .unionAll(edges.select(col("dst").as("u"), col("src").as("v")))
      .cache()
    // PACKED state layout: ONE row per node carrying all 64 registers
    // as array<long> (index i = register i, 0 = empty; real ranks are
    // ≥ 1). The r10 (node, reg, rank) layout materialized |E|·64 rows
    // per round-join and shuffled 64× the rows it needed to — the one
    // plan flagged weak in round 10. Packed, the per-round join is |E|
    // rows and the merge is 64 codegen'd MAX aggregates (map-side
    // combined, constant-size buffer — the KMeansND aggregation shape).
    var state = mat(e.select(col("u").as("node")).distinct()
      .select(col("node"), regCol(col("node")).as("reg"),
        rankCol(col("node")).as("rank"))
      .select(col("node"),
        transform(sequence(lit(0L), lit(Registers - 1L)),
          i => when(i === col("reg"), col("rank")).otherwise(lit(0L)))
          .as("ranks")))
    // elementwise zip-max across a node's group, as 64 independent
    // long-MAX aggregates reassembled into the array — stays inside
    // whole-stage codegen, partial-aggregates before the shuffle
    val zipMax = array((1 to Registers).map(i =>
      max(element_at(col("ranks"), i))): _*).as("ranks")
    val buf = scala.collection.mutable.ArrayBuffer(state)
    val doBroadcast = PageRank.chooseBroadcast(broadcastSketches, eager,
      state.count(), broadcastMaxNodes)
    for (_ <- 1 to rounds) {
      val stateSide = if (doBroadcast) broadcast(state) else state
      val fromNbrs = e.join(stateSide, e("v") === stateSide("node"))
        .select(e("u").as("node"), col("ranks"))
      state = mat(state.unionAll(fromNbrs)
        .groupBy(col("node")).agg(zipMax))
      buf += state
    }
    e.unpersist(blocking = true)
    buf.toSeq
  }

  /** (node, nnz, est_raw) from a packed state frame: harmonic fold
    * over the non-empty registers in register order (filter()
    * preserves array order), empty-register mass 2^0 each folded in
    * as the start value — the IDENTICAL IEEE add sequence the r10 row
    * layout produced, so the oracle row is unchanged.
    */
  def estimateOf(state: DataFrame): DataFrame = {
    val nonEmpty = filter(col("ranks"), r => r > 0)
    state
      .select(col("node"), nonEmpty.as("rr"))
      .select(col("node"), size(col("rr")).cast("long").as("nnz"),
        aggregate(
          transform(col("rr"), r =>
            lit(1.0) / call_function("shiftleft", lit(1L),
              r.cast("int")).cast("double")),
          (lit(Registers.toDouble) - size(col("rr")).cast("double")),
          (acc, x) => acc + x).as("s"))
      .select(col("node"), col("nnz"),
        (lit(AlphaM2) / col("s")).as("est_raw"))
  }
}
