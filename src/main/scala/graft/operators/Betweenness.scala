package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Approximate betweenness centrality — Brandes dependency accumulation
  * (Brandes 2001) from a SEEDED source set, depth-bounded: the
  * path-centrality member of the graph family (reach = BFS, influence
  * = PageRank, community = label-prop, neighborhood = HyperBall; this
  * one scores brokers — nodes shortest paths flow THROUGH). Exact
  * betweenness is all-pairs (O(|V|·|E|), hopeless at 100 TB); the
  * standard approximation (Brandes–Pich) runs the accumulation from a
  * sampled source set and sums dependencies — source count and depth
  * bound the cost, and sources are embarrassingly parallel: every
  * stage below is keyed by (source, node), so adding sources widens
  * the shuffle, never lengthens the plan.
  *
  * Forward pass = [[Bfs]]'s frontier discipline carrying PATH COUNTS:
  * round i joins only the level-(i−1) frontier against the edges,
  * anti-joins the per-source visited set, and SUMS σ over parallel
  * shortest paths — per-round shuffle is O(frontier expansion).
  * Backward pass walks levels deepest-first: δ(v) = Σ_{w ∈ succ(v)}
  * σ(v)·(1 + δ(w))/σ(w), one level-keyed join + aggregate per level.
  *
  * Determinism (the PageRank discipline): δ is carried as a
  * fixed-point BIGINT scaled by `scale` — each contribution is
  * `(σ_v · (scale + Δ_w)) div σ_w`, an exact truncating integer
  * division identical in Spark (`div`) and DuckDB (`//`), and the sums
  * are order-free integer sums, so a fixed-round run replays as
  * unrolled SQL CTEs with zero float slack. Bounds at the tested
  * volumes: σ ≤ ~10^6 at depth 3 on the derived 10× supply graph and
  * Δ ≤ |V|·scale ≈ 10^9, so every product stays ≪ 2^63; a graph
  * whose path counts overflow Long at the chosen depth needs the
  * log-space variant, which this operator deliberately trades away
  * for the exact hash gate.
  *
  * Returns (node, bc_scaled) for every non-source node reached by any
  * source — bc in `1/scale` units, dependency truncated per term.
  */
object Betweenness {

  /** Source-keyed forward BFS carrying path counts — the shared
    * first half of Brandes: (s, node, dist, σ) for every node within
    * `rounds` hops of each seed. Renamed edge columns + name-resolved
    * join conditions: frontier and visited DERIVE from the edge frame,
    * so dataset-tagged refs (e("dst")) trip the ambiguous-self-join
    * check as soon as eager = false leaves the lineage untruncated
    * (the PlanAudit pipeline).
    */
  def forward(edges: DataFrame, seeds: DataFrame, rounds: Int,
              eager: Boolean = true): DataFrame = {
    def ck(df: DataFrame) = if (eager) df.localCheckpoint(true) else df
    val e = edges.select(col("src").as("e_src"), col("dst").as("e_dst"))
    var visited = ck(seeds.select(col("node").as("s")).distinct()
      .select(col("s"), col("s").as("node"), lit(0).as("dist"),
        lit(1L).as("sigma")))
    var frontier = visited
    for (i <- 1 to rounds) {
      val next = ck(frontier
        .join(e, col("node") === col("e_src"))
        .select(col("s"), col("e_dst").as("node"), col("sigma"))
        .join(visited.select(col("s"), col("node")), Seq("s", "node"),
          "left_anti")
        .groupBy(col("s"), col("node"))
        .agg(sum(col("sigma")).as("sigma"))
        .select(col("s"), col("node"), lit(i).as("dist"), col("sigma")))
      visited = ck(visited.unionAll(next))
      frontier = next
    }
    visited
  }

  /** Harmonic (closeness-family) centrality from the same seeded
    * sources: H(v) = Σ_s scale div d(s, v) over sources that reach v —
    * the standard sampled estimator (unreached pairs contribute 0,
    * which is harmonic centrality's whole point vs classic closeness).
    * Just the forward pass + one integer aggregate; `scale div dist`
    * is the same truncating division as the Brandes backward pass, so
    * the oracle replays it with `//`. Returns (node, hc_scaled,
    * n_sources); the `dist > 0` filter excludes each source's own
    * zero-distance row only — a seed reached by ANOTHER seed within
    * `rounds` is still scored like any node (and the oracle scores it
    * identically).
    */
  def harmonic(edges: DataFrame, seeds: DataFrame, rounds: Int,
               scale: Long = 10000L, eager: Boolean = true): DataFrame =
    harmonicFromForward(forward(edges, seeds, rounds, eager), scale)

  /** [[harmonic]]'s aggregate half over a PRECOMPUTED forward frame —
    * the staged-shared-state entry point (the HyperBall `packedStates`
    * precedent): `graph_harmonic` and `graph_betweenness` share the
    * identical (s, node, dist, σ) forward pass, so a caller running
    * both materializes [[forward]] once and feeds it to this and to
    * [[runFromForward]].
    */
  def harmonicFromForward(visited: DataFrame, scale: Long = 10000L): DataFrame =
    visited
      .where(col("dist") > 0)
      .groupBy(col("node"))
      .agg(sum(expr(s"$scale div dist")).as("hc_scaled"),
        count(lit(1)).as("n_sources"))

  def run(edges: DataFrame, seeds: DataFrame, rounds: Int,
          scale: Long = 10000L, eager: Boolean = true): DataFrame =
    runFromForward(forward(edges, seeds, rounds, eager), edges, rounds,
      scale, eager)

  /** The backward (dependency-accumulation) half of Brandes over a
    * PRECOMPUTED forward frame — see [[harmonicFromForward]] for the
    * staging contract. `rounds` must equal the forward pass's depth.
    */
  def runFromForward(visited: DataFrame, edges: DataFrame, rounds: Int,
          scale: Long = 10000L, eager: Boolean = true): DataFrame = {
    // rounds = 0 has no deepest level to seed δ from (the accumulator
    // below would be empty and reduce would throw); the algorithm's
    // meaningful domain starts at one hop
    require(rounds >= 1, s"Brandes backward pass needs rounds >= 1, got $rounds")
    def ck(df: DataFrame) = if (eager) df.localCheckpoint(true) else df
    val e = edges.select(col("src").as("e_src"), col("dst").as("e_dst"))

    // backward: deepest level seeds δ = 0; each shallower level joins
    // its successor level's (σ, δ) through the edges
    var delta = ck(visited.where(col("dist") === rounds)
      .select(col("s"), col("node"), lit(0L).as("delta")))
    val acc = Seq.newBuilder[DataFrame]
    if (rounds > 0) acc += delta
    for (d <- (rounds - 1) to 0 by -1) {
      val lvl = visited.where(col("dist") === d)
        .select(col("s"), col("node"), col("sigma"))
      val succ = visited.where(col("dist") === d + 1)
        .select(col("s").as("ws"), col("node").as("wnode"),
          col("sigma").as("wsigma"))
        .join(delta.select(col("s").as("ws"), col("node").as("wnode"),
          col("delta").as("wdelta")), Seq("ws", "wnode"))
      val contrib = lvl
        .join(e, col("node") === col("e_src"))
        .join(succ, col("s") === col("ws") && col("e_dst") === col("wnode"))
        .groupBy(col("s"), col("node"))
        .agg(sum(expr(s"(sigma * ($scale + wdelta)) div wsigma"))
          .as("cdelta"))
      delta = ck(lvl.select(col("s"), col("node"))
        .join(contrib, Seq("s", "node"), "left")
        .select(col("s"), col("node"),
          coalesce(col("cdelta"), lit(0L)).as("delta")))
      if (d > 0) acc += delta // dist-0 rows are the sources themselves
    }

    acc.result().reduce(_ unionAll _)
      .groupBy(col("node"))
      .agg(sum(col("delta")).as("bc_scaled"))
  }
}
