package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Weighted single-source (multi-seed) shortest paths — fixed-round
  * distributed Bellman-Ford, the weighted twin of [[Bfs]] and the
  * fifth member of the iterate-join-aggregate family the reference's
  * driver loop instantiates (master.py:352-366). BFS answers "how many
  * hops"; this answers "what is the cheapest route" over integer edge
  * weights (lead times, costs, latencies).
  *
  * DELTA form, not full relaxation: round i propagates only from
  * nodes whose distance IMPROVED in round i−1 — per-round join input
  * is the changed set, not the whole distance table. This is exactly
  * equal to full Bellman-Ford round by round (if u was unchanged at
  * round i−1, every u-relaxation was already dominated in round i−1's
  * merge — induction), so the DuckDB oracle replays the SIMPLER full
  * relaxation as unrolled CTEs and the tables match exactly. At 100 TB
  * the delta form is the difference between shuffling the frontier's
  * expansion per round and shuffling |V| per round after distances
  * have mostly settled.
  *
  * Candidates are min-combined per round BEFORE the merge join (one
  * map-side-combined aggregate), so the full-outer merge sees one row
  * per touched node. Every round's outputs are eagerly
  * localCheckpoint'ed — the lineage-truncation lesson of
  * [[Dedup.connectedComponents]] / [[KCore]] / [[Bfs]].
  *
  * Determinism: distance is a min over path weights (integer sums) —
  * order- and parallelism-free; a fixed round count bounds the path
  * LENGTH considered (rounds ≥ diameter ⇒ exact SSSP), mirroring the
  * fixed-iteration policy of the other family members.
  */
object Sssp {

  /** Fixed-`rounds` Bellman-Ford over directed weighted `edges`
    * (src, dst, w — integer weights) from `seeds` (node). Returns
    * (node, d): cheapest known path weight within `rounds` edges;
    * seeds at d = 0.
    */
  def run(edges: DataFrame, seeds: DataFrame, rounds: Int,
          eager: Boolean = true): DataFrame = {
    def ck(df: DataFrame) = if (eager) df.localCheckpoint(true) else df
    val e = edges.select(col("src"), col("dst"), col("w"))
    var dist = ck(seeds.select(col("node")).distinct()
      .withColumn("d", lit(0L)))
    var changed = dist
    for (_ <- 1 to rounds) {
      val cand = e.join(changed, e("src") === changed("node"))
        .select(e("dst").as("node"), (col("d") + col("w")).as("nd"))
        .groupBy(col("node")).agg(min(col("nd")).as("nd"))
      val merged = ck(dist.join(cand, Seq("node"), "full_outer")
        .select(col("node"),
          least(coalesce(col("d"), lit(Long.MaxValue)),
            coalesce(col("nd"), lit(Long.MaxValue))).as("d"),
          (coalesce(col("nd"), lit(Long.MaxValue)) <
            coalesce(col("d"), lit(Long.MaxValue))).as("improved")))
      changed = merged.where(col("improved")).select(col("node"), col("d"))
      dist = merged.select(col("node"), col("d"))
    }
    dist
  }

  /** Run-to-fixpoint audit variant: relaxes until no distance improves
    * (an empty changed set ⟺ every relaxation is dominated ⟺ exact
    * shortest paths — Bellman-Ford convergence). Throws after
    * `maxRounds` (a negative-free graph converges within |V| rounds,
    * so non-convergence here means maxRounds is too low). The
    * fixed-round production form stays the default; this mode proves
    * (or refutes) a chosen round count on real data — the
    * [[KCore.peelConverged]] policy applied to shortest paths.
    */
  def runConverged(edges: DataFrame, seeds: DataFrame,
      maxRounds: Int = 64): DataFrame = {
    val e = edges.select(col("src"), col("dst"), col("w"))
    var dist = seeds.select(col("node")).distinct()
      .withColumn("d", lit(0L)).localCheckpoint(true)
    var changed = dist
    var round = 0
    var changedSize = changed.count()
    while (changedSize > 0 && round < maxRounds) {
      round += 1
      val cand = e.join(changed, e("src") === changed("node"))
        .select(e("dst").as("node"), (col("d") + col("w")).as("nd"))
        .groupBy(col("node")).agg(min(col("nd")).as("nd"))
      val merged = dist.join(cand, Seq("node"), "full_outer")
        .select(col("node"),
          least(coalesce(col("d"), lit(Long.MaxValue)),
            coalesce(col("nd"), lit(Long.MaxValue))).as("d"),
          (coalesce(col("nd"), lit(Long.MaxValue)) <
            coalesce(col("d"), lit(Long.MaxValue))).as("improved"))
        .localCheckpoint(true)
      changed = merged.where(col("improved")).select(col("node"), col("d"))
      dist = merged.select(col("node"), col("d"))
      changedSize = changed.count()
    }
    if (changedSize > 0)
      throw new IllegalStateException(
        s"Sssp.runConverged: distances still improving after $maxRounds rounds; " +
          "raise maxRounds")
    dist
  }
}
