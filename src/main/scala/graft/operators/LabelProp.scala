package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Synchronous label-propagation community detection (Raghavan et al.,
  * 2007) with DETERMINISTIC semantics: every node starts in its own
  * community; each round every node adopts the label carried by the
  * PLURALITY of its neighbors, ties broken to the smallest label.
  * Classic LPA breaks ties randomly and is therefore unreproducible —
  * the deterministic tie-break is what lets the oracle replay the
  * identical rounds as unrolled CTEs (and what makes reruns/retries
  * idempotent on a cluster, where a nondeterministic operator breaks
  * Spark's task-retry model).
  *
  * Round count is FIXED (not run-to-convergence): synchronous LPA can
  * two-cycle on bipartite structures — a fixpoint is not guaranteed to
  * exist, so "iterate until stable" is not a well-defined operator.
  * Fixed rounds + deterministic ties give a total, schedule-independent
  * semantics at any scale.
  *
  * Scale shape: each round is one O(|E|) equi-join + two map-side-
  * combined aggregates ((node, label) counts, then the per-node argmax
  * via min(struct(-count, label))); the label table is O(|V|) and
  * per-round localCheckpoint keeps planning flat, same as the other
  * iterative operators.
  */
object LabelProp {

  /** (node, community) after `rounds` synchronous rounds over the
    * symmetrized `edges` (src, dst).
    *
    * `broadcastLabels` is [[PageRank.run]]'s two-regime gate on the
    * |V|-row label table: when vertex state fits an executor the
    * per-round join is a narrow broadcast pass over the edges (no edge
    * shuffle/sort per round); billion-node graphs self-select the
    * shuffle join by the measured node count. Plurality/min-label
    * argmax is placement-free, so both regimes are bit-identical.
    */
  def run(edges: DataFrame, rounds: Int,
      broadcastLabels: Option[Boolean] = None,
      broadcastMaxNodes: Long = 5000000L): DataFrame =
    runStates(edges, rounds, broadcastLabels, broadcastMaxNodes).last

  /** Every intermediate partition (node, community) after rounds
    * 1..`rounds` — ONE loop run, `rounds` materialized label tables
    * (each round already localCheckpoints, so keeping the
    * intermediates is free). This is the staging shape for
    * modularity-guided round-count tuning (`graph_modularity_sweep`):
    * the sweep prices every state without re-running the loop per
    * candidate. [[run]] is `runStates(...).last`.
    */
  def runStates(edges: DataFrame, rounds: Int,
      broadcastLabels: Option[Boolean] = None,
      broadcastMaxNodes: Long = 5000000L): Seq[DataFrame] = {
    require(rounds >= 1, s"LPA needs at least one round, got $rounds" +
      " (round 1 is fused into the label init)")
    val e = edges.select(col("src").as("u"), col("dst").as("v"))
      .unionAll(edges.select(col("dst").as("u"), col("src").as("v")))
      .cache()
    // round 1 FUSED with init: under identity labels (lbl(v) = v) the
    // neighbor-label counts are just the (u, v) edge multiplicities, so
    // the O(|E|) label join is a no-op — two aggregates replace
    // distinct-init + join + two aggregates (exact for multigraphs too:
    // the count runs over the raw edge multiset)
    var labels = e.groupBy(col("u").as("d"), col("v").as("lbl"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("d"))
      .agg(min(struct((col("c") * lit(-1L)).as("nc"), col("lbl"))).as("m"))
      .select(col("d"), col("m.lbl").as("lbl"))
      .localCheckpoint(true)
    val states = scala.collection.mutable.ArrayBuffer(labels)
    val doBroadcast = PageRank.chooseBroadcast(broadcastLabels,
      eager = true, labels.count(), broadcastMaxNodes)
    for (_ <- 2 to rounds) {
      val labelSide = if (doBroadcast) broadcast(labels) else labels
      labels = e.join(labelSide, e("v") === labelSide("d"))
        .groupBy(e("u").as("d"), col("lbl"))
        .agg(count(lit(1)).as("c"))
        .groupBy(col("d"))
        .agg(min(struct((col("c") * lit(-1L)).as("nc"), col("lbl"))).as("m"))
        .select(col("d"), col("m.lbl").as("lbl"))
        .localCheckpoint(true)
      states += labels
    }
    e.unpersist(blocking = true)
    states.toSeq
      .map(_.select(col("d").as("node"), col("lbl").as("community")))
  }
}
