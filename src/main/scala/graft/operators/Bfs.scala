package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Frontier breadth-first search — multi-source shortest hop counts,
  * the reachability primitive behind "what can this supplier reach in
  * N hops" and impact analysis over dependency graphs. Fourth member
  * of the iterate-join-aggregate family the reference's driver loop
  * instantiates (master.py:352-366), alongside k-means, hash-min
  * connected components and PageRank.
  *
  * FRONTIER form, not full relaxation: round i joins ONLY the nodes
  * discovered in round i-1 against the edge list and anti-joins the
  * visited set — per-round shuffle is O(|frontier expansion|), not
  * O(|V|). A full min-relax (every node re-propagating every round)
  * shuffles the whole distance table each round; on a 100-TB graph
  * where BFS saturates in a few hops, the frontier form's total work
  * is O(|E reached|) across ALL rounds, which is the optimum. Each
  * round's result is eagerly localCheckpoint'ed — same lineage-
  * truncation lesson as [[Dedup.connectedComponents]] and [[KCore]]
  * (without it planning cost grows superlinearly in rounds).
  *
  * Determinism: hop distance is a min over paths and every round is a
  * set union — order- and parallelism-free, so a fixed-round run is
  * replayable as unrolled SQL CTEs on any engine with zero slack.
  */
object Bfs {

  /** Fixed-`rounds` multi-source BFS over directed `edges` (src, dst)
    * from `seeds` (node). Returns (node, dist) for every node reached
    * within `rounds` hops; seeds are at dist 0.
    */
  def run(edges: DataFrame, seeds: DataFrame, rounds: Int,
          eager: Boolean = true): DataFrame = {
    def ck(df: DataFrame) = if (eager) df.localCheckpoint(true) else df
    val e = edges.select(col("src"), col("dst"))
    var visited = ck(seeds.select(col("node")).distinct()
      .withColumn("dist", lit(0)))
    var frontier = visited.select(col("node"))
    for (i <- 1 to rounds) {
      val next = ck(e.join(frontier, e("src") === frontier("node"), "left_semi")
        .select(col("dst").as("node")).distinct()
        .join(visited.select(col("node")), Seq("node"), "left_anti")
        .withColumn("dist", lit(i)))
      visited = ck(visited.unionAll(next))
      frontier = next.select(col("node"))
    }
    visited
  }

  /** Run-to-fixpoint audit variant: expands until the frontier is
    * empty (an empty frontier ⟺ every reachable node is visited ⟺
    * exact hop distances — BFS discovery is monotone). Throws after
    * `maxRounds` instead of returning a partial reach. The fixed-round
    * production form stays the default; this mode proves (or refutes)
    * a chosen round count on real data — the [[KCore.peelConverged]]
    * policy applied to reachability.
    */
  def runConverged(edges: DataFrame, seeds: DataFrame,
      maxRounds: Int = 64): DataFrame = {
    val e = edges.select(col("src"), col("dst"))
    var visited = seeds.select(col("node")).distinct()
      .withColumn("dist", lit(0)).localCheckpoint(true)
    var frontier = visited.select(col("node"))
    var round = 0
    var frontierSize = frontier.count()
    while (frontierSize > 0 && round < maxRounds) {
      round += 1
      val next = e.join(frontier, e("src") === frontier("node"), "left_semi")
        .select(col("dst").as("node")).distinct()
        .join(visited.select(col("node")), Seq("node"), "left_anti")
        .withColumn("dist", lit(round)).localCheckpoint(true)
      visited = visited.unionAll(next).localCheckpoint(true)
      frontier = next.select(col("node"))
      frontierSize = next.count()
    }
    if (frontierSize > 0)
      throw new IllegalStateException(
        s"Bfs.runConverged: frontier still non-empty after $maxRounds rounds; " +
          "raise maxRounds")
    visited
  }
}
