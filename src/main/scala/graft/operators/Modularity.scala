package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Newman modularity of a community partition — the SCORE half of
  * community detection (LabelProp finds the partition, this prices it;
  * a pipeline tunes round counts / graph constructions by exactly this
  * number, Newman & Girvan 2004). For an undirected graph given as a
  * SYMMETRIZED directed edge list (both directions present, no
  * duplicates, no self-loops — the supply-graph contract):
  *
  *   Q = Σ_c ( e_c/m − (d_c/2m)² )  =  Σ_c (M·i_c − d_c²) / M²
  *
  * where M = |directed rows| = 2m, i_c = directed intra-community rows
  * (= 2·e_c) and d_c = Σ degrees in c — so each community's
  * contribution has the exact-integer numerator q_num = M·i_c − d_c²
  * over the shared denominator M². The output carries ONLY integers
  * (the PageRank fixed-point discipline): no float ever forms, the
  * gate is exact, and Q itself is Σ q_num / m_dir² for any consumer
  * that wants the scalar.
  *
  * Scale shape: two O(|E|) label joins (the |V|-row label table
  * broadcasts under the LabelProp/PageRank gate regime or shuffles
  * above it — either way the edge list streams), one map-side-combined
  * degree aggregate, one 1-row edge-count aggregate broadcast back
  * (the text_bm25 discipline — never a driver collect). Integer-range
  * note: q_num is exact while d_c² < 2^63, i.e. M < ~3·10^9 directed
  * edges; beyond that the numerator needs the decimal(38) widening —
  * the documented trade for the exact hash gate at tested volumes.
  */
object Modularity {

  /** Per-community modularity table: (community, n_nodes, e_dir,
    * d_sum, q_num, m_dir), ordered by the caller. `labels` is
    * (node, community) covering every node of `edges`.
    */
  def score(edges: DataFrame, labels: DataFrame): DataFrame = {
    val la = labels.select(col("node").as("src"), col("community").as("ca"))
    val lb = labels.select(col("node").as("dst"), col("community").as("cb"))
    val intra = edges.join(la, "src").join(lb, "dst")
      .where(col("ca") === col("cb"))
      .groupBy(col("ca").as("community"))
      .agg(count(lit(1)).as("e_dir"))
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("d"))
      .localCheckpoint(true) // one |V|-row frame feeds d_sum AND m_dir
    val dsum = deg
      .join(labels.select(col("node").as("src"), col("community")), "src")
      .groupBy(col("community"))
      .agg(sum(col("d")).as("d_sum"), count(lit(1)).as("n_nodes"))
    // M = Σ out-degrees — the edge list is scanned twice (degrees +
    // intra), never a third time for the count
    val mRow = deg.agg(sum(col("d")).as("m_dir"))
    dsum.join(intra, Seq("community"), "left")
      .crossJoin(broadcast(mRow))
      .select(col("community"), col("n_nodes"),
        coalesce(col("e_dir"), lit(0L)).as("e_dir"), col("d_sum"),
        (col("m_dir") * coalesce(col("e_dir"), lit(0L))
          - col("d_sum") * col("d_sum")).as("q_num"),
        col("m_dir"))
  }
}
