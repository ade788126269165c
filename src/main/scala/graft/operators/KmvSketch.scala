package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** KMV (k-minimum-values) sketch — deterministic distinct-count
  * estimation with SET ALGEBRA: the k smallest md5-derived hash values
  * of a set determine its cardinality estimate, and the k-min array of
  * a UNION is the k smallest of the merged k-min arrays, so union (and
  * by inclusion-exclusion, intersection) estimates come from the
  * sketches alone — "how many users in segment A ∩ B" without ever
  * re-scanning either side. The register sketch ([[DistinctSketch]])
  * answers one set's cardinality; KMV is the one that composes.
  *
  * Everything is deterministic: k smallest distinct hashes is a pure
  * order statistic of the md5 hash (no RNG, no implementation-defined
  * binary), so both engines produce identical sketches AND identical
  * estimates (the estimator is the same literal/division sequence) —
  * exact hash gate, like the other sketch family members.
  *
  * Scale shape: the per-group k-min selection runs on the bounded-heap
  * [[graft.plans.TopKPerGroup]] custom exec — O(n log k) per partition,
  * no per-group sort — then one ≤ k-row-per-group collect_list. Pair
  * algebra operates on k-length arrays only.
  */
object KmvSketch {

  /** Sketch size: estimates carry ~1/√(k−2) ≈ 13% relative error. */
  val K = 64

  /** (k−1)·2⁶⁰ — the estimator numerator over the 60-bit hash space,
    * injected as the SAME double literal in oracle SQL (Double.toString
    * round-trips bit-exactly through DuckDB's parser). */
  val Scale: Double = (K - 1).toDouble * math.pow(2.0, 60)

  /** Per-group sketches: (grp, ks sorted array of ≤K min hashes, n). */
  def sketches(rows: DataFrame, grpCol: String, keyCol: String): DataFrame = {
    val d = rows.where(col(keyCol).isNotNull)
      .select(col(grpCol).as("grp"),
        DistinctSketch.hash60(col(keyCol)).as("h"))
      .distinct()
    graft.plans.TopKPerGroup(d, Seq("grp"), "h", descending = false, k = K)
      .groupBy(col("grp"))
      .agg(sort_array(collect_list(col("h"))).as("ks"))
  }

  /** Distinct estimate from a k-min array: exact when the set was
    * smaller than K (the sketch IS the set), else (K−1)·2⁶⁰ / kth-min. */
  def estimate(ks: Column): Column =
    when(size(ks) < K, size(ks).cast("double"))
      .otherwise(lit(Scale) / element_at(ks, K).cast("double"))

  /** Union k-min array of two sketches. */
  def unionKs(a: Column, b: Column): Column =
    slice(array_sort(array_union(a, b)), 1, K)
}
