package graft.operators

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Flagship high-level form (SURVEY §3.1 closing note): the full iterative
  * fit delegated to `ml.clustering.KMeans`, which is the same
  * assign→partial-agg→collect loop with the |a|²+|b|²−2a·b distance form
  * and triangle-inequality pruning. Cross-checked against our own loop in
  * tests; exposed as `SparkEntry.entry` over the 64-dim embeddings table.
  */
object MLlibFlagship {

  /** Fit K clusters on the embeddings table; returns one row per centroid:
    * (cluster_id, centroid ARRAY<DOUBLE>, size).
    */
  def run(spark: SparkSession, sfDir: String, k: Int = 10, maxIter: Int = 20, seed: Long = 42L): DataFrame = {
    import spark.implicits._
    val emb = graft.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"),
        array_to_vector(col("embedding")).as("features"))
    val model = new KMeans()
      .setK(k).setMaxIter(maxIter).setSeed(seed).setTol(1e-4)
      .fit(emb)
    val sizes = model.summary.clusterSizes
    model.clusterCenters.zipWithIndex.toSeq
      .map { case (v, i) => (i, v.toArray, sizes(i).toLong) }
      .toDF("cluster_id", "centroid", "size")
  }
}
