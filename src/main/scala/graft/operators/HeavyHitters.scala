package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Exact distributed heavy hitters (frequent items) via the two-phase
  * Misra-Gries pattern — find every key whose frequency exceeds n/k
  * WITHOUT a full-domain groupBy.
  *
  * Phase 1 runs a k-counter Misra-Gries summary per partition
  * (mapPartitions, zero shuffle): any key with global frequency > n/k
  * must exceed n_p/k in at least one partition (pigeonhole over the
  * partition average), and a k-counter MG summary provably retains every
  * key with local frequency > n_p/k — so the union of the per-partition
  * survivor sets is a candidate SUPERSET of the true heavy hitters, at
  * most k keys per partition regardless of domain size. Phase 2 exactly
  * recounts ONLY candidate rows (broadcast semi-join, then a groupBy
  * whose key domain is ≤ k·P) and applies the exact threshold
  * `freq · k > n` in integer arithmetic.
  *
  * Why not a plain groupBy-filter: at 100 TB with a high-cardinality key
  * (URLs, doc hashes) the full groupBy shuffles one row PER DISTINCT KEY
  * — billions — to find the handful above threshold. Here the shuffle
  * carries ≤ k keys per partition in phase 1 (collected, tiny) and only
  * heavy-candidate rows in phase 2; the result is still EXACT, which is
  * what lets the DuckDB oracle check it with the naive HAVING form.
  */
object HeavyHitters {

  /** Misra-Gries summary of one partition: at most k surviving keys. */
  private def misraGries(it: Iterator[Long], k: Int): Iterator[Long] = {
    val counters = new scala.collection.mutable.HashMap[Long, Long]()
    it.foreach { x =>
      counters.get(x) match {
        case Some(c) => counters.update(x, c + 1)
        case None =>
          if (counters.size < k) counters.update(x, 1L)
          else {
            // decrement-all step; drop zeroed counters
            val dead = List.newBuilder[Long]
            counters.foreach { case (key, c) =>
              if (c == 1L) dead += key else counters.update(key, c - 1)
            }
            dead.result().foreach(counters.remove)
          }
      }
    }
    counters.keysIterator
  }

  /** Exact keys of `keyCol` (BIGINT) with frequency · k > total rows,
    * with their exact counts.
    */
  def frequentKeys(spark: SparkSession, df: DataFrame, keyCol: String,
      k: Int): DataFrame = {
    import spark.implicits._
    val keys = df.select(col(keyCol).cast("long")).na.drop()
    val n = keys.count()
    val candidates = keys.as[Long]
      .mapPartitions(it => misraGries(it, k))
      .distinct()
      .toDF(keyCol)
    // candidate set is ≤ k·P keys — broadcast it so the recount filter
    // is a narrow scan-side semi-join, then the groupBy shuffles only
    // candidate rows
    keys.toDF(keyCol)
      .join(broadcast(candidates), Seq(keyCol), "left_semi")
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("freq"))
      .where(col("freq") * lit(k.toLong) > lit(n))
      .withColumn("n_total", lit(n))
  }
}
