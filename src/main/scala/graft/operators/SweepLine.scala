package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale-safe global running sum over an ordered delta stream — the
  * sweep-line primitive behind concurrency counting (q_concurrency).
  *
  * A global `Window.orderBy(ts)` funnels every row through ONE
  * partition — fine for a session-level delta stream (two rows per
  * session), fatal if the stream itself is 100-TB-class. This is the
  * classic two-pass prefix-sum decomposition instead:
  *
  *   1. range-bucket rows by ts (fixed integer width off a broadcast
  *      1-row min/max aggregate — deterministic and ts-monotone, so
  *      bucket order IS time order);
  *   2. per-bucket local running sums — a PARTITIONED window, parallel
  *      across buckets;
  *   3. per-bucket totals (map-side-combined aggregate) → exclusive
  *      prefix over the B-row bucket frame (the only global window,
  *      B rows total) → broadcast the offsets back;
  *   4. global running value = local running + preceding-bucket offset.
  *
  * Equality with the single-window form is exact: addition is
  * associative and the (ts, delta) sort order within a bucket matches
  * the global sort order restricted to that bucket (reference analogue:
  * the same split/merge the reference's mapper-side partials +
  * reducer merge perform for sums, master.py:242-244).
  *
  * The registered q_concurrency keeps the simple global-window form —
  * its delta stream is two rows per session, far below the funnel
  * threshold — with this operator as the documented 100-TB path;
  * AnalyticSpec proves the two agree on the fixture stream.
  */
object SweepLine {

  /** Running sum of `delta` over rows ordered by (ts, delta), computed
    * with per-bucket parallelism. Input columns: ts BIGINT, delta
    * INT/BIGINT. Returns (ts, delta, cur). `nBuckets` bounds the
    * range-partition count (the per-bucket window's parallelism).
    */
  def runningSum(deltas: DataFrame, nBuckets: Int = 32): DataFrame = {
    require(nBuckets > 0)
    val bounds = deltas.agg(min(col("ts")).as("lo"), max(col("ts")).as("hi"))
    // integer bucket width, ceil'd so bucket ids stay < nBuckets;
    // width >= 1 guards the all-one-ts stream (lo == hi)
    val bucketed = deltas.crossJoin(broadcast(bounds))
      .withColumn("w", greatest(
        expr(s"(hi - lo + $nBuckets) DIV $nBuckets"), lit(1L)))
      .withColumn("bkt", expr("CAST((ts - lo) DIV w AS INT)"))
      .drop("lo", "hi", "w")
    val localW = Window.partitionBy(col("bkt"))
      .orderBy(col("ts"), col("delta"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = bucketed.withColumn("local_cur", sum(col("delta")).over(localW))
    // exclusive prefix of bucket totals: B rows, the only global pass
    val offW = Window.orderBy(col("bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = bucketed.groupBy(col("bkt"))
      .agg(sum(col("delta")).as("tot"))
      .withColumn("off", coalesce(sum(col("tot")).over(offW), lit(0L)))
      .select(col("bkt"), col("off"))
    local.join(broadcast(offsets), "bkt")
      .select(col("ts"), col("delta"),
        (col("local_cur") + col("off")).as("cur"))
  }
}
