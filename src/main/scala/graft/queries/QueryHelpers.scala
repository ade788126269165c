package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared helpers for oracle-checked queries.
  *
  * Determinism contract with the DuckDB oracle (SURVEY §7.5):
  *  - per-row float expressions are written with the SAME operations in
  *    the SAME order on both engines → bit-identical;
  *  - aggregates whose accumulation order varies (sum/avg over shuffled
  *    partitions) are scaled and rounded;
  *  - rounding is `floor(x·10ⁿ + 0.5)/10ⁿ` on BOTH engines — engine
  *    `round()` implementations differ (Spark: BigDecimal HALF_UP on the
  *    shortest decimal repr; DuckDB: multiply + rint) and can disagree on
  *    boundary values, whereas floor/multiply/add are identical IEEE ops;
  *  - every query ORDERs BY a unique integer key prefix;
  *  - output columns carry identical names and types on both sides.
  */
object QueryHelpers {

  /** Deterministic cross-engine rounding: floor(x·10ⁿ + 0.5)/10ⁿ. */
  def rnd(c: Column, digits: Int): Column = {
    val p = math.pow(10.0, digits)
    floor(c * lit(p) + lit(0.5)) / lit(p)
  }

  /** SQL twin of [[rnd]] — keep in exact sync. */
  def rndSql(expr: String, digits: Int): String = {
    val p = math.pow(10.0, digits)
    s"floor(($expr) * ${p} + 0.5) / ${p}"
  }

  /** Deterministic hash bucket in [0, 100): first 8 hex digits of
    * md5(key) as an integer, mod 100 — the zero-`rand()` split/sample
    * primitive (content-hash determinism survives repartitioning).
    */
  def hashBucket(key: Column): Column =
    pmod(conv(substring(md5(key), 1, 8), 16, 10).cast("long"), lit(100L))

  /** SQL twin of [[hashBucket]] — keep in exact sync. */
  def hashBucketSql(k: String): String =
    s"CAST('0x' || substr(md5($k), 1, 8) AS BIGINT) % 100"
}
