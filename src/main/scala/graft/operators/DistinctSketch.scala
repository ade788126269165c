package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic HyperLogLog register table — the mergeable
  * distinct-count sketch with an EXACT cross-engine gate.
  *
  * `q_rolling_actives_hll` uses Spark's datasketches HLL, whose binary
  * has no cross-engine twin, so its gate pins an error-bound boolean.
  * This sketch is the same structure built from first principles on the
  * md5-derived 60-bit hash: register = h mod 2^p, rank = leading-zero
  * count of the remaining 52 bits + 1 — computed via `length(bin(x))`
  * (integer string ops, identical in Spark and DuckDB), so the whole
  * register table hash-gates exactly and the estimate is a pure driver
  * fold over it ([[estimate]], spec-pinned against the exact count).
  *
  * Scale shape: the register table is ≤ 2^p rows whatever the input
  * volume, built by one map-side-combined max-aggregate — and register
  * MAX is associative/commutative, so per-partition sketches merge
  * without error: the distributed-distinct structure you keep per
  * segment/day and union at query time (union = elementwise max,
  * pinned in AnalyticSpec).
  */
object DistinctSketch {

  /** Register count exponent: 2^8 = 256 registers. */
  val P = 8
  val Registers: Int = 1 << P

  /** 52-bit suffix width (60-bit md5 hash minus the 8 register bits);
    * rank = 53 − length(bin(suffix)), suffix 0 → 53. */
  val MaxRank = 53

  /** 60-bit deterministic hash of a key column (same md5 idiom as the
    * shingle hashes — first 15 hex digits). */
  def hash60(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 15), 16, 10).cast("long")

  /** Register index of a key. reg/suffix splits use pure integer ops:
    * Column `/` is DOUBLE division and a 60-bit hash rounds above 2^53 —
    * pmod/shiftright are the exact mod/div (hash60 is non-negative). */
  def regCol(key: Column): Column =
    pmod(hash60(key), lit(Registers.toLong))

  /** Leading-zero rank of a key's 52-bit suffix (1..MaxRank). */
  def rankCol(key: Column): Column = {
    val sfx = shiftright(hash60(key), P)
    when(sfx === 0, lit(MaxRank))
      .otherwise(lit(MaxRank) - length(bin(sfx)))
      .cast("long")
  }

  /** (reg, max_rank) register table of the key column; absent registers
    * (no key hashed there) are absent rows — identically on both
    * engines. */
  def registers(rows: DataFrame, keyCol: String): DataFrame =
    rows.where(col(keyCol).isNotNull)
      .select(regCol(col(keyCol)).as("reg"), rankCol(col(keyCol)).as("rank"))
      .groupBy(col("reg")).agg(max(col("rank")).as("max_rank"))

  // ---- parameterized register width (the profiler wants more
  // registers than the default 2^8: per-column distinct counts must
  // sit inside a 5% accuracy pin, and 2^12 gives sigma ~1.6% where 2^8
  // gives ~6.5%) --------------------------------------------------------

  /** Max rank for register exponent `p`: the 60-bit hash leaves a
    * (60−p)-bit suffix, rank = lzc+1 ∈ [1, 60−p+1]. */
  def maxRankP(p: Int): Int = 60 - p + 1

  /** Register index under exponent `p` (2^p registers). */
  def regColP(key: Column, p: Int): Column =
    pmod(hash60(key), lit((1L << p)))

  /** Leading-zero rank of the (60−p)-bit suffix under exponent `p` —
    * same `length(bin(...))` integer idiom as [[rankCol]], so the
    * register table hash-gates exactly on both engines. */
  def rankColP(key: Column, p: Int): Column = {
    val sfx = shiftright(hash60(key), p)
    when(sfx === 0, lit(maxRankP(p)))
      .otherwise(lit(maxRankP(p)) - length(bin(sfx)))
      .cast("long")
  }

  /** Standard HLL estimate (with the linear-counting small-range
    * correction) from a collected register table — driver-side, for
    * spec pins and interactive use; the distributed artifact is the
    * register table itself. */
  def estimate(regs: Map[Long, Long]): Double = {
    val m = Registers.toDouble
    val sum = (0 until Registers).map { r =>
      math.pow(2.0, -regs.getOrElse(r.toLong, 0L).toDouble)
    }.sum
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    val raw = alpha * m * m / sum
    val zeros = Registers - regs.size
    if (raw <= 2.5 * m && zeros > 0) m * math.log(m / zeros) else raw
  }
}
