package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) interleaving for multi-dimensional data clustering.
  *
  * The reference's only layout lever is 1-D: hash-mod routing to
  * partition files (`mapper.py:53-74`). At 100 TB a table is routinely
  * filtered on TWO OR MORE columns at once, and any 1-D sort/partition
  * layout prunes only its leading column — a predicate on the other
  * column touches every file. Sorting by the z-value interleaves the
  * coordinates' bits, so files cover compact boxes in (x, y) space and
  * a range predicate on EITHER column (or both) overlaps only
  * ~sqrt-fraction of files via plain parquet min/max skipping — the
  * data-clustering technique behind Delta/Iceberg OPTIMIZE ZORDER,
  * realized here with stock Spark: `repartitionByRange(zvalue)` +
  * `sortWithinPartitions(zvalue)` at write time, ordinary pushed
  * filters at read time (see ScaleSpec "z-order layout prunes on the
  * non-leading dimension").
  *
  * The z-value is a pure bit-shuffle built from codegen'd integer ops
  * (shift/and/or — whole-stage-codegen friendly, no UDF); [[zvalueSql]]
  * emits the identical arithmetic for the DuckDB oracle from the same
  * loop, so both engines compute bit-identical keys.
  */
object ZOrder {

  /** Interleave the low `bits` bits of two non-negative integer columns:
    * bit i of x lands at position 2i, bit i of y at 2i+1. Monotone in
    * the box-containment sense required for skipping.
    */
  def zvalue2(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")
    val xl = x.cast("long")
    val yl = y.cast("long")
    (0 until bits).flatMap { i =>
      Seq(
        shiftleft(shiftrightunsigned(xl, i).bitwiseAND(lit(1L)), 2 * i),
        shiftleft(shiftrightunsigned(yl, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)
  }

  /** SQL twin of [[zvalue2]] — generated from the same loop; keep in
    * exact sync. `x`/`y` are SQL sub-expressions of non-negative BIGINT.
    */
  def zvalueSql(x: String, y: String, bits: Int): String = {
    require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")
    (0 until bits).flatMap { i =>
      Seq(
        s"(((($x) >> $i) & 1) << ${2 * i})",
        s"(((($y) >> $i) & 1) << ${2 * i + 1})")
    }.mkString("(", " | ", ")")
  }
}
