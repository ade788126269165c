package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Snapshot differencing — change-data-capture between two versions of
  * a keyed table, the audit/incremental-sync primitive a warehouse
  * runs after every batch rewrite. The reference's lifecycle is
  * full-file overwrite per iteration (readme.txt:16-24, cleanup at
  * master.py:336-343); diffing two overwrite generations is its honest
  * generalization: which rows did the rewrite insert, delete, change?
  *
  * Shape: ONE full-outer join co-partitioned on the primary key —
  * null PK on the old side ⇒ insert, null on the new side ⇒ delete,
  * both present with any compared column differing (null-safe) ⇒
  * update; identical rows are dropped BEFORE the output materializes,
  * so the result is |changes|, not |table|. Full outer can never
  * broadcast, so the plan is a sort-merge join with one exchange per
  * side; at 100 TB both snapshot generations should be written
  * bucketed by the key (see q_bucket_join's layout contract), which
  * makes both exchanges vanish and the diff a narrow zip of
  * co-bucketed files. Column comparison is a codegen'd null-safe
  * conjunction — no row hashing, so no cross-engine hash-function
  * coupling and nulls compare exactly.
  */
object Cdc {

  /** Diff `newSnap` against `oldSnap` on primary key `pk`; `cols` are
    * the compared payload columns. Returns one row per changed key:
    * (op ∈ I/U/D, pk, new-side payload — nulls for D).
    */
  def snapshotDiff(oldSnap: DataFrame, newSnap: DataFrame,
                   pk: String, cols: Seq[String]): DataFrame = {
    val o = oldSnap.select((pk +: cols).map(c => col(c).as(s"o_$c")): _*)
    val n = newSnap.select((pk +: cols).map(c => col(c).as(s"n_$c")): _*)
    val joined = o.join(n, col(s"o_$pk") === col(s"n_$pk"), "full_outer")
    val changed: Column = cols
      .map(c => !(col(s"o_$c") <=> col(s"n_$c")))
      .reduce(_ || _)
    joined
      .withColumn("op",
        when(col(s"o_$pk").isNull, lit("I"))
          .when(col(s"n_$pk").isNull, lit("D"))
          .when(changed, lit("U")))
      .where(col("op").isNotNull)
      .select(col("op") +:
        coalesce(col(s"n_$pk"), col(s"o_$pk")).as(pk) +:
        cols.map(c => col(s"n_$c").as(c)): _*)
  }

  /** Signed delta between two snapshots — the multiset difference
    * B − A restricted to CHANGED keys, as (weight ∈ {−1, +1}, pk,
    * payload): the old-side row of every delete/update carries −1, the
    * new-side row of every insert/update carries +1. Feeding these
    * rows into any distributive aggregate (count, sum) turns "rebuild
    * the aggregate from snapshot B" into "adjust the existing
    * aggregate by |changes| rows" — incremental view maintenance. At
    * 100 TB the previous aggregate is a materialized table and the
    * delta is the CDC change batch; the full-table rescan disappears
    * entirely (see q_incr_agg).
    *
    * Same ONE co-partitioned full-outer join as [[snapshotDiff]];
    * changed rows then fan out to at most two signed rows via a
    * 2-element inline explode (narrow, no extra shuffle).
    */
  def delta(oldSnap: DataFrame, newSnap: DataFrame,
            pk: String, cols: Seq[String]): DataFrame = {
    val o = oldSnap.select((pk +: cols).map(c => col(c).as(s"o_$c")): _*)
    val n = newSnap.select((pk +: cols).map(c => col(c).as(s"n_$c")): _*)
    val joined = o.join(n, col(s"o_$pk") === col(s"n_$pk"), "full_outer")
    val changed: Column = col(s"o_$pk").isNull || col(s"n_$pk").isNull ||
      cols.map(c => !(col(s"o_$c") <=> col(s"n_$c"))).reduce(_ || _)
    val oldRow = when(col(s"o_$pk").isNotNull,
      struct(lit(-1).as("weight") +: col(s"o_$pk").as(pk) +:
        cols.map(c => col(s"o_$c").as(c)): _*))
    val newRow = when(col(s"n_$pk").isNotNull,
      struct(lit(1).as("weight") +: col(s"n_$pk").as(pk) +:
        cols.map(c => col(s"n_$c").as(c)): _*))
    joined.where(changed)
      .select(explode(array_compact(array(oldRow, newRow))).as("r"))
      .select(col("r.weight") +: col(s"r.$pk").as(pk) +:
        cols.map(c => col(s"r.$c").as(c)): _*)
  }
}
