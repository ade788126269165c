package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Lifecycle of the persisted incremental stores (simhash blocks,
  * minhash bands, IVF / IVF-PQ postings, prefix cluster labels): the
  * two operations a production ingest pipeline runs besides append —
  *
  *   DELETE: takedowns / right-to-be-forgotten must vanish from dedup
  *   and ANN serving. The mechanism is a TOMBSTONE table (the day's
  *   deleted ids — small by definition, like the ingest batch) applied
  *   as a broadcast anti-join at serve time ([[applyTombstones]]):
  *   the store scan streams unchanged, no store rewrite on the delete
  *   path, and every probe sees the post-delete corpus. The oracle
  *   gates prove serving over (store ▷ tombstones) ≡ a whole-corpus
  *   recompute that never ingested the deleted rows.
  *
  *   COMPACT: repeated small appends fragment a bucketed store (every
  *   append writes its own file per bucket — N appends ⇒ N·buckets
  *   files, the classic small-files decay); compaction is the
  *   copy-on-write rewrite (the Compact / q_merge_upsert precedent)
  *   that folds accumulated tombstones in AND restores one file per
  *   bucket. Physical layout changes; serving must not
  *   (`dedup_incremental_compact` / `sim_ann_delete_pq` share their
  *   oracle with the logical-delete twin; IncrementalSpec pins the
  *   file-count A/B). Stores stay bucketed on the probe key through
  *   the rewrite, so the exchange-free probe plan survives compaction.
  *
  * The fixture's deterministic tombstone sets are re-derivable by the
  * DuckDB oracle from the same predicates, and were density-measured
  * BEFORE build so every gate is non-vacuous at sf0.01: docs ≡ 3
  * (mod 17) within the prefix (≈6%) flip 2 `dedup_incremental`
  * decisions and touch 148 near-dup pairs (affected clusters); vecs
  * need the denser ≡ 3 (mod 7) (≈14%) because the mod-17 set grazed
  * the PQ top-3 lists with 0 hits — measured: 3 raw / 4 PQ served
  * rows change.
  */
object StoreLifecycle {

  /** Deterministic DOC tombstones: doc_id ≡ 3 (mod 17) AND ≤ `thr`
    * (only already-ingested rows can be deleted).
    */
  def tombstonedDocs(idCol: Column, thr: Long): Column =
    idCol % 17 === 3 && idCol <= thr

  /** Deterministic VECTOR tombstones: vec_id ≡ 3 (mod 7) AND ≤ `thr`
    * — denser than the doc set because the fixture's mod-17 slice
    * never intersected a PQ top-3 list (the gate would have been
    * vacuous; measured first, per the density-before-build
    * discipline).
    */
  def tombstonedVecs(idCol: Column, thr: Long): Column =
    idCol % 7 === 3 && idCol <= thr

  /** Deterministic SEMANTIC-DEDUP tombstones: vec_id ≡ 6 (mod 37) AND
    * ≤ `thr` — a sparser set than [[tombstonedVecs]], chosen by
    * measurement (the density-before-build discipline) so that (a) it
    * deletes a dup-pair WINNER (vec 191), which must RESURRECT its
    * loser (431) — the case that makes semantic-dedup deletion
    * non-monotone and forces the affected-cell re-solve — and (b) it
    * leaves some cells untouched, so the unaffected-cell
    * incremental-reuse path is actually exercised.
    */
  def semTombstonedVecs(idCol: Column, thr: Long): Column =
    idCol % 37 === 6 && idCol <= thr

  /** Logical delete: anti-join the (small, broadcast) tombstone table
    * out of the store scan — the serve-time form; the store file
    * layout is untouched and the probe plan keeps streaming it.
    */
  def applyTombstones(store: DataFrame, tombstones: DataFrame,
      key: String): DataFrame =
    store.join(broadcast(tombstones.select(col(key))), Seq(key), "left_anti")

  /** POSITION tombstones for the store rows matching `pred`: one
    * (file_path, row_index) row per deleted PHYSICAL row — the
    * Iceberg/Delta merge-on-read position-delete shape, realized on
    * Spark's parquet `_metadata` columns (file_path = the row's data
    * file URI, row_index = its position within that file; both stable
    * for as long as the file exists, which copy-on-write guarantees
    * until the folding compaction). The MoR delete path writes ONLY
    * this tiny file — never a data file — which is what a high-churn
    * store needs where every CoW delete rewrites whole buckets.
    */
  def positionTombstones(store: DataFrame, pred: Column): DataFrame =
    store.where(pred)
      .select(col("_metadata.file_path").as("file_path"),
        col("_metadata.row_index").as("row_index"))

  /** MERGE-ON-READ read: apply position-tombstone files as a broadcast
    * anti-join on the store scan's own `_metadata` address — the
    * serve-time half of the MoR contract. The data scan is unchanged
    * (still the bucketed, exchange-free probe shape — IncrementalSpec
    * pins 0 exchanges through the anti-join) and the tombstones are
    * batch-sized by definition, so they ride the broadcast.
    */
  def applyPositionTombstones(store: DataFrame, deletes: DataFrame): DataFrame =
    store
      .withColumn("_fp", col("_metadata.file_path"))
      .withColumn("_ri", col("_metadata.row_index"))
      .join(broadcast(deletes.select(col("file_path").as("_fp"),
        col("row_index").as("_ri"))), Seq("_fp", "_ri"), "left_anti")
      .drop("_fp", "_ri")
}
