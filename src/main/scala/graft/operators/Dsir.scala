package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** DSIR-style data selection (Xie et al. 2023, arXiv:2302.03169 —
  * "Data Selection for Language Models via Importance Resampling"):
  * score every raw-pool document by its log-likelihood ratio under
  * hashed-unigram bag-of-words models of a target domain vs the raw
  * pool, then select the top scorers — the published recipe for
  * "pick the crawl documents that look most like the trusted corpus".
  *
  * Determinism contract: weights are add-1-smoothed log ratios
  * FIXED-POINTED to integer micros (floor(ln·10⁶ + ½) — the
  * graph_betweenness integer-scaling discipline), so per-document
  * scores are BIGINT sums: exact, accumulation-order-free, and
  * hash-gateable with no rounding contract on the aggregate.
  *
  * Scale shape (the two-scan plan):
  *  1. feature counts: one explode over words → groupBy(bucket) with
  *     map-side combine down to `nBuckets` rows (the hashed feature
  *     space is FIXED-size — the whole point of hashed DSIR; the
  *     count table never scales with the corpus);
  *  2. totals: a 1-row aggregate of the bucket table, broadcast back
  *     (the BM25 shape);
  *  3. scoring: entirely NARROW — each doc folds its own words against
  *     the broadcast weight MAP (nBuckets entries), zero shuffle;
  *  4. selection: TakeOrderedAndProject for the global top-N (never a
  *     single-partition row_number over the corpus); the rank column
  *     is attached over the N selected rows only.
  *
  * Buckets unseen in BOTH corpora get the add-1 default weight
  * ln((R+B)/(T+B)) via the carried `defu` (only reachable when scoring
  * a corpus disjoint from the one the weights were fit on — in-corpus,
  * every scored word's bucket exists by construction).
  */
object Dsir {

  /** md5 feature-hash bucket in [0, nBuckets) — QueryHelpers.hashBucket
    * generalized to a caller-chosen modulus (kept in exact sync with
    * the SQL twin in PipelineQueries).
    */
  def bucket(w: Column, nBuckets: Int): Column =
    pmod(conv(substring(md5(w), 1, 8), 16, 10).cast("long"),
      lit(nBuckets.toLong))

  /** Integer-micros importance weight per hashed bucket, plus the 1-row
    * (map, default) table ready to broadcast.
    */
  private def weightMap(toks: DataFrame, targetLang: String,
      nBuckets: Int): DataFrame = {
    val occ = toks.select((col("lang") === targetLang).as("is_t"),
      explode(col("ws")).as("w"))
    val cnt = occ.groupBy(bucket(col("w"), nBuckets).as("bk")).agg(
      sum(when(col("is_t"), 1L).otherwise(0L)).as("t_b"),
      sum(when(!col("is_t"), 1L).otherwise(0L)).as("r_b"))
    val tot = cnt.agg(sum(col("t_b")).as("tt"), sum(col("r_b")).as("rr"))
    val b = nBuckets.toDouble
    def micros(c: Column): Column =
      floor(log(c) * lit(1e6) + lit(0.5)).cast("long")
    cnt.crossJoin(broadcast(tot))
      .select(col("bk"),
        micros(((col("t_b") + lit(1.0)) * (col("rr") + lit(b))) /
          ((col("r_b") + lit(1.0)) * (col("tt") + lit(b)))).as("wu"),
        micros((col("rr") + lit(b)) / (col("tt") + lit(b))).as("defu"))
      .agg(map_from_entries(collect_list(struct(col("bk"), col("wu"))))
          .as("m"),
        min(col("defu")).as("defu"))
  }

  /** Top-`topN` raw-pool documents by hashed-unigram importance weight
    * against the `targetLang` corpus. Output: (rk, doc_id, lang,
    * n_words, score_u) — score_u in integer micros of log-ratio.
    */
  def select(docs: DataFrame, targetLang: String, nBuckets: Int,
      topN: Int): DataFrame = {
    val ws = filter(split(lower(col("text")), " "), w => w =!= "")
    val toks = docs.select(col("doc_id"), col("lang"), ws.as("ws"))
    val wm = weightMap(toks, targetLang, nBuckets)
    val scored = toks.where(col("lang") =!= targetLang)
      .crossJoin(broadcast(wm))
      .select(col("doc_id"), col("lang"), size(col("ws")).as("n_words"),
        aggregate(
          transform(col("ws"), w =>
            coalesce(element_at(col("m"), bucket(w, nBuckets)),
              col("defu"))),
          lit(0L), (acc, x) => acc + x).as("score_u"))
    val top = scored.orderBy(col("score_u").desc, col("doc_id"))
      .limit(topN)
    top.withColumn("rk",
        row_number().over(
          Window.orderBy(col("score_u").desc, col("doc_id"))).cast("int"))
      .select(col("rk"), col("doc_id"), col("lang"), col("n_words"),
        col("score_u"))
  }
}
