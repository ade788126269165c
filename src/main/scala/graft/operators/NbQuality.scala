package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** GPT-3-style quality-classifier filtering (Brown et al. 2020,
  * arXiv:2005.14165 Appendix A: "we filtered CommonCrawl with a
  * classifier trained to distinguish curated corpora from raw crawl"),
  * in its Naive-Bayes log-odds form with the label source distilled
  * from the rule gate: positives are the documents that PASS the
  * Gopher quality rules ([[TextAnalysis.gopherKeepExpr]]), negatives
  * are the rest — weak supervision, so the classifier generalizes the
  * hand rules into a smooth per-token score the way the published
  * pipelines chain rule gate → learned classifier.
  *
  * Model: hashed-unigram bag of words over a FIXED `nBuckets` feature
  * space (the [[Dsir]] hashing — the model never scales with the
  * corpus), per-bucket weight = add-1-smoothed log-odds
  * ln(P(b|pos)/P(b|neg)) plus a document-level class prior
  * ln(n_pos/n_neg), everything fixed-pointed to integer micros
  * (floor(ln·10⁶ + ½)) so per-document scores are exact BIGINT sums —
  * order-free and hash-gateable, the Dsir determinism contract.
  *
  * Scale shape (identical to Dsir's two-scan plan):
  *  1. label + explode → groupBy(bucket) with map-side combine down to
  *     `nBuckets` rows; doc-count prior rides the same 1-row total;
  *  2. weights broadcast back as a map;
  *  3. scoring is NARROW — each doc folds its own tokens against the
  *     broadcast map, zero shuffle, every doc scored (in-corpus
  *     scoring, so every bucket exists by construction; the carried
  *     `defu` default covers out-of-corpus callers exactly as in Dsir).
  */
object NbQuality {

  private def micros(c: Column): Column =
    floor(log(c) * lit(1e6) + lit(0.5)).cast("long")

  /** Score every document: (doc_id, lang, n_words, score_u, keep) —
    * score_u = prior + Σ token log-odds in integer micros, keep =
    * score_u > 0 (the deterministic stand-in for GPT-3's stochastic
    * Pareto acceptance).
    */
  def score(docs: DataFrame, nBuckets: Int): DataFrame = {
    val ws = filter(split(lower(col("text")), " "), w => w =!= "")
    val labeled = docs.select(col("doc_id"), col("lang"), ws.as("ws"),
      TextAnalysis.gopherKeepExpr.as("pos"))
    val occ = labeled.select(col("pos"), explode(col("ws")).as("w"))
    val cnt = occ.groupBy(Dsir.bucket(col("w"), nBuckets).as("bk")).agg(
      sum(when(col("pos"), 1L).otherwise(0L)).as("p_b"),
      sum(when(!col("pos"), 1L).otherwise(0L)).as("q_b"))
    val tot = cnt.agg(sum(col("p_b")).as("pp"), sum(col("q_b")).as("qq"))
    val prior = labeled.agg(
      sum(when(col("pos"), 1L).otherwise(0L)).as("n_pos"),
      sum(when(!col("pos"), 1L).otherwise(0L)).as("n_neg"))
    val b = nBuckets.toDouble
    val wm = cnt.crossJoin(broadcast(tot))
      .select(col("bk"),
        micros(((col("p_b") + lit(1.0)) * (col("qq") + lit(b))) /
          ((col("q_b") + lit(1.0)) * (col("pp") + lit(b)))).as("wu"),
        micros((col("qq") + lit(b)) / (col("pp") + lit(b))).as("defu"))
      .agg(map_from_entries(collect_list(struct(col("bk"), col("wu"))))
          .as("m"),
        min(col("defu")).as("defu"))
      .crossJoin(
        prior.select(micros((col("n_pos") + lit(1.0)) /
          (col("n_neg") + lit(1.0))).as("prior_u")))
    labeled.crossJoin(broadcast(wm))
      .select(col("doc_id"), col("lang"), size(col("ws")).as("n_words"),
        (col("prior_u") + aggregate(
          transform(col("ws"), w =>
            coalesce(element_at(col("m"), Dsir.bucket(w, nBuckets)),
              col("defu"))),
          lit(0L), (acc, x) => acc + x)).as("score_u"))
      .withColumn("keep", col("score_u") > 0L)
  }
}
