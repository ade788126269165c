package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BPE (byte-pair-encoding) merge-table TRAINING — the iterated
  * pair-count + merge loop (Sennrich et al. 2016) that turns a corpus
  * into a subword vocabulary. Completes the tokenizer family:
  * `text_vocab_coverage` audits a GIVEN vocabulary; this one FITS the
  * merge table. Same iterate-join-aggregate family as k-means / CC /
  * PageRank (reference analogue: the §3.1 fit loop — compute a global
  * statistic, collect K rows, rewrite state, repeat), so the oracle is
  * the fixed-round unrolled-CTE replay (the `kmeans_fit_unrolled`
  * pattern).
  *
  * Scale shape — the textbook distributed BPE:
  *  - training runs over the WORD-FREQUENCY DICT, not the corpus: one
  *    corpus-wide token count up front (map-side combined groupBy), and
  *    every iteration after that touches |vocab| rows — bounded by
  *    distinct words (millions at crawl scale), independent of corpus
  *    tokens (trillions);
  *  - per iteration: pair counts are one narrow explode + combined
  *    groupBy over the dict; the argmax pair is a 1-row
  *    `orderBy.limit(1)` collect (TakeOrdered — the K-row RPC-collect
  *    discipline, `KMeansLoop` shape); the merge rewrite is a pure
  *    per-row fold (`aggregate` HOF) — zero shuffle;
  *  - state is `localCheckpoint`ed per round to truncate lineage, like
  *    every other iterative operator here.
  *
  * Determinism: the selected pair is (max total freq, then
  * lexicographically smallest (left, right)) — integer counts and
  * binary string order, identical in both engines. The merge rewrite is
  * greedy leftmost non-overlapping (the classic semantics); the oracle
  * replays it RELATIONALLY (run-parity over consecutive match
  * positions: within a maximal run of consecutive matches, every other
  * match starting from the first is applied — provably the same
  * result as the left-to-right fold), because DuckDB's `list_reduce`
  * cannot carry the struct accumulator the fold needs. TextOpsSpec pins
  * fold ≡ hand-computed traces on adversarial words (runs of a repeated
  * char, overlapping candidates).
  *
  * No end-of-word marker symbol: the marker is tokenizer-preprocessing
  * convention (affects WHICH merges win, not how the loop works) and
  * keeping symbols = raw chars keeps the cross-engine contract minimal.
  */
object BpeTrain {

  /** Greedy leftmost non-overlapping merge of adjacent (l, r) symbol
    * pairs in `syms`, as a pure `aggregate` fold over positions —
    * accumulator (out: array, skip: bool), skip consumes the pair's
    * second element. Narrow per-row op, no shuffle.
    */
  def mergeFold(syms: Column, l: String, r: String): Column =
    aggregate(
      sequence(lit(1), size(syms)),
      struct(array().cast("array<string>").as("out"), lit(false).as("skip")),
      (acc, i) => {
        val s = element_at(syms, i)
        val s2 = try_element_at(syms, i + 1) // null past the end ⇒ no match
        val hit = s === lit(l) && s2 === lit(r)
        when(acc.getField("skip"),
          struct(acc.getField("out").as("out"), lit(false).as("skip")))
          .otherwise(when(hit,
            struct(concat(acc.getField("out"), array(lit(l + r))).as("out"),
              lit(true).as("skip")))
            .otherwise(
              struct(concat(acc.getField("out"), array(s)).as("out"),
                lit(false).as("skip"))))
      },
      acc => acc.getField("out"))

  /** The corpus word-frequency dict with char-split symbol arrays —
    * iteration state 0. */
  def initVocab(docs: DataFrame): DataFrame =
    docs.select(explode(
        filter(split(lower(col("text")), "\\s+"), t => t =!= "")).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
      .select(col("word"), col("freq"),
        transform(sequence(lit(1), length(col("word"))),
          i => col("word").substr(i, lit(1))).as("syms"))

  /** Adjacent-pair totals (l, r, f) over the current dict. */
  def pairCounts(vocab: DataFrame): DataFrame =
    // guard size >= 2: Spark sequence(1, 0) counts DOWN ([1, 0]) — the
    // text_ngram_freq gotcha — and 1-symbol words have no pairs anyway
    vocab.where(size(col("syms")) >= 2).select(col("freq"),
        explode(transform(sequence(lit(1), size(col("syms")) - 1),
          i => struct(element_at(col("syms"), i).as("l"),
            element_at(col("syms"), i + 1).as("r")))).as("p"))
      .groupBy(col("p.l").as("l"), col("p.r").as("r"))
      .agg(sum(col("freq")).as("f"))

  /** The training loop: `iters` rounds of argmax-pair + greedy rewrite.
    * Returns (merge table rows, final symbolized vocab).
    */
  def fit(docs: DataFrame, iters: Int): (Seq[(Int, String, String, Long)], DataFrame) = {
    var vocab = initVocab(docs).localCheckpoint(true)
    val out = Seq.newBuilder[(Int, String, String, Long)]
    for (it <- 1 to iters) {
      val best = pairCounts(vocab)
        .orderBy(col("f").desc, col("l"), col("r")).limit(1)
        .collect()(0) // 1 row — the K-row collect discipline
      val (l, r, f) = (best.getString(0), best.getString(1), best.getLong(2))
      out += ((it, l, r, f))
      val next = vocab.select(col("word"), col("freq"),
        mergeFold(col("syms"), l, r).as("syms")).localCheckpoint(true)
      vocab.unpersist(blocking = false)
      vocab = next
    }
    (out.result(), vocab)
  }

  /** Train `iters` merges; returns the merge table
    * (rank, left_sym, right_sym, pair_freq), rank 1-based in merge
    * order — the artifact a tokenizer consumes.
    */
  def merges(docs: DataFrame, iters: Int): DataFrame = {
    val spark = docs.sparkSession
    val (table, vocab) = fit(docs, iters)
    vocab.unpersist(blocking = false)
    import spark.implicits._
    table.toDF("rank", "left_sym", "right_sym", "pair_freq")
  }

  /** Train-then-ENCODE: the trained table applied back to the dict —
    * per distinct word its post-merge subword count, plus the corpus
    * token total it implies (freq-weighted). This is the number every
    * pipeline actually budgets by ("how many BPE tokens is this
    * corpus"), computed with a REAL learned tokenizer instead of the
    * whitespace/regex proxies in TextAnalysis.tokenReport. ENCODING a
    * new corpus at 100 TB is then one broadcast of the merge table +
    * the same per-row fold — no training-loop cost.
    */
  def encode(docs: DataFrame, iters: Int): DataFrame = {
    val (_, vocab) = fit(docs, iters)
    val res = vocab.select(col("word"), col("freq"),
      size(col("syms")).cast("long").as("n_subwords"))
    res
  }
}
