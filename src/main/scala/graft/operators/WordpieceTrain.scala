package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** WordPiece vocabulary TRAINING (Schuster & Nakajima 2012; the BERT
  * tokenizer's construction, Wu et al. 2016 §4.1) — the r15 gap: the
  * engine served wordpiece encoding from a unigram-fit model but never
  * built a wordpiece vocabulary. This closes the tokenizer-training
  * family on the [[BpeTrain]] chassis: the SAME word-frequency-dict
  * iteration state, the SAME greedy leftmost merge rewrite
  * ([[BpeTrain.mergeFold]] is reused verbatim), but the merge CHOICE is
  * likelihood-ranked, not count-ranked — pick the adjacent pair (l, r)
  * maximizing
  *
  *   score(l, r) = count(lr) / (count(l) · count(r))
  *
  * the unigram-LM likelihood gain of fusing the pair into one piece
  * (BPE's raw-count argmax is the degenerate denominator-free form).
  * Ranking uses the log score in integer MICROS —
  * floor((ln f − ln c_l − ln c_r)·1e6 + 0.5), the Dsir/lm_score
  * fixed-point discipline (identical IEEE ops in identical order on
  * both engines, exact BIGINT compare) — ties break on (l, r)
  * lexicographic.
  *
  * Scale shape: identical to [[BpeTrain]] — training touches the
  * |distinct words| dict, never the corpus; per iteration one
  * pair-count aggregate, one |alphabet∪pieces| symbol-count aggregate
  * (both map-side combined), a 1-row argmax collect (the K-row
  * RPC-collect discipline), and a narrow per-row merge fold.
  */
object WordpieceTrain {

  /** Integer-micros log-likelihood score of merging (l, r):
    * floor((ln f − ln c_l − ln c_r)·1e6 + 0.5) — the exact ranking key.
    */
  def scoreU(f: Column, cl: Column, cr: Column): Column =
    floor((log(f) - log(cl) - log(cr)) * lit(1e6) + lit(0.5)).cast("long")

  /** Freq-weighted occurrence count per SYMBOL over the current dict —
    * the score's denominator terms. |alphabet ∪ merged pieces| rows.
    */
  def symCounts(vocab: DataFrame): DataFrame =
    vocab.select(col("freq"), explode(col("syms")).as("s"))
      .groupBy(col("s")).agg(sum(col("freq")).as("c"))

  /** The training loop: `iters` rounds of likelihood-argmax + greedy
    * rewrite. Returns (merge rows (rank, l, r, pair_freq, score_u),
    * final symbolized vocab).
    */
  def fit(docs: DataFrame, iters: Int)
      : (Seq[(Int, String, String, Long, Long)], DataFrame) = {
    val (ms, fin, init) = fitWithInit(docs, iters)
    // the caller never sees init — release its checkpoint here (the
    // r16 review finding: leaving it pinned leaked one distinct-word
    // frame per training run for the session lifetime)
    init.unpersist(blocking = false)
    (ms, fin)
  }

  /** [[fit]] plus the CHECKPOINTED iteration-0 dict, so [[vocab]] can
    * derive the alphabet from it instead of re-running the initVocab
    * corpus scan (the alphabet must come from the INITIAL dict — after
    * rewriting, a fully-merged character may no longer appear bare in
    * the final syms). Ownership: the CALLER unpersists all three
    * returned frames ([[fit]] and [[vocab]] do).
    */
  def fitWithInit(docs: DataFrame, iters: Int)
      : (Seq[(Int, String, String, Long, Long)], DataFrame, DataFrame) = {
    val init = BpeTrain.initVocab(docs).localCheckpoint(true)
    var vocab = init
    val out = Seq.newBuilder[(Int, String, String, Long, Long)]
    for (it <- 1 to iters) {
      val sc = symCounts(vocab)
      val best = BpeTrain.pairCounts(vocab)
        .join(sc.select(col("s").as("l"), col("c").as("cl")), "l")
        .join(sc.select(col("s").as("r"), col("c").as("cr")), "r")
        .select(col("l"), col("r"), col("f"),
          scoreU(col("f"), col("cl"), col("cr")).as("wu"))
        .orderBy(col("wu").desc, col("l"), col("r")).limit(1)
        .collect()(0) // 1 row — the K-row collect discipline
      val (l, r, f, wu) = (best.getString(0), best.getString(1),
        best.getLong(2), best.getLong(3))
      out += ((it, l, r, f, wu))
      val next = vocab.select(col("word"), col("freq"),
        BpeTrain.mergeFold(col("syms"), l, r).as("syms")).localCheckpoint(true)
      if (!(vocab eq init)) vocab.unpersist(blocking = false)
      vocab = next
    }
    (out.result(), vocab, init)
  }

  /** Train `iters` likelihood-ranked merges; returns the merge table
    * (rank, left_sym, right_sym, pair_freq, score_u), rank 1-based in
    * merge order.
    */
  def merges(docs: DataFrame, iters: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val (table, vocab) = fit(docs, iters)
    vocab.unpersist(blocking = false)
    table.toDF("rank", "left_sym", "right_sym", "pair_freq", "score_u")
      .select(col("rank").cast("int"), col("left_sym"), col("right_sym"),
        col("pair_freq"), col("score_u"))
  }

  /** The trained PIECE vocabulary the serving walk consumes: the
    * corpus alphabet (every distinct character — they keep any word
    * coverable) plus the `iters` merged pieces. Column `piece` — the
    * [[UnigramLm.wordpieceEncode]] model contract.
    */
  def vocab(docs: DataFrame, iters: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val (table, fin, init) = fitWithInit(docs, iters)
    // alphabet from the checkpointed iteration-0 dict — NOT a second
    // initVocab corpus scan (review finding). Materialized eagerly
    // (|alphabet| rows — tiny) so BOTH training frames can be released
    // here instead of pinning init for the session lifetime.
    val alphabet = init.select(explode(col("syms")).as("piece")).distinct()
      .localCheckpoint(true)
    fin.unpersist(blocking = false)
    init.unpersist(blocking = false)
    alphabet.unionByName(
        table.map { case (_, l, r, _, _) => l + r }.toDF("piece"))
      .distinct()
  }
}
