package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.TextAnalysis
import graft.queries.QueryHelpers.{rnd, rndSql}

/** Oracle-checked text-analysis queries over `documents` (language ID,
  * quality metrics, token counting, winnowing fingerprints). All
  * arithmetic is per-row exact (integer/string ops), so outputs match
  * DuckDB bit-for-bit with no rounding.
  *
  * Dialect notes baked into the oracles: DuckDB `regexp_replace` needs
  * the 'g' flag (Spark replaces all matches by default); DuckDB
  * `length`/`len` return BIGINT where Spark returns INT (explicit CASTs);
  * DuckDB `sum(INT)` returns HUGEINT (cast back to BIGINT).
  */
object TextQueries {

  private val docs = (s: SparkSession, dir: String) => Tables.documents(s, dir)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_langid" -> ((s, dir) =>
      TextAnalysis.langId(docs(s, dir)).orderBy("doc_id")),

    "text_quality" -> ((s, dir) =>
      TextAnalysis.quality(docs(s, dir)).orderBy("doc_id")),

    // Gopher-style doc-quality GATE (TextAnalysis.gopherRules scaladoc
    // — Rae et al. 2021 Table A1): five published heuristic rules as
    // explicit booleans + the composed keep flag; integer-exact
    // cross-multiplied comparisons, zero rounding contract
    "text_gopher_rules" -> ((s, dir) =>
      TextAnalysis.gopherRules(docs(s, dir)).orderBy("doc_id")),

    "text_tokens" -> ((s, dir) =>
      TextAnalysis.tokenReport(docs(s, dir)).orderBy("source")),

    // top-24 corpus vocabulary (occurrence count, ties lexicographic)
    // + per-doc distinct-token coverage against it — the broadcast
    // sorted-hash-array + narrow sorted-merge-intersect shape of
    // dedup_contamination (TextAnalysis.vocabCoverage scaladoc)
    "text_vocab_coverage" -> ((s, dir) =>
      TextAnalysis.vocabCoverage(docs(s, dir), v = 24)
        .withColumn("coverage",
          rnd(col("n_in_vocab").cast("double") / col("n_distinct"), 6))
        .orderBy("doc_id")),

    "text_fingerprint" -> ((s, dir) =>
      TextAnalysis.winnowFingerprint(docs(s, dir)).orderBy("doc_id")),

    // CCNet-style count-LM quality scoring: bigram model trained on the
    // md5-held-in half, capped to top-1000 bigrams (broadcastable at any
    // corpus scale), every doc scored by OOV rate — integer-exact, so
    // the gate is a hash match, not an error band (lmBigramScore
    // scaladoc)
    "text_lm_score" -> ((s, dir) =>
      TextAnalysis.lmBigramScore(docs(s, dir), refBucketLt = 50, v = 1000)
        .select(col("doc_id"), col("n_bigrams"),
          (col("n_bigrams") - col("n_hits")).as("n_oov"),
          when(col("n_bigrams") === 0, lit(1.0))
            .otherwise(rnd((col("n_bigrams") - col("n_hits")).cast("double")
              / col("n_bigrams"), 6)).as("oov_rate"),
          when(col("n_hits") === 0, lit(0.0))
            .otherwise(rnd(col("hit_cnt_sum").cast("double")
              / col("n_hits"), 6)).as("hit_avg"))
        .orderBy("doc_id")),

    // CCNet-style perplexity bucketing (Wenzek et al. 2020 §3.3: split
    // each language's corpus into head/middle/tail by LM perplexity
    // and train on the head): per-language TERTILES of the count-LM
    // OOV-rate proxy (the text_lm_score model), score integer-scaled
    // to micros via BIGINT floor division so the ordering is exact —
    // no float rank boundary. NTILE over (score, doc_id) is the
    // standard first-⌈n/k⌉ split on both engines. Plan: the lm-score
    // two-scan + ONE per-lang window (partitionBy(lang) shuffles the
    // doc-id/score pairs only, never the text).
    "text_ppl_buckets" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val lm = TextAnalysis.lmBigramScore(docs(s, dir),
        refBucketLt = 50, v = 1000)
      val tile = ntile(3).over(
        Window.partitionBy(col("lang")).orderBy(col("score_u"), col("doc_id")))
      docs(s, dir).select(col("doc_id"), col("lang"))
        .join(lm, "doc_id")
        .withColumn("score_u",
          when(col("n_bigrams") === 0L, lit(1000000L)).otherwise(
            expr("CAST(((n_bigrams - n_hits) * 1000000) DIV n_bigrams AS BIGINT)")))
        .withColumn("bucket",
          when(tile === 1, lit("head")).when(tile === 2, lit("middle"))
            .otherwise(lit("tail")))
        .select(col("doc_id"), col("lang"), col("score_u"), col("bucket"))
        .orderBy("doc_id")
    }),

    // interpolated Kneser-Ney bigram scoring (d = 3/4, Chen & Goodman
    // 1998's configuration) — the REAL smoothed LM behind the count-LM
    // proxies, in exact integer micros end to end (knBigramScore
    // scaladoc: the distributed-LM layout — uncapped model, marginals
    // reuse the count aggregate's partitioning, probe stream joins it)
    "text_kneser_ney" -> ((s, dir) =>
      TextAnalysis.knBigramScore(docs(s, dir), nProbe = 20, trainLt = 5)
        .orderBy("doc_id")),

    // interpolated TRIGRAM Kneser-Ney — the recursive backoff chain
    // (trigram → continuation-count bigram → continuation unigram) the
    // bigram form stops short of (knTrigramScore scaladoc: one trigram
    // count aggregate, every marginal derived from it, same integer-
    // micro clearing at every order)
    "text_kneser_ney3" -> ((s, dir) =>
      TextAnalysis.knTrigramScore(docs(s, dir), nProbe = 20, trainLt = 5)
        .orderBy("doc_id")),

    // CCNet-style perplexity tertiles driven by the REAL smoothed LM
    // (text_ppl_buckets runs the count-LM OOV proxy; this runs the
    // trigram Kneser-Ney over the WHOLE corpus): per-doc
    // length-normalized micro-likelihood score_n = score_u DIV
    // n_trigrams (integer-exact — no float rank boundary), NTILE(3)
    // per lang over (score_n DESC, doc_id) — head = the most-likely
    // (lowest-perplexity) slice a CCNet-style filter keeps. Plan: the
    // kn3 model chain (one trigram aggregate + derived marginals) with
    // the probe stream = every doc, then ONE per-lang window over
    // (doc_id, score) pairs — the text never shuffles twice.
    "text_ppl_buckets3" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val kn = TextAnalysis.knTrigramScoreAll(docs(s, dir), trainLt = 5)
      val tile = ntile(3).over(Window.partitionBy(col("lang"))
        .orderBy(col("score_n").desc, col("doc_id")))
      docs(s, dir).select(col("doc_id"), col("lang"))
        .join(kn, "doc_id")
        .withColumn("score_n", when(col("n_trigrams") === 0L, lit(0L))
          .otherwise(expr("score_u DIV n_trigrams")))
        .withColumn("bucket",
          when(tile === 1, lit("head")).when(tile === 2, lit("middle"))
            .otherwise(lit("tail")))
        .select(col("doc_id"), col("lang"), col("n_trigrams"),
          col("score_n"), col("bucket"))
        .orderBy("doc_id")
    }),

    "text_normalize" -> ((s, dir) =>
      TextAnalysis.normalize(docs(s, dir)).orderBy("doc_id")),

    "text_repetition" -> ((s, dir) =>
      TextAnalysis.repetition(docs(s, dir)).orderBy("doc_id")),

    "text_pii_redact" -> ((s, dir) =>
      TextAnalysis.piiRedact(docs(s, dir)).orderBy("doc_id")),

    // char-level Shannon entropy (narrow per-row HOF fold over the
    // sorted alphabet — identical accumulation order on both engines;
    // 6-dp rounding absorbs ulp drift)
    "text_entropy" -> ((s, dir) =>
      TextAnalysis.charEntropy(docs(s, dir))
        .select(col("doc_id"), col("n"), col("n_distinct"),
          QueryHelpers.rnd(col("entropy"), 6).as("entropy"))
        .orderBy("doc_id")),

    // top-3 characteristic terms per probe doc (tf × rational-idf) —
    // the keyword-extraction pass of a corpus audit; score is exact
    // rational arithmetic so the ranking is engine-independent
    "text_tfidf" -> ((s, dir) =>
      TextAnalysis.tfidfTopK(docs(s, dir), nProbe = 20, k = 3)
        .select(col("doc_id"), col("rk"), col("term"), col("tf"), col("df"),
          QueryHelpers.rnd(col("score"), 4).as("score"))
        .orderBy("doc_id", "rk")),

    // BM25 ranked retrieval for a fixed 4-term query (see bm25
    // scaladoc: rational idf, literal-order contribution sum, ONE
    // corpus aggregate broadcast back — a scan plus a narrow map at
    // any scale)
    "text_bm25" -> ((s, dir) =>
      TextAnalysis.bm25(docs(s, dir), bm25Terms)
        .select(col("doc_id"), col("dl"),
          col("tf_0"), col("tf_1"), col("tf_2"), col("tf_3"),
          QueryHelpers.rnd(col("score"), 4).as("score"))
        .orderBy("doc_id")),

    // corpus-wide top-50 word bigrams — the n-gram frequency table every
    // corpus audit builds. Explode is narrow; one count shuffle keyed by
    // bigram; top-k via TakeOrderedAndProject (count desc, bigram ties).
    "text_ngram_freq" -> ((s, dir) => {
      val toks = docs(s, dir)
        .select(col("doc_id"),
          filter(split(lower(col("text")), "\\s+"), t => t =!= "").as("ts"))
      // guard size>=2: Spark sequence(1, 0) counts DOWN ([1,0]) where
      // DuckDB generate_series(1, 0) is empty
      toks.where(size(col("ts")) >= 2)
        .select(explode(transform(
          sequence(lit(1), size(col("ts")) - 1),
          i => concat(element_at(col("ts"), i), lit(" "),
            element_at(col("ts"), i + 1)))).as("bigram"))
        .groupBy(col("bigram")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("bigram"))
        .limit(50)
    }),

    // BPE merge-table training, 8 merges (BpeTrain scaladoc): the
    // iterated pair-count + greedy-merge loop over the word-frequency
    // dict. Oracle replays the fixed 8 rounds as unrolled CTEs with the
    // merge rewrite in its relational run-parity form (provably ≡ the
    // Spark fold); integer counts + binary-order tie-breaks ⇒ exact
    // hash gate. TextOpsSpec pins the fold on hand-computed traces.
    "text_bpe_merges" -> ((s, dir) =>
      graft.operators.BpeTrain.merges(docs(s, dir), iters = 8)
        .orderBy("rank")),

    // the trained table applied back: per-word subword counts (the
    // corpus token budget under the REAL learned tokenizer — what
    // tokenReport's whitespace/regex counts approximate). Oracle = the
    // same unrolled chain, read out at v8 instead of the merge list.
    "text_bpe_encode" -> ((s, dir) =>
      graft.operators.BpeTrain.encode(docs(s, dir), iters = 8)
        .orderBy("word")),

    // unigram-LM (SentencePiece-style) tokenizer training (UnigramLm
    // scaladoc): 2 hard-EM rounds — Viterbi segmentation of the word
    // dict under Laplace-smoothed piece weights, then count
    // re-estimation. The seed vocabulary is BUDGET-BOUNDED (alphabet +
    // top-200 multi-char substrings, ties lexicographic — never an
    // absolute occurrence threshold, which is unbounded at corpus
    // scale). Weights are single IEEE divisions of exact integers and
    // the DP multiplies them in fixed position order, so the oracle
    // replays both EM rounds as unrolled DP CTEs with zero float slack
    // (no ln/exp anywhere). TextOpsSpec pins hand-computed
    // segmentation traces and the vocab==cap bound.
    "text_unigram_lm" -> ((s, dir) =>
      graft.operators.UnigramLm.fit(docs(s, dir), rounds = 2)
        .orderBy("piece")),

    // per-round vocabulary PRUNING (UnigramLm.fitPruned scaladoc): the
    // half of real SentencePiece training the fixed-vocab fit trades
    // away — after each M-step keep the alphabet + top-24 multi-char
    // pieces by re-estimated count (deterministic integer rank filter)
    // and renormalize the next round's weights over the survivors.
    // Oracle = the same unrolled chain with a prune CTE per round.
    "text_unigram_lm_pruned" -> ((s, dir) =>
      graft.operators.UnigramLm.fitPruned(docs(s, dir), rounds = 2,
          pruneTo = 24)
        .orderBy("piece")),

    // the FULL SentencePiece training loop (UnigramLm.fitLossPruned
    // scaladoc; Kudo 2018 §3.2): seed at 2× target (48 multi-char
    // pieces), hard-EM, prune to 24 by LIKELIHOOD LOSS — what a
    // piece's occurrences would lose falling back to character
    // segmentation, in integer micros with a fixed ln-op order (the
    // WordpieceTrain.scoreU discipline) — then re-EM over survivors.
    // Oracle = the pruned chain with a loss-ranked prune CTE per
    // round. TextOpsSpec pins target size, count-vs-loss rank
    // divergence, and a hand-computed loss trace.
    "text_unigram_train" -> ((s, dir) =>
      graft.operators.UnigramLm.fitLossPruned(docs(s, dir), rounds = 2,
          vocabCap = 48, pruneTo = 24)
        .orderBy("piece")),

    // the trained unigram LM applied back (BpeTrain.encode's twin):
    // one more Viterbi pass under the FINAL weights, per-word subword
    // counts — the corpus token budget under the learned LM. Oracle =
    // the same unrolled chain plus a third DP round, read out per word.
    "text_unigram_encode" -> ((s, dir) =>
      graft.operators.UnigramLm.encode(docs(s, dir), rounds = 2)
        .orderBy("word")),

    // model-as-broadcast-TABLE encode (UnigramLm.encodeBroadcast
    // scaladoc): the fitted weights travel as a broadcast (piece, w)
    // table joined to each word's candidate substrings and re-packed
    // into a per-row map — plan size independent of the vocab budget
    // (the sim_ivf_pq_bt discipline). Bit-identical to
    // text_unigram_encode (TextOpsSpec pins it), so it shares the
    // literal form's oracle.
    "text_unigram_encode_bt" -> ((s, dir) =>
      graft.operators.UnigramLm.encodeBroadcast(docs(s, dir), rounds = 2)
        .orderBy("word")),

    // tokenizer SERVING from the persisted model table
    // (UnigramLm.encodeFromModel scaladoc): the model was fitted once
    // and staged per scale dir (StagedLayouts.unigramModel); encoding
    // computes T/P via one broadcast 1-row aggregate and every Laplace
    // weight in-plan — ZERO driver collect anywhere in the query path.
    // Bit-identical to text_unigram_encode (spec-pinned), shares its
    // oracle.
    "text_unigram_encode_store" -> ((s, dir) =>
      graft.operators.UnigramLm.encodeFromModel(docs(s, dir),
          graft.sources.StagedLayouts.unigramModel(s, dir))
        .orderBy("word")),

    // WordPiece GREEDY longest-match serving from the staged model's
    // piece set (UnigramLm.wordpieceEncode scaladoc — Wu et al. 2016):
    // the third tokenizer serving geometry (BPE merge replay / unigram
    // Viterbi / greedy commit), one narrow fold per distinct word
    // against the 1-row broadcast piece map, all-integer output
    "text_wordpiece_encode" -> ((s, dir) =>
      graft.operators.UnigramLm.wordpieceEncode(docs(s, dir),
          graft.sources.StagedLayouts.unigramModel(s, dir))
        .orderBy("word")),

    // WordPiece vocabulary TRAINING (WordpieceTrain scaladoc — Schuster
    // & Nakajima 2012): the BPE chassis with the LIKELIHOOD argmax —
    // merge the pair maximizing count(lr)/(count(l)·count(r)), ranked
    // in exact integer micros of the log score. Closes the r15 gap
    // (encode served a unigram-fit model; the wordpiece construction
    // itself was absent). Training touches the word dict, never the
    // corpus; 8 rounds, unrolled-CTE oracle.
    "text_wordpiece_train" -> ((s, dir) =>
      graft.operators.WordpieceTrain.merges(docs(s, dir), iters = 8)
        .orderBy("rank")),

    // the greedy longest-match walk RE-POINTED at the trained
    // vocabulary (alphabet ∪ the 8 likelihood-ranked merges) — the
    // serving/training pair the r15 verdict asked for. maxPiece 9 is
    // an explicit serving CAP applied identically on both engines,
    // NOT a coverage guarantee: merges can fuse merged pieces, so k
    // merges can in principle build pieces up to 2^k chars (a
    // repetitive corpus would); pieces past the cap are ignored by
    // the walk on BOTH sides. TextOpsSpec pins that the fixture's
    // trained pieces all fit, so the cap is lossless where gated.
    "text_wordpiece_encode_trained" -> ((s, dir) =>
      graft.operators.UnigramLm.wordpieceEncode(docs(s, dir),
          graft.operators.WordpieceTrain.vocab(docs(s, dir), iters = 8),
          maxLen = 12, maxPiece = 9)
        .orderBy("word")))

  private def langidSql: String = {
    val scores = TextAnalysis.markers.map { case (l, ms) =>
      val sum = ms.map(TextAnalysis.occSql("t", _)).mkString("(", " + ", ")")
      s"$sum AS s_$l"
    }.mkString(",\n        ")
    val langs = TextAnalysis.markers.map(_._1)
    val pred = langs.init.zipWithIndex.foldRight(s"'${langs.last}'") {
      case ((l, i), rest) =>
        val others = langs.drop(i + 1).map(o => s"s_$o")
        val best = if (others.size == 1) others.head
          else s"greatest(${others.mkString(", ")})"
        s"CASE WHEN s_$l >= $best THEN '$l' ELSE $rest END"
    }
    val outScores = langs.map(l => s"s_$l").mkString(", ")
    s"""WITH p AS (SELECT doc_id, lang, concat(' ', lower(text), ' ') AS t FROM documents),
       |sc AS (SELECT doc_id, lang,
       |        $scores
       |      FROM p)
       |SELECT doc_id, lang, $pred AS pred, $outScores
       |FROM sc ORDER BY doc_id""".stripMargin
  }

  /** Fixed BM25 query terms (high-/mid-frequency corpus words). */
  private val bm25Terms = Seq("join", "scan", "window", "merge")

  /** Mirrors [[TextAnalysis.bm25]] term by term: identical literals,
    * identical association, identical left-to-right contribution sum —
    * the whole score is one shared IEEE expression on both engines.
    */
  private def bm25Sql: String = {
    val tfCols = bm25Terms.zipWithIndex.map { case (t, i) =>
      s"len(list_filter(ts, x -> x = '$t')) AS tf_$i"
    }.mkString(",\n       |    ")
    val dfAggs = bm25Terms.indices.map(i =>
      s"sum(CASE WHEN tf_$i > 0 THEN 1 ELSE 0 END) AS df_$i")
      .mkString(",\n       |    ")
    val contribs = bm25Terms.indices.map { i =>
      s"""(CAST(nd AS DOUBLE) - df_$i + 0.5) / (df_$i + 0.5)
         |      * CAST(tf_$i AS DOUBLE) * 2.2
         |      / (CAST(tf_$i AS DOUBLE)
         |         + 1.2 * (0.25 + 0.75 * dl / (CAST(sdl AS DOUBLE) / nd)))"""
        .stripMargin
    }.mkString("\n       |    + ")
    s"""WITH toks AS (
       |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'),
       |    t -> t <> '') AS ts
       |  FROM documents),
       |t2 AS (
       |  SELECT doc_id, len(ts) AS dl,
       |    $tfCols
       |  FROM toks),
       |st AS (
       |  SELECT count(*) AS nd, sum(dl) AS sdl,
       |    $dfAggs
       |  FROM t2)
       |SELECT doc_id, CAST(dl AS INT) AS dl,
       |  ${bm25Terms.indices.map(i => s"CAST(tf_$i AS INT) AS tf_$i").mkString(", ")},
       |  ${QueryHelpers.rndSql(s"($contribs)", 4)} AS score
       |FROM t2 CROSS JOIN st ORDER BY doc_id""".stripMargin
  }

  /** Unrolled-CTE replay of `iters` BPE training rounds (the
    * `kmeans_fit_unrolled` pattern). The merge rewrite is the
    * relational run-parity form: mark matched positions, island
    * consecutive matches (i − row_number over matches), apply every
    * other match per island starting at its first (≡ the greedy
    * left-to-right fold), drop each applied match's second position,
    * re-list. MATERIALIZED on every round CTE — DuckDB re-executes
    * multiply-referenced CTEs otherwise (verify skill note).
    */
  private def bpeMergesSql(iters: Int): String = {
    val sel = (1 to iters).map(i =>
      s"SELECT $i AS rank, l AS left_sym, r AS right_sym, f AS pair_freq FROM best$i")
      .mkString(" UNION ALL ")
    s"WITH ${bpeCtes(iters)}\nSELECT * FROM ($sel) ORDER BY rank"
  }

  /** Same chain, read out at the final vocab state: per-word subword
    * counts (the text_bpe_encode oracle). */
  private def bpeEncodeSql(iters: Int): String =
    s"""WITH ${bpeCtes(iters)}
       |SELECT word, freq, CAST(len(syms) AS BIGINT) AS n_subwords
       |FROM v$iters ORDER BY word""".stripMargin

  /** The WordPiece training chain: [[mergeChainCtes]] with the
    * LIKELIHOOD argmax — per round a symbol-count CTE plus the best
    * pair by integer-micros log score floor((ln f − ln c_l − ln c_r)
    * ·1e6 + 0.5) (WordpieceTrain.scoreU — identical IEEE op order as
    * the Spark side), ties (score, l, r).
    */
  private def wpTrainCtes(iters: Int): String =
    mergeChainCtes(iters, it => {
      val p = it - 1
      s"""sc$it AS (SELECT s, CAST(sum(freq) AS BIGINT) AS c
         |  FROM (SELECT freq, unnest(syms) AS s FROM v$p) GROUP BY 1),
         |best$it AS MATERIALIZED (
         |  SELECT pc$it.l, pc$it.r, pc$it.f,
         |    CAST(floor((ln(pc$it.f) - ln(ca.c) - ln(cb.c)) * 1000000.0 + 0.5)
         |      AS BIGINT) AS wu
         |  FROM pc$it JOIN sc$it ca ON ca.s = pc$it.l
         |  JOIN sc$it cb ON cb.s = pc$it.r
         |  ORDER BY wu DESC, l, r LIMIT 1)""".stripMargin
    })

  /** `text_wordpiece_train`'s oracle: the likelihood-ranked merge
    * table read out per round.
    */
  /** The trigram Kneser-Ney scoring chain ending in `agg(doc_id, nt,
    * nh, nb2, nz, su)` — the TextAnalysis.knTrigramScored twin. `probe`
    * is the SQL relation the probe trigram stream reads (the 20-doc cut
    * for text_kneser_ney3, the whole `triples` stream for
    * text_ppl_buckets3 — the shared-builder discipline, never string
    * surgery). All accumulation-order-free integer ops; `//` ≡ DIV.
    */
  private def kn3Ctes(probe: String): String =
    s"""toks AS (
       |  SELECT doc_id, list_filter(
       |    string_split_regex(lower(text), '\\s+'), t -> t <> '') AS ts
       |  FROM documents
       |), triples AS MATERIALIZED (
       |  SELECT doc_id, t.w1 AS w1, t.w2 AS w2, t.w3 AS w3 FROM (
       |    SELECT doc_id, unnest(list_transform(range(1, len(ts) - 1),
       |      i -> {'w1': ts[i], 'w2': ts[i+1], 'w3': ts[i+2]})) AS t
       |    FROM toks)
       |), tri AS MATERIALIZED (
       |  SELECT w1, w2, w3, count(*) AS c123 FROM triples
       |  WHERE CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 100 < 5
       |  GROUP BY 1, 2, 3
       |), ctx12 AS (
       |  SELECT w1, w2, CAST(sum(c123) AS BIGINT) AS c12dot,
       |    count(*) AS n1p12
       |  FROM tri GROUP BY 1, 2
       |), cc AS MATERIALIZED (
       |  SELECT w2, w3, count(*) AS cc23 FROM tri GROUP BY 1, 2
       |), ccd AS (
       |  SELECT w2, CAST(sum(cc23) AS BIGINT) AS ccdot2,
       |    count(*) AS n1p2f
       |  FROM cc GROUP BY 1
       |), cu AS (
       |  SELECT w3, count(*) AS n1p3b FROM cc GROUP BY 1
       |), nb AS (SELECT count(*) AS nbb FROM cc),
       |sc AS (
       |  SELECT p.doc_id, t.c123, x.c12dot, x.n1p12, c.cc23, d.ccdot2,
       |    d.n1p2f, coalesce((u.n1p3b * 1000000) // nb.nbb, 0) AS p1_u
       |  FROM $probe p
       |  LEFT JOIN tri t USING (w1, w2, w3)
       |  LEFT JOIN ctx12 x USING (w1, w2)
       |  LEFT JOIN cc c USING (w2, w3)
       |  LEFT JOIN ccd d USING (w2)
       |  LEFT JOIN cu u USING (w3)
       |  CROSS JOIN nb
       |), p2 AS (
       |  SELECT doc_id, c123, c12dot, n1p12,
       |    CASE WHEN ccdot2 IS NOT NULL THEN
       |      (CASE WHEN cc23 IS NOT NULL
       |         THEN ((4 * cc23 - 3) * 1000000) // (4 * ccdot2) ELSE 0 END)
       |      + ((3 * n1p2f * 1000000) // (4 * ccdot2) * p1_u) // 1000000
       |    ELSE p1_u END AS p2_u
       |  FROM sc
       |), pu AS (
       |  SELECT doc_id, c123, c12dot,
       |    CASE WHEN c12dot IS NOT NULL THEN
       |      (CASE WHEN c123 IS NOT NULL
       |         THEN ((4 * c123 - 3) * 1000000) // (4 * c12dot) ELSE 0 END)
       |      + ((3 * n1p12 * 1000000) // (4 * c12dot) * p2_u) // 1000000
       |    ELSE p2_u END AS p_u
       |  FROM p2
       |), agg AS (
       |  SELECT doc_id, count(*) AS nt, count(c123) AS nh,
       |    CAST(sum(CASE WHEN c12dot IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nb2,
       |    CAST(sum(CASE WHEN p_u = 0 THEN 1 ELSE 0 END) AS BIGINT) AS nz,
       |    CAST(sum(p_u) AS BIGINT) AS su
       |  FROM pu GROUP BY doc_id
       |)""".stripMargin

  private def wpTrainSql(iters: Int): String = {
    val sel = (1 to iters).map(i =>
      s"SELECT CAST($i AS INT) AS rank, l AS left_sym, r AS right_sym, " +
        s"f AS pair_freq, wu AS score_u FROM best$i")
      .mkString(" UNION ALL ")
    s"WITH ${wpTrainCtes(iters)}\nSELECT * FROM ($sel) ORDER BY rank"
  }

  /** `text_wordpiece_encode_trained`'s oracle: the trained piece set
    * (corpus alphabet ∪ the `iters` merges) drives the same unrolled
    * greedy longest-match walk as [[wordpieceSql]] — maxPiece covers
    * the longest piece `iters` merges can build.
    */
  private def wpEncodeTrainedSql(iters: Int, maxLen: Int,
                                 maxPiece: Int): String = {
    val mergedSel = (1 to iters).map(i => s"SELECT l || r AS p FROM best$i")
      .mkString(" UNION ALL ")
    val steps = (1 to maxLen).map { s =>
      s"""g$s AS MATERIALIZED (SELECT word, freq,
         |    CAST(CASE WHEN unk = 1 OR pos > length(word) OR bl IS NULL
         |      THEN pos ELSE pos + bl END AS INT) AS pos,
         |    CAST(CASE WHEN unk = 1 OR pos > length(word) OR bl IS NULL
         |      THEN n ELSE n + 1 END AS INT) AS n,
         |    CAST(CASE WHEN unk = 0 AND pos <= length(word) AND bl IS NULL
         |      THEN 1 ELSE unk END AS INT) AS unk
         |  FROM (SELECT g.*, (SELECT max(length(v.p)) FROM vocabp v
         |          WHERE length(v.p) <= $maxPiece
         |            AND v.p = substr(g.word, g.pos, length(v.p))) AS bl
         |        FROM g${s - 1} g))""".stripMargin
    }.mkString(",\n")
    s"""WITH ${wpTrainCtes(iters)},
       |vocabp AS MATERIALIZED (
       |  SELECT DISTINCT s AS p FROM (SELECT unnest(syms) AS s FROM v0)
       |  UNION
       |  SELECT p FROM ($mergedSel)),
       |dictw AS MATERIALIZED (SELECT word, freq FROM v0
       |  WHERE length(word) <= $maxLen),
       |g0 AS (SELECT word, freq, CAST(1 AS INT) AS pos, CAST(0 AS INT) AS n,
       |    CAST(0 AS INT) AS unk FROM dictw),
       |$steps
       |SELECT word, freq,
       |  CAST(CASE WHEN unk = 1 THEN 0 ELSE n END AS INT) AS n_pieces,
       |  (unk = 1) AS is_unk
       |FROM g$maxLen ORDER BY word""".stripMargin
  }

  private def bpeCtes(iters: Int): String =
    mergeChainCtes(iters, it =>
      s"""best$it AS MATERIALIZED (
         |  SELECT l, r, f FROM pc$it ORDER BY f DESC, l, r LIMIT 1)""".stripMargin)

  /** The shared iterated merge chain (dict init, per-round pair counts,
    * a caller-supplied best$it argmax CTE, run-parity greedy rewrite) —
    * BPE and WordPiece training differ ONLY in the argmax, so both
    * oracles compose on this one builder.
    */
  private def mergeChainCtes(iters: Int, bestCte: Int => String): String = {
    val ctes = Seq.newBuilder[String]
    ctes += s"""v0 AS MATERIALIZED (
       |  SELECT word, freq, list_transform(range(1, length(word)+1),
       |      i -> substr(word, CAST(i AS INT), 1)) AS syms
       |  FROM (SELECT t AS word, CAST(count(*) AS BIGINT) AS freq
       |        FROM (SELECT unnest(list_filter(
       |            string_split_regex(lower(text), '\\s+'), t -> t <> '')) AS t
       |          FROM documents)
       |        GROUP BY t))""".stripMargin
    for (it <- 1 to iters) {
      val p = it - 1
      ctes += s"""pc$it AS (
         |  SELECT syms[CAST(i AS INT)] AS l, syms[CAST(i+1 AS INT)] AS r,
         |    CAST(sum(freq) AS BIGINT) AS f
         |  FROM v$p, unnest(range(1, len(syms))) u(i)
         |  GROUP BY 1, 2)""".stripMargin
      ctes += bestCte(it)
      ctes += s"""pos$it AS (
         |  SELECT word, freq, CAST(i AS BIGINT) AS i, syms[CAST(i AS INT)] AS s,
         |    syms[CAST(i+1 AS INT)] AS s2, len(syms) AS n
         |  FROM v$p, unnest(range(1, len(syms)+1)) u(i))""".stripMargin
      ctes += s"""act$it AS (
         |  SELECT word, freq, i, s, s2,
         |    mt AND ((i - min(i) OVER (PARTITION BY word, g)) % 2 = 0) AS active
         |  FROM (
         |    SELECT *, CASE WHEN mt
         |        THEN i - row_number() OVER (PARTITION BY word, mt ORDER BY i)
         |      END AS g
         |    FROM (SELECT p.*, (p.i < p.n AND p.s = b.l AND p.s2 = b.r) AS mt
         |          FROM pos$it p CROSS JOIN best$it b)))""".stripMargin
      ctes += s"""v$it AS MATERIALIZED (
         |  SELECT word, freq,
         |    list(CASE WHEN active THEN s || s2 ELSE s END ORDER BY i) AS syms
         |  FROM (SELECT *, lag(active) OVER (PARTITION BY word ORDER BY i) AS pact
         |        FROM act$it)
         |  WHERE NOT coalesce(pact, false)
         |  GROUP BY word, freq)""".stripMargin
    }
    ctes.result().mkString(",\n")
  }

  /** Unrolled hard-EM replay for `text_unigram_lm`: seed vocab CTEs,
    * then per round a weight CTE (the identical Laplace division as
    * one DOUBLE op), `maxLen` forward Viterbi position CTEs (4 join
    * arms each, max score then max-j tie-break — ≡ the Spark fold's
    * strict-> chain from j = i−1), `maxLen` backward reconstruction
    * steps, and the count re-estimate over the FIXED model set.
    */
  private def unigramSql(rounds: Int, maxLen: Int, maxPiece: Int,
                         vocabCap: Int): String = {
    def roundCtes(r: Int): String = unigramViterbiCtes(r, maxLen, maxPiece) +
      unigramCountCtes(r, maxLen)
    s"""WITH ${unigramSeedCtes(maxLen, maxPiece, vocabCap)},
       |${(1 to rounds).map(roundCtes).mkString(",\n")}
       |SELECT p AS piece, cnt FROM m$rounds ORDER BY piece""".stripMargin
  }

  /** `text_unigram_lm_pruned`'s oracle: the same chain with a PRUNE
    * CTE after each round's count re-estimate (alphabet + top-`pruneTo`
    * multi-char pieces by count, ties lexicographic — the identical
    * integer rank filter as UnigramLm.fitPruned), the next round's
    * weights renormalizing over the pruned survivors.
    */
  private def unigramPrunedSql(rounds: Int, maxLen: Int, maxPiece: Int,
                               vocabCap: Int, pruneTo: Int): String = {
    def roundCtes(r: Int): String = {
      val prev = if (r == 1) "m0" else s"mp${r - 1}"
      unigramViterbiCtes(r, maxLen, maxPiece, prev) +
        unigramCountCtes(r, maxLen, prev) +
        s""",
           |mp$r AS MATERIALIZED (
           |  SELECT p, cnt FROM m$r WHERE length(p) = 1
           |  UNION ALL
           |  SELECT p, cnt FROM (
           |    SELECT p, cnt FROM m$r WHERE length(p) > 1
           |    ORDER BY cnt DESC, p LIMIT $pruneTo) tp$r)""".stripMargin
    }
    s"""WITH ${unigramSeedCtes(maxLen, maxPiece, vocabCap)},
       |${(1 to rounds).map(roundCtes).mkString(",\n")}
       |SELECT p AS piece, cnt FROM mp$rounds ORDER BY piece""".stripMargin
  }

  /** `text_unigram_train`'s oracle: the [[unigramPrunedSql]] chain with
    * the prune CTE ranked by LIKELIHOOD LOSS instead of raw count —
    * loss_u(p) = floor(c_p·(ln(c_p+1) + (len−1)·ln(T+P) − Σ ln(c_ch+1))
    * ·1e6 + 0.5), the shared-denominator canonical form of
    * c_p·(ln w_p − Σ ln w_ch). The per-char ln sum is an EXPLICIT
    * position chain (l1 + l2 + coalesce(l3,0) + coalesce(l4,0) — the
    * fixed left-to-right IEEE order the Spark driver replays; +0.0 for
    * absent positions is exact), each char looked up by LEFT JOIN
    * against the same model state (always present: seeding admits
    * every single char). Exact BIGINT compare, ties lexicographic.
    */
  private def unigramLossPrunedSql(rounds: Int, maxLen: Int, maxPiece: Int,
                                   vocabCap: Int, pruneTo: Int): String = {
    def roundCtes(r: Int): String = {
      val prev = if (r == 1) "m0" else s"mp${r - 1}"
      val chJoins = (1 to maxPiece).map(i =>
        s"  LEFT JOIN m$r a$i ON a$i.p = substr(mm.p, $i, 1)").mkString("\n")
      val lnch = s"ln(CAST(a1.cnt + 1 AS DOUBLE)) + ln(CAST(a2.cnt + 1 AS DOUBLE))" +
        (3 to maxPiece).map(i =>
          s" + coalesce(ln(CAST(a$i.cnt + 1 AS DOUBLE)), 0.0)").mkString
      unigramViterbiCtes(r, maxLen, maxPiece, prev) +
        unigramCountCtes(r, maxLen, prev) +
        s""",
           |lt$r AS (SELECT ln(CAST(
           |    (SELECT CAST(sum(cnt) AS BIGINT) FROM m$r)
           |    + (SELECT count(*) FROM m$r) AS DOUBLE)) AS lt),
           |lp$r AS MATERIALIZED (
           |  SELECT mm.p, mm.cnt,
           |    CAST(floor(CAST(mm.cnt AS DOUBLE)
           |      * ((ln(CAST(mm.cnt + 1 AS DOUBLE))
           |          + CAST(length(mm.p) - 1 AS DOUBLE) * lt.lt)
           |         - ($lnch))
           |      * 1e6 + 0.5) AS BIGINT) AS loss_u
           |  FROM m$r mm CROSS JOIN lt$r lt
           |$chJoins
           |  WHERE length(mm.p) > 1),
           |mp$r AS MATERIALIZED (
           |  SELECT p, cnt FROM m$r WHERE length(p) = 1
           |  UNION ALL
           |  SELECT p, cnt FROM (
           |    SELECT p, cnt FROM lp$r
           |    ORDER BY loss_u DESC, p LIMIT $pruneTo) tp$r)""".stripMargin
    }
    s"""WITH ${unigramSeedCtes(maxLen, maxPiece, vocabCap)},
       |${(1 to rounds).map(roundCtes).mkString(",\n")}
       |SELECT p AS piece, cnt FROM mp$rounds ORDER BY piece""".stripMargin
  }

  /** One more Viterbi pass at the FINAL model's weights, read out as
    * per-word subword counts — `text_unigram_encode`'s oracle tail.
    */
  private def unigramEncodeSql(rounds: Int, maxLen: Int, maxPiece: Int,
                               vocabCap: Int): String = {
    val r = rounds + 1
    val pieces = (1 to maxLen)
      .map(k => s"SELECT word, freq, piece FROM b${r}_$k")
      .mkString("\n  UNION ALL ")
    s"""WITH ${unigramSeedCtes(maxLen, maxPiece, vocabCap)},
       |${(1 to rounds).map(i => unigramViterbiCtes(i, maxLen, maxPiece) +
            unigramCountCtes(i, maxLen)).mkString(",\n")},
       |${unigramViterbiCtes(r, maxLen, maxPiece)}
       |SELECT word, freq, CAST(count(*) AS BIGINT) AS n_subwords FROM (
       |  $pieces) GROUP BY word, freq ORDER BY word""".stripMargin
  }

  /** `text_wordpiece_encode`'s oracle: the model replay to m`rounds`
    * (same chain as [[unigramSql]]), then the greedy longest-match walk
    * unrolled to `maxLen` steps — at each step the best match is
    * max(length(p)) over pieces equal to the substring of their own
    * length (identical to the Spark fold's shrinking-window first-hit),
    * a no-match position flips the word to UNK wholesale.
    */
  private def wordpieceSql(rounds: Int, maxLen: Int, maxPiece: Int,
                           vocabCap: Int): String = {
    val steps = (1 to maxLen).map { s =>
      s"""g$s AS MATERIALIZED (SELECT word, freq,
         |    CAST(CASE WHEN unk = 1 OR pos > length(word) OR bl IS NULL
         |      THEN pos ELSE pos + bl END AS INT) AS pos,
         |    CAST(CASE WHEN unk = 1 OR pos > length(word) OR bl IS NULL
         |      THEN n ELSE n + 1 END AS INT) AS n,
         |    CAST(CASE WHEN unk = 0 AND pos <= length(word) AND bl IS NULL
         |      THEN 1 ELSE unk END AS INT) AS unk
         |  FROM (SELECT g.*, (SELECT max(length(v.p)) FROM m$rounds v
         |          WHERE length(v.p) <= $maxPiece
         |            AND v.p = substr(g.word, g.pos, length(v.p))) AS bl
         |        FROM g${s - 1} g))""".stripMargin
    }.mkString(",\n")
    s"""WITH ${unigramSeedCtes(maxLen, maxPiece, vocabCap)},
       |${(1 to rounds).map(i => unigramViterbiCtes(i, maxLen, maxPiece) +
            unigramCountCtes(i, maxLen)).mkString(",\n")},
       |g0 AS (SELECT word, freq, CAST(1 AS INT) AS pos, CAST(0 AS INT) AS n,
       |    CAST(0 AS INT) AS unk FROM dict),
       |$steps
       |SELECT word, freq,
       |  CAST(CASE WHEN unk = 1 THEN 0 ELSE n END AS INT) AS n_pieces,
       |  (unk = 1) AS is_unk
       |FROM g$maxLen ORDER BY word""".stripMargin
  }

  private def unigramSeedCtes(maxLen: Int, maxPiece: Int,
                              vocabCap: Int): String =
    s"""toks AS (SELECT unnest(regexp_split_to_array(lower(text), '\\s+')) AS word
       |  FROM documents),
       |dict AS MATERIALIZED (SELECT word, CAST(count(*) AS BIGINT) AS freq
       |  FROM toks WHERE word <> '' AND length(word) <= $maxLen
       |  GROUP BY word),
       |occ AS MATERIALIZED (SELECT substr(word, CAST(i AS INT), CAST(l AS INT)) AS p,
       |    CAST(sum(freq) AS BIGINT) AS cnt
       |  FROM dict, (SELECT unnest([${(1 to maxPiece).mkString(", ")}]) AS l) ls,
       |    LATERAL (SELECT unnest(generate_series(1, length(word) - l + 1)) AS i) js
       |  GROUP BY 1),
       |m0 AS MATERIALIZED (
       |  SELECT p, cnt FROM occ WHERE length(p) = 1
       |  UNION ALL
       |  SELECT p, cnt FROM (
       |    SELECT p, cnt FROM occ WHERE length(p) > 1
       |    ORDER BY cnt DESC, p LIMIT $vocabCap) topm)""".stripMargin

  /** Weight CTE + forward DP positions + backward reconstruction for
    * EM round `r` (weights from `prev`, default m_{r-1}; P = |prev| —
    * for the fixed-vocab chain that equals |m0|, for the pruned chain
    * the survivors), ending in the b$r step CTEs.
    */
  private def unigramViterbiCtes(r: Int, maxLen: Int, maxPiece: Int,
                                 prev0: String = ""): String = {
    val prev = if (prev0.nonEmpty) prev0 else s"m${r - 1}"
    val wt =
      s"""wt$r AS MATERIALIZED (SELECT p,
         |  CAST(cnt + 1 AS DOUBLE) /
         |    CAST((SELECT CAST(sum(cnt) AS BIGINT) FROM $prev)
         |      + (SELECT count(*) FROM $prev) AS DOUBLE) AS w
         |  FROM $prev)""".stripMargin
      val dp0 = s"dp${r}_0 AS (SELECT word, CAST(1.0 AS DOUBLE) AS score FROM dict)"
      val fwd = (1 to maxLen).map { i =>
        val arms = (1 to maxPiece).filter(i - _ >= 0).map { l =>
          s"""SELECT p.word, p.score * w.w AS score, ${i - l} AS j
             |  FROM dp${r}_${i - l} p JOIN wt$r w
             |    ON w.p = substr(p.word, ${i - l + 1}, $l)
             |  WHERE length(p.word) >= $i""".stripMargin
        }.mkString("\n  UNION ALL ")
        s"""cd${r}_$i AS MATERIALIZED ($arms),
           |dp${r}_$i AS MATERIALIZED (SELECT c.word, s.score,
           |    CAST(max(c.j) AS INT) AS j
           |  FROM cd${r}_$i c JOIN (SELECT word, max(score) AS score
           |    FROM cd${r}_$i GROUP BY word) s
           |    ON s.word = c.word AND c.score = s.score
           |  GROUP BY c.word, s.score)""".stripMargin
      }.mkString(",\n")
      val dpa = (1 to maxLen)
        .map(i => s"SELECT word, $i AS i, j FROM dp${r}_$i")
        .mkString("\n  UNION ALL ")
      val bwd = (1 to maxLen).map { k =>
        s"""b${r}_$k AS MATERIALIZED (SELECT b.word, b.freq, d.j AS pos,
           |    substr(b.word, d.j + 1, b.pos - d.j) AS piece
           |  FROM b${r}_${k - 1} b JOIN dpa$r d
           |    ON d.word = b.word AND d.i = b.pos
           |  WHERE b.pos > 0)""".stripMargin
      }.mkString(",\n")
      s"""$wt,
         |$dp0,
         |$fwd,
         |dpa$r AS MATERIALIZED ($dpa),
         |b${r}_0 AS (SELECT word, freq, CAST(length(word) AS INT) AS pos FROM dict),
         |$bwd""".stripMargin
  }

  /** Count re-estimate + next model state for EM round `r` — appended
    * after [[unigramViterbiCtes]] (leading comma included; `prev`
    * names the model state the re-count re-keys, default m_{r-1}).
    */
  private def unigramCountCtes(r: Int, maxLen: Int,
                               prev0: String = ""): String = {
    val prev = if (prev0.nonEmpty) prev0 else s"m${r - 1}"
    val pieces = (1 to maxLen)
      .map(k => s"SELECT freq, piece FROM b${r}_$k")
      .mkString("\n  UNION ALL ")
    s""",
       |cn$r AS (SELECT piece AS p, CAST(sum(freq) AS BIGINT) AS cnt FROM (
       |  $pieces) GROUP BY 1),
       |m$r AS MATERIALIZED (SELECT m.p, coalesce(c.cnt, CAST(0 AS BIGINT)) AS cnt
       |  FROM $prev m LEFT JOIN cn$r c ON c.p = m.p)""".stripMargin
  }

  val oracleSql: Map[String, String] = Map(
    "text_bpe_merges" -> bpeMergesSql(8),
    "text_bpe_encode" -> bpeEncodeSql(8),
    "text_unigram_lm" -> unigramSql(rounds = 2, maxLen = 12, maxPiece = 4,
      vocabCap = 200),
    "text_unigram_lm_pruned" -> unigramPrunedSql(rounds = 2, maxLen = 12,
      maxPiece = 4, vocabCap = 200, pruneTo = 24),
    "text_unigram_train" -> unigramLossPrunedSql(rounds = 2, maxLen = 12,
      maxPiece = 4, vocabCap = 48, pruneTo = 24),
    "text_unigram_encode" -> unigramEncodeSql(rounds = 2, maxLen = 12,
      maxPiece = 4, vocabCap = 200),
    // bit-identical to the literal-map form — shares its oracle
    "text_unigram_encode_bt" -> unigramEncodeSql(rounds = 2, maxLen = 12,
      maxPiece = 4, vocabCap = 200),
    // serving from the staged model table computes the identical
    // weights in-plan — same oracle again
    "text_unigram_encode_store" -> unigramEncodeSql(rounds = 2, maxLen = 12,
      maxPiece = 4, vocabCap = 200),

    "text_wordpiece_train" -> wpTrainSql(8),
    "text_wordpiece_encode_trained" ->
      wpEncodeTrainedSql(8, maxLen = 12, maxPiece = 9),
    "text_wordpiece_encode" -> wordpieceSql(rounds = 2, maxLen = 12,
      maxPiece = 4, vocabCap = 200),

    "text_langid" -> langidSql,

    // same 60-bit md5 token hash as the Spark side, so vocabulary and
    // per-doc token sets agree even under (identical) collisions
    "text_vocab_coverage" -> {
      import graft.operators.Dedup.{MinhashP => P}
      s"""WITH toks AS (
         |  SELECT doc_id, unnest(list_filter(
         |    string_split_regex(lower(text), '\\s+'), t -> t <> '')) AS tok
         |  FROM documents
         |), freq AS (
         |  SELECT tok, count(*) AS f FROM toks GROUP BY tok
         |), vocab AS (
         |  SELECT tok FROM freq ORDER BY f DESC, tok LIMIT 24
         |), vh AS (
         |  SELECT DISTINCT CAST(('0x' || substr(md5(tok), 1, 15)) AS BIGINT) % $P AS hm
         |  FROM vocab
         |), dt AS (
         |  SELECT DISTINCT doc_id,
         |    CAST(('0x' || substr(md5(tok), 1, 15)) AS BIGINT) % $P AS hm
         |  FROM toks
         |), sizes AS (
         |  SELECT doc_id, count(*) AS n_distinct FROM dt GROUP BY doc_id
         |), it AS (
         |  SELECT d.doc_id, count(*) AS n_in FROM dt d JOIN vh v ON d.hm = v.hm
         |  GROUP BY d.doc_id
         |)
         |SELECT s.doc_id, CAST(s.n_distinct AS BIGINT) AS n_distinct,
         |  CAST(coalesce(i.n_in, 0) AS BIGINT) AS n_in_vocab,
         |  ${rndSql("CAST(coalesce(i.n_in, 0) AS DOUBLE) / s.n_distinct", 6)} AS coverage
         |FROM sizes s LEFT JOIN it i ON s.doc_id = i.doc_id
         |ORDER BY s.doc_id""".stripMargin
    },

    "text_bm25" -> bm25Sql,

    // same tokenizer + held-in-slice + top-1000-tie-broken model on
    // both engines; all counts integer ⇒ exact
    "text_lm_score" ->
      s"""WITH toks AS (
         |  SELECT doc_id, list_filter(
         |    string_split_regex(lower(text), '\\s+'), t -> t <> '') AS ts
         |  FROM documents
         |), bgs AS (
         |  SELECT doc_id,
         |    list_transform(range(1, len(ts)), i -> ts[i] || ' ' || ts[i+1]) AS bg
         |  FROM toks
         |), refc AS (
         |  SELECT bigram, count(*) AS ref_cnt FROM (
         |    SELECT unnest(bg) AS bigram FROM bgs
         |    WHERE ${QueryHelpers.hashBucketSql("CAST(doc_id AS VARCHAR)")} < 50
         |  ) GROUP BY bigram
         |  ORDER BY ref_cnt DESC, bigram LIMIT 1000
         |), ex AS (
         |  SELECT doc_id, unnest(bg) AS bigram FROM bgs
         |), j AS (
         |  SELECT e.doc_id, count(*) AS nb, count(r.ref_cnt) AS nh,
         |    CAST(sum(coalesce(r.ref_cnt, 0)) AS BIGINT) AS hs
         |  FROM ex e LEFT JOIN refc r USING (bigram) GROUP BY e.doc_id
         |)
         |SELECT t.doc_id,
         |  CAST(coalesce(j.nb, 0) AS BIGINT) AS n_bigrams,
         |  CAST(coalesce(j.nb, 0) - coalesce(j.nh, 0) AS BIGINT) AS n_oov,
         |  CASE WHEN coalesce(j.nb, 0) = 0 THEN 1.0
         |    ELSE ${rndSql("CAST(coalesce(j.nb, 0) - coalesce(j.nh, 0) AS DOUBLE) / j.nb", 6)}
         |  END AS oov_rate,
         |  CASE WHEN coalesce(j.nh, 0) = 0 THEN 0.0
         |    ELSE ${rndSql("CAST(j.hs AS DOUBLE) / j.nh", 6)}
         |  END AS hit_avg
         |FROM toks t LEFT JOIN j ON t.doc_id = j.doc_id
         |ORDER BY t.doc_id""".stripMargin,

    // Kneser-Ney twin: same tokenizer, the (w1, w2) pair chain, all
    // marginals as exact counts, the identical integer-micro
    // interpolation with `//` == Spark DIV
    "text_kneser_ney" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(
        |    string_split_regex(lower(text), '\s+'), t -> t <> '') AS ts
        |  FROM documents
        |), pairs AS MATERIALIZED (
        |  SELECT doc_id, b.w1 AS w1, b.w2 AS w2 FROM (
        |    SELECT doc_id, unnest(list_transform(range(1, len(ts)),
        |      i -> {'w1': ts[i], 'w2': ts[i+1]})) AS b
        |    FROM toks)
        |), big AS MATERIALIZED (
        |  SELECT w1, w2, count(*) AS c12 FROM pairs
        |  WHERE CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 100 < 5
        |  GROUP BY 1, 2
        |), w1s AS (
        |  SELECT w1, CAST(sum(c12) AS BIGINT) AS c1, count(*) AS n1p_fwd
        |  FROM big GROUP BY w1
        |), w2s AS (
        |  SELECT w2, count(*) AS n1p_bwd FROM big GROUP BY w2
        |), np AS (SELECT count(*) AS npairs FROM big),
        |sc AS (
        |  SELECT p.doc_id, b.c12, u.c1, u.n1p_fwd,
        |    coalesce((v.n1p_bwd * 1000000) // np.npairs, 0) AS pcont_u
        |  FROM (SELECT * FROM pairs WHERE doc_id < 20) p
        |  LEFT JOIN big b USING (w1, w2)
        |  LEFT JOIN w1s u USING (w1)
        |  LEFT JOIN w2s v USING (w2)
        |  CROSS JOIN np
        |), pu AS (
        |  SELECT doc_id, c12,
        |    CASE WHEN c1 IS NOT NULL THEN
        |      (CASE WHEN c12 IS NOT NULL
        |         THEN ((4 * c12 - 3) * 1000000) // (4 * c1) ELSE 0 END)
        |      + ((3 * n1p_fwd * 1000000) // (4 * c1) * pcont_u) // 1000000
        |    ELSE pcont_u END AS p_u
        |  FROM sc
        |), agg AS (
        |  SELECT doc_id, count(*) AS nb, count(c12) AS nh,
        |    CAST(sum(CASE WHEN p_u = 0 THEN 1 ELSE 0 END) AS BIGINT) AS nz,
        |    CAST(sum(p_u) AS BIGINT) AS su
        |  FROM pu GROUP BY doc_id
        |)
        |SELECT d.doc_id,
        |  coalesce(a.nb, CAST(0 AS BIGINT)) AS n_bigrams,
        |  coalesce(a.nh, CAST(0 AS BIGINT)) AS n_hit,
        |  coalesce(a.nz, CAST(0 AS BIGINT)) AS n_zero,
        |  coalesce(a.su, CAST(0 AS BIGINT)) AS score_u
        |FROM (SELECT doc_id FROM documents WHERE doc_id < 20) d
        |LEFT JOIN agg a ON d.doc_id = a.doc_id
        |ORDER BY d.doc_id""".stripMargin,

    // trigram Kneser-Ney twin: same tokenizer, the (w1, w2, w3) triple
    // chain, the continuation-count bigram table and its marginals all
    // as exact counts off the one trigram aggregate, the identical
    // three-order integer-micro interpolation with `//` == Spark DIV
    "text_kneser_ney3" ->
      s"""WITH ${kn3Ctes("(SELECT * FROM triples WHERE doc_id < 20)")}
         |SELECT d.doc_id,
         |  coalesce(a.nt, CAST(0 AS BIGINT)) AS n_trigrams,
         |  coalesce(a.nh, CAST(0 AS BIGINT)) AS n_hit,
         |  coalesce(a.nb2, CAST(0 AS BIGINT)) AS n_bo2,
         |  coalesce(a.nz, CAST(0 AS BIGINT)) AS n_zero,
         |  coalesce(a.su, CAST(0 AS BIGINT)) AS score_u
         |FROM (SELECT doc_id FROM documents WHERE doc_id < 20) d
         |LEFT JOIN agg a ON d.doc_id = a.doc_id
         |ORDER BY d.doc_id""".stripMargin,

    // ppl-buckets3 twin: the SAME kn3 chain with the probe stream =
    // every doc, the integer length normalization, and the identical
    // per-lang NTILE over (score_n DESC, doc_id)
    "text_ppl_buckets3" ->
      s"""WITH ${kn3Ctes("triples")},
         |sc2 AS (
         |  SELECT d.doc_id, d.lang,
         |    coalesce(a.nt, CAST(0 AS BIGINT)) AS n_trigrams,
         |    CASE WHEN coalesce(a.nt, 0) = 0 THEN CAST(0 AS BIGINT)
         |         ELSE CAST(a.su // a.nt AS BIGINT) END AS score_n
         |  FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id
         |), nt3 AS (
         |  SELECT *, ntile(3) OVER (
         |    PARTITION BY lang ORDER BY score_n DESC, doc_id) AS tile
         |  FROM sc2
         |)
         |SELECT doc_id, lang, n_trigrams, score_n,
         |  CASE tile WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
         |    ELSE 'tail' END AS bucket
         |FROM nt3 ORDER BY doc_id""".stripMargin,

    // ppl-buckets twin: the text_lm_score model chain verbatim, score
    // integer-scaled with `//` == Spark DIV, same NTILE(3) over
    // (score_u, doc_id) per lang
    "text_ppl_buckets" ->
      s"""WITH toks AS (
         |  SELECT doc_id, lang, list_filter(
         |    string_split_regex(lower(text), '\\s+'), t -> t <> '') AS ts
         |  FROM documents
         |), bgs AS (
         |  SELECT doc_id,
         |    list_transform(range(1, len(ts)), i -> ts[i] || ' ' || ts[i+1]) AS bg
         |  FROM toks
         |), refc AS (
         |  SELECT bigram, count(*) AS ref_cnt FROM (
         |    SELECT unnest(bg) AS bigram FROM bgs
         |    WHERE ${QueryHelpers.hashBucketSql("CAST(doc_id AS VARCHAR)")} < 50
         |  ) GROUP BY bigram
         |  ORDER BY ref_cnt DESC, bigram LIMIT 1000
         |), ex AS (
         |  SELECT doc_id, unnest(bg) AS bigram FROM bgs
         |), j AS (
         |  SELECT e.doc_id, count(*) AS nb, count(r.ref_cnt) AS nh
         |  FROM ex e LEFT JOIN refc r USING (bigram) GROUP BY e.doc_id
         |), sc AS (
         |  SELECT t.doc_id, t.lang,
         |    CAST(CASE WHEN coalesce(j.nb, 0) = 0 THEN 1000000
         |      ELSE ((j.nb - j.nh) * 1000000) // j.nb END AS BIGINT) AS score_u
         |  FROM toks t LEFT JOIN j ON t.doc_id = j.doc_id
         |), nt AS (
         |  SELECT doc_id, lang, score_u,
         |    ntile(3) OVER (PARTITION BY lang ORDER BY score_u, doc_id) AS tile
         |  FROM sc
         |)
         |SELECT doc_id, lang, score_u,
         |  CASE tile WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END AS bucket
         |FROM nt ORDER BY doc_id""".stripMargin,

    "text_tfidf" ->
      s"""WITH toks AS (
         |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'),
         |    t -> t <> '') AS ts
         |  FROM documents),
         |tf AS (SELECT doc_id, unnest(ts) AS term FROM toks WHERE doc_id < 20),
         |tfc AS (SELECT doc_id, term, count(*) AS tf FROM tf GROUP BY 1, 2),
         |dfc AS (SELECT term, count(*) AS df FROM (
         |  SELECT doc_id, unnest(list_distinct(ts)) AS term FROM toks) u
         |  GROUP BY term),
         |n AS (SELECT count(*) AS nd FROM documents),
         |scored AS (
         |  SELECT doc_id, term, tf, df,
         |    CAST(tf AS DOUBLE) * (CAST(nd AS DOUBLE) - df + 0.5) / (df + 0.5) AS score
         |  FROM tfc JOIN dfc USING (term) CROSS JOIN n),
         |r AS (SELECT *, CAST(row_number() OVER (
         |    PARTITION BY doc_id ORDER BY score DESC, term) AS INT) AS rk
         |  FROM scored)
         |SELECT doc_id, rk, term, tf, df, ${QueryHelpers.rndSql("score", 4)} AS score
         |FROM r WHERE rk <= 3 ORDER BY doc_id, rk""".stripMargin,

    "text_normalize" ->
      """WITH n AS (SELECT doc_id,
        |    trim(regexp_replace(regexp_replace(lower(text),
        |      'https?://\S+', '', 'g'), '\s+', ' ', 'g')) AS norm
        |  FROM documents)
        |SELECT doc_id, CAST(length(norm) AS INT) AS n_chars_norm,
        |  md5(norm) AS norm_md5
        |FROM n ORDER BY doc_id""".stripMargin,

    "text_repetition" ->
      """WITH toks AS (SELECT doc_id,
        |    list_filter(regexp_split_to_array(lower(text), '\s+'), t -> t <> '') AS ts
        |  FROM documents),
        |tg AS (SELECT doc_id,
        |    list_transform(generate_series(1, len(ts) - 2),
        |      i -> ts[i] || ' ' || ts[i + 1] || ' ' || ts[i + 2]) AS tg
        |  FROM toks WHERE len(ts) >= 3)
        |SELECT doc_id, CAST(len(tg) AS INT) AS n_ngrams,
        |  CAST(len(tg) - len(list_distinct(tg)) AS INT) AS n_dup,
        |  CAST(len(tg) - len(list_distinct(tg)) AS DOUBLE) / len(tg) AS dup_ratio
        |FROM tg ORDER BY doc_id""".stripMargin,

    "text_entropy" ->
      s"""WITH cs AS (
         |  SELECT doc_id,
         |    list_transform(generate_series(1, length(lower(text))),
         |      i -> substr(lower(text), CAST(i AS INT), 1)) AS cs,
         |    CAST(length(lower(text)) AS BIGINT) AS n
         |  FROM documents WHERE length(lower(text)) > 0
         |), d AS (
         |  SELECT doc_id, n, cs, list_sort(list_distinct(cs)) AS alphabet
         |  FROM cs
         |), h AS (
         |  SELECT doc_id, n, CAST(len(alphabet) AS BIGINT) AS n_distinct,
         |    -list_sum(list_transform(alphabet,
         |      c -> (CAST(len(list_filter(cs, x -> x = c)) AS DOUBLE) / n)
         |           * ln(CAST(len(list_filter(cs, x -> x = c)) AS DOUBLE) / n)))
         |      AS entropy
         |  FROM d
         |)
         |SELECT doc_id, n, n_distinct, ${QueryHelpers.rndSql("entropy", 6)} AS entropy
         |FROM h ORDER BY doc_id""".stripMargin,

    "text_pii_redact" ->
      s"""WITH r AS (SELECT doc_id, text,
         |    regexp_replace(regexp_replace(text,
         |      '${TextAnalysis.emailRe}', '<EMAIL>', 'g'),
         |      '${TextAnalysis.phoneRe}', '<PHONE>', 'g') AS red
         |  FROM documents)
         |SELECT doc_id,
         |  CAST(len(regexp_extract_all(text, '${TextAnalysis.emailRe}')) AS INT) AS n_emails,
         |  CAST(len(regexp_extract_all(text, '${TextAnalysis.phoneRe}')) AS INT) AS n_phones,
         |  md5(red) AS red_md5
         |FROM r ORDER BY doc_id""".stripMargin,

    "text_ngram_freq" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    list_filter(regexp_split_to_array(lower(text), '\s+'), t -> t <> '') AS ts
        |  FROM documents
        |), bg AS (
        |  SELECT unnest(list_transform(generate_series(1, len(ts) - 1),
        |    i -> ts[i] || ' ' || ts[i + 1])) AS bigram
        |  FROM toks WHERE len(ts) >= 2
        |)
        |SELECT bigram, count(*) AS n FROM bg GROUP BY bigram
        |ORDER BY n DESC, bigram LIMIT 50""".stripMargin,

    "text_quality" ->
      s"""SELECT doc_id, n_chars,
         |  CAST(length(text) - length(regexp_replace(text, ' ', '', 'g')) + 1 AS INT) AS n_ws_tokens,
         |  CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS INT) AS n_bpe_tokens,
         |  CAST(length(regexp_replace(text, '[^.,!?;:]', '', 'g')) AS DOUBLE) / length(text) AS punct_ratio,
         |  CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE) / length(text) AS digit_ratio,
         |  CAST(length(regexp_replace(text, '[^A-Z]', '', 'g')) AS DOUBLE) / length(text) AS upper_ratio,
         |  ${TextAnalysis.stopwords
                .map(w => TextAnalysis.occSql("concat(' ', lower(text), ' ')", s" $w "))
                .mkString("(", " + ", ")")}
         |    / CAST(length(text) - length(regexp_replace(text, ' ', '', 'g')) + 1 AS DOUBLE) AS stop_ratio
         |FROM documents ORDER BY doc_id""".stripMargin,

    // gopherRules' twin: same list-native folds (nested list_filter for
    // the max-frequency count), same cross-multiplied integer rules
    "text_gopher_rules" -> {
      val stopList = TextAnalysis.stopwords
        .map(w => s"'$w'").mkString("[", ", ", "]")
      s"""WITH t AS (SELECT doc_id,
         |    list_filter(string_split(lower(text), ' '), w -> w <> '') AS ws
         |  FROM documents),
         |m AS (SELECT doc_id,
         |    CAST(len(ws) AS INT) AS n_words,
         |    CAST(list_reduce(list_transform(ws, w -> length(w)),
         |      (a, b) -> a + b) AS INT) AS sum_wl,
         |    CAST(len(list_filter(ws, w -> list_contains($stopList, w))) AS INT) AS n_stop,
         |    CAST(list_max(list_transform(list_distinct(ws),
         |      w -> len(list_filter(ws, x -> x = w)))) AS INT) AS max_wf,
         |    CASE WHEN len(ws) >= 3 THEN CAST(len(ws) - 2 AS INT) ELSE 0 END AS n_tri,
         |    CASE WHEN len(ws) >= 3 THEN CAST(len(ws) - 2 - len(list_distinct(
         |      list_transform(generate_series(1, len(ws) - 2),
         |        i -> ws[i] || ' ' || ws[i + 1] || ' ' || ws[i + 2]))) AS INT)
         |      ELSE 0 END AS n_tri_dup
         |  FROM t)
         |SELECT doc_id, n_words, sum_wl, n_stop, max_wf, n_tri, n_tri_dup,
         |  (n_words >= 50 AND n_words <= 100000) AS r_words,
         |  (3 * n_words <= sum_wl AND sum_wl <= 10 * n_words) AS r_mwl,
         |  (n_stop >= 2) AS r_stop,
         |  (5 * max_wf <= n_words) AS r_maxwf,
         |  (10 * n_tri_dup <= 3 * n_tri) AS r_dup,
         |  ((n_words >= 50 AND n_words <= 100000)
         |    AND (3 * n_words <= sum_wl AND sum_wl <= 10 * n_words)
         |    AND n_stop >= 2 AND 5 * max_wf <= n_words
         |    AND 10 * n_tri_dup <= 3 * n_tri) AS keep
         |FROM m ORDER BY doc_id""".stripMargin
    },

    "text_tokens" ->
      """SELECT source, count(*) AS n_docs,
        |  CAST(sum(length(text) - length(regexp_replace(text, ' ', '', 'g')) + 1) AS BIGINT) AS ws_tokens,
        |  CAST(sum(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))) AS BIGINT) AS bpe_tokens
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,

    "text_fingerprint" ->
      """WITH pos AS (SELECT doc_id, lower(text) AS t,
        |        unnest(generate_series(1, length(text) - 7)) AS i
        |      FROM documents WHERE length(text) >= 8),
        |sh AS (SELECT doc_id, i, md5(substr(t, CAST(i AS INT), 8)) AS h FROM pos),
        |w AS (SELECT doc_id, min(h) OVER (PARTITION BY doc_id ORDER BY i
        |        ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wh FROM sh),
        |fps AS (SELECT DISTINCT doc_id, wh FROM w)
        |SELECT doc_id, count(*) AS n_fp, min(wh) AS fp_min
        |FROM fps GROUP BY doc_id ORDER BY doc_id""".stripMargin)
}
