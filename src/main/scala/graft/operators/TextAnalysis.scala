package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators over the `documents` table (training-data
  * pipeline extension surface): language ID, quality scoring, token
  * counting, document fingerprinting.
  *
  * Everything is per-row narrow work (no shuffle except final grouped
  * reports) built from exact string/integer functions so the DuckDB
  * oracle matches bit-for-bit.
  */
object TextAnalysis {

  /** Vocabulary induction + per-doc coverage — the tokenizer-fitting
    * audit a pretraining pipeline runs before committing to a vocab:
    * the top-`v` corpus tokens by total occurrence count (ties →
    * lexicographic, so the vocabulary is deterministic on any engine)
    * form the vocabulary; each document then reports how much of its
    * DISTINCT token set the vocabulary covers (OOV rate = 1 −
    * coverage).
    *
    * Scale shape mirrors [[Dedup.contamination]]: the corpus-frequency
    * pass is ONE map-side-combined groupBy whose shuffle carries
    * per-partition token partials (bounded by |alphabet|·partitions,
    * never corpus volume); the vocabulary is by construction tiny
    * (top-v), reduced to one sorted 60-bit-hash array and broadcast;
    * the per-doc pass is then a single narrow map — sorted-merge
    * intersect via the codegen'd SortedIntersectCount kernel. Zero
    * corpus-side explode beyond the frequency pass, zero join shuffle.
    * Token identity crosses engines as the md5-derived 60-bit hash
    * ([[Dedup.shingleBaseHash]]), so any collision is identical on
    * both sides. Returns (doc_id, n_distinct, n_in_vocab); the
    * coverage ratio is left to the query layer so rounding stays
    * there.
    */
  def vocabCoverage(docs: DataFrame, v: Int): DataFrame = {
    val toks = docs.select(col("doc_id"),
      filter(split(lower(col("text")), "\\s+"), t => t =!= "").as("ts"))
    val freq = toks.select(explode(col("ts")).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("f"))
    val vocabArr = freq.orderBy(col("f").desc, col("tok")).limit(v)
      .agg(array_sort(array_distinct(
        collect_list(Dedup.shingleBaseHash(col("tok"))))).as("vh"))
    val perDoc = toks
      .where(size(col("ts")) > 0)
      .select(col("doc_id"), sort_array(array_distinct(
        transform(col("ts"), t => Dedup.shingleBaseHash(t)))).as("ths"))
    perDoc.crossJoin(broadcast(vocabArr))
      .select(col("doc_id"),
        size(col("ths")).cast("long").as("n_distinct"),
        graft.functions.ArrayKernels.sortedIntersectCount(col("ths"), col("vh"))
          .as("n_in_vocab"))
  }

  /** Stopword markers per language. Scores = Σ occurrence counts of the
    * language's markers in the space-padded lowercased text.
    */
  val markers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq(" the ", " and "),
    "de" -> Seq(" der ", " und ", " die "),
    "es" -> Seq(" el ", " los ", " que "),
    "fr" -> Seq(" le ", " les ", " des "),
    "zh" -> Seq("的", "。"))

  /** SQL text for the occurrence count of marker `m` in padded text
    * column `t` — (len − len(remove(m))) / len(m), computed in double
    * (exact for these small integers, identical on both engines).
    */
  def occSql(t: String, m: String): String = {
    val esc = m.replace("'", "''")
    s"(CAST(length($t) - length(replace($t, '$esc', '')) AS DOUBLE) / ${m.length}.0)"
  }

  private def scoreSql(t: String, ms: Seq[String]): String =
    ms.map(occSql(t, _)).mkString("(", " + ", ")")

  /** Language-ID heuristic: marker-count scores + argmax with a fixed
    * tie order (declaration order of [[markers]]). Output: doc_id, lang
    * (label), pred, per-language scores.
    */
  def langId(docs: DataFrame): DataFrame = {
    val padded = docs.withColumn("t", concat(lit(" "), lower(col("text")), lit(" ")))
    val scored = markers.foldLeft(padded) { case (df, (l, ms)) =>
      df.withColumn(s"s_$l", expr(scoreSql("t", ms)))
    }
    val langs = markers.map(_._1)
    val pred = langs.init.zipWithIndex.foldRight(lit(langs.last): Column) {
      case ((l, i), rest) =>
        val others = langs.drop(i + 1).map(o => col(s"s_$o"))
        val best = if (others.size == 1) others.head else greatest(others: _*)
        when(col(s"s_$l") >= best, lit(l)).otherwise(rest)
    }
    scored.select(
      (col("doc_id") +: col("lang") +: pred.as("pred") +:
        langs.map(l => col(s"s_$l"))): _*)
  }

  /** English stopwords for the quality stop_ratio (space-padded exact
    * token matches, like the langId markers).
    */
  val stopwords: Seq[String] =
    Seq("the", "and", "of", "to", "in", "a", "is", "it", "for", "on")

  /** Gopher-style document-quality GATE (Rae et al. 2021, arXiv:
    * 2112.11446 Table A1 — the published heuristic filter suite every
    * crawl pipeline since has adapted): five doc-level rules, each an
    * explicit boolean column, composed into one `keep` flag.
    *
    *  - r_words:  50 ≤ word count ≤ 100 000
    *  - r_mwl:    3 ≤ mean word length ≤ 10 — compared CROSS-MULTIPLIED
    *              (3·n ≤ Σlen ≤ 10·n), so the gate is integer-exact and
    *              no float ratio ever forms
    *  - r_stop:   ≥ 2 stopword hits (the Gopher "contains required
    *              words" proxy over [[stopwords]])
    *  - r_maxwf:  most-frequent word ≤ 20 % of tokens (5·max_wf ≤ n —
    *              the repeated-token spam signal)
    *  - r_dup:    duplicate word-trigram fraction ≤ 30 % (10·dup ≤ 3·n)
    *
    * Entirely NARROW: tokens, counts, and the nested most-frequent-word
    * fold never leave the row (the charEntropy discipline) — zero
    * shuffle at any corpus size; per-row cost is O(n_distinct·n) for
    * the max-frequency fold, bounded by doc length. All outputs are
    * integers/booleans, so the oracle gate is a hash match with no
    * rounding contract at all. Fixture calibration (measured before
    * build): r_words trips 223/500 docs at sf0.01, r_stop 112, r_maxwf
    * 7; r_mwl and r_dup pass everything on this synthetic corpus (the
    * published bands are kept faithful rather than re-tuned — the
    * booleans still hash-gate).
    */
  def gopherRules(docs: DataFrame): DataFrame = {
    val ws = filter(split(lower(col("text")), " "), w => w =!= "")
    val base = docs.select(col("doc_id"), ws.as("ws"))
      .select(col("doc_id"), col("ws"),
        size(col("ws")).as("n_words"),
        aggregate(transform(col("ws"), w => length(w)),
          lit(0), (acc, x) => acc + x).as("sum_wl"),
        size(filter(col("ws"), w => w.isin(stopwords: _*))).as("n_stop"),
        array_max(transform(array_distinct(col("ws")),
          w => size(filter(col("ws"), x => x === w)))).as("max_wf"))
    val tg = transform(sequence(lit(1), size(col("ws")) - 2),
      i => concat(element_at(col("ws"), i), lit(" "),
        element_at(col("ws"), i + 1), lit(" "),
        element_at(col("ws"), i + 2)))
    base.select(col("doc_id"), col("n_words"), col("sum_wl"),
        col("n_stop"), col("max_wf"),
        when(size(col("ws")) >= 3, size(tg)).otherwise(lit(0)).as("n_tri"),
        when(size(col("ws")) >= 3, size(tg) - size(array_distinct(tg)))
          .otherwise(lit(0)).as("n_tri_dup"))
      .withColumn("r_words",
        col("n_words") >= 50 && col("n_words") <= 100000)
      .withColumn("r_mwl",
        lit(3) * col("n_words") <= col("sum_wl") &&
          col("sum_wl") <= lit(10) * col("n_words"))
      .withColumn("r_stop", col("n_stop") >= 2)
      .withColumn("r_maxwf", lit(5) * col("max_wf") <= col("n_words"))
      .withColumn("r_dup",
        lit(10) * col("n_tri_dup") <= lit(3) * col("n_tri"))
      .withColumn("keep",
        col("r_words") && col("r_mwl") && col("r_stop") &&
          col("r_maxwf") && col("r_dup"))
  }

  /** The Gopher gate as ONE collapse-proof boolean expression: the
    * token array is BOUND as a lambda variable of a single-element
    * transform, so it evaluates exactly once per row NO MATTER how
    * Catalyst inlines the expression — when `gopherRules(...).where(
    * col("keep"))` collapses into one pushed-down filter, the unbound
    * form re-evaluates `split(lower(text))` at every reference,
    * including INSIDE the max-frequency rule's nested per-element
    * lambda: measured 0.14 s → 19 s at sf0.1 under the
    * pipeline_select_e2e composition; this form restores the 0.1-s
    * class. Semantics identical to [[gopherRules]]'s `keep`
    * (spec-pinned row-for-row).
    */
  def gopherKeepExpr: Column = {
    val ws0 = filter(split(lower(col("text")), " "), w => w =!= "")
    element_at(transform(array(ws0), ws => {
      val nWords = size(ws)
      val sumWl = aggregate(transform(ws, w => length(w)),
        lit(0), (a, x) => a + x)
      val nStop = size(filter(ws, w => w.isin(stopwords: _*)))
      val maxWf = array_max(transform(array_distinct(ws),
        w => size(filter(ws, x => x === w))))
      val tg = transform(sequence(lit(1), nWords - 2),
        i => concat(element_at(ws, i), lit(" "),
          element_at(ws, i + 1), lit(" "), element_at(ws, i + 2)))
      val nTri = when(nWords >= 3, size(tg)).otherwise(lit(0))
      val nTriDup = when(nWords >= 3, size(tg) - size(array_distinct(tg)))
        .otherwise(lit(0))
      (nWords >= 50 && nWords <= 100000) &&
        (lit(3) * nWords <= sumWl && sumWl <= lit(10) * nWords) &&
        (nStop >= 2) && (lit(5) * maxWf <= nWords) &&
        (lit(10) * nTriDup <= lit(3) * nTri)
    }), 1)
  }

  /** Per-document quality metrics — all per-row exact arithmetic. */
  def quality(docs: DataFrame): DataFrame = {
    val stopHits = stopwords
      .map(w => expr(occSql("concat(' ', lower(text), ' ')", s" $w ")))
      .reduce(_ + _)
    docs.select(
      col("doc_id"),
      col("n_chars"),
      // whitespace tokens = spaces + 1 (exact; avoids split() trailing
      // empty-string dialect differences)
      (length(col("text")) - length(regexp_replace(col("text"), " ", "")) + lit(1))
        .as("n_ws_tokens"),
      size(regexp_extract_all(col("text"),
        lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0))).as("n_bpe_tokens"),
      (length(regexp_replace(col("text"), "[^.,!?;:]", "")).cast("double") /
        length(col("text"))).as("punct_ratio"),
      (length(regexp_replace(col("text"), "[^0-9]", "")).cast("double") /
        length(col("text"))).as("digit_ratio"),
      (length(regexp_replace(col("text"), "[^A-Z]", "")).cast("double") /
        length(col("text"))).as("upper_ratio"),
      // stopword tokens / whitespace tokens — the filter every corpus
      // quality pass applies (low stop_ratio ≈ non-natural-language)
      (stopHits / (length(col("text")) - length(regexp_replace(col("text"), " ", ""))
        + lit(1)).cast("double")).as("stop_ratio"))
  }

  /** Corpus token report grouped by source (exact integer sums). */
  def tokenReport(docs: DataFrame): DataFrame =
    docs.select(col("source"),
        (length(col("text")) - length(regexp_replace(col("text"), " ", "")) + lit(1))
          .as("nws"),
        size(regexp_extract_all(col("text"),
          lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0))).as("nbpe"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("nws")).as("ws_tokens"),
        sum(col("nbpe")).as("bpe_tokens"))

  /** Character-level Shannon entropy per doc — the compressibility /
    * gibberish signal corpus filters pair with the stopword ratio (low
    * entropy = repeated boilerplate, high = random noise). Entirely
    * NARROW: chars never leave the row — the char array, its sorted
    * distinct alphabet, and the Σ p·ln p fold are per-row higher-order
    * functions, zero shuffle at any corpus size (vs the obvious
    * explode-groupBy, which shuffles one row per CHARACTER of the
    * corpus). Per-row cost is O(|alphabet|·len); the fold runs over the
    * SORTED alphabet so both engines accumulate the float sum in the
    * identical order.
    */
  def charEntropy(docs: DataFrame): DataFrame = {
    docs.select(col("doc_id"), lower(col("text")).as("t"))
      .where(length(col("t")) > 0)
      .select(col("doc_id"),
        transform(sequence(lit(1), length(col("t"))),
          i => col("t").substr(i, lit(1))).as("cs"))
      .select(col("doc_id"), size(col("cs")).cast("long").as("n"),
        col("cs"), array_sort(array_distinct(col("cs"))).as("alphabet"))
      .select(col("doc_id"), col("n"),
        size(col("alphabet")).cast("long").as("n_distinct"),
        (-aggregate(col("alphabet"), lit(0.0),
          (acc, c) => {
            val prob = size(filter(col("cs"), x => x === c)).cast("double") /
              col("n").cast("double")
            acc + prob * log(prob)
          })).as("entropy"))
  }

  /** C4-style text normalization: lowercase, strip URLs, collapse
    * whitespace runs, trim. Per-row narrow work; output carries the
    * normalized length and an md5 digest so the oracle compares the
    * full transform without shipping the text twice.
    */
  def normalize(docs: DataFrame): DataFrame = {
    val norm = trim(regexp_replace(
      regexp_replace(lower(col("text")), "https?://\\S+", ""), "\\s+", " "))
    docs.select(col("doc_id"), norm.as("norm"))
      .select(col("doc_id"), length(col("norm")).as("n_chars_norm"),
        md5(col("norm")).as("norm_md5"))
  }

  /** Gopher-style repetition signal: fraction of duplicate word
    * 3-grams within the document. Entirely per-row (array built with
    * transform/sequence, dup count = size − size(array_distinct)):
    * no explode, no shuffle — the shape that scans 100 TB as a map.
    */
  def repetition(docs: DataFrame): DataFrame = {
    val ts = filter(split(lower(col("text")), "\\s+"), t => t =!= "")
    // guard size>=3: Spark sequence(1, 0) counts DOWN where DuckDB
    // generate_series is empty
    docs.select(col("doc_id"), ts.as("ts"))
      .where(size(col("ts")) >= 3)
      .select(col("doc_id"), transform(
        sequence(lit(1), size(col("ts")) - 2),
        i => concat(
          element_at(col("ts"), i), lit(" "),
          element_at(col("ts"), i + 1), lit(" "),
          element_at(col("ts"), i + 2))).as("tg"))
      .select(col("doc_id"),
        size(col("tg")).as("n_ngrams"),
        (size(col("tg")) - size(array_distinct(col("tg")))).as("n_dup"))
      .withColumn("dup_ratio",
        col("n_dup").cast("double") / col("n_ngrams"))
  }

  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val phoneRe = "\\+?[0-9][0-9() -]{6,}[0-9]"

  /** PII scrub: count and redact email addresses and phone-number
    * shapes (the pass every public-corpus pipeline runs before
    * training). Redacted text is digested to md5 for the oracle.
    */
  def piiRedact(docs: DataFrame): DataFrame = {
    val red = regexp_replace(
      regexp_replace(col("text"), emailRe, "<EMAIL>"), phoneRe, "<PHONE>")
    docs.select(col("doc_id"),
      size(regexp_extract_all(col("text"), lit(emailRe), lit(0))).as("n_emails"),
      size(regexp_extract_all(col("text"), lit(phoneRe), lit(0))).as("n_phones"),
      md5(red).as("red_md5"))
  }

  /** Winnowing document fingerprint (rolling k-gram hashes, window
    * minimum): k=8 char shingles hashed with md5, min per sliding window
    * of w=4 positions, distinct mins = the fingerprint set.
    * Output: doc_id, n_fp, fp_min.
    */
  def winnowFingerprint(docs: DataFrame, k: Int = 8, w: Int = 4): DataFrame = {
    // spread a single-partition small file before the per-char explode
    val p = docs.sparkSession.sparkContext.defaultParallelism
    val src = if (docs.rdd.getNumPartitions >= p) docs else docs.repartition(p)
    val pos = src.select(col("doc_id"), lower(col("text")).as("t"))
      .where(length(col("t")) >= k)
      .select(col("doc_id"),
        explode(sequence(lit(1), length(col("t")) - (k - 1))).as("i"),
        col("t"))
      .select(col("doc_id"), col("i"), md5(col("t").substr(col("i"), lit(k))).as("h"))
    val win = Window.partitionBy(col("doc_id")).orderBy(col("i"))
      .rowsBetween(0, w - 1)
    pos.withColumn("wh", min(col("h")).over(win))
      .select(col("doc_id"), col("wh")).distinct()
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_fp"), min(col("wh")).as("fp_min"))
  }

  /** Top-k characteristic terms per probe doc by tf·idf-style weight.
    *
    * The idf factor is the BM25-ish odds ratio (N − df + 0.5)/(df + 0.5)
    * rather than a logarithm: ln/log are not guaranteed bit-identical
    * across engines (library last-ulp differences), while this form is
    * pure rational arithmetic over exact integer counts — identical
    * IEEE on both engines, so ranking ties can't flip.
    *
    * Scale shape: term frequencies explode only the PROBE docs; document
    * frequencies aggregate the corpus once keyed by term (map-side
    * combined after the per-doc distinct); the join carries |probe
    * terms| rows. At 100 TB the df table is the only corpus-wide pass.
    */
  /** BM25 relevance of every document to a fixed literal query-term
    * set (k1 = 1.2, b = 0.75) — the ranked-retrieval scorer a corpus
    * search/eval harness runs. Like [[tfidfTopK]], idf is the BM25
    * odds ratio (N − df + 0.5)/(df + 0.5) WITHOUT the logarithm:
    * ln differs in the last ulp across engines while the rational
    * form is identical IEEE arithmetic.
    *
    * Float determinism: the per-term contributions are summed by one
    * literal left-to-right expression chain (terms is a fixed list,
    * not data), so the addition order — and hence every last bit —
    * matches any engine that writes the same chain; there is no
    * data-ordered float aggregate anywhere.
    *
    * Scale shape: per-term tf and dl are per-row array ops (narrow);
    * the ONLY corpus-wide pass is a single 1-row aggregate (N, Σdl,
    * per-term df) that broadcasts back — so the whole scorer is one
    * scan + one narrow map at any corpus size, with no explode and no
    * per-term shuffle.
    */
  def bm25(docs: DataFrame, terms: Seq[String]): DataFrame = {
    val toks = docs.select(col("doc_id"),
      filter(split(lower(col("text")), "\\s+"), t => t =!= "").as("ts"))
    val withTf = terms.zipWithIndex.foldLeft(
      toks.withColumn("dl", size(col("ts")))) { case (d, (t, i)) =>
        d.withColumn(s"tf_$i", size(filter(col("ts"), x => x === t)))
      }
    val aggCols = count(lit(1)).as("nd") +: sum(col("dl")).as("sdl") +:
      terms.indices.map(i =>
        sum(when(col(s"tf_$i") > 0, 1L).otherwise(0L)).as(s"df_$i"))
    val stats = withTf.agg(aggCols.head, aggCols.tail: _*)
    val avgdl = col("sdl").cast("double") / col("nd")
    val contribs = terms.indices.map { i =>
      val tf = col(s"tf_$i").cast("double")
      val idf = (col("nd").cast("double") - col(s"df_$i") + lit(0.5)) /
        (col(s"df_$i") + lit(0.5))
      idf * tf * lit(2.2) /
        (tf + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / avgdl))
    }
    withTf.crossJoin(broadcast(stats))
      .select(col("doc_id") +: col("dl") +:
        terms.indices.map(i => col(s"tf_$i")) :+
        contribs.reduce(_ + _).as("score"): _*)
  }

  def tfidfTopK(docs: DataFrame, nProbe: Int, k: Int): DataFrame = {
    def toks(df: DataFrame) = df.select(col("doc_id"),
      filter(split(lower(col("text")), "\\s+"), t => t =!= "").as("ts"))
    val tf = toks(docs.where(col("doc_id") < nProbe))
      .select(col("doc_id"), explode(col("ts")).as("term"))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val df_ = toks(docs)
      .select(col("doc_id"), explode(array_distinct(col("ts"))).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("nd"))
    val scored = tf.join(df_, "term").crossJoin(broadcast(n))
      .withColumn("score", col("tf").cast("double") *
        (col("nd").cast("double") - col("df") + lit(0.5)) /
        (col("df") + lit(0.5)))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("term"))
    scored.withColumn("rk", row_number().over(w)).where(col("rk") <= k)
      .select(col("doc_id"), col("rk"), col("term"), col("tf"), col("df"),
        col("score"))
  }

  /** CCNet-style count-LM quality scoring, made deterministically
    * gateable: a bigram "language model" is trained on a held-in
    * reference slice (md5 hash-bucket < `refBucketLt` of doc_id — the
    * engine's zero-rand split primitive), capped to the top-`v`
    * bigrams by count (ties lexicographic), and every document is
    * scored against it. All outputs are integer counts, so the gate
    * is exact — the real pipeline's log-perplexity is a monotone
    * function of these counts, but ln() is not cross-engine
    * bit-stable, so the registered surface stays rational
    * (the text_tfidf rational-idf discipline).
    *
    * Scale shape: training is ONE map-side-combined bigram count over
    * the reference slice (the standard LM-training aggregate) + a
    * bounded top-v TakeOrdered; the model is tiny by construction and
    * broadcast, so scoring is a narrow pass over the doc bigram
    * stream — no shuffle carries corpus text.
    *
    * Returns (doc_id, n_bigrams, n_hits, hit_cnt_sum); rate/average
    * derivation stays in the query layer with the rounding
    * convention. Docs with < 2 tokens surface with n_bigrams = 0
    * (explode_outer keeps them).
    */
  /** Interpolated Kneser-Ney bigram scoring (Kneser & Ney 1995; the
    * interpolated form and d = 0.75 are Chen & Goodman 1998's
    * recommended configuration) — the real smoothed LM the count-LM
    * proxies ([[lmBigramScore]]) stop short of, realized in EXACT
    * integer micros so the gate is a hash match:
    *
    *   P(w2|w1) = max(c12 − d, 0)/c1 + d·N1+(w1·)/c1 · N1+(·w2)/Npairs
    *
    * with d = 3/4 cleared to integers: term1 = (4·c12 − 3)·10⁶ DIV
    * (4·c1), λ = 3·N1+(w1·)·10⁶ DIV (4·c1), Pcont = N1+(·w2)·10⁶ DIV
    * Npairs, p_u = term1 + (λ·Pcont) DIV 10⁶; an unseen-history bigram
    * (c1 = 0) backs off to Pcont directly. Every quantity is a BIGINT
    * count or floor division — no float ever crosses engines.
    *
    * Scale shape: the model is the classic distributed LM layout —
    * bigram counts are ONE map-side-combined aggregate, the w1/w2
    * marginals derive from it reusing its (w1, w2) partitioning, the
    * model stays distributed (NEVER collected or capped — unlike the
    * broadcast proxy models), and the probe-doc bigram stream joins
    * against it; Npairs rides a 1-row broadcast.
    *
    * The model trains on the held-in hash-bucket slice (< trainLt —
    * the lmBigramScore split convention), the probe docs score
    * regardless of slice: held-OUT probes carry genuinely unseen
    * bigrams and histories, so every smoothing branch (discounted hit,
    * continuation backoff, unseen history) is live in the gated
    * output, not just the hit path.
    *
    * Returns per probe doc: (doc_id, n_bigrams, n_hit, n_zero,
    * score_u) — n_hit = bigrams seen in training, n_zero = bigrams
    * whose integer-micro score floors to 0 (mostly unseen
    * continuations, but a seen-history — even hit — bigram can also
    * floor to 0 when both its discounted term and its λ·Pcont product
    * truncate below one micro), score_u = Σ p_u exact.
    */
  def knBigramScore(docs: DataFrame, nProbe: Int, trainLt: Int): DataFrame = {
    val ts = filter(split(lower(col("text")), "\\s+"), t => t =!= "")
    val withBg = docs.select(col("doc_id"), ts.as("ts"))
      .select(col("doc_id"),
        when(size(col("ts")) >= 2,
          transform(sequence(lit(1), size(col("ts")) - 1),
            i => struct(element_at(col("ts"), i).as("w1"),
              element_at(col("ts"), i + 1).as("w2"))))
          .otherwise(array().cast("array<struct<w1:string,w2:string>>"))
          .as("bg"))
    // explode_outer + null-drop, NOT inner explode: the
    // InferFiltersFromGenerate trap (lmRhoScore scaladoc)
    val pairs = withBg
      .select(col("doc_id"), explode_outer(col("bg")).as("b"))
      .where(col("b").isNotNull)
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
    val big = pairs
      .where(graft.queries.QueryHelpers.hashBucket(
        col("doc_id").cast("string")) < trainLt)
      .groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("c12"))
      .localCheckpoint(true) // feeds three marginals + the probe join
    val w1s = big.groupBy(col("w1"))
      .agg(sum(col("c12")).as("c1"), count(lit(1)).as("n1p_fwd"))
    val w2s = big.groupBy(col("w2")).agg(count(lit(1)).as("n1p_bwd"))
    val npairs = big.agg(count(lit(1)).as("npairs"))
    val pb = pairs.where(col("doc_id") < nProbe)
    val scored = pb
      .join(big, Seq("w1", "w2"), "left")
      .join(w1s, Seq("w1"), "left")
      .join(w2s, Seq("w2"), "left")
      .crossJoin(broadcast(npairs))
      .withColumn("pcont_u",
        expr("coalesce((n1p_bwd * 1000000) DIV npairs, 0)"))
      .withColumn("p_u", expr(
        """CASE WHEN c1 IS NOT NULL THEN
          |  (CASE WHEN c12 IS NOT NULL
          |     THEN ((4 * c12 - 3) * 1000000) DIV (4 * c1) ELSE 0 END)
          |  + ((3 * n1p_fwd * 1000000) DIV (4 * c1) * pcont_u) DIV 1000000
          |ELSE pcont_u END""".stripMargin))
    val perDoc = scored.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        count(col("c12")).as("n_hit"),
        sum(when(col("p_u") === 0L, 1L).otherwise(0L)).as("n_zero"),
        sum(col("p_u")).as("score_u"))
    docs.where(col("doc_id") < nProbe).select(col("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"),
        coalesce(col("n_zero"), lit(0L)).as("n_zero"),
        coalesce(col("score_u"), lit(0L)).as("score_u"))
  }

  /** Interpolated TRIGRAM Kneser-Ney (Kneser & Ney 1995; Chen &
    * Goodman 1998's interpolated form, d = 3/4 at both discounted
    * orders) — the recursive backoff chain [[knBigramScore]] stops
    * short of, and the shape of the 5-gram KN LM that corpus filters
    * like CCNet actually run:
    *
    *   P(w3|w1w2) = max(c123−d,0)/c12• + d·N1+(w1w2·)/c12• · P(w3|w2)
    *   P(w3|w2)   = max(c'23−d,0)/c'2• + d·N1+(w2·)/c'2•   · P(w3)
    *   P(w3)      = N1+(·w3) / N1+(··)
    *
    * The middle order runs on CONTINUATION counts c'(w2w3) =
    * N1+(·w2w3) — the KN insight that a word's lower-order weight is
    * how many distinct contexts it completes, not how often — with
    * c12• = Σ_w3 c123 and c'2• = Σ_w3 c'(w2w3) = N1+(·w2·); the
    * lowest order is the continuation unigram (no discount, the
    * published bottom of the recursion). Cleared to integer micros
    * with the [[knBigramScore]] discipline at every order: term =
    * (4·c − 3)·10⁶ DIV (4·ctx), λ = 3·N·10⁶ DIV (4·ctx),
    * interpolation product (λ·p) DIV 10⁶. An unseen trigram history
    * backs off to the bigram level; an unseen bigram-continuation
    * context to the continuation unigram; every quantity is a BIGINT
    * count or floor division — no float ever crosses engines.
    *
    * Scale shape: ONE map-side-combined trigram count aggregate;
    * EVERY marginal (trigram-context sums, the bigram continuation
    * table, its context sums, the continuation unigram, N1+(··))
    * derives from it in strictly shrinking aggregates; the model
    * stays distributed and uncapped; the probe-doc trigram stream
    * joins against it; N1+(··) rides a 1-row broadcast.
    *
    * Returns per probe doc: (doc_id, n_trigrams, n_hit, n_bo2,
    * n_zero, score_u) — n_hit = trigrams seen in training, n_bo2 =
    * trigrams whose history (w1, w2) is unseen (the level-2 backoff
    * fired), n_zero = trigrams whose integer-micro score floors to 0,
    * score_u = Σ p_u exact. Docs with < 3 tokens surface with
    * n_trigrams = 0 (explode_outer keeps them).
    */
  def knTrigramScore(docs: DataFrame, nProbe: Int, trainLt: Int): DataFrame =
    knTrigramScored(docs, trainLt, Some(nProbe))

  /** [[knTrigramScore]] over the WHOLE corpus — the scoring pass a
    * CCNet-style perplexity filter actually runs (every doc scored
    * against the held-in-slice model). Same chain, no probe cut.
    */
  def knTrigramScoreAll(docs: DataFrame, trainLt: Int): DataFrame =
    knTrigramScored(docs, trainLt, None)

  private def knTrigramScored(docs: DataFrame, trainLt: Int,
      nProbe: Option[Int]): DataFrame = {
    def probed(df: DataFrame): DataFrame =
      nProbe.map(n => df.where(col("doc_id") < n)).getOrElse(df)
    val ts = filter(split(lower(col("text")), "\\s+"), t => t =!= "")
    val withTg = docs.select(col("doc_id"), ts.as("ts"))
      .select(col("doc_id"),
        when(size(col("ts")) >= 3,
          transform(sequence(lit(1), size(col("ts")) - 2),
            i => struct(element_at(col("ts"), i).as("w1"),
              element_at(col("ts"), i + 1).as("w2"),
              element_at(col("ts"), i + 2).as("w3"))))
          .otherwise(array()
            .cast("array<struct<w1:string,w2:string,w3:string>>"))
          .as("tg"))
    // explode_outer + null-drop, NOT inner explode: the
    // InferFiltersFromGenerate trap (lmRhoScore scaladoc)
    val triples = withTg
      .select(col("doc_id"), explode_outer(col("tg")).as("t"))
      .where(col("t").isNotNull)
      .select(col("doc_id"), col("t.w1").as("w1"), col("t.w2").as("w2"),
        col("t.w3").as("w3"))
    val tri = triples
      .where(graft.queries.QueryHelpers.hashBucket(
        col("doc_id").cast("string")) < trainLt)
      .groupBy(col("w1"), col("w2"), col("w3"))
      .agg(count(lit(1)).as("c123"))
      .localCheckpoint(true) // feeds two marginal chains + the probe join
    val ctx12 = tri.groupBy(col("w1"), col("w2"))
      .agg(sum(col("c123")).as("c12dot"), count(lit(1)).as("n1p12"))
    val cc = tri.groupBy(col("w2"), col("w3"))
      .agg(count(lit(1)).as("cc23"))
      .localCheckpoint(true) // feeds ccd + cu + nbb + the probe join
    val ccd = cc.groupBy(col("w2"))
      .agg(sum(col("cc23")).as("ccdot2"), count(lit(1)).as("n1p2f"))
    val cu = cc.groupBy(col("w3")).agg(count(lit(1)).as("n1p3b"))
    val nbb = cc.agg(count(lit(1)).as("nbb"))
    val pb = probed(triples)
    val scored = pb
      .join(tri, Seq("w1", "w2", "w3"), "left")
      .join(ctx12, Seq("w1", "w2"), "left")
      .join(cc, Seq("w2", "w3"), "left")
      .join(ccd, Seq("w2"), "left")
      .join(cu, Seq("w3"), "left")
      .crossJoin(broadcast(nbb))
      .withColumn("p1_u", expr("coalesce((n1p3b * 1000000) DIV nbb, 0)"))
      .withColumn("p2_u", expr(
        """CASE WHEN ccdot2 IS NOT NULL THEN
          |  (CASE WHEN cc23 IS NOT NULL
          |     THEN ((4 * cc23 - 3) * 1000000) DIV (4 * ccdot2) ELSE 0 END)
          |  + ((3 * n1p2f * 1000000) DIV (4 * ccdot2) * p1_u) DIV 1000000
          |ELSE p1_u END""".stripMargin))
      .withColumn("p_u", expr(
        """CASE WHEN c12dot IS NOT NULL THEN
          |  (CASE WHEN c123 IS NOT NULL
          |     THEN ((4 * c123 - 3) * 1000000) DIV (4 * c12dot) ELSE 0 END)
          |  + ((3 * n1p12 * 1000000) DIV (4 * c12dot) * p2_u) DIV 1000000
          |ELSE p2_u END""".stripMargin))
    val perDoc = scored.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_trigrams"),
        count(col("c123")).as("n_hit"),
        sum(when(col("c12dot").isNull, 1L).otherwise(0L)).as("n_bo2"),
        sum(when(col("p_u") === 0L, 1L).otherwise(0L)).as("n_zero"),
        sum(col("p_u")).as("score_u"))
    probed(docs.select(col("doc_id")))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_trigrams"), lit(0L)).as("n_trigrams"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"),
        coalesce(col("n_bo2"), lit(0L)).as("n_bo2"),
        coalesce(col("n_zero"), lit(0L)).as("n_zero"),
        coalesce(col("score_u"), lit(0L)).as("score_u"))
  }

  /** RHO-loss learnability scoring (Mindermann et al., ICML 2022 —
    * "points that are learnable, worth learning, and not yet learnt"):
    * the two-model selection rule, score = loss(current model) −
    * loss(holdout reference model), realized on the count-LM chassis
    * of [[lmBigramScore]]. Two bigram models train on DISJOINT
    * hash-bucket slices — the reference (clean holdout, bucket <
    * `refLt`) and the current model's training pool (bucket ∈ [curGe,
    * curLt)) — and every doc is scored against BOTH in one pass over
    * the shared bigram stream (both capped models broadcast; the
    * corpus text never shuffles). All outputs are integer counts, so
    * the selection gate is exact (the lmBigramScore rationale: real
    * RHO uses log-likelihoods, a monotone function of these counts,
    * but ln() is not cross-engine bit-stable).
    *
    * Returns (doc_id, n_bigrams, n_ref_hits, n_cur_hits).
    */
  def lmRhoScore(docs: DataFrame, refLt: Int, curGe: Int, curLt: Int,
      v: Int): DataFrame = {
    val ts = filter(split(lower(col("text")), "\\s+"), t => t =!= "")
    val withBg = docs.select(col("doc_id"), ts.as("ts"))
      .select(col("doc_id"),
        when(size(col("ts")) >= 2,
          transform(sequence(lit(1), size(col("ts")) - 1),
            i => concat(element_at(col("ts"), i), lit(" "),
              element_at(col("ts"), i + 1))))
          .otherwise(array().cast("array<string>")).as("bg"))
    val bkt = graft.queries.QueryHelpers.hashBucket(col("doc_id").cast("string"))
    // ONE training scan for both models: explode the union of the two
    // slices once, count per (bigram, slice) map-side-combined, then
    // two bounded TakeOrdered selections over the (small) count table.
    // Zero-count bigrams are filtered per side — each model sees only
    // its own slice's bigrams, exactly as if trained separately.
    // explode_OUTER + null-drop, NOT inner explode: inner explode lets
    // InferFiltersFromGenerate clone the whole (interpreted-HOF) bigram
    // expression into a size(bg) > 0 pre-filter — measured 16.3 s vs
    // 0.39 s for the identical pass at sf0.1.
    val counts = withBg
      .where(bkt < refLt || (bkt >= curGe && bkt < curLt))
      .select((bkt < refLt).as("is_ref"), explode_outer(col("bg")).as("bigram"))
      .where(col("bigram").isNotNull)
      .groupBy(col("bigram"))
      .agg(sum(when(col("is_ref"), 1L).otherwise(0L)).as("ref_cnt"),
        sum(when(col("is_ref"), 0L).otherwise(1L)).as("cur_cnt"))
      .localCheckpoint(true) // feeds both model selections
    val refModel = counts.where(col("ref_cnt") > 0L)
      .select(col("bigram"), col("ref_cnt"))
      .orderBy(col("ref_cnt").desc, col("bigram")).limit(v)
    val curModel = counts.where(col("cur_cnt") > 0L)
      .select(col("bigram"), col("cur_cnt"))
      .orderBy(col("cur_cnt").desc, col("bigram")).limit(v)
    withBg.select(col("doc_id"), explode_outer(col("bg")).as("bigram"))
      .join(broadcast(refModel), Seq("bigram"), "left")
      .join(broadcast(curModel), Seq("bigram"), "left")
      .groupBy(col("doc_id"))
      .agg(
        count(col("bigram")).as("n_bigrams"),
        count(col("ref_cnt")).as("n_ref_hits"),
        count(col("cur_cnt")).as("n_cur_hits"))
  }

  def lmBigramScore(docs: DataFrame, refBucketLt: Int, v: Int): DataFrame = {
    val ts = filter(split(lower(col("text")), "\\s+"), t => t =!= "")
    // guard size>=2: Spark sequence(1, 0) counts DOWN (DuckDB range is
    // empty there) — the repetition()/BPE guard
    val withBg = docs.select(col("doc_id"), ts.as("ts"))
      .select(col("doc_id"),
        when(size(col("ts")) >= 2,
          transform(sequence(lit(1), size(col("ts")) - 1),
            i => concat(element_at(col("ts"), i), lit(" "),
              element_at(col("ts"), i + 1))))
          .otherwise(array().cast("array<string>")).as("bg"))
    val refModel = withBg
      .where(graft.queries.QueryHelpers.hashBucket(
        col("doc_id").cast("string")) < refBucketLt)
      .select(explode(col("bg")).as("bigram"))
      .groupBy(col("bigram")).agg(count(lit(1)).as("ref_cnt"))
      .orderBy(col("ref_cnt").desc, col("bigram")).limit(v)
    withBg.select(col("doc_id"), explode_outer(col("bg")).as("bigram"))
      .join(broadcast(refModel), Seq("bigram"), "left")
      .groupBy(col("doc_id"))
      .agg(
        count(col("bigram")).as("n_bigrams"),
        count(col("ref_cnt")).as("n_hits"),
        sum(coalesce(col("ref_cnt"), lit(0L))).as("hit_cnt_sum"))
  }
}
