package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.queries.QueryHelpers._

/** Training-data-pipeline operators (builder prompt: first-class
  * components alongside SURVEY §2): deterministic dataset splitting,
  * stratified sampling, histogramming, class-balance statistics, feature
  * scaling, and sketch-quality pins.
  *
  * Design rules:
  *  - Splits/samples are content-hash-deterministic (md5 of the record
  *    key), NEVER rand(): reproducible across runs, engines, cluster
  *    sizes, and re-partitioning — the property a training pipeline needs
  *    so a re-run doesn't leak val into train.
  *  - Approximate sketches (HLL distinct, approx quantiles) cannot be
  *    value-compared across engines, so their queries pin the exact value
  *    AND a boolean asserting the sketch landed within its error bound —
  *    the oracle expects literal TRUE, so a sketch regression fails the
  *    hash gate.
  *  - Everything is one scan + at most one shuffle; nothing collects to
  *    the driver.
  */
object PipelineQueries {

  // hash bucket moved to QueryHelpers (shared with the leakage-proof
  // split in DedupQueries); these aliases keep call sites short
  private def hashBucket(key: org.apache.spark.sql.Column) =
    QueryHelpers.hashBucket(key)

  private def hashBucketSql(k: String) = QueryHelpers.hashBucketSql(k)

  /** Shared NB-classifier CTE chain ending in
    * `lab(doc_id, lang, ws, n_words, pos)` and `sc(doc_id, score_u)` —
    * pipeline_classifier_score and pipeline_classifier_calibration
    * compose on it (the shared-builder discipline; algebra mirrors
    * operators.NbQuality exactly: Gopher-gate labels, 128-bucket md5
    * hash, add-1 integer-micros log-odds + prior, LEFT JOIN + defu).
    */
  private def nbCtes: String = {
    val stopList = graft.operators.TextAnalysis.stopwords
      .map(w => s"'$w'").mkString("[", ", ", "]")
    s"""t AS (SELECT doc_id, lang,
       |    list_filter(string_split(lower(text), ' '), w -> w <> '') AS ws
       |  FROM documents),
       |m AS (SELECT doc_id, lang, ws,
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
       |  FROM t),
       |lab AS MATERIALIZED (SELECT doc_id, lang, ws, n_words,
       |    ((n_words >= 50 AND n_words <= 100000)
       |      AND (3 * n_words <= sum_wl AND sum_wl <= 10 * n_words)
       |      AND n_stop >= 2 AND 5 * max_wf <= n_words
       |      AND 10 * n_tri_dup <= 3 * n_tri) AS pos
       |  FROM m),
       |occ AS (SELECT pos, CAST('0x' || substr(md5(w), 1, 8) AS BIGINT) % 128 AS bk
       |  FROM (SELECT pos, unnest(ws) AS w FROM lab)),
       |cnt AS (SELECT bk,
       |    CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS p_b,
       |    CAST(sum(CASE WHEN NOT pos THEN 1 ELSE 0 END) AS BIGINT) AS q_b
       |  FROM occ GROUP BY bk),
       |tot AS (SELECT CAST(sum(p_b) AS BIGINT) AS pp,
       |    CAST(sum(q_b) AS BIGINT) AS qq FROM cnt),
       |w AS MATERIALIZED (SELECT bk,
       |    CAST(floor(ln(((p_b + 1.0) * (qq + 128.0)) /
       |      ((q_b + 1.0) * (pp + 128.0))) * 1000000.0 + 0.5) AS BIGINT) AS wu
       |  FROM cnt CROSS JOIN tot),
       |defu AS (SELECT CAST(floor(ln((qq + 128.0) / (pp + 128.0))
       |    * 1000000.0 + 0.5) AS BIGINT) AS du FROM tot),
       |pri AS (SELECT CAST(floor(ln(
       |      (CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS DOUBLE) + 1.0) /
       |      (CAST(sum(CASE WHEN NOT pos THEN 1 ELSE 0 END) AS DOUBLE) + 1.0))
       |    * 1000000.0 + 0.5) AS BIGINT) AS prior_u FROM lab),
       |o2 AS (SELECT doc_id, CAST('0x' || substr(md5(w), 1, 8) AS BIGINT) % 128 AS bk
       |  FROM (SELECT doc_id, unnest(ws) AS w FROM lab)),
       |ds AS (SELECT o2.doc_id,
       |    CAST(sum(coalesce(w.wu, (SELECT du FROM defu))) AS BIGINT) AS tok_u
       |  FROM o2 LEFT JOIN w USING (bk) GROUP BY o2.doc_id),
       |sc AS (SELECT l.doc_id,
       |    CAST((SELECT prior_u FROM pri) + coalesce(ds.tok_u, 0) AS BIGINT)
       |      AS score_u
       |  FROM lab l LEFT JOIN ds ON l.doc_id = ds.doc_id)""".stripMargin
  }

  /** Shared CTE chain for the KMV pair-algebra oracles: per-event-type
    * k-min sketches, per-pair union sketch, and estimates (ra, rb, ru)
    * exposed as relation `e` for the caller-supplied final SELECT —
    * keeps q_kmv_overlap and q_kmv_diff byte-identical up to their
    * projections.
    */
  private def kmvPairSql(finalSelect: String): String = {
    import graft.operators.KmvSketch.{K, Scale}
    def est(n: String, k64: String) =
      s"CASE WHEN $n < $K THEN CAST($n AS DOUBLE) ELSE $Scale / CAST($k64 AS DOUBLE) END"
    s"""WITH d AS (
       |  SELECT DISTINCT event_type AS grp,
       |    CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
       |      AS BIGINT) AS h
       |  FROM events WHERE user_id IS NOT NULL
       |), r AS (
       |  SELECT grp, h,
       |    row_number() OVER (PARTITION BY grp ORDER BY h) AS rk FROM d
       |), sk AS MATERIALIZED (SELECT grp, h FROM r WHERE rk <= $K),
       |g AS MATERIALIZED (
       |  SELECT grp, count(*) AS n, max(h) AS k64 FROM sk GROUP BY grp
       |), pairs AS (
       |  SELECT a.grp AS ta, b.grp AS tb FROM g a JOIN g b ON a.grp < b.grp
       |), ud AS (
       |  SELECT DISTINCT p.ta, p.tb, s.h
       |  FROM pairs p JOIN sk s ON s.grp = p.ta OR s.grp = p.tb
       |), ur AS (
       |  SELECT ta, tb, h,
       |    row_number() OVER (PARTITION BY ta, tb ORDER BY h) AS rk FROM ud
       |), u AS (
       |  SELECT ta, tb, count(*) AS un, max(h) AS k64u
       |  FROM ur WHERE rk <= $K GROUP BY 1, 2
       |), e AS (
       |  SELECT u.ta, u.tb,
       |    ${est("ga.n", "ga.k64")} AS ra,
       |    ${est("gb.n", "gb.k64")} AS rb,
       |    ${est("u.un", "u.k64u")} AS ru
       |  FROM u JOIN g ga ON ga.grp = u.ta JOIN g gb ON gb.grp = u.tb
       |)
       |$finalSelect""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // DSIR importance selection (operators.Dsir scaladoc — Xie et al.
    // 2023): top-100 raw-pool docs by hashed-unigram log-likelihood
    // ratio against the 'en' target corpus; weights integer-micros
    // fixed-point, scores exact BIGINT sums, scoring pass narrow
    // against the broadcast 64-bucket weight map
    "pipeline_dsir_select" -> ((s, dir) =>
      graft.operators.Dsir.select(Tables.documents(s, dir),
        targetLang = "en", nBuckets = 64, topN = 100)
        .orderBy("rk")),

    // RHO-loss learnability selection (Mindermann et al. ICML'22 —
    // the two-model data-selection rule): score every doc by
    // loss(current model) − loss(reference holdout model) and keep the
    // top 64 — high loss under the trained pool but low loss under the
    // clean holdout ⇒ learnable and not yet learnt; low rho ⇒ noise
    // (unlearnable everywhere) or already learnt. Both models are the
    // engine's count-LM (TextAnalysis.lmRhoScore: disjoint hash-bucket
    // slices, top-1000-capped broadcast tables, ONE shared bigram
    // pass), losses are the OOV-rate proxy in integer micros (BIGINT
    // DIV — the text_ppl_buckets convention) so selection is exact.
    // Selection is TakeOrderedAndProject, never a global sort.
    "pipeline_rho_select" -> ((s, dir) => {
      val sc = graft.operators.TextAnalysis.lmRhoScore(
        Tables.documents(s, dir), refLt = 25, curGe = 50, curLt = 75, v = 1000)
      def lossU(hits: String): org.apache.spark.sql.Column =
        when(col("n_bigrams") === 0L, lit(1000000L))
          .otherwise(expr(s"((n_bigrams - $hits) * 1000000) DIV n_bigrams"))
      val scored = sc
        .withColumn("loss_ref_u", lossU("n_ref_hits").cast("long"))
        .withColumn("loss_cur_u", lossU("n_cur_hits").cast("long"))
        .withColumn("rho_u", col("loss_cur_u") - col("loss_ref_u"))
      scored.orderBy(col("rho_u").desc, col("doc_id")).limit(64)
        .withColumn("rk", row_number().over(
          Window.orderBy(col("rho_u").desc, col("doc_id"))).cast("int"))
        .select(col("rk"), col("doc_id"), col("n_bigrams"),
          col("loss_ref_u"), col("loss_cur_u"), col("rho_u"))
    }),

    // deterministic global shuffle + sharding — the write-side of every
    // training run: shard = content-hash mod 16, within-shard order =
    // (hash, doc_id), so the permutation is reproducible across runs,
    // engines, cluster sizes, and re-partitioning (NEVER rand() — the
    // split discipline above), and any shard can be regenerated alone.
    // Plan shape: one narrow hash projection, ONE exchange on shard +
    // in-partition sort — exactly the repartition(shard) +
    // sortWithinPartitions a distributed shard writer executes; at
    // 100 TB each shard streams to its writer with no global sort.
    "pipeline_shuffle_shard" -> ((s, dir) => {
      val h = conv(substring(md5(concat(lit("sh"),
        col("doc_id").cast("string"))), 1, 15), 16, 10).cast("long")
      Tables.documents(s, dir).select(col("doc_id"), h.as("h"))
        .withColumn("shard", pmod(col("h"), lit(16L)).cast("int"))
        .withColumn("pos", row_number().over(
          Window.partitionBy(col("shard")).orderBy(col("h"), col("doc_id")))
          .cast("int"))
        .select(col("doc_id"), col("shard"), col("pos"))
        .orderBy("doc_id")
    }),

    // temperature-flattened DOMAIN MIXTURE sampling (the multilingual /
    // multi-domain mixing rule of XLM-R, Conneau et al. 2020 §3.1, and
    // the Gopher data recipe: sample domain d with p_d ∝ n_d^α, α = ½,
    // so small domains are up-weighted). pipeline_mix_temperature
    // computes the float WEIGHT TABLE; this query EXECUTES the sampler
    // — materializes the doc-level sample those weights imply, with
    // the arithmetic moved to exact integers so the accepted SET (not
    // just the rates) is engine- and partitioning-independent.
    // Per-doc acceptance rate
    // r_d = T·p_d/n_d with T = half the corpus. EXACT end to end —
    // √n_d is integer-scaled to s_d = floor(√n_d·10³) (IEEE sqrt is
    // correctly rounded, identical on both engines), S = Σ s_d is a
    // BIGINT sum, and rate_u = (10⁶·T·s_d) DIV (S·n_d) runs in
    // internal DECIMAL(38,0) (the Modularity widening — the BIGINT
    // product overflows past ~7M docs) with Spark's IntegralDivide ==
    // DuckDB HUGEINT `//`, surfacing as plain BIGINT micros. Selection
    // is the md5 hash gate in the SAME micro space — never rand().
    // Plan: one map-side-combined |domains|-row aggregate, rates
    // broadcast back, narrow filter — at 100 TB one corpus scan + one
    // broadcast join, the corpus itself never shuffles.
    "pipeline_mixture_sample" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val byD = docs.groupBy(col("source")).agg(count(lit(1)).as("n_d"))
        .withColumn("s_d",
          floor(sqrt(col("n_d").cast("double")) * lit(1000.0)).cast("long"))
      val tot = byD.agg(sum(col("s_d")).as("ss"), sum(col("n_d")).as("nn"))
      val rates = byD.crossJoin(broadcast(tot))
        .select(col("source"), expr(
          """least(CAST(1000000 AS BIGINT),
            |  CAST(1000000 AS DECIMAL(38,0)) * CAST(nn DIV 2 AS DECIMAL(38,0))
            |    * CAST(s_d AS DECIMAL(38,0))
            |  DIV (CAST(ss AS DECIMAL(38,0)) * CAST(n_d AS DECIMAL(38,0))))"""
            .stripMargin).as("rate_u"))
      val h = pmod(conv(substring(md5(concat(lit("mx"),
        col("doc_id").cast("string"))), 1, 8), 16, 10).cast("long"),
        lit(1000000L))
      docs.select(col("doc_id"), col("source"), h.as("h_u"))
        .join(broadcast(rates), "source")
        .where(col("h_u") < col("rate_u"))
        .select(col("doc_id"), col("source"), col("rate_u"))
        .orderBy("doc_id")
    }),

    // learned QUALITY-CLASSIFIER filtering (GPT-3, Brown et al. 2020
    // Appendix A), Naive-Bayes log-odds form with the positive class
    // distilled from the Gopher rule gate — operators.NbQuality
    // scaladoc. Every doc scored (not a top-N): score_u = class prior
    // + Σ hashed-token log-odds, all integer micros; keep = score_u>0.
    // Same two-scan / broadcast-map shape as DSIR; the 128-bucket
    // model is corpus-size-free.
    "pipeline_classifier_score" -> ((s, dir) =>
      graft.operators.NbQuality.score(Tables.documents(s, dir),
        nBuckets = 128).orderBy("doc_id")),

    // classifier OBSERVABILITY (the sim_recall_report pattern, applied
    // to the quality model): decile the corpus by classifier score and
    // measure the teacher gate's pass rate per decile — the calibration
    // curve an operator reads before trusting a score threshold. The
    // global decile window is the declared eval-report shape (output is
    // 10 rows; production calibrates on a sampled corpus slice).
    "pipeline_classifier_calibration" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val scored = graft.operators.NbQuality.score(docs, nBuckets = 128)
        .select(col("doc_id"), col("score_u"))
      val lab = docs.select(col("doc_id"),
        graft.operators.TextAnalysis.gopherKeepExpr.as("pos"))
      scored.join(lab, "doc_id")
        .withColumn("decile", ntile(10).over(
          Window.orderBy(col("score_u").desc, col("doc_id"))).cast("int"))
        .groupBy(col("decile"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("pos"), 1L).otherwise(0L)).as("n_pass"))
        .withColumn("pass_rate6",
          rnd(col("n_pass").cast("double") / col("n_docs"), 6))
        .orderBy("decile")
    }),

    // ---- END-TO-END SELECTION pipeline: the round-15 operators
    // composed as one declarative plan — Gopher quality gate → semantic
    // dedup (docs whose embedding lost a SemDeDup pair drop; docs
    // without vectors pass through) → DSIR importance selection of the
    // top-20 raw-pool survivors. The published curation recipe
    // (quality → dedup → domain selection) as a single Catalyst tree:
    // the gate is narrow, the drop set anti-joins, DSIR's weight table
    // is the fixed 64-bucket aggregate over the SURVIVOR corpus.
    "pipeline_select_e2e" -> ((s, dir) => {
      import graft.operators.{Dsir, Similarity, TextAnalysis, TrainedIvfCentroids}
      val docs = Tables.documents(s, dir)
      // the collapse-proof single-expression gate (gopherKeepExpr
      // scaladoc): where(gopherRules(...)("keep")) inlines split()
      // into the nested max-wf lambda — 0.14 → 19 s at sf0.1, measured
      val keep = docs.where(TextAnalysis.gopherKeepExpr)
        .select(col("doc_id"))
      val emb = Similarity.emb(s, dir)
      val dropped = emb.select(col("vec_id"))
        .join(Similarity.semDedup(emb, TrainedIvfCentroids.cells, tau = 0.4)
          .select(col("vec_id")), Seq("vec_id"), "left_anti")
      // the survivor frame feeds THREE downstream scans (DSIR's count
      // pass, its scoring pass, and the selection) — uncheckpointed,
      // Catalyst re-executes the gate + pair-join subtree per
      // reference (measured: 15.7 s cold / 14.5 s warm isolated at
      // sf0.1 vs 3.3 / 1.1 s checkpointed — the dedup-family
      // pre-checkpoint pattern, same trade at 100 TB where survivors
      // materialize once per curation run by design)
      val survivors = docs.join(keep, "doc_id")
        .join(dropped.select(col("vec_id").as("doc_id")),
          Seq("doc_id"), "left_anti")
        .localCheckpoint(true)
      Dsir.select(survivors, targetLang = "en", nBuckets = 64, topN = 20)
        .orderBy("rk")
    }),

    // ---- END-TO-END training-data pipeline: exact-dedup keep set →
    // quality gate → language ID → hash split → per-(split, lang) corpus
    // stats. The composition a real data-curation run executes, as ONE
    // declarative plan: Catalyst fuses the per-row stages (dedup winnow,
    // quality ratios, langid scores, hash bucket are all narrow), so the
    // whole pipeline is one scan + one dedup-group shuffle + one final
    // aggregate — at 100 TB nothing materializes between stages.
    "pipeline_e2e" -> ((s, dir) => {
      import graft.operators.{Dedup, TextAnalysis}
      val docs = Tables.documents(s, dir)
      val keep = Dedup.exact(docs).select(col("keep_id").as("doc_id"))
      val kept = docs.join(keep, "doc_id")
      // n_ws_tokens >= 20 sits at the corpus ~12th percentile, so the
      // gate really filters (the usual "too short to train on" cut)
      val qual = TextAnalysis.quality(kept)
        .where(col("n_ws_tokens") >= 20 &&
          col("punct_ratio") <= 0.2 && col("digit_ratio") <= 0.3)
        .select(col("doc_id"), col("n_ws_tokens"), col("stop_ratio"))
      val lang = TextAnalysis.langId(kept).select(col("doc_id"), col("pred"))
      val meta = docs.select(col("doc_id"), col("lang"))
      qual.join(lang, "doc_id").join(meta, "doc_id")
        .withColumn("bucket", hashBucket(col("doc_id").cast("string")))
        .withColumn("split",
          when(col("bucket") < 80, "train")
            .when(col("bucket") < 90, "val")
            .otherwise("test"))
        .groupBy(col("split"), col("lang"), col("pred"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_ws_tokens").cast("long")).as("ws_tokens"),
          rnd(avg(col("stop_ratio")), 6).as("avg_stop_6"))
        .orderBy("split", "lang", "pred")
    }),

    // ---- 80/10/10 train/val/test split, content-hash routed. A narrow
    // per-row op: no shuffle, no driver state, stable under re-runs.
    "q_split" -> ((s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"),
          hashBucket(col("doc_id").cast("string")).as("bucket"))
        .withColumn("split",
          when(col("bucket") < 80, "train")
            .when(col("bucket") < 90, "val")
            .otherwise("test"))
        .orderBy("doc_id")),

    // ---- stratified 20% sample: per-language deterministic top-fraction
    // by hash order. One shuffle on the stratum key; at corpus scale each
    // stratum samples independently (no global sort).
    "q_stratified_sample" -> ((s, dir) => {
      val byLang = Window.partitionBy(col("lang"))
      val w = byLang.orderBy(col("h"), col("doc_id"))
      Tables.documents(s, dir)
        .select(col("doc_id"), col("lang"))
        .withColumn("h", md5(concat(lit("strat"), col("doc_id").cast("string"))))
        .withColumn("rn", row_number().over(w))
        .withColumn("cnt", count(lit(1)).over(byLang))
        .where(col("rn") <= ceil(col("cnt") * lit(0.2)))
        .select(col("doc_id"), col("lang"))
        .orderBy("doc_id")
    }),

    // ---- domain-mixing sampler: per-source target keep-rates applied
    // via a content-hash uniform — the training-mix reweighting pass
    // (downweight crawl, keep books) with zero rand() nondeterminism.
    // Narrow per-row filter + one aggregate; rates here cycle 0.25..1.0
    // by source index as a stand-in for a configured mix table.
    "q_domain_mix" -> ((s, dir) => {
      val u = conv(substring(md5(concat(lit("mix"), col("doc_id").cast("string"))),
        1, 8), 16, 10).cast("long").cast("double") / lit(4294967296.0)
      // unbounded substring (2-arg SQL form) so Spark and the DuckDB
      // oracle's substr(source, 4) agree for any srcN suffix length;
      // fixture sources are src0..src19 (numeric suffix) by convention
      val rate = (pmod(expr("substring(source, 4)").cast("long"), lit(4L))
        .cast("double") + lit(1.0)) * lit(0.25)
      Tables.documents(s, dir)
        .select(col("doc_id"), col("source"))
        .withColumn("rate", rate)
        .withColumn("kept", (u < col("rate")).cast("int"))
        .groupBy(col("source"), col("rate"))
        .agg(count(lit(1)).as("n_total"), sum(col("kept")).as("n_kept"))
        .orderBy("source")
    }),

    // ---- temperature-scaled source mixing (the multilingual-corpus
    // sampling rule): weight_i = cnt_i^α / Σ_j cnt_j^α with α = 0.5,
    // boost_i = weight_i / (cnt_i / total) — how much source i is up-
    // or down-sampled vs proportional. The denominator Σ √cnt is a
    // data-ordered float sum, so it is folded over the source-sorted
    // array seeded with the first element (the q_ewma idiom) — same
    // IEEE op order as the oracle's list_reduce, bit-exact before the
    // 6-dp display rounding. Scale: per-source counts are ONE
    // map-side-combined aggregate; the fold runs over |sources| rows
    // in a single 1-row reduction — nothing driver-side, nothing
    // proportional to corpus volume.
    "pipeline_mix_temperature" -> ((s, dir) => {
      val per = Tables.documents(s, dir)
        .select(col("source"),
          size(filter(split(lower(col("text")), "\\s+"), t => t =!= ""))
            .cast("long").as("nt"))
        .groupBy(col("source")).agg(sum(col("nt")).as("cnt"))
      per.agg(
          array_sort(collect_list(struct(col("source"), col("cnt")))).as("xs"),
          sum(col("cnt")).as("tot"))
        .withColumn("ss", expr("transform(xs, x -> sqrt(CAST(x.cnt AS DOUBLE)))"))
        .withColumn("den", expr(
          "aggregate(slice(ss, 2, greatest(size(ss) - 1, 0)), ss[0], (acc, v) -> acc + v)"))
        .select(col("tot"), col("den"), explode(col("xs")).as("x"))
        .select(col("x.source").as("source"), col("x.cnt").as("n_tokens"),
          rnd(sqrt(col("x.cnt").cast("double")) / col("den"), 6).as("weight"),
          rnd(sqrt(col("x.cnt").cast("double")) / col("den")
            * col("tot").cast("double") / col("x.cnt").cast("double"), 6).as("boost"))
        .orderBy("source")
    }),

    // ---- per-ROW weighted (importance) sampling: keep probability
    // proportional to capped document length, decided by a content-hash
    // uniform — the quality-weighted subsampling pass. Both the uniform
    // (32-bit hash / 2^32) and the weight (min(n_chars,2000)/2000) are
    // exact rationals, so the keep decision is bit-identical
    // cross-engine with zero rand().
    "q_weighted_sample" -> ((s, dir) => {
      val u = conv(substring(md5(concat(lit("ws"), col("doc_id").cast("string"))),
        1, 8), 16, 10).cast("long").cast("double") / lit(4294967296.0)
      val w = least(col("n_chars").cast("double"), lit(2000.0)) / lit(2000.0)
      Tables.documents(s, dir)
        .select(col("doc_id"), col("source"), col("n_chars"))
        .withColumn("w", w)
        .withColumn("kept", (u < col("w")).cast("int"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_total"), sum(col("kept")).as("n_kept"),
          rnd(avg(col("w")), 6).as("avg_w"))
        .orderBy("source")
    }),

    // weighted sampling WITHOUT replacement (Efraimidis–Spirakis 2006
    // A-Res): key = u^(1/w) with the deterministic md5 uniform and the
    // same capped-length weight as q_weighted_sample; the top-k keys
    // ARE a weight-proportional WOR sample. One narrow key projection
    // + TakeOrderedAndProject — no rand(), no global sort, reproducible
    // across engines/cluster sizes. Keys ranked 6-dp-rounded with
    // doc_id tie-break (the cos5 ranking contract).
    "q_sample_wor" -> ((s, dir) => {
      val u = conv(substring(md5(concat(lit("ws"), col("doc_id").cast("string"))),
        1, 8), 16, 10).cast("long").cast("double") / lit(4294967296.0)
      val w = least(col("n_chars").cast("double"), lit(2000.0)) / lit(2000.0)
      val keyed = Tables.documents(s, dir)
        .select(col("doc_id"), col("source"), col("n_chars"))
        .withColumn("key6", rnd(pow(u, lit(1.0) / w), 6))
      val top = keyed.orderBy(col("key6").desc, col("doc_id")).limit(50)
      top.withColumn("rk", row_number().over(
          Window.orderBy(col("key6").desc, col("doc_id"))).cast("int"))
        .select(col("rk"), col("doc_id"), col("source"), col("key6"))
    }),

    // stratified A-Res: the SAME weighted-WOR keys, top-5 PER LANGUAGE
    // through the custom bounded-heap TopKPerGroup operator (no window
    // sort, no per-group materialization — heap state is langs × 5 rows
    // at any corpus size; the third consumer of the custom plan after
    // q_topk_custom/q_trending)
    "q_sample_wor_grouped" -> ((s, dir) => {
      val u = conv(substring(md5(concat(lit("ws"), col("doc_id").cast("string"))),
        1, 8), 16, 10).cast("long").cast("double") / lit(4294967296.0)
      val w = least(col("n_chars").cast("double"), lit(2000.0)) / lit(2000.0)
      val keyed = Tables.documents(s, dir)
        .select(col("doc_id"), col("lang"), col("n_chars"))
        .withColumn("key6", rnd(pow(u, lit(1.0) / w), 6))
        .withColumn("_ord",
          struct((-col("key6")).as("a"), col("doc_id").as("b")))
      graft.plans.TopKPerGroup(keyed, Seq("lang"), "_ord",
          descending = false, k = 5)
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("lang"))
            .orderBy(col("key6").desc, col("doc_id"))).cast("int"))
        .select(col("lang"), col("rk"), col("doc_id"), col("key6"))
        .orderBy("lang", "rk")
    }),

    // ---- training-sequence PACKING: assign docs to fixed-token-budget
    // sequences by running token count, packed independently per source
    // (the per-source partition is what scales — each source's cumsum is
    // its own window partition, no global sort). seq_id = floor(tokens
    // before this doc / budget); exact integer arithmetic end-to-end.
    "pipeline_pack" -> ((s, dir) => {
      val budget = 256L
      val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      Tables.documents(s, dir)
        .select(col("doc_id"), col("source"),
          size(filter(split(lower(col("text")), "\\s+"), t => t =!= ""))
            .cast("long").as("nt"))
        .withColumn("cum_before", coalesce(sum(col("nt")).over(w), lit(0L)))
        .withColumn("seq_id", expr(s"cum_before DIV $budget"))
        .groupBy(col("source"), col("seq_id"))
        .agg(count(lit(1)).as("n_docs"), sum(col("nt")).as("sum_tokens"))
        .orderBy("source", "seq_id")
    }),

    // ---- fixed-width histogram of order totals (10 × 60k buckets,
    // clamped): the token-count / length-distribution shape every corpus
    // audit runs. Bucketing is identical-IEEE floor division.
    "q_histogram" -> ((s, dir) =>
      Tables.orders(s, dir)
        .select(least(greatest(floor(col("o_totalprice") / lit(60000.0)), lit(0.0)),
          lit(9.0)).cast("int").as("bucket"),
          col("o_totalprice"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"),
          min(col("o_totalprice")).as("lo"),
          max(col("o_totalprice")).as("hi"))
        .orderBy("bucket")),

    // ---- class balance over the labeled embeddings (label skew check
    // before training; pct via a single post-agg window over K rows)
    "q_class_balance" -> ((s, dir) => {
      val all = Window.partitionBy()
      Tables.embeddings(s, dir)
        .groupBy(col("label"))
        .agg(count(lit(1)).as("n"))
        .withColumn("pct", rnd(col("n").cast("double") /
          sum(col("n")).over(all).cast("double"), 6))
        .orderBy("label")
    }),

    // ---- feature scaling: min-max + z-score per group, the standard
    // normalization pass. Group stats via full-frame window (one shuffle,
    // stats computed once per group, never collected).
    "q_feature_scale" -> ((s, dir) => {
      val g = Window.partitionBy(col("l_returnflag"))
      Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
          col("l_extendedprice"))
        .withColumn("minmax", rnd(
          (col("l_extendedprice") - min(col("l_extendedprice")).over(g)) /
            (max(col("l_extendedprice")).over(g) - min(col("l_extendedprice")).over(g)), 6))
        .withColumn("zscore", rnd(
          (col("l_extendedprice") - avg(col("l_extendedprice")).over(g)) /
            stddev_samp(col("l_extendedprice")).over(g), 4))
        .orderBy("l_orderkey", "l_linenumber", "l_extendedprice")
    }),

    // ---- HLL sketch pin: approx_count_distinct must land within 3× its
    // configured rsd of the exact distinct count (the oracle expects
    // TRUE — a sketch regression fails the hash gate)
    "q_approx_distinct" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_partkey")).as("n_exact"),
          approx_count_distinct(col("l_partkey"), 0.05).as("n_approx"))
        .select(col("l_returnflag"), col("n_exact"),
          (abs(col("n_approx") - col("n_exact")).cast("double") <=
            lit(0.15) * col("n_exact").cast("double")).as("approx_ok"))
        .orderBy("l_returnflag")),

    // ---- deterministic HLL register table (DistinctSketch scaladoc):
    // unlike q_approx_distinct's opaque datasketches binary, this
    // sketch's registers are integer string ops identical in both
    // engines, so the ENTIRE sketch hash-gates exactly — the mergeable
    // distinct-count structure you keep per segment at 100 TB
    // (AnalyticSpec pins merge-by-max and the estimate's accuracy).
    "q_distinct_sketch" -> ((s, dir) =>
      graft.operators.DistinctSketch
        .registers(Tables.events(s, dir), "user_id")
        .orderBy("reg")),

    // ---- quantiles BY DETERMINISTIC SAMPLE: per group, the 256 rows
    // with the smallest md5 row-hashes are a uniform
    // without-replacement sample that is a pure order statistic — both
    // engines draw the IDENTICAL sample, so its quantiles (plain
    // element-at order statistics, no interpolation) hash-gate exactly,
    // and a pinned boolean bounds them against the exact percentile.
    // This is the quantile strategy that survives 100 TB: the
    // bounded-heap top-k replaces any global sort, and sample size is
    // fixed per group whatever the group's row count.
    "q_quantile_bysample" -> ((s, dir) => {
      import graft.operators.DistinctSketch
      val n = 256
      // (l_orderkey, l_linenumber) is NOT unique in the fixtures — a
      // boundary tie between rows with equal hashes would make the
      // kept row partitioning-dependent (caught by PipelineSpec's
      // repartition pin). Integer CENTS join the hash key: residual
      // ties then only occur between rows whose sampled value is
      // identical, so the drawn VALUE list is partition-free.
      val li = Tables.lineitem(s, dir)
        .select(col("l_returnflag").as("flag"), col("l_extendedprice").as("v"),
          DistinctSketch.hash60(concat_ws("|",
            col("l_orderkey"), col("l_linenumber"),
            floor(col("l_extendedprice") * 100 + lit(0.5)).cast("long")))
            .as("h"))
      val sample = graft.plans
        .TopKPerGroup(li, Seq("flag"), "h", descending = false, k = n)
        .groupBy(col("flag"))
        .agg(sort_array(collect_list(col("v"))).as("vs"))
        .select(col("flag"),
          element_at(col("vs"), n / 2).as("p50_s"),
          element_at(col("vs"), n * 9 / 10).as("p90_s"))
      val exact = Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag").as("flag"))
        .agg(count(lit(1)).as("n_rows"),
          expr("percentile(l_extendedprice, 0.5)").as("p50_e"),
          expr("percentile(l_extendedprice, 0.9)").as("p90_e"))
      sample.join(exact, "flag")
        .select(col("flag"), col("n_rows"),
          col("p50_s").as("p50_sample"), col("p90_s").as("p90_sample"),
          (abs(col("p50_s") - col("p50_e")) <= lit(0.10) * col("p50_e") &&
            abs(col("p90_s") - col("p90_e")) <= lit(0.10) * col("p90_e"))
            .as("within_10pct"))
        .orderBy("flag")
    }),

    // ---- KMV set algebra (KmvSketch scaladoc): per-event-type user
    // sketches via the bounded-heap TopKPerGroup exec, then pairwise
    // union/intersection estimates from the k-min arrays alone — the
    // composable distinct sketch (segment-overlap analysis with no
    // re-scan). Deterministic order statistics ⇒ exact hash gate.
    "q_kmv_overlap" -> ((s, dir) => {
      import graft.operators.KmvSketch
      val sk = KmvSketch.sketches(Tables.events(s, dir), "event_type", "user_id")
      val a = sk.select(col("grp").as("type_a"), col("ks").as("ksa"))
      val b = sk.select(col("grp").as("type_b"), col("ks").as("ksb"))
      val ea = KmvSketch.estimate(col("ksa"))
      val eb = KmvSketch.estimate(col("ksb"))
      val eu = KmvSketch.estimate(KmvSketch.unionKs(col("ksa"), col("ksb")))
      a.join(b, col("type_a") < col("type_b"))
        .select(col("type_a"), col("type_b"),
          ea.as("ra"), eb.as("rb"), eu.as("ru"))
        .select(col("type_a"), col("type_b"),
          rnd(col("ra"), 2).as("est_a"), rnd(col("rb"), 2).as("est_b"),
          rnd(col("ru"), 2).as("est_union"),
          rnd(greatest(lit(0.0), col("ra") + col("rb") - col("ru")), 2)
            .as("est_inter"))
        .orderBy("type_a", "type_b")
    }),

    // KMV set-DIFFERENCE algebra (a\b, b\a, symmetric difference) off
    // the same per-type sketches — inclusion-exclusion against the
    // union estimate, clamped at 0 like est_inter; completes the
    // composable sketch family's set algebra (union/inter in
    // q_kmv_overlap)
    "q_kmv_diff" -> ((s, dir) => {
      import graft.operators.KmvSketch
      val sk = KmvSketch.sketches(Tables.events(s, dir), "event_type", "user_id")
      val a = sk.select(col("grp").as("type_a"), col("ks").as("ksa"))
      val b = sk.select(col("grp").as("type_b"), col("ks").as("ksb"))
      val ea = KmvSketch.estimate(col("ksa"))
      val eb = KmvSketch.estimate(col("ksb"))
      val eu = KmvSketch.estimate(KmvSketch.unionKs(col("ksa"), col("ksb")))
      val ri = greatest(lit(0.0), col("ra") + col("rb") - col("ru"))
      val anotb = greatest(lit(0.0), col("ra") - ri)
      val bnota = greatest(lit(0.0), col("rb") - ri)
      a.join(b, col("type_a") < col("type_b"))
        .select(col("type_a"), col("type_b"),
          ea.as("ra"), eb.as("rb"), eu.as("ru"))
        .select(col("type_a"), col("type_b"),
          rnd(anotb, 2).as("est_anotb"),
          rnd(bnota, 2).as("est_bnota"),
          rnd(anotb + bnota, 2).as("est_symmdiff"))
        .orderBy("type_a", "type_b")
    }),

    // ---- approx-quantile sketch pin: within 1% relative of the exact
    // interpolated median
    "q_approx_quantile" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"))
        .agg(rnd(expr("percentile(l_extendedprice, 0.5)"), 4).as("p50_exact"),
          expr("approx_percentile(l_extendedprice, 0.5, 10000)").as("ap"))
        .select(col("l_returnflag"), col("p50_exact"),
          (abs(col("ap") - col("p50_exact")) / col("p50_exact") <= lit(0.01))
            .as("approx_ok"))
        .orderBy("l_returnflag")))

  /** Oracle twin of pipeline_e2e: the dedup/quality/langid/split
    * fragments are the SAME SQL text as their standalone oracles
    * (dedup_exact, text_quality, text_langid, q_split), chained as CTEs.
    */
  private def pipelineE2eSql: String = {
    import graft.operators.TextAnalysis
    val scores = TextAnalysis.markers.map { case (l, ms) =>
      s"${ms.map(TextAnalysis.occSql("t", _)).mkString("(", " + ", ")")} AS s_$l"
    }.mkString(",\n        ")
    val langs = TextAnalysis.markers.map(_._1)
    val pred = langs.init.zipWithIndex.foldRight(s"'${langs.last}'") {
      case ((l, i), rest) =>
        val others = langs.drop(i + 1).map(o => s"s_$o")
        val best = if (others.size == 1) others.head
          else s"greatest(${others.mkString(", ")})"
        s"CASE WHEN s_$l >= $best THEN '$l' ELSE $rest END"
    }
    val stopOcc = TextAnalysis.stopwords
      .map(w => TextAnalysis.occSql("concat(' ', lower(text), ' ')", s" $w "))
      .mkString("(", " + ", ")")
    s"""WITH keep AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(lower(text))),
       |k AS (SELECT d.doc_id, d.lang, d.text FROM documents d JOIN keep USING (doc_id)),
       |q AS (SELECT doc_id, lang,
       |        CAST(length(text) - length(regexp_replace(text, ' ', '', 'g')) + 1 AS INT) AS n_ws_tokens,
       |        CAST(length(regexp_replace(text, '[^.,!?;:]', '', 'g')) AS DOUBLE) / length(text) AS punct_ratio,
       |        CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE) / length(text) AS digit_ratio,
       |        $stopOcc / CAST(length(text) - length(regexp_replace(text, ' ', '', 'g')) + 1 AS DOUBLE) AS stop_ratio
       |      FROM k),
       |qf AS (SELECT doc_id, lang, n_ws_tokens, stop_ratio FROM q
       |       WHERE n_ws_tokens >= 20 AND punct_ratio <= CAST(0.2 AS DOUBLE)
       |         AND digit_ratio <= CAST(0.3 AS DOUBLE)),
       |sc AS (SELECT doc_id, concat(' ', lower(text), ' ') AS t FROM k),
       |sc2 AS (SELECT doc_id,
       |        $scores
       |      FROM sc),
       |l AS (SELECT doc_id, $pred AS pred FROM sc2),
       |j AS (SELECT qf.doc_id, qf.lang, qf.n_ws_tokens, qf.stop_ratio, l.pred,
       |        ${hashBucketSql("CAST(qf.doc_id AS VARCHAR)")} AS bucket
       |      FROM qf JOIN l ON l.doc_id = qf.doc_id)
       |SELECT CASE WHEN bucket < 80 THEN 'train' WHEN bucket < 90 THEN 'val'
       |            ELSE 'test' END AS split,
       |  lang, pred, count(*) AS n_docs, CAST(sum(n_ws_tokens) AS BIGINT) AS ws_tokens,
       |  ${rndSql("avg(stop_ratio)", 6)} AS avg_stop_6
       |FROM j GROUP BY 1, 2, 3 ORDER BY split, lang, pred""".stripMargin
  }

  val oracleSql: Map[String, String] = Map(
    "pipeline_e2e" -> pipelineE2eSql,

    // the composed selection pipeline: the semantic-drop chain
    // (SimilarityQueries.semDropCtes), the five Gopher rules, then the
    // DSIR chain over the survivor corpus — each stage's algebra
    // verbatim from its standalone oracle
    "pipeline_select_e2e" -> {
      val stopList = graft.operators.TextAnalysis.stopwords
        .map(w => s"'$w'").mkString("[", ", ", "]")
      s"""WITH ${SimilarityQueries.semDropCtes},
         |gt AS (SELECT doc_id,
         |    list_filter(string_split(lower(text), ' '), w -> w <> '') AS ws
         |  FROM documents),
         |gm AS (SELECT doc_id,
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
         |  FROM gt),
         |gk AS (SELECT doc_id FROM gm
         |  WHERE n_words >= 50 AND n_words <= 100000
         |    AND 3 * n_words <= sum_wl AND sum_wl <= 10 * n_words
         |    AND n_stop >= 2 AND 5 * max_wf <= n_words
         |    AND 10 * n_tri_dup <= 3 * n_tri),
         |surv AS MATERIALIZED (SELECT d.doc_id, d.lang, d.text
         |  FROM documents d JOIN gk ON gk.doc_id = d.doc_id
         |  WHERE d.doc_id NOT IN (SELECT vid FROM semdrop)),
         |t AS (SELECT doc_id, lang,
         |    list_filter(string_split(lower(text), ' '), w -> w <> '') AS ws
         |  FROM surv),
         |occ AS (SELECT lang, unnest(ws) AS w FROM t),
         |b AS (SELECT (lang = 'en') AS is_t,
         |    CAST('0x' || substr(md5(w), 1, 8) AS BIGINT) % 64 AS bk FROM occ),
         |cnt AS (SELECT bk,
         |    CAST(sum(CASE WHEN is_t THEN 1 ELSE 0 END) AS BIGINT) AS t_b,
         |    CAST(sum(CASE WHEN NOT is_t THEN 1 ELSE 0 END) AS BIGINT) AS r_b
         |  FROM b GROUP BY bk),
         |tot AS (SELECT CAST(sum(t_b) AS BIGINT) AS tt,
         |    CAST(sum(r_b) AS BIGINT) AS rr FROM cnt),
         |w AS MATERIALIZED (SELECT bk,
         |    CAST(floor(ln(((t_b + 1.0) * (rr + 64.0)) /
         |      ((r_b + 1.0) * (tt + 64.0))) * 1000000.0 + 0.5) AS BIGINT) AS wu
         |  FROM cnt CROSS JOIN tot),
         |defu AS (SELECT CAST(floor(ln((rr + 64.0) / (tt + 64.0))
         |    * 1000000.0 + 0.5) AS BIGINT) AS du FROM tot),
         |raw AS (SELECT doc_id, lang, CAST(len(ws) AS INT) AS n_words, ws
         |  FROM t WHERE lang <> 'en'),
         |o2 AS (SELECT doc_id,
         |    CAST('0x' || substr(md5(w), 1, 8) AS BIGINT) % 64 AS bk
         |  FROM (SELECT doc_id, unnest(ws) AS w FROM raw)),
         |ds AS (SELECT o2.doc_id,
         |    CAST(sum(coalesce(w.wu, (SELECT du FROM defu))) AS BIGINT)
         |      AS score_u
         |  FROM o2 LEFT JOIN w USING (bk) GROUP BY o2.doc_id),
         |sel AS (SELECT raw.doc_id, raw.lang, raw.n_words,
         |    coalesce(ds.score_u, 0) AS score_u
         |  FROM raw LEFT JOIN ds ON raw.doc_id = ds.doc_id),
         |r AS (SELECT *, CAST(row_number() OVER
         |    (ORDER BY score_u DESC, doc_id) AS INT) AS rk FROM sel)
         |SELECT rk, doc_id, lang, n_words, score_u FROM r
         |WHERE rk <= 20 ORDER BY rk""".stripMargin
    },

    // Dsir.select's twin: same md5 feature hash, same add-1 integer-
    // micros weights (floor(ln·1e6 + ½)), same BIGINT score sum; the
    // oracle scores via explode+join+groupBy where Spark folds per-row
    // against the broadcast map — identical math, integer-exact. The
    // LEFT JOIN + defu coalesce mirrors Dsir.select's unseen-bucket
    // default ln((R+B)/(T+B)) exactly (unreachable in-corpus, but the
    // two definitions must not be able to drift apart)
    "pipeline_dsir_select" ->
      """WITH t AS (SELECT doc_id, lang,
        |    list_filter(string_split(lower(text), ' '), w -> w <> '') AS ws
        |  FROM documents),
        |occ AS (SELECT lang, unnest(ws) AS w FROM t),
        |b AS (SELECT (lang = 'en') AS is_t,
        |    CAST('0x' || substr(md5(w), 1, 8) AS BIGINT) % 64 AS bk FROM occ),
        |cnt AS (SELECT bk,
        |    CAST(sum(CASE WHEN is_t THEN 1 ELSE 0 END) AS BIGINT) AS t_b,
        |    CAST(sum(CASE WHEN NOT is_t THEN 1 ELSE 0 END) AS BIGINT) AS r_b
        |  FROM b GROUP BY bk),
        |tot AS (SELECT CAST(sum(t_b) AS BIGINT) AS tt,
        |    CAST(sum(r_b) AS BIGINT) AS rr FROM cnt),
        |w AS MATERIALIZED (SELECT bk,
        |    CAST(floor(ln(((t_b + 1.0) * (rr + 64.0)) /
        |      ((r_b + 1.0) * (tt + 64.0))) * 1000000.0 + 0.5) AS BIGINT) AS wu
        |  FROM cnt CROSS JOIN tot),
        |defu AS (SELECT CAST(floor(ln((rr + 64.0) / (tt + 64.0))
        |    * 1000000.0 + 0.5) AS BIGINT) AS du FROM tot),
        |raw AS (SELECT doc_id, lang, CAST(len(ws) AS INT) AS n_words, ws
        |  FROM t WHERE lang <> 'en'),
        |o2 AS (SELECT doc_id,
        |    CAST('0x' || substr(md5(w), 1, 8) AS BIGINT) % 64 AS bk
        |  FROM (SELECT doc_id, unnest(ws) AS w FROM raw)),
        |ds AS (SELECT o2.doc_id,
        |    CAST(sum(coalesce(w.wu, (SELECT du FROM defu))) AS BIGINT)
        |      AS score_u
        |  FROM o2 LEFT JOIN w USING (bk) GROUP BY o2.doc_id),
        |sel AS (SELECT raw.doc_id, raw.lang, raw.n_words,
        |    coalesce(ds.score_u, 0) AS score_u
        |  FROM raw LEFT JOIN ds ON raw.doc_id = ds.doc_id),
        |r AS (SELECT *, CAST(row_number() OVER
        |    (ORDER BY score_u DESC, doc_id) AS INT) AS rk FROM sel)
        |SELECT rk, doc_id, lang, n_words, score_u FROM r
        |WHERE rk <= 100 ORDER BY rk""".stripMargin,

    // rho twin: the text_lm_score tokenizer/bigram chain with TWO
    // disjoint-slice models (holdout < 25, current pool [50, 75)),
    // integer-micro losses via `//` == Spark DIV, top 64 by
    // (rho DESC, doc_id)
    "pipeline_rho_select" ->
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
         |    WHERE ${QueryHelpers.hashBucketSql("CAST(doc_id AS VARCHAR)")} < 25
         |  ) GROUP BY bigram
         |  ORDER BY ref_cnt DESC, bigram LIMIT 1000
         |), curc AS (
         |  SELECT bigram, count(*) AS cur_cnt FROM (
         |    SELECT unnest(bg) AS bigram FROM bgs
         |    WHERE ${QueryHelpers.hashBucketSql("CAST(doc_id AS VARCHAR)")} >= 50
         |      AND ${QueryHelpers.hashBucketSql("CAST(doc_id AS VARCHAR)")} < 75
         |  ) GROUP BY bigram
         |  ORDER BY cur_cnt DESC, bigram LIMIT 1000
         |), ex AS (
         |  SELECT doc_id, unnest(bg) AS bigram FROM bgs
         |), j AS (
         |  SELECT e.doc_id, count(*) AS nb,
         |    count(r.ref_cnt) AS nrh, count(c.cur_cnt) AS nch
         |  FROM ex e LEFT JOIN refc r USING (bigram)
         |            LEFT JOIN curc c USING (bigram)
         |  GROUP BY e.doc_id
         |), sc AS (
         |  SELECT t.doc_id,
         |    CAST(coalesce(j.nb, 0) AS BIGINT) AS n_bigrams,
         |    CAST(CASE WHEN coalesce(j.nb, 0) = 0 THEN 1000000
         |      ELSE ((j.nb - j.nrh) * 1000000) // j.nb END AS BIGINT) AS loss_ref_u,
         |    CAST(CASE WHEN coalesce(j.nb, 0) = 0 THEN 1000000
         |      ELSE ((j.nb - j.nch) * 1000000) // j.nb END AS BIGINT) AS loss_cur_u
         |  FROM toks t LEFT JOIN j ON t.doc_id = j.doc_id
         |), rr AS (
         |  SELECT *, loss_cur_u - loss_ref_u AS rho_u,
         |    CAST(row_number() OVER (
         |      ORDER BY loss_cur_u - loss_ref_u DESC, doc_id) AS INT) AS rk
         |  FROM sc
         |)
         |SELECT rk, doc_id, n_bigrams, loss_ref_u, loss_cur_u, rho_u
         |FROM rr WHERE rk <= 64 ORDER BY rk""".stripMargin,

    // A-Res twin: same md5 uniform and capped weight as
    // q_weighted_sample, same power-key, same (key6 DESC, doc_id) rank
    "q_sample_wor" ->
      s"""WITH d AS (SELECT doc_id, source,
         |    CAST('0x' || substr(md5('ws' || CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT)
         |      / CAST(4294967296.0 AS DOUBLE) AS u,
         |    least(CAST(n_chars AS DOUBLE), 2000.0) / 2000.0 AS w
         |  FROM documents),
         |k AS (SELECT doc_id, source, ${rndSql("power(u, 1.0 / w)", 6)} AS key6 FROM d),
         |r AS (SELECT doc_id, source, key6,
         |    CAST(row_number() OVER (ORDER BY key6 DESC, doc_id) AS INT) AS rk FROM k)
         |SELECT rk, doc_id, source, key6 FROM r WHERE rk <= 50 ORDER BY rk""".stripMargin,

    // grouped A-Res twin: same keys, per-lang rank
    "q_sample_wor_grouped" ->
      s"""WITH d AS (SELECT doc_id, lang,
         |    CAST('0x' || substr(md5('ws' || CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT)
         |      / CAST(4294967296.0 AS DOUBLE) AS u,
         |    least(CAST(n_chars AS DOUBLE), 2000.0) / 2000.0 AS w
         |  FROM documents),
         |k AS (SELECT doc_id, lang, ${rndSql("power(u, 1.0 / w)", 6)} AS key6 FROM d),
         |r AS (SELECT lang, doc_id, key6,
         |    CAST(row_number() OVER (PARTITION BY lang ORDER BY key6 DESC, doc_id)
         |      AS INT) AS rk FROM k)
         |SELECT lang, rk, doc_id, key6 FROM r WHERE rk <= 5 ORDER BY lang, rk""".stripMargin,

    // shuffle-shard's twin: same 15-hex md5 key (the KMV precedent —
    // fits BIGINT), same shard mod, same (h, doc_id) within-shard order
    "pipeline_shuffle_shard" ->
      """WITH d AS (SELECT doc_id,
        |    CAST('0x' || substr(md5('sh' || CAST(doc_id AS VARCHAR)), 1, 15)
        |      AS BIGINT) AS h
        |  FROM documents)
        |SELECT doc_id, CAST(h % 16 AS INT) AS shard,
        |  CAST(row_number() OVER (PARTITION BY h % 16 ORDER BY h, doc_id)
        |    AS INT) AS pos
        |FROM d ORDER BY doc_id""".stripMargin,

    // mixture twin: same floor(√n_d·10³) integer sqrt scale, same
    // exact widened rate arithmetic (HUGEINT `//` == Spark decimal
    // IntegralDivide — validated equal on the overflow-range case),
    // same 'mx' md5 micro gate
    "pipeline_mixture_sample" ->
      """WITH d AS (SELECT source, count(*) AS n_d FROM documents GROUP BY source),
        |s AS (SELECT source, CAST(n_d AS BIGINT) AS n_d,
        |    CAST(floor(sqrt(CAST(n_d AS DOUBLE)) * 1000.0) AS BIGINT) AS s_d
        |  FROM d),
        |t AS (SELECT CAST(sum(s_d) AS BIGINT) AS ss,
        |    CAST(sum(n_d) AS BIGINT) AS nn FROM s),
        |r AS (SELECT source, CAST(least(1000000::HUGEINT,
        |    (1000000::HUGEINT * (nn // 2) * s_d) // (ss::HUGEINT * n_d))
        |    AS BIGINT) AS rate_u
        |  FROM s CROSS JOIN t)
        |SELECT doc_id, source, rate_u
        |FROM documents JOIN r USING (source)
        |WHERE CAST('0x' || substr(md5('mx' || CAST(doc_id AS VARCHAR)), 1, 8)
        |    AS BIGINT) % 1000000 < rate_u
        |ORDER BY doc_id""".stripMargin,

    // NbQuality twin: the Gopher gate labels (verbatim
    // text_gopher_rules algebra), same 128-bucket md5 feature hash,
    // same add-1 integer-micros log-odds + prior, LEFT JOIN + defu
    // coalesce mirroring the Scala unseen-bucket default (the DSIR
    // no-drift discipline — unreachable in-corpus)
    "pipeline_classifier_score" ->
      s"""WITH $nbCtes
         |SELECT l.doc_id, l.lang, l.n_words, sc.score_u,
         |  (sc.score_u > 0) AS keep
         |FROM lab l JOIN sc ON l.doc_id = sc.doc_id
         |ORDER BY l.doc_id""".stripMargin,

    // calibration twin: the shared NB chain, per-decile pass rate of
    // the teacher gate
    "pipeline_classifier_calibration" ->
      s"""WITH $nbCtes,
         |dec AS (SELECT l.doc_id, l.pos, sc.score_u,
         |    ntile(10) OVER (ORDER BY sc.score_u DESC, l.doc_id) AS decile
         |  FROM lab l JOIN sc ON l.doc_id = sc.doc_id)
         |SELECT CAST(decile AS INT) AS decile,
         |  count(*) AS n_docs,
         |  CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
         |  ${rndSql("CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS DOUBLE) / count(*)", 6)}
         |    AS pass_rate6
         |FROM dec GROUP BY decile ORDER BY decile""".stripMargin,

    "q_weighted_sample" ->
      s"""WITH d AS (SELECT doc_id, source, n_chars,
         |    CAST('0x' || substr(md5('ws' || CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT)
         |      / CAST(4294967296.0 AS DOUBLE) AS u,
         |    least(CAST(n_chars AS DOUBLE), 2000.0) / 2000.0 AS w
         |  FROM documents)
         |SELECT source, count(*) AS n_total,
         |  CAST(sum(CASE WHEN u < w THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         |  ${rndSql("avg(w)", 6)} AS avg_w
         |FROM d GROUP BY source ORDER BY source""".stripMargin,

    "pipeline_pack" ->
      """WITH t AS (SELECT doc_id, source,
        |    CAST(len(list_filter(string_split_regex(lower(text), '\s+'),
        |      x -> x <> '')) AS BIGINT) AS nt
        |  FROM documents),
        |c AS (SELECT doc_id, source, nt,
        |    CAST(COALESCE(sum(nt) OVER (PARTITION BY source ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before
        |  FROM t)
        |SELECT source, CAST(cum_before // 256 AS BIGINT) AS seq_id, count(*) AS n_docs,
        |  CAST(sum(nt) AS BIGINT) AS sum_tokens
        |FROM c GROUP BY 1, 2 ORDER BY source, seq_id""".stripMargin,

    "q_domain_mix" ->
      """WITH d AS (SELECT doc_id, source,
        |    CAST('0x' || substr(md5('mix' || CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT)
        |      / CAST(4294967296.0 AS DOUBLE) AS u,
        |    (CAST(substr(source, 4) AS BIGINT) % 4 + 1) * CAST(0.25 AS DOUBLE) AS rate
        |  FROM documents)
        |SELECT source, rate, count(*) AS n_total,
        |  CAST(sum(CASE WHEN u < rate THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
        |FROM d GROUP BY source, rate ORDER BY source""".stripMargin,
    // list(ORDER BY source) + list_reduce ≡ the Spark sorted-array
    // fold seeded with the first element — identical IEEE op order
    "pipeline_mix_temperature" ->
      s"""WITH per AS (
         |  SELECT source, CAST(sum(len(list_filter(
         |    string_split_regex(lower(text), '\\s+'), t -> t <> ''))) AS BIGINT) AS cnt
         |  FROM documents GROUP BY source
         |), d AS (
         |  SELECT list_reduce(list(sqrt(CAST(cnt AS DOUBLE)) ORDER BY source),
         |    (acc, v) -> acc + v) AS den,
         |    CAST(sum(cnt) AS BIGINT) AS tot
         |  FROM per
         |)
         |SELECT p.source, p.cnt AS n_tokens,
         |  ${rndSql("sqrt(CAST(p.cnt AS DOUBLE)) / d.den", 6)} AS weight,
         |  ${rndSql("sqrt(CAST(p.cnt AS DOUBLE)) / d.den * d.tot / p.cnt", 6)} AS boost
         |FROM per p, d ORDER BY p.source""".stripMargin,

    "q_split" ->
      s"""SELECT doc_id,
         |  ${hashBucketSql("CAST(doc_id AS VARCHAR)")} AS bucket,
         |  CASE WHEN ${hashBucketSql("CAST(doc_id AS VARCHAR)")} < 80 THEN 'train'
         |       WHEN ${hashBucketSql("CAST(doc_id AS VARCHAR)")} < 90 THEN 'val'
         |       ELSE 'test' END AS split
         |FROM documents ORDER BY doc_id""".stripMargin,

    "q_stratified_sample" ->
      """SELECT doc_id, lang FROM (
        |  SELECT doc_id, lang,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY md5('strat' || CAST(doc_id AS VARCHAR)), doc_id) AS rn,
        |    count(*) OVER (PARTITION BY lang) AS cnt
        |  FROM documents) t
        |WHERE rn <= ceil(cnt * 0.2) ORDER BY doc_id""".stripMargin,

    "q_histogram" ->
      """SELECT CAST(least(greatest(floor(o_totalprice / 60000.0), 0), 9) AS INT) AS bucket,
        |  count(*) AS n, min(o_totalprice) AS lo, max(o_totalprice) AS hi
        |FROM orders GROUP BY bucket ORDER BY bucket""".stripMargin,

    "q_class_balance" ->
      s"""SELECT label, CAST(n AS BIGINT) AS n,
         |  ${rndSql("CAST(n AS DOUBLE) / CAST(sum(n) OVER () AS DOUBLE)", 6)} AS pct
         |FROM (SELECT label, count(*) AS n FROM embeddings GROUP BY label) t
         |ORDER BY label""".stripMargin,

    "q_feature_scale" ->
      s"""SELECT l_orderkey, l_linenumber, l_returnflag, l_extendedprice,
         |  ${rndSql("(l_extendedprice - min(l_extendedprice) OVER g) / " +
           "(max(l_extendedprice) OVER g - min(l_extendedprice) OVER g)", 6)} AS minmax,
         |  ${rndSql("(l_extendedprice - avg(l_extendedprice) OVER g) / " +
           "stddev_samp(l_extendedprice) OVER g", 4)} AS zscore
         |FROM lineitem
         |WINDOW g AS (PARTITION BY l_returnflag)
         |ORDER BY l_orderkey, l_linenumber, l_extendedprice""".stripMargin,

    "q_approx_distinct" ->
      """SELECT l_returnflag,
        |  CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_exact,
        |  TRUE AS approx_ok
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_distinct_sketch" -> {
      import graft.operators.DistinctSketch.{MaxRank, Registers}
      s"""WITH h AS (
         |  SELECT CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
         |    AS BIGINT) AS h60
         |  FROM events WHERE user_id IS NOT NULL
         |), r AS (
         |  SELECT h60 % $Registers AS reg, h60 // $Registers AS sfx FROM h
         |)
         |SELECT reg,
         |  max(CAST(CASE WHEN sfx = 0 THEN $MaxRank
         |      ELSE $MaxRank - length(bin(sfx)) END AS BIGINT)) AS max_rank
         |FROM r GROUP BY reg ORDER BY reg""".stripMargin
    },

    // replays the deterministic sample exactly (order statistics of the
    // md5 row-hash, then of the value); the exact-percentile comparison
    // lives in the pinned boolean (10% band at n=256)
    "q_quantile_bysample" ->
      """WITH li AS (
        |  SELECT l_returnflag AS flag, l_extendedprice AS v,
        |    CAST(('0x' || substr(md5(CAST(l_orderkey AS VARCHAR) || '|' ||
        |      CAST(l_linenumber AS VARCHAR) || '|' ||
        |      CAST(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
        |        AS VARCHAR)), 1, 15)) AS BIGINT) AS h
        |  FROM lineitem
        |), rk AS (
        |  SELECT flag, v,
        |    row_number() OVER (PARTITION BY flag ORDER BY h) AS rk FROM li
        |), sv AS (
        |  SELECT flag, v,
        |    row_number() OVER (PARTITION BY flag ORDER BY v) AS vr
        |  FROM rk WHERE rk <= 256
        |), samp AS (
        |  SELECT flag, max(CASE WHEN vr = 128 THEN v END) AS p50s,
        |         max(CASE WHEN vr = 230 THEN v END) AS p90s
        |  FROM sv GROUP BY flag
        |), ex AS (
        |  SELECT l_returnflag AS flag, count(*) AS n_rows
        |  FROM lineitem GROUP BY 1
        |)
        |SELECT e.flag, e.n_rows, s.p50s AS p50_sample, s.p90s AS p90_sample,
        |  TRUE AS within_10pct
        |FROM ex e JOIN samp s ON s.flag = e.flag ORDER BY e.flag""".stripMargin,

    "q_kmv_overlap" -> kmvPairSql(
      s"""SELECT ta AS type_a, tb AS type_b,
         |  ${rndSql("ra", 2)} AS est_a, ${rndSql("rb", 2)} AS est_b,
         |  ${rndSql("ru", 2)} AS est_union,
         |  ${rndSql("greatest(0.0, ra + rb - ru)", 2)} AS est_inter
         |FROM e ORDER BY type_a, type_b""".stripMargin),

    // same literal clamp/op sequence as the Spark column trees
    "q_kmv_diff" -> kmvPairSql(
      s"""SELECT ta AS type_a, tb AS type_b,
         |  ${rndSql("greatest(0.0, ra - greatest(0.0, ra + rb - ru))", 2)} AS est_anotb,
         |  ${rndSql("greatest(0.0, rb - greatest(0.0, ra + rb - ru))", 2)} AS est_bnota,
         |  ${rndSql("greatest(0.0, ra - greatest(0.0, ra + rb - ru)) + greatest(0.0, rb - greatest(0.0, ra + rb - ru))", 2)} AS est_symmdiff
         |FROM e ORDER BY type_a, type_b""".stripMargin),

    "q_approx_quantile" ->
      s"""SELECT l_returnflag,
         |  ${rndSql("quantile_cont(l_extendedprice, 0.5)", 4)} AS p50_exact,
         |  TRUE AS approx_ok
         |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
}
