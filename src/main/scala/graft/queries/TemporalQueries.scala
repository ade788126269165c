package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.TemporalJoin
import graft.queries.QueryHelpers._

/** Temporal join queries over the events stream table, oracle-checked
  * against DuckDB's native ASOF JOIN / inequality join — i.e. our
  * scale-shaped implementations (union+window as-of, banded-equi range)
  * must reproduce the textbook semantics exactly.
  *
  * All timestamps are integer MICROseconds (see AnalyticQueries: DuckDB
  * narrows the nanos parquet column to micros, so micros are the
  * cross-engine unit).
  */
object TemporalQueries {

  /** events projected to integer-micro timestamps. */
  private def ev(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir).select(
      col("event_id"), col("user_id"), expr("ts_ns DIV 1000").as("ts_us"),
      col("event_type"), col("value"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- as-of join: each click matched to the user's most recent
    // purchase at-or-before it. Right side pre-aggregated to one row per
    // (user, ts) — max_by(event_id) — so the match is unique.
    "q_asof_join" -> ((s, dir) => {
      val e = ev(s, dir)
      val clicks = e.where(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts_us"))
      val purchases = e.where(col("event_type") === "purchase")
        .groupBy(col("user_id"), col("ts_us").as("p_ts_us"))
        .agg(max(col("event_id")).as("p_event"),
          expr("max_by(value, event_id)").as("p_value"))
      TemporalJoin.asOf(clicks, purchases, Seq("user_id"),
          leftTs = "ts_us", rightTs = "p_ts_us",
          payload = Seq("p_ts_us", "p_event", "p_value"))
        .withColumn("gap_s", expr("(ts_us - p_ts_us) DIV 1000000"))
        .orderBy("event_id")
    }),

    // ---- range join: every event within 1 hour at-or-after each signup
    // by the same user, aggregated per signup. The banded equi-join keeps
    // this a hash join at any scale.
    "q_range_join" -> ((s, dir) => {
      val e = ev(s, dir)
      val signups = e.where(col("event_type") === "signup")
        .select(col("event_id").as("s_event"), col("user_id"),
          col("ts_us").as("s_ts"))
      TemporalJoin.bandedRange(signups, e.select(col("user_id"), col("ts_us"), col("value")),
          key = "user_id", leftTs = "s_ts", rightTs = "ts_us",
          windowWidth = 3600L * 1000000L)
        .groupBy(col("s_event"), col("user_id"))
        .agg(count(lit(1)).as("n_follow"), rnd(sum(col("value")), 4).as("sum_value"))
        .orderBy("s_event")
    }),

    // ---- z-normalized SUBSEQUENCE similarity search — the distributed
    // time-series matching primitive (the retrieved EDBT 2019 paper
    // "Time Series Similarity Search for Streaming Data in Distributed
    // Systems" solves exactly this shape; the z-normalized Euclidean
    // measure is the UCR-suite standard, offset/scale-invariant per
    // window). Query = the corpus's first m=8 values; candidates =
    // EVERY length-8 sliding window of every user's value series; top
    // 20 by distance. Exactness: every mean/std/distance is a per-row
    // ascending fold over the window LIST (frame-ordered, never a
    // shuffled aggregate — the foldSq discipline), the query vector
    // rides a 1-row broadcast, flat windows (σ=0) z-map to the zero
    // vector on both engines, and the ranking rounds to 6 dp with a
    // (user_id, pos) tie-break. Scale: ONE per-user window pass builds
    // all candidates (the corpus shuffles once on user_id), scoring is
    // narrow, selection is TakeOrderedAndProject — never a global sort.
    "q_ts_subseq_search" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val m = 8
      val e = ev(s, dir).select(
        col("user_id"), col("ts_us"), col("event_id"), col("value"))
      // query pattern: the first m values of the SMALLEST user with >= m
      // events (NOT the global head — at derived scale the global head
      // is m identical key-shifted copies of one event, a flat pattern
      // that z-maps to the zero vector and matches nothing; a per-user
      // series head guarantees a d6=0 self-match at every scale, so the
      // gate is provably non-vacuous). Collected order-safely via
      // sort_array(struct) — collect_list after orderBy does NOT
      // survive repartitioning.
      val qRow = e.groupBy(col("user_id")).agg(count(lit(1)).as("n"))
        .where(col("n") >= m).agg(min(col("user_id"))).head()
      // explicit failure beats the opaque NPE getLong throws on the
      // null min() of an empty filter (review finding)
      require(!qRow.isNullAt(0),
        s"no user has >= $m events — corpus too small for the pattern rule")
      val qUser = qRow.getLong(0)
      val q = e.where(col("user_id") === qUser)
        .orderBy(col("ts_us"), col("event_id")).limit(m)
        .agg(expr("transform(sort_array(collect_list(" +
          "struct(ts_us, event_id, value))), x -> x.value)").as("qv"))
      val ord = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_us"), col("event_id"))
      val wind = e
        .withColumn("w", collect_list(col("value"))
          .over(ord.rowsBetween(Window.currentRow, m - 1)))
        .withColumn("pos", row_number().over(ord))
        .where(size(col("w")) === m)
        .select(col("user_id"), col("pos"), col("w"))
      def fsum(a: Column): Column = aggregate(a, lit(0.0), (x, y) => x + y)
      def zn(v: String, mu: String, sd: String): Column =
        transform(col(v), x =>
          when(col(sd) > 0.0, (x - col(mu)) / col(sd)).otherwise(lit(0.0)))
      val scored = wind.crossJoin(broadcast(q))
        .withColumn("mu_w", fsum(col("w")) / lit(m.toDouble))
        .withColumn("sd_w", sqrt(fsum(transform(col("w"),
          x => (x - col("mu_w")) * (x - col("mu_w")))) / lit(m.toDouble)))
        .withColumn("mu_q", fsum(col("qv")) / lit(m.toDouble))
        .withColumn("sd_q", sqrt(fsum(transform(col("qv"),
          x => (x - col("mu_q")) * (x - col("mu_q")))) / lit(m.toDouble)))
        .withColumn("d6", rnd(fsum(zip_with(
          zn("w", "mu_w", "sd_w"), zn("qv", "mu_q", "sd_q"),
          (a, b) => (a - b) * (a - b))), 6))
      val top = scored.orderBy(col("d6"), col("user_id"), col("pos"))
        .limit(20)
      top.withColumn("rk", row_number().over(
          Window.orderBy(col("d6"), col("user_id"), col("pos"))).cast("int"))
        .select(col("rk"), col("user_id"), col("pos"), col("d6"))
    }),

    // ---- motif discovery (matrix-profile-lite): each length-8 window's
    // nearest OTHER window under z-normalized Euclidean distance, with
    // the candidate space bounded by a SAX word — the quantized shape
    // signature of the z-normed window (binary→quartile alphabet per
    // Chiu/Keogh/Lonardi KDD'03 probabilistic motif discovery; the
    // exact-within-bucket scoring mirrors the matrix profile's nearest-
    // other-window semantics, Yeh et al. ICDM'16). Semantics: candidates
    // = window pairs sharing the full 8-symbol alphabet-4 SAX word
    // (breakpoints at the standard-normal quartiles ±0.6744897501960817
    // and 0); CONSTANT windows (sd_w = 0) are excluded from the motif
    // space entirely — the matrix-profile convention for zero-variance
    // subsequences, whose z-norm is undefined (see [[motifWindows]] for
    // the scale rationale); trivial matches excluded matrix-profile-
    // style (same user, |Δpos| < 8); per-window nearest by (d6, user_b,
    // pos_b); output = global top 20 motif anchors by (d6, user_a,
    // pos_a). Exactness: zw is computed ONCE per window with the
    // ascending-fold discipline and the SAX symbol + distance both
    // derive from those bits, so the bucket membership and ranking are
    // bit-identical across engines.
    // Scale: ONE shuffle on the SAX word bounds candidates to same-
    // shape buckets (word length × alphabet size is the granularity
    // knob — density probed at 0.5M pairs sf0.01 / 67M at 10× derived);
    // per-window nearest is a bounded window function; selection is
    // TakeOrderedAndProject, never a global sort.
    "q_ts_motif" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val m = 8
      val e = ev(s, dir).select(
        col("user_id"), col("ts_us"), col("event_id"), col("value"))
      val wind = motifWindows(e)
      val a = wind.select(col("sg"), col("user_id").as("user_a"),
        col("pos").as("pos_a"), col("zw").as("za"))
      val b = wind.select(col("sg"), col("user_id").as("user_b"),
        col("pos").as("pos_b"), col("zw").as("zb"))
      // distance = the same ascending left-associative fold as the
      // oracle's list_reduce, but UNROLLED into codegen'd arithmetic:
      // the zip_with/aggregate HOF form is interpreted (allocates a
      // zipped array per pair) and measured ~3.6× slower end-to-end
      // over the 67M derived-scale candidate pairs (120 s → 33 s)
      val dist = (1 to m).map { i =>
        val d = element_at(col("za"), i) - element_at(col("zb"), i)
        d * d
      }.reduceLeft(_ + _)
      val pairs = a.join(b, "sg")
        .where(!(col("user_a") === col("user_b") &&
          abs(col("pos_a") - col("pos_b")) < m))
        .withColumn("d6", rnd(dist, 6))
      // per-window nearest = lexicographic min of (d6, user_b, pos_b):
      // a partial-aggregating groupBy (map-side combine shrinks the
      // candidate volume BEFORE the exchange), not a row_number window
      // (which would shuffle+sort every candidate pair — measured 1.4×
      // slower end-to-end at the 67M-pair derived scale)
      val nn = pairs
        .groupBy(col("user_a"), col("pos_a"))
        .agg(min(struct(col("d6"), col("user_b"), col("pos_b"))).as("nb"))
        .select(col("user_a"), col("pos_a"), col("nb.user_b").as("user_b"),
          col("nb.pos_b").as("pos_b"), col("nb.d6").as("d6"))
      val top = nn.orderBy(col("d6"), col("user_a"), col("pos_a")).limit(20)
      top.withColumn("rk", row_number().over(
          Window.orderBy(col("d6"), col("user_a"), col("pos_a"))).cast("int"))
        .select(col("rk"), col("user_a"), col("pos_a"),
          col("user_b"), col("pos_b"), col("d6"))
    }),

    // ---- CUSUM change-point detection (Page 1954; the positive-side
    // tabular CUSUM with restart-after-alarm of Montgomery's SPC
    // text): per user, S_i = max(0, S_{i-1} + (x_i − μ_u − k)), alarm
    // when S_i > h, reset to 0 after each alarm. EXACT end to end:
    // values in cents, μ_u = Σx DIV n, k = 2000 (20.00), h = 25000
    // (250.00) — calibrated so both alarmed and quiet users exist at
    // EVERY gate scale (1/15 at sf0.001, 46/150 at sf0.01, 496/1500
    // at sf0.1).
    // The sequential recurrence no window frame expresses runs as the
    // q_ewma ordered-array fold — one hash shuffle by user, per-user
    // state only; the struct accumulator carries (S, n_alarms,
    // first_alarm_pos, pos, max_S), and since every op is integer the
    // cross-engine equality is exact regardless of fold mechanics.
    "q_ts_cusum" -> ((s, dir) => {
      val k = 2000L; val h = 25000L
      ev(s, dir)
        .select(col("user_id"), col("ts_us"), col("event_id"),
          floor(col("value") * lit(100.0) + lit(0.5)).cast("long").as("xc"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n"), sum(col("xc")).as("sx"),
          array_sort(collect_list(struct(col("ts_us"), col("event_id"),
            col("xc")))).as("vs"))
        .withColumn("mu_c", expr("sx DIV n"))
        .select(col("user_id"), col("n"), col("mu_c"),
          expr(s"""aggregate(vs,
            |  named_struct('s', CAST(0 AS BIGINT), 'na', CAST(0 AS BIGINT),
            |    'fp', CAST(0 AS BIGINT), 'pos', CAST(0 AS BIGINT),
            |    'smax', CAST(0 AS BIGINT)),
            |  (acc, x) -> named_struct(
            |    's', CASE WHEN greatest(CAST(0 AS BIGINT), acc.s + x.xc - mu_c - $k) > $h
            |           THEN CAST(0 AS BIGINT)
            |           ELSE greatest(CAST(0 AS BIGINT), acc.s + x.xc - mu_c - $k) END,
            |    'na', acc.na + CASE WHEN greatest(CAST(0 AS BIGINT), acc.s + x.xc - mu_c - $k) > $h
            |           THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END,
            |    'fp', CASE WHEN acc.fp <> 0 THEN acc.fp
            |           WHEN greatest(CAST(0 AS BIGINT), acc.s + x.xc - mu_c - $k) > $h
            |           THEN acc.pos + 1 ELSE CAST(0 AS BIGINT) END,
            |    'pos', acc.pos + 1,
            |    'smax', greatest(acc.smax,
            |      greatest(CAST(0 AS BIGINT), acc.s + x.xc - mu_c - $k)))
            |)""".stripMargin).as("st"))
        .select(col("user_id"), col("n"), col("mu_c"),
          col("st.na").as("n_alarms"), col("st.fp").as("first_alarm"),
          col("st.smax").as("max_s"))
        .orderBy("user_id")
    }))

  val oracleSql: Map[String, String] = Map(
    "q_asof_join" ->
      """WITH e AS (
        |  SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type, value
        |  FROM events
        |), clicks AS (
        |  SELECT event_id, user_id, ts_us FROM e WHERE event_type = 'click'
        |), purch AS (
        |  SELECT user_id, ts_us AS p_ts_us, max(event_id) AS p_event,
        |    arg_max(value, event_id) AS p_value
        |  FROM e WHERE event_type = 'purchase' GROUP BY user_id, ts_us
        |)
        |SELECT c.user_id, c.ts_us, c.event_id, p.p_ts_us, p.p_event, p.p_value,
        |  (c.ts_us - p.p_ts_us) // 1000000 AS gap_s
        |FROM clicks c ASOF LEFT JOIN purch p
        |  ON c.user_id = p.user_id AND c.ts_us >= p.p_ts_us
        |ORDER BY c.event_id""".stripMargin,

    "q_range_join" ->
      s"""WITH e AS (
         |  SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type, value
         |  FROM events
         |), s AS (
         |  SELECT event_id AS s_event, user_id, ts_us AS s_ts
         |  FROM e WHERE event_type = 'signup'
         |)
         |SELECT s.s_event, s.user_id, count(*) AS n_follow,
         |  ${rndSql("sum(e.value)", 4)} AS sum_value
         |FROM s JOIN e ON s.user_id = e.user_id
         |  AND e.ts_us >= s.s_ts AND e.ts_us < s.s_ts + ${3600L * 1000000L}
         |GROUP BY s.s_event, s.user_id ORDER BY s.s_event""".stripMargin,

    // subsequence twin: same frame-ordered window lists, same ascending
    // list folds for mean/std/distance (list_reduce's first-element
    // seed equals Spark's 0.0 seed exactly — (0.0 + x) ≡ x in IEEE),
    // same σ=0 zero-vector rule, same 6-dp/(user, pos) ranking
    "q_ts_subseq_search" ->
      s"""WITH $subseqCtes,
         |r AS (
         |  SELECT *, CAST(row_number() OVER (ORDER BY d6, user_id, pos) AS INT) AS rk
         |  FROM d
         |)
         |SELECT rk, user_id, pos, d6 FROM r WHERE rk <= 20 ORDER BY rk""".stripMargin,

    // motif twin: zw computed once per window (same frame-ordered lists,
    // same ascending folds, same sd_w = 0 constant-window exclusion),
    // SAX word and distance both derived from those exact bits; same
    // 6-dp rounding and id tie-breaks
    "q_ts_motif" ->
      s"""WITH $znWindowCtes,
         |sx AS (
         |  SELECT user_id, pos, zw,
         |    list_aggregate(list_transform(zw, x ->
         |      CASE WHEN x >= 0.6744897501960817 THEN '3'
         |           WHEN x >= 0.0 THEN '2'
         |           WHEN x >= -0.6744897501960817 THEN '1'
         |           ELSE '0' END), 'string_agg', '') AS sg
         |  FROM zs
         |), pr AS (
         |  SELECT a.user_id AS user_a, a.pos AS pos_a,
         |    b.user_id AS user_b, b.pos AS pos_b,
         |    ${rndSql("list_reduce(list_transform(range(1, 9), " +
            "i -> (a.zw[i] - b.zw[i]) * (a.zw[i] - b.zw[i])), (x, y) -> x + y)", 6)} AS d6
         |  FROM sx a JOIN sx b ON a.sg = b.sg
         |  WHERE NOT (a.user_id = b.user_id AND abs(a.pos - b.pos) < 8)
         |), nn AS (
         |  SELECT *, row_number() OVER (
         |    PARTITION BY user_a, pos_a ORDER BY d6, user_b, pos_b) AS r
         |  FROM pr
         |), top AS (
         |  SELECT user_a, pos_a, user_b, pos_b, d6,
         |    CAST(row_number() OVER (ORDER BY d6, user_a, pos_a) AS INT) AS rk
         |  FROM nn WHERE r = 1
         |)
         |SELECT rk, user_a, pos_a, user_b, pos_b, d6
         |FROM top WHERE rk <= 20 ORDER BY rk""".stripMargin,

    // CUSUM twin: identical ordered value sequence, identical integer
    // recurrence, realized as a RECURSIVE CTE stepping one element per
    // round. NOT list_reduce with a struct accumulator: DuckDB's
    // list_reduce mutates the struct accumulator in place and
    // evaluates the result fields against the partially-updated state
    // — observed smax = 2·s at fixture scale, and even with reads
    // ordered before their fields' updates, 3/15000 groups still
    // folded wrong at the derived volume (vector-batch dependent). The
    // recursion is pure SQL: deterministic under any execution. All
    // ops integer ⇒ exact.
    "q_ts_cusum" ->
      s"""WITH RECURSIVE ${cusumCtes(perUserMu = true)}
         |SELECT g.user_id, g.n, g.mu_c, st.na AS n_alarms,
         |  st.fp AS first_alarm, st.smax AS max_s
         |FROM g JOIN st ON st.user_id = g.user_id AND st.pos = g.n
         |ORDER BY g.user_id""".stripMargin)

  /** Recursive-CTE CUSUM chain ending in `st(user_id, pos, s, na, fp,
    * smax)` over `g(user_id, n, mu_c, vs)` — one recursion round per
    * series element. `perUserMu` prices the in-control target as each
    * user's own mean (q_ts_cusum's retrospective form) vs the GLOBAL
    * stream mean (stream_cusum_sink's known-target online form).
    * Callers prefix `WITH RECURSIVE`. Shared builder — see the
    * q_ts_cusum oracle comment for why this is a recursion and never a
    * list_reduce struct fold.
    */
  private[queries] def cusumCtes(perUserMu: Boolean): String = {
    val g = if (perUserMu)
      """g AS MATERIALIZED (
        |  SELECT user_id, count(*) AS n,
        |    CAST(sum(xc) AS BIGINT) // count(*) AS mu_c,
        |    list(xc ORDER BY ts_us, event_id) AS vs
        |  FROM e GROUP BY user_id
        |)""".stripMargin
    else
      """m0 AS MATERIALIZED (
        |  SELECT CAST(sum(xc) AS BIGINT) // count(*) AS mu FROM e
        |), g AS MATERIALIZED (
        |  SELECT user_id, count(*) AS n, (SELECT mu FROM m0) AS mu_c,
        |    list(xc ORDER BY ts_us, event_id) AS vs
        |  FROM e GROUP BY user_id
        |)""".stripMargin
    s"""e AS (
       |  SELECT user_id, epoch_us(ts) AS ts_us, event_id,
       |    CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS xc
       |  FROM events
       |), $g, st AS (
       |  SELECT user_id, CAST(0 AS BIGINT) AS pos, CAST(0 AS BIGINT) AS s,
       |    CAST(0 AS BIGINT) AS na, CAST(0 AS BIGINT) AS fp,
       |    CAST(0 AS BIGINT) AS smax
       |  FROM g
       |  UNION ALL
       |  SELECT user_id, pos + 1,
       |    CASE WHEN s1 > 25000 THEN CAST(0 AS BIGINT) ELSE s1 END,
       |    na + CASE WHEN s1 > 25000 THEN 1 ELSE 0 END,
       |    CASE WHEN fp <> 0 THEN fp
       |         WHEN s1 > 25000 THEN pos + 1 ELSE CAST(0 AS BIGINT) END,
       |    greatest(smax, s1)
       |  FROM (
       |    SELECT st.user_id, st.pos, st.na, st.fp, st.smax,
       |      greatest(0, st.s + g.vs[CAST(st.pos AS INT) + 1] - g.mu_c - 2000) AS s1
       |    FROM st JOIN g USING (user_id) WHERE st.pos < g.n)
       |)""".stripMargin
  }

  /** The motif window stage shared by `q_ts_motif` and the constant-
    * burst hardening spec: per-user length-8 windows over
    * `(user_id, ts_us, event_id, value)`, z-normalized with the
    * ascending-fold discipline, SAX-worded at the standard-normal
    * quartile breakpoints — and CONSTANT windows (sd_w = 0) routed OUT
    * of the motif space. That exclusion is the matrix-profile
    * convention (a zero-variance subsequence has no defined z-norm
    * shape) and it is load-bearing at scale: a z-norm forced to
    * all-zeros would SAX to the single word "22222222", funneling
    * EVERY constant run in the corpus — fixed-price purchases,
    * heartbeat metrics — into ONE join bucket whose candidate space
    * grows quadratically. Constant windows are mutual exact
    * duplicates; the dedup family is their tool, not the motif join.
    * Output columns: (user_id, pos, zw, sg).
    */
  private[graft] def motifWindows(e: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val m = 8
    val bp = 0.6744897501960817 // standard-normal upper quartile
    val ord = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
    def fsum(a: Column): Column = aggregate(a, lit(0.0), (x, y) => x + y)
    e.withColumn("w", collect_list(col("value"))
        .over(ord.rowsBetween(Window.currentRow, m - 1)))
      .withColumn("pos", row_number().over(ord))
      .where(size(col("w")) === m)
      .withColumn("mu_w", fsum(col("w")) / lit(m.toDouble))
      .withColumn("sd_w", sqrt(fsum(transform(col("w"),
        x => (x - col("mu_w")) * (x - col("mu_w")))) / lit(m.toDouble)))
      .where(col("sd_w") > 0.0)
      .withColumn("zw", transform(col("w"), x =>
        (x - col("mu_w")) / col("sd_w")))
      .withColumn("sg", array_join(transform(col("zw"), x =>
        when(x >= bp, lit("3")).when(x >= 0.0, lit("2"))
          .when(x >= -bp, lit("1")).otherwise(lit("0"))), ""))
      .select(col("user_id"), col("pos"), col("zw"), col("sg"))
  }

  /** CTE chain ending in `zs(user_id, pos, zw)` — every per-user
    * length-8 window z-normalized with the same frame-ordered lists and
    * ascending folds as [[subseqCtes]] (its w-side twin, kept textually
    * aligned — subseqCtes additionally threads the query vector through
    * mu/sd, so the two chains stay separate builders rather than one
    * string-surgered template), with CONSTANT windows (sd_w = 0)
    * filtered out to mirror [[motifWindows]]'s degenerate-bucket
    * exclusion. Shared by q_ts_motif's oracle.
    */
  private[queries] def znWindowCtes: String =
    s"""e AS (
       |  SELECT event_id, user_id, epoch_us(ts) AS ts_us, value FROM events
       |), wind AS (
       |  SELECT user_id,
       |    row_number() OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS pos,
       |    list(value) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
       |      ROWS BETWEEN CURRENT ROW AND 7 FOLLOWING) AS w
       |  FROM e
       |), wf AS (
       |  SELECT user_id, CAST(pos AS INT) AS pos, w FROM wind WHERE len(w) = 8
       |), mu AS (
       |  SELECT *, list_reduce(w, (a, b) -> a + b) / 8.0 AS mu_w FROM wf
       |), sd AS (
       |  SELECT *,
       |    sqrt(list_reduce(list_transform(w, x -> (x - mu_w) * (x - mu_w)),
       |      (a, b) -> a + b) / 8.0) AS sd_w
       |  FROM mu
       |), zs AS (
       |  SELECT user_id, pos,
       |    list_transform(w, x -> (x - mu_w) / sd_w) AS zw
       |  FROM sd WHERE sd_w > 0.0
       |)""".stripMargin

  /** CTE chain ending in `d(user_id, pos, d6)` — every per-user length-8
    * window scored z-normalized against the corpus-head query pattern.
    * Shared by q_ts_subseq_search's top-k and stream_subseq_sink's
    * thresholded-match oracle (the shared-builder discipline — never
    * compose oracles by string surgery).
    */
  private[queries] def subseqCtes: String =
    s"""e AS (
       |  SELECT event_id, user_id, epoch_us(ts) AS ts_us, value FROM events
       |), qu AS (
       |  SELECT user_id FROM e GROUP BY user_id HAVING count(*) >= 8
       |  ORDER BY user_id LIMIT 1
       |), qv AS (
       |  SELECT list(value ORDER BY ts_us, event_id) AS qv FROM (
       |    SELECT ts_us, event_id, value FROM e JOIN qu USING (user_id)
       |    ORDER BY ts_us, event_id LIMIT 8)
       |), wind AS (
       |  SELECT user_id,
       |    row_number() OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS pos,
       |    list(value) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
       |      ROWS BETWEEN CURRENT ROW AND 7 FOLLOWING) AS w
       |  FROM e
       |), wf AS (
       |  SELECT user_id, CAST(pos AS INT) AS pos, w, qv
       |  FROM wind CROSS JOIN qv WHERE len(w) = 8
       |), mu AS (
       |  SELECT *, list_reduce(w, (a, b) -> a + b) / 8.0 AS mu_w,
       |    list_reduce(qv, (a, b) -> a + b) / 8.0 AS mu_q
       |  FROM wf
       |), sd AS (
       |  SELECT *,
       |    sqrt(list_reduce(list_transform(w, x -> (x - mu_w) * (x - mu_w)),
       |      (a, b) -> a + b) / 8.0) AS sd_w,
       |    sqrt(list_reduce(list_transform(qv, x -> (x - mu_q) * (x - mu_q)),
       |      (a, b) -> a + b) / 8.0) AS sd_q
       |  FROM mu
       |), z AS (
       |  SELECT user_id, pos,
       |    list_transform(w, x -> CASE WHEN sd_w > 0.0
       |      THEN (x - mu_w) / sd_w ELSE 0.0 END) AS zw,
       |    list_transform(qv, x -> CASE WHEN sd_q > 0.0
       |      THEN (x - mu_q) / sd_q ELSE 0.0 END) AS zq
       |  FROM sd
       |), d AS (
       |  SELECT user_id, pos,
       |    ${rndSql("list_reduce(list_transform(range(1, 9), " +
          "i -> (zw[i] - zq[i]) * (zw[i] - zq[i])), (a, b) -> a + b)", 6)} AS d6
       |  FROM z
       |)""".stripMargin
}
