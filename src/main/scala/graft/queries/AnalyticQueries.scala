package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.AlsRank2
import graft.queries.QueryHelpers._

/** Round-2 analytic operator coverage: the full window-function suite,
  * pivot, set operators, exact percentiles, moment statistics, date/time
  * and array function families, scalar subqueries, and batch
  * sessionization. All DuckDB-oracle checked.
  *
  * The reference has none of these (SURVEY §2.5 "none in the reference");
  * they exist because a user of a general analytics engine needs them and
  * Catalyst provides them natively — each query pins the capability under
  * the cross-engine gate and documents the type alignment quirks
  * (DuckDB rank/ntile/len return BIGINT where Spark returns INT; DuckDB
  * sum(INT) returns HUGEINT; DuckDB dayofweek is 0-based).
  *
  * Scale notes: window suites shuffle once on their partition key; the
  * sessionization is the scalable lag+cumulative-sum form (one shuffle by
  * user_id, no self-join); the scalar subquery broadcasts a 1-row
  * aggregate rather than re-scanning per row.
  */
object AnalyticQueries {

  /** CTE chain ending in `y1(event_type, n_users, y_m)` — the step-1
    * ALS item factors; both ALS oracles compose on it (the
    * shared-builder discipline — never string surgery).
    */
  private def alsCtes: String =
    """c AS (SELECT user_id, event_type,
      |    CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS rc FROM events),
      |r AS MATERIALIZED (SELECT user_id, event_type, CAST(sum(rc) AS BIGINT) AS r_c
      |  FROM c GROUP BY 1, 2),
      |xu AS (SELECT user_id,
      |    (CAST(sum(r_c) AS BIGINT) * 10) // (1 + count(*)) AS x_k
      |  FROM r GROUP BY user_id),
      |yi AS (SELECT r.event_type, count(*) AS n_users,
      |    CAST(sum(r.r_c * xu.x_k) AS BIGINT) AS n_i,
      |    CAST(sum(xu.x_k * xu.x_k) AS BIGINT) AS sx2
      |  FROM r JOIN xu USING (user_id) GROUP BY r.event_type),
      |y1 AS (SELECT event_type, n_users,
      |    CAST((n_i::HUGEINT * 10000000) // (1000000::HUGEINT + sx2)
      |      AS BIGINT) AS y_m
      |  FROM yi)""".stripMargin

  /** Rank-2 twin of [[alsCtes]]: CTE chain ending in
    * `y2s(event_type, n_users, y1_m, y2_m)` — the step-1 rank-2 item
    * factors (cents ratings, milli x1/x2 init, per-item 2×2 Cramer
    * with HUGEINT products mirroring Spark's DECIMAL(38,0) widening
    * and `//` ≡ DIV truncation). Both rank-2 oracles compose on it.
    */
  private def als2Ctes: String =
    """c AS (SELECT user_id, event_type,
      |    CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS rc FROM events),
      |r AS MATERIALIZED (SELECT user_id, event_type,
      |    CAST(sum(rc) AS BIGINT) AS r_c FROM c GROUP BY 1, 2),
      |xu AS (SELECT user_id,
      |    (CAST(sum(r_c) AS BIGINT) * 10) // (1 + count(*)) AS x1,
      |    1 + user_id % 199 AS x2
      |  FROM r GROUP BY user_id),
      |yi AS (SELECT r.event_type, count(*) AS n_users,
      |    CAST(sum(xu.x1 * xu.x1) AS BIGINT) + 1000000 AS a11,
      |    CAST(sum(xu.x1 * xu.x2) AS BIGINT) AS a12,
      |    CAST(sum(xu.x2 * xu.x2) AS BIGINT) + 1000000 AS a22,
      |    CAST(sum(r.r_c * xu.x1) AS BIGINT) AS b1,
      |    CAST(sum(r.r_c * xu.x2) AS BIGINT) AS b2
      |  FROM r JOIN xu USING (user_id) GROUP BY r.event_type),
      |y2s AS (SELECT event_type, CAST(n_users AS BIGINT) AS n_users,
      |    CAST(((b1::HUGEINT * a22 - b2::HUGEINT * a12) * 10000000) //
      |      (a11::HUGEINT * a22 - a12::HUGEINT * a12) AS BIGINT) AS y1_m,
      |    CAST(((a11::HUGEINT * b2 - a12::HUGEINT * b1) * 10000000) //
      |      (a11::HUGEINT * a22 - a12::HUGEINT * a12) AS BIGINT) AS y2_m
      |  FROM yi)""".stripMargin

  /** ONE further rank-2 alternation as CTE text — per-user 2×2 ridge
    * Cramer (`ua$k`/`xu$k`, micros² λ·10¹², x out in millis) then the
    * per-item re-solve (`yi$k`, milli² λ·10⁶, y out in micros) —
    * reading item factors from `$prev(event_type, y1_m, y2_m)` and
    * ending in `ya$k(event_type, n_users, y1_m, y2_m)`. The
    * q_als_rank2_step2 tail generalized so the fixed-alternation fit
    * twin composes on the same builder (the shared-builder discipline —
    * never string surgery). All HUGEINT products mirror Spark's
    * DECIMAL(38,0) widening; `//` ≡ DIV truncation.
    */
  private def als2AltCte(k: Int, prev: String): String =
    s"""ua$k AS (SELECT r.user_id,
       |    CAST(sum(y.y1_m * y.y1_m) AS BIGINT) + 1000000000000 AS ua11,
       |    CAST(sum(y.y1_m * y.y2_m) AS BIGINT) AS ua12,
       |    CAST(sum(y.y2_m * y.y2_m) AS BIGINT) + 1000000000000 AS ua22,
       |    CAST(sum(r.r_c * y.y1_m) AS BIGINT) AS ub1,
       |    CAST(sum(r.r_c * y.y2_m) AS BIGINT) AS ub2
       |  FROM r JOIN $prev y USING (event_type) GROUP BY r.user_id),
       |xu$k AS (SELECT user_id,
       |    CAST(((ub1::HUGEINT * ua22 - ub2::HUGEINT * ua12) * 10000000) //
       |      (ua11::HUGEINT * ua22 - ua12::HUGEINT * ua12) AS BIGINT) AS x1,
       |    CAST(((ua11::HUGEINT * ub2 - ua12::HUGEINT * ub1) * 10000000) //
       |      (ua11::HUGEINT * ua22 - ua12::HUGEINT * ua12) AS BIGINT) AS x2
       |  FROM ua$k),
       |yi$k AS (SELECT r.event_type, count(*) AS n_users,
       |    CAST(sum(xu$k.x1 * xu$k.x1) AS BIGINT) + 1000000 AS a11,
       |    CAST(sum(xu$k.x1 * xu$k.x2) AS BIGINT) AS a12,
       |    CAST(sum(xu$k.x2 * xu$k.x2) AS BIGINT) + 1000000 AS a22,
       |    CAST(sum(r.r_c * xu$k.x1) AS BIGINT) AS b1,
       |    CAST(sum(r.r_c * xu$k.x2) AS BIGINT) AS b2
       |  FROM r JOIN xu$k USING (user_id) GROUP BY r.event_type),
       |ya$k AS (SELECT event_type, CAST(n_users AS BIGINT) AS n_users,
       |    CAST(((b1::HUGEINT * a22 - b2::HUGEINT * a12) * 10000000) //
       |      (a11::HUGEINT * a22 - a12::HUGEINT * a12) AS BIGINT) AS y1_m,
       |    CAST(((a11::HUGEINT * b2 - a12::HUGEINT * b1) * 10000000) //
       |      (a11::HUGEINT * a22 - a12::HUGEINT * a12) AS BIGINT) AS y2_m
       |  FROM yi$k)""".stripMargin

  /** (user_id, event_type, r_c) — the ALS rating matrix in exact cents
    * (one map-side-combined aggregate over events).
    */
  private def alsRatings(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(col("user_id"), col("event_type"),
        floor(col("value") * lit(100.0) + lit(0.5)).cast("long").as("rc"))
      .groupBy(col("user_id"), col("event_type"))
      .agg(sum(col("rc")).as("r_c"))

  /** Milli-scaled user factors under the ALS init y ≡ 1:
    * x = Σr/(1+n_u) via BIGINT floor division.
    */
  private def alsUserInit(r: DataFrame): DataFrame =
    r.groupBy(col("user_id"))
      .agg(sum(col("r_c")).as("sr"), count(lit(1)).as("n_u"))
      .select(col("user_id"), expr("(sr * 10) DIV (1 + n_u)").as("x_k"))

  /** Item half-solve from milli-scaled user factors `x_k`:
    * y_micros = (Σ r·x)·10⁷ DIV (10⁶ + Σ x²) — numerator cents·millis
    * = scale 10⁵, denominator 10⁶, output micros; SCALE-INVARIANT
    * across iterations, so step 1 and step 2 share it verbatim. The
    * final division widens through DECIMAL(38,0) (N·10⁷ ~ 10²⁰ at
    * fixture magnitudes — past BIGINT).
    */
  private def alsItemSolve(r: DataFrame, xu: DataFrame): DataFrame =
    r.join(xu, "user_id")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_users"),
        sum(col("r_c") * col("x_k")).as("n_i"),
        sum(col("x_k") * col("x_k")).as("sx2"))
      .select(col("event_type"), col("n_users"),
        expr("""CAST(CAST(n_i AS DECIMAL(38,0)) * CAST(10000000 AS DECIMAL(38,0))
          |  DIV (CAST(1000000 AS DECIMAL(38,0)) + CAST(sx2 AS DECIMAL(38,0)))
          |  AS BIGINT)""".stripMargin).as("y_micros"))

  /** 30-minute session gap in MICROseconds. Session math runs on integer
    * micros on both engines: Spark's raw ts_ns keeps full nanosecond
    * precision but DuckDB narrows the TIMESTAMP(NANOS) parquet column to
    * its native microsecond timestamp, so nanos are not cross-engine
    * comparable — micros are.
    */
  private val SessionGapUs = 1800L * 1000000L

  /** q_concurrency's sweep stream: sessionize events (same gap rule as
    * q_sessionize), then emit +1 at each session start and -1 one tick
    * past its end. Factored out so AnalyticSpec can run the identical
    * stream through BOTH sweep forms (global window vs the
    * range-partitioned [[graft.operators.SweepLine]]).
    */
  private[graft] def concurrencyDeltas(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val sess = Tables.events(s, dir)
      .select(col("user_id"), expr("ts_ns DIV 1000").as("ts_us"), col("event_id"))
      .withColumn("new_s",
        when(col("ts_us") - lag(col("ts_us"), 1).over(w) > lit(SessionGapUs), 1)
          .when(lag(col("ts_us"), 1).over(w).isNull, 1)
          .otherwise(0))
      .withColumn("session_id", sum(col("new_s")).over(run))
      .groupBy(col("user_id"), col("session_id"))
      .agg(min(col("ts_us")).as("s"), max(col("ts_us")).as("e"))
    // both deltas explode from ONE pass over the session table — a
    // union of two projections would recompute the whole sessionize
    // pipeline per branch (no subtree reuse in the plan)
    sess.select(explode(array(
        struct(col("s").as("ts"), lit(1).as("delta")),
        struct((col("e") + lit(1L)).as("ts"), lit(-1).as("delta")))).as("d"))
      .select(col("d.ts").as("ts"), col("d.delta").as("delta"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- exact heavy hitters via two-phase Misra-Gries (per-partition
    // k-counter summaries → candidate superset → exact recount of
    // candidate rows only; see HeavyHitters scaladoc for why this beats
    // a full-domain groupBy at 100 TB). The naive HAVING form is the
    // oracle — the sketch path is exact by construction, so they must
    // agree row-for-row.
    "q_heavy_hitters" -> ((s, dir) =>
      graft.operators.HeavyHitters
        .frequentKeys(s, Tables.events(s, dir), "user_id", k = 150)
        .select(col("user_id"), col("freq"), col("n_total"),
          rnd(col("freq").cast("double") / col("n_total"), 6).as("share"))
        .orderBy("user_id")),

    // ---- market-basket association rules: support / confidence / lift
    // over order baskets — the classic co-purchase mining workload.
    // Every metric is a rational of integer counts (pair count, item
    // counts, basket count), so the floats are single divisions of
    // exactly-representable integers — identical IEEE results on both
    // engines under the standard rnd(·, 6) pin. The pair space is
    // bounded by Σ basket² (distinct (order, part) first), never
    // |parts|²; item counts broadcast to the rule assembly.
    "q_market_basket" -> ((s, dir) => {
      val op = Tables.lineitem(s, dir)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("p"))
        .distinct()
      val n = op.select(countDistinct(col("ok")).as("n_orders"))
      val item = op.groupBy(col("p")).agg(count(lit(1)).as("cnt"))
      val pairs = op.as("a").join(op.as("b"), col("a.ok") === col("b.ok"))
        .where(col("a.p") < col("b.p"))
        .groupBy(col("a.p").as("part_a"), col("b.p").as("part_b"))
        .agg(count(lit(1)).as("cnt_ab"))
        .where(col("cnt_ab") >= 2)
      pairs
        .join(broadcast(item.select(col("p").as("part_a"), col("cnt").as("ca"))),
          "part_a")
        .join(broadcast(item.select(col("p").as("part_b"), col("cnt").as("cb"))),
          "part_b")
        .crossJoin(broadcast(n))
        .select(col("part_a"), col("part_b"), col("cnt_ab"),
          rnd(col("cnt_ab").cast("double") / col("n_orders"), 6).as("support"),
          rnd(col("cnt_ab").cast("double") / col("ca"), 6).as("conf_ab"),
          rnd((col("cnt_ab").cast("double") * col("n_orders")) /
            (col("ca") * col("cb")), 6).as("lift"))
        .orderBy("part_a", "part_b")
    }),

    // ---- Count-Min sketch point-frequency estimates next to the exact
    // counts (CountMin scaladoc: fixed Depth×512 grid, deterministic
    // universal hashes → both engines build the identical sketch, so
    // collisions and all, this row sits under the exact hash gate).
    // est_cnt ≥ exact_cnt always; the gap IS the key's sketch collision
    // mass, visible per key.
    "q_heavy_hitters_cms" -> ((s, dir) =>
      graft.operators.CountMin
        .estimates(Tables.events(s, dir), "user_id", w = 512)
        .orderBy("user_id")),

    // ---- join-size estimation from sketches alone (CountMin
    // .joinSizeEstimate scaladoc): the optimizer-statistics primitive —
    // |lineitem ⋈ orders| estimated from two 3×65536 integer grids
    // (width sized so the collision term n1·n2/w stays well under the
    // true size — the sizing rule an optimizer would apply)
    // without shuffling either side; the exact join runs here only to
    // pin the one-sided bound (upper_bound_ok), the way
    // q_approx_distinct pins its error band
    "q_join_size_cms" -> ((s, dir) => {
      import graft.operators.CountMin
      val li = Tables.lineitem(s, dir).select(col("l_orderkey").as("k"))
      val od = Tables.orders(s, dir).select(col("o_orderkey").as("k"))
      val est = CountMin.joinSizeEstimate(li, od, w = 65536)
      val exact = li.join(od, Seq("k")).agg(count(lit(1)).as("exact_size"))
      exact.crossJoin(est)
        .select(col("exact_size"), col("est_size"),
          (col("est_size") >= col("exact_size")).as("upper_bound_ok"))
    }),

    // ---- exact mode per group with a DETERMINISTIC tie-break (the
    // built-in mode() is tie-arbitrary in both engines, so it can never
    // sit under a hash gate): count per (group, value), then
    // max(struct(count, value)) — highest count, ties to the highest
    // value. Two map-side-combined aggregates, no window sort; the
    // second groupBy input is |groups|·|distinct values| partials.
    "q_mode" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"), col("l_quantity"))
        .agg(count(lit(1)).as("cnt"))
        .groupBy(col("l_returnflag"))
        .agg(max(struct(col("cnt"), col("l_quantity"))).as("m"),
          sum(col("cnt")).as("n_rows"))
        .select(col("l_returnflag"), col("m.l_quantity").as("mode_qty"),
          col("m.cnt").as("n_mode"), col("n_rows"))
        .orderBy("l_returnflag")),

    // ---- window-function suite: ranking + offset + frame-default
    // first_value, one shuffle on the partition key; the ORDER key
    // (o_totalprice DESC, o_orderkey) is unique so every function is
    // deterministic cross-engine
    "q_window_suite" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.orders(s, dir).select(
        col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"),
        row_number().over(w).as("rn"),
        rank().over(w).as("rnk"),
        dense_rank().over(w).as("drnk"),
        ntile(4).over(w).as("quartile"),
        rnd(percent_rank().over(w), 6).as("pct_rank"),
        lag(col("o_totalprice"), 1).over(w).as("prev_price"),
        lead(col("o_orderkey"), 1).over(w).as("next_key"),
        first(col("o_orderkey")).over(w).as("top_key"))
        .orderBy("o_orderpriority", "rn")
    }),

    // ---- pivot (Spark relational pivot ≡ conditional aggregation);
    // quantities are integer-valued doubles → sums are exact
    "q_pivot" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy(col("l_linestatus"))
        .pivot("l_returnflag", Seq("A", "N", "R"))
        .agg(sum(col("l_quantity")))
        .orderBy("l_linestatus")),

    // ---- unpivot (melt) — the inverse of q_pivot: wide per-flag
    // measures back to (key, measure, value) long form via Spark's
    // native unpivot (a narrow Expand, one row-set pass, no join/union
    // re-scan of the input). Measures are exact integers (quantity
    // sums, price cents, discount points) so the gate has no float
    // slack; the oracle's UNION-ALL melt is the dialect-stable
    // equivalent of UNPIVOT.
    "q_unpivot" -> ((s, dir) => {
      val wide = Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"))
        .agg(sum(col("l_quantity")).cast("long").as("sum_qty"),
          sum(floor(col("l_extendedprice") * 100 + lit(0.5)).cast("long"))
            .as("sum_price_cents"),
          sum(floor(col("l_discount") * 100 + lit(0.5)).cast("long"))
            .as("sum_disc_pts"))
      wide.unpivot(
        Array(col("l_returnflag")),
        Array(col("sum_qty"), col("sum_price_cents"), col("sum_disc_pts")),
        "measure", "value")
        .orderBy("l_returnflag", "measure")
    }),

    // ---- set operators (INTERSECT / EXCEPT are distinct-set semantics
    // in both engines)
    "q_intersect" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
      o.where(col("o_orderpriority") === "1-URGENT").select(col("o_custkey"))
        .intersect(
          o.where(col("o_orderpriority") === "2-HIGH").select(col("o_custkey")))
        .orderBy("o_custkey")
    }),

    "q_except" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
      o.where(col("o_orderpriority") === "1-URGENT").select(col("o_custkey"))
        .except(
          o.where(col("o_orderpriority") === "2-HIGH").select(col("o_custkey")))
        .orderBy("o_custkey")
    }),

    "q_union_distinct" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
      o.where(col("o_orderpriority") === "1-URGENT").select(col("o_custkey"))
        .union(
          o.where(col("o_orderpriority") === "2-HIGH").select(col("o_custkey")))
        .distinct()
        .orderBy("o_custkey")
    }),

    // ---- explicit GROUPING SETS + grouping_id (rollup/cube's general
    // form; Expand-based plan, one shuffle)
    "q_grouping_sets" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .groupingSets(
          Seq(Seq(col("l_returnflag"), col("l_linestatus")),
            Seq(col("l_returnflag")), Seq()),
          col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("cnt"), sum(col("l_quantity")).as("sum_qty"),
          grouping_id().as("gid"))
        .orderBy(col("gid"), col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first)),

    // ---- exact interpolated percentiles (Spark `percentile` ≡ DuckDB
    // `quantile_cont`: both sort and linearly interpolate at p·(n−1))
    "q_percentiles" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"))
        .agg(
          rnd(expr("percentile(l_extendedprice, 0.25)"), 4).as("price_p25"),
          rnd(expr("percentile(l_extendedprice, 0.5)"), 4).as("price_p50"),
          rnd(expr("percentile(l_extendedprice, 0.75)"), 4).as("price_p75"),
          rnd(expr("percentile(l_quantity, 0.5)"), 4).as("qty_med"))
        .orderBy("l_returnflag")),

    // ---- moment statistics (both engines use numerically stable
    // single-pass central-moment updates; merge-order ulp drift absorbed
    // by 6-dp rounding). Skewness needs a dialect bridge: Spark returns
    // POPULATION g1, DuckDB SAMPLE skewness = g1·√(n(n−1))/(n−2) — the
    // exact algebraic transform is applied on the Spark side.
    "q_stats" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"))
        .agg(
          rnd(stddev_samp(col("l_quantity")), 6).as("sd_qty"),
          rnd(var_samp(col("l_discount")), 6).as("var_disc"),
          rnd(corr(col("l_quantity"), col("l_extendedprice")), 6).as("corr_qty_price"),
          rnd(covar_samp(col("l_quantity"), col("l_discount")), 6).as("cov_qty_disc"),
          rnd(skewness(col("l_quantity")) *
            sqrt(count(lit(1)).cast("double") * (count(lit(1)) - 1).cast("double")) /
            (count(lit(1)) - 2).cast("double"), 6).as("skew_qty"),
          // Spark kurtosis is population excess == DuckDB kurtosis_pop
          rnd(kurtosis(col("l_quantity")), 6).as("kurt_qty"))
        .orderBy("l_returnflag")),

    // ---- linear-regression aggregates (the fit-as-aggregate surface
    // both engines share) + deterministic string aggregation (sorted
    // distinct values so the concatenation order is engine-independent)
    "q_regression" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"))
        .agg(
          rnd(expr("regr_slope(l_extendedprice, l_quantity)"), 4).as("slope"),
          rnd(expr("regr_intercept(l_extendedprice, l_quantity)"), 4).as("icept"),
          rnd(expr("regr_r2(l_extendedprice, l_quantity)"), 6).as("r2"),
          expr("regr_count(l_extendedprice, l_quantity)").as("n"),
          array_join(array_sort(collect_set(col("l_linestatus"))), ",")
            .as("statuses"))
        .orderBy("l_returnflag")),

    // ---- rank-1 ALS factorization step (the alternating-least-squares
    // core of distributed factorization/completion engines — the
    // retrieved DisTenC ICDE 2018 line of work; Koren et al. 2009 for
    // the ALS algebra): factor the user × event_type rating matrix
    // (rating = summed value in exact CENTS) with rank 1 and ridge
    // λ = 1. With item factors initialized to 1, one full alternation
    // in EXACT fixed point — user solve x_u = Σr/(1+n_u) kept at MILLI
    // scale via BIGINT floor division (micro scale overflowed Σx² in
    // BIGINT on the very first sf0.01 run — x ~ 10³ ⇒ x_µ² ~ 10¹⁷ per
    // user; millis keep Σx_k² under 10¹⁶ at 10⁵ users/item), item
    // solve y_i = Σ(r·x)/(1+Σx²) with the numerator at scale 10⁵ and
    // denominator at 10⁶, widened through DECIMAL(38,0) for the final
    // 10⁷-scaled division (the Modularity discipline). No float ever
    // enters an order-varying aggregate. Scale shape: two
    // map-side-combined groupBys (cells → users → items) and one
    // user-keyed join — the classic distributed-ALS data layout where
    // each side shuffles on its own key once per half-step.
    "q_als_rank1_step" -> ((s, dir) => {
      // the rating aggregate feeds two plan branches (user init + item
      // solve) — materialize once (the oracle's `r AS MATERIALIZED`,
      // the Modularity deg-checkpoint discipline)
      val r = alsRatings(s, dir).localCheckpoint(true)
      alsItemSolve(r, alsUserInit(r)).orderBy("event_type")
    }),

    // ---- the SECOND full ALS alternation, composed on q_als_rank1_step
    // (the kmeans_step → kmeans_fit_unrolled pattern): user re-solve
    // against the step-1 item factors (x₂ = Σr·y/(1+Σy²), numerator at
    // scale 10⁸ = cents·micros, denominator at 10¹², the 10⁷-scaled
    // division widened through DECIMAL — N·10⁷ ~ 10²⁰ overflows BIGINT
    // at fixture magnitudes already), then the item re-solve (the same
    // N·10⁷ DIV (10⁶+Σx²) formula as step 1 — the item solve from
    // milli-scaled x is scale-invariant across iterations). AnalyticSpec
    // pins the ridge objective NON-INCREASING across all four
    // half-solves — the ALS convergence guarantee, visible through the
    // fixed point.
    "q_als_rank1_step2" -> ((s, dir) => {
      // r feeds FOUR branches here (y1's two + xu2 + the final solve)
      val r = alsRatings(s, dir).localCheckpoint(true)
      val y1 = alsItemSolve(r, alsUserInit(r)).select(
        col("event_type"), col("y_micros").as("y_m"))
      val xu2 = r.join(broadcast(y1), "event_type")
        .groupBy(col("user_id"))
        .agg(sum(col("r_c") * col("y_m")).as("n_u"),
          sum(col("y_m") * col("y_m")).as("sy2"))
        .select(col("user_id"),
          expr("""CAST(CAST(n_u AS DECIMAL(38,0)) * CAST(10000000 AS DECIMAL(38,0))
            |  DIV (CAST(1000000000000 AS DECIMAL(38,0)) + CAST(sy2 AS DECIMAL(38,0)))
            |  AS BIGINT)""".stripMargin).as("x_k"))
      alsItemSolve(r, xu2)
        .select(col("event_type"), col("n_users"),
          col("y_micros").as("y2_micros"))
        .orderBy("event_type")
    }),

    // ---- rank-2 ALS item half-solve (the r ≥ 2 generalization the
    // rank-1 pair stops short of — real recommender/feature
    // factorization needs per-key r×r normal equations): user factors
    // (x1, x2) from alsUserInit2, then each item's 2×2 ridge system
    // solved by exact BigInt-free Cramer entirely in decimal fixed
    // point (alsItemSolve2 scaladoc for scales and widening). Same
    // distributed-ALS layout as rank 1: one cells aggregate, one
    // user-keyed join, one item-keyed map-side-combined aggregate.
    "q_als_rank2_step" -> ((s, dir) => {
      val r = alsRatings(s, dir).localCheckpoint(true)
      AlsRank2.itemSolve2(r, AlsRank2.userInit2(r)).orderBy("event_type")
    }),

    // ---- the SECOND full rank-2 alternation (the q_als_rank1_step2
    // pattern at r = 2): user re-solve against the step-1 item factors
    // — per-user 2×2 ridge Cramer (alsUserSolve2; A sums run over the
    // user's ≤|items| ratings, so the normal equations stay tiny and
    // exact at any corpus scale), then the item re-solve through the
    // SAME alsItemSolve2 (milli x in, micro y out — the rank-2 scales
    // close over the alternation). The broadcast of the ≤|items|-row
    // factor table is the distributed-ALS production shape: the rating
    // matrix shuffles once per half-step on its own key, factors ride
    // the small side. AnalyticSpec pins the ridge objective
    // NON-INCREASING across all four rank-2 half-solves.
    "q_als_rank2_step2" -> ((s, dir) => {
      // r feeds four branches (init, step-1 solve, user re-solve, item
      // re-solve) — materialize once. Two fixed item solves IS
      // AlsRank2.unrolled(2): the step queries and the fit twins
      // share one alternation path by construction.
      val r = alsRatings(s, dir).localCheckpoint(true)
      AlsRank2.unrolled(r, itemSolves = 2).orderBy("event_type")
    }),

    // ---- the FIXED-ALTERNATION rank-2 ALS fit twin (the
    // kmeans_fit_unrolled pattern applied to factorization): THREE
    // item solves from the deterministic init — one more alternation
    // than q_als_rank2_step2, exactly replayable, so the oracle is the
    // step2 CTE chain extended by one alternation through the shared
    // als2AltCte builder. The free-convergence q_als_rank2_fit runs
    // this same alternation path under the exact-objective plateau
    // stop (AlsRank2.fit scaladoc).
    "q_als_rank2_fit_unrolled" -> ((s, dir) => {
      val r = alsRatings(s, dir).localCheckpoint(true)
      AlsRank2.unrolled(r, itemSolves = 3).orderBy("event_type")
    }),

    // ---- the FREE-CONVERGENCE rank-2 ALS fit (declared no-oracle —
    // the kmeans_fit pattern: alternation count is data-dependent).
    // Alternates exact half-solves until the integer ridge objective
    // J·10¹⁸'s relative improvement drops under 5% (the published ALS
    // relative-tolerance stop, exact in integers — AlsRank2.fit
    // scaladoc); output = the BEST-J alternation's item factors plus
    // the loop's bookkeeping (alternation of origin, alternations
    // executed, converged). AnalyticSpec pins the whole loop — factors,
    // counts, flag, objective ladder — against a driver BigInt replay.
    "q_als_rank2_fit" -> ((s, dir) => {
      val r = alsRatings(s, dir).localCheckpoint(true)
      val res = AlsRank2.fit(r)
      res.factors
        .withColumn("best_alt", lit(res.bestAlt))
        .withColumn("n_alt", lit(res.alternations))
        .withColumn("converged", lit(res.converged))
        .orderBy("event_type")
    }),

    // ---- date/time function family over o_orderdate
    "q_date_funcs" -> ((s, dir) =>
      Tables.orders(s, dir)
        .groupBy((year(col("o_orderdate")) * lit(100) + month(col("o_orderdate"))).as("ym"))
        .agg(
          count(lit(1)).as("n"),
          countDistinct(dayofmonth(col("o_orderdate"))).as("n_days"),
          datediff(to_date(max(col("o_orderdate"))), to_date(min(col("o_orderdate"))))
            .as("span_days"),
          (dayofweek(to_date(min(col("o_orderdate")))) - lit(1)).as("first_dow"),
          date_add(to_date(min(col("o_orderdate"))), 30).as("plus30"))
        .orderBy("ym")),

    // ---- array function family over the 64-dim embeddings (all narrow
    // per-row ops; digests scaled to integers — see QueryHelpers)
    "q_array_funcs" -> ((s, dir) =>
      Tables.embeddings(s, dir).select(
        col("vec_id"),
        size(col("embedding")).as("dim"),
        floor(element_at(col("embedding"), 1).cast("double") * 1e6 + 0.5)
          .cast("long").as("first_1e6"),
        floor(array_max(col("embedding")).cast("double") * 1e6 + 0.5)
          .cast("long").as("max_1e6"),
        floor(element_at(sort_array(col("embedding"), asc = false), 2).cast("double") * 1e6 + 0.5)
          .cast("long").as("second_1e6"),
        floor(aggregate(col("embedding"), lit(0.0d),
          (acc, x) => acc + x.cast("double")) * 1e6 + 0.5)
          .cast("long").as("sum_1e6"))
        .orderBy("vec_id")),

    // ---- explicit window FRAMES (ROWS moving windows, value-RANGE
    // windows, forward-looking frames) — the frame grammar
    // q_window_suite doesn't touch. The window text is the dialect
    // intersection, written once via expr() and reused verbatim as the
    // oracle. ROWS frames order by the unique o_orderkey (deterministic
    // membership); the RANGE frame is defined by the o_totalprice VALUE,
    // so tie order cannot change it.
    "q_window_frames" -> ((s, dir) =>
      Tables.orders(s, dir).select(
        col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"),
        rnd(expr("avg(o_totalprice) OVER (PARTITION BY o_orderpriority ORDER BY o_orderkey ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)"), 4).as("mov_avg4"),
        expr("count(*) OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice RANGE BETWEEN 1000.0 PRECEDING AND CURRENT ROW)").as("cnt_1k"),
        rnd(expr("sum(o_totalprice) OVER (PARTITION BY o_orderpriority ORDER BY o_orderkey ROWS BETWEEN CURRENT ROW AND 2 FOLLOWING)"), 4).as("fwd_sum"),
        expr("first_value(o_orderkey) OVER (PARTITION BY o_orderpriority ORDER BY o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)").as("first_k"))
        .orderBy("o_orderkey")),

    // ---- bitwise function family (scalar &,|,^,shifts,bit_count +
    // aggregate bit_and/bit_or/bit_xor) over exact integer keys — no
    // float slack anywhere. Dialect note: Spark scalar xor is the ^
    // operator, DuckDB's is the xor() function; DuckDB bit_count returns
    // TINYINT (oracle casts to Spark's INT).
    "q_bitwise" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .select(col("l_returnflag"),
          col("l_suppkey").cast("long").as("sk"),
          expr("l_orderkey & CAST(255 AS BIGINT)").as("lo255"),
          expr("(l_orderkey >> 4) | CAST(l_linenumber AS BIGINT)").as("orshift"),
          expr("l_orderkey ^ CAST(l_partkey AS BIGINT)").as("xr"),
          expr("CAST(bit_count(l_orderkey) AS INT)").as("bc"))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          expr("bit_and(sk)").as("and_sk"),
          expr("bit_or(sk)").as("or_sk"),
          expr("bit_xor(xr)").as("xor_all"),
          sum(col("bc").cast("long")).as("sum_bits"),
          max(col("orshift")).as("max_os"),
          min(col("lo255")).as("min_lo"))
        .orderBy("l_returnflag")),

    // ---- null-handling family: nullif manufactures NULLs from real
    // data, then coalesce/greatest/least/IS NULL consume them (both
    // engines skip NULLs in greatest/least)
    "q_null_funcs" -> ((s, dir) =>
      Tables.orders(s, dir).select(
        col("o_orderkey"),
        expr("nullif(o_custkey % 7, CAST(3 AS BIGINT))").as("k7"),
        expr("coalesce(nullif(o_custkey % 7, CAST(3 AS BIGINT)), CAST(-1 AS BIGINT))").as("k7c"),
        expr("greatest(nullif(o_custkey % 7, CAST(3 AS BIGINT)), CAST(2 AS BIGINT))").as("g2"),
        expr("least(nullif(o_custkey % 7, CAST(3 AS BIGINT)), CAST(2 AS BIGINT))").as("l2"),
        expr("CAST(nullif(o_custkey % 7, CAST(3 AS BIGINT)) IS NULL AS INT)").as("is_n"),
        expr("nullif(o_orderpriority, '3-MEDIUM')").as("pri_n"))
        .orderBy("o_orderkey")),

    // ---- scalar subquery: orders above the (rounded) global average —
    // the 1-row aggregate is broadcast, never recomputed per row
    "q_scalar_subquery" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
      val avgP = o.agg(rnd(avg(col("o_totalprice")), 4).as("avg_price"))
      o.join(broadcast(avgP))
        .where(col("o_totalprice") > col("avg_price"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_above"),
          rnd(max(col("o_totalprice") - col("avg_price")), 4).as("max_over"))
        .orderBy("o_orderpriority")
    }),

    // ---- string-function family over part names (the subset whose
    // semantics are identical across engines; instr≡strpos, lpad pads
    // with the given char, translate maps char-for-char)
    "q_string_funcs" -> ((s, dir) =>
      Tables.part(s, dir).select(
        col("p_partkey"),
        upper(col("p_name")).as("up"),
        trim(col("p_name")).as("tr"),
        lpad(col("p_name"), 30, ".").as("pad"),
        reverse(col("p_name")).as("rev"),
        substring(col("p_name"), 3, 8).as("mid"),
        instr(col("p_name"), "a").as("pos_a"),
        translate(col("p_name"), "aeiou", "AEIOU").as("tl"),
        regexp_extract(col("p_name"), "([a-z]+)", 1).as("first_word"),
        concat_ws("|", col("p_brand"), col("p_type")).as("bt"))
        .orderBy("p_partkey")),

    // ---- full outer join: supplier-nation profile vs customer-nation
    // profile, each side filtered so both null patterns occur
    "q_full_outer" -> ((s, dir) => {
      val sup = Tables.supplier(s, dir).where(col("s_acctbal") > 0)
        .groupBy(col("s_nationkey").as("nationkey"))
        .agg(count(lit(1)).as("n_supp"))
      val cust = Tables.customer(s, dir).where(col("c_acctbal") > 9000)
        .groupBy(col("c_nationkey").as("nationkey"))
        .agg(count(lit(1)).as("n_cust"))
      sup.join(cust, Seq("nationkey"), "full_outer")
        .select(col("nationkey"), col("n_supp"), col("n_cust"))
        .orderBy("nationkey")
    }),

    // ---- left outer join with a filtered build side (null-extension on
    // the probe side; completes the pinned join-type matrix: inner, semi,
    // anti, full outer, cross, left)
    "q_left_join" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
      val bigCust = Tables.customer(s, dir).where(col("c_acctbal") > 9000)
        .select(col("c_custkey"), col("c_mktsegment"))
      o.join(broadcast(bigCust), o("o_custkey") === bigCust("c_custkey"), "left")
        .groupBy(coalesce(col("c_mktsegment"), lit("(none)")).as("segment"))
        .agg(count(lit(1)).as("n"),
          rnd(sum(col("o_totalprice")) / 1e6, 4).as("rev_m"))
        .orderBy("segment")
    }),

    // ---- right outer join (the mirrored null-extension; with q_left_join
    // every SQL join type is oracle-pinned)
    "q_right_join" -> ((s, dir) => {
      val bigCust = Tables.customer(s, dir).where(col("c_acctbal") > 9000)
        .select(col("c_custkey"), col("c_mktsegment"))
      val o = Tables.orders(s, dir)
      bigCust.join(o, bigCust("c_custkey") === o("o_custkey"), "right")
        .groupBy(coalesce(col("c_mktsegment"), lit("(none)")).as("segment"))
        .agg(count(lit(1)).as("n"))
        .orderBy("segment")
    }),

    // ---- positional explode (UDTF surface): characters with their
    // ordinal; DuckDB twin = unnest of a struct list (WITH ORDINALITY
    // semantics)
    "q_posexplode" -> ((s, dir) =>
      Tables.nation(s, dir)
        .select(col("n_nationkey"),
          posexplode(transform(
            sequence(lit(1), length(col("n_name"))),
            i => col("n_name").substr(i, lit(1)))).as(Seq("pos", "ch")))
        .orderBy("n_nationkey", "pos")),

    // ---- batch sessionization (30-min gap) — lag + running sum over one
    // user_id shuffle; integer ns arithmetic end-to-end. This is the
    // batch twin of streaming.EventStream's flatMapGroupsWithState
    // sessionizer.
    "q_sessionize" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
      val run = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, dir)
        .select(col("user_id"), expr("ts_ns DIV 1000").as("ts_us"), col("event_id"))
        .withColumn("new_s",
          when(col("ts_us") - lag(col("ts_us"), 1).over(w) > lit(SessionGapUs), 1)
            .when(lag(col("ts_us"), 1).over(w).isNull, 1)
            .otherwise(0))
        .withColumn("session_id", sum(col("new_s")).over(run))
        .groupBy(col("user_id"), col("session_id"))
        .agg(count(lit(1)).as("n_events"),
          min(col("ts_us")).as("start_us"),
          max(col("ts_us")).as("end_us"))
        // integer division (DIV / //): `/` would be float division on both
        // engines, and DuckDB CAST(double→BIGINT) rounds where Spark
        // truncates
        .withColumn("duration_s", expr("(end_us - start_us) DIV 1000000"))
        .drop("end_us")
        .orderBy("user_id", "session_id")
    }),

    // Max-concurrency sweep-line over session intervals: +1 at each
    // session start, −1 just past its inclusive end, running sum ordered
    // by (ts, delta) — ends apply before coincident starts, so
    // back-to-back sessions never phantom-overlap. The global running
    // sum is a single-partition window by nature; at 100 TB the sweep
    // shards by day with per-shard carry-in offsets (one tiny second
    // pass) — the deltas explode from one pass over the session table.
    // Peak value and its earliest timestamp are order-invariant within
    // tied (ts, delta) groups, so the answer is deterministic.
    // The sweep itself runs one GLOBAL unpartitioned window — correct
    // here because the delta stream is two rows per session, orders of
    // magnitude below the funnel threshold. The 100-TB path for a
    // delta stream that is itself huge is the range-partitioned
    // two-pass prefix sum in [[graft.operators.SweepLine.runningSum]];
    // AnalyticSpec proves the two forms agree on this exact stream.
    "q_concurrency" -> ((s, dir) => {
      val deltas = concurrencyDeltas(s, dir)
      val sweep = Window.orderBy(col("ts"), col("delta"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      deltas.withColumn("cur", sum(col("delta")).over(sweep))
        .groupBy(col("cur")).agg(min(col("ts")).as("first_ts_us"))
        .orderBy(col("cur").desc).limit(1)
        .select(col("cur").as("max_concurrent"), col("first_ts_us"))
    }),

    // the SAME answer through the 100-TB sweep path: SweepLine's
    // range-partitioned two-pass prefix sum replaces the global window
    // (per-bucket parallel local sums + a B-row offset pass). Registered
    // first-class so the scale variant carries its own driver-gate row —
    // the oracle is IDENTICAL to q_concurrency's because the two forms
    // are exactly equal (AnalyticSpec proves it row-for-row on
    // adversarial streams; the gate proves it cross-engine here).
    "q_concurrency_sweep" -> ((s, dir) =>
      graft.operators.SweepLine
        .runningSum(concurrencyDeltas(s, dir), nBuckets = 32)
        .groupBy(col("cur")).agg(min(col("ts")).as("first_ts_us"))
        .orderBy(col("cur").desc).limit(1)
        .select(col("cur").as("max_concurrent"), col("first_ts_us"))),

    // EWMA (alpha = 0.25) of each user's value series — the classic
    // feature-engineering op with a SEQUENTIAL dependency no window
    // frame expresses. Realized as an ordered array fold (higher-order
    // aggregate): collect_list → array_sort by (ts, id) → left fold
    // seeded with the first value. Both engines fold the identical
    // value sequence with the identical IEEE ops in the identical
    // order, so the result is bit-exact with NO rounding. Scale: one
    // hash shuffle by user; per-user state is that user's events only
    // (array fold, no cross-user sort).
    "q_ewma" -> ((s, dir) =>
      Tables.events(s, dir)
        .select(col("user_id"), expr("ts_ns DIV 1000").as("ts_us"),
          col("event_id"), col("value"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n"),
          array_sort(collect_list(struct(col("ts_us"), col("event_id"),
            col("value")))).as("vs"))
        .select(col("user_id"), col("n"),
          expr("""aggregate(slice(vs, 2, greatest(size(vs) - 1, 0)),
                    vs[0].value,
                    (acc, x) -> acc * 0.75D + x.value * 0.25D)""").as("ewma"))
        .orderBy("user_id")))

  /** Shared oracle of q_concurrency AND q_concurrency_sweep: the two
    * engine paths (global window vs range-partitioned two-pass prefix
    * sum) are exactly equal, so one SQL text gates both.
    */
  private lazy val concurrencySql: String =
    s"""WITH e AS (
       |  SELECT user_id, epoch_us(ts) AS ts_us, event_id FROM events
       |), flagged AS (
       |  SELECT user_id, ts_us, event_id,
       |    CASE WHEN ts_us - lag(ts_us, 1) OVER w > ${SessionGapUs} THEN 1
       |         WHEN lag(ts_us, 1) OVER w IS NULL THEN 1
       |         ELSE 0 END AS new_s
       |  FROM e
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
       |), sess AS (
       |  SELECT user_id,
       |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
       |      ROWS UNBOUNDED PRECEDING) AS session_id,
       |    ts_us
       |  FROM flagged
       |), iv AS (
       |  SELECT min(ts_us) AS s, max(ts_us) AS e
       |  FROM sess GROUP BY user_id, session_id
       |), deltas AS (
       |  SELECT s AS ts, 1 AS delta FROM iv
       |  UNION ALL
       |  SELECT e + 1 AS ts, -1 AS delta FROM iv
       |), r AS (
       |  SELECT CAST(sum(delta) OVER (ORDER BY ts, delta
       |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cur, ts
       |  FROM deltas
       |)
       |SELECT cur AS max_concurrent, min(ts) AS first_ts_us
       |FROM r GROUP BY cur ORDER BY cur DESC LIMIT 1""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "q_heavy_hitters" ->
      s"""WITH n AS (SELECT count(*) AS n_total FROM events
         |           WHERE user_id IS NOT NULL)
         |SELECT user_id, count(*) AS freq, n.n_total,
         |  ${rndSql("CAST(count(*) AS DOUBLE) / n.n_total", 6)} AS share
         |FROM events, n
         |WHERE user_id IS NOT NULL
         |GROUP BY user_id, n.n_total
         |HAVING count(*) * 150 > n.n_total
         |ORDER BY user_id""".stripMargin,

    "q_market_basket" ->
      s"""WITH op AS (
         |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS p FROM lineitem
         |), n AS (SELECT count(DISTINCT ok) AS n_orders FROM op),
         |item AS (SELECT p, count(*) AS cnt FROM op GROUP BY p),
         |pc AS (
         |  SELECT a.p AS part_a, b.p AS part_b, count(*) AS cnt_ab
         |  FROM op a JOIN op b ON a.ok = b.ok AND a.p < b.p
         |  GROUP BY 1, 2 HAVING count(*) >= 2
         |)
         |SELECT part_a, part_b, cnt_ab,
         |  ${rndSql("CAST(cnt_ab AS DOUBLE) / n.n_orders", 6)} AS support,
         |  ${rndSql("CAST(cnt_ab AS DOUBLE) / ia.cnt", 6)} AS conf_ab,
         |  ${rndSql("(CAST(cnt_ab AS DOUBLE) * n.n_orders) / (ia.cnt * ib.cnt)", 6)} AS lift
         |FROM pc, n
         |JOIN item ia ON ia.p = pc.part_a
         |JOIN item ib ON ib.p = pc.part_b
         |ORDER BY part_a, part_b""".stripMargin,

    "q_heavy_hitters_cms" -> {
      import graft.operators.{CountMin, Dedup}
      val w = 512
      val pos = CountMin.positionSql("hm", w)
      val cmsCtes = pos.zipWithIndex.map { case (p, j) =>
        s"cms$j AS MATERIALIZED (SELECT $p AS pos, count(*) AS c FROM rows GROUP BY 1)"
      }.mkString(",\n")
      val joins = pos.zipWithIndex.map { case (p, j) =>
        s"JOIN cms$j c$j ON c$j.pos = ${p.replace("hm", "k.hm")}"
      }.mkString("\n  ")
      val ls = (0 until CountMin.Depth).map(j => s"c$j.c").mkString(", ")
      s"""WITH rows AS (
         |  SELECT user_id % ${Dedup.MinhashP} AS hm FROM events
         |  WHERE user_id IS NOT NULL
         |),
         |$cmsCtes,
         |k AS (SELECT user_id, user_id % ${Dedup.MinhashP} AS hm,
         |    count(*) AS exact_cnt
         |  FROM events WHERE user_id IS NOT NULL GROUP BY 1, 2)
         |SELECT k.user_id, k.exact_cnt, least($ls) AS est_cnt
         |FROM k
         |  $joins
         |ORDER BY k.user_id""".stripMargin
    },

    // identical grids per side, per-row inner products, min across rows
    "q_join_size_cms" -> {
      import graft.operators.{CountMin, Dedup}
      val w = 65536
      val pos = CountMin.positionSql("hm", w)
      def grid(side: String) = pos.zipWithIndex.map { case (p, j) =>
        s"$side$j AS MATERIALIZED (SELECT $p AS pos, count(*) AS c FROM $side GROUP BY 1)"
      }.mkString(",\n")
      val ips = (0 until CountMin.Depth).map { j =>
        s"ip$j AS (SELECT CAST(sum(a.c * b.c) AS BIGINT) AS v FROM ra$j a JOIN sa$j b ON a.pos = b.pos)"
      }.mkString(",\n")
      val leastArgs = (0 until CountMin.Depth)
        .map(j => s"(SELECT v FROM ip$j)").mkString(", ")
      s"""WITH ra AS (
         |  SELECT l_orderkey % ${Dedup.MinhashP} AS hm FROM lineitem
         |  WHERE l_orderkey IS NOT NULL
         |), sa AS (
         |  SELECT o_orderkey % ${Dedup.MinhashP} AS hm FROM orders
         |  WHERE o_orderkey IS NOT NULL
         |),
         |${grid("ra")},
         |${grid("sa")},
         |$ips,
         |exact AS (
         |  SELECT count(*) AS exact_size
         |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
         |)
         |SELECT exact_size, least($leastArgs) AS est_size,
         |  least($leastArgs) >= exact_size AS upper_bound_ok
         |FROM exact""".stripMargin
    },

    "q_mode" ->
      """WITH c AS (
        |  SELECT l_returnflag, l_quantity, count(*) AS cnt
        |  FROM lineitem GROUP BY 1, 2
        |), r AS (
        |  SELECT l_returnflag, l_quantity, cnt,
        |    row_number() OVER (PARTITION BY l_returnflag
        |      ORDER BY cnt DESC, l_quantity DESC) AS rk,
        |    sum(cnt) OVER (PARTITION BY l_returnflag) AS n_rows
        |  FROM c
        |)
        |SELECT l_returnflag, l_quantity AS mode_qty, cnt AS n_mode,
        |  CAST(n_rows AS BIGINT) AS n_rows
        |FROM r WHERE rk = 1 ORDER BY l_returnflag""".stripMargin,

    "q_window_suite" ->
      s"""SELECT o_orderpriority, o_orderkey, o_totalprice,
         |  CAST(row_number() OVER w AS INT) AS rn,
         |  CAST(rank() OVER w AS INT) AS rnk,
         |  CAST(dense_rank() OVER w AS INT) AS drnk,
         |  CAST(ntile(4) OVER w AS INT) AS quartile,
         |  ${rndSql("percent_rank() OVER w", 6)} AS pct_rank,
         |  lag(o_totalprice, 1) OVER w AS prev_price,
         |  lead(o_orderkey, 1) OVER w AS next_key,
         |  first_value(o_orderkey) OVER w AS top_key
         |FROM orders
         |WINDOW w AS (PARTITION BY o_orderpriority
         |             ORDER BY o_totalprice DESC, o_orderkey)
         |ORDER BY o_orderpriority, rn""".stripMargin,

    "q_pivot" ->
      """SELECT l_linestatus,
        |  sum(CASE WHEN l_returnflag = 'A' THEN l_quantity END) AS "A",
        |  sum(CASE WHEN l_returnflag = 'N' THEN l_quantity END) AS "N",
        |  sum(CASE WHEN l_returnflag = 'R' THEN l_quantity END) AS "R"
        |FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin,

    "q_unpivot" ->
      """WITH wide AS (
        |  SELECT l_returnflag,
        |    CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
        |    CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
        |         AS BIGINT) AS sum_price_cents,
        |    CAST(sum(CAST(floor(l_discount * 100 + 0.5) AS BIGINT))
        |         AS BIGINT) AS sum_disc_pts
        |  FROM lineitem GROUP BY l_returnflag
        |)
        |SELECT l_returnflag, measure, value FROM (
        |  SELECT l_returnflag, 'sum_qty' AS measure, sum_qty AS value
        |  FROM wide
        |  UNION ALL
        |  SELECT l_returnflag, 'sum_price_cents', sum_price_cents FROM wide
        |  UNION ALL
        |  SELECT l_returnflag, 'sum_disc_pts', sum_disc_pts FROM wide
        |)
        |ORDER BY l_returnflag, measure""".stripMargin,

    "q_intersect" ->
      """SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        |INTERSECT
        |SELECT o_custkey FROM orders WHERE o_orderpriority = '2-HIGH'
        |ORDER BY o_custkey""".stripMargin,

    "q_except" ->
      """SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        |EXCEPT
        |SELECT o_custkey FROM orders WHERE o_orderpriority = '2-HIGH'
        |ORDER BY o_custkey""".stripMargin,

    // ALS twin: same cents rating, same BIGINT milli user solve
    // (`//` == Spark DIV, truncation semantics verified equal), same
    // widened 10⁷-scaled item division (HUGEINT == decimal
    // IntegralDivide); DuckDB sum(BIGINT) returns HUGEINT — cast back
    "q_als_rank1_step" ->
      s"""WITH $alsCtes
         |SELECT event_type, CAST(n_users AS BIGINT) AS n_users,
         |  y_m AS y_micros
         |FROM y1 ORDER BY event_type""".stripMargin,

    // step-2 twin: the shared step-1 chain (alsCtes — the
    // shared-builder discipline), then the user re-solve against y1
    // (scales 10⁸/10¹², HUGEINT-widened 10⁷ division) and the
    // identical scale-invariant item solve
    "q_als_rank1_step2" ->
      s"""WITH $alsCtes,
         |xu2 AS (SELECT r.user_id,
         |    CAST((CAST(sum(r.r_c * y1.y_m) AS HUGEINT) * 10000000) //
         |      (1000000000000::HUGEINT + CAST(sum(y1.y_m * y1.y_m) AS BIGINT))
         |      AS BIGINT) AS x_k
         |  FROM r JOIN y1 USING (event_type) GROUP BY r.user_id),
         |yi2 AS (SELECT r.event_type, count(*) AS n_users,
         |    CAST(sum(r.r_c * xu2.x_k) AS BIGINT) AS n_i,
         |    CAST(sum(xu2.x_k * xu2.x_k) AS BIGINT) AS sx2
         |  FROM r JOIN xu2 USING (user_id) GROUP BY r.event_type)
         |SELECT event_type, CAST(n_users AS BIGINT) AS n_users,
         |  CAST((n_i::HUGEINT * 10000000) // (1000000::HUGEINT + sx2)
         |    AS BIGINT) AS y2_micros
         |FROM yi2 ORDER BY event_type""".stripMargin,

    // rank-2 twin: same cents ratings and milli x1 chain as rank 1,
    // x2 = 1 + user_id % 199 milli, per-item 2×2 Cramer with the
    // HUGEINT products mirroring Spark's DECIMAL(38,0) widening and
    // `//` ≡ DIV truncation (verified equal on negatives)
    "q_als_rank2_step" ->
      s"""WITH $als2Ctes
         |SELECT event_type, n_users, y1_m AS y1_micros, y2_m AS y2_micros
         |FROM y2s ORDER BY event_type""".stripMargin,

    // the second rank-2 alternation: per-USER 2×2 ridge Cramer against
    // the step-1 factors (A at micros² scale + λ·10¹², b at
    // cents·micros, x out in millis — adj·b·10⁷ ~ 10³⁷ inside
    // HUGEINT/DECIMAL(38,0)), then the identical per-item Cramer over
    // the re-solved milli factors
    "q_als_rank2_step2" ->
      s"""WITH $als2Ctes,
         |${als2AltCte(2, "y2s")}
         |SELECT event_type, n_users, y1_m AS y1_micros, y2_m AS y2_micros
         |FROM ya2 ORDER BY event_type""".stripMargin,

    // fit twin: the step2 chain extended by ONE more alternation
    // through the same builder — three item solves total, matching
    // AlsRank2.unrolled(3) solve for solve
    "q_als_rank2_fit_unrolled" ->
      s"""WITH $als2Ctes,
         |${als2AltCte(2, "y2s")},
         |${als2AltCte(3, "ya2")}
         |SELECT event_type, n_users, y1_m AS y1_micros, y2_m AS y2_micros
         |FROM ya3 ORDER BY event_type""".stripMargin,

    "q_union_distinct" ->
      """SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        |UNION
        |SELECT o_custkey FROM orders WHERE o_orderpriority = '2-HIGH'
        |ORDER BY o_custkey""".stripMargin,

    "q_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS cnt,
        |  sum(l_quantity) AS sum_qty,
        |  CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        |ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,

    "q_percentiles" ->
      s"""SELECT l_returnflag,
         |  ${rndSql("quantile_cont(l_extendedprice, 0.25)", 4)} AS price_p25,
         |  ${rndSql("quantile_cont(l_extendedprice, 0.5)", 4)} AS price_p50,
         |  ${rndSql("quantile_cont(l_extendedprice, 0.75)", 4)} AS price_p75,
         |  ${rndSql("quantile_cont(l_quantity, 0.5)", 4)} AS qty_med
         |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_stats" ->
      s"""SELECT l_returnflag,
         |  ${rndSql("stddev_samp(l_quantity)", 6)} AS sd_qty,
         |  ${rndSql("var_samp(l_discount)", 6)} AS var_disc,
         |  ${rndSql("corr(l_quantity, l_extendedprice)", 6)} AS corr_qty_price,
         |  ${rndSql("covar_samp(l_quantity, l_discount)", 6)} AS cov_qty_disc,
         |  ${rndSql("skewness(l_quantity)", 6)} AS skew_qty,
         |  ${rndSql("kurtosis_pop(l_quantity)", 6)} AS kurt_qty
         |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_regression" ->
      s"""SELECT l_returnflag,
         |  ${rndSql("regr_slope(l_extendedprice, l_quantity)", 4)} AS slope,
         |  ${rndSql("regr_intercept(l_extendedprice, l_quantity)", 4)} AS icept,
         |  ${rndSql("regr_r2(l_extendedprice, l_quantity)", 6)} AS r2,
         |  CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n,
         |  string_agg(DISTINCT l_linestatus, ',' ORDER BY l_linestatus) AS statuses
         |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_date_funcs" ->
      """SELECT CAST(EXTRACT(year FROM o_orderdate) * 100
        |            + EXTRACT(month FROM o_orderdate) AS INT) AS ym,
        |  count(*) AS n,
        |  CAST(count(DISTINCT EXTRACT(day FROM o_orderdate)) AS BIGINT) AS n_days,
        |  CAST(date_diff('day', CAST(min(o_orderdate) AS DATE),
        |                 CAST(max(o_orderdate) AS DATE)) AS INT) AS span_days,
        |  CAST(dayofweek(CAST(min(o_orderdate) AS DATE)) AS INT) AS first_dow,
        |  CAST(min(o_orderdate) AS DATE) + 30 AS plus30
        |FROM orders GROUP BY ym ORDER BY ym""".stripMargin,

    "q_array_funcs" ->
      """SELECT vec_id,
        |  CAST(len(embedding) AS INT) AS dim,
        |  CAST(floor(CAST(embedding[1] AS DOUBLE) * 1e6 + 0.5) AS BIGINT) AS first_1e6,
        |  CAST(floor(CAST(list_max(embedding) AS DOUBLE) * 1e6 + 0.5) AS BIGINT) AS max_1e6,
        |  CAST(floor(CAST(list_sort(embedding, 'DESC')[2] AS DOUBLE) * 1e6 + 0.5) AS BIGINT) AS second_1e6,
        |  CAST(floor(list_aggregate(list_transform(embedding,
        |         x -> CAST(x AS DOUBLE)), 'sum') * 1e6 + 0.5) AS BIGINT) AS sum_1e6
        |FROM embeddings ORDER BY vec_id""".stripMargin,

    "q_window_frames" ->
      s"""SELECT o_orderkey, o_orderpriority, o_totalprice,
         |  ${rndSql("avg(o_totalprice) OVER (PARTITION BY o_orderpriority ORDER BY o_orderkey ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)", 4)} AS mov_avg4,
         |  count(*) OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice RANGE BETWEEN 1000.0 PRECEDING AND CURRENT ROW) AS cnt_1k,
         |  ${rndSql("sum(o_totalprice) OVER (PARTITION BY o_orderpriority ORDER BY o_orderkey ROWS BETWEEN CURRENT ROW AND 2 FOLLOWING)", 4)} AS fwd_sum,
         |  first_value(o_orderkey) OVER (PARTITION BY o_orderpriority ORDER BY o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_k
         |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q_bitwise" ->
      """SELECT l_returnflag, count(*) AS n,
        |  bit_and(CAST(l_suppkey AS BIGINT)) AS and_sk,
        |  bit_or(CAST(l_suppkey AS BIGINT)) AS or_sk,
        |  bit_xor(xor(l_orderkey, CAST(l_partkey AS BIGINT))) AS xor_all,
        |  CAST(sum(bit_count(l_orderkey)) AS BIGINT) AS sum_bits,
        |  max((l_orderkey >> 4) | CAST(l_linenumber AS BIGINT)) AS max_os,
        |  min(l_orderkey & CAST(255 AS BIGINT)) AS min_lo
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_null_funcs" ->
      """SELECT o_orderkey,
        |  nullif(o_custkey % 7, CAST(3 AS BIGINT)) AS k7,
        |  coalesce(nullif(o_custkey % 7, CAST(3 AS BIGINT)), CAST(-1 AS BIGINT)) AS k7c,
        |  greatest(nullif(o_custkey % 7, CAST(3 AS BIGINT)), CAST(2 AS BIGINT)) AS g2,
        |  least(nullif(o_custkey % 7, CAST(3 AS BIGINT)), CAST(2 AS BIGINT)) AS l2,
        |  CAST(nullif(o_custkey % 7, CAST(3 AS BIGINT)) IS NULL AS INT) AS is_n,
        |  nullif(o_orderpriority, '3-MEDIUM') AS pri_n
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q_scalar_subquery" ->
      s"""WITH a AS (SELECT ${rndSql("avg(o_totalprice)", 4)} AS avg_price FROM orders)
         |SELECT o_orderpriority, count(*) AS n_above,
         |  ${rndSql("max(o_totalprice - avg_price)", 4)} AS max_over
         |FROM orders, a WHERE o_totalprice > avg_price
         |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q_string_funcs" ->
      """SELECT p_partkey,
        |  upper(p_name) AS up,
        |  trim(p_name) AS tr,
        |  lpad(p_name, 30, '.') AS pad,
        |  reverse(p_name) AS rev,
        |  substr(p_name, 3, 8) AS mid,
        |  CAST(strpos(p_name, 'a') AS INT) AS pos_a,
        |  translate(p_name, 'aeiou', 'AEIOU') AS tl,
        |  coalesce(regexp_extract(p_name, '([a-z]+)', 1), '') AS first_word,
        |  concat_ws('|', p_brand, p_type) AS bt
        |FROM part ORDER BY p_partkey""".stripMargin,

    "q_full_outer" ->
      """SELECT coalesce(s.nationkey, c.nationkey) AS nationkey,
        |  s.n_supp, c.n_cust
        |FROM (SELECT s_nationkey AS nationkey, count(*) AS n_supp
        |      FROM supplier WHERE s_acctbal > 0 GROUP BY 1) s
        |FULL OUTER JOIN
        |     (SELECT c_nationkey AS nationkey, count(*) AS n_cust
        |      FROM customer WHERE c_acctbal > 9000 GROUP BY 1) c
        |  ON s.nationkey = c.nationkey
        |ORDER BY nationkey""".stripMargin,

    "q_left_join" ->
      s"""SELECT coalesce(c_mktsegment, '(none)') AS segment,
         |  count(*) AS n, ${rndSql("sum(o_totalprice) / 1e6", 4)} AS rev_m
         |FROM orders
         |LEFT JOIN (SELECT c_custkey, c_mktsegment FROM customer
         |           WHERE c_acctbal > 9000) c ON o_custkey = c_custkey
         |GROUP BY segment ORDER BY segment""".stripMargin,

    "q_right_join" ->
      """SELECT coalesce(c_mktsegment, '(none)') AS segment, count(*) AS n
        |FROM (SELECT c_custkey, c_mktsegment FROM customer
        |      WHERE c_acctbal > 9000) c
        |RIGHT JOIN orders ON c_custkey = o_custkey
        |GROUP BY segment ORDER BY segment""".stripMargin,

    "q_posexplode" ->
      """WITH t AS (
        |  SELECT n_nationkey,
        |    unnest(list_transform(generate_series(1, length(n_name)),
        |      i -> {pos: CAST(i - 1 AS INT), ch: substr(n_name, CAST(i AS INT), 1)})) AS u
        |  FROM nation
        |)
        |SELECT n_nationkey, u.pos AS pos, u.ch AS ch FROM t
        |ORDER BY n_nationkey, pos""".stripMargin,

    "q_sessionize" ->
      s"""WITH e AS (
         |  SELECT user_id, epoch_us(ts) AS ts_us, event_id FROM events
         |), flagged AS (
         |  SELECT user_id, ts_us, event_id,
         |    CASE WHEN ts_us - lag(ts_us, 1) OVER w > ${SessionGapUs} THEN 1
         |         WHEN lag(ts_us, 1) OVER w IS NULL THEN 1
         |         ELSE 0 END AS new_s
         |  FROM e
         |  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
         |), sessions AS (
         |  SELECT user_id, ts_us,
         |    CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
         |  FROM flagged
         |)
         |SELECT user_id, session_id, count(*) AS n_events,
         |  min(ts_us) AS start_us,
         |  (max(ts_us) - min(ts_us)) // 1000000 AS duration_s
         |FROM sessions GROUP BY user_id, session_id
         |ORDER BY user_id, session_id""".stripMargin,

    "q_concurrency" -> concurrencySql,
    // exact equality with the global-window form is the point of the
    // sweep variant — one oracle text, two engine paths
    "q_concurrency_sweep" -> concurrencySql,

    // list() with ORDER BY = Spark's array_sort(collect_list(struct));
    // list_reduce folds left seeded with the first element, exactly the
    // Spark slice-fold — identical op order, bit-exact doubles
    "q_ewma" ->
      """SELECT user_id, count(*) AS n,
        |  list_reduce(list(value ORDER BY epoch_us(ts), event_id),
        |    (acc, v) -> acc * 0.75 + v * 0.25) AS ewma
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin)
}
