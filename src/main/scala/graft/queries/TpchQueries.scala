package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.queries.QueryHelpers._

/** TPC-H-shaped multi-way join queries (Q3/Q5 adapted to the fixture
  * schemas — orders has no shippriority; supplier joins through
  * s_nationkey = c_nationkey as in Q5). These exercise what none of the
  * single-join queries do: 3-6 table join ordering, broadcast selection
  * for several dims at once, and selective timestamp predicates that
  * must reach the parquet scans.
  */
object TpchQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Q1 in full: the pricing-summary report — 4 sums (incl. the
    // two-factor charge), 3 avgs, count, shipdate bracket pushed to the
    // scan. (q1_agg remains the round-1 reduced form.)
    // The two product sums run in EXACT integer-cents space: money
    // columns are DECIMAL in the TPC-H spec, and a float product sum
    // rounded to 2dp can land ON the rounding boundary at volume (one
    // derived-sf1.0 row measured .345 — the two engines' summation
    // orders then disagree in the last digit). Cents × percent ×
    // percent is exact in BIGINT (≤ ~2e11/row, sums to ~1.2e18 at 6M
    // rows — within Long; a 100-TB run would widen to DECIMAL(38)),
    // integer sums are order-free, and the final half-up rounding is a
    // single exact integer op on both engines.
    "q_tpch_q1" -> ((s, dir) => {
      val epc = floor(col("l_extendedprice") * 100 + lit(0.5)).cast("long")
      val dpc = floor(col("l_discount") * 100 + lit(0.5)).cast("long")
      val tpc = floor(col("l_tax") * 100 + lit(0.5)).cast("long")
      Tables.lineitem(s, dir)
        .where(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          rnd(sum(col("l_quantity")), 2).as("sum_qty"),
          rnd(sum(col("l_extendedprice")), 2).as("sum_base_price"),
          sum(epc * (lit(100L) - dpc)).as("sdc"),
          sum(epc * (lit(100L) - dpc) * (lit(100L) + tpc)).as("scc"),
          rnd(avg(col("l_quantity")), 4).as("avg_qty"),
          rnd(avg(col("l_extendedprice")), 4).as("avg_price"),
          rnd(avg(col("l_discount")), 6).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .select(col("l_returnflag"), col("l_linestatus"), col("sum_qty"),
          col("sum_base_price"),
          (expr("(sdc + 50) DIV 100") / 100.0).as("sum_disc_price"),
          (expr("(scc + 5000) DIV 10000") / 100.0).as("sum_charge"),
          col("avg_qty"), col("avg_price"), col("avg_disc"),
          col("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // Q6: forecast-revenue-change — the pure selective-scan query: three
    // pushed predicates (timestamp bracket, discount band, quantity cap),
    // one global sum, no join, no group. The plan should be scan → two
    // hash-agg stages and nothing else.
    "q_tpch_q6" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .where(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
          col("l_discount") >= 0.02 && col("l_discount") <= 0.04 &&
          col("l_quantity") < 24)
        .agg(count(lit(1)).as("n_items"),
          rnd(sum(col("l_extendedprice") * col("l_discount")), 4).as("revenue"))),

    // Q3: shipping-priority revenue — customer×orders×lineitem, date
    // bracket both sides, top-10 by (rounded) revenue
    "q_tpch_q3" -> ((s, dir) => {
      val c = Tables.customer(s, dir).where(col("c_mktsegment") === "BUILDING")
      val o = Tables.orders(s, dir)
        .where(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      val l = Tables.lineitem(s, dir)
        .where(col("l_shipdate") > lit("1998-01-01").cast("timestamp"))
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy(col("l_orderkey"), to_date(col("o_orderdate")).as("odate"),
          col("o_orderpriority"))
        .agg(rnd(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 4)
          .as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    }),

    // Q10: returned-item revenue per customer — 4-table join, selective
    // flag filter on the fact side, top-20 by (rounded) revenue
    "q_tpch_q10" -> ((s, dir) => {
      val c = Tables.customer(s, dir)
      val o = Tables.orders(s, dir)
      val l = Tables.lineitem(s, dir).where(col("l_returnflag") === "R")
      val n = Tables.nation(s, dir)
      c.join(o, c("c_custkey") === o("o_custkey"))
        .join(l, o("o_orderkey") === l("l_orderkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy(col("c_custkey"), col("n_name"))
        .agg(count(lit(1)).as("n_items"),
          rnd(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 4)
            .as("revenue"),
          rnd(max(col("c_acctbal")), 2).as("acctbal"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    }),

    // Q18: large-quantity orders — the HAVING-on-aggregate IN-subquery
    // shape, realized as a left-semi join against the aggregated
    // lineitem (sum(l_quantity) is exact: integral doubles, so no
    // rounding needed anywhere in this query)
    "q_tpch_q18" -> ((s, dir) => {
      val l = Tables.lineitem(s, dir)
      val big = l.groupBy(col("l_orderkey").as("bok"))
        .agg(sum(col("l_quantity")).as("sq"))
        .where(col("sq") > 150).select(col("bok"))
      val o = Tables.orders(s, dir)
      val c = Tables.customer(s, dir)
      o.join(big, o("o_orderkey") === big("bok"), "left_semi")
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(l, o("o_orderkey") === l("l_orderkey"))
        .groupBy(col("c_custkey"), col("o_orderkey"),
          to_date(col("o_orderdate")).as("odate"), col("o_totalprice"))
        .agg(sum(col("l_quantity")).as("sum_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(20)
    }),

    // Q4 (adapted): order-priority checking — count orders in a quarter
    // having at least one LATE lineitem. The fixture lineitem carries no
    // commit/receipt dates, so "late" is l_shipdate > o_orderdate + 60
    // days (documented divergence); the shape is the one that matters:
    // correlated EXISTS realized as a left-semi join, grouped counts.
    "q_tpch_q4" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
        .where(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-04-01").cast("timestamp"))
      val l = Tables.lineitem(s, dir).select(col("l_orderkey"), col("l_shipdate"))
      o.join(l, o("o_orderkey") === l("l_orderkey") &&
          l("l_shipdate") > o("o_orderdate") + expr("INTERVAL 60 DAYS"), "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
        .orderBy("o_orderpriority")
    }),

    // Q14: promo-revenue share — fact×dim join where the aggregate is a
    // conditional-sum ratio; part is the broadcast side
    "q_tpch_q14" -> ((s, dir) => {
      val l = Tables.lineitem(s, dir)
        .where(col("l_shipdate") >= lit("1997-06-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-07-01").cast("timestamp"))
      val p = Tables.part(s, dir).select(col("p_partkey"), col("p_type"))
      l.join(broadcast(p), l("l_partkey") === p("p_partkey"))
        .agg(rnd(
          lit(100.0) * sum(when(col("p_type") === "PROMO",
              col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .otherwise(lit(0.0))) /
            sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 4)
          .as("promo_revenue"))
    }),

    // Q19: discounted revenue under a DISJUNCTIVE join predicate (three
    // brand/size/quantity bands OR-ed together) — exercises Catalyst's
    // common-conjunct extraction: the equi-key join happens first and
    // the OR-of-ANDs stays as a post-join filter
    "q_tpch_q19" -> ((s, dir) => {
      val l = Tables.lineitem(s, dir)
      val p = Tables.part(s, dir)
      val bands =
        (p("p_brand") === "Brand#12" && p("p_size").between(1, 15) &&
          l("l_quantity").between(1, 11)) ||
        (p("p_brand") === "Brand#23" && p("p_size").between(1, 25) &&
          l("l_quantity").between(10, 20)) ||
        (p("p_brand") === "Brand#5" && p("p_size").between(1, 35) &&
          l("l_quantity").between(20, 30))
      l.join(broadcast(p), l("l_partkey") === p("p_partkey") && bands)
        .agg(count(lit(1)).as("n_items"),
          rnd(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 4)
            .as("revenue"))
    }),

    // Q22 (adapted): global-sales-opportunity — customers above the
    // (rounded) average positive balance with NO urgent orders; scalar
    // subquery + left-anti join + grouped totals. ("No orders at all"
    // is vacuous on these fixtures: every custkey is referenced.)
    "q_tpch_q22" -> ((s, dir) => {
      val c = Tables.customer(s, dir)
      val avgBal = c.where(col("c_acctbal") > 0.0)
        .agg((floor(avg(col("c_acctbal")) * lit(100.0) + lit(0.5)) / lit(100.0))
          .as("ab"))
      val urgent = Tables.orders(s, dir)
        .where(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey"))
      c.crossJoin(broadcast(avgBal))
        .where(col("c_acctbal") > col("ab"))
        .join(urgent, c("c_custkey") === urgent("o_custkey"), "left_anti")
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("numcust"), rnd(sum(col("c_acctbal")), 2)
          .as("totacctbal"))
        .orderBy("c_nationkey")
    }),

    // Q2 (adapted): minimum-cost supplier — the fixture has no partsupp,
    // so supply cost is the observed min unit price per (part, supplier)
    // from lineitem (documented divergence; the SHAPE is what matters:
    // a correlated min-subquery per part, realized scale-first as a
    // min-per-key aggregate + equality join instead of a per-row
    // subquery). Unit price division is identical IEEE on both engines,
    // min is order-independent, so the equality join is exact.
    "q_tpch_q2" -> ((s, dir) => {
      val cost = Tables.lineitem(s, dir)
        .groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(min(col("l_extendedprice") / col("l_quantity")).as("cost"))
      val sup = Tables.supplier(s, dir)
        .join(broadcast(Tables.nation(s, dir)),
          col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, dir).where(col("r_name") === "EUROPE")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("s_suppkey"), col("s_name"), col("s_acctbal"), col("n_name"))
      val rs = cost.join(sup, cost("l_suppkey") === sup("s_suppkey"))
      val minCost = rs.groupBy(col("l_partkey").as("mpk"))
        .agg(min(col("cost")).as("min_cost"))
      val p = Tables.part(s, dir)
        .where(col("p_size").between(1, 25) && col("p_type") === "LARGE")
        .select(col("p_partkey"))
      rs.join(minCost, rs("l_partkey") === minCost("mpk") &&
          rs("cost") === minCost("min_cost"))
        .join(broadcast(p), rs("l_partkey") === p("p_partkey"))
        .select(col("s_acctbal"), col("s_name"), col("n_name"),
          col("p_partkey"), rnd(col("cost"), 4).as("cost"))
        .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"),
          col("p_partkey"))
        .limit(100)
    }),

    // Q7: volume shipping between two nations — the dual-role nation
    // join (nation table joined twice under different keys), a
    // symmetric pair predicate, and a year-grouped revenue rollup
    "q_tpch_q7" -> ((s, dir) => {
      val n1 = Tables.nation(s, dir)
        .select(col("n_nationkey").as("n1_key"), col("n_name").as("supp_nation"))
      val n2 = Tables.nation(s, dir)
        .select(col("n_nationkey").as("n2_key"), col("n_name").as("cust_nation"))
      val l = Tables.lineitem(s, dir)
        .where(col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
          col("l_shipdate") <= lit("1996-12-31").cast("timestamp"))
      Tables.supplier(s, dir)
        .join(l, col("s_suppkey") === col("l_suppkey"))
        .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
        .join(broadcast(n1), col("s_nationkey") === col("n1_key"))
        .join(broadcast(n2), col("c_nationkey") === col("n2_key"))
        .where((col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
          (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).as("l_year"))
        .agg(rnd(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 4)
          .as("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    }),

    // Q13: customer order-count distribution — the LEFT-join-with-
    // residual-predicate + double aggregation shape (customers with zero
    // qualifying orders must survive as c_count = 0)
    "q_tpch_q13" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
        .where(col("o_orderpriority") =!= "1-URGENT")
        .select(col("o_orderkey"), col("o_custkey"))
      val c = Tables.customer(s, dir).select(col("c_custkey"))
      c.join(o, c("c_custkey") === o("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    }),

    // Q21 (adapted): suppliers who kept orders waiting — the fixture has
    // no commit/receipt dates, so "late" is l_shipdate > o_orderdate +
    // 60 days (same documented adaptation as Q4). The EXISTS another
    // supplier / NOT EXISTS another LATE supplier pair is realized
    // scale-first as ONE per-order aggregate (distinct suppliers,
    // distinct late suppliers) joined back to the late rows — two
    // shuffles total instead of two self-joins of the fact table.
    "q_tpch_q21" -> ((s, dir) => {
      val o = Tables.orders(s, dir).where(col("o_orderstatus") === "F")
        .select(col("o_orderkey"), col("o_orderdate"))
      val lo = Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .withColumn("late",
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
      val perOrder = lo.groupBy(col("l_orderkey").as("agg_ok"))
        .agg(countDistinct(col("l_suppkey")).as("nsupp"),
          countDistinct(when(col("late"), col("l_suppkey"))).as("nlate"))
      val sup = Tables.supplier(s, dir)
        .join(broadcast(Tables.nation(s, dir)
            .where(col("n_name") === "NATION_3")),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("s_name"))
      lo.where(col("late"))
        .join(perOrder, col("l_orderkey") === col("agg_ok"))
        .where(col("nsupp") > 1 && col("nlate") === 1)
        .join(sup, col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("s_name"))
        .agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
        .limit(100)
    }),

    // Q8: national market share — 7-table join with the nation table in
    // two roles, a region filter on the CUSTOMER side, and a
    // conditional-share ratio per order year. Ratio of two same-group
    // sums → 6dp rounding absorbs accumulation-order noise.
    "q_tpch_q8" -> ((s, dir) => {
      val p = Tables.part(s, dir).where(col("p_type") === "ECONOMY")
        .select(col("p_partkey"))
      val n1 = Tables.nation(s, dir)
        .select(col("n_nationkey").as("cn_key"), col("n_regionkey"))
      val n2 = Tables.nation(s, dir)
        .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
      val r = Tables.region(s, dir).where(col("r_name") === "ASIA")
      val o = Tables.orders(s, dir)
        .where(col("o_orderdate") >= lit("1995-01-01").cast("timestamp") &&
          col("o_orderdate") <= lit("1996-12-31").cast("timestamp"))
      Tables.lineitem(s, dir)
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
        .join(broadcast(n1), col("c_nationkey") === col("cn_key"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .join(broadcast(Tables.supplier(s, dir)), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(n2), col("s_nationkey") === col("sn_key"))
        .withColumn("volume", col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .groupBy(year(col("o_orderdate")).as("o_year"))
        .agg(rnd(sum(when(col("supp_nation") === "NATION_5", col("volume"))
            .otherwise(lit(0.0))) / sum(col("volume")), 6).as("mkt_share"))
        .orderBy("o_year")
    }),

    // Q9 (adapted): product-type profit — the fixture has no partsupp,
    // so supply cost is p_retailprice * l_quantity * 0.1 (documented
    // divergence; the shape — 6-table join, LIKE filter, signed profit
    // aggregated by supplier nation × year — is what matters)
    "q_tpch_q9" -> ((s, dir) => {
      val p = Tables.part(s, dir).where(col("p_name").like("%gear%"))
        .select(col("p_partkey"), col("p_retailprice"))
      val n = Tables.nation(s, dir)
      Tables.lineitem(s, dir)
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.supplier(s, dir)), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .withColumn("amount",
          col("l_extendedprice") * (lit(1.0) - col("l_discount")) -
            col("p_retailprice") * col("l_quantity") * lit(0.1))
        .groupBy(col("n_name").as("nation"), year(col("o_orderdate")).as("o_year"))
        // millions at 2dp: signed-amount accumulation-order error grows
        // with group size (measured ~0.07 absolute at sf1.0), so plain
        // 2dp rounding flips; the scaled form is stable at any SF
        .agg(rnd(sum(col("amount")) / lit(1e6), 2).as("sum_profit_m"))
        .orderBy(col("nation"), col("o_year").desc)
    }),

    // Q11 (adapted): important parts — "inventory value" is the shipped
    // value sum(l_extendedprice * l_quantity) of NATION_7 suppliers per
    // part (no partsupp); parts whose value exceeds 0.1% of the total,
    // i.e. the HAVING-over-scalar-subquery shape
    "q_tpch_q11" -> ((s, dir) => {
      val sup = Tables.supplier(s, dir)
        .join(broadcast(Tables.nation(s, dir).where(col("n_name") === "NATION_7")),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"))
      val vals = Tables.lineitem(s, dir)
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("l_partkey"))
        .agg(sum(col("l_extendedprice") * col("l_quantity")).as("value"))
      val total = vals.agg(sum(col("value")).as("tot"))
      vals.crossJoin(broadcast(total))
        .where(col("value") > col("tot") * lit(0.001))
        .select(col("l_partkey"), rnd(col("value"), 2).as("value"))
        .orderBy(col("value").desc, col("l_partkey"))
    }),

    // Q12 (adapted): late-shipment priority distribution — no
    // l_shipmode/receiptdate in the fixture, so the "mode" is
    // l_returnflag and "late" is the Q4 definition (shipdate >
    // orderdate + 60 days); the shape is the two conditional counts
    "q_tpch_q12" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      Tables.lineitem(s, dir)
        .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
        .join(o, col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
        .groupBy(col("l_returnflag"))
        .agg(
          sum(when(col("o_orderpriority") === "1-URGENT" ||
            col("o_orderpriority") === "2-HIGH", 1L).otherwise(0L))
            .as("high_line_count"),
          sum(when(col("o_orderpriority") =!= "1-URGENT" &&
            col("o_orderpriority") =!= "2-HIGH", 1L).otherwise(0L))
            .as("low_line_count"))
        .orderBy("l_returnflag")
    }),

    // Q15: top supplier by quarterly revenue — the revenue-view + max
    // scalar-subquery shape. Revenue is rounded at 2dp on BOTH engines
    // BEFORE the max/equality so accumulation order can't flip the tie.
    "q_tpch_q15" -> ((s, dir) => {
      val rev = Tables.lineitem(s, dir)
        .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
        .groupBy(col("l_suppkey"))
        .agg(rnd(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
          .as("total_revenue"))
      val mx = rev.agg(max(col("total_revenue")).as("mx"))
      Tables.supplier(s, dir)
        .join(rev, col("s_suppkey") === col("l_suppkey"))
        .crossJoin(broadcast(mx))
        .where(col("total_revenue") === col("mx"))
        .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
        .orderBy("s_suppkey")
    }),

    // Q16 (adapted): supplier-part relationship counts — the observed
    // (part, supplier) pairs from lineitem stand in for partsupp;
    // "complaint" suppliers are those with negative balance. Exercises
    // distinct-count after a distinct pair projection + anti filter.
    "q_tpch_q16" -> ((s, dir) => {
      val bad = Tables.supplier(s, dir).where(col("s_acctbal") < 0.0)
        .select(col("s_suppkey").as("bad_key"))
      val p = Tables.part(s, dir)
        .where(col("p_brand") =!= "Brand#5" && col("p_type") =!= "PROMO" &&
          col("p_size").between(1, 8))
        .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_size"))
      Tables.lineitem(s, dir)
        .select(col("l_partkey"), col("l_suppkey")).distinct()
        .join(broadcast(bad), col("l_suppkey") === col("bad_key"), "left_anti")
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"), col("p_type"), col("p_size"))
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
          col("p_size"))
    }),

    // Q17: small-quantity revenue — correlated per-part average realized
    // as an aggregate + self-join. l_quantity is integral, so the
    // per-part avg (exact sum / count) and the 0.2× threshold are
    // bit-identical cross-engine; only the final price sum needs
    // rounding.
    "q_tpch_q17" -> ((s, dir) => {
      val l = Tables.lineitem(s, dir)
      val p = Tables.part(s, dir).where(col("p_brand") === "Brand#23")
        .select(col("p_partkey"))
      val avgQ = l.join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .groupBy(col("l_partkey").as("ap_key"))
        .agg((avg(col("l_quantity")) * lit(0.2)).as("qlim"))
      l.join(broadcast(p), l("l_partkey") === p("p_partkey"))
        .join(broadcast(avgQ), l("l_partkey") === avgQ("ap_key"))
        .where(col("l_quantity") < col("qlim"))
        .agg(rnd(sum(col("l_extendedprice")) / lit(7.0), 2).as("avg_yearly"))
    }),

    // Q20 (adapted): a part's dominant supplier — suppliers that are the
    // TOP shipper (by quantity, exact integral sums so ties are
    // deterministic cross-engine) of at least one '%bolt%' part, then
    // restricted to NATION_9; the nested correlated-subquery semi-join
    // shape of the original, scale-free at any SF
    "q_tpch_q20" -> ((s, dir) => {
      val p = Tables.part(s, dir).where(col("p_name").like("%bolt%"))
        .select(col("p_partkey"))
      val shipped = Tables.lineitem(s, dir)
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(sum(col("l_quantity")).as("sq"))
      val totals = shipped.groupBy(col("l_partkey").as("tp_key"))
        .agg(max(col("sq")).as("mx"))
      val big = shipped.join(totals, col("l_partkey") === col("tp_key"))
        .where(col("sq") === col("mx"))
        .select(col("l_suppkey").as("big_key")).distinct()
      Tables.supplier(s, dir)
        .join(broadcast(Tables.nation(s, dir).where(col("n_name") === "NATION_9")),
          col("s_nationkey") === col("n_nationkey"))
        .join(big, col("s_suppkey") === col("big_key"), "left_semi")
        .select(col("s_suppkey"), col("s_name"))
        .orderBy("s_suppkey")
    }),

    // Q5: local-supplier volume per nation in ASIA — 6-table join where
    // the customer and supplier must share a nation
    "q_tpch_q5" -> ((s, dir) => {
      val c = Tables.customer(s, dir)
      val o = Tables.orders(s, dir)
      val l = Tables.lineitem(s, dir)
      val sup = Tables.supplier(s, dir)
      val n = Tables.nation(s, dir)
      val r = Tables.region(s, dir).where(col("r_name") === "ASIA")
      c.join(o, c("c_custkey") === o("o_custkey"))
        .join(l, o("o_orderkey") === l("l_orderkey"))
        .join(broadcast(sup), l("l_suppkey") === sup("s_suppkey") &&
          c("c_nationkey") === sup("s_nationkey"))
        .join(broadcast(n), sup("s_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("n_items"),
          rnd(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 4)
            .as("revenue"))
        .orderBy("n_name")
    }))

  val oracleSql: Map[String, String] = Map(
    // exact integer-cents product sums (see the query comment): // is
    // DuckDB integer division ≡ Spark DIV
    "q_tpch_q1" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  ${rndSql("sum(l_quantity)", 2)} AS sum_qty,
         |  ${rndSql("sum(l_extendedprice)", 2)} AS sum_base_price,
         |  (sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
         |       * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT)))
         |   + 50) // 100 / 100.0 AS sum_disc_price,
         |  (sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
         |       * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT))
         |       * (100 + CAST(floor(l_tax * 100 + 0.5) AS BIGINT)))
         |   + 5000) // 10000 / 100.0 AS sum_charge,
         |  ${rndSql("avg(l_quantity)", 4)} AS avg_qty,
         |  ${rndSql("avg(l_extendedprice)", 4)} AS avg_price,
         |  ${rndSql("avg(l_discount)", 6)} AS avg_disc,
         |  count(*) AS count_order
         |FROM lineitem
         |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_tpch_q6" ->
      s"""SELECT count(*) AS n_items,
         |  ${rndSql("sum(l_extendedprice * l_discount)", 4)} AS revenue
         |FROM lineitem
         |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
         |  AND l_shipdate < TIMESTAMP '1998-01-01'
         |  AND l_discount >= 0.02 AND l_discount <= 0.04
         |  AND l_quantity < 24""".stripMargin,

    "q_tpch_q3" ->
      s"""SELECT l_orderkey, CAST(o_orderdate AS DATE) AS odate, o_orderpriority,
         |  ${rndSql("sum(l_extendedprice * (1.0 - l_discount))", 4)} AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |WHERE c_mktsegment = 'BUILDING'
         |  AND o_orderdate < TIMESTAMP '1998-01-01'
         |  AND l_shipdate > TIMESTAMP '1998-01-01'
         |GROUP BY 1, 2, 3
         |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,

    "q_tpch_q10" ->
      s"""SELECT c_custkey, n_name, count(*) AS n_items,
         |  ${rndSql("sum(l_extendedprice * (1.0 - l_discount))", 4)} AS revenue,
         |  ${rndSql("max(c_acctbal)", 2)} AS acctbal
         |FROM customer
         |JOIN orders ON c_custkey = o_custkey
         |JOIN lineitem ON o_orderkey = l_orderkey
         |JOIN nation ON c_nationkey = n_nationkey
         |WHERE l_returnflag = 'R'
         |GROUP BY 1, 2
         |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,

    "q_tpch_q18" ->
      """SELECT c_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS odate,
        |  o_totalprice, sum(l_quantity) AS sum_qty
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
        |                     GROUP BY l_orderkey HAVING sum(l_quantity) > 150)
        |GROUP BY 1, 2, 3, 4
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""".stripMargin,

    "q_tpch_q4" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-04-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey
        |                AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q_tpch_q14" ->
      s"""SELECT ${rndSql(
             "100.0 * sum(CASE WHEN p_type = 'PROMO' " +
               "THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END) / " +
               "sum(l_extendedprice * (1.0 - l_discount))", 4)} AS promo_revenue
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |WHERE l_shipdate >= TIMESTAMP '1997-06-01'
         |  AND l_shipdate < TIMESTAMP '1997-07-01'""".stripMargin,

    "q_tpch_q19" ->
      s"""SELECT count(*) AS n_items,
         |  ${rndSql("sum(l_extendedprice * (1.0 - l_discount))", 4)} AS revenue
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
         |        AND l_quantity BETWEEN 1 AND 11)
         |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
         |        AND l_quantity BETWEEN 10 AND 20)
         |   OR (p_brand = 'Brand#5' AND p_size BETWEEN 1 AND 35
         |        AND l_quantity BETWEEN 20 AND 30)""".stripMargin,

    "q_tpch_q22" ->
      s"""WITH ab AS (SELECT CAST(floor(avg(c_acctbal) * 100.0 + 0.5) AS DOUBLE) / 100.0 AS ab
         |            FROM customer WHERE c_acctbal > 0.0),
         |u AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
         |SELECT c_nationkey, count(*) AS numcust,
         |  ${rndSql("sum(c_acctbal)", 2)} AS totacctbal
         |FROM customer, ab
         |WHERE c_acctbal > ab
         |  AND c_custkey NOT IN (SELECT o_custkey FROM u)
         |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,

    "q_tpch_q2" ->
      s"""WITH cost AS (SELECT l_partkey, l_suppkey,
         |    min(l_extendedprice / l_quantity) AS cost
         |  FROM lineitem GROUP BY 1, 2),
         |rs AS (SELECT c.l_partkey AS pk, c.cost, s_acctbal, s_name, n_name
         |  FROM cost c
         |  JOIN supplier ON c.l_suppkey = s_suppkey
         |  JOIN nation ON s_nationkey = n_nationkey
         |  JOIN region ON n_regionkey = r_regionkey
         |  WHERE r_name = 'EUROPE'),
         |mc AS (SELECT pk, min(cost) AS min_cost FROM rs GROUP BY pk)
         |SELECT s_acctbal, s_name, n_name, p_partkey,
         |  ${rndSql("rs.cost", 4)} AS cost
         |FROM rs
         |JOIN mc ON rs.pk = mc.pk AND rs.cost = mc.min_cost
         |JOIN part ON rs.pk = p_partkey
         |WHERE p_size BETWEEN 1 AND 25 AND p_type = 'LARGE'
         |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100""".stripMargin,

    "q_tpch_q7" ->
      s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         |  CAST(year(l_shipdate) AS INTEGER) AS l_year,
         |  ${rndSql("sum(l_extendedprice * (1.0 - l_discount))", 4)} AS revenue
         |FROM supplier
         |JOIN lineitem ON s_suppkey = l_suppkey
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation n1 ON s_nationkey = n1.n_nationkey
         |JOIN nation n2 ON c_nationkey = n2.n_nationkey
         |WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
         |    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
         |  AND l_shipdate >= TIMESTAMP '1995-01-01'
         |  AND l_shipdate <= TIMESTAMP '1996-12-31'
         |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,

    "q_tpch_q13" ->
      """SELECT c_count, count(*) AS custdist FROM (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer
        |  LEFT JOIN orders ON c_custkey = o_custkey
        |    AND o_orderpriority <> '1-URGENT'
        |  GROUP BY c_custkey)
        |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin,

    "q_tpch_q21" ->
      """SELECT s_name, count(*) AS numwait
        |FROM supplier
        |JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
        |JOIN orders ON o_orderkey = l1.l_orderkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE o_orderstatus = 'F'
        |  AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
        |  AND n_name = 'NATION_3'
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |    WHERE l2.l_orderkey = l1.l_orderkey
        |      AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |    WHERE l3.l_orderkey = l1.l_orderkey
        |      AND l3.l_suppkey <> l1.l_suppkey
        |      AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
        |GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 100""".stripMargin,

    "q_tpch_q8" ->
      s"""SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
         |  ${rndSql(
             "sum(CASE WHEN n2.n_name = 'NATION_5' " +
               "THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END) / " +
               "sum(l_extendedprice * (1.0 - l_discount))", 6)} AS mkt_share
         |FROM lineitem
         |JOIN part ON l_partkey = p_partkey
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation n1 ON c_nationkey = n1.n_nationkey
         |JOIN region ON n1.n_regionkey = r_regionkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation n2 ON s_nationkey = n2.n_nationkey
         |WHERE p_type = 'ECONOMY' AND r_name = 'ASIA'
         |  AND o_orderdate >= TIMESTAMP '1995-01-01'
         |  AND o_orderdate <= TIMESTAMP '1996-12-31'
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_tpch_q9" ->
      s"""SELECT n_name AS nation, CAST(year(o_orderdate) AS INTEGER) AS o_year,
         |  ${rndSql(
             "sum(l_extendedprice * (1.0 - l_discount) - " +
               "p_retailprice * l_quantity * 0.1) / 1e6", 2)} AS sum_profit_m
         |FROM lineitem
         |JOIN part ON l_partkey = p_partkey
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation ON s_nationkey = n_nationkey
         |WHERE p_name LIKE '%gear%'
         |GROUP BY 1, 2 ORDER BY nation, o_year DESC""".stripMargin,

    "q_tpch_q11" ->
      s"""WITH vals AS (
         |  SELECT l_partkey, sum(l_extendedprice * l_quantity) AS value
         |  FROM lineitem
         |  JOIN supplier ON l_suppkey = s_suppkey
         |  JOIN nation ON s_nationkey = n_nationkey
         |  WHERE n_name = 'NATION_7'
         |  GROUP BY l_partkey)
         |SELECT l_partkey, ${rndSql("value", 2)} AS value
         |FROM vals
         |WHERE value > (SELECT sum(value) FROM vals) * 0.001
         |ORDER BY value DESC, l_partkey""".stripMargin,

    "q_tpch_q12" ->
      """SELECT l_returnflag,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_shipdate > o_orderdate + INTERVAL 60 DAY
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_tpch_q15" ->
      s"""WITH rev AS (
         |  SELECT l_suppkey,
         |    ${rndSql("sum(l_extendedprice * (1.0 - l_discount))", 2)} AS total_revenue
         |  FROM lineitem
         |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
         |    AND l_shipdate < TIMESTAMP '1996-04-01'
         |  GROUP BY l_suppkey)
         |SELECT s_suppkey, s_name, total_revenue
         |FROM supplier JOIN rev ON s_suppkey = l_suppkey
         |WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
         |ORDER BY s_suppkey""".stripMargin,

    "q_tpch_q16" ->
      """SELECT p_brand, p_type, p_size,
        |  CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        |FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
        |JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#5' AND p_type <> 'PROMO'
        |  AND p_size BETWEEN 1 AND 8
        |  AND l_suppkey NOT IN (
        |    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
        |GROUP BY p_brand, p_type, p_size
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,

    "q_tpch_q17" ->
      s"""WITH avgq AS (
         |  SELECT l_partkey AS ap_key, avg(l_quantity) * 0.2 AS qlim
         |  FROM lineitem
         |  JOIN part ON l_partkey = p_partkey
         |  WHERE p_brand = 'Brand#23'
         |  GROUP BY l_partkey)
         |SELECT ${rndSql("sum(l_extendedprice) / 7.0", 2)} AS avg_yearly
         |FROM lineitem
         |JOIN part ON l_partkey = p_partkey
         |JOIN avgq ON l_partkey = ap_key
         |WHERE p_brand = 'Brand#23' AND l_quantity < qlim""".stripMargin,

    "q_tpch_q20" ->
      """WITH shipped AS (
        |  SELECT l_partkey, l_suppkey, sum(l_quantity) AS sq
        |  FROM lineitem
        |  JOIN part ON l_partkey = p_partkey
        |  WHERE p_name LIKE '%bolt%'
        |  GROUP BY l_partkey, l_suppkey),
        |totals AS (SELECT l_partkey AS tp_key, max(sq) AS mx
        |  FROM shipped GROUP BY l_partkey),
        |big AS (SELECT DISTINCT l_suppkey FROM shipped
        |  JOIN totals ON l_partkey = tp_key WHERE sq = mx)
        |SELECT s_suppkey, s_name
        |FROM supplier
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE n_name = 'NATION_9'
        |  AND s_suppkey IN (SELECT l_suppkey FROM big)
        |ORDER BY s_suppkey""".stripMargin,

    "q_tpch_q5" ->
      s"""SELECT n_name, count(*) AS n_items,
         |  ${rndSql("sum(l_extendedprice * (1.0 - l_discount))", 4)} AS revenue
         |FROM customer
         |JOIN orders ON c_custkey = o_custkey
         |JOIN lineitem ON o_orderkey = l_orderkey
         |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         |JOIN nation ON s_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |WHERE r_name = 'ASIA'
         |GROUP BY n_name ORDER BY n_name""".stripMargin)
}
