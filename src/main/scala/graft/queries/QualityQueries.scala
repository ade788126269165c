package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Data-quality expectation suite — the audit pass every production
  * warehouse runs before publishing a table (null rates, key
  * uniqueness, referential integrity, domain ranges; the Deequ/dbt-test
  * operator family). One row per check, exact integer violation
  * counts.
  *
  * Scale shape: the three events checks ride ONE aggregate over one
  * scan (not one scan per check — at 100 TB that difference is the
  * whole cost); the two referential checks are anti-joins on the FK,
  * which AQE plans as broadcast or shuffle by dim size; the row checks
  * on lineitem/orders ride one aggregate each.
  */
object QualityQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_dq_checks" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val li = Tables.lineitem(s, dir)
      val ord = Tables.orders(s, dir)
      val cust = Tables.customer(s, dir)
      // single-pass trio over events
      val evChecks = ev.agg(
          sum(when(col("value").isNull || col("props").isNull, 1L)
            .otherwise(0L)).as("null_fields"),
          (count(lit(1)) - countDistinct(col("event_id"))).as("dup_ids"),
          sum(when(col("value") < 0.0, 1L).otherwise(0L)).as("neg_value"))
        .selectExpr(
          "stack(3, 'events_null_fields', null_fields, " +
            "'events_dup_event_id', dup_ids, " +
            "'events_negative_value', neg_value) AS (check_name, n_violations)")
      val liOrphans = li.join(ord, li("l_orderkey") === ord("o_orderkey"),
          "left_anti")
        .agg(count(lit(1)).as("n_violations"))
        .select(lit("lineitem_orphan_order").as("check_name"), col("n_violations"))
      val ordOrphans = ord.join(cust, ord("o_custkey") === cust("c_custkey"),
          "left_anti")
        .agg(count(lit(1)).as("n_violations"))
        .select(lit("orders_orphan_customer").as("check_name"), col("n_violations"))
      val liRange = li.agg(
          sum(when(col("l_quantity") <= 0.0, 1L).otherwise(0L)).as("npq"),
          sum(when(col("l_discount") < 0.0 || col("l_discount") > 0.1, 1L)
            .otherwise(0L)).as("disc"))
        .selectExpr(
          "stack(2, 'lineitem_nonpositive_qty', npq, " +
            "'lineitem_discount_range', disc) AS (check_name, n_violations)")
      val ordDomain = ord.agg(
          sum(when(!col("o_orderstatus").isin("O", "F", "P"), 1L)
            .otherwise(0L)).as("bad"))
        .select(lit("orders_bad_status").as("check_name"),
          col("bad").as("n_violations"))
      evChecks.unionAll(liOrphans).unionAll(ordOrphans)
        .unionAll(liRange).unionAll(ordDomain)
        .orderBy("check_name")
    }))

  val oracleSql: Map[String, String] = Map(
    "q_dq_checks" ->
      """SELECT check_name, CAST(n_violations AS BIGINT) AS n_violations FROM (
        |  SELECT 'events_null_fields' AS check_name,
        |    sum(CASE WHEN value IS NULL OR props IS NULL THEN 1 ELSE 0 END)
        |      AS n_violations FROM events
        |  UNION ALL
        |  SELECT 'events_dup_event_id', count(*) - count(DISTINCT event_id)
        |  FROM events
        |  UNION ALL
        |  SELECT 'events_negative_value',
        |    sum(CASE WHEN value < 0.0 THEN 1 ELSE 0 END) FROM events
        |  UNION ALL
        |  SELECT 'lineitem_orphan_order', count(*) FROM lineitem
        |  WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)
        |  UNION ALL
        |  SELECT 'orders_orphan_customer', count(*) FROM orders
        |  WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)
        |  UNION ALL
        |  SELECT 'lineitem_nonpositive_qty',
        |    sum(CASE WHEN l_quantity <= 0.0 THEN 1 ELSE 0 END) FROM lineitem
        |  UNION ALL
        |  SELECT 'lineitem_discount_range',
        |    sum(CASE WHEN l_discount < 0.0 OR l_discount > 0.1 THEN 1 ELSE 0 END)
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'orders_bad_status',
        |    sum(CASE WHEN o_orderstatus NOT IN ('O', 'F', 'P') THEN 1 ELSE 0 END)
        |  FROM orders
        |) ORDER BY check_name""".stripMargin)
}
