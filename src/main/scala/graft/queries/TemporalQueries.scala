package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
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
         |GROUP BY s.s_event, s.user_id ORDER BY s.s_event""".stripMargin)
}
