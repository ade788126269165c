package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Queries driven through `spark.sql` over the registered fixture views —
  * the SQL-dialect entry path (graft.tools.SqlRunner) under the oracle
  * gate. Each query's text is written in the dialect intersection, so
  * the IDENTICAL string is executed by Spark AND by DuckDB as its own
  * oracle: the strongest possible form of the determinism contract.
  *
  * q_sql_recursive exercises WITH RECURSIVE (new in Spark 4) — iterative
  * computation expressed inside the SQL dialect rather than a driver
  * loop.
  */
object SqlTextQueries {

  private val cteSql =
    """WITH seg AS (
      |  SELECT c_mktsegment AS segment, avg(c_acctbal) AS avg_bal,
      |    count(*) AS n_cust
      |  FROM customer GROUP BY c_mktsegment
      |)
      |SELECT segment, n_cust,
      |  CAST(floor(avg_bal * 10000.0 + 0.5) AS DOUBLE) / 10000.0 AS avg_bal_r
      |FROM seg ORDER BY segment""".stripMargin

  private val recursiveSql =
    """WITH RECURSIVE t(n) AS (
      |  SELECT 1
      |  UNION ALL
      |  SELECT n + 1 FROM t WHERE n < 25
      |)
      |SELECT t.n, n_name FROM t
      |JOIN nation ON n_nationkey = t.n - 1
      |ORDER BY t.n""".stripMargin

  /** Correlated subqueries — EXISTS / NOT EXISTS predicates and a
    * correlated scalar count, decorrelated by each engine's own
    * optimizer (Catalyst rewrites these to semi/anti/left joins).
    */
  private val existsSql =
    """SELECT n_nationkey, n_name,
      |  (SELECT count(*) FROM supplier WHERE s_nationkey = n_nationkey) AS n_supp
      |FROM nation
      |WHERE EXISTS (SELECT 1 FROM customer
      |              WHERE c_nationkey = n_nationkey AND c_acctbal > 9000)
      |  AND NOT EXISTS (SELECT 1 FROM supplier
      |                  WHERE s_nationkey = n_nationkey AND s_acctbal < -900)
      |ORDER BY n_nationkey""".stripMargin

  /** Correlated LATERAL subquery with per-row ORDER BY + LIMIT — the
    * top-N-per-key shape expressed in the SQL dialect (Catalyst
    * decorrelates it to the same window/join plan as q_topk; DuckDB
    * runs its own lateral unnesting). Ties cannot occur: c_name is
    * unique within the ordered prefix. Values are raw parquet doubles
    * (no arithmetic), so outputs are byte-identical.
    */
  private val lateralSql =
    """SELECT n.n_name, c.c_name, c.c_acctbal
      |FROM nation n JOIN LATERAL (
      |  SELECT c_name, c_acctbal FROM customer
      |  WHERE c_nationkey = n.n_nationkey
      |  ORDER BY c_acctbal DESC, c_name LIMIT 2
      |) c ON true
      |ORDER BY n.n_name, c.c_acctbal DESC, c.c_name""".stripMargin

  private def run(sql: String)(s: SparkSession, dir: String): DataFrame = {
    graft.tools.SqlRunner.register(s, dir)
    s.sql(sql)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_sql_cte" -> run(cteSql) _,
    "q_sql_recursive" -> run(recursiveSql) _,
    "q_sql_exists" -> run(existsSql) _,
    "q_sql_lateral" -> run(lateralSql) _)

  /** The oracle SQL IS the executed SQL — one string, two engines. */
  val oracleSql: Map[String, String] = Map(
    "q_sql_cte" -> cteSql,
    "q_sql_recursive" -> recursiveSql,
    "q_sql_exists" -> existsSql,
    "q_sql_lateral" -> lateralSql)
}
