package graft

import org.apache.spark.sql.functions._
import graft.queries.WarehouseQueries

/** Semantic invariants for the behavioral/warehouse queries (the DuckDB
  * oracle pins full output at sf0.01; these pin the properties that must
  * hold at ANY scale).
  */
class WarehouseSpec extends SparkSpec {

  private def q(name: String) = WarehouseQueries.queries(name)(spark, sf)

  test("retention cohort: offset 0 is the cohort itself and retention never exceeds 1") {
    val rows = q("q_retention_cohort").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val offset = r.getLong(1)
      val nActive = r.getLong(2)
      val cohortSize = r.getLong(4)
      val retention = r.getDouble(5)
      assert(offset >= 0)
      assert(nActive <= cohortSize, s"active $nActive > cohort $cohortSize")
      assert(retention >= 0.0 && retention <= 1.0)
      if (offset == 0) assert(nActive == cohortSize && retention == 1.0)
    }
    // cohort sizes sum to the distinct-user count (each user in exactly
    // one cohort)
    val cohortTotal = rows.filter(_.getLong(1) == 0).map(_.getLong(2)).sum
    val nUsers = Tables.events(spark, sf)
      .select(countDistinct(col("user_id"))).head().getLong(0)
    assert(cohortTotal == nUsers)
  }

  test("transition matrix: rows are probability distributions and counts conserve") {
    val rows = q("q_transition_matrix").collect()
    assert(rows.nonEmpty)
    // per-source probabilities sum to 1 (within rounding of 6 dp each)
    rows.groupBy(_.getString(0)).foreach { case (src, rs) =>
      val pSum = rs.map(_.getDouble(3)).sum
      assert(math.abs(pSum - 1.0) < 1e-4, s"$src row sums to $pSum")
    }
    // total transitions = total events − one per user (the last event
    // of each user has no successor)
    val totalTrans = rows.map(_.getLong(2)).sum
    val ev = Tables.events(spark, sf)
    val nEvents = ev.count()
    val nUsers = ev.select(countDistinct(col("user_id"))).head().getLong(0)
    assert(totalTrans == nEvents - nUsers)
  }
}
