package graft

import org.apache.spark.sql.functions._
import graft.sources.StagedLayouts

/** The partitioned-layout queries must actually PRUNE, not just match the
  * oracle (VERDICT r6 item 3): the static bracket lands in
  * PartitionFilters and only the 3 matching date directories are read;
  * the dim-driven join carries a dynamic-pruning subquery on the fact
  * scan. Both queries' values are oracle-gated in CORRECTNESS; this spec
  * pins the PLAN property that makes them scale.
  */
class PartitionedLayoutSpec extends SparkSpec {

  test("q_part_prune_static: bracket prunes to 3 date directories") {
    val df = queries.RelationalQueries.queries("q_part_prune_static")(spark, sf)
    df.collect() // AQE: finalize plan before reading its string
    val p = df.queryExecution.executedPlan.toString
    assert(p.replaceAll("\\s+", " ")
      .matches("(?s).*PartitionFilters: \\[[^\\]]*event_date[^\\]]*\\].*"),
      s"date bracket not in PartitionFilters:\n$p")
    val files = StagedLayouts.eventsByDate(spark, sf)
      .where(col("event_date").between(
        lit(java.sql.Date.valueOf("2024-01-10")),
        lit(java.sql.Date.valueOf("2024-01-12"))))
      .select(input_file_name()).distinct().collect().map(_.getString(0))
    assert(files.nonEmpty && files.forall(f =>
      f.contains("event_date=2024-01-10") || f.contains("event_date=2024-01-11") ||
        f.contains("event_date=2024-01-12")),
      s"scan read non-matching directories: ${files.take(3).mkString(", ")}")
  }

  test("q_part_prune_dpp: fact scan carries a dynamic-pruning subquery") {
    val df = queries.RelationalQueries.queries("q_part_prune_dpp")(spark, sf)
    // pre-execution plan: DPP subqueries are visible before AQE reshapes
    val p = df.queryExecution.executedPlan.toString
    assert(p.toLowerCase.contains("dynamicpruning"),
      s"no dynamic-pruning subquery on the partitioned fact scan:\n$p")
    // and the join answers match a statically-pruned equivalent
    val sundays = StagedLayouts.dateDim(spark, sf)
      .where(col("isodow") === 7).select("d").collect().map(_.getDate(0))
    val expect = StagedLayouts.eventsByDate(spark, sf)
      .where(col("event_date").isin(sundays.toIndexedSeq: _*))
      .groupBy(col("event_date")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    val got = df.collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    assert(got === expect)
  }

  test("one file per date directory (no small-files explosion from the partitioned write)") {
    val byDir = StagedLayouts.eventsByDate(spark, sf)
      .select(input_file_name().as("f")).distinct().collect().map(_.getString(0))
      .groupBy(f => f.substring(0, f.lastIndexOf('/')))
    assert(byDir.nonEmpty && byDir.forall(_._2.length == 1),
      s"multiple files per partition dir: ${byDir.filter(_._2.length > 1).keys.take(2).mkString}")
  }
}
