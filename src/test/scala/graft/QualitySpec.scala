package graft

import org.apache.spark.sql.functions._
import graft.queries.QualityQueries

/** Driver-side replays for the data-quality operators. */
class QualitySpec extends SparkSpec {

  private def interp(sorted: Array[Double], p: Double): Double = {
    val idx = p * (sorted.length - 1)
    val (lo, hi) = (sorted(idx.toInt), sorted(math.ceil(idx).toInt))
    lo + (hi - lo) * (idx - idx.toInt)
  }

  private def rnd6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6

  test("q_anomaly_mad matches a sequential median/MAD/outlier replay") {
    val got = QualityQueries.queries("q_anomaly_mad")(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getLong(3), r.getLong(4))).toMap
    val vals = Tables.events(spark, sf)
      .select("event_type", "value").where(col("value").isNotNull)
      .collect().map(r => (r.getString(0), r.getDouble(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    assert(got.keySet == vals.keySet)
    vals.foreach { case (et, xs) =>
      val med = rnd6(interp(xs.sorted, 0.5))
      val devs = xs.map(x => math.abs(x - med))
      val mad = rnd6(interp(devs.sorted, 0.5))
      val nOut = devs.count(_ > 3.5 * 1.4826 * mad).toLong
      val (gMed, gMad, gN, gOut) = got(et)
      assert(gMed == med, s"$et med: got $gMed want $med")
      assert(gMad == mad, s"$et mad: got $gMad want $mad")
      assert(gN == xs.length)
      assert(gOut == nOut, s"$et outliers: got $gOut want $nOut")
    }
  }

  test("q_table_profile_sketch: every column pins within_5pct, and the " +
      "production (no-Expand) form carries the identical sketch") {
    val gated = QualityQueries.queries("q_table_profile_sketch")(spark, sf)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getBoolean(5))).toMap
    assert(gated.size == 6)
    gated.foreach { case (c, (_, _, _, _, ok)) =>
      assert(ok, s"$c: sketch estimate missed the 5% band")
    }
    // the production shape (exactPin = false — no countDistinct Expand
    // anywhere) must produce the same register-table summary
    val prodDf = QualityQueries
      .profileSketch(Tables.orders(spark, sf), exactPin = false)
    val prod = prodDf
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(prod == gated.view.mapValues(t => (t._1, t._2, t._3, t._4)).toMap)
    // and its plan must be Expand-free while the gated arm's is not
    def hasExpand(df: org.apache.spark.sql.DataFrame): Boolean =
      df.queryExecution.executedPlan.toString.contains("Expand")
    assert(!hasExpand(prodDf))
  }
}
