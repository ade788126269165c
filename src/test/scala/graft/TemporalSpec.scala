package graft

import org.apache.spark.sql.functions._
import graft.operators.TemporalJoin

/** TemporalJoin semantics vs brute-force references, plus the plan
  * properties that are the whole point of the implementations: as-of is
  * one exchange (no join operator at all), banded range is a hash join
  * (never nested-loop / cartesian).
  */
class TemporalSpec extends SparkSpec {
  import org.apache.spark.sql.DataFrame

  private def evUs: DataFrame =
    Tables.events(spark, sf).select(
      col("event_id"), col("user_id"), expr("ts_ns DIV 1000").as("ts_us"),
      col("event_type"), col("value"))

  test("subsequence search equals a full driver-side z-norm replay") {
    val got = graft.queries.TemporalQueries
      .queries("q_ts_subseq_search")(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    // independent replay: same windows, same ascending fold order, same
    // σ=0 rule, same rounding, same (d6, user, pos) ranking
    val ev = evUs.select("user_id", "ts_us", "event_id", "value").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val m = 8
    val qUser = ev.groupBy(_._1).filter(_._2.length >= m).keys.min
    val q = ev.filter(_._1 == qUser).sortBy(e => (e._2, e._3)).take(m).map(_._4)
    def fsum(xs: Seq[Double]) = xs.foldLeft(0.0)(_ + _)
    def zn(xs: Seq[Double]): Seq[Double] = {
      val mu = fsum(xs) / m.toDouble
      val sd = math.sqrt(fsum(xs.map(x => (x - mu) * (x - mu))) / m.toDouble)
      xs.map(x => if (sd > 0.0) (x - mu) / sd else 0.0)
    }
    val zq = zn(q.toSeq)
    val cand = ev.groupBy(_._1).toSeq.flatMap { case (u, es) =>
      val vs = es.sortBy(e => (e._2, e._3)).map(_._4)
      vs.indices.dropRight(m - 1).map { i =>
        val zw = zn(vs.slice(i, i + m).toSeq)
        val d2 = fsum(zw.zip(zq).map { case (a, b) => (a - b) * (a - b) })
        (u, i + 1, math.floor(d2 * 1e6 + 0.5) / 1e6)
      }
    }
    val expect = cand.sortBy(c => (c._3, c._1, c._2)).take(20)
      .zipWithIndex.map { case ((u, p, d), i) => (i + 1, u, p, d) }
    assert(got.toSeq == expect,
      s"replay mismatch:\n got=${got.toSeq}\n exp=$expect")
  }

  test("motif discovery equals a full driver-side SAX-bucketed replay") {
    val got = graft.queries.TemporalQueries
      .queries("q_ts_motif")(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getInt(2),
        r.getLong(3), r.getInt(4), r.getDouble(5)))
    // independent replay: same windows, same ascending folds, same
    // constant-window (sd = 0) exclusion, same SAX quartile symbols,
    // same trivial-match exclusion, same per-window nearest and global
    // top-20 ranking
    val ev = evUs.select("user_id", "ts_us", "event_id", "value").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val m = 8
    val bp = 0.6744897501960817
    def fsum(xs: Seq[Double]) = xs.foldLeft(0.0)(_ + _)
    def zn(xs: Seq[Double]): Option[Seq[Double]] = {
      val mu = fsum(xs) / m.toDouble
      val sd = math.sqrt(fsum(xs.map(x => (x - mu) * (x - mu))) / m.toDouble)
      if (sd > 0.0) Some(xs.map(x => (x - mu) / sd)) else None
    }
    def sax(zw: Seq[Double]): String = zw.map(x =>
      if (x >= bp) '3' else if (x >= 0.0) '2'
      else if (x >= -bp) '1' else '0').mkString
    val wins = ev.groupBy(_._1).toSeq.flatMap { case (u, es) =>
      val vs = es.sortBy(e => (e._2, e._3)).map(_._4)
      vs.indices.dropRight(m - 1).flatMap { i =>
        zn(vs.slice(i, i + m).toSeq).map(zw => (u, i + 1, zw, sax(zw)))
      }
    }
    val bySax = wins.groupBy(_._4)
    val nearest = wins.flatMap { case (ua, pa, za, sg) =>
      val cands = bySax(sg).filter { case (ub, pb, _, _) =>
        !(ub == ua && math.abs(pb - pa) < m)
      }.map { case (ub, pb, zb, _) =>
        val d2 = fsum(za.zip(zb).map { case (x, y) => (x - y) * (x - y) })
        (math.floor(d2 * 1e6 + 0.5) / 1e6, ub, pb)
      }
      if (cands.isEmpty) None
      else { val (d, ub, pb) = cands.min; Some((ua, pa, ub, pb, d)) }
    }
    val expect = nearest.sortBy(c => (c._5, c._1, c._2)).take(20)
      .zipWithIndex.map { case ((ua, pa, ub, pb, d), i) =>
        (i + 1, ua, pa, ub, pb, d) }
    assert(expect.nonEmpty, "motif gate is vacuous at fixture scale")
    assert(got.toSeq == expect,
      s"replay mismatch:\n got=${got.toSeq}\n exp=$expect")
  }

  test("motif window stage routes constant bursts out of the pair join") {
    // the designed degenerate input: constant-valued series are common
    // in real data (fixed-price purchases, heartbeat metrics) and every
    // constant window z-norms to the same shape — admitted to the SAX
    // join they would all share ONE bucket and the candidate space goes
    // quadratic. Inject fixture-scale constant runs next to varying
    // users and pin that (a) no zero-variance window reaches the join,
    // (b) the candidate count stays at the varying-only volume, orders
    // of magnitude below what the degenerate bucket would have cost.
    import spark.implicits._
    val m = 8
    val constUsers = (1L to 3L).flatMap { u =>
      (1 to 300).map(i => (u, i.toLong * 1000L, i.toLong, 42.0))
    }
    val varyUsers = (4L to 6L).flatMap { u =>
      (1 to 40).map(i =>
        (u, i.toLong * 1000L, i.toLong, math.sin(u * 17.0 + i).abs * 10.0))
    }
    val e = (constUsers ++ varyUsers)
      .toDF("user_id", "ts_us", "event_id", "value")
    val wind = graft.queries.TemporalQueries.motifWindows(e)
    val nConstWindows = 3 * (300 - m + 1)  // windows the filter must drop
    val nVaryWindows = 3 * (40 - m + 1)
    assert(wind.count() == nVaryWindows,
      "constant windows leaked into the motif window stage")
    val pairs = wind.as("a").join(wind.as("b"), "sg")
      .where(!(col("a.user_id") === col("b.user_id") &&
        abs(col("a.pos") - col("b.pos")) < m))
      .count()
    // had the constant windows been admitted, the "22222222" bucket
    // alone would contribute ~all-pairs of 879 windows (≈770k minus the
    // trivial-match band) — the bound below is two orders under that
    val degenerateFloor = {
      val n = nConstWindows.toLong
      n * n - 3L * 293L * (2 * m - 1) // minus the per-user trivial band
    }
    assert(pairs < nVaryWindows.toLong * nVaryWindows,
      s"candidate count $pairs not bounded by the varying-only volume")
    assert(pairs < degenerateFloor / 100,
      s"candidate count $pairs is within 100x of the degenerate-bucket volume")
  }

  test("CUSUM equals a sequential driver replay; both alarmed and quiet users exist") {
    val got = graft.queries.TemporalQueries
      .queries("q_ts_cusum")(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    val ev = evUs.select("user_id", "ts_us", "event_id", "value").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val (k, h) = (2000L, 25000L)
    val expect = ev.groupBy(_._1).map { case (u, es) =>
      val xs = es.sortBy(e => (e._2, e._3))
        .map(e => math.floor(e._4 * 100.0 + 0.5).toLong)
      val mu = xs.sum / xs.length
      var s = 0L; var na = 0L; var fp = 0L; var pos = 0L; var smax = 0L
      xs.foreach { x =>
        val s1 = math.max(0L, s + x - mu - k); pos += 1
        if (s1 > h) { if (fp == 0L) fp = pos; na += 1; s = 0L } else s = s1
        smax = math.max(smax, s1)
      }
      u -> (xs.length.toLong, mu, na, fp, smax)
    }
    assert(got == expect, s"CUSUM replay mismatch")
    assert(got.values.exists(_._3 > 0L), "no user ever alarms — gate vacuous")
    assert(got.values.exists(_._3 == 0L), "every user alarms — threshold toothless")
    // first_alarm is consistent: set iff any alarm, within the series
    got.foreach { case (u, (n, _, na, fp, _)) =>
      assert((na > 0) == (fp > 0) && fp <= n, s"user $u alarm bookkeeping broken")
    }
  }

  test("asOf matches per-row brute-force argmax") {
    val e = evUs
    val clicks = e.where(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts_us"))
    val purchases = e.where(col("event_type") === "purchase")
      .groupBy(col("user_id"), col("ts_us").as("p_ts"))
      .agg(max(col("event_id")).as("p_event"))

    val got = TemporalJoin.asOf(clicks, purchases, Seq("user_id"),
        "ts_us", "p_ts", Seq("p_ts", "p_event"))
      .collect()
      .map(r => r.getLong(2) -> (if (r.isNullAt(3)) None else Some((r.getLong(3), r.getLong(4)))))
      .toMap

    val ps = purchases.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val want = clicks.collect().map { c =>
      val (eid, uid, ts) = (c.getLong(0), c.getLong(1), c.getLong(2))
      val cands = ps.filter(p => p._1 == uid && p._2 <= ts)
      eid -> (if (cands.isEmpty) None
              else Some(cands.maxBy(p => (p._2, p._3))).map(p => (p._2, p._3)))
    }.toMap
    assert(got == want)
  }

  test("asOf plans exactly one (non-reused) exchange and zero joins") {
    val e = evUs
    val l = e.where(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts_us"))
    val r = e.where(col("event_type") === "purchase")
      .select(col("user_id"), col("ts_us").as("p_ts"), col("value").as("p_value"))
      .dropDuplicates("user_id", "p_ts")
    val p = plan(TemporalJoin.asOf(l, r, Seq("user_id"), "ts_us", "p_ts",
      Seq("p_ts", "p_value")))
    assert(!p.contains("Join"), s"as-of should not plan a join:\n$p")
    // the union feeds one hashpartitioning(user_id) exchange for the window
    // (dropDuplicates adds its own upstream agg exchange on the right side)
    val n = "(?<!Reused)Exchange hashpartitioning".r.findAllIn(p).length
    assert(n <= 2, s"too many exchanges:\n$p")
  }

  test("asOf works when the left side has ONLY key + timestamp columns") {
    import spark.implicits._
    val l = Seq((1L, 10L), (1L, 20L), (2L, 5L)).toDF("k", "ts")
    val r = Seq((1L, 8L, "a"), (1L, 15L, "b"), (2L, 9L, "c")).toDF("k", "rts", "pay")
    val got = TemporalJoin.asOf(l, r, Seq("k"), "ts", "rts", Seq("rts", "pay"))
      .collect().map(x => (x.getLong(0), x.getLong(1),
        if (x.isNullAt(3)) null else x.getString(3))).toSet
    assert(got == Set((1L, 10L, "a"), (1L, 20L, "b"), (2L, 5L, null)))
  }

  test("hopping windows: every event in exactly width/slide windows") {
    val rows = graft.queries.RelationalQueries
      .queries("q_hopping_window")(spark, sf).collect()
    val nEvents = Tables.events(spark, sf).count()
    assert(rows.map(_.getLong(2)).sum == 2 * nEvents,
      "width 10min / slide 5min => each event counted in exactly 2 windows")
    // starts are slide-aligned and consecutive windows overlap
    val starts = rows.map(_.getLong(0)).distinct.sorted
    assert(starts.forall(_ % 300 == 0), "window starts align to the slide")
  }

  test("bandedRange equals the naive inequality join") {
    val e = evUs
    val l = e.where(col("event_type") === "signup")
      .select(col("event_id").as("s_event"), col("user_id"), col("ts_us").as("s_ts"))
    val r = e.select(col("user_id"), col("ts_us"), col("event_id").as("r_event"))
    val W = 3600L * 1000000L

    val got = TemporalJoin.bandedRange(l, r, "user_id", "s_ts", "ts_us", W)
      .select("s_event", "r_event").collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet

    val ls = l.collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    val rs = r.collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    val want = (for {
      (se, lu, st) <- ls
      (ru, ts, re) <- rs
      if lu == ru && ts >= st && ts < st + W
    } yield (se, re)).toSet
    assert(got == want)
  }

  test("bandedRange plans a hash join, never nested-loop/cartesian") {
    val e = evUs
    val l = e.where(col("event_type") === "signup")
      .select(col("event_id").as("s_event"), col("user_id"), col("ts_us").as("s_ts"))
    val p = plan(TemporalJoin.bandedRange(l,
      e.select(col("user_id"), col("ts_us")), "user_id", "s_ts", "ts_us", 60000000L))
    assert(p.contains("HashJoin"), s"expected a hash join:\n$p")
    assert(!p.contains("NestedLoop") && !p.contains("Cartesian"),
      s"range join degenerated:\n$p")
  }
}
