package graft

import org.apache.spark.sql.functions._
import graft.operators._

/** Unit + property coverage for the k-means operator family
  * (SURVEY §5.2-5.4).
  */
class KMeansSpec extends SparkSpec {
  import Recenter.RepairPolicy

  test("distance kernels: 1-D, 2-D, n-dim agree with plain Scala") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(50)((rnd.nextDouble() * 100, rnd.nextDouble() * 100,
      Array.fill(16)(rnd.nextDouble())))
    val df = rows.toDF("x", "y", "v")
    val c = Array.fill(16)(0.25)
    val got = df.select(
      graft.functions.VecFunctions.distSq2(col("x"), col("y"), lit(3.0), lit(4.0)),
      graft.functions.VecFunctions.distSq1(col("x"), lit(5.0)),
      graft.functions.VecFunctions.distSqN(col("v"), array(c.map(lit(_)): _*)))
      .collect()
    rows.zip(got).foreach { case ((x, y, v), r) =>
      val d2 = (x - 3.0) * (x - 3.0) + (y - 4.0) * (y - 4.0)
      val d1 = (x - 5.0) * (x - 5.0)
      val dn = v.zip(c).map { case (a, b) => (a - b) * (a - b) }.foldLeft(0.0)(_ + _)
      assert(math.abs(r.getDouble(0) - d2) < 1e-12)
      assert(math.abs(r.getDouble(1) - d1) < 1e-12)
      assert(math.abs(r.getDouble(2) - dn) < 1e-12)
    }
  }

  test("argmin ties break toward the lowest cid (mapper.py:43 strict <)") {
    import spark.implicits._
    // point exactly equidistant to centroids 1 and 2 (FIXTURES.md
    // points_tie case)
    val cs = Seq(Centroid2D(0, 0.0, 0.0), Centroid2D(1, 10.0, 0.0), Centroid2D(2, 20.0, 0.0))
    val df = Seq((15.0, 0.0)).toDF("x", "y")
    val cid = Assign.withNearest(df, cs).select("cluster_id").head().getInt(0)
    assert(cid == 1)
    // 1-D tie
    val cs1 = Seq(Centroid1D(0, 5.0), Centroid1D(1, 15.0))
    val df1 = Seq(10.0).toDF("x")
    val cid1 = df1.select(Assign.nearestCid1(col("x"), cs1)).head().getInt(0)
    assert(cid1 == 0)
  }

  test("expression form == relational form on fixture data (J1 cross-check)") {
    val pts = Tables.points2d(spark, sf)
    val exprForm = Assign.withNearest(pts, Centroids.k2d)
      .groupBy("cluster_id").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val relForm = Assign.nearestRelational(
      pts, Centroids.toDF(spark, Centroids.k2d),
      Seq("l_orderkey", "l_linenumber", "x", "y"))
      .groupBy("cluster_id").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(exprForm == relForm)
  }

  test("every point is assigned to its true nearest centroid (property)") {
    val sample = Assign.withNearest(Tables.points2d(spark, sf), Centroids.k2d)
      .limit(500).collect()
    sample.foreach { r =>
      val x = r.getDouble(r.fieldIndex("x")); val y = r.getDouble(r.fieldIndex("y"))
      val best = Centroids.k2d.minBy(c => (x - c.cx) * (x - c.cx) + (y - c.cy) * (y - c.cy))
      assert(r.getInt(r.fieldIndex("cluster_id")) == best.cid)
    }
  }

  test("recenter means are the arithmetic mean of members (property)") {
    val assigned = Assign.withNearest(Tables.points2d(spark, sf), Centroids.k2d)
    val means = Recenter.means(assigned).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    val manual = assigned.collect().groupBy(_.getInt(4)) // cluster_id idx 4
    manual.foreach { case (cid, rows) =>
      val (n, mx, my) = means(cid)
      assert(n == rows.length)
      val ex = rows.map(_.getDouble(2)).sum / rows.length
      val ey = rows.map(_.getDouble(3)).sum / rows.length
      assert(math.abs(mx - ex) < 1e-6 && math.abs(my - ey) < 1e-6)
    }
  }

  test("empty-cluster repair: KeepOld keeps, Rerandomize stays in bbox") {
    val cs = Centroids.k2dWithEmpty
    val assigned = Assign.withNearest(Tables.points2d(spark, sf), cs)
    val kept = Recenter.recenter(spark, assigned, cs, RepairPolicy.KeepOld)
    assert(kept.find(_.cid == 8).get == Centroid2D(8, 1.0e9, 1.0e9))
    val rer = Recenter.recenter(spark, assigned, cs, RepairPolicy.Rerandomize(1L))
    val c8 = rer.find(_.cid == 8).get
    assert(c8.cx >= 914.0 && c8.cx <= 105000.0 && c8.cy >= 1.0 && c8.cy <= 50.0)
    // non-empty clusters unaffected by policy choice
    assert(kept.filter(_.cid != 8) == rer.filter(_.cid != 8))
  }

  test("SSE is monotone non-increasing across Lloyd iterations (KeepOld)") {
    val res = KMeansLoop.fit(spark, Tables.points2d(spark, sf),
      Centroids.k2d, maxIter = 8, delta = 0.0) // delta 0: never early-stop
    res.sseHistory.sliding(2).foreach {
      case Seq(a, b) => assert(b <= a + 1e-6, s"SSE increased: $a -> $b")
      case _ =>
    }
  }

  test("fit converges with delta=0.5 like master.py:365") {
    val res = KMeansLoop.fit(spark, Tables.points2d(spark, sf),
      Centroids.k2d, maxIter = 50, delta = 0.5)
    assert(res.converged && res.iterations < 50)
  }

  test("result invariant under row order (property: repartition+shuffle)") {
    val pts = Tables.points2d(spark, sf)
    val shuffled = pts.repartition(7, col("y"))
    val a = Assign.withNearest(pts, Centroids.k2d)
      .groupBy("cluster_id").count().collect()
      .map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1).toSeq
    val b = Assign.withNearest(shuffled, Centroids.k2d)
      .groupBy("cluster_id").count().collect()
      .map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(a == b)
  }

  test("n-dim typed-Aggregator fit matches 2-D loop on 2-dim data") {
    import spark.implicits._
    val pts2 = Tables.points2d(spark, sf)
    val ptsNd = pts2.select(array(col("x"), col("y")).as("vec"))
    val init2d = Centroids.k2d
    val initNd = init2d.map(c => CentroidND(c.cid, Array(c.cx, c.cy)))
    val r2 = KMeansLoop.fit(spark, pts2, init2d, maxIter = 3, delta = 0.0)
    val rn = KMeansND.fit(spark, ptsNd, initNd, maxIter = 3, delta = 0.0)
    r2.centroids.zip(rn.centroids).foreach { case (a, b) =>
      assert(math.abs(a.cx - b.vec(0)) < 1e-9 && math.abs(a.cy - b.vec(1)) < 1e-9)
    }
  }

  test("MLlib flagship runs and improves on random-init SSE (sanity)") {
    val df = operators.MLlibFlagship.run(spark, sf)
    assert(df.count() == 10)
  }

  test("SparkEntry.entry smoke: rows > 0 (the driver's exact check)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
