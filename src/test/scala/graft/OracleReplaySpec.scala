package graft

import org.apache.spark.sql.functions._
import graft.operators._

/** SURVEY §5.4 sequential-oracle replay + §5.5 MLlib cross-check.
  *
  * §5.4: a plain-Scala reimplementation of sequential-kmeans.py (with the
  * CORRECT argmin — the reference's line 25 stores an unsquared signed
  * diff, SURVEY §3.2) run against the distributed DataFrame loop on
  * identical seeded input.
  *
  * §5.5: the RDD-level `mllib.clustering.KMeans` accepts an initial model
  * (the DataFrame-level `ml` API does not), enabling an identical-init
  * comparison: same centers, same iteration cap → same centroids.
  */
class OracleReplaySpec extends SparkSpec {

  /** sequential-kmeans.py main loop (lines 14-58), correct argmin,
    * keep-old-on-empty (line 46-49), pure Scala.
    */
  private def sequentialKMeans(xs: Seq[Double], init: Seq[Double], iters: Int): Seq[Double] = {
    var ks = init
    (0 until iters).foreach { _ =>
      val groups = xs.groupBy { x =>
        ks.zipWithIndex.minBy { case (k, _) => (x - k) * (x - k) }._2
      }
      ks = ks.zipWithIndex.map { case (k, i) =>
        groups.get(i).map(g => g.sum / g.length).getOrElse(k)
      }
    }
    ks
  }

  test("sequential 1-D oracle replay == distributed loop on seeded input") {
    import spark.implicits._
    val rnd = new scala.util.Random(99)
    val xs = Seq.fill(2000)(rnd.nextDouble() * 100.0)
    val init = Seq(10.0, 40.0, 70.0)
    val want = sequentialKMeans(xs, init, iters = 4)
    // distributed: same data as (x, 0) 2-D points, same init at y=0 —
    // distances reduce to the 1-D case exactly
    val init2d = init.zipWithIndex.map { case (c, i) => Centroid2D(i, c, 0.0) }
    val got = KMeansLoop.fit(spark, xs.map((_, 0.0)).toDF("x", "y"), init2d,
      maxIter = 4, delta = 0.0)
    want.zip(got.centroids).foreach { case (w, g) =>
      assert(math.abs(w - g.cx) < 1e-9, s"want $w got ${g.cx}")
      assert(g.cy == 0.0)
    }
  }

  test("identical init: our ND loop matches mllib KMeans with setInitialModel") {
    import org.apache.spark.mllib.clustering.{KMeans => MllibKMeans, KMeansModel}
    import org.apache.spark.mllib.linalg.Vectors
    import graft.functions.VecFunctions.toDoubleArray
    val emb = Tables.embeddings(spark, sf)
      .select(col("vec_id"), toDoubleArray(col("embedding")).as("vec"))
    val init = Centroids.randomInitND(k = 6, dim = 64, seed = 5L, -0.5, 0.5)
    val iters = 3

    val ours = KMeansND.fit(spark, emb, init, maxIter = iters, delta = 0.0)

    val rdd = emb.select("vec").rdd
      .map(r => Vectors.dense(r.getSeq[Double](0).toArray)).cache()
    val model = new MllibKMeans()
      .setK(6).setMaxIterations(iters).setEpsilon(0.0)
      .setInitialModel(new KMeansModel(init.map(c => Vectors.dense(c.vec)).toArray))
      .run(rdd)
    rdd.unpersist()

    // mllib preserves center order from the initial model; compare
    // element-wise (their update arithmetic is the same mean-of-members)
    ours.centroids.zip(model.clusterCenters).foreach { case (a, b) =>
      a.vec.zip(b.toArray).foreach { case (x, y) =>
        assert(math.abs(x - y) < 1e-6, s"centroid diverged: $x vs $y")
      }
    }
  }
}
