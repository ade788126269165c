package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.operators._

/** Property-based coverage (SURVEY §5.3 (a)-(e)), raw-ScalaCheck-driven
  * (the scalatest bridge artifact is not in the offline cache). Spark
  * jobs are expensive per-case, so minSuccessfulTests is small — the
  * properties, not the volume, carry the value.
  */
class PropertySpec extends SparkSpec {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(5).withMaxSize(40), p)
    assert(res.passed, res.status.toString)
  }

  private val pointGen: Gen[(Double, Double)] = for {
    x <- Gen.choose(-100.0, 100.0)
    y <- Gen.choose(-100.0, 100.0)
  } yield (x, y)

  private val pointsGen: Gen[List[(Double, Double)]] =
    Gen.nonEmptyListOf(pointGen)

  private val cs = Seq(
    Centroid2D(0, -50.0, -50.0), Centroid2D(1, 0.0, 0.0),
    Centroid2D(2, 50.0, 50.0), Centroid2D(3, -50.0, 50.0))

  test("(b) every point assigned to its true nearest centroid, any input") {
    import spark.implicits._
    check(Prop.forAll(pointsGen) { pts =>
      Assign.withNearest(pts.toDF("x", "y"), cs).collect().forall { r =>
        val x = r.getDouble(0); val y = r.getDouble(1)
        val best = cs.minBy(c => (x - c.cx) * (x - c.cx) + (y - c.cy) * (y - c.cy))
        r.getInt(r.fieldIndex("cluster_id")) == best.cid
      }
    })
  }

  test("(c) each recentered mean is the arithmetic mean of its members") {
    import spark.implicits._
    check(Prop.forAll(pointsGen) { pts =>
      val assigned = Assign.withNearest(pts.toDF("x", "y"), cs)
      val means = Recenter.means(assigned).collect()
        .map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2))).toMap
      val manual = pts.groupBy { case (x, y) =>
        cs.minBy(c => (x - c.cx) * (x - c.cx) + (y - c.cy) * (y - c.cy)).cid
      }
      manual.forall { case (cid, members) =>
        val (n, mx) = means(cid)
        n == members.length &&
          math.abs(mx - members.map(_._1).sum / members.length) < 1e-9
      }
    })
  }

  test("(d) k-means on duplicated data == k-means on the original") {
    import spark.implicits._
    check(Prop.forAll(pointsGen) { pts =>
      val once = KMeansLoop.fit(spark, pts.toDF("x", "y"), cs, maxIter = 3, delta = 0.0)
      val tripled = KMeansLoop.fit(spark, (pts ++ pts ++ pts).toDF("x", "y"), cs,
        maxIter = 3, delta = 0.0)
      once.centroids.zip(tripled.centroids).forall { case (a, b) =>
        math.abs(a.cx - b.cx) < 1e-6 && math.abs(a.cy - b.cy) < 1e-6
      }
    })
  }

  test("(e) result invariant under row order") {
    import spark.implicits._
    check(Prop.forAll(pointsGen) { pts =>
      val a = KMeansLoop.fit(spark, pts.toDF("x", "y"), cs, maxIter = 2, delta = 0.0)
      val b = KMeansLoop.fit(spark, scala.util.Random.shuffle(pts).toDF("x", "y"), cs,
        maxIter = 2, delta = 0.0)
      a.centroids.zip(b.centroids).forall { case (x, y) =>
        math.abs(x.cx - y.cx) < 1e-9 && math.abs(x.cy - y.cy) < 1e-9
      }
    })
  }

  test("(a) SSE monotone non-increasing (KeepOld) on random inputs") {
    import spark.implicits._
    check(Prop.forAll(Gen.listOfN(60, pointGen)) { pts =>
      val res = KMeansLoop.fit(spark, pts.toDF("x", "y"), cs, maxIter = 5, delta = 0.0)
      res.sseHistory.sliding(2).forall {
        case Seq(p, n) => n <= p + 1e-6
        case _ => true
      }
    })
  }

  test("distance kernels bit-equal a manual sequential fold on random vectors") {
    import spark.implicits._
    val vecGen = Gen.listOfN(16, Gen.choose(-10.0, 10.0))
    check(Prop.forAll(vecGen, vecGen) { (a, b) =>
      val got = Seq((a.toArray, b.toArray)).toDF("a", "b").select(
        graft.functions.VecFunctions.distSqN(col("a"), col("b")),
        graft.functions.ArrayKernels.distSqFast(col("a"), col("b"))).head()
      val want = a.zip(b).map { case (p, q) => (p - q) * (p - q) }.foldLeft(0.0)(_ + _)
      got.getDouble(0) == want && got.getDouble(1) == want
    })
  }

  test("jaro-winkler kernel: bounds, symmetry, identity, on random strings") {
    import org.apache.spark.unsafe.types.UTF8String.{fromString => u8}
    def jw(a: String, b: String): Double =
      graft.functions.JaroWinklerKernel.similarity(u8(a), u8(b))
    val sGen = Gen.listOf(Gen.alphaLowerChar).map(_.mkString).suchThat(_.length <= 30)
    check(Prop.forAll(sGen, sGen) { (a, b) =>
      val v = jw(a, b)
      val bounds = v >= 0.0 && v <= 1.0
      val sym = v == jw(b, a)
      val ident = a.isEmpty || jw(a, a) == 1.0
      // the Winkler boost only raises similarity and only above 0.7
      bounds && sym && ident
    })
  }

  test("bloom: no false negatives for any inserted key set") {
    import spark.implicits._
    val keysGen = Gen.nonEmptyListOf(Gen.choose(0L, Dedup.MinhashP - 1))
    check(Prop.forAll(keysGen) { ks =>
      val df = ks.toDF("hm")
      val bits = Bloom.buildBits(df, mBits = 1024)
      df.crossJoin(broadcast(bits))
        .where(!Bloom.mightContain(col("bits"), col("hm"), 1024))
        .count() == 0L
    })
  }

  test("kmv: merged k-mins = k-mins of the union, any two hash sets") {
    val setGen = Gen.nonEmptyListOf(Gen.choose(0L, 1L << 59)).map(_.distinct)
    check(Prop.forAll(setGen, setGen) { (a, b) =>
      val k = KmvSketch.K
      val ska = a.sorted.take(k)
      val skb = b.sorted.take(k)
      val merged = (ska ++ skb).distinct.sorted.take(k)
      val direct = (a ++ b).distinct.sorted.take(k)
      merged == direct
    })
  }

  test("bpe merge fold == a naive greedy scala fold, any word/pair") {
    import spark.implicits._
    val symGen = Gen.oneOf("a", "b", "ab", "c")
    val wordGen = Gen.nonEmptyListOf(symGen).map(_.take(12))
    def naive(syms: List[String], l: String, r: String): List[String] = {
      val out = List.newBuilder[String]
      var i = 0
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
          out += (l + r); i += 2
        } else { out += syms(i); i += 1 }
      }
      out.result()
    }
    check(Prop.forAll(wordGen, symGen, symGen) { (w, l, r) =>
      val got = Seq(Tuple1(w)).toDF("syms")
        .select(BpeTrain.mergeFold(col("syms"), l, r).as("m"))
        .head().getSeq[String](0).toList
      got == naive(w, l, r)
    })
  }

  test("substring spans == a naive window/merge replay, any tiny corpus") {
    import spark.implicits._
    val W = 3
    val word = Gen.oneOf("x", "y", "z", "w")
    val docGen = Gen.listOfN(8, word).map(_.mkString(" "))
    val corpusGen = Gen.nonEmptyListOf(docGen).map(_.take(6))
    check(Prop.forAll(corpusGen) { texts =>
      // ids assigned INSIDE the property so shrinking can't duplicate them
      val corpus = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val df = corpus.toDF("doc_id", "text")
      val got = Dedup.substringSpans(df, w = W).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      // naive: count window occurrences, mark duplicated starts, merge
      val toks = corpus.map { case (d, t) =>
        d -> t.toLowerCase.split("\\s+").filter(_.nonEmpty) }.toMap
      val occ = scala.collection.mutable.Map.empty[String, Int]
      toks.values.foreach(_.sliding(W).filter(_.length == W)
        .foreach(w0 => occ.updateWith(w0.mkString(" "))(c => Some(c.getOrElse(0) + 1))))
      val want = toks.flatMap { case (d, ts) =>
        val starts = ts.sliding(W).zipWithIndex.collect {
          case (w0, i) if w0.length == W && occ(w0.mkString(" ")) > 1 => i + 1L
        }.toList
        // interval merge over sorted starts: [s, s+W-1] joins the open
        // interval iff it overlaps or is adjacent (s <= prevEnd + 1)
        starts.foldLeft(List.empty[(Long, Long)]) {
          case ((s0, e0) :: rest, s) if s <= e0 + 1 => (s0, s + W - 1) :: rest
          case (acc, s) => (s, s + W - 1) :: acc
        }.map { case (s, e) => (d, s, e) }
      }.toSet
      got == want
    })
  }

  test("quantile summary: bottom-K pair merge is lossless, any partition") {
    val pairGen = Gen.nonEmptyListOf(for {
      pr <- Gen.choose(0L, 1000L); v <- Gen.choose(0.0, 100.0)
    } yield (pr, v))
    check(Prop.forAll(pairGen, pairGen) { (a, b) =>
      val K = 16
      def summarize(ps: List[(Long, Double)]) =
        ps.groupMapReduce(_._1)(_._2)(math.min)
          .toSeq.sortBy(identity).take(K).toList
      // merging two segment summaries then re-summarizing equals
      // summarizing the union directly
      summarize(summarize(a) ++ summarize(b)) == summarize(a ++ b)
    })
  }
}
