package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Ad-hoc stage profiler for the slow bench queries: times each stage of
  * a pipeline separately so optimization effort goes where the seconds
  * are. Usage: runMain graft.tools.Profile [sfDir]
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    import graft.operators.{Assign, Centroids}
    import graft.functions.VecFunctions._
    val pts = graft.Tables.points2d(spark, sfDir)
    pts.count() // warm scan

    time("recenter (current foldRight CASE form)") {
      Assign.withNearest(pts, Centroids.k2d)
        .groupBy(col("cluster_id"))
        .agg(count(lit(1)), avg(col("x")), avg(col("y")), sum(col("d2")))
        .collect()
    }
    time("recenter (staged dd-column form)") {
      val cs = Centroids.k2d.sortBy(_.cid)
      val withDd = pts.select(col("*") +:
        cs.map(c => distSq2(col("x"), col("y"), lit(c.cx), lit(c.cy)).as(s"dd${c.cid}")): _*)
      val mind = least(cs.map(c => col(s"dd${c.cid}")): _*)
      val cid = cs.foldRight(lit(-1)) { (c, rest) =>
        when(col(s"dd${c.cid}") === mind, lit(c.cid)).otherwise(rest)
      }
      withDd.withColumn("d2", mind).withColumn("cluster_id", cid)
        .groupBy(col("cluster_id"))
        .agg(count(lit(1)), avg(col("x")), avg(col("y")), sum(col("d2")))
        .collect()
    }
    time("recenter (current, 2nd run)") {
      Assign.withNearest(pts, Centroids.k2d)
        .groupBy(col("cluster_id"))
        .agg(count(lit(1)), avg(col("x")), avg(col("y")), sum(col("d2")))
        .collect()
    }
    time("recenter (staged, 2nd run)") {
      val cs = Centroids.k2d.sortBy(_.cid)
      val withDd = pts.select(col("*") +:
        cs.map(c => distSq2(col("x"), col("y"), lit(c.cx), lit(c.cy)).as(s"dd${c.cid}")): _*)
      val mind = least(cs.map(c => col(s"dd${c.cid}")): _*)
      val cid = cs.foldRight(lit(-1)) { (c, rest) =>
        when(col(s"dd${c.cid}") === mind, lit(c.cid)).otherwise(rest)
      }
      withDd.withColumn("d2", mind).withColumn("cluster_id", cid)
        .groupBy(col("cluster_id"))
        .agg(count(lit(1)), avg(col("x")), avg(col("y")), sum(col("d2")))
        .collect()
    }

    val docs = graft.Tables.documents(spark, sfDir)
    docs.count() // warm scan

    time("raw shingle explode+count (no hash)") {
      Dedup.rawShingles(docs, 8).count()
    }
    time("shingle base hash (md5+conv) only") {
      Dedup.rawShingles(docs, 8)
        .select(Dedup.shingleBaseHash(col("sh")).as("hm"))
        .agg(sum(col("hm"))).collect()
    }
    time("signature: exploded groupBy form") {
      Dedup.minhashSignature(Dedup.rawShingles(docs, 8), 12).count()
    }
    time("signature: narrow HOF form") {
      Dedup.minhashSignatureNarrow(docs, 8, 12).count()
    }
    time("signature: native kernel") {
      Dedup.minhashSignatureFast(docs, 8, 12).count()
    }
    time("signature: native kernel (2nd)") {
      Dedup.minhashSignatureFast(docs, 8, 12).count()
    }
    time("signature: narrow HOF (2nd)") {
      Dedup.minhashSignatureNarrow(docs, 8, 12).count()
    }
    time("bands self-join → candidate pairs") {
      val nHash = 12; val rowsPerBand = 2
      val mh = Dedup.minhashSignature(Dedup.rawShingles(docs, 8), nHash)
      val nBands = nHash / rowsPerBand
      val keyNames = (0 until rowsPerBand).map(r => s"k$r")
      val bandCols = (0 until nBands).map { bi =>
        struct(lit(bi).as("band") +:
          (0 until rowsPerBand).map(r =>
            col(s"h${bi * rowsPerBand + r}").as(s"k$r")): _*)
      }
      val bands = mh.select(col("doc_id"), explode(array(bandCols: _*)).as("b"))
        .select(col("doc_id") +: col("b.band").as("band") +:
          keyNames.map(k => col(s"b.$k").as(k)): _*)
      bands.as("x").join(bands.as("y"), "band" +: keyNames)
        .where(col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
        .distinct().count()
    }
    time("full minhashPairs") {
      Dedup.minhashPairs(docs).count()
    }
    time("full minhashPairs (2nd run)") {
      Dedup.minhashPairs(docs).count()
    }
    time("candidate stats") {
      val nHash = 12; val rowsPerBand = 2
      val mh = Dedup.minhashSignature(Dedup.rawShingles(docs, 8), nHash).cache()
      val nBands = nHash / rowsPerBand
      val keyNames = (0 until rowsPerBand).map(r => s"k$r")
      val bandCols = (0 until nBands).map { bi =>
        struct(lit(bi).as("band") +:
          (0 until rowsPerBand).map(r =>
            col(s"h${bi * rowsPerBand + r}").as(s"k$r")): _*)
      }
      val bands = mh.select(col("doc_id"), explode(array(bandCols: _*)).as("b"))
        .select(col("doc_id") +: col("b.band").as("band") +:
          keyNames.map(k => col(s"b.$k").as(k)): _*)
      val cand = bands.as("x").join(bands.as("y"), "band" +: keyNames)
        .where(col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
        .distinct().cache()
      val nPairs = cand.count()
      val nDocs = cand.select(col("doc_a").as("d")).union(cand.select(col("doc_b").as("d")))
        .distinct().count()
      val biggestBucket = bands.groupBy(("band" +: keyNames).map(col): _*)
        .count().agg(max("count")).collect()(0).getLong(0)
      println(s"[profile] cand pairs=$nPairs candDocs=$nDocs biggestBucket=$biggestBucket")
      mh.unpersist(); cand.unpersist()
    }
    spark.stop()
  }
}
