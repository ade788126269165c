package graft

import org.apache.spark.sql.functions._
import graft.operators.SkewJoin

/** Scale patterns: salting and bucketing — correctness + plan shape. */
class ScaleSpec extends SparkSpec {

  test("salted join returns exactly the plain join's rows under skew") {
    import spark.implicits._
    // skewed left: key 1 carries 10k rows, others 10 each
    val left = ((1 to 10000).map(i => (1, i)) ++
      (2 to 50).flatMap(k => (1 to 10).map(i => (k, i * 100 + k))))
      .toDF("k", "payload")
    val right = (1 to 50).map(k => (k, s"dim_$k")).toDF("k", "name")
    val plain = left.join(right, "k")
    val salted = SkewJoin.saltedInnerJoin(left, right, "k", salts = 8,
      saltFrom = Seq("payload"))
    assert(salted.count() == plain.count())
    assert(salted.groupBy("k").count().collect().map(r => r.getInt(0) -> r.getLong(1)).toMap ==
      plain.groupBy("k").count().collect().map(r => r.getInt(0) -> r.getLong(1)).toMap)
    // the salted exchange partitions on (k, _salt): the hot key spreads
    val p = salted.queryExecution.executedPlan.toString
    assert(p.contains("_salt"), s"salt column missing from plan:\n$p")
  }

  test("compaction collapses a fragmented dataset without losing rows") {
    import graft.operators.Compact
    val frag = java.nio.file.Files.createTempDirectory("frag").toString
    val compacted = java.nio.file.Files.createTempDirectory("compacted").toString
    // fragment: 40 tiny files
    Tables.documents(spark, sf).repartition(40)
      .write.mode("overwrite").parquet(frag)
    val (nFrag, bytes) = Compact.datasetFiles(spark, frag)
    assert(nFrag == 40)
    val stats = Compact.compactParquet(spark, frag, compacted,
      targetBytes = bytes) // target = whole dataset → 1 file
    assert(stats.outFiles == 1, s"expected 1 output file, got $stats")
    assert(stats.rows == Tables.documents(spark, sf).count())
    // identical content, not just counts
    val a = spark.read.parquet(compacted).select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val b = Tables.documents(spark, sf).select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(a == b)
  }

  test("JSON-lines events round-trip losslessly with an explicit schema") {
    import graft.sources.TextFormats
    val dir = java.nio.file.Files.createTempDirectory("events-jsonl").toString
    val ev = Tables.events(spark, sf)
    TextFormats.writeEventsJsonl(ev, dir)
    val back = TextFormats.readEventsJsonl(spark, dir)
    val a = back.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .toSet
    val b = ev.select(col("event_id"), expr("ts_ns DIV 1000"),
        col("user_id"), col("event_type")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .toSet
    assert(a == b)
  }

  test("ORC source round-trips lineitem content and pushes filters to the scan") {
    val dir = java.nio.file.Files.createTempDirectory("orc-rt").toString
    val li = Tables.lineitem(spark, sf)
    li.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    assert(back.columns.toSeq == li.columns.toSeq)
    // content digest: counts + exact integral sum + double sum at 2dp
    def digest(df: org.apache.spark.sql.DataFrame) = df.agg(
      count(lit(1)), sum(col("l_quantity")),
      floor(sum(col("l_extendedprice")) / 100.0)).head()
    assert(digest(back) == digest(li))
    // predicate pushdown reaches the ORC scan like parquet
    val plan = back.where(col("l_quantity") < 5.0)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("l_quantity"),
      s"no pushed filter in ORC scan:\n$plan")
  }

  test("range-partitioned layout: per-file min/max ranges are disjoint (enables file skipping)") {
    val dir = java.nio.file.Files.createTempDirectory("clustered").toString
    Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_extendedprice"))
      .repartitionByRange(4, col("l_extendedprice"))
      .write.mode("overwrite").parquet(dir)
    // per-file price ranges must not overlap — the property min-max
    // row-group statistics need for a selective filter to skip files
    val ranges = spark.read.parquet(dir)
      .withColumn("f", input_file_name())
      .groupBy(col("f"))
      .agg(min(col("l_extendedprice")).as("lo"), max(col("l_extendedprice")).as("hi"))
      .collect().map(r => (r.getDouble(1), r.getDouble(2))).sortBy(_._1)
    assert(ranges.length == 4)
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) =>
        assert(hi1 <= lo2, s"overlapping file ranges: $hi1 > $lo2")
      case _ =>
    }
  }

  test("hive-style partitionBy layout: the partition filter prunes the scan") {
    val dir = java.nio.file.Files.createTempDirectory("orders-part").toString
    Tables.orders(spark, sf)
      .withColumn("pri", substring(col("o_orderpriority"), 1, 1))
      .write.mode("overwrite").partitionBy("pri").parquet(dir)
    val rd = spark.read.parquet(dir).where(col("pri") === "3")
    val p = plan(rd)
    // the predicate must land in PartitionFilters (directory pruning),
    // NOT as a row-level data filter
    assert(p.contains("PartitionFilters") && p.replaceAll("\\s+", " ")
      .matches("(?s).*PartitionFilters: \\[[^\\]]*pri[^\\]]*=[^\\]]*3[^\\]]*\\].*"),
      s"partition filter not pushed to the directory level:\n$p")
    // only the pri=3 directory's files are read
    val files = rd.select(input_file_name()).distinct()
      .collect().map(_.getString(0))
    assert(files.nonEmpty && files.forall(_.contains("pri=3")),
      s"scan read non-matching partitions: ${files.filterNot(_.contains("pri=3")).take(3).mkString}")
    // and the answer equals the unpartitioned filter
    val expect = Tables.orders(spark, sf)
      .where(substring(col("o_orderpriority"), 1, 1) === "3").count()
    assert(rd.count() == expect)
  }

  test("dynamic partition pruning: a selective dim filter prunes fact partitions at runtime") {
    val dir = java.nio.file.Files.createTempDirectory("li-part").toString
    Tables.lineitem(spark, sf)
      .withColumn("lsk", pmod(col("l_suppkey"), lit(10L)))
      .write.mode("overwrite").partitionBy("lsk").parquet(dir)
    val fact = spark.read.parquet(dir)
    val dim = Tables.supplier(spark, sf)
      .where(col("s_nationkey") === 3)
      .select(pmod(col("s_suppkey"), lit(10L)).as("dsk")).distinct()
    val joined = fact.join(dim, fact("lsk") === dim("dsk"))
      .groupBy(col("lsk")).agg(count(lit(1)).as("n"))
    val p = plan(joined)
    assert(p.toLowerCase.contains("dynamicpruning"),
      s"no dynamic-pruning subquery on the fact scan:\n$p")
    // correctness: equals the statically-filtered equivalent
    val keys = dim.collect().map(_.getLong(0)).toSet
    val expect = Tables.lineitem(spark, sf)
      .withColumn("lsk", pmod(col("l_suppkey"), lit(10L)))
      .where(col("lsk").isin(keys.toSeq: _*))
      .groupBy(col("lsk")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // partition columns read back from directory names are inferred INT
    assert(joined.select(col("lsk").cast("long"), col("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap == expect)
  }

  test("bucketed tables join without an exchange (co-located join)") {
    val s2 = spark // warehouse dir set (static conf) in SparkSpec
    s2.sql("DROP TABLE IF EXISTS li_b")
    s2.sql("DROP TABLE IF EXISTS ord_b")
    Tables.lineitem(s2, sf).select("l_orderkey", "l_quantity")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("li_b")
    Tables.orders(s2, sf).select("o_orderkey", "o_totalprice")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("ord_b")
    val joined = s2.table("li_b").join(s2.table("ord_b"),
      col("l_orderkey") === col("o_orderkey"))
    // force a shuffle-join path to observe bucketing (disable broadcast)
    val threshold = s2.conf.get("spark.sql.autoBroadcastJoinThreshold")
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val p = joined.queryExecution.executedPlan.toString
      assert(!p.contains("Exchange"),
        s"bucketed join should not shuffle:\n$p")
      assert(joined.count() > 0)
    } finally s2.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
  }

  test("bucketed snapshot generations diff without an exchange (CDC at rest)") {
    // the Cdc scaladoc's 100-TB layout contract, proven rather than
    // claimed: a full-outer join can never broadcast, but two
    // generations written bucketed on the key diff as a narrow zip of
    // co-bucketed files — zero Exchange in the plan
    val s2 = spark
    s2.sql("DROP TABLE IF EXISTS snap_a")
    s2.sql("DROP TABLE IF EXISTS snap_b")
    val a = Tables.orders(s2, sf).select("o_orderkey", "o_orderpriority")
    a.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("snap_a")
    a.where(col("o_orderkey") % 97 =!= 0)
      .withColumn("o_orderpriority",
        when(col("o_orderkey") % 31 === 0, lit("X-DIFF"))
          .otherwise(col("o_orderpriority")))
      .unionAll(a.where(col("o_orderkey") % 101 === 0)
        .withColumn("o_orderkey", col("o_orderkey") + lit(10000000000L)))
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("snap_b")
    val diff = graft.operators.Cdc.snapshotDiff(
      s2.table("snap_a"), s2.table("snap_b"),
      "o_orderkey", Seq("o_orderpriority"))
    val p = diff.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"),
      s"bucketed CDC diff should not shuffle:\n${p.take(3000)}")
    // and the diff itself is still exactly the mutation census
    val ops = diff.groupBy(col("op")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val keys = a.select(col("o_orderkey")).collect().map(_.getLong(0))
    assert(ops.getOrElse("D", 0L) == keys.count(_ % 97 == 0))
    assert(ops.getOrElse("U", 0L) == keys.count(k => k % 31 == 0 && k % 97 != 0))
    assert(ops.getOrElse("I", 0L) == keys.count(_ % 101 == 0))
  }

  test("z-order layout prunes on the non-leading dimension; 1-D sort cannot") {
    import graft.functions.ZOrder
    // two independent 10-bit dims hash-spread over [0, 1024) so both
    // cover the full space at any fixture scale
    val base = Tables.lineitem(spark, sf)
      .select(pmod(hash(col("l_partkey")), lit(1024)).cast("long").as("x"),
        pmod(hash(col("l_suppkey")), lit(1024)).cast("long").as("y"))
      .withColumn("zkey", ZOrder.zvalue2(col("x"), col("y"), bits = 10))
    val zDir = java.nio.file.Files.createTempDirectory("zorder").toString
    val linDir = java.nio.file.Files.createTempDirectory("linear").toString
    // coalesce(1) first: repartitionByRange picks boundaries by SAMPLING
    // the input partitions, and the scan's split layout varies with
    // scheduler load — a one-partition input makes the sample (hence
    // file boundaries, hence the skip count below) deterministic
    base.coalesce(1).repartitionByRange(16, col("zkey"))
      .sortWithinPartitions("zkey")
      .write.mode("overwrite").parquet(zDir)
    base.coalesce(1).repartitionByRange(16, col("x"))
      .sortWithinPartitions("x")
      .write.mode("overwrite").parquet(linDir)
    // per-file y min/max = exactly the stats parquet row-group/file
    // skipping consults; count files a y-band predicate must open
    def overlapping(dir: String, lo: Long, hi: Long): (Int, Int) = {
      val files = new java.io.File(dir).listFiles()
        .filter(_.getName.endsWith(".parquet")).map(_.getPath)
      val hit = files.count { f =>
        val r = spark.read.parquet(f).agg(min(col("y")), max(col("y"))).head()
        r.getLong(1) >= lo && r.getLong(0) <= hi
      }
      (hit, files.length)
    }
    val (zHit, zTotal) = overlapping(zDir, 100, 199)   // ~10% of y-space
    val (linHit, linTotal) = overlapping(linDir, 100, 199)
    // x-sorted layout: y is uniform within every x-range file → no file
    // can be skipped; z-order: y's high bits participate in the sort key,
    // so most files cover a narrow y-band and skip
    assert(linHit == linTotal,
      s"expected the 1-D layout to open every file, got $linHit/$linTotal")
    assert(zHit <= zTotal / 2,
      s"z-order should skip >=half the files for a 10% y-band, got $zHit/$zTotal")
    // and the key itself never changes answers: count via both layouts
    assert(spark.read.parquet(zDir).where(col("y").between(100, 199)).count() ==
      base.where(col("y").between(100, 199)).count())
  }

  test("runtime bloom filter prunes the shuffle-join fact side semantically invisibly") {
    val s2 = spark
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold")
      .map(k => k -> s2.conf.getOption(k)).toMap
    // local fixtures are far below the 10GB application-side default
    // threshold that gates the rule at production scale — lower it so
    // the rule fires here the way it would on a 100-TB fact scan
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s2.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    s2.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    s2.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")
    try {
      val fact = Tables.lineitem(s2, sf)
        .select(col("l_suppkey"), col("l_quantity"))
      val dim = Tables.supplier(s2, sf)
        .where(col("s_nationkey") === 3).select(col("s_suppkey"))
      val joined = fact.join(dim, col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("l_suppkey")).agg(count(lit(1)).as("n"))
      val opt = joined.queryExecution.optimizedPlan.toString
      assert(opt.toLowerCase.contains("bloom"),
        s"runtime bloom filter did not inject:\n$opt")
      // the filter is a might-contain pre-pass on the fact scan: rows
      // that cannot match are dropped BEFORE the shuffle — at scale this
      // cuts the exchange volume to ~the matching fraction
      val expect = fact.join(dim.hint("broadcast"),
          col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("l_suppkey")).agg(count(lit(1)).as("n"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(joined.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap == expect)
    } finally saved.foreach { case (k, v) =>
      v match {
        case Some(x) => s2.conf.set(k, x)
        case None => s2.conf.unset(k)
      }
    }
  }
}
