package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** MinhashKernel equivalence: the native one-pass signature must equal
  * the HOF formulation (which is the documented oracle shape) on the
  * real corpus — including multibyte (zh) documents, which exercise the
  * UTF-8 char-offset walk.
  */
class KernelSpec extends SparkSpec {

  test("native minhash signature == HOF signature on the full sf corpus") {
    val docs = Tables.documents(spark, sf)
    val a = Dedup.minhashSignatureNarrow(docs, n = 8, nHash = 12)
      .collect().map(r => r.getLong(0) -> (1 to 12).map(r.getLong).toVector).toMap
    val b = Dedup.minhashSignatureFast(docs, n = 8, nHash = 12)
      .collect().map(r => r.getLong(0) -> (1 to 12).map(r.getLong).toVector).toMap
    assert(a.keySet == b.keySet)
    val bad = a.keys.filter(k => a(k) != b(k))
    assert(bad.isEmpty, s"signature mismatch for docs ${bad.take(5)}")
  }

  test("native minhash handles multibyte and short texts like the HOF path") {
    import spark.implicits._
    val docs = Seq(
      (1L, "的是不了人我在有他这中文测试文本再来一些"),
      (2L, "short"), // < 8 chars: filtered by both paths
      (3L, "ascii text that is long enough for shingles"),
      (4L, "mixed 中文 and ascii content here")).toDF("doc_id", "text")
    val a = Dedup.minhashSignatureNarrow(docs, n = 8, nHash = 12)
      .collect().map(r => r.getLong(0) -> (1 to 12).map(r.getLong).toVector).toMap
    val b = Dedup.minhashSignatureFast(docs, n = 8, nHash = 12)
      .collect().map(r => r.getLong(0) -> (1 to 12).map(r.getLong).toVector).toMap
    assert(a == b)
    assert(!a.contains(2L))
  }

  test("native simhash fingerprint == expression form on the full sf corpus") {
    val docs = Tables.documents(spark, sf)
    val a = Dedup.simhashExpr(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = Dedup.simhash(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a.keySet == b.keySet)
    val bad = a.keys.filter(k => a(k) != b(k))
    assert(bad.isEmpty, s"fingerprint mismatch for docs ${bad.take(5)}")
  }

  test("native simhash: token dedup, whitespace split and no-token nulls match") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the the THE tHe"), // case-folds then dedups to one token
      (2L, "  \t \n "), // whitespace only -> absent from both paths
      (3L, "中文 词 词 mixed tokens　ok"), // multibyte + ideographic space
      (4L, "a b c d e f g")).toDF("doc_id", "text")
    val a = Dedup.simhashExpr(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = Dedup.simhash(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b)
    assert(!a.contains(2L))
  }

  test("sorted intersect count == size(array_intersect) on corpus shingle sets") {
    import org.apache.spark.sql.functions._
    val sets = Dedup.shingleHashArray(Tables.documents(spark, sf), n = 8)
      .select(col("doc_id"), array_sort(array_distinct(col("hs"))).as("shs"))
    val a = sets.select(col("doc_id").as("ida"), col("shs").as("sa"))
    val b = sets.select(col("doc_id").as("idb"), col("shs").as("sb"))
    // a slice of the pair space is plenty for equality
    val pairs = a.crossJoin(b)
      .where(col("ida") < col("idb") && (col("ida") + col("idb")) % 97 === 0)
      .select(col("ida"), col("idb"),
        graft.functions.ArrayKernels.sortedIntersectCount(col("sa"), col("sb")).as("fast"),
        size(array_intersect(col("sa"), col("sb"))).cast("long").as("ref"))
    val bad = pairs.where(col("fast") =!= col("ref")).count()
    assert(pairs.count() > 0 && bad == 0, s"$bad mismatching pairs")
  }

  test("sorted intersect count edges: empty, disjoint, identical") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq(
      (Seq.empty[Long], Seq(1L, 2L), 0L),
      (Seq(1L, 3L, 5L), Seq(2L, 4L, 6L), 0L),
      (Seq(1L, 2L, 3L), Seq(1L, 2L, 3L), 3L),
      (Seq(1L, 5L, 9L, 11L), Seq(5L, 9L, 20L), 2L))
      .toDF("a", "b", "want")
      .withColumn("got",
        graft.functions.ArrayKernels.sortedIntersectCount(col("a"), col("b")))
    assert(df.where(col("got") =!= col("want")).count() == 0)
  }

  test("jaro-winkler: DuckDB-pinned values, boost threshold, null/empty edges") {
    import spark.implicits._
    import graft.functions.JaroWinklerKernel.jaroWinkler
    // expected doubles are DuckDB jaro_winkler_similarity outputs,
    // pinned to the exact bits (the cross-engine contract the linkage
    // oracle depends on)
    val cases = Seq(
      ("martha", "marhta", 0.9611111111111111),   // classic: boost, t=1
      ("DIXON", "DICKSONX", 0.8133333333333332),  // prefix 2, uneven lengths
      ("abcdexxxxx", "abcdeyyyyy", 0.6666666666666666), // jaro < 0.7: NO boost
      ("abcd", "abcdzzzzzzzz", 0.8666666666666666), // prefix capped at 4
      ("CRATE", "TRACE", 0.7333333333333334),     // boost region, prefix 0
      ("abc", "abc", 1.0),
      ("abc", "xyz", 0.0),                        // m = 0
      ("a", "", 0.0), ("", "", 0.0)               // DuckDB's empty = 0 rule
    )
    val df = cases.toDF("a", "b", "want")
      .withColumn("got", jaroWinkler(col("a"), col("b")))
    val bad = df.where(col("got") =!= col("want")).collect()
    assert(bad.isEmpty, s"bit-exact pin failed: ${bad.mkString(";")}")
    // null propagation
    val n = Seq((Option("x"), Option.empty[String])).toDF("a", "b")
      .select(jaroWinkler(col("a"), col("b")).as("jw")).head()
    assert(n.isNullAt(0), "null input must yield null")
    // symmetric
    assert(graft.functions.JaroWinklerKernel
      .similarity(org.apache.spark.unsafe.types.UTF8String.fromString("DIXON"),
        org.apache.spark.unsafe.types.UTF8String.fromString("DICKSONX")) ==
      graft.functions.JaroWinklerKernel
        .similarity(org.apache.spark.unsafe.types.UTF8String.fromString("DICKSONX"),
          org.apache.spark.unsafe.types.UTF8String.fromString("DIXON")))
  }

  test("jaro-winkler rejects non-string inputs at analysis time") {
    import spark.implicits._
    import graft.functions.JaroWinklerKernel.jaroWinkler
    // the checkInputDataTypes gate: a long operand must fail in the
    // analyzer (AnalysisException), not as a ClassCastException deep in
    // codegen at execution time
    val df = Seq((1L, "x")).toDF("n", "s")
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      df.select(jaroWinkler(col("n"), col("s"))).collect()
    }
    assert(e.getMessage.toLowerCase.contains("string"),
      s"unexpected analysis error: ${e.getMessage}")
  }

  test("the kernel runs inside whole-stage codegen") {
    val df = Dedup.minhashSignatureFast(Tables.documents(spark, sf), 8, 12)
    df.collect() // finalize the adaptive plan so codegen markers appear
    val p = plan(df)
    assert(p.contains("graft_minhash"), s"kernel missing from plan:\n$p")
    assert(p.contains("*("), s"no codegen span:\n$p")
  }
}
