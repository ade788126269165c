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

  test("the kernel runs inside whole-stage codegen") {
    val df = Dedup.minhashSignatureFast(Tables.documents(spark, sf), 8, 12)
    df.collect() // finalize the adaptive plan so codegen markers appear
    val p = plan(df)
    assert(p.contains("graft_minhash"), s"kernel missing from plan:\n$p")
    assert(p.contains("*("), s"no codegen span:\n$p")
  }
}
