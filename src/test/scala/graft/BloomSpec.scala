package graft

import org.apache.spark.sql.functions._
import graft.operators.{Bloom, Dedup}

/** Pins for the deterministic Bloom filter family (operators/Bloom.scala):
  * the no-false-negative contract, the superset relation to the exact
  * decontamination path, and output-invariance of the bloom join
  * prefilter — the three properties the oracle gate can't state on its
  * own (it only proves cross-engine equality, not the semantics).
  */
class BloomSpec extends SparkSpec {

  private def docs = Tables.documents(spark, sf)

  test("bloom never false-negatives: every inserted hash probes true") {
    val m = 4096
    val hs = Dedup.shingleHashArray(docs, 8)
      .select(explode(col("hs")).as("hm")).distinct()
    val bits = Bloom.buildBits(hs, m)
    val missed = hs.crossJoin(broadcast(bits))
      .where(!Bloom.mightContain(col("bits"), col("hm"), m))
      .count()
    assert(missed == 0, s"$missed inserted hashes probed false")
  }

  test("bloom words pack 32 low bits only (shift semantics never signed)") {
    val m = 4096
    val hs = Dedup.shingleHashArray(docs, 8)
      .select(explode(col("hs")).as("hm")).distinct()
    val row = Bloom.buildBits(hs, m).head()
    val words = row.getSeq[Long](0)
    assert(words.length == m / 32)
    assert(words.forall(w => w >= 0L && w < (1L << 32)),
      "a word used bits above 31 — cross-engine shift contract broken")
    assert(words.exists(_ != 0L), "filter built empty")
  }

  test("dedup_contamination_bloom flags a superset of the exact path") {
    val exact = Dedup.contamination(docs, benchIds = 10L)
      .select(col("doc_id"), col("inter")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val bloom = Dedup.contaminationBloom(docs, benchIds = 10L)
      .select(col("doc_id"), col("n_hits")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val missing = exact.keySet -- bloom.keySet
    assert(missing.isEmpty,
      s"exact-contaminated docs missed by bloom (false negatives): $missing")
    exact.foreach { case (d, inter) =>
      assert(bloom(d) >= inter,
        s"doc $d: bloom hits ${bloom(d)} < exact overlap $inter")
    }
  }

  test("q_join_bloom_reduce: prefilter is output-invisible vs plain join") {
    val withBloom = graft.queries.RelationalQueries
      .queries("q_join_bloom_reduce")(spark, sf).collect()
    val urgent = Tables.orders(spark, sf)
      .where(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"), col("o_orderdate"))
    val plain = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_quantity"))
      .join(urgent, col("l_orderkey") === col("o_orderkey"))
      .groupBy(date_trunc("month", col("o_orderdate")).as("month"))
      .agg(count(lit(1)).as("n_items"),
        graft.queries.QueryHelpers.rnd(sum(col("l_quantity")), 2).as("sum_qty"))
      .orderBy("month").collect()
    assert(withBloom.toSeq == plain.toSeq)
  }
}
