package graft

import org.apache.spark.sql.types._

/** Loud early-warning contract on the driver-generated fixtures.
  *
  * The driver regenerates `/root/testdata` between rounds and has
  * already shipped `events.ts` in three physical forms (TIMESTAMP(NANOS)
  * → read as BIGINT under nanosAsLong; TIMESTAMP; TIMESTAMP_NTZ micros —
  * the round-8 regeneration that broke 26 bench queries mid-gate). This
  * spec pins every loader-visible column to its allowed type variants so
  * the NEXT regeneration fails HERE, by name, at round start — not as an
  * AnalysisException buried in a bench artifact.
  */
class FixtureContractSpec extends SparkSpec {

  /** Dates have shipped as DATE and as timestamp[us] (NTZ); accept the
    * variants every consumer (`to_date`, `datediff`) handles.
    */
  private val dateLike: Set[DataType] =
    Set(DateType, TimestampType, TimestampNTZType)

  private def check(table: String, expect: Seq[(String, Set[DataType])]): Unit = {
    val schema = Tables.table(spark, sf, table).schema
    val got = schema.fields.map(f => f.name -> f.dataType).toMap
    expect.foreach { case (name, types) =>
      assert(got.contains(name), s"$table: column `$name` missing — " +
        s"fixture regenerated with schema ${schema.simpleString}")
      assert(types.contains(got(name)),
        s"$table.$name: type ${got(name)} not in allowed $types — " +
          "update Tables/queries for the new fixture generation")
    }
  }

  test("TPC-H-ish tables carry the loader-contract columns and types") {
    check("lineitem", Seq(
      "l_orderkey" -> Set(LongType), "l_partkey" -> Set(LongType),
      "l_suppkey" -> Set(LongType), "l_linenumber" -> Set(IntegerType, LongType),
      "l_quantity" -> Set(DoubleType), "l_extendedprice" -> Set(DoubleType),
      "l_discount" -> Set(DoubleType), "l_tax" -> Set(DoubleType),
      "l_returnflag" -> Set(StringType), "l_linestatus" -> Set(StringType),
      "l_shipdate" -> dateLike))
    check("orders", Seq(
      "o_orderkey" -> Set(LongType), "o_custkey" -> Set(LongType),
      "o_orderstatus" -> Set(StringType), "o_totalprice" -> Set(DoubleType),
      "o_orderdate" -> dateLike, "o_orderpriority" -> Set(StringType)))
    check("customer", Seq(
      "c_custkey" -> Set(LongType), "c_name" -> Set(StringType),
      "c_nationkey" -> Set(IntegerType, LongType),
      "c_acctbal" -> Set(DoubleType), "c_mktsegment" -> Set(StringType)))
    check("supplier", Seq(
      "s_suppkey" -> Set(LongType), "s_name" -> Set(StringType),
      "s_nationkey" -> Set(IntegerType, LongType),
      "s_acctbal" -> Set(DoubleType)))
    check("nation", Seq(
      "n_nationkey" -> Set(IntegerType, LongType), "n_name" -> Set(StringType),
      "n_regionkey" -> Set(IntegerType, LongType)))
    check("region", Seq(
      "r_regionkey" -> Set(IntegerType, LongType), "r_name" -> Set(StringType)))
    check("part", Seq(
      "p_partkey" -> Set(LongType), "p_name" -> Set(StringType),
      "p_brand" -> Set(StringType), "p_type" -> Set(StringType),
      "p_size" -> Set(IntegerType, LongType),
      "p_retailprice" -> Set(DoubleType)))
  }

  test("documents/embeddings carry the pipeline-contract columns and types") {
    check("documents", Seq(
      "doc_id" -> Set(LongType), "text" -> Set(StringType),
      "lang" -> Set(StringType), "source" -> Set(StringType),
      "n_chars" -> Set(LongType)))
    check("embeddings", Seq(
      "vec_id" -> Set(LongType),
      "embedding" -> Set(ArrayType(FloatType), ArrayType(DoubleType),
        ArrayType(FloatType, containsNull = false),
        ArrayType(DoubleType, containsNull = false)),
      "label" -> Set(IntegerType, LongType)))
  }

  test("events normalizes to the ts/ts_ns contract from ANY stored form") {
    val ev = Tables.events(spark, sf)
    val got = ev.schema.fields.map(f => f.name -> f.dataType).toMap
    assert(got.get("ts").contains(TimestampType),
      s"events.ts must normalize to TIMESTAMP, got ${got.get("ts")}")
    assert(got.get("ts_ns").contains(LongType),
      s"events.ts_ns must normalize to BIGINT nanos, got ${got.get("ts_ns")}")
    Seq("event_id" -> LongType, "user_id" -> LongType,
      "event_type" -> StringType, "value" -> DoubleType,
      "props" -> StringType).foreach { case (n, t) =>
      assert(got.get(n).contains(t), s"events.$n: expected $t, got ${got.get(n)}")
    }
    // ts and ts_ns must agree (ts is the micro-truncated instant)
    import org.apache.spark.sql.functions._
    val bad = ev.where(unix_micros(col("ts")) =!= expr("ts_ns DIV 1000")).count()
    assert(bad == 0L, s"$bad events rows where ts != ts_ns/1000")
  }
}
