package graft

import org.apache.spark.sql.types.{DataType, ArrayType, DecimalType, MapType, StructType}

/** Output-schema contract over the WHOLE registry (the r15 lesson):
  * Spark writes DecimalType to parquet as FIXED_LEN_BYTE_ARRAY int128,
  * whose hash canonicalization diverges across readers even when the
  * values are bit-identical — `graph_modularity`/`_sweep`/
  * `graph_louvain_step` shipped driver-RED in r15 with exactly-right
  * values because of it. The engine's contract is therefore: exact
  * decimal arithmetic stays INTERNAL; every registry output re-encodes
  * decimals as canonical integer strings (or BIGINT when in range).
  *
  * This spec constructs every registered query against the sf0.001
  * fixture and fails on any DecimalType anywhere in the output schema
  * (nested included), unless the query is on the proven-stable
  * allowlist (empty until a driver-green proof exists).
  * tools/check_oracle.py enforces the same guard gate-side on the
  * written parquet, so the contract is checked both before (here) and
  * after (gate) the encode.
  */
class RegistrySchemaSpec extends SparkSpec {

  private val decimalAllowlist = Set.empty[String]

  private def hasDecimal(dt: DataType): Boolean = dt match {
    case _: DecimalType => true
    case a: ArrayType => hasDecimal(a.elementType)
    case m: MapType => hasDecimal(m.keyType) || hasDecimal(m.valueType)
    case s: StructType => s.fields.exists(f => hasDecimal(f.dataType))
    case _ => false
  }

  test("no registered query exposes a DecimalType output column") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) if !decimalAllowlist(name) =>
        val schema = fn(spark, sf).schema
        val bad = schema.fields.filter(f => hasDecimal(f.dataType))
        if (bad.nonEmpty) Some(s"$name: ${bad.map(_.name).mkString(",")}")
        else None
      case _ => None
    }
    assert(offenders.isEmpty,
      s"decimal-typed output columns (driver parquet-int128 hash trap — " +
        s"re-encode as canonical string/BIGINT): ${offenders.mkString("; ")}")
  }
}
