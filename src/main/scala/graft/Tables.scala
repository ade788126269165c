package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fixture-table loaders (TESTDATA.md / FIXTURES.md §B).
  *
  * All engine inputs come from the driver-generated parquet under a
  * scale-factor directory. Column pruning + predicate pushdown reach the
  * parquet scan because every loader returns the raw `DataFrame` and
  * callers select/filter declaratively.
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "supplier")
  def nation(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "region")
  def part(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "part")
  /** events.parquet has shipped `ts` in three physical forms across
    * driver testdata generations:
    *  - TIMESTAMP(NANOS): rejected by the vectorized reader unless
    *    `spark.sql.legacy.parquet.nanosAsLong=true` (set in Verify/Bench/
    *    tests) makes it BIGINT nanoseconds;
    *  - timestamp[us] with isAdjustedToUTC=false: reads as TIMESTAMP_NTZ
    *    (which `unix_micros` rejects — round-8 bench regression);
    *  - plain TIMESTAMP.
    * [[normalizeEvents]] maps all three to the same contract every query
    * depends on: `ts TIMESTAMP` (micros) + `ts_ns BIGINT` (epoch nanos).
    * The session timezone is UTC everywhere, so the NTZ→TIMESTAMP cast is
    * the identity on the stored micros and matches DuckDB's naive read.
    */
  def normalizeEvents(raw: DataFrame): DataFrame = {
    import org.apache.spark.sql.types._
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumnRenamed("ts", "ts_ns")
          .withColumn("ts", timestamp_micros(expr("ts_ns DIV 1000")))
      case TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
          .withColumn("ts_ns", unix_micros(col("ts")) * lit(1000L))
      case _ =>
        raw.withColumn("ts_ns", unix_micros(col("ts")) * lit(1000L))
    }
  }

  def events(spark: SparkSession, sfDir: String): DataFrame =
    normalizeEvents(table(spark, sfDir, "events"))
  def documents(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "embeddings")

  /** The engine's 2-D point table (reference `points.txt`, FIXTURES.md §A;
    * parsed at mapper.py:90-93). Derived from lineitem per SURVEY §7.1:
    * `(x, y) = (l_extendedprice, l_quantity)`, key = (l_orderkey,
    * l_linenumber) (unique). Only 4 columns are read — Catalyst prunes the
    * rest out of the parquet scan.
    */
  def points2d(spark: SparkSession, sfDir: String): DataFrame =
    lineitem(spark, sfDir).select(
      col("l_orderkey"),
      col("l_linenumber"),
      col("l_extendedprice").as("x"),
      col("l_quantity").as("y"))

  /** 1-D point table (reference `sequential-kmeans.py:70-77` uses scalar
    * points; our distance kernel must be dimension-generic, SURVEY §1.1).
    */
  def points1d(spark: SparkSession, sfDir: String): DataFrame =
    lineitem(spark, sfDir).select(
      col("l_orderkey"),
      col("l_linenumber"),
      col("l_quantity").as("x"))
}
