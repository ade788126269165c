package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** All three physical forms events.ts has shipped in must normalize to
  * the identical ts/ts_ns contract. The live fixtures only exercise ONE
  * form at a time (currently TIMESTAMP_NTZ; previously TIMESTAMP(NANOS)
  * read as BIGINT), so without this spec two of Tables.normalizeEvents'
  * three branches — and the streaming reader's schema peek over them —
  * would go untested until the next driver regeneration broke one.
  */
class EventsTsFormsSpec extends SparkSpec {

  // one μs-aligned instant + a second row to catch column mixups
  private val rows = Seq(
    (1L, 1700000000123456L, 10L, "click", 1.5, "{}"),
    (2L, 1700000003654321L, 11L, "purchase", 2.5, "{}"))

  private def writeForm(form: String): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory(s"ev-$form").toString
    val base = rows.toDF("event_id", "ts_us", "user_id", "event_type", "value", "props")
    val df = form match {
      case "long_nanos" => base.withColumn("ts", col("ts_us") * lit(1000L))
      case "timestamp" => base.withColumn("ts", timestamp_micros(col("ts_us")))
      case "timestamp_ntz" => base.withColumn("ts",
        timestamp_micros(col("ts_us")).cast(TimestampNTZType))
    }
    df.select("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("normalizeEvents yields identical ts/ts_ns for all three stored forms") {
    val got = Seq("long_nanos", "timestamp", "timestamp_ntz").map { form =>
      val ev = Tables.events(spark, writeForm(form))
      assert(ev.schema("ts").dataType == TimestampType, s"$form: ts type")
      assert(ev.schema("ts_ns").dataType == LongType, s"$form: ts_ns type")
      form -> ev.select(col("event_id"), unix_micros(col("ts")).as("us"), col("ts_ns"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    }
    val expect = rows.map(r => (r._1, r._2, r._2 * 1000L)).toSet
    got.foreach { case (form, s) =>
      assert(s == expect, s"$form normalized to $s, want $expect")
    }
  }

  test("streaming reader peeks each stored form and the staged marker matches it") {
    Seq("long_nanos", "timestamp", "timestamp_ntz").foreach { form =>
      val dir = writeForm(form)
      // EventStream.storedSchema must reflect the stored type
      val t = graft.streaming.EventStream.storedSchema(spark, s"$dir/events.parquet")("ts").dataType
      form match {
        case "long_nanos" => assert(t == LongType, s"$form peeked $t")
        case "timestamp" => assert(t == TimestampType, s"$form peeked $t")
        case _ => assert(t == TimestampNTZType, s"$form peeked $t")
      }
      // a batch read through the stream's normalization contract
      val ev = graft.streaming.EventStream.readEvents(spark, s"$dir/events.parquet")
      assert(ev.schema("ts").dataType == TimestampType)
      assert(ev.schema("ts_ns").dataType == LongType)
    }
  }
}
