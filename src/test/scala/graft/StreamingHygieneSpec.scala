package graft

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._
import graft.queries.StreamingQueries

/** Operational contracts of the streaming sink queries (VERDICT r6 item 7):
  *  - the single-data-batch pin in stream_dedup_sink reads the query's own
  *    StreamingQueryProgress, so a source-batching regression fails loudly
  *    instead of silently dropping late second copies;
  *  - staging + checkpoint temp dirs are deleted EAGERLY when the query
  *    terminates (a bench run used to leak a full fixture copy per
  *    invocation); only result-sized sink dirs persist until the JVM
  *    shutdown hook removes them.
  */
class StreamingHygieneSpec extends SparkSpec {

  private def tmpDirs(prefix: String): Set[String] =
    Files.list(Paths.get(System.getProperty("java.io.tmpdir"))).iterator().asScala
      .map(_.getFileName.toString).filter(_.startsWith(prefix)).toSet

  test("stream_dedup_sink: single-batch pin holds and output collapses the 2x staging") {
    val got = StreamingQueries.queries("stream_dedup_sink")(spark, sf)
    val want = Tables.events(spark, sf).count()
    // the require(dataBatches == 1) inside runToParquet already ran; a
    // batching regression would have thrown before we got a DataFrame
    assert(got.count() === want)
  }

  test("restart from checkpoint resumes exactly-once into the file sink") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.streaming.Trigger
    import graft.streaming.EventStream
    // batch A = the events fixture; batch B = the same rows with shifted
    // ids, landed in the source dir only AFTER the first run terminates —
    // so run 2 proves the checkpoint: it must process B and ONLY B
    val src = Files.createTempDirectory("recov_src")
    val out = Files.createTempDirectory("recov_out").toString
    val cp = Files.createTempDirectory("recov_cp").toString
    val ev = Tables.events(spark, sf)
    val n = ev.count()
    ev.select(col("event_id"), col("ts_ns").as("ts"), col("user_id"),
        col("event_type"), col("value"), col("props"))
      .coalesce(1).write.mode("append").parquet(src.toString)
    def runOnce(): org.apache.spark.sql.streaming.StreamingQueryProgress = {
      val q = EventStream.readEvents(spark, src.toString)
        .select(col("event_id"), col("user_id"), col("event_type"))
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", cp)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      q.recentProgress.filter(_.numInputRows > 0).last
    }
    assert(runOnce().numInputRows == n)
    // crash-and-recover: new files arrive while the query is down
    ev.select((col("event_id") + lit(10000000L)).as("event_id"),
        col("ts_ns").as("ts"), col("user_id"), col("event_type"),
        col("value"), col("props"))
      .coalesce(1).write.mode("append").parquet(src.toString)
    val p2 = runOnce()
    // only the NEW file is processed — batch A is not replayed
    assert(p2.numInputRows == n, s"restart reprocessed: ${p2.numInputRows}")
    val sink = spark.read.parquet(out)
    assert(sink.count() == 2 * n)
    assert(sink.select("event_id").distinct().count() == 2 * n,
      "duplicate event_ids in the sink after restart")
  }

  test("staging and checkpoint dirs are removed eagerly, sinks deferred to shutdown") {
    val before = Map(
      "graft_stream_src" -> tmpDirs("graft_stream_src"),
      "graft_stream_dup" -> tmpDirs("graft_stream_dup"),
      "graft_stream_cp" -> tmpDirs("graft_stream_cp"))
    StreamingQueries.queries("stream_window_sink")(spark, sf).count()
    StreamingQueries.queries("stream_dedup_sink")(spark, sf).count()
    for ((prefix, was) <- before) {
      val now = tmpDirs(prefix)
      assert(now.subsetOf(was), s"$prefix dirs leaked: ${now -- was}")
    }
  }
}
