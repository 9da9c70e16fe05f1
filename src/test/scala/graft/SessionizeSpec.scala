package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventStream

/** Gap-based sessionization: batch window form and custom-state streaming
  * form agree on closed sessions.
  */
class SessionizeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val rows = Seq(
    (1L, ts("2024-01-01 10:00:00"), 1L),
    (2L, ts("2024-01-01 10:10:00"), 1L),
    (3L, ts("2024-01-01 11:30:00"), 1L), // > 30 min gap -> new session
    (4L, ts("2024-01-01 10:05:00"), 2L))

  test("batch sessionize splits on gaps per user") {
    val events = rows.map { case (e, t, u) => (e, t, u) }.toDF("event_id", "ts", "user_id")
    val out = EventStream.sessionize(events, 1800)
      .select("user_id", "session_idx", "n_events")
      .as[(Long, Long, Long)].collect().toSet
    assert(out == Set((1L, 0L, 2L), (1L, 1L, 1L), (2L, 0L, 1L)))
  }

  test("batch sessionize accepts TIMESTAMP_NTZ events (parquet isAdjustedToUTC=false)") {
    // the driver's events.parquet reads as TIMESTAMP_NTZ, which admits no
    // BIGINT cast — the gap test must work on both timestamp flavors, and
    // so must the q_range_join composition (sessionize → pointInInterval)
    val events = rows.map { case (e, t, u) => (e, t, u) }.toDF("event_id", "ts", "user_id")
      .withColumn("ts", org.apache.spark.sql.functions.col("ts").cast("timestamp_ntz"))
    assert(events.schema("ts").dataType == org.apache.spark.sql.types.TimestampNTZType)
    val sessions = EventStream.sessionize(events, 1800)
    val out = sessions.select("user_id", "session_idx", "n_events")
      .as[(Long, Long, Long)].collect().toSet
    assert(out == Set((1L, 0L, 2L), (1L, 1L, 1L), (2L, 0L, 1L)))
    val matched = graft.ops.TemporalJoins.pointInInterval(
      events.select("event_id", "user_id", "ts"),
      sessions.select("user_id", "session_idx", "session_start", "session_end"),
      Seq("user_id"), "ts", "session_start", "session_end", bucketSeconds = 3600)
      .select("event_id", "session_idx")
      .as[(Long, Long)].collect().toSet
    assert(matched == Set((1L, 0L), (2L, 0L), (3L, 1L), (4L, 0L)))
  }

  test("streamDataset incrementally reads a published dataset with sidecar schema") {
    import org.apache.spark.sql.streaming.Trigger
    val root = TestSpark.tmpDir("streamds")
    val df = Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "a", 3.0)).toDF("id", "grp", "v")
    graft.core.Publish.publish(spark, df, root, Seq("grp"))
    val q = EventStream.streamDataset(spark, root)
      .writeStream.format("memory").queryName("ds_stream")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val out = spark.table("ds_stream").select("id", "grp", "v")
      .as[(Long, String, Double)].collect().toSet
    assert(out == Set((1L, "a", 1.0), (2L, "b", 2.0), (3L, "a", 3.0)))
  }

  test("streamToDataset writes a fetchable graft dataset from a stream") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val input = MemoryStream[(Long, String, Double)]
    val root = TestSpark.tmpDir("streamsink")
    val q = EventStream.streamToDataset(spark,
      input.toDF().toDF("id", "grp", "v"), root, Seq("grp"),
      TestSpark.tmpDir("streamsink-ckpt"))
    input.addData((1L, "a", 1.0), (2L, "b", 2.0))
    q.processAllAvailable()
    input.addData((3L, "a", 3.0))
    q.processAllAvailable()
    q.stop()
    val back = graft.core.Fetch.fetch(spark, root)
    assert(back.columns.toSeq == Seq("id", "grp", "v"))
    assert(back.select("id").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L))
    assert(graft.core.Fetch.getAllPartitionValues(spark, root, "grp").toSet == Set("a", "b"))
  }

  test("streamToDataset refuses an incompatible existing dataset") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val root = TestSpark.tmpDir("streamsink-guard")
    graft.core.Publish.publish(spark,
      Seq((1L, "a", 1.0)).toDF("id", "grp", "v"), root, Seq("grp"))
    val input = MemoryStream[(Long, String)]
    intercept[IllegalArgumentException] {
      EventStream.streamToDataset(spark, input.toDF().toDF("id", "grp"),
        root, Seq("grp"), TestSpark.tmpDir("guard-ckpt"))
    }
  }

  test("streaming sessionize closes sessions on gap (flatMapGroupsWithState)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp)]
    val events = input.toDF().toDF("user_id", "ts")
    // evictIdleState=false: processing-time timeouts would schedule
    // continuous empty micro-batches under the test harness
    val query = EventStream.sessionizeStream(spark, events, 1800, evictIdleState = false)
      .writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Append()).start()

    input.addData((1L, ts("2024-01-01 10:00:00")), (1L, ts("2024-01-01 10:10:00")))
    query.processAllAvailable()
    input.addData((1L, ts("2024-01-01 11:30:00"))) // closes the first session
    query.processAllAvailable()

    val closed = spark.table("sessions")
      .select("user_id", "session_start", "session_end", "n_events")
      .as[(Long, Timestamp, Timestamp, Long)].collect().toSet
    query.stop()
    assert(closed == Set((1L, ts("2024-01-01 10:00:00"), ts("2024-01-01 10:10:00"), 2L)))
  }
}
