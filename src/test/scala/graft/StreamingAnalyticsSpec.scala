package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.StreamingAnalytics
import java.sql.Timestamp

/** Watermarked windowed aggregation + flatMapGroupsWithState sessionization
  * (streaming/StreamingAnalytics.scala): emission on watermark advance,
  * late-data drop, gap-closure vs timeout-closure, and batch-equivalence. */
class StreamingAnalyticsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def ts(minutes: Long): Timestamp = new Timestamp(minutes * 60000L)

  test("windowed counts: windows emit once the watermark passes; late data dropped") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val in = MemoryStream[(Timestamp, String)]
    val out = StreamingAnalytics.windowedCounts(
      in.toDF.toDF("ts", "event_type"), "ts", "event_type", "10 minutes", "1 hour")
    val q = out.writeStream.format("memory").queryName("san_win")
      .outputMode("append").start()
    try {
      // hour-0 events + an hour-2 event that pushes the watermark to 120-10
      in.addData((ts(5), "a"), (ts(20), "a"), (ts(30), "b"), (ts(125), "c"))
      q.processAllAvailable()
      in.addData((ts(130), "c")) // no-op data to trigger the emission batch
      q.processAllAvailable()
      val rows = spark.table("san_win")
        .select("win_start", "event_type", "cnt").as[(Long, String, Long)]
        .collect().toSet
      // hour-0 windows emitted (watermark 115 min > 60); hour-2 still open
      assert(rows == Set((0L, "a", 2L), (0L, "b", 1L)))
      // an event 105 minutes LATE (ts 10 < watermark 120) must be dropped
      in.addData((ts(10), "a"), (ts(200), "d"))
      q.processAllAvailable()
      in.addData((ts(210), "d"))
      q.processAllAvailable()
      val rows2 = spark.table("san_win")
        .select("win_start", "event_type", "cnt").as[(Long, String, Long)]
        .collect().toSet
      // hour-0 'a' count is NOT revised; hour-2 'c' window now emitted
      assert(rows2 == Set((0L, "a", 2L), (0L, "b", 1L), (7200L, "c", 2L)))
    } finally q.stop()
  }

  test("sessionize: gap arrival closes sessions; watermark timeout closes the open one") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp)]
    val out = StreamingAnalytics.sessionize(
      in.toDF.toDF("user_id", "ts"), gapSec = 1800)
    val q = out.writeStream.format("memory").queryName("san_sess")
      .outputMode("append").start()
    try {
      // user 1: events at 1,11 | gap | 61,71; user 2: one event at 6
      // (minute 0 would EQUAL the initial watermark and be dropped)
      in.addData((1L, ts(1)), (1L, ts(11)), (1L, ts(61)), (1L, ts(71)), (2L, ts(6)))
      q.processAllAvailable()
      val afterArrival = spark.table("san_sess")
        .as[StreamingAnalytics.Session].collect().toSet
      // the 1-11 session closed by the 61' arrival; user 2's lone session
      // closed by TIMEOUT in the same processAllAvailable (the post-batch
      // watermark 71' already passed its 6'+30' horizon); user 1's open
      // session (horizon 101') survives
      assert(afterArrival == Set(
        StreamingAnalytics.Session(1L, 60L, 660L, 2),
        StreamingAnalytics.Session(2L, 360L, 360L, 1)))
      // push the watermark past user 1's open-session horizon
      in.addData((3L, ts(200)))
      q.processAllAvailable()
      val afterTimeout = spark.table("san_sess")
        .as[StreamingAnalytics.Session].collect().toSet
      assert(afterTimeout == Set(
        StreamingAnalytics.Session(1L, 60L, 660L, 2),
        StreamingAnalytics.Session(1L, 3660L, 4260L, 2),
        StreamingAnalytics.Session(2L, 360L, 360L, 1)))
    } finally q.stop()
  }

  test("streaming exact dedup: one survivor per digest, state persists across batches") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val q = StreamingAnalytics.dedupExact(in.toDF.toDF("doc_id", "text"), "text")
      .select("doc_id").writeStream.format("memory").queryName("san_dedup")
      .outputMode("append").start()
    try {
      in.addData((1L, "aa"), (2L, "aa"), (3L, "bb"))
      q.processAllAvailable()
      assert(spark.table("san_dedup").as[Long].collect().toSet == Set(1L, 3L))
      in.addData((4L, "aa"), (5L, "cc")) // aa still deduped across batches
      q.processAllAvailable()
      assert(spark.table("san_dedup").as[Long].collect().toSet == Set(1L, 3L, 5L))
    } finally q.stop()
  }

  test("drained stream sessionization equals the batch window-function plan") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val ev = spark.read.parquet(s"$dir/events.parquet").select("user_id", "ts")
    // per-user sentinel far past the end closes every real session on
    // arrival (the events table is TIMESTAMP_NTZ — stay in SQL expressions)
    val sentinelEpoch = ev
      .agg((unix_timestamp(max(col("ts"))) + 7200L).as("e")).collect()(0).getLong(0)
    val sentinels = ev.select("user_id").distinct()
      .crossJoin(ev.agg(max(col("ts")).as("m")))
      .select(col("user_id"), (col("m") + expr("INTERVAL 2 HOURS")).as("ts"))
    val inDir = java.nio.file.Files.createTempDirectory("sansess").toString + "/in"
    ev.unionByName(sentinels).coalesce(1)
      .write.mode("overwrite").parquet(inDir)
    val stream = spark.readStream.schema(ev.schema).parquet(inDir)
    val q = StreamingAnalytics.sessionize(stream, 1800)
      .writeStream.format("memory").queryName("san_eq")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("san_eq")
      .filter(col("session_start") < sentinelEpoch) // drop sentinel-only sessions
      .groupBy("user_id").agg(count(lit(1)).as("n_sessions"))
      .as[(Long, Long)].collect().toMap
    // batch twin (the q_events_sessions plan)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts").asc)
    val want = spark.read.parquet(s"$dir/events.parquet")
      .withColumn("prev", lag(col("ts"), 1).over(w))
      .withColumn("newSess", when(col("prev").isNull ||
        (unix_timestamp(col("ts")) - unix_timestamp(col("prev"))) > 1800, 1L).otherwise(0L))
      .groupBy(col("user_id")).agg(sum(col("newSess")).as("n_sessions"))
      .as[(Long, Long)].collect().toMap
    assert(got == want)
    assert(want.valuesIterator.sum > want.size, "fixture should hold multi-session users")
  }
}
