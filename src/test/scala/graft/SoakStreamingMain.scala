package graft.drive

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.StreamingAnalytics

/** Streaming-analytics scale soak (manual drive, not part of the suite):
  * drains a multi-million-event synthetic stream through the watermarked
  * window aggregation AND the flatMapGroupsWithState sessionizer, checks
  * both against the equivalent batch plans, and reports events/s. State is
  * keyed (window, type) / user — partitioned in the state store, nothing
  * driver-resident, so the same job shape holds on a real cluster.
  */
object SoakStreaming {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(2000000L)
    val users = 50000L
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // deterministic events: user = id % users; event time strides 17s with a
    // per-user phase, so sessions (30 min gap) split naturally; 8 types
    val base = java.nio.file.Files.createTempDirectory("graftsoakstream").toString
    val ev = spark.range(n).select(
      (col("id") % users).as("user_id"),
      timestamp_seconds(lit(1700000000L) +
        (col("id") / users) * 17L + (col("id") % 97L) * 1800L).as("ts"),
      concat(lit("t"), (col("id") % 8L).cast("string")).as("event_type"))
    // sentinel per user AT THE GLOBAL MAX + 2.5h closes every real session
    // on arrival, and every sentinel session starts exactly at the shared
    // floor the count filter excludes (the q_streamed_sessions discipline)
    val sentinels = ev.select("user_id").distinct()
      .crossJoin(ev.agg(max(col("ts")).as("m")))
      .select(col("user_id"), (col("m") + expr("INTERVAL 9000 SECONDS")).as("ts"),
        lit("zz").as("event_type"))
    ev.unionByName(sentinels).repartition(8).write.mode("overwrite").parquet(s"$base/in")
    val schema = ev.schema

    // ---- windowed counts
    val t0 = System.nanoTime()
    val qw = StreamingAnalytics.windowedCounts(
        spark.readStream.schema(schema).parquet(s"$base/in"),
        "ts", "event_type", "30 minutes", "1 hour")
      .writeStream.format("memory").queryName("soak_win")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    qw.awaitTermination()
    val winWall = (System.nanoTime() - t0) / 1e9
    val gotWin = spark.table("soak_win").filter(col("event_type") =!= "zz")
      .agg(sum(col("cnt")), count(lit(1))).collect()(0)
    val wantWin = ev.groupBy(
        unix_timestamp(date_trunc("hour", col("ts"))).as("h"), col("event_type"))
      .agg(count(lit(1)).as("cnt")).agg(sum(col("cnt")), count(lit(1))).collect()(0)
    val winOk = gotWin == wantWin
    println(f"SOAKSTREAM window: $n%d events in $winWall%.1f s (${n / winWall}%.0f ev/s) " +
      f"windows=${gotWin.getLong(1)} match=$winOk")

    // ---- sessionization
    val t1 = System.nanoTime()
    val qs = StreamingAnalytics.sessionize(
        spark.readStream.schema(schema).parquet(s"$base/in"), gapSec = 1800)
      .writeStream.format("memory").queryName("soak_sess")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    qs.awaitTermination()
    val sessWall = (System.nanoTime() - t1) / 1e9
    val sentinelFloor = ev.agg((unix_timestamp(max(col("ts"))) + 9000L).as("e"))
      .collect()(0).getLong(0)
    val gotSess = spark.table("soak_sess")
      .filter(col("session_start") < sentinelFloor).count()
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts").asc)
    val wantSess = ev
      .withColumn("prev", lag(col("ts"), 1).over(w))
      .withColumn("newSess", when(col("prev").isNull ||
        (unix_timestamp(col("ts")) - unix_timestamp(col("prev"))) > 1800, 1L).otherwise(0L))
      .agg(sum(col("newSess"))).collect()(0).getLong(0)
    val sessOk = gotSess == wantSess
    println(f"SOAKSTREAM sessions: $n%d events in $sessWall%.1f s (${n / sessWall}%.0f ev/s) " +
      f"sessions=$gotSess%d (batch=$wantSess%d) match=$sessOk")
    require(winOk && sessOk, "streaming soak diverged from the batch plans")
    spark.stop()
  }
}
