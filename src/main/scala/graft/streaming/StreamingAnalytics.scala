package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming analytics over event streams: watermarked tumbling-
  * window aggregation and event-time sessionization with custom state
  * (`flatMapGroupsWithState`). These are the STREAMING twins of the batch
  * q_events_window / q_events_sessions plans — same results when the stream
  * is drained over the same events (gate q_streamed_window /
  * q_streamed_sessions), plus watermark semantics (late data beyond the
  * delay is dropped; windows/sessions emit when the watermark passes them)
  * that batch plans cannot express.
  *
  * 100 TB shape: both are keyed state over the (window|user) shuffle — state
  * lives partitioned in the state store, no driver involvement; the
  * sessionizer's per-invocation sort touches only ONE user's buffered
  * micro-batch slice.
  */
object StreamingAnalytics {

  /** Tumbling event-time window counts under a watermark, Append mode: a
    * window emits once, when the watermark passes its end; events later
    * than `watermarkDelay` behind the max seen event time are dropped. */
  def windowedCounts(events: DataFrame, tsCol: String, keyCol: String,
                     watermarkDelay: String, windowDur: String): DataFrame =
    events.withColumn(tsCol, col(tsCol).cast("timestamp")) // normalize NTZ
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowDur), col(keyCol))
      .agg(count(lit(1)).as("cnt"))
      .select(unix_timestamp(col("window.start")).cast("long").as("win_start"),
        col(keyCol), col("cnt"))

  /** Streaming exact dedup — the streaming twin of the batch
    * `Dedup.exact` (first document per content digest survives): keyed
    * dedup state over the digest shuffle. With `watermarkCols` set
    * ((tsCol, delay)), uses dropDuplicatesWithinWatermark so state ages
    * out — the 100 TB continuous-ingest shape; without it, state is
    * retained for the stream's lifetime (finite drains / tests). */
  def dedupExact(docs: DataFrame, textCol: String,
                 watermark: Option[(String, String)] = None): DataFrame = {
    val keyed = docs.withColumn("digest", md5(col(textCol)))
    watermark match {
      case Some((tsCol, delay)) =>
        keyed.withColumn(tsCol, col(tsCol).cast("timestamp"))
          .withWatermark(tsCol, delay)
          .dropDuplicatesWithinWatermark("digest")
      case None => keyed.dropDuplicates("digest")
    }
  }

  /** Open session accumulator carried in the state store (epoch millis). */
  final case class SessionAcc(start: Long, last: Long, n: Int)
  /** A CLOSED session (epoch seconds, matching unix_timestamp oracles). */
  final case class Session(user_id: Long, session_start: Long,
                           session_end: Long, n_events: Int)

  /** Event-time sessionization with a `gapSec` inactivity gap —
    * KeyValueGroupedDataset.flatMapGroupsWithState with EventTimeTimeout:
    * a session CLOSES when a later event of the same user arrives more than
    * the gap after it (emitted immediately), or when the watermark passes
    * its end + gap (timeout path). Events inside one invocation are sorted
    * by event time; cross-batch order is the stream's own arrival order,
    * exactly the reference point for any streaming sessionizer. `events`
    * needs (user_id, ts) columns. */
  def sessionize(events: DataFrame, gapSec: Long,
                 watermarkDelay: String = "0 seconds"): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapMs = gapSec * 1000L
    events.select(col("user_id").cast("long").as("user_id"),
        col("ts").cast("timestamp").as("ts")) // normalize TIMESTAMP_NTZ inputs
      .withWatermark("ts", watermarkDelay)
      .as[(Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[SessionAcc, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, it: Iterator[(Long, java.sql.Timestamp)],
         state: GroupState[SessionAcc]) =>
          if (state.hasTimedOut) {
            // watermark passed last + gap: the open session is final
            val s = state.get
            state.remove()
            Iterator.single(Session(user, s.start / 1000, s.last / 1000, s.n))
          } else {
            val ts = it.map(_._2.getTime).toArray
            java.util.Arrays.sort(ts)
            val out = scala.collection.mutable.ListBuffer.empty[Session]
            var acc = state.getOption.orNull
            ts.foreach { t =>
              if (acc == null) acc = SessionAcc(t, t, 1)
              else if (t - acc.last > gapMs) {
                out += Session(user, acc.start / 1000, acc.last / 1000, acc.n)
                acc = SessionAcc(t, t, 1)
              } else acc = SessionAcc(acc.start, math.max(acc.last, t), acc.n + 1)
            }
            state.update(acc)
            state.setTimeoutTimestamp(acc.last + gapMs)
            out.iterator
          }
      }
  }
}
