package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType
import graft.build.IndexBuilder
import graft.search.Searcher

/** Incremental (near-real-time) indexing via Structured Streaming — the
  * analog of the reference's NRT pipeline (IndexWriter + DirectoryReader.Open
  * (writer) + SearcherManager, /root/reference/src/Lucene.Net.Core/Index/
  * DirectoryReader.cs:113,174 and Search/SearcherManager.cs):
  *
  *   readStream(pages) -> foreachBatch: each micro-batch flushes as NEW
  *   segments appended to the same index layout (docs/postings/stats/
  *   manifest), exactly like a DWPT flush creating fresh segments. The
  *   streaming checkpoint gives exactly-once batch tracking (the segments_N
  *   commit analog); TieredMergePolicy + MergeJob fold the accumulating
  *   small segments, and [[SearcherManager]] hands out refreshed readers.
  */
object StreamingIndexer {

  val pagesSchema: StructType = StructType.fromDDL(
    "url STRING, warc_ts TIMESTAMP, html BINARY, text STRING, lang STRING")

  /** Segment ids for batch b occupy [base + b*segmentsPerBatch, ...). */
  def batchSegmentBase(batchId: Long, segmentsPerBatch: Int, offset: Int): Int =
    offset + (batchId * segmentsPerBatch).toInt

  /** Append one micro-batch as `segmentsPerBatch` fresh segments. Extra
    * indexed fields (multi-field indexes) come from the target index's
    * persisted config, so streaming appends stay schema-consistent. */
  def appendBatch(spark: SparkSession, batch: DataFrame, indexPath: String,
                  analyzerName: String, segmentsPerBatch: Int, batchId: Long,
                  segmentOffset: Int = 1 << 20): Unit = {
    if (batch.isEmpty) return
    val base = batchSegmentBase(batchId, segmentsPerBatch, segmentOffset)
    val nSeg = segmentsPerBatch
    // streaming ids must stay below the merge band (IndexBuilder id bands)
    require(base.toLong + nSeg <= IndexBuilder.MergeIdOffset,
      s"streaming segment ids exhausted their band: $base + $nSeg")
    val idxCfg =
      try Some(IndexBuilder.readConfig(spark, indexPath))
      catch { case _: Exception => None }
    val extraFields = idxCfg.map(_.extraFields).getOrElse(Nil)
    val indexSort = idxCfg.flatMap(_.indexSort)
    val cols = (Seq("url", "text") ++ extraFields.map(_._1) ++ indexSort.toSeq)
      .distinct.map(col)
    val withSeg = batch.select(cols: _*)
      .withColumn("segmentId",
        graft.functions.ScalarExpressions.segmentOf(col("url"), nSeg) + lit(base))
    IndexBuilder.writeSegments(spark, withSeg, indexPath, analyzerName,
      boost = 1f, flushTokens = 8 * 1024 * 1024,
      group = (base until base + nSeg).toSet, extraFields = extraFields,
      termVectors = idxCfg.exists(_.termVectors),
      indexSort = indexSort,
      indexOffsets = idxCfg.exists(_.indexOffsets))
  }

  /** Start the incremental indexer over a parquet file-source directory.
    * Trigger.AvailableNow drains what exists and stops (test/batch-catchup
    * mode); pass a processing-time trigger for continuous ingest.
    */
  def start(spark: SparkSession, inputDir: String, indexPath: String,
            checkpointDir: String, analyzerName: String = "standard",
            segmentsPerBatch: Int = 4,
            trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    // make sure the index config exists before the first reader opens
    ensureConfig(spark, indexPath, analyzerName)
    spark.readStream
      .schema(pagesSchema)
      .parquet(inputDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        appendBatch(batch.sparkSession, batch, indexPath, analyzerName,
          segmentsPerBatch, batchId)
      }
      .start()
  }

  /** Write the index config if absent (required before the first reader
    * opens; `start` does this automatically, direct appendBatch users call
    * it themselves). */
  def ensureConfig(spark: SparkSession, indexPath: String, analyzerName: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(IndexBuilder.configPath(indexPath))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) {
      val json = s"""{"numSegments":0,"analyzer":"$analyzerName","boost":1.0}"""
      val out = fs.create(p, true)
      out.write(json.getBytes("UTF-8"))
      out.close()
    }
  }
}

/** SearcherManager analog: hand out a fresh Searcher when the index CHANGED
  * (Search/SearcherManager.cs MaybeRefresh semantics — cheap when unchanged).
  * "Changed" covers everything DirectoryReader.OpenIfChanged would see: new
  * segments (manifest), merges (stats generation + live segment set), and
  * delete-table updates (the live-docs overlay).
  */
final class SearcherManager(spark: SparkSession, indexPath: String) {
  @volatile private var lastSig: String = null
  @volatile private var current: Searcher = _

  def acquire(): Searcher = {
    maybeRefresh()
    current
  }

  /** CHEAP change signature — pure filesystem listings, zero Spark jobs
    * (MaybeRefresh must stay cheap when unchanged): manifest dir listing
    * (appends add files), stats generation + current stats dir listing
    * (merges flip the generation, appends add files), deletes dir listing
    * (delete/prune change files). Listings are race-tolerant: a concurrent
    * swap may raise FileNotFound mid-list, which reads as "changed" and
    * resolves on the next acquire.
    */
  private def signature(): String = {
    val conf = spark.sparkContext.hadoopConfiguration
    def listing(path: String): String = {
      val p = new org.apache.hadoop.fs.Path(path)
      try {
        val fs = p.getFileSystem(conf)
        if (!fs.exists(p)) ""
        else fs.listStatus(p).map(st => s"${st.getPath.getName}:${st.getLen}")
          .sorted.mkString(",")
      } catch { case _: java.io.IOException => "?" } // mid-swap: treat as changed
    }
    val gen = IndexBuilder.statsGen(spark, indexPath)
    Seq(
      listing(IndexBuilder.manifestPath(indexPath)),
      gen.toString,
      // pointer-resolved current stats dir (merges flip the generation via
      // the commits/segments_N pointer; appends add files to the dir)
      listing(IndexBuilder.statsPath(spark, indexPath)),
      listing(graft.build.Deletes.deletesPath(indexPath))
    ).mkString("|")
  }

  /** Synchronized check-then-act (the reference SearcherManager is explicitly
    * thread-safe); `current` is assigned before `lastSig` so a racing
    * unsynchronized reader can never observe the new signature with a stale
    * or null searcher.
    */
  def maybeRefresh(): Boolean = synchronized {
    val sig = signature()
    if (current == null || sig != lastSig) {
      current = new Searcher(spark, indexPath)
      lastSig = sig
      true
    } else false
  }
}
