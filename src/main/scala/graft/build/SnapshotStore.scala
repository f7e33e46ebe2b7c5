package graft.build

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Snapshot-table seam — the Iceberg-shaped storage contract of SURVEY §1.4
  * formalized: an index is a sequence of numbered SNAPSHOTS (generations),
  * each an immutable stats directory published by exactly one small pointer
  * object `commits/segments_<gen>`. The trait gives the three table-format
  * guarantees users of a data platform expect, without a table-format
  * dependency:
  *
  *  - **Snapshot isolation with CONCURRENT writers**: [[commitIfAbsent]] is
  *    a compare-and-swap — it succeeds iff generation `gen` was not already
  *    published with different content (create-no-overwrite of the single
  *    pointer object: atomic on HDFS, a conditional PUT on object stores,
  *    O_EXCL on local disks). Two appenders racing the same generation:
  *    one wins, the loser re-reads the head and retries on the next slot
  *    ([[commitNext]]).
  *  - **Reader time travel**: [[resolve]] returns the stats directory of
  *    ANY published generation. Snapshots are immutable and cleanup is
  *    deferred one commit (tombstone grace, merge/MergeJob.scala), so a
  *    reader pinned to generation G keeps a consistent view while a merge
  *    publishes G+1.
  *  - **Idempotent recovery**: re-publishing a generation with the SAME
  *    content succeeds (a crashed commit's retry recomputes the same
  *    generation and pointer content) — only true conflicts fail.
  *
  * Schema evolution rides on Parquet's own reader-side schema merge (stats
  * and docs tables are ordinary Parquet; added columns read as null on old
  * snapshots), so it needs no machinery here.
  *
  * Reference seam: SegmentInfos generations + IndexDeletionPolicy
  * (Index/SegmentInfos.cs:49-69 GetLastCommitGeneration walk), re-expressed
  * as a table-format snapshot log.
  */
trait SnapshotStore {
  /** Highest published generation; -1 when nothing was ever committed. */
  def head(): Long

  /** Stats directory name of a published generation (time travel), None if
    * that generation was never published. */
  def resolve(gen: Long): Option[String]

  /** CAS publish: true iff `gen` now maps to `dirName` AND this call (or an
    * identical earlier one) created it; false on a conflicting publication. */
  def commitIfAbsent(gen: Long, dirName: String): Boolean

  /** Publish `dirName` at the next free generation — optimistic retry loop
    * for concurrent appenders. Returns the generation won. `dirName` must
    * be unique to this appender's snapshot (each writer stages its OWN
    * immutable directory before committing — true of every producer here:
    * merge writes stats_g<N> under its job id, streaming batches stage per
    * batch id); the idempotent-recovery clause of [[commitIfAbsent]] can
    * then never mistake another appender's win for ours. */
  def commitNext(dirName: String): Long = {
    var g = math.max(head() + 1, 1L)
    while (!commitIfAbsent(g, dirName)) g = math.max(head() + 1, g + 1)
    g
  }
}

/** Pointer-file store over any Hadoop FileSystem (the production store).
  * Pointer objects live under `<base>/commits/segments_<gen>`; content is
  * the published stats directory name.
  */
final class HadoopSnapshotStore(spark: SparkSession, base: String) extends SnapshotStore {
  private def conf = spark.sparkContext.hadoopConfiguration
  private def commitsDir = new Path(IndexBuilder.commitsPath(base))
  private def pointer(gen: Long) = new Path(commitsDir, s"segments_$gen")

  override def head(): Long = {
    val fs = commitsDir.getFileSystem(conf)
    if (!fs.exists(commitsDir)) return -1L
    val gens = fs.listStatus(commitsDir).map(_.getPath.getName).collect {
      case n if n.startsWith("segments_") && n.length > 9 && n.drop(9).forall(_.isDigit) =>
        n.drop(9).toLong
    }
    if (gens.isEmpty) -1L else gens.max
  }

  override def resolve(gen: Long): Option[String] = {
    val p = pointer(gen)
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim)
      finally in.close()
    }
  }

  override def commitIfAbsent(gen: Long, dirName: String): Boolean = {
    val p = pointer(gen)
    val fs = p.getFileSystem(conf)
    fs.mkdirs(commitsDir)
    val created =
      if ("file" == p.toUri.getScheme || p.toUri.getScheme == null) {
        // local disks: O_EXCL via NIO — RawLocalFileSystem's create(false)
        // is a non-atomic exists()+create() pair
        val local = java.nio.file.Paths.get(
          new Path(p.toUri.getPath).toString)
        try {
          java.nio.file.Files.write(local, dirName.getBytes("UTF-8"),
            java.nio.file.StandardOpenOption.CREATE_NEW,
            java.nio.file.StandardOpenOption.WRITE)
          true
        } catch { case _: java.nio.file.FileAlreadyExistsException => false }
      } else {
        // HDFS: atomic create-no-overwrite; S3A: conditional PUT
        try {
          val out = fs.create(p, false)
          out.write(dirName.getBytes("UTF-8"))
          out.close()
          true
        } catch { case _: java.io.IOException => false }
      }
    // idempotent recovery: an identical earlier publish counts as success
    created || resolve(gen).contains(dirName)
  }
}
