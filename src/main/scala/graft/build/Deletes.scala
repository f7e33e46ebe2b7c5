package graft.build

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Document deletion — the IndexWriter.DeleteDocuments analog
  * (/root/reference/src/Lucene.Net.Core/Index/IndexWriter.cs:1591,1741):
  * deletes are an overlay consulted by every scorer (live docs,
  * Util/FixedBitSet.cs:35), NOT a rewrite of the segments. Reference
  * semantics preserved:
  *
  *  - matching docs disappear from every query/count immediately;
  *  - collection statistics (maxDoc, df, ttf, avgdl) are NOT decremented
  *    until the deleted docs are merged away (Lucene's NumDocs vs MaxDoc);
  *  - MergeJob purges deleted docs, compacts docIds and recomputes the
  *    merged segment's statistics — after a full merge the index is
  *    byte-equivalent to one built without the deleted docs' postings.
  *
  * Layout: `deletes/` parquet of deleted urls (the stable doc key). Url-keyed
  * deletes are the DeleteDocuments(Term) analog on the key field; delete-by-
  * query resolves the query to urls first (DeleteDocuments(Query)).
  */
object Deletes {

  def deletesPath(base: String) = s"$base/deletes"
  private def deletesNewPath(base: String) = s"$base/deletes_new"

  /** Complete an interrupted [[pruneApplied]] swap: a crash between the
    * delete and the rename leaves `deletes_new` (the correct post-prune
    * content) without `deletes` — finish the rename so deleted docs can
    * never resurrect. Called from every read/write entry point.
    */
  private def recoverSwap(spark: SparkSession, indexPath: String): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val dst = new Path(deletesPath(indexPath))
    val fs = dst.getFileSystem(conf)
    val pending = new Path(deletesNewPath(indexPath))
    if (!fs.exists(dst) && fs.exists(pending)) {
      require(fs.rename(pending, dst), "deletes swap recovery failed")
      spark.catalog.refreshByPath(deletesPath(indexPath))
    }
  }

  def exists(spark: SparkSession, indexPath: String): Boolean = {
    recoverSwap(spark, indexPath)
    val p = new Path(deletesPath(indexPath))
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Append deleted urls (idempotent at read time — consumers distinct()). */
  def deleteUrls(spark: SparkSession, indexPath: String, urls: DataFrame): Unit = {
    recoverSwap(spark, indexPath) // never append over an interrupted prune
    urls.select(col(urls.columns.head).cast("string").as("url"))
      .write.mode(SaveMode.Append).parquet(deletesPath(indexPath))
  }

  /** DeleteDocuments(Query) analog: resolve matching docs to urls, append. */
  def deleteByQuery(searcher: graft.search.Searcher, indexPath: String,
                    q: graft.search.Query): Unit = {
    val spark = searcher.docs.sparkSession
    val urls = searcher.compile(q)
      .join(searcher.docs.select("segmentId", "docId", "url"), Seq("segmentId", "docId"))
      .select("url").distinct()
    deleteUrls(spark, indexPath, urls)
  }

  /** Deleted urls (distinct), empty frame when none recorded. */
  def deletedUrls(spark: SparkSession, indexPath: String): DataFrame =
    if (!exists(spark, indexPath)) {
      import spark.implicits._
      Seq.empty[String].toDF("url")
    } else spark.read.parquet(deletesPath(indexPath)).select("url").distinct()

  /** Per-segment sorted deleted docIds (the FixedBitSet live-docs analog,
    * inverted) — collected to the driver and broadcast into scorers. Bounded
    * by merge cadence: merges purge, then [[pruneApplied]] drops the urls.
    */
  def deletedDocIds(spark: SparkSession, indexPath: String): Map[Int, Array[Int]] = {
    import spark.implicits._
    if (!exists(spark, indexPath)) return Map.empty
    val docs = spark.read.parquet(IndexBuilder.docsPath(indexPath))
    deletedUrls(spark, indexPath)
      .join(docs.select("segmentId", "docId", "url"), Seq("url"))
      .select("segmentId", "docId").as[(Int, Int)].collect()
      .groupBy(_._1).map { case (s, arr) => s -> arr.map(_._2).sorted }
  }

  /** Drop urls that no longer exist in the doc store (purged by a merge).
    * Crash-safe swap: the new content lands at `deletes_new` FIRST, so the
    * only crash window (between delete and rename) leaves a state
    * [[recoverSwap]] completes on the next read — deleted docs never
    * resurrect.
    */
  def pruneApplied(spark: SparkSession, indexPath: String): Unit = {
    if (!exists(spark, indexPath)) return
    val docs = spark.read.parquet(IndexBuilder.docsPath(indexPath)).select("url")
    val remaining = deletedUrls(spark, indexPath)
      .join(docs, Seq("url"), "left_semi").collect().map(_.getString(0))
    val staged = s"$indexPath/.staging/deletes_next"
    import spark.implicits._
    spark.createDataset(remaining.toSeq).toDF("url")
      .write.mode(SaveMode.Overwrite).parquet(staged)
    val hadoopConf = spark.sparkContext.hadoopConfiguration
    val fs = new Path(indexPath).getFileSystem(hadoopConf)
    val pending = new Path(deletesNewPath(indexPath))
    if (fs.exists(pending)) fs.delete(pending, true)
    require(fs.rename(new Path(staged), pending), "deletes staging rename failed")
    val dst = new Path(deletesPath(indexPath))
    fs.delete(dst, true)
    require(fs.rename(pending, dst), "deletes table swap failed")
    // fs-level rename bypasses the automatic listing-cache refresh
    spark.catalog.refreshByPath(deletesPath(indexPath))
  }
}
