package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.build.{CheckIndex, IndexBuilder, PagesGen}
import graft.streaming.{SearcherManager, StreamingIndexer}
import graft.search._
import java.nio.file.Files

/** Incremental indexing: streamed batches produce a queryable index whose
  * (key, score) results match a batch-built index over the same pages
  * (segment layout differs => tie order may differ; scores are invariant),
  * and SearcherManager refreshes expose newly arrived docs (NRT semantics).
  */
class StreamingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def writePages(dir: String, range: Range): Unit = {
    import spark.implicits._
    val rows = range.map { i =>
      (PagesGen.urlOf(i.toLong), new java.sql.Timestamp(1388534400000L + i * 1000L),
        ("<html>" + i).getBytes("UTF-8"), PagesGen.textOf(i.toLong), "en")
    }
    spark.createDataset(rows).toDF("url", "warc_ts", "html", "text", "lang")
      .coalesce(1).write.mode("append").parquet(dir)
  }

  private def resultSet(s: Searcher, q: Query, k: Int): List[(String, Float)] =
    s.search(q, k).collect()
      .map(r => (r.getString(0), r.getDouble(1).toFloat)).toList
      .sortBy { case (u, sc) => (-sc, u) }

  test("percolation runs as a streaming transform (stored queries x doc stream)") {
    import org.apache.spark.sql.streaming.Trigger
    val base = Files.createTempDirectory("graftpercstream").toString
    writePages(s"$base/in", 0 until 60)
    val schema = spark.read.parquet(s"$base/in").schema
    val stream = spark.readStream.schema(schema).parquet(s"$base/in")
      .withColumn("id", expr("cast(regexp_extract(url, '/p/([0-9]+)$', 1) as long)"))
    val queries: Seq[(String, Query)] = Seq(
      "alert_fox" -> PhraseQ(List("quick" -> 0, "brown" -> 1)),
      "alert_and" -> BoolQ(List(Occur.Must -> TermQ("quick"), Occur.Must -> TermQ("fox"))))
    val out = graft.pipeline.Percolator.percolate(stream, "id", "text", queries, "simple")
    val query = out.writeStream.format("memory").queryName("perc_out")
      .trigger(Trigger.AvailableNow()).start()
    query.awaitTermination()
    val got = spark.table("perc_out").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    // batch percolate over the same rows must agree exactly
    val batchIn = spark.read.parquet(s"$base/in")
      .withColumn("id", expr("cast(regexp_extract(url, '/p/([0-9]+)$', 1) as long)"))
    val want = graft.pipeline.Percolator.percolate(batchIn, "id", "text", queries, "simple")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == want)
    assert(got.nonEmpty, "fixture must produce streaming percolation matches")
  }

  test("streamed index matches batch index; refresh sees new batches") {
    val base = Files.createTempDirectory("graftstream").toString
    val inDir = s"$base/in"
    val idxDir = s"$base/idx"
    val ckpt = s"$base/ckpt"

    // batch 1: docs 0..149
    writePages(inDir, 0 until 150)
    StreamingIndexer.start(spark, inDir, idxDir, ckpt, "standard", segmentsPerBatch = 3)
      .awaitTermination()

    val mgr = new SearcherManager(spark, idxDir)
    val s1 = mgr.acquire()
    assert(s1.maxDoc == 150)
    val q = BoolQ(List(Occur.Should -> TermQ(PagesGen.word(2)), Occur.Should -> TermQ(PagesGen.word(9))))
    val firstHits = resultSet(s1, q, 8)
    assert(firstHits.nonEmpty)

    // batch 2 arrives: docs 150..249
    writePages(inDir, 150 until 250)
    StreamingIndexer.start(spark, inDir, idxDir, ckpt, "standard", segmentsPerBatch = 3)
      .awaitTermination()

    assert(mgr.maybeRefresh(), "manager must see the new segments")
    val s2 = mgr.acquire()
    assert(s2.maxDoc == 250)

    // equivalence vs a batch build over the same 250 pages
    val batchIdx = s"$base/batchidx"
    val df = spark.createDataFrame(PagesGen.local(250)).toDF("url", "text")
    IndexBuilder.build(spark, df, batchIdx, IndexBuilder.BuildConfig(4, "standard", groupSize = 4))
    val sb = new Searcher(spark, batchIdx)
    val kAll = sb.count(q).toInt + 5
    assert(resultSet(s2, q, kAll) == resultSet(sb, q, kAll))

    // invariants hold on the streamed index
    val report = CheckIndex.run(spark, idxDir)
    assert(report.ok, report.violations.mkString("; "))

    // restart with no new data: checkpoint prevents re-indexing
    StreamingIndexer.start(spark, inDir, idxDir, ckpt, "standard", segmentsPerBatch = 3)
      .awaitTermination()
    assert(new Searcher(spark, idxDir).maxDoc == 250)
  }
}
