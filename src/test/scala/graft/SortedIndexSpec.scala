package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.build.{CheckIndex, IndexBuilder, PagesGen}
import graft.merge.MergeJob
import graft.search._
import java.nio.file.Files

/** Index sort + early-terminating sorted collection (Lucene.Net.Misc/Index/
  * Sorter/Sorter.cs, EarlyTerminatingSortingCollector.cs): segments assign
  * docIds in sort-key order, so per-segment heads ARE the per-segment sorted
  * top-k and the global answer merges numSegments*k rows instead of sorting
  * the corpus.
  */
class SortedIndexSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val N = 400

  private lazy val (base, pages) = {
    val b = Files.createTempDirectory("graftsorted").toString
    val df = spark.createDataFrame(PagesGen.local(N)).toDF("url", "text")
      .withColumn("nlen", length(col("text")).cast("long"))
    IndexBuilder.build(spark, df, b,
      IndexBuilder.BuildConfig(4, "simple", groupSize = 4, indexSort = Some("nlen")))
    (b, df)
  }
  private lazy val se = new Searcher(spark, base)

  test("CheckIndex validates per-segment sort order") {
    val report = CheckIndex.run(spark, base)
    assert(report.ok, report.violations.mkString("; "))
  }

  test("sortedTopK equals the full global sort") {
    val got = se.sortedTopK(15).collect().map(r => (r.getString(0), r.getDouble(1)))
    val want = pages.select(col("url"), col("nlen").cast("double"))
      .orderBy(col("nlen").asc, col("url").asc).limit(15)
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    assert(got.toSeq == want.toSeq)
  }

  test("sortedTopK reads only per-segment heads (docId pushdown)") {
    val plan = se.sortedTopK(10).queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("docId"),
      s"docId head predicate not pushed to the scan:\n$plan")
  }

  test("searchSortedEarly equals filter + full sort") {
    val q = TermQ("quick")
    val got = se.searchSortedEarly(q, 12).collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    val matching = se.compile(q)
      .join(se.docs.select("segmentId", "docId", "url", "sortKey"), Seq("segmentId", "docId"))
      .select(col("url"), col("sortKey"))
      .orderBy(col("sortKey").asc, col("url").asc).limit(12)
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    assert(got.toSeq == matching.toSeq)
    assert(got.nonEmpty)
  }

  test("unsorted index rejects sorted collection") {
    val b = Files.createTempDirectory("graftunsorted").toString
    val df = spark.createDataFrame(PagesGen.local(20)).toDF("url", "text")
    IndexBuilder.build(spark, df, b, IndexBuilder.BuildConfig(1, "simple"))
    val s = new Searcher(spark, b)
    intercept[IllegalArgumentException](s.sortedTopK(5))
  }

  test("merge refuses an index-sorted index (SortingMergePolicy absent)") {
    val ex = intercept[IllegalArgumentException](
      MergeJob.merge(spark, base, List(0, 1)))
    assert(ex.getMessage.contains("index-sorted"))
  }
}
