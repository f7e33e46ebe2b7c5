package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.build.{IndexBuilder, PagesGen}
import graft.search._
import java.nio.file.Files

/** Collector variety (Search/TimeLimitingCollector.cs, CachingCollector.cs):
  * the deterministic tick-clock time limiter truncates per segment in docId
  * order and reports partiality; the caching collector replays one scored
  * pass into multiple downstream collectors.
  */
class CollectorsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val N = 200

  private lazy val (base, se) = {
    val b = Files.createTempDirectory("graftcoll").toString
    val df = spark.createDataFrame(PagesGen.local(N)).toDF("url", "text")
    IndexBuilder.build(spark, df, b, IndexBuilder.BuildConfig(4, "simple", groupSize = 4))
    (b, new Searcher(spark, b))
  }

  test("unlimited tick budget equals plain search, not timed out") {
    val q = TermQ("quick")
    val (df, timedOut) = se.searchTimeLimited(q, 10, Long.MaxValue)
    assert(!timedOut)
    val got = df.collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    val want = se.search(q, 10).collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    assert(got == want)
  }

  test("tick budget 1 collects each segment's first match, flags partial") {
    val q = TermQ("quick")
    val (df, timedOut) = se.searchTimeLimited(q, 100, 1)
    assert(timedOut, "budget below match count must set timedOut")
    val got = df.select("segmentId", "docId").collect()
      .map(r => (r.getInt(0), r.getInt(1))).toSet
    // the reference's sequential collect() stops right where the clock
    // fires: per segment that is the single smallest matching docId
    val want = se.compile(q).groupBy("segmentId").agg(min("docId").as("docId"))
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSet
    assert(got == want)
    assert(got.size > 1, "fixture needs matches in several segments")
  }

  test("caching collector: one pass replays to count and top-k identically") {
    val q = BoolQ(List(Occur.Should -> TermQ("quick"), Occur.Should -> TermQ("fox")))
    val c = se.cacheHits(q)
    try {
      val total = c.replay(_.count())
      assert(total == se.count(q))
      val top = c.replay(ds =>
        ds.orderBy(col("score").desc, col("segmentId").asc, col("docId").asc).limit(5)
          .collect().map(h => (h.segmentId, h.docId, h.score)).toSeq)
      val want = se.compile(q)
        .orderBy(col("score").desc, col("segmentId").asc, col("docId").asc).limit(5)
        .collect().map(h => (h.segmentId, h.docId, h.score)).toSeq
      assert(top == want)
      // a second replay off the same cache returns the same stream
      assert(c.replay(_.count()) == total)
    } finally c.release()
  }
}
