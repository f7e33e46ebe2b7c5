package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.build.{IndexBuilder, PagesGen}
import graft.search._
import graft.streaming.SearcherManager
import java.nio.file.Files

/** SearcherLifetimeManager (Search/SearcherLifetimeManager.cs): record a
  * request's searcher, acquire the SAME index point for follow-up pages
  * while the current searcher rolls forward, prune by age (newest kept). */
class SearcherLifetimeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private lazy val idxPath = {
    val base = Files.createTempDirectory("graftlife").toString
    val df = spark.createDataFrame(PagesGen.local(300)).toDF("url", "text")
    IndexBuilder.build(spark, df, base, IndexBuilder.BuildConfig(2, "standard", groupSize = 2))
    base
  }

  test("record is idempotent per instance; acquire returns the exact searcher") {
    val mgr = new SearcherLifetimeManager()
    val s = new Searcher(spark, idxPath)
    val t1 = mgr.record(s)
    assert(mgr.record(s) == t1)
    assert(mgr.acquire(t1).exists(_ eq s))
    assert(mgr.acquire(t1 + 999).isEmpty)
  }

  test("pinned searcher pages against the recorded index point across a refresh") {
    val mgr = new SearcherLifetimeManager()
    val sm = new SearcherManager(spark, idxPath)
    val first = sm.acquire()
    val q = TermQ("quick")
    val page1 = first.search(q, 5).collect().map(_.getString(0)).toList
    assert(page1.nonEmpty)
    val token = mgr.record(first)
    // the index moves on: delete the page-1 docs, roll the manager forward
    import spark.implicits._
    graft.build.Deletes.deleteUrls(spark, idxPath, page1.toDF("url"))
    assert(sm.maybeRefresh())
    val fresh = sm.acquire()
    assert(!(fresh eq first))
    val freshTop = fresh.search(q, 5).collect().map(_.getString(0)).toList
    assert(freshTop.intersect(page1).isEmpty, "refreshed searcher still sees deleted docs")
    // follow-up page through the TOKEN sees the ORIGINAL index point
    val pinned = mgr.acquire(token).get
    val pinnedPage1 = pinned.search(q, 5).collect()
    assert(pinnedPage1.map(_.getString(0)).toList == page1)
    val cursor = pinnedPage1.last
    val page2pinned = pinned.searchAfter(q, 5, cursor.getDouble(1),
        cursor.getInt(2), cursor.getInt(3))
      .collect().map(_.getString(0)).toList
    val fullRanking = pinned.search(q, 10).collect().map(_.getString(0)).toList
    assert(page2pinned == fullRanking.drop(5))
  }

  test("prune by age drops old versions but never the newest") {
    var now = 0L
    val mgr = new SearcherLifetimeManager(() => now)
    val s1 = new Searcher(spark, idxPath)
    val s2 = new Searcher(spark, idxPath)
    val t1 = mgr.record(s1)
    now = 30L * 1000000000L
    val t2 = mgr.record(s2)
    now = 45L * 1000000000L // ages: s1=45s, s2=15s
    assert(mgr.prune(mgr.pruneByAge(20.0)) == 1)
    assert(mgr.acquire(t1).isEmpty && mgr.acquire(t2).isDefined)
    // the newest survives any age
    now = 10000L * 1000000000L
    assert(mgr.prune(mgr.pruneByAge(1.0)) == 0)
    assert(mgr.acquire(t2).isDefined && mgr.size == 1)
  }
}
