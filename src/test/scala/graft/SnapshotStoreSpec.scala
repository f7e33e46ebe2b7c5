package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.build.{HadoopSnapshotStore, IndexBuilder}
import graft.search.{MatchAllQ, Searcher, TermQ}

/** SnapshotStore: CAS commits under concurrent appenders, idempotent crash
  * recovery, conflict detection, and reader time travel across a live merge
  * (the table-format guarantees of SURVEY §1.4 without a table-format
  * dependency).
  */
class SnapshotStoreSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("two concurrent appenders: every commit lands, no lost generations") {
    val base = Files.createTempDirectory("graftsnap").toString
    val store = new HadoopSnapshotStore(spark, base)
    val perThread = 25
    val threads = (0 until 2).map { tid =>
      new Thread {
        var won: List[(Long, String)] = Nil
        override def run(): Unit = {
          for (i <- 0 until perThread) {
            val dir = s"stats_t${tid}_b$i" // appender-unique staged dir name
            val g = store.commitNext(dir)
            won ::= (g, dir)
          }
        }
      }
    }
    threads.foreach(_.start())
    threads.foreach(_.join())
    val all = threads.flatMap(_.won)
    // no two commits share a generation; nothing was lost or overwritten
    assert(all.map(_._1).distinct.size == 2 * perThread)
    assert(store.head() == all.map(_._1).max)
    all.foreach { case (g, dir) => assert(store.resolve(g).contains(dir), s"gen $g") }
  }

  test("CAS: same-content retry succeeds (crash recovery), conflict fails") {
    val base = Files.createTempDirectory("graftsnap2").toString
    val store = new HadoopSnapshotStore(spark, base)
    assert(store.head() == -1L)
    assert(store.commitIfAbsent(1L, "stats_g1"))
    assert(store.commitIfAbsent(1L, "stats_g1")) // idempotent re-publish
    assert(!store.commitIfAbsent(1L, "stats_other")) // true conflict
    assert(store.resolve(1L).contains("stats_g1"))
    // the merge-protocol wrapper surfaces the conflict loudly
    intercept[IllegalStateException] {
      IndexBuilder.commitPointer(spark, base, 1L, "stats_other")
    }
  }

  test("reader pins a generation across a concurrent merge (time travel)") {
    val base = Files.createTempDirectory("graftsnap3").toString
    import spark.implicits._
    val pages = (0 until 120)
      .map(i => (f"u$i%04d", s"alpha data token$i")).toDF("url", "text")
    IndexBuilder.build(spark, pages, base,
      IndexBuilder.BuildConfig(numSegments = 4, analyzerName = "simple", groupSize = 4))

    val store = new HadoopSnapshotStore(spark, base)
    val genBefore = IndexBuilder.statsGen(spark, base)
    val dirBefore = IndexBuilder.statsDirOf(spark, base, genBefore)
    val pinned = new Searcher(spark, base) // resolves the pre-merge snapshot
    val before = pinned.count(TermQ("alpha"))
    assert(before == 120)

    // concurrent merge publishes a NEW generation
    val merged = graft.merge.MergeJob.merge(spark, base,
      IndexBuilder.completedSegments(spark, base).toList.sorted)
    assert(merged >= 0)
    val genAfter = IndexBuilder.statsGen(spark, base)
    assert(genAfter == genBefore + 1)

    // time travel: the old generation still resolves (tombstone grace
    // defers physical deletion one commit) and the pinned reader's view is
    // unchanged while a fresh reader sees the merged snapshot
    assert(store.resolve(genAfter).isDefined)
    assert(IndexBuilder.statsDirOf(spark, base, genBefore) == dirBefore)
    assert(spark.read.parquet(s"$base/$dirBefore").count() > 0)
    assert(pinned.count(TermQ("alpha")) == before)
    assert(pinned.count(MatchAllQ) == 120)
    val fresh = new Searcher(spark, base)
    assert(fresh.count(TermQ("alpha")) == before)
  }
}
