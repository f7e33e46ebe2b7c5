package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.analysis.Analyzers
import graft.build.{Deletes, IndexBuilder, PagesGen, TermVectors}
import graft.merge.{MergeJob, TieredMergePolicy}
import graft.search._
import java.nio.file.Files

/** Term vectors (Index/TermVectorsConsumer.cs analog): the doc-major
  * (term, tf, positions, offsets) store written at build time. Invariants:
  * offsets slice the ORIGINAL text back to the token (SimpleAnalyzer),
  * tf/positions agree with an independent re-tokenization, vectors survive
  * a purging merge aligned with the rebased doc store, and the
  * FastVectorHighlighter analog cuts its snippet from stored offsets.
  */
class TermVectorsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val N = 120

  private lazy val (base, pages) = {
    val b = Files.createTempDirectory("graftvec").toString
    val df = spark.createDataFrame(PagesGen.local(N)).toDF("url", "text")
    IndexBuilder.build(spark, df, b,
      IndexBuilder.BuildConfig(4, "simple", groupSize = 4, termVectors = true))
    (b, df)
  }
  private lazy val se = new Searcher(spark, base)

  test("offsets slice the original text back to each token") {
    val texts = pages.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val rows = se.termVectors
      .join(se.docs.select("segmentId", "docId", "url"), Seq("segmentId", "docId"))
      .select("url", "term", "tf", "positions", "starts", "ends")
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val text = texts(r.getString(0))
      val term = r.getString(1)
      val ps = r.getSeq[Int](3); val ss = r.getSeq[Int](4); val es = r.getSeq[Int](5)
      assert(r.getInt(2) == ps.length && ps.length == ss.length && ss.length == es.length)
      assert(ps == ps.sorted, s"positions out of order for $term")
      ss.zip(es).foreach { case (s0, e0) =>
        assert(text.substring(s0, e0).toLowerCase == term,
          s"offset slice '${text.substring(s0, e0)}' != term '$term'")
      }
    }
  }

  test("vector tf/positions agree with an independent re-tokenization") {
    val analyzer = Analyzers.byName("simple")
    val texts = pages.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val byDoc = se.termVectors
      .join(se.docs.select("segmentId", "docId", "url"), Seq("segmentId", "docId"))
      .select("url", "term", "positions")
      .collect()
      .groupBy(_.getString(0))
    texts.foreach { case (url, text) =>
      val want = analyzer.tokenize(text).toList
        .groupBy(_.term).map { case (t, ts) => t -> ts.map(_.position) }
      val got = byDoc.getOrElse(url, Array.empty)
        .map(r => r.getString(1) -> r.getSeq[Int](2).toList).toMap
      assert(got == want, s"vector mismatch for $url")
    }
  }

  test("vectors rebase through a purging merge, deleted docs drop") {
    val b = Files.createTempDirectory("graftvecmerge").toString
    val df = spark.createDataFrame(PagesGen.local(N)).toDF("url", "text")
    IndexBuilder.build(spark, df, b,
      IndexBuilder.BuildConfig(4, "simple", groupSize = 4, termVectors = true))
    val s0 = new Searcher(spark, b)
    val victim = PagesGen.urlOf(17)
    import spark.implicits._
    Deletes.deleteUrls(spark, b, Seq(victim).toDF("url"))
    val before = s0.termVectors
      .join(s0.docs.select("segmentId", "docId", "url"), Seq("segmentId", "docId"))
      .filter(col("url") =!= victim)
      .select("url", "term", "positions").collect()
      .map(r => (r.getString(0), r.getString(1), r.getSeq[Int](2).toList)).toSet
    val merges = MergeJob.mergeToPolicy(spark, b,
      new TieredMergePolicy(segsPerTier = 2.0, maxMergeAtOnce = 4, floorSegmentDocs = 5))
    assert(merges >= 1)
    val s1 = new Searcher(spark, b)
    val after = s1.termVectors
      .join(s1.docs.select("segmentId", "docId", "url"), Seq("segmentId", "docId"))
      .select("url", "term", "positions").collect()
      .map(r => (r.getString(0), r.getString(1), r.getSeq[Int](2).toList)).toSet
    assert(!after.exists(_._1 == victim), "purged doc's vectors survived the merge")
    assert(after == before, "surviving vectors changed across the merge")
  }

  test("vector snippet cuts from stored offsets, contains a query term") {
    val terms = Seq("quick", "brown")
    val snips = Highlighter.vectorSnippet(se, pages, "url", "text", terms, 40).collect()
    assert(snips.nonEmpty)
    snips.foreach { r =>
      val snip = r.getString(1).toLowerCase
      assert(terms.exists(snip.contains), s"snippet misses query terms: '$snip'")
      assert(snip.startsWith("quick") || snip.startsWith("brown"),
        s"snippet must anchor at a match offset: '$snip'")
    }
  }

  test("phrase snippet: only complete consecutive matches, best window by match count") {
    import spark.implicits._
    val b = Files.createTempDirectory("graftfvh").toString
    val df = Seq(
      // two complete matches sit in one 21-char window starting at 16
      ("u0", "yyy alpha beta end alpha beta alpha beta"),
      ("u1", "alpha end beta"),        // terms apart -> no fragment
      ("u2", "beta alpha end"),        // reversed    -> no fragment
      ("u3", "alpha beta tail")        // single match at offset 0
    ).toDF("url", "text")
    IndexBuilder.build(spark, df, b,
      IndexBuilder.BuildConfig(2, "simple", groupSize = 2, termVectors = true))
    val s = new Searcher(spark, b)
    val out = Highlighter.phraseVectorSnippet(s, df, "url", "text", Seq("alpha", "beta"), 21)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out.keySet == Set("u0", "u3"), s"phrase-less docs highlighted: $out")
    // u0's text shifts the pattern by 4 ("yyy "): matches at 4, 19, 30;
    // window at 19 holds matches 2 and 3 -> beats the earlier single-match one
    assert(out("u0") == "alpha beta alpha beta")
    assert(out("u3") == "alpha beta tail")
  }

  test("termVector(seg, doc) is partition-pruned and exact") {
    val one = se.docs.select("segmentId", "docId").limit(1).collect().head
    val (seg, doc) = (one.getInt(0), one.getInt(1))
    val v = se.termVector(seg, doc)
    val plan = v.queryExecution.executedPlan.toString
    assert(v.count() > 0)
    assert(plan.contains("PushedFilters") || plan.contains("PartitionFilters"),
      s"docId predicate not pushed:\n$plan")
  }

  test("streaming appends inherit the termVectors config") {
    import spark.implicits._
    val b = Files.createTempDirectory("graftvecstream").toString
    val df = spark.createDataFrame(PagesGen.local(30)).toDF("url", "text")
    IndexBuilder.build(spark, df, b,
      IndexBuilder.BuildConfig(2, "simple", groupSize = 2, termVectors = true))
    val batch = Seq(("s0/u1", "the quick brown fox"), ("s0/u2", "lazy dog sleeps"))
      .toDF("url", "text")
    graft.streaming.StreamingIndexer.appendBatch(spark, batch, b, "simple", 1, 0)
    val s = new Searcher(spark, b)
    val streamedVecs = s.termVectors
      .join(s.docs.select("segmentId", "docId", "url"), Seq("segmentId", "docId"))
      .filter(col("url").startsWith("s0/"))
      .select("url", "term").collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(streamedVecs.contains(("s0/u1", "quick")) && streamedVecs.contains(("s0/u2", "dog")),
      s"streamed docs missing vectors: $streamedVecs")
  }

  test("unvectored index refuses termVectors") {
    val b = Files.createTempDirectory("graftnovec").toString
    val df = spark.createDataFrame(PagesGen.local(10)).toDF("url", "text")
    IndexBuilder.build(spark, df, b, IndexBuilder.BuildConfig(1, "simple"))
    assert(!TermVectors.enabled(spark, b))
    intercept[IllegalArgumentException](new Searcher(spark, b).termVectors)
  }
}
