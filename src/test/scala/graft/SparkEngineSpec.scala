package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.analysis.StandardAnalyzer
import graft.build.{IndexBuilder, PagesGen}
import graft.oracle.OracleIndex
import graft.search._
import java.nio.file.Files

/** CheckHits-style rank+score identity: every Spark query result must equal
  * the single-JVM oracle exactly (same floats), plus metamorphic
  * segment-count invariance (SURVEY.md §5 test plan items 2-3).
  */
class SparkEngineSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val N = 400
  private lazy val pages = PagesGen.local(N)
  private lazy val oracle1 = new OracleIndex(pages, 1, StandardAnalyzer)
  private lazy val oracle4 = new OracleIndex(pages, 4, StandardAnalyzer)

  private lazy val (idx1, idx4) = {
    val base = Files.createTempDirectory("graftidx").toString
    val df = spark.createDataFrame(pages).toDF("url", "text")
    IndexBuilder.build(spark, df, s"$base/s1", IndexBuilder.BuildConfig(1, "standard"))
    IndexBuilder.build(spark, df, s"$base/s4", IndexBuilder.BuildConfig(4, "standard", groupSize = 2))
    (new Searcher(spark, s"$base/s1"), new Searcher(spark, s"$base/s4"))
  }

  private def sparkHits(s: Searcher, q: Query, k: Int): List[(String, Float)] = {
    s.search(q, k).collect().map(r => (r.getString(0), r.getDouble(1).toFloat)).toList
  }

  private def checkIdentical(q: Query, k: Int = 10): Unit = {
    val o1 = oracle1.search(q, k).map(h => (h.key, h.score)).toList
    val s1 = sparkHits(idx1, q, k)
    assert(s1 == o1, s"single-segment mismatch for $q\nspark=$s1\noracle=$o1")
    val o4 = oracle4.search(q, k).map(h => (h.key, h.score)).toList
    val s4 = sparkHits(idx4, q, k)
    assert(s4 == o4, s"4-segment mismatch for $q\nspark=$s4\noracle=$o4")
    // segment-count invariance on the result SET + scores (tie order may differ
    // between segmentations because global doc order differs)
    assert(s1.map(_._2).sorted.reverse == s4.map(_._2).sorted.reverse,
      s"segment-count variance for $q")
  }

  // frequent + rare terms from the generator's zipf head/tail
  private val freq = PagesGen.word(2)
  private val mid = PagesGen.word(50)
  private val rare = PagesGen.word(3000)

  test("term query identical to oracle") {
    checkIdentical(TermQ(freq))
    checkIdentical(TermQ(mid))
    checkIdentical(TermQ(rare))
  }

  test("absent and stopword terms give zero hits") {
    assert(sparkHits(idx1, TermQ("zzzabsent"), 10).isEmpty)
    assert(sparkHits(idx1, TermQ("the"), 10).isEmpty)
  }

  test("boolean OR identical") {
    checkIdentical(BoolQ(List(Occur.Should -> TermQ(freq), Occur.Should -> TermQ(mid))))
  }

  test("boolean AND identical") {
    checkIdentical(BoolQ(List(Occur.Must -> TermQ(freq), Occur.Must -> TermQ(mid))))
  }

  test("boolean MUST_NOT identical") {
    checkIdentical(BoolQ(List(Occur.Must -> TermQ(freq), Occur.MustNot -> TermQ(mid))))
  }

  test("minShouldMatch identical") {
    checkIdentical(BoolQ(List(
      Occur.Should -> TermQ(freq), Occur.Should -> TermQ(mid),
      Occur.Should -> TermQ(PagesGen.word(10))), minShouldMatch = 2))
  }

  test("nested boolean identical") {
    checkIdentical(BoolQ(List(
      Occur.Must -> BoolQ(List(Occur.Should -> TermQ(freq), Occur.Should -> TermQ(mid))),
      Occur.Should -> TermQ(rare))))
  }

  test("phrase query identical") {
    checkIdentical(PhraseQ(List("quick" -> 0, "brown" -> 1)))
    checkIdentical(PhraseQ(List("quick" -> 0, "brown" -> 1, "fox" -> 2)))
  }

  test("phrase with stopword gap identical") {
    // "u.s.a. rocks" -> usa@0 rocks@1; "the quick" -> quick@1 with gap handling
    val q = StandardAnalyzer.tokenize("the quick brown").map(t => (t.term, t.position)).toList
    assert(q == List(("quick", 1), ("brown", 2)))
    checkIdentical(PhraseQ(q))
  }

  test("reversed phrase gives no hits unless present") {
    checkIdentical(PhraseQ(List("brown" -> 0, "quick" -> 1)))
  }

  test("prefix query identical") {
    checkIdentical(ConstantScoreQ(PrefixQ("wiki"), 1f))
    checkIdentical(PrefixQ(PagesGen.word(7).take(3)))
  }

  test("range query identical") {
    checkIdentical(RangeQ("wa", "wc", includeLo = true, includeHi = false))
  }

  test("wildcard query identical") {
    checkIdentical(WildcardQ("w?b*"))
  }

  test("fuzzy query identical") {
    checkIdentical(FuzzyQ(PagesGen.word(30), 1))
  }

  test("match-all count equals corpus size") {
    assert(idx1.count(MatchAllQ) == N)
    assert(idx4.count(MatchAllQ) == N)
  }

  test("dismax identical") {
    checkIdentical(DisMaxQ(List(TermQ(freq), TermQ(mid)), 0.3f))
  }

  test("searchAfter pages through rank order") {
    val q = BoolQ(List(Occur.Should -> TermQ(freq), Occur.Should -> TermQ(mid)))
    val all = idx1.search(q, 20).collect().map(r => (r.getString(0), r.getDouble(1), r.getInt(2), r.getInt(3)))
    if (all.length > 10) {
      val page1 = all.take(5)
      val (u, sc, sg, dc) = page1.last
      val page2 = idx1.searchAfter(q, 5, sc, sg, dc).collect()
        .map(r => (r.getString(0), r.getDouble(1), r.getInt(2), r.getInt(3)))
      assert(page2.toList == all.slice(5, 10).toList)
    }
  }

  test("query parser end-to-end") {
    val q = QueryParser.parse(s"+$freq -$mid", StandardAnalyzer)
    assert(q == BoolQ(List(Occur.Must -> TermQ(freq), Occur.MustNot -> TermQ(mid))))
    val q2 = QueryParser.parse(s"""$freq AND "quick brown"""", StandardAnalyzer)
    assert(q2 == BoolQ(List(Occur.Must -> TermQ(freq), Occur.Must -> PhraseQ(List("quick" -> 0, "brown" -> 1)))))
    checkIdentical(q2)
    val q3 = QueryParser.parse("wiki* OR x?b", StandardAnalyzer)
    assert(q3 == BoolQ(List(Occur.Should -> PrefixQ("wiki"), Occur.Should -> WildcardQ("x?b"))))
    val q4 = QueryParser.parse("\"quick brown\"~2", StandardAnalyzer)
    assert(q4 == PhraseQ(List("quick" -> 0, "brown" -> 1), slop = 2))
    checkIdentical(q4, 15)
    // field prefixes bind the clause's field (FieldQ); URLs are untouched
    assert(QueryParser.parse(s"title:$freq", StandardAnalyzer) == FieldQ("title", TermQ(freq)))
    assert(QueryParser.parse("wiki.apache.org", StandardAnalyzer) == TermQ("wiki.apache.org"))
    // a field absent from the index matches nothing (Term.cs (field, term))
    assert(sparkHits(idx1, FieldQ("nosuchfield", TermQ(freq)), 5).isEmpty)
    // default-field binding is the identity
    assert(sparkHits(idx1, FieldQ("text", TermQ(freq)), 10) == sparkHits(idx1, TermQ(freq), 10))
  }

  test("sloppy phrase matcher: reference golden example") {
    // SloppyPhraseScorer.cs doc comment: query "a b"~2 on doc "x a b a y"
    // scores twice: "a b" (distance 0) and "b a" (distance 2)
    val posA = Array(1, 3) // 'a' at positions 1 and 3
    val posB = Array(2)    // 'b' at position 2
    val freq = SloppyMatcher.phraseFreq(Array(posA, posB), Array(0, 1), 2)
    assert(freq == 1.0f / 1 + 1.0f / 3, s"got $freq")
    // slop 0: only the exact match
    assert(SloppyMatcher.phraseFreq(Array(posA, posB), Array(0, 1), 0) == 1.0f)
    // no window within slop
    assert(SloppyMatcher.phraseFreq(Array(Array(0), Array(10)), Array(0, 1), 3) == 0f)
  }

  test("sloppy phrase identical to oracle, exact subset of sloppy") {
    val qExact = PhraseQ(List("quick" -> 0, "brown" -> 1))
    val qSloppy = PhraseQ(List("quick" -> 0, "brown" -> 1), slop = 3)
    checkIdentical(qSloppy, 15)
    // every exact-phrase doc also matches the sloppy version
    val exactDocs = idx1.compile(qExact).collect().map(h => (h.segmentId, h.docId)).toSet
    val sloppyDocs = idx1.compile(qSloppy).collect().map(h => (h.segmentId, h.docId)).toSet
    assert(exactDocs.subsetOf(sloppyDocs))
    assert(sloppyDocs.size >= exactDocs.size)
    // reversed phrase within slop 2 matches where reversed-adjacent occurs
    checkIdentical(PhraseQ(List("brown" -> 0, "quick" -> 1), slop = 2), 15)
  }

  test("span matcher unit semantics") {
    val pos = Map("a" -> Array(1, 10), "b" -> Array(3, 12), "c" -> Array(5))
    // ordered near a..b slop 1: (1,3): gap = 3+1-1-2 = wait span math: start 1 end 4, len 2 -> 4-1-2=1 <= 1 ok
    assert(SpanMatcher.matches(SpanNearS(List(SpanTermS("a"), SpanTermS("b")), 1, inOrder = true), pos))
    // ordered b..a requires b before a: b@3, a@10 -> window 3..11 len 2 -> slop 6 needed
    assert(!SpanMatcher.matches(SpanNearS(List(SpanTermS("b"), SpanTermS("a")), 5, inOrder = true), pos))
    assert(SpanMatcher.matches(SpanNearS(List(SpanTermS("b"), SpanTermS("a")), 6, inOrder = true), pos))
    // unordered matches either direction within slop
    assert(SpanMatcher.matches(SpanNearS(List(SpanTermS("b"), SpanTermS("a")), 1, inOrder = false), pos))
    // spanFirst: only spans ending <= 4
    assert(SpanMatcher.spans(SpanFirstS(SpanTermS("b"), 4), pos) == List((3, 4)))
    // spanNot: a spans not overlapping c spans
    assert(SpanMatcher.spans(SpanNotS(SpanTermS("a"), SpanTermS("c")), pos).size == 2)
    assert(SpanMatcher.spans(SpanNotS(SpanTermS("c"), SpanTermS("c")), pos).isEmpty)
    // spanOr merges
    assert(SpanMatcher.spans(SpanOrS(List(SpanTermS("a"), SpanTermS("c"))), pos).size == 3)
    // spanPosRange: start >= 3 and end <= 11 (SpanPositionRangeQuery.cs:43-51)
    assert(SpanMatcher.spans(SpanPosRangeS(SpanTermS("a"), 3, 11), pos) == List((10, 11)))
    assert(SpanMatcher.spans(SpanPosRangeS(SpanTermS("b"), 0, 20), pos).size == 2)
    assert(SpanMatcher.spans(SpanPosRangeS(SpanTermS("b"), 4, 12), pos).isEmpty)
  }

  test("span multi-term wrapper expands to the SpanOr of dictionary matches") {
    val se = idx1
    val wrapped = SpanMulti.wrap(se, PrefixQ("qui"))
    val expanded = SpanMatcher.termsOf(wrapped)
    assert(expanded.contains("quick"))
    assert(expanded.forall(_.startsWith("qui")))
    // near with the wrapper == near with the explicit or (same expansion)
    checkIdentical(SpanMatchQ(SpanNearS(List(wrapped, SpanTermS("fox")), 2, inOrder = false)))
    // no dictionary match -> the never-matches sentinel
    assert(SpanMulti.wrap(se, PrefixQ("zzzznope")) == SpanTermS(SpanMatcher.NoMatchTerm))
    assert(se.count(SpanMatchQ(SpanNearS(
      List(SpanMulti.wrap(se, PrefixQ("zzzznope")), SpanTermS("fox")), 5, inOrder = false))) == 0)
  }

  test("unordered near allows overlapping clause spans (NearSpansUnordered.cs:424-427)") {
    // fixture derived from the reference's AtMatch formula, NOT the shared
    // matcher: for clause spans (0,1) and (0,1) in a one-token doc,
    // max.End - min.Start - totalLength = 1 - 0 - 2 = -1 <= slop => match.
    // Only the overlapping combination exists here, so an extra non-overlap
    // constraint (the pre-fix behavior) would wrongly reject the doc.
    val pos = Map("a" -> Array(0))
    val q = SpanNearS(List(SpanOrS(List(SpanTermS("a"), SpanTermS("b"))), SpanTermS("a")),
      slop = 0, inOrder = false)
    assert(SpanMatcher.matches(q, pos))
    // ordered near keeps the no-overlap requirement (NearSpansOrdered)
    val qo = SpanNearS(List(SpanOrS(List(SpanTermS("a"), SpanTermS("b"))), SpanTermS("a")),
      slop = 0, inOrder = true)
    assert(!SpanMatcher.matches(qo, pos))
  }

  test("span queries identical to oracle") {
    checkIdentical(SpanMatchQ(SpanNearS(List(SpanTermS("quick"), SpanTermS("fox")), 2, inOrder = true)))
    checkIdentical(SpanMatchQ(SpanNearS(List(SpanTermS("fox"), SpanTermS("quick")), 3, inOrder = false)))
    checkIdentical(SpanMatchQ(SpanOrS(List(SpanTermS("quick"), SpanTermS(PagesGen.word(40))))))
    checkIdentical(SpanMatchQ(SpanFirstS(SpanTermS("quick"), 10)))
    checkIdentical(SpanMatchQ(SpanNotS(SpanTermS("quick"), SpanTermS("brown"))))
  }

  test("scored spans identical to oracle (SpanScorer sloppyFreq)") {
    checkIdentical(SpanScoreQ(SpanNearS(List(SpanTermS("quick"), SpanTermS("fox")), 3, inOrder = true)))
    checkIdentical(SpanScoreQ(SpanNearS(List(SpanTermS("fox"), SpanTermS("quick")), 4, inOrder = false)))
    checkIdentical(SpanScoreQ(SpanOrS(List(SpanTermS("quick"), SpanTermS("fox")))))
    checkIdentical(SpanScoreQ(SpanFirstS(SpanTermS("brown"), 12)))
    // composes inside booleans
    checkIdentical(BoolQ(List(
      Occur.Must -> TermQ(freq),
      Occur.Should -> SpanScoreQ(SpanNearS(List(SpanTermS("quick"), SpanTermS("brown")), 1, inOrder = true)))))
  }

  test("span near generalizes phrase: slop 0 ordered equals exact adjacency docs") {
    val ph = idx1.compile(PhraseQ(List("quick" -> 0, "brown" -> 1))).collect()
      .map(h => (h.segmentId, h.docId)).toSet
    val sp = idx1.compile(SpanMatchQ(SpanNearS(List(SpanTermS("quick"), SpanTermS("brown")), 0, inOrder = true)))
      .collect().map(h => (h.segmentId, h.docId)).toSet
    assert(ph == sp)
  }

  test("multiphrase identical to oracle") {
    checkIdentical(MultiPhraseQ(List((Set("quick", "lazy"), 0), (Set("brown", "dog"), 1))))
    checkIdentical(MultiPhraseQ(List((Set("quick"), 0), (Set("brown", "zzzabsent"), 1))))
  }

  test("commonTerms rewrite splits by df threshold") {
    val stats = idx1.termStats(Set(freq, rare))
    val q = Query.commonTerms(List(freq, rare), stats, idx1.maxDoc,
      lowFreqOccur = Occur.Must, maxTermFrequency = 0.05)
    q match {
      case BoolQ(clauses, _) =>
        val occ = clauses.map(_._1)
        // the zipf-head term is above 5% df ratio -> SHOULD; the tail term -> MUST
        assert(occ == List(Occur.Should, Occur.Must), s"got $q")
      case other => fail(s"expected BoolQ, got $other")
    }
    checkIdentical(q)
  }

  test("boolean clause cap (TooManyClauses analog)") {
    val many = List.fill(1025)(Occur.Should -> (TermQ("x"): Query))
    intercept[IllegalArgumentException] { BoolQ(many) }
    BoolQ(List.fill(1024)(Occur.Should -> (TermQ("x"): Query))) // at the cap: fine
  }

  test("resume skips completed segments and produces an identical index") {
    import org.apache.spark.sql.functions.col
    val base = Files.createTempDirectory("graftresume").toString
    val df = spark.createDataFrame(pages).toDF("url", "text")
    // full build
    IndexBuilder.build(spark, df, s"$base/full", IndexBuilder.BuildConfig(4, "standard", groupSize = 2))
    // interrupted build: only first group committed, then resume
    IndexBuilder.build(spark, df.filter(col("url").isNotNull), s"$base/resume",
      IndexBuilder.BuildConfig(4, "standard", groupSize = 2).copy())
    // simulate: drop manifest rows? instead: build with groupSize 2 twice — second run must skip all
    val before = IndexBuilder.completedSegments(spark, s"$base/resume")
    assert(before == Set(0, 1, 2, 3))
    val t0 = System.nanoTime()
    IndexBuilder.build(spark, df, s"$base/resume", IndexBuilder.BuildConfig(4, "standard", groupSize = 2))
    val resumeSec = (System.nanoTime() - t0) / 1e9
    assert(resumeSec < 5.0, s"no-op resume should be fast, took $resumeSec s")
    val a = new Searcher(spark, s"$base/full")
    val b = new Searcher(spark, s"$base/resume")
    val q = BoolQ(List(Occur.Should -> TermQ(freq), Occur.Should -> TermQ(mid)))
    assert(a.search(q, 10).collect().toList == b.search(q, 10).collect().toList)
  }
}
