package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.build.{IndexBuilder, PagesGen}
import graft.search._
import java.nio.file.Files

/** Explain() ≡ Score() — the CheckHits.VerifyExplanation contract
  * (TestFramework/Search/CheckHits.cs:173), held to EXACT equality here
  * because the explanation evaluates the same scorer closures: for every
  * sampled (query, matching doc) pair the explanation value equals the
  * compiled score; non-matching docs explain as matched=false.
  */
class ExplainSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val N = 500
  private lazy val idxPath = {
    val base = Files.createTempDirectory("graftexplain").toString
    val df = spark.createDataFrame(PagesGen.local(N)).toDF("url", "text")
    IndexBuilder.build(spark, df, base, IndexBuilder.BuildConfig(4, "standard", groupSize = 4))
    base
  }

  private val freq = PagesGen.word(2)
  private val mid = PagesGen.word(50)
  private val rare = PagesGen.word(800)

  private def queries(rnd: scala.util.Random): Seq[Query] = {
    def w() = PagesGen.word(rnd.nextInt(400))
    Seq(
      TermQ(freq), TermQ(w(), boost = 1f + rnd.nextFloat()),
      BoolQ(List(Occur.Must -> TermQ(freq), Occur.Must -> TermQ(mid))),
      BoolQ(List(Occur.Should -> TermQ(freq), Occur.Should -> TermQ(w()),
        Occur.MustNot -> TermQ(rare))),
      BoolQ(List(Occur.Should -> TermQ(freq), Occur.Should -> TermQ(mid),
        Occur.Should -> TermQ(w())), minShouldMatch = 2),
      PhraseQ(List("quick" -> 0, "brown" -> 1)),
      PhraseQ(List("quick" -> 0, "brown" -> 1), slop = 2),
      MultiPhraseQ(List((Set("quick", "lazy"), 0), (Set("brown", "dog"), 1))),
      DisMaxQ(List(TermQ(freq), TermQ(mid)), 0.4f),
      ConstantScoreQ(PrefixQ("qu"), 2f),
      BoolQ(List(Occur.Must -> TermQ(freq),
        Occur.Should -> PhraseQ(List("quick" -> 0, "brown" -> 1)))),
      FuzzyTopQ("quicc", 1, 10),
      SpanMatchQ(SpanNearS(List(SpanTermS("quick"), SpanTermS("fox")), 3, inOrder = true)),
      SpanScoreQ(SpanNearS(List(SpanTermS("quick"), SpanTermS("fox")), 3, inOrder = true)))
  }

  private def checkSearcher(s: Searcher, label: String): Unit = {
    val rnd = new scala.util.Random(11)
    var pairs = 0
    queries(rnd).foreach { q =>
      val hits = s.compile(q).collect()
      // sample matching docs: explanation value must equal the score exactly
      rnd.shuffle(hits.toList).take(4).foreach { h =>
        val e = s.explain(q, h.segmentId, h.docId)
        assert(e.matched, s"[$label] explain says non-match for a hit: $q doc=$h\n$e")
        assert(e.value == h.score,
          s"[$label] explain!=score for $q doc=(${h.segmentId},${h.docId}): ${e.value} vs ${h.score}\n$e")
        pairs += 1
      }
      // a doc outside the hit set explains as non-matching
      val hitSet = hits.map(h => (h.segmentId, h.docId)).toSet
      val miss = (0 until N).iterator.map(i => (i % 4, i / 4)).find(d => !hitSet.contains(d))
      miss.foreach { case (seg, doc) =>
        val e = s.explain(q, seg, doc)
        assert(!e.matched, s"[$label] explain matched a non-hit for $q: ($seg,$doc)\n$e")
        pairs += 1
      }
    }
    assert(pairs > 40)
  }

  test("BM25 LuceneFloat: explanation value equals score exactly") {
    checkSearcher(new Searcher(spark, idxPath), "bm25-float")
  }

  test("BM25 ExactDouble: explanation value equals score exactly") {
    checkSearcher(new Searcher(spark, idxPath, mode = ExactDouble), "bm25-double")
  }

  test("TFIDF: explanation value equals score exactly (coord + queryNorm)") {
    checkSearcher(new Searcher(spark, idxPath, similarity = TfIdfSim), "tfidf-float")
    checkSearcher(new Searcher(spark, idxPath, mode = ExactDouble, similarity = TfIdfSim), "tfidf-double")
  }

  test("deleted doc explains as non-matching") {
    val base = Files.createTempDirectory("graftexplaindel").toString
    val df = spark.createDataFrame(PagesGen.local(100)).toDF("url", "text")
    IndexBuilder.build(spark, df, base, IndexBuilder.BuildConfig(2, "standard"))
    val s0 = new Searcher(spark, base)
    val h = s0.compile(TermQ(freq)).collect().head
    val url = s0.docs.filter(org.apache.spark.sql.functions.col("segmentId") === h.segmentId &&
      org.apache.spark.sql.functions.col("docId") === h.docId).select("url").collect()(0).getString(0)
    import spark.implicits._
    graft.build.Deletes.deleteUrls(spark, base, Seq(url).toDF("url"))
    val s1 = new Searcher(spark, base)
    assert(!s1.explain(TermQ(freq), h.segmentId, h.docId).matched)
  }
}
