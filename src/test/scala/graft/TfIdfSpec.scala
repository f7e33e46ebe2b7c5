package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.analysis.StandardAnalyzer
import graft.build.{IndexBuilder, PagesGen}
import graft.oracle.OracleIndex
import graft.search._
import java.nio.file.Files

/** TFIDF/DefaultSimilarity — the reference's ENGINE DEFAULT similarity
  * (Search/IndexSearcher.cs:89) — behind the similarity seam: float-exact
  * identity against the in-repo oracle (tf=sqrt, idf=ln(N/(df+1))+1, byte315
  * lengthNorm, queryNorm=1/sqrt(ssw), coord=overlap/maxOverlap applied after
  * the clause-chain sum), the same CheckHits treatment BM25 got.
  */
class TfIdfSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val N = 500
  private lazy val pages = PagesGen.local(N)
  private lazy val oracle = new OracleIndex(pages, 4, StandardAnalyzer)

  private lazy val idx = {
    val base = Files.createTempDirectory("grafttfidf").toString
    val df = spark.createDataFrame(pages).toDF("url", "text")
    IndexBuilder.build(spark, df, base, IndexBuilder.BuildConfig(4, "standard", groupSize = 4))
    base
  }
  private lazy val tfidf = new Searcher(spark, idx, similarity = TfIdfSim)
  private lazy val bm25s = new Searcher(spark, idx)

  private def sparkHits(s: Searcher, q: Query, k: Int): List[(String, Float)] =
    s.search(q, k).collect().map(r => (r.getString(0), r.getDouble(1).toFloat)).toList

  private def checkIdentical(q: Query, k: Int = 10): Unit = {
    val o = oracle.searchTfIdf(q, k).map(h => (h.key, h.score)).toList
    val s = sparkHits(tfidf, q, k)
    assert(s == o, s"TFIDF mismatch for $q\nspark=$s\noracle=$o")
  }

  private val freq = PagesGen.word(2)
  private val mid = PagesGen.word(50)
  private val rare = PagesGen.word(800)

  test("SweetSpot with default factors degrades to TFIDF exactly") {
    // min=max=1, steep=0.5 => lengthNorm = 1/sqrt(len); tf 0/0 => sqrt(freq)
    // (SweetSpotSimilarity.cs:137-139 doc note)
    val sweet = new Searcher(spark, idx, similarity = SweetSpotSim())
    val q = BoolQ(List(Occur.Should -> TermQ(PagesGen.word(2)),
      Occur.Should -> TermQ(PagesGen.word(50))))
    val a = tfidf.search(q, 50).collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    val b = sweet.search(q, 50).collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    assert(a == b)
    assert(a.nonEmpty)
  }

  test("SweetSpot plateau: lengths inside [min,max] norm to 1") {
    val sweet = new Searcher(spark, idx, mode = ExactDouble,
      similarity = SweetSpotSim(lnMin = 1, lnMax = 10000, steep = 0.5f))
    val plain = new Searcher(spark, idx, mode = ExactDouble, similarity = TfIdfSim)
    val t = TermQ(PagesGen.word(2))
    // every doc length falls inside the plateau => scores are the TFIDF
    // scores with the lengthNorm factor forced to exactly 1
    val got = sweet.search(t, 20).collect().map(r => (r.getString(0), r.getDouble(1))).toMap
    val base = plain.compile(t)
      .join(plain.docs.select(org.apache.spark.sql.functions.col("segmentId"),
        org.apache.spark.sql.functions.col("docId"),
        org.apache.spark.sql.functions.col("url"),
        org.apache.spark.sql.functions.col("fieldLen")), Seq("segmentId", "docId"))
      .collect().map(r => (r.getAs[String]("url"),
        r.getAs[Double]("score") * math.sqrt(r.getAs[Int]("fieldLen").toDouble))).toMap
    got.foreach { case (u, s) =>
      assert(math.abs(s - base(u)) < 1e-9 * math.abs(s), s"plateau norm wrong for $u")
    }
    assert(got.nonEmpty)
  }

  test("term query identical to oracle") {
    checkIdentical(TermQ(freq))
    checkIdentical(TermQ(rare))
    checkIdentical(TermQ(mid, boost = 2.5f))
  }

  test("boolean OR applies coord and queryNorm identically") {
    checkIdentical(BoolQ(List(Occur.Should -> TermQ(freq), Occur.Should -> TermQ(mid))))
    checkIdentical(BoolQ(List(
      Occur.Should -> TermQ(freq), Occur.Should -> TermQ(mid), Occur.Should -> TermQ(rare))), 20)
  }

  test("boolean AND / NOT / minShouldMatch identical") {
    checkIdentical(BoolQ(List(Occur.Must -> TermQ(freq), Occur.Must -> TermQ(mid))))
    checkIdentical(BoolQ(List(Occur.Must -> TermQ(freq), Occur.MustNot -> TermQ(mid))))
    checkIdentical(BoolQ(List(
      Occur.Should -> TermQ(freq), Occur.Should -> TermQ(mid),
      Occur.Should -> TermQ(PagesGen.word(10))), minShouldMatch = 2))
  }

  test("phrase scoring identical (idf sum, sqrt(freq), lengthNorm)") {
    checkIdentical(PhraseQ(List("quick" -> 0, "brown" -> 1)))
    checkIdentical(PhraseQ(List("quick" -> 0, "brown" -> 1), slop = 2))
  }

  test("scored spans identical under TFIDF") {
    checkIdentical(SpanScoreQ(SpanNearS(List(SpanTermS("quick"), SpanTermS("fox")), 3, inOrder = true)))
  }

  test("disMax identical under TFIDF (leapfrog route)") {
    checkIdentical(DisMaxQ(List(TermQ(freq), TermQ(mid)), 0.3f))
  }

  test("mixed req/opt tree identical") {
    checkIdentical(BoolQ(List(
      Occur.Must -> TermQ(freq),
      Occur.Should -> PhraseQ(List("quick" -> 0, "brown" -> 1)),
      Occur.MustNot -> TermQ(rare))))
  }

  test("TFIDF and BM25 rank differently but share the match set") {
    val q = BoolQ(List(Occur.Should -> TermQ(freq), Occur.Should -> TermQ(mid)))
    val a = tfidf.compile(q).collect().map(h => (h.segmentId, h.docId)).toSet
    val b = bm25s.compile(q).collect().map(h => (h.segmentId, h.docId)).toSet
    assert(a == b)
  }
}
