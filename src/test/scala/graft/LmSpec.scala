package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.analysis.StandardAnalyzer
import graft.build.{IndexBuilder, PagesGen}
import graft.oracle.OracleIndex
import graft.search._
import java.nio.file.Files

/** LM Dirichlet-prior similarity (Search/Similarities/LMDirichletSimilarity
  * .cs) behind the similarity seam: float-exact identity against the in-repo
  * oracle (p(t|C) = (ttf+1)/(sttf+1), score = boost*(ln(1+tf/(mu*p)) +
  * ln(mu/(dl+mu))) clipped at 0, byte315-quantized docLen, coord=queryNorm=1,
  * per-term clipped sum for composites) — the same CheckHits treatment BM25
  * and TFIDF got.
  */
class LmSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val N = 500
  private lazy val pages = PagesGen.local(N)
  private lazy val oracle = new OracleIndex(pages, 4, StandardAnalyzer)

  private lazy val idx = {
    val base = Files.createTempDirectory("graftlm").toString
    val df = spark.createDataFrame(pages).toDF("url", "text")
    IndexBuilder.build(spark, df, base, IndexBuilder.BuildConfig(4, "standard", groupSize = 4))
    base
  }
  private lazy val lm = new Searcher(spark, idx, similarity = LmDirichletSim())
  private lazy val bm25s = new Searcher(spark, idx)

  private def checkIdentical(q: Query, k: Int = 10): Unit = {
    val o = oracle.searchLm(q, k).map(h => (h.key, h.score)).toList
    val s = lm.search(q, k).collect().map(r => (r.getString(0), r.getDouble(1).toFloat)).toList
    assert(s == o, s"LM mismatch for $q\nspark=$s\noracle=$o")
  }

  private val freq = PagesGen.word(2)
  private val mid = PagesGen.word(50)
  private val rare = PagesGen.word(800)

  test("term query identical to oracle (incl. clipped-to-zero docs)") {
    checkIdentical(TermQ(freq))
    checkIdentical(TermQ(rare))
    checkIdentical(TermQ(mid, boost = 2.5f))
  }

  test("boolean trees identical (leapfrog route, clause-ordered float chain)") {
    checkIdentical(BoolQ(List(Occur.Should -> TermQ(freq), Occur.Should -> TermQ(mid))))
    checkIdentical(BoolQ(List(Occur.Must -> TermQ(freq), Occur.Must -> TermQ(mid))))
    checkIdentical(BoolQ(List(Occur.Must -> TermQ(freq), Occur.MustNot -> TermQ(mid))))
    checkIdentical(BoolQ(List(
      Occur.Should -> TermQ(freq), Occur.Should -> TermQ(mid),
      Occur.Should -> TermQ(PagesGen.word(10))), minShouldMatch = 2), 20)
  }

  test("phrase identical (per-term clipped sum at the shared freq)") {
    checkIdentical(PhraseQ(List("quick" -> 0, "brown" -> 1)))
    checkIdentical(PhraseQ(List("quick" -> 0, "brown" -> 1), slop = 2))
  }

  test("explain equals score under LM") {
    val hits = lm.search(TermQ(mid), 5).collect()
    hits.foreach { r =>
      val e = lm.explain(TermQ(mid), r.getInt(2), r.getInt(3))
      assert(e.matched)
      assert(e.value == r.getDouble(1), s"explain ${e.value} != score ${r.getDouble(1)}")
    }
  }

  test("Jelinek-Mercer float scores match direct computation") {
    val lam = 0.5f
    val jm = new Searcher(spark, idx, similarity = LmJelinekMercerSim(lam))
    Seq(freq, mid, rare).foreach { t =>
      val got = jm.search(TermQ(t), 1000).collect()
        .map(r => (r.getString(0), r.getDouble(1).toFloat)).toMap
      val p = (oracle.totalTermFreq(t) + 1f) / (oracle.sumTotalTermFreq + 1f)
      val expected = oracle.docs.flatMap { d =>
        d.positions.get(t).map { ps =>
          val dl = Bm25.default.normTable(d.normByte & 0xff)
          val inner = 1 + ((1 - lam) * ps.length / dl) / (lam * p)
          d.key -> (1f * math.log(inner.toDouble).toFloat)
        }
      }.toMap
      assert(got == expected, s"JM mismatch for term $t")
    }
  }

  test("LM and BM25 share the match set") {
    val q = BoolQ(List(Occur.Should -> TermQ(freq), Occur.Should -> TermQ(mid)))
    val a = lm.compile(q).collect().map(h => (h.segmentId, h.docId)).toSet
    val b = bm25s.compile(q).collect().map(h => (h.segmentId, h.docId)).toSet
    assert(a == b)
  }
}
