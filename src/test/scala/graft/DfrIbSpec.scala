package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.analysis.StandardAnalyzer
import graft.build.{IndexBuilder, PagesGen}
import graft.oracle.OracleIndex
import graft.search._
import java.nio.file.Files

/** DFR I(n)L2 and IB LL-DF-H2 similarities (Search/Similarities/
  * DFRSimilarity.cs, IBSimilarity.cs) behind the similarity seam:
  * float-exact identity of every hit against a direct scalar computation of
  * the reference's formula chain (byte315-quantized docLen, float op order,
  * H2 inner 1+c*avg/dl in float), plus Explain≡Score.
  */
class DfrIbSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val N = 400
  private lazy val pages = PagesGen.local(N)
  private lazy val oracle = new OracleIndex(pages, 4, StandardAnalyzer)

  private lazy val idx = {
    val base = Files.createTempDirectory("graftdfr").toString
    val df = spark.createDataFrame(pages).toDF("url", "text")
    IndexBuilder.build(spark, df, base, IndexBuilder.BuildConfig(4, "standard", groupSize = 4))
    base
  }
  private lazy val dfr = new Searcher(spark, idx, similarity = DfrInL2Sim())
  private lazy val ib = new Searcher(spark, idx, similarity = IbLlSim())

  private val ln2 = math.log(2d)
  private def tfnOf(tf: Float, dl: Float, avg: Float, c: Float): Float =
    (tf * (math.log((1f + c * avg / dl).toDouble) / ln2)).toFloat

  private def directScores(term: String, sim: String): Map[String, Float] = {
    val n = oracle.maxDoc
    val sttf = oracle.sumTotalTermFreq
    val avg: Float = if (sttf <= 0) 1f else sttf.toFloat / n
    val df = oracle.docFreq(term)
    oracle.docs.flatMap { d =>
      d.positions.get(term).map { ps =>
        val dl = Bm25.default.normTable(d.normByte & 0xff)
        val tfn = tfnOf(ps.length.toFloat, dl, avg, 1f)
        val s = sim match {
          case "dfr" =>
            val bi = (math.log((n + 1) / (df + 0.5)) / ln2).toFloat
            1f * (tfn * bi) * (1f / (tfn + 1f))
          case "ib" =>
            val lambda = (df + 1f) / (n + 1f)
            1f * (-math.log((lambda / (tfn + lambda)).toDouble)).toFloat
        }
        d.key -> s
      }
    }.toMap
  }

  private val terms = Seq(PagesGen.word(2), PagesGen.word(50), PagesGen.word(800))

  test("DFR I(n)L2 float scores match the reference formula chain") {
    terms.foreach { t =>
      val got = dfr.search(TermQ(t), 1000).collect()
        .map(r => (r.getString(0), r.getDouble(1).toFloat)).toMap
      assert(got == directScores(t, "dfr"), s"DFR mismatch for $t")
    }
  }

  test("IB LL-DF-H2 float scores match the reference formula chain") {
    terms.foreach { t =>
      val got = ib.search(TermQ(t), 1000).collect()
        .map(r => (r.getString(0), r.getDouble(1).toFloat)).toMap
      assert(got == directScores(t, "ib"), s"IB mismatch for $t")
    }
  }

  test("composite queries sum per-term scores in clause order") {
    val q = BoolQ(List(Occur.Should -> TermQ(terms(0)), Occur.Should -> TermQ(terms(1))))
    Seq(dfr, ib).zip(Seq("dfr", "ib")).foreach { case (se, name) =>
      val a = directScores(terms(0), name)
      val b = directScores(terms(1), name)
      val want = (a.keySet ++ b.keySet).map { k =>
        k -> (a.getOrElse(k, 0f) + b.getOrElse(k, 0f))
      }.toMap
      val got = se.search(q, 1000).collect()
        .map(r => (r.getString(0), r.getDouble(1).toFloat)).toMap
      assert(got == want, s"$name composite mismatch")
    }
  }

  test("randomized boolean trees: clause-ordered float chains match direct computation") {
    val rnd = new scala.util.Random(20260817)
    val vocab = Vector(PagesGen.word(2), PagesGen.word(10), PagesGen.word(50),
      PagesGen.word(200), PagesGen.word(800), "quick", "fox")
    val simsByName = Map("dfr" -> dfr, "ib" -> ib)
    (0 until 30).foreach { i =>
      val n = 2 + rnd.nextInt(3)
      val clauses = List.fill(n) {
        val occ = rnd.nextInt(8) match {
          case 0 | 1 => Occur.Must
          case 2 => Occur.MustNot
          case _ => Occur.Should
        }
        occ -> TermQ(vocab(rnd.nextInt(vocab.size)))
      }
      val shoulds = clauses.count(_._1 == Occur.Should)
      val msm = if (shoulds > 1 && rnd.nextInt(3) == 0) 1 + rnd.nextInt(shoulds) else 0
      val q = BoolQ(clauses, msm)
      val name = if (rnd.nextBoolean()) "dfr" else "ib"
      val se = simsByName(name)
      val perTerm: Map[String, Map[String, Float]] =
        clauses.map(_._2.term).distinct.map(t => t -> directScores(t, name)).toMap
      // BS2 semantics: all MUSTs hold, no MustNot, >= max(msm,1|shoulds) shoulds
      val expected: Map[String, Float] = oracle.docs.flatMap { d =>
        val has = (t: String) => d.positions.contains(t)
        val musts = clauses.collect { case (Occur.Must, tq) => tq.term }
        val nots = clauses.collect { case (Occur.MustNot, tq) => tq.term }
        val shouldTerms = clauses.collect { case (Occur.Should, tq) => tq.term }
        val matchedShoulds = shouldTerms.count(has)
        val ok = musts.forall(has) && !nots.exists(has) &&
          matchedShoulds >= math.max(msm, if (musts.isEmpty) 1 else 0)
        if (!ok) None
        else {
          var acc = 0f
          clauses.foreach {
            case (Occur.MustNot, _) =>
            case (_, tq) => perTerm(tq.term).get(d.key).foreach(s => acc += s)
          }
          Some(d.key -> acc)
        }
      }.toMap
      val got = se.search(q, 10000).collect()
        .map(r => (r.getString(0), r.getDouble(1).toFloat)).toMap
      assert(got == expected, s"fuzz #$i ($name) mismatch for $q")
    }
  }

  test("explain equals score for both similarities") {
    Seq(dfr, ib).foreach { se =>
      val hits = se.search(TermQ(terms(1)), 5).collect()
      hits.foreach { r =>
        val e = se.explain(TermQ(terms(1)), r.getInt(2), r.getInt(3))
        assert(e.matched && e.value == r.getDouble(1),
          s"explain ${e.value} != score ${r.getDouble(1)}")
      }
    }
  }

  // ------------------------------------------------------------------
  // the FULL frameworks: every basicModel × afterEffect × normalization
  // (DfrSim) and distribution × lambda × normalization (IbSim), distributed
  // scores vs a direct per-doc scalar computation over the oracle corpus
  // (pins the plumbing: per-term stats wiring, byte315 docLen decode, float
  // accumulation; formula fidelity is pinned by the SQL gate twins)

  private def normParam(nz: String): Float = nz match {
    case "h3" => 800f
    case "z" => 0.3f
    case _ => 1f
  }

  private def directDfr(term: String, bm: String, ae: String, nz: String): Map[String, Float] = {
    val n = oracle.maxDoc
    val sttf = oracle.sumTotalTermFreq
    val avg: Float = if (sttf <= 0) 1f else sttf.toFloat / n
    val df = oracle.docFreq(term)
    val ttf = oracle.totalTermFreq.getOrElse(term, 0L)
    val c = normParam(nz)
    val tfn = DfrIb.tfnF(nz, c, avg, ttf, sttf)
    val basic = DfrIb.basicF(bm, n, df, ttf)
    val after = DfrIb.afterF(ae, df, ttf)
    oracle.docs.flatMap { d =>
      d.positions.get(term).map { ps =>
        val dl = Bm25.default.normTable(d.normByte & 0xff)
        val t = tfn(ps.length.toFloat, dl)
        d.key -> 1f * basic(t) * after(t)
      }
    }.toMap
  }

  private def directIb(term: String, dist: String, lam: String, nz: String): Map[String, Float] = {
    val n = oracle.maxDoc
    val sttf = oracle.sumTotalTermFreq
    val avg: Float = if (sttf <= 0) 1f else sttf.toFloat / n
    val df = oracle.docFreq(term)
    val ttf = oracle.totalTermFreq.getOrElse(term, 0L)
    val c = normParam(nz)
    val tfn = DfrIb.tfnF(nz, c, avg, ttf, sttf)
    val lambda = DfrIb.lambdaF(lam, n, df, ttf)
    val score = DfrIb.distF(dist)
    oracle.docs.flatMap { d =>
      d.positions.get(term).map { ps =>
        val dl = Bm25.default.normTable(d.normByte & 0xff)
        d.key -> 1f * score(tfn(ps.length.toFloat, dl), lambda)
      }
    }.toMap
  }

  test("full DFR matrix (7 basic models × 3 after effects × 5 normalizations)") {
    val term = PagesGen.word(50)
    val combos = for {
      bm <- DfrIb.BasicModels.toSeq.sorted
      ae <- DfrIb.AfterEffects.toSeq.sorted
      nz <- DfrIb.Normalizations.toSeq.sorted
    } yield (bm, ae, nz)
    combos.foreach { case (bm, ae, nz) =>
      val se = new Searcher(spark, idx, similarity = DfrSim(bm, ae, nz, normParam(nz)))
      val got = se.search(TermQ(term), 1000).collect()
        .map(r => (r.getString(0), r.getDouble(1).toFloat)).toMap
      assert(got == directDfr(term, bm, ae, nz), s"DFR $bm/$ae/$nz mismatch")
    }
  }

  test("full IB matrix (2 distributions × 2 lambdas × 5 normalizations)") {
    val term = PagesGen.word(50)
    val combos = for {
      dist <- DfrIb.Distributions.toSeq.sorted
      lam <- DfrIb.Lambdas.toSeq.sorted
      nz <- DfrIb.Normalizations.toSeq.sorted
    } yield (dist, lam, nz)
    combos.foreach { case (dist, lam, nz) =>
      val se = new Searcher(spark, idx, similarity = IbSim(dist, lam, nz, normParam(nz)))
      val got = se.search(TermQ(term), 1000).collect()
        .map(r => (r.getString(0), r.getDouble(1).toFloat)).toMap
      assert(got == directIb(term, dist, lam, nz), s"IB $dist/$lam/$nz mismatch")
    }
  }

  test("phrase under DFR/IB follows MultiSimilarity per-term sub-stats") {
    // two-term exact phrase: one sub-score per term's (df, ttf) at the
    // phrase's freq, summed in float (MultiSimilarity.cs:90-99)
    val (w1, w2) = ("quick", "fox")
    val se = new Searcher(spark, idx, similarity = DfrSim("g", "b", "h2"))
    val seIb = new Searcher(spark, idx, similarity = IbSim("spl", "ttf", "h2"))
    val n = oracle.maxDoc
    val sttf = oracle.sumTotalTermFreq
    val avg: Float = sttf.toFloat / n
    def phraseFreq(pos: Map[String, Array[Int]]): Int = {
      (pos.get(w1), pos.get(w2)) match {
        case (Some(a), Some(b)) =>
          val bs = b.toSet
          a.count(p => bs.contains(p + 1))
        case _ => 0
      }
    }
    def expected(isIb: Boolean): Map[String, Float] = oracle.docs.flatMap { d =>
      val freq = phraseFreq(d.positions)
      if (freq == 0) None
      else {
        val dl = Bm25.default.normTable(d.normByte & 0xff)
        var acc = 0f
        Seq(w1, w2).foreach { t =>
          val df = oracle.docFreq(t)
          val ttf = oracle.totalTermFreq.getOrElse(t, 0L)
          val tfn = DfrIb.tfnF("h2", 1f, avg, ttf, sttf)(freq.toFloat, dl)
          val s =
            if (isIb) 1f * DfrIb.distF("spl")(tfn, DfrIb.lambdaF("ttf", n, df, ttf))
            else 1f * DfrIb.basicF("g", n, df, ttf)(tfn) * DfrIb.afterF("b", df, ttf)(tfn)
          acc += s
        }
        Some(d.key -> acc)
      }
    }.toMap
    Seq((se, false), (seIb, true)).foreach { case (s, isIb) =>
      val got = s.search(PhraseQ(List(w1 -> 0, w2 -> 1)), 1000).collect()
        .map(r => (r.getString(0), r.getDouble(1).toFloat)).toMap
      assert(got == expected(isIb), s"phrase MultiStats mismatch (isIb=$isIb)")
    }
  }

  test("MultiSimilarity sums sub-similarity scores in float") {
    // MultiSimScorer (MultiSimilarity.cs:90-99): float sum of sub-scores;
    // queryNorm = 1 (MultiSimilarity never overrides it), so the TFIDF sub
    // scores at qn = 1
    val se = new Searcher(spark, idx, similarity = MultiSim(List(Bm25Sim, TfIdfSim)))
    val t = terms(1)
    val got = se.search(TermQ(t), 1000).collect()
      .map(r => (r.getString(0), r.getDouble(1).toFloat)).toMap
    val want: Map[String, Float] = oracle.docs.flatMap { d =>
      for {
        b <- oracle.scoreDoc(TermQ(t), d)
        ti <- oracle.scoreDocTfIdf(TermQ(t), d, 1f)
      } yield d.key -> (b + ti)
    }.toMap
    assert(got == want, "MultiSim != bm25 + tfidf(qn=1)")
    // degenerate single-member MultiSim == the member itself
    val single = new Searcher(spark, idx, similarity = MultiSim(List(Bm25Sim)))
    val plain = new Searcher(spark, idx)
    assert(single.search(TermQ(t), 50).collect().toSeq ==
      plain.search(TermQ(t), 50).collect().toSeq)
  }

  test("explain equals score across the general frameworks") {
    val term = PagesGen.word(50)
    Seq(DfrSim("be", "b", "h1"), DfrSim("d", "l", "z", 0.3f),
      DfrSim("p", "none", "h3", 800f), IbSim("spl", "ttf", "h3", 800f),
      IbSim("ll", "ttf", "z", 0.3f)).foreach { kind =>
      val se = new Searcher(spark, idx, similarity = kind)
      val hits = se.search(TermQ(term), 5).collect()
      assert(hits.nonEmpty)
      hits.foreach { r =>
        val e = se.explain(TermQ(term), r.getInt(2), r.getInt(3))
        assert(e.matched && e.value == r.getDouble(1),
          s"$kind explain ${e.value} != score ${r.getDouble(1)}")
      }
    }
  }
}
