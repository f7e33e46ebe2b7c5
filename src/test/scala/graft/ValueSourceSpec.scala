package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.build.{IndexBuilder, PagesGen}
import graft.search._
import graft.search.ValueSources._
import java.nio.file.Files

/** ValueSource algebra (Lucene.Net.Queries/Function) + the TermsFilter/
  * BooleanFilter doc-set algebra (TermsFilter.cs, BooleanFilter.cs).
  * Formula pins follow the reference files cited in ValueSources.scala.
  */
class ValueSourceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val N = 120

  private lazy val se = {
    val b = Files.createTempDirectory("graftvs").toString
    val df = spark.createDataFrame(PagesGen.local(N)).toDF("url", "text")
    IndexBuilder.build(spark, df, b, IndexBuilder.BuildConfig(3, "simple", groupSize = 4))
    new Searcher(spark, b)
  }

  private def valuesOf(vs: VSrc): Map[String, Double] = {
    val df = ValueSources.functionQuery(se, vs)
    df.select("url", "score").collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
  }

  private lazy val lens: Map[String, Int] =
    se.docs.select("url", "fieldLen").collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap

  test("reciprocal/linear/rangemap formulas match the reference op-for-op") {
    val got = valuesOf(SumVS(List(
      ReciprocalVS(ColVS("fieldLen"), 2.0, 100.0, 7.0),
      LinearVS(ColVS("fieldLen"), 0.5, 3.0),
      RangeMapVS(ColVS("fieldLen"), 10.0, 30.0, 99.0, None))))
    assert(got.size == N)
    got.foreach { case (url, v) =>
      val x = lens(url).toDouble
      val recip = 100.0 / (x * 2.0 + 7.0) // ReciprocalFloatFunction.cs:85
      val lin = x * 0.5 + 3.0 // LinearFloatFunction.cs:71
      val rm = if (x >= 10.0 && x <= 30.0) 99.0 else x // default=None -> x
      assert(v == recip + lin + rm, url)
    }
  }

  test("scale observes min/max over ALL docs and maps [minObs,maxObs]->[min,max]") {
    val got = valuesOf(ScaleVS(ColVS("fieldLen"), 10.0, 20.0))
    val minL = lens.values.min.toDouble
    val maxL = lens.values.max.toDouble
    assert(minL < maxL, "fixture needs varied lengths")
    val scale = (20.0 - 10.0) / (maxL - minL) // ScaleFloatFunction.cs:115
    got.foreach { case (url, v) =>
      assert(v == (lens(url) - minL) * scale + 10.0, url)
    }
    assert(got.values.min == 10.0 && got.values.max == 20.0)
  }

  test("if/max/min/pow/div compose") {
    val got = valuesOf(IfVS(
      RangeMapVS(ColVS("fieldLen"), 0.0, 15.0, 1.0, Some(0.0)),
      MaxVS(ConstVS(2.0), ConstVS(5.0)),
      PowVS(MinVS(ConstVS(3.0), ConstVS(2.0)), DivVS(ConstVS(4.0), ConstVS(2.0)))))
    got.foreach { case (url, v) =>
      val want = if (lens(url) <= 15) 5.0 else 4.0 // 2^(4/2)
      assert(v == want, url)
    }
  }

  test("ord/rord are the sorted distinct-value dictionary ordinals") {
    val gotOrd = valuesOf(OrdVS("url"))
    val gotRord = valuesOf(RordVS("url"))
    val sortedUrls = lens.keys.toSeq.sorted
    sortedUrls.zipWithIndex.foreach { case (url, i) =>
      assert(gotOrd(url) == i.toDouble, s"ord($url)")
      // ReverseOrdFieldSource.cs:91: end - ord - 1
      assert(gotRord(url) == (sortedUrls.size - i - 1).toDouble, s"rord($url)")
    }
  }

  test("termfreq/tf/idf/docfreq/maxdoc/sttf match reader stats") {
    val term = "quick"
    val tfs = se.termPostings(term).select("url", "tf").collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(tfs.nonEmpty)
    val gotRaw = valuesOf(TermFreqVS(term))
    val gotTf = valuesOf(TfVS(term))
    gotRaw.foreach { case (url, v) => assert(v == tfs.getOrElse(url, 0).toDouble) }
    gotTf.foreach { case (url, v) => assert(v == math.sqrt(tfs.getOrElse(url, 0).toDouble)) }
    val df = tfs.size.toDouble
    val gotIdf = valuesOf(IdfVS(term)).values.toSet
    assert(gotIdf == Set(math.log(se.maxDoc.toDouble / (df + 1)) + 1.0))
    assert(valuesOf(DocFreqVS(term)).values.toSet == Set(df))
    assert(valuesOf(MaxDocVS).values.toSet == Set(se.maxDoc.toDouble))
    assert(valuesOf(SumTotalTermFreqVS).values.toSet == Set(se.sumTotalTermFreq.toDouble))
  }

  test("norm is the byte315 roundtrip of 1/sqrt(len)") {
    val got = valuesOf(NormVS)
    got.foreach { case (url, v) =>
      val want = graft.codec.SmallFloat.byte315ToFloat(
        graft.codec.SmallFloat.floatToByte315(
          (1.0 / math.sqrt(lens(url).toDouble)).toFloat)).toDouble
      assert(v == want, url)
    }
  }

  test("query value source: inner score where it matches, default elsewhere") {
    val q = TermQ("quick")
    val scores = se.compile(q)
      .join(se.docs.select("segmentId", "docId", "url"), Seq("segmentId", "docId"))
      .select("url", "score").collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val got = valuesOf(QueryVS(q, -1.5))
    got.foreach { case (url, v) =>
      assert(v == scores.getOrElse(url, -1.5), url)
    }
  }

  test("boostedQuery multiplies the inner query's score by the value") {
    val q = TermQ("quick")
    val plain = se.compile(q)
      .join(se.docs.select("segmentId", "docId", "url"), Seq("segmentId", "docId"))
      .select("url", "score").collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val got = ValueSources.boostedQuery(se, q, LinearVS(ColVS("fieldLen"), 1.0, 0.0))
      .select("url", "score").collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got.keySet == plain.keySet)
    got.foreach { case (url, v) => assert(v == plain(url) * lens(url), url) }
  }

  // ------------------------------------------------------ filter algebra

  private def docsOf(f: org.apache.spark.sql.DataFrame): Set[(Int, Int)] =
    f.collect().map(r => (r.getInt(0), r.getInt(1))).toSet

  private def termDocs(t: String): Set[(Int, Int)] =
    docsOf(Filters.query(se, TermQ(t)))

  test("terms filter is the union of each term's postings") {
    val got = docsOf(Filters.terms(se, Seq("quick", "fox")))
    assert(got == (termDocs("quick") ++ termDocs("fox")))
    assert(got.nonEmpty)
  }

  test("boolean filter: SHOULD union, MUST_NOT subtract, MUST intersect") {
    val a = termDocs("quick"); val b = termDocs("fox"); val c = termDocs("the")
    val got = docsOf(Filters.boolean(se, Seq(
      Occur.Should -> Filters.query(se, TermQ("quick")),
      Occur.Should -> Filters.query(se, TermQ("fox")),
      Occur.MustNot -> Filters.query(se, TermQ("lazy")),
      Occur.Must -> Filters.query(se, TermQ("the")))))
    val want = ((a ++ b) -- termDocs("lazy")) & c
    assert(got == want)
  }

  test("boolean filter: MUST_NOT alone subtracts from all live docs") {
    val all = docsOf(se.docs.select("segmentId", "docId"))
    val got = docsOf(Filters.boolean(se, Seq(
      Occur.MustNot -> Filters.query(se, TermQ("quick")))))
    assert(got == all -- termDocs("quick"))
  }

  test("boolean filter: empty SHOULD union matches nothing even with MUSTs") {
    // BooleanFilter.cs: hasShouldClauses && res == null => null
    val got = docsOf(Filters.boolean(se, Seq(
      Occur.Should -> Filters.query(se, TermQ("zzznosuchterm")),
      Occur.Must -> Filters.query(se, TermQ("the")))))
    assert(got.isEmpty)
  }

  test("filtered query keeps scores and restricts to the filter") {
    val q = TermQ("quick")
    val f = Filters.terms(se, Seq("fox"))
    val got = Filters.filtered(se, q, f).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getDouble(2))).toSet
    val want = se.compile(q).collect()
      .map(h => (h.segmentId, h.docId, h.score)).toSet
      .filter(t => termDocs("fox").contains((t._1, t._2)))
    assert(got == want)
    assert(got.nonEmpty)
  }
}
