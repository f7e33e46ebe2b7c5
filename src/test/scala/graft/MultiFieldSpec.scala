package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.build.{IndexBuilder, PagesGen}
import graft.merge.MergeJob
import graft.search._
import java.nio.file.Files

/** Multi-field documents and (field, term) posting keys — the reference's
  * Term/FieldInfos data model (Index/Term.cs, Index/FieldInfos.cs): per-field
  * postings, per-field statistics (df, avgdl), field-bound queries (FieldQ),
  * cross-field booleans, parser `field:` syntax, and merge invariance.
  */
class MultiFieldSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val N = 600
  private lazy val idxPath = {
    val base = Files.createTempDirectory("graftmf").toString
    val df = spark.createDataFrame(PagesGen.local(N)).toDF("url", "text")
      // a keyword StringField derived from the url (the VERDICT's url-derived
      // `site` fixture) + a second analyzed field
      .withColumn("site", concat(lit("site"), pmod(crc32(col("url")), lit(7))))
    IndexBuilder.build(spark, df, base,
      IndexBuilder.BuildConfig(4, "standard", groupSize = 4,
        extraFields = Seq("site" -> "keyword")))
    base
  }
  private lazy val searcher = new Searcher(spark, idxPath)

  private def urls(q: Query, k: Int = 1000): Set[String] =
    searcher.search(q, k).collect().map(_.getString(0)).toSet

  private lazy val siteOf: Map[String, String] =
    spark.read.parquet(s"$idxPath/docs").select("url")
      .withColumn("site", concat(lit("site"), pmod(crc32(col("url")), lit(7))))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap

  test("config round-trips the field list") {
    assert(searcher.cfg.extraFields == Seq("site" -> "keyword"))
    assert(searcher.cfg.fieldList.map(_._1) == Seq("text", "site"))
  }

  test("field term query matches exactly the docs with that keyword value") {
    val expected = siteOf.filter(_._2 == "site3").keySet
    assert(expected.nonEmpty)
    assert(urls(FieldQ("site", TermQ("site3"))) == expected)
  }

  test("per-field statistics: keyword field has avgdl 1 and value-count df") {
    val st = searcher.fieldTermStats(Set(("site", "site3")))
    assert(st(("site", "site3"))._1 == siteOf.count(_._2 == "site3"))
    assert(searcher.fieldSttf("site") == N) // one token per doc
    assert(searcher.maxDoc == N)
  }

  test("PerFieldSimilarityWrapper: field delegates score with their own similarity") {
    val wrapper = new Searcher(spark, idxPath,
      perFieldSimilarity = Map("site" -> TfIdfSim))
    // text leaves still score BM25 (coord/queryNorm are base 1 for both)
    val t = TermQ(PagesGen.word(2))
    val plain = searcher.search(t, 10).collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    val viaWrapper = wrapper.search(t, 10).collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    assert(plain == viaWrapper)
    // site leaves score TFIDF with queryNorm = 1 (the wrapper's sealed
    // non-override): keyword field tf = 1, len = 1 => score = idf^2 exactly
    val df = searcher.fieldTermStats(Set(("site", "site3")))(("site", "site3"))._1
    val idf = (math.log(N / (df + 1).toDouble) + 1.0).toFloat
    val want = (idf * 1f * 1f) * idf // queryWeight * idf, float op order
    val hits = wrapper.search(FieldQ("site", TermQ("site3")), 1000).collect()
    assert(hits.nonEmpty)
    hits.foreach(r => assert(r.getDouble(1).toFloat == want,
      s"per-field TFIDF score ${r.getDouble(1)} != $want"))
    // and the same query under plain BM25 scores differently
    val bm = searcher.search(FieldQ("site", TermQ("site3")), 1).collect().head.getDouble(1)
    assert(bm.toFloat != want)
  }

  test("cross-field conjunction through the leapfrog path") {
    val freq = PagesGen.word(2)
    val q = BoolQ(List(Occur.Must -> FieldQ("site", TermQ("site1")),
      Occur.Must -> TermQ(freq)))
    val expected = urls(TermQ(freq)).intersect(siteOf.filter(_._2 == "site1").keySet)
    assert(urls(q) == expected)
    // plan shape: still a single segment-routing exchange, no aggregate
    val plan = searcher.compile(q).queryExecution.executedPlan.toString()
    assert("Exchange".r.findAllIn(plan).length == 1)
    assert(!plan.contains("HashAggregate"))
  }

  test("scores differ per field: same term indexed in both fields") {
    // 'site3' never appears in text; a text query for it is empty
    assert(urls(TermQ("site3")).isEmpty)
  }

  test("parser field syntax end-to-end") {
    val freq = PagesGen.word(2)
    val q = QueryParser.parse(s"site:site2 AND $freq", searcher.analyzer)
    assert(urls(q) == urls(TermQ(freq)).intersect(siteOf.filter(_._2 == "site2").keySet))
  }

  test("field-bound WAND identical to plan path") {
    val q = FieldQ("site", BoolQ(List(Occur.Should -> TermQ("site1"), Occur.Should -> TermQ("site4"))))
    val a = searcher.searchWand(q, 20).collect().map(r => (r.getString(0), r.getDouble(1))).toList
    val b = searcher.searchPlan(q, 20).collect().map(r => (r.getString(0), r.getDouble(1))).toList
    assert(a == b)
  }

  test("per-field query analyzer (PerFieldAnalyzerWrapper analog)") {
    import graft.analysis.{KeywordAnalyzer, StandardAnalyzer}
    // keyword-analyzed field keeps the raw value (case, punctuation) while
    // the default field's text goes through the standard chain
    val q = QueryParser.parse("site:X-1.2 Quick", StandardAnalyzer,
      Map("site" -> KeywordAnalyzer))
    q match {
      case BoolQ(List((_, FieldQ("site", TermQ(t1, _))), (_, TermQ(t2, _))), _) =>
        assert(t1 == "X-1.2") // verbatim (StringField semantics)
        assert(t2 == "quick") // standard chain lowercases
      case other => fail(s"unexpected parse: $other")
    }
  }

  test("streaming append preserves the multi-field schema") {
    val base = Files.createTempDirectory("graftmfstream").toString
    val df = spark.createDataFrame(PagesGen.local(80)).toDF("url", "text")
      .withColumn("site", concat(lit("site"), pmod(crc32(col("url")), lit(7))))
    IndexBuilder.build(spark, df, base,
      IndexBuilder.BuildConfig(2, "standard", extraFields = Seq("site" -> "keyword")))
    val batch = spark.createDataFrame(Seq(
      ("zz://appended/1", "fresh streamed text", "site99"),
      ("zz://appended/2", "more streamed text", "site99"))).toDF("url", "text", "site")
    graft.streaming.StreamingIndexer.appendBatch(spark, batch, base,
      "standard", segmentsPerBatch = 1, batchId = 0)
    val s = new Searcher(spark, base)
    val got = s.search(FieldQ("site", TermQ("site99")), 10).collect().map(_.getString(0)).toSet
    assert(got == Set("zz://appended/1", "zz://appended/2"))
  }

  test("merge preserves per-field postings and stats") {
    val freq = PagesGen.word(2)
    val q = BoolQ(List(Occur.Must -> FieldQ("site", TermQ("site5")), Occur.Should -> TermQ(freq)))
    val before = searcher.search(q, 10000).collect().map(r => (r.getString(0), r.getDouble(1))).sortBy(_._1).toList
    MergeJob.merge(spark, idxPath, List(0, 1, 2, 3))
    val after = new Searcher(spark, idxPath)
    val got = after.search(q, 10000).collect().map(r => (r.getString(0), r.getDouble(1))).sortBy(_._1).toList
    assert(got == before)
    assert(after.fieldSttf == searcher.fieldSttf)
  }
}
