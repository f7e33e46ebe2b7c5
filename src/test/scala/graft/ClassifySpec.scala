package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.analysis.Analyzers
import graft.build.IndexBuilder
import graft.pipeline.{Classify, Percolator}
import graft.search._
import java.nio.file.Files

/** MemoryIndex / percolation / classification semantics on hand-computable
  * fixtures (SimpleNaiveBayesClassifier.cs, KNearestNeighborClassifier.cs,
  * MemoryIndex.cs).
  */
class ClassifySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val simple = Analyzers.byName("simple")

  test("MemoryIndex matches terms, conjunctions and exact phrases") {
    val mi = new MemoryIndex("the quick brown fox jumps", simple)
    assert(mi.matches(TermQ("quick")))
    assert(!mi.matches(TermQ("slow")))
    assert(mi.matches(BoolQ(List(Occur.Must -> TermQ("fox"), Occur.Must -> TermQ("quick")))))
    assert(mi.matches(PhraseQ(List("quick" -> 0, "brown" -> 1))))
    assert(!mi.matches(PhraseQ(List("brown" -> 0, "quick" -> 1))))
    assert(mi.matches(PrefixQ("jum")))
    assert(mi.score(TermQ("quick")).exists(_ > 0f))
  }

  test("percolate equals per-doc direct evaluation") {
    import spark.implicits._
    val docs = Seq(
      (0L, "alpha beta gamma"),
      (1L, "beta gamma delta"),
      (2L, "alpha delta"),
      (3L, "gamma alpha beta")).toDF("id", "text")
    val queries = Seq(
      "qa" -> (TermQ("alpha"): Query),
      "qp" -> (PhraseQ(List("alpha" -> 0, "beta" -> 1)): Query),
      "qn" -> (BoolQ(List(Occur.Must -> TermQ("gamma"),
        Occur.MustNot -> TermQ("delta"))): Query),
      // unguardable MUST (prefix) + optional SHOULD: the SHOULD guard must
      // NOT be used (it would wrongly skip docs without 'alpha')
      "qu" -> (BoolQ(List(Occur.Must -> PrefixQ("del"),
        Occur.Should -> TermQ("alpha"))): Query))
    val got = Percolator.percolate(docs, "id", "text", queries, "simple")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val want = Set(0L -> "qa", 2L -> "qa", 3L -> "qa",
      0L -> "qp", 3L -> "qp", 0L -> "qn", 3L -> "qn",
      1L -> "qu", 2L -> "qu")
    assert(got == want)
  }

  test("guard pre-filter never drops a match (vs direct per-doc evaluation)") {
    import spark.implicits._
    val texts = (0 until 40).map(i =>
      (i.toLong, graft.build.PagesGen.textOf(i.toLong)))
    val docs = texts.toDF("id", "text")
    val queries: Seq[(String, Query)] = Seq(
      "g_term" -> TermQ("quick"),
      "g_must" -> BoolQ(List(Occur.Must -> TermQ("quick"), Occur.Must -> TermQ("fox"))),
      "g_should" -> BoolQ(List(Occur.Should -> TermQ("brown"), Occur.Should -> TermQ("guide"))),
      "g_not" -> BoolQ(List(Occur.Must -> TermQ("fox"), Occur.MustNot -> TermQ("guide"))),
      "g_phrase" -> PhraseQ(List("quick" -> 0, "brown" -> 1)),
      "g_span" -> SpanMatchQ(SpanNearS(List(SpanTermS("quick"), SpanTermS("fox")), 1, inOrder = true)),
      "u_prefix" -> PrefixQ("qui"),
      "u_dismax" -> DisMaxQ(List(TermQ("quick"), PrefixQ("gui"))))
    val guarded = Percolator.percolate(docs, "id", "text", queries, "simple")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val direct = {
      val analyzer = Analyzers.byName("simple")
      texts.flatMap { case (id, text) =>
        val mi = new MemoryIndex(text, analyzer)
        queries.collect { case (n, q) if mi.matches(q) => (id, n) }
      }.toSet
    }
    assert(guarded == direct)
    assert(direct.exists(_._2 == "g_term"), "fixture must produce matches")
  }

  test("naive Bayes ranks the class whose docs share the input's words first") {
    import spark.implicits._
    val docs = Seq(
      ("spark join shuffle", "tech"), ("query plan join", "tech"),
      ("spark shuffle stage", "tech"),
      ("banana apple pear", "food"), ("pear soup apple", "food")).toDF("text", "cls")
    val ranked = Classify.naiveBayes(docs, "text", "cls", "spark join")
      .collect().map(r => (r.getString(0), r.getInt(1)))
    assert(ranked.toSeq == Seq("tech" -> 1, "food" -> 2))
  }

  test("KNN majority vote classifies by neighbours") {
    import spark.implicits._
    val pages = Seq(
      ("u0", "spark join shuffle plan"), ("u1", "query join plan spark"),
      ("u2", "spark shuffle stage join"),
      ("u3", "banana apple pear soup"), ("u4", "pear soup apple banana")
    ).toDF("url", "text")
    val b = Files.createTempDirectory("graftknn").toString
    IndexBuilder.build(spark, pages, b, IndexBuilder.BuildConfig(1, "simple"))
    val labels = Seq(("u0", "tech"), ("u1", "tech"), ("u2", "tech"),
      ("u3", "food"), ("u4", "food")).toDF("url", "cls")
    val out = Classify.knn(new Searcher(spark, b), labels, "spark plan", 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    assert(out.head._1 == "tech" && out.head._2 == 3L && out.head._3 == 1)
  }
}
