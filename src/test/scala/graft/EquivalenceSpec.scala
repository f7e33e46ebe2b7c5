package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.build.{IndexBuilder, PagesGen}
import graft.search._
import java.nio.file.Files

/** Metamorphic query-algebra equivalences — the analog of the reference's
  * TestSimpleSearchEquivalence / TestDeMorgan (TestBooleanQuery.cs:153) /
  * QueryUtils metamorphic suites (SURVEY.md §5): different query shapes with
  * provably equal semantics must produce identical result sets.
  */
class EquivalenceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private lazy val s: Searcher = {
    val base = Files.createTempDirectory("grafteq").toString
    val df = spark.createDataFrame(PagesGen.local(350)).toDF("url", "text")
    IndexBuilder.build(spark, df, base, IndexBuilder.BuildConfig(3, "standard", groupSize = 3))
    new Searcher(spark, base)
  }

  private def docSet(q: Query): Set[(Int, Int)] =
    s.compile(q).collect().map(h => (h.segmentId, h.docId)).toSet

  private val a = PagesGen.word(2)
  private val b = PagesGen.word(9)
  private val c = PagesGen.word(25)

  test("A AND B is a subset of A OR B; both nonempty") {
    val and = docSet(BoolQ(List(Occur.Must -> TermQ(a), Occur.Must -> TermQ(b))))
    val or = docSet(BoolQ(List(Occur.Should -> TermQ(a), Occur.Should -> TermQ(b))))
    assert(and.nonEmpty && and.subsetOf(or))
  }

  test("De Morgan: +A -(B OR C) == docs(A) minus docs(B OR C)") {
    val lhs = docSet(BoolQ(List(Occur.Must -> TermQ(a),
      Occur.MustNot -> BoolQ(List(Occur.Should -> TermQ(b), Occur.Should -> TermQ(c))))))
    val viaSets = docSet(TermQ(a)) --
      docSet(BoolQ(List(Occur.Should -> TermQ(b), Occur.Should -> TermQ(c))))
    assert(lhs == viaSets)
    // and equals the conjunctive form +A -B -C
    val rhs = docSet(BoolQ(List(Occur.Must -> TermQ(a),
      Occur.MustNot -> TermQ(b), Occur.MustNot -> TermQ(c))))
    assert(lhs == rhs)
  }

  test("phrase is a subset of the conjunction of its terms") {
    val ph = docSet(PhraseQ(List("quick" -> 0, "brown" -> 1)))
    val and = docSet(BoolQ(List(Occur.Must -> TermQ("quick"), Occur.Must -> TermQ("brown"))))
    assert(ph.nonEmpty && ph.subsetOf(and))
  }

  test("term is a subset of its prefix query") {
    val t = docSet(TermQ(a))
    val p = docSet(PrefixQ(a.take(2)))
    assert(t.subsetOf(p))
  }

  test("multiphrase with one alternative equals plain phrase") {
    val mp = docSet(MultiPhraseQ(List((Set("quick"), 0), (Set("brown"), 1))))
    val ph = docSet(PhraseQ(List("quick" -> 0, "brown" -> 1)))
    assert(mp == ph)
  }

  test("multiphrase is the union of its expansions") {
    val mp = docSet(MultiPhraseQ(List((Set("quick", "lazy"), 0), (Set("brown", "dog"), 1))))
    val expansions = for {
      t0 <- List("quick", "lazy"); t1 <- List("brown", "dog")
    } yield docSet(PhraseQ(List(t0 -> 0, t1 -> 1)))
    assert(mp == expansions.reduce(_ ++ _))
  }

  test("minShouldMatch(1) equals plain disjunction; msm(n)=all equals conjunction") {
    val or = BoolQ(List(Occur.Should -> TermQ(a), Occur.Should -> TermQ(b)))
    assert(docSet(or.copy(minShouldMatch = 1)) == docSet(or))
    assert(docSet(or.copy(minShouldMatch = 2)) ==
      docSet(BoolQ(List(Occur.Must -> TermQ(a), Occur.Must -> TermQ(b)))))
  }

  test("constant-score preserves the doc set") {
    val q = BoolQ(List(Occur.Should -> TermQ(a), Occur.Should -> TermQ(b)))
    assert(docSet(ConstantScoreQ(q, 2f)) == docSet(q))
  }

  test("range [t, t] equals docs containing exactly terms == t bounds") {
    val r = docSet(RangeQ(a, a))
    assert(r == docSet(TermQ(a)))
  }

  test("wildcard with no metacharacters equals term") {
    assert(docSet(WildcardQ(a)) == docSet(TermQ(a)))
  }
}
