package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.analysis.Analyzers
import graft.search._

/** Classic-grammar productions added in round 3: `^boost` on terms/phrases/
  * groups (QueryParserBase.cs:497-515 + the <CARAT> handling in
  * QueryParser.cs) and field scoping of phrase/group operands
  * (`field:"phrase"`, `field:(a b)` — round 2 silently dropped the binding).
  */
class QueryParserSpec extends AnyFunSuite {
  private val simple = Analyzers.byName("simple")
  private def p(q: String): Query = QueryParser.parse(q, simple)

  test("term boost") {
    assert(p("vector^2") == TermQ("vector", 2f))
    assert(p("vector^0.5 stream") ==
      BoolQ(List(Occur.Should -> TermQ("vector", 0.5f), Occur.Should -> TermQ("stream"))))
  }

  test("phrase boost and slop+boost") {
    assert(p("\"hash join\"^4") == PhraseQ(List("hash" -> 0, "join" -> 1), 4f))
    assert(p("\"hash join\"~2^4") == PhraseQ(List("hash" -> 0, "join" -> 1), 4f, slop = 2))
  }

  test("group boost distributes into scoring clauses") {
    assert(p("(vector stream)^2 -data") ==
      BoolQ(List(
        Occur.Should -> BoolQ(List(
          Occur.Should -> TermQ("vector", 2f), Occur.Should -> TermQ("stream", 2f))),
        Occur.MustNot -> TermQ("data"))))
  }

  test("boost does not leak onto MustNot clauses") {
    assert(Query.withBoost(
      BoolQ(List(Occur.Must -> TermQ("a"), Occur.MustNot -> TermQ("b"))), 3f) ==
      BoolQ(List(Occur.Must -> TermQ("a", 3f), Occur.MustNot -> TermQ("b"))))
  }

  test("field:\"phrase\" keeps the field binding") {
    assert(p("title:\"hash join\"") ==
      FieldQ("title", PhraseQ(List("hash" -> 0, "join" -> 1))))
  }

  test("field:(a b) scopes the whole group") {
    assert(p("source:(src3 src4) AND vector") ==
      BoolQ(List(
        Occur.Must -> FieldQ("source", BoolQ(List(
          Occur.Should -> TermQ("src3"), Occur.Should -> TermQ("src4")))),
        Occur.Must -> TermQ("vector"))))
  }

  test("field: with spaced operand binds the next term") {
    assert(p("title: vector") == FieldQ("title", TermQ("vector")))
  }

  test("field group uses the bound field's analyzer") {
    val kw = Analyzers.byName("keyword")
    val q = QueryParser.parse("src:(Mixed-Case)", simple, Map("src" -> kw))
    assert(q == FieldQ("src", TermQ("Mixed-Case")))
  }

  test("dictionary-query boost wraps in ConstantScoreQ") {
    assert(p("sp*^3") == ConstantScoreQ(PrefixQ("sp"), 3f))
  }

  test("existing grammar unchanged") {
    assert(p("+vector stream -\"hash join\"") ==
      BoolQ(List(
        Occur.Must -> TermQ("vector"),
        Occur.Should -> TermQ("stream"),
        Occur.MustNot -> PhraseQ(List("hash" -> 0, "join" -> 1)))))
  }

  test("boost after a dropped stopword clause vanishes with it") {
    import graft.analysis.StandardAnalyzer
    assert(QueryParser.parse("vector the^2", StandardAnalyzer) == TermQ("vector"))
    assert(QueryParser.parse("vector^2 the", StandardAnalyzer) == TermQ("vector", 2f))
  }

  test("MultiFieldQueryParser falls back per-field when analyzers diverge structurally") {
    import graft.analysis.Analyzers
    val fields = Seq("lang" -> Analyzers.byName("keyword"),
      "text" -> Analyzers.byName("standard"))
    // keyword keeps "the" (2 clauses); standard drops it (bare term) — the
    // combiner degrades to a whole-tree disjunction, each field its own parse
    val q = MultiFieldQueryParser.parse("the data", fields)
    assert(q == BoolQ(List(
      Occur.Should -> FieldQ("lang", BoolQ(List(
        Occur.Should -> TermQ("the"), Occur.Should -> TermQ("data")))),
      Occur.Should -> FieldQ("text", TermQ("data")))))
  }

  test("MultiFieldQueryParser expands unscoped clauses across fields") {
    import graft.analysis.Analyzers
    val fields = Seq("text" -> Analyzers.byName("simple"),
      "lang" -> Analyzers.byName("keyword"))
    assert(MultiFieldQueryParser.parse("data", fields) ==
      BoolQ(List(
        Occur.Should -> FieldQ("text", TermQ("data")),
        Occur.Should -> FieldQ("lang", TermQ("data")))))
    // occurs survive; each clause expands independently
    assert(MultiFieldQueryParser.parse("+data -stream", fields) ==
      BoolQ(List(
        Occur.Must -> BoolQ(List(
          Occur.Should -> FieldQ("text", TermQ("data")),
          Occur.Should -> FieldQ("lang", TermQ("data")))),
        Occur.MustNot -> BoolQ(List(
          Occur.Should -> FieldQ("text", TermQ("stream")),
          Occur.Should -> FieldQ("lang", TermQ("stream")))))))
    // explicitly scoped clauses pass through
    assert(MultiFieldQueryParser.parse("lang:EN", fields) ==
      FieldQ("lang", TermQ("EN")))
    // per-field ANALYSIS: the keyword copy keeps case, simple lowercases
    assert(MultiFieldQueryParser.parse("Mixed", fields) ==
      BoolQ(List(
        Occur.Should -> FieldQ("text", TermQ("mixed")),
        Occur.Should -> FieldQ("lang", TermQ("Mixed")))))
  }
}
