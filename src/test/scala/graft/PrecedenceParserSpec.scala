package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.analysis.Analyzers
import graft.search._

/** PrecedenceQueryParser (Flexible/Precedence) — AND binds tighter than
  * OR/juxtaposition, AND-run children promote to MUST — and the
  * ExtendableQueryParser (Ext) extension-field dispatch.
  */
class PrecedenceParserSpec extends AnyFunSuite {
  private val simple = Analyzers.byName("simple")
  private def p(q: String): Query = PrecedenceQueryParser.parse(q, simple)
  private def classic(q: String): Query = QueryParser.parse(q, simple)

  test("the doc-comment example: a AND b OR c AND d -> (+a +b) (+c +d)") {
    assert(p("a AND b OR c AND d") ==
      BoolQ(List(
        Occur.Should -> BoolQ(List(Occur.Must -> TermQ("a"), Occur.Must -> TermQ("b"))),
        Occur.Should -> BoolQ(List(Occur.Must -> TermQ("c"), Occur.Must -> TermQ("d"))))))
    // the classic parser flattens the same text to +a +b +c +d
    assert(classic("a AND b OR c AND d") ==
      BoolQ(List(Occur.Must -> TermQ("a"), Occur.Must -> TermQ("b"),
        Occur.Must -> TermQ("c"), Occur.Must -> TermQ("d"))))
  }

  test("juxtaposition starts a new OR operand") {
    assert(p("a b AND c") ==
      BoolQ(List(
        Occur.Should -> TermQ("a"),
        Occur.Should -> BoolQ(List(Occur.Must -> TermQ("b"), Occur.Must -> TermQ("c"))))))
  }

  test("explicit modifiers survive inside an AND run") {
    assert(p("a AND -b OR c") ==
      BoolQ(List(
        Occur.Should -> BoolQ(List(Occur.Must -> TermQ("a"), Occur.MustNot -> TermQ("b"))),
        Occur.Should -> TermQ("c"))))
    assert(p("NOT a AND b") ==
      BoolQ(List(Occur.MustNot -> TermQ("a"), Occur.Must -> TermQ("b"))))
  }

  test("single AND run unwraps to the bool itself") {
    assert(p("a AND b") ==
      BoolQ(List(Occur.Must -> TermQ("a"), Occur.Must -> TermQ("b"))))
    assert(p("a") == TermQ("a"))
  }

  test("boost applies to the clause inside the run") {
    assert(p("a AND b^2 OR c") ==
      BoolQ(List(
        Occur.Should -> BoolQ(List(Occur.Must -> TermQ("a"), Occur.Must -> TermQ("b", 2f))),
        Occur.Should -> TermQ("c"))))
  }

  test("parenthesized groups recurse with precedence semantics") {
    assert(p("(a OR b AND c) d") ==
      BoolQ(List(
        Occur.Should -> BoolQ(List(
          Occur.Should -> TermQ("a"),
          Occur.Should -> BoolQ(List(Occur.Must -> TermQ("b"), Occur.Must -> TermQ("c"))))),
        Occur.Should -> TermQ("d"))))
  }

  test("fields, phrases and ranges parse as in the classic grammar") {
    assert(p("title:a AND \"x y\" OR num:[3 TO 7]") ==
      BoolQ(List(
        Occur.Should -> BoolQ(List(
          Occur.Must -> FieldQ("title", TermQ("a")),
          Occur.Must -> PhraseQ(List("x" -> 0, "y" -> 1)))),
        Occur.Should -> FieldQ("num", RangeQ("3", "7", true, true)))))
  }

  // --- ExtendableQueryParser ---

  private val exts: Map[String, ExtendableQueryParser.ParserExtension] = Map(
    "match" -> ((field, term) => TermQ(s"ext_$term")),
    "pfx" -> ((field, term) => PrefixQ(term)))

  test("extension key dispatches on field:key:term") {
    assert(ExtendableQueryParser.parse("title:match:bright", simple, exts) ==
      FieldQ("title", TermQ("ext_bright")))
  }

  test(":key:term uses the default (unscoped) field") {
    assert(ExtendableQueryParser.parse(":pfx:ab", simple, exts) == PrefixQ("ab"))
  }

  test("unregistered keys fall through to the classic parse") {
    assert(ExtendableQueryParser.parse("title:nokey:x y", simple, exts) ==
      BoolQ(List(
        Occur.Should -> FieldQ("title", PhraseQ(List("nokey" -> 0, "x" -> 1))),
        Occur.Should -> TermQ("y"))))
  }

  test("modifiers and surrounding clauses compose with extensions") {
    assert(ExtendableQueryParser.parse("+title:match:a -b c", simple, exts) ==
      BoolQ(List(
        Occur.Must -> FieldQ("title", TermQ("ext_a")),
        Occur.MustNot -> TermQ("b"),
        Occur.Should -> TermQ("c"))))
  }

  test("extension terms inside quotes are left alone") {
    assert(ExtendableQueryParser.parse("\"title:match:a\"", simple, exts) !=
      FieldQ("title", TermQ("ext_a")))
  }
}
