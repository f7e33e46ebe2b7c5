package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.search.{LuceneRegExp, LuceneRegexpQ, RegexpQ}

/** Lucene RegExp dialect (Util/Automaton/RegExp.cs grammar): parser +
  * span-matcher vectors for every operator, the relaxed-superset property,
  * and engine-path equivalence with the Java-dialect RegexpQ on the common
  * subset.
  */
class LuceneRegExpSpec extends AnyFunSuite {
  private def ok(pat: String, s: String): Boolean =
    LuceneRegExp.matches(LuceneRegExp.parse(pat), s)

  test("literals, union, concat, classes") {
    assert(ok("abc", "abc") && !ok("abc", "ab") && !ok("abc", "abcd"))
    assert(ok("a|bc", "a") && ok("a|bc", "bc") && !ok("a|bc", "ab"))
    assert(ok("[a-c]x", "bx") && !ok("[a-c]x", "dx"))
    assert(ok("[^a-c]", "d") && !ok("[^a-c]", "b") && !ok("[^a-c]", "dd"))
    assert(ok("[ab-dz]", "z") && ok("[ab-dz]", "c") && !ok("[ab-dz]", "e"))
  }

  test("repetition: ? * + {n} {n,} {n,m}") {
    assert(ok("a?", "") && ok("a?", "a") && !ok("a?", "aa"))
    assert(ok("a*", "") && ok("a*", "aaaa"))
    assert(ok("a+", "a") && !ok("a+", ""))
    assert(ok("a{3}", "aaa") && !ok("a{3}", "aa") && !ok("a{3}", "aaaa"))
    assert(ok("a{2,}", "aaaa") && !ok("a{2,}", "a"))
    assert(ok("a{1,2}", "a") && ok("a{1,2}", "aa") && !ok("a{1,2}", "aaa"))
    // epsilon-matching operand still satisfies a mandatory copy
    assert(ok("(a|()){2}", "a") && ok("(a|()){2}", "") && ok("(a|()){2}", "aa"))
  }

  test("anychar, anystring, empty language, quoted literal, empty string") {
    assert(ok(".", "x") && !ok(".", "xy"))
    assert(ok("@", "") && ok("@", "whatever"))
    assert(!ok("#", "") && !ok("#", "x"))
    assert(ok("\"a|b\"", "a|b") && !ok("\"a|b\"", "a"))
    assert(ok("()", "") && !ok("()", "x"))
    assert(ok("\\{x\\}", "{x}")) // escapes
  }

  test("intersection and complement (the automaton-only operators)") {
    assert(ok("dat.&.{4}", "data") && !ok("dat.&.{4}", "dat"))
    assert(ok("~(abc)", "abd") && ok("~(abc)", "") && !ok("~(abc)", "abc"))
    // complement inside a concatenation: a ~(b) c
    assert(ok("a~(b)c", "abbc") && ok("a~(b)c", "ac") && !ok("a~(b)c", "abc"))
    // empty intersection matches nothing
    assert(!ok("a&b", "a") && !ok("a&b", "b"))
    // [^...] desugars to .&~(set) exactly like the reference
    assert(ok("[^a]", "b") && !ok("[^a]", "a") && !ok("[^a]", ""))
  }

  test("numeric intervals <n-m>: variable width and fixed width") {
    // unequal widths: value in [5,40], lengths 1..2 (leading zero allowed)
    for (s <- Seq("5", "05", "13", "40", "9")) assert(ok("<5-40>", s), s)
    for (s <- Seq("4", "41", "005", "03", "00", "", "x5")) assert(!ok("<5-40>", s), s)
    // equal widths fix the digit count
    assert(ok("<05-40>", "05") && !ok("<05-40>", "5"))
    // reversed bounds swap (reference behavior)
    assert(ok("<40-5>", "13"))
  }

  test("relaxed Java regex is a superset on operator patterns") {
    val pats = Seq("dat.&.{4}", "a~(b)c", "~(abc)", "st[aeiou]+.*", "<5-40>", "(ab|cd){1,2}x?")
    val samples = Seq("data", "dat", "abc", "abbc", "ac", "stone", "05", "41", "abx", "cdab", "")
    for (p <- pats; s <- samples) {
      val ast = LuceneRegExp.parse(p)
      if (LuceneRegExp.matches(ast, s)) {
        val relaxed = ("^" + LuceneRegExp.relaxedJavaRegex(ast) + "$").r
        assert(relaxed.matches(s), s"superset violated: $p should cover $s")
      }
    }
  }

  test("classic parser: /regexp/ terms build LuceneRegexpQ, field-scoped too") {
    import graft.search._
    val a = graft.analysis.Analyzers.byName("simple")
    assert(QueryParser.parse("/dat.&.{4}/", a) == LuceneRegexpQ("dat.&.{4}"))
    QueryParser.parse("title:/ab~(c)/", a) match {
      case FieldQ("title", LuceneRegexpQ("ab~(c)")) => ()
      case other => fail(other.toString)
    }
    // escaped slash unwraps; surrounding clauses still parse
    QueryParser.parse("data AND /a\\/b/", a) match {
      case BoolQ(List((Occur.Must, TermQ("data", _)), (Occur.Must, LuceneRegexpQ("a/b"))), _) => ()
      case other => fail(other.toString)
    }
  }

  test("engine path: LuceneRegexpQ == RegexpQ on the shared dialect subset") {
    val spark = SparkTestSession.spark
    val se = IndexCache.searcher(spark, "/root/testdata/sf0.001")
    def ids(q: graft.search.Query): List[(Int, Int)] =
      se.compile(q).collect().map(h => (h.segmentId, h.docId)).sorted.toList
    assert(ids(LuceneRegexpQ("st[aeiou]+.*")) == ids(RegexpQ("st[aeiou]+.*")))
    assert(ids(LuceneRegexpQ("dat.*")) == ids(RegexpQ("dat.*")))
    // dialect-only operator really executes end-to-end
    val inter = ids(LuceneRegexpQ("dat.&.{4}"))
    assert(inter.nonEmpty && inter == ids(RegexpQ("dat[a-z0-9]")))
  }
}
