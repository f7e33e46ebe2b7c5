package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.analysis._

/** Golden tokenizer fixtures from FIXTURES.md §2, derived from the classic
  * JFlex grammar + StandardFilter/LowerCaseFilter/StopFilter chain.
  */
class AnalysisSpec extends AnyFunSuite {

  private def toks(s: String): List[(String, Int)] =
    StandardAnalyzer.tokenize(s).map(t => (t.term, t.position)).toList

  test("stopword removal carries position increments") {
    assert(toks("The Quick brown FOX") == List(("quick", 1), ("brown", 2), ("fox", 3)))
  }

  test("apostrophe keeps internal ', strips possessive 's") {
    assert(toks("O'Reilly's book") == List(("o'reilly", 0), ("book", 1)))
  }

  test("acronym dots removed") {
    assert(toks("U.S.A. rocks") == List(("usa", 0), ("rocks", 1)))
  }

  test("company tokens with & and @") {
    assert(toks("AT&T and Excite@Home") == List(("at&t", 0), ("excite@home", 2)))
  }

  test("host kept whole") {
    assert(toks("visit wiki.apache.org now") == List(("visit", 0), ("wiki.apache.org", 1), ("now", 2)))
  }

  test("email") {
    assert(toks("mail bob_1@mail-host.org") == List(("mail", 0), ("bob_1@mail-host.org", 1)))
  }

  test("NUM with digit-bearing joined segments") {
    assert(toks("version 1.2.3 and 3,14") == List(("version", 0), ("1.2.3", 1), ("3,14", 3)))
  }

  test("hyphen splits when no digits") {
    assert(toks("semi-final") == List(("semi", 0), ("final", 1)))
  }

  test("NUM keeps alnum-hyphen with digit") {
    assert(toks("x-15b flies") == List(("x-15b", 0), ("flies", 1)))
  }

  test("CJ one char per token") {
    assert(toks("日本語 text") == List(("日", 0), ("本", 1), ("語", 2), ("text", 3)))
  }

  test("tokens longer than 255 chars are discarded but bump position") {
    val long = "a" * 257
    assert(toks(long) == Nil)
    assert(toks(s"ok $long fine") == List(("ok", 0), ("fine", 2)))
  }

  test("don't is not a stopword even though not is") {
    assert(toks("don't stop believing") == List(("don't", 0), ("stop", 1), ("believing", 2)))
  }

  test("acronym_dep (alnum dotted run ending in dot) becomes HOST minus trailing dot") {
    // e.g. "wiki.apache.org." — HOST can't match the trailing dot; ACRONYM_DEP does
    assert(toks("wiki.apache.org. end") == List(("wiki.apache.org", 0), ("end", 1)))
  }

  test("simple analyzer: lowercase alnum runs, SQL-parity") {
    val got = SimpleAnalyzer.tokenize("Hello, World_2 FOO-bar").map(_.term).toList
    assert(got == List("hello", "world", "2", "foo", "bar"))
  }

  test("whitespace analyzer splits on whitespace only") {
    assert(WhitespaceAnalyzer.tokenize("a b\tc\nd").map(_.term).toList == List("a", "b", "c", "d"))
  }

  test("tokenCount equals tokenize length (property over generated corpora)") {
    val texts = graft.build.PagesGen.local(200).map(_._2) ++ Seq(
      "", "the and of", "U.S.A. a.t. A.T. don't O'Reilly's", "x " + "b" * 300 + " y",
      "wiki.apache.org. the.an.a. A.N.D. at&t 1.2.3")
    texts.foreach { t =>
      assert(StandardAnalyzer.tokenCount(t) == StandardAnalyzer.tokenize(t).length, s"text=$t")
      assert(SimpleAnalyzer.tokenCount(t) == SimpleAnalyzer.tokenize(t).length, s"text=$t")
    }
  }

  test("keyword and stop analyzers") {
    assert(KeywordAnalyzer.tokenize("Hello World!").map(_.term).toList == List("Hello World!"))
    assert(KeywordAnalyzer.tokenize("").isEmpty)
    assert(StopAnalyzer.tokenize("The Quick brown fox").map(t => (t.term, t.position)).toList ==
      List(("quick", 1), ("brown", 2), ("fox", 3)))
    assert(StopAnalyzer.tokenCount("the quick brown") == 2)
  }

  test("stop set matches the 33-word reference list") {
    assert(StandardAnalyzer.EnglishStopWords.size == 33)
    assert(StandardAnalyzer.EnglishStopWords.contains("such"))
  }
}
