package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.analysis._
import graft.analysis.{UaxUrlEmailTokenizer => U}

/** Pins for the UAX29URLEmail analog (UaxUrlEmail.scala): URL/email spans
  * stay single tokens; the gaps follow the classic grammar + stop gaps. */
class UaxUrlEmailSpec extends AnyFunSuite {

  private def toks(text: String) =
    UaxUrlEmailAnalyzer.tokenize(text).map(t => (t.term, t.position, t.tokenType)).toList

  test("URL is one token typed <URL>; offsets slice the raw text") {
    val s = "visit https://example.com/a?x=1#f now"
    val out = UaxUrlEmailAnalyzer.tokenize(s).toList
    assert(out.map(_.term) == List("visit", "https://example.com/a?x=1#f", "now"))
    assert(out(1).tokenType == U.Url)
    assert(s.substring(out(1).startOffset, out(1).endOffset) == "https://example.com/a?x=1#f")
  }

  test("email is one token typed <EMAIL>") {
    val out = toks("mail first.last+tag@sub.example.org please")
    assert(out == List(("mail", 0, TokenType.ALPHANUM),
      ("first.last+tag@sub.example.org", 1, U.Email),
      ("please", 2, TokenType.ALPHANUM)))
  }

  test("userinfo@host inside a URL stays part of the URL (URL precedence)") {
    val out = toks("ftp://user@files.example.com/x done")
    assert(out.map(_._1) == List("ftp://user@files.example.com/x", "done"))
    assert(out.head._3 == U.Url)
  }

  test("www.-prefixed URL without scheme is recognized") {
    val out = toks("see www.example.com/path?q=2 today")
    assert(out.map(_._1) == List("see", "www.example.com/path?q=2", "today"))
    assert(out(1)._3 == U.Url)
  }

  test("trailing sentence punctuation is not part of the URL") {
    val out = toks("go to https://example.com/a.")
    assert(out.map(_._1) == List("go", "https://example.com/a"))
  }

  test("stopwords leave position gaps around URL tokens") {
    // "the" is stopped: visit@0 [gap] url@2
    val out = toks("visit the https://example.com/x")
    assert(out.map(t => (t._1, t._2)) ==
      List(("visit", 0), ("https://example.com/x", 2)))
  }

  test("URLs and emails lowercase like other terms") {
    val out = toks("HTTPS://EXAMPLE.COM/A Bob@Example.ORG")
    assert(out.map(_._1) == List("https://example.com/a", "bob@example.org"))
  }

  test("plain text still follows the classic grammar") {
    val out = toks("AT&T o'neill's U.S.A. 3.14")
    assert(out.map(_._1) == List("at&t", "o'neill", "usa", "3.14"))
  }
}
