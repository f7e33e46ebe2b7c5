package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.analysis._
import graft.analysis.{WikipediaTokenizer => W}

/** Pins for the Wikipedia markup scanner (WikipediaTokenizer.scala) —
  * documented-scope re-expression of WikipediaTokenizer.cs (the generated
  * JFlex DFA is absent from the reference tree). */
class WikipediaTokenizerSpec extends AnyFunSuite {

  private def toks(text: String, mode: Int = W.TokensOnly, untok: Set[Int] = Set.empty) =
    W.tokenize(text, mode, untok).toList

  test("internal link words typed il, offsets slice the raw markup") {
    val s = "click [[link here]] now"
    val out = toks(s)
    assert(out.map(t => (t.term, t.tokenType)) ==
      List(("click", 0), ("link", W.InternalLink), ("here", W.InternalLink), ("now", 0)))
    assert(out.map(t => s.substring(t.startOffset, t.endOffset)) ==
      List("click", "link", "here", "now"))
    assert(out.map(_.position) == List(0, 1, 2, 3))
  }

  test("pipe target|label: both sides tokenized as il") {
    val out = toks("[[target|label text]]")
    assert(out.map(_.term) == List("target", "label", "text"))
    assert(out.forall(_.tokenType == W.InternalLink))
  }

  test("category content typed c, Category: prefix excluded") {
    val out = toks("[[Category:science fiction]]")
    assert(out.map(t => (t.term, t.tokenType)) ==
      List(("science", W.Category), ("fiction", W.Category)))
  }

  test("external link: URL is one elu token, label words el") {
    val s = "see [http://foo.example.com/x?a=1 cool page] end"
    val out = toks(s)
    assert(out.map(t => (t.term, t.tokenType)) == List(
      ("see", 0), ("http://foo.example.com/x?a=1", W.ExternalLinkUrl),
      ("cool", W.ExternalLink), ("page", W.ExternalLink), ("end", 0)))
    val url = out(1)
    assert(s.substring(url.startOffset, url.endOffset) == "http://foo.example.com/x?a=1")
  }

  test("bracket without a URL scheme is plain text") {
    val out = toks("[just brackets]")
    assert(out.map(t => (t.term, t.tokenType)) == List(("just", 0), ("brackets", 0)))
  }

  test("citation ref element typed ci; other tags are separators") {
    val out = toks("a<ref>Nichols 1999</ref>b <div>c</div>")
    assert(out.map(t => (t.term, t.tokenType)) ==
      List(("a", 0), ("Nichols", W.Citation), ("1999", W.Citation), ("b", 0), ("c", 0)))
  }

  test("bold, italics, bold-italics, headings, sub-headings") {
    val out = toks("'''b1''' ''i1'' '''''bi1''''' ==h1 h2== ===s1===")
    assert(out.map(t => (t.term, t.tokenType)) == List(
      ("b1", W.Bold), ("i1", W.Italics), ("bi1", W.BoldItalics),
      ("h1", W.Heading), ("h2", W.Heading), ("s1", W.SubHeading)))
  }

  test("templates are skipped wholesale") {
    val out = toks("a {{cite web|url=x}} b")
    assert(out.map(_.term) == List("a", "b"))
  }

  test("unterminated markup runs to end of input") {
    assert(toks("x [[open link").map(t => (t.term, t.tokenType)) ==
      List(("x", 0), ("open", W.InternalLink), ("link", W.InternalLink)))
    assert(toks("'''dangling bold").map(t => (t.term, t.tokenType)) ==
      List(("dangling", W.Bold), ("bold", W.Bold)))
  }

  test("UNTOKENIZED_ONLY collapses one wiki item into one token") {
    val s = "pre [[link here again]] post"
    val out = toks(s, W.UntokenizedOnly, Set(W.InternalLink))
    assert(out.map(t => (t.term, t.position)) ==
      List(("pre", 0), ("link here again", 1), ("post", 2)))
    val c = out(1)
    // end = start + trimmed length (collapseTokens contract)
    assert(c.startOffset == s.indexOf("link"))
    assert(c.endOffset == c.startOffset + "link here again".length)
  }

  test("collapse joins by gap-width spaces (pipe becomes one space)") {
    val out = toks("[[target|label]]", W.UntokenizedOnly, Set(W.InternalLink))
    assert(out.map(_.term) == List("target label"))
  }

  test("two items of the same type do NOT merge") {
    val out = toks("[[one]] [[two]]", W.UntokenizedOnly, Set(W.InternalLink))
    assert(out.map(_.term) == List("one", "two"))
    assert(out.map(_.position) == List(0, 1))
  }

  test("BOTH mode: collapsed first, first split shares its position") {
    val out = toks("[[link here]]", W.Both, Set(W.InternalLink))
    assert(out.map(t => (t.term, t.position)) ==
      List(("link here", 0), ("link", 0), ("here", 1)))
    assert(out.forall(_.tokenType == W.InternalLink))
  }

  test("TOKENS_ONLY ignores the untokenized set") {
    val out = toks("[[link here]]", W.TokensOnly, Set(W.InternalLink))
    assert(out.map(_.term) == List("link", "here"))
  }

  test("non-collapsed types pass through individually in UNTOKENIZED_ONLY") {
    val out = toks("[[link here]] ==head==", W.UntokenizedOnly, Set(W.Heading))
    assert(out.map(t => (t.term, t.position)) ==
      List(("link", 0), ("here", 1), ("head", 2)))
  }

  test("plain words keep classic grammar types") {
    val out = toks("visit foo.example.com today")
    assert(out.map(t => (t.term, t.tokenType)) == List(
      ("visit", TokenType.ALPHANUM), ("foo.example.com", TokenType.HOST),
      ("today", TokenType.ALPHANUM)))
  }
}
