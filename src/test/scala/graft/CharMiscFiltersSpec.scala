package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.analysis._
import graft.analysis.MiscFilters._

/** Pins for the char-filter seam (CharFilters.scala) and the generic
  * Path/Pattern/Miscellaneous/Position/Sinks components
  * (MiscFilters.scala). Offset assertions slice the ORIGINAL text — the
  * BaseCharFilter correction contract. */
class CharMiscFiltersSpec extends AnyFunSuite {

  private def toks(a: Analyzer, text: String): List[(String, Int, Int, Int)] =
    a.tokenize(text).map(t => (t.term, t.position, t.startOffset, t.endOffset)).toList

  test("MappingCharFilter greedy replace with offset correction") {
    val orig = "photo graph"
    val out = toks(MappingFixtureAnalyzer, orig)
    assert(out.map(_._1) == List("foto", "graf"))
    // corrected offsets slice the original text exactly
    assert(out.map { case (_, _, s, e) => orig.substring(s, e) } == List("photo", "graph"))
  }

  test("MappingCharFilter growing replacement") {
    val mf = new MappingCharFilter(Map("x" -> "yyy"))
    val cf = mf("axb")
    assert(cf.text == "ayyyb")
    // all three replacement chars map back inside the matched input char
    assert(cf.correct(0) == 0)
    assert((1 to 3).map(cf.correct).forall(c => c >= 1 && c <= 2))
    assert(cf.correct(4) == 2) // 'b' at original index 2
  }

  test("PatternReplaceCharFilter with group refs and offset correction") {
    val orig = "call 123-456 now"
    val out = toks(PatternReplaceFixtureAnalyzer, orig)
    assert(out.map(_._1) == List("call", "123456", "now"))
    val (_, _, s, e) = out(1)
    assert(orig.substring(s, e) == "123-456")
    val (_, _, s2, e2) = out(2)
    assert(orig.substring(s2, e2) == "now")
  }

  test("HTMLStrip: tags, script/style content, comments, entities") {
    val orig = "<html><head><style>p{color:red}</style>" +
      "<script>var hidden=1;</script></head>" +
      "<body><p class=\"x\">Hello <b>world</b></p><!-- note --> caf&eacute; &amp; tea</body></html>"
    val out = toks(HtmlStripAnalyzer, orig)
    assert(out.map(_._1) == List("hello", "world", "café", "tea"))
    // no token from script/style/comment content
    assert(!out.exists(_._1.contains("hidden")))
    // offsets point into the raw markup. BaseCharFilter's boundary rule
    // (a correction entry AT an offset applies at that offset) keeps
    // START offsets exact; an END offset landing exactly on a removal
    // boundary extends over the immediately-following stripped markup —
    // same contract as the reference filter.
    val world = out.find(_._1 == "world").get
    assert(orig.substring(world._3).startsWith("world"))
    assert(orig.substring(world._3, world._4).startsWith("world"))
    val cafe = out.find(_._1 == "café").get
    assert(orig.substring(cafe._3, cafe._4) == "caf&eacute;")
  }

  test("HTMLStrip: br becomes newline, CDATA content kept, numeric entities") {
    val cf = new HtmlStripCharFilter()(
      "a<br/>b <![CDATA[keep<this>]]> &#65;&#x42;")
    assert(cf.text == "a\nb keep<this> AB")
  }

  test("HTMLStrip: escapedTags kept verbatim") {
    val cf = new HtmlStripCharFilter(Set("b"))("x <b>y</b> <i>z</i>")
    assert(cf.text == "x <b>y</b> z")
  }

  test("PathHierarchyTokenizer prefixes at one position") {
    assert(pathHierarchy("/a/b/c").map(t => (t.term, t.position, t.startOffset, t.endOffset)).toList ==
      List(("/a", 0, 0, 2), ("/a/b", 0, 0, 4), ("/a/b/c", 0, 0, 6)))
    assert(pathHierarchy("a/b/c").map(_.term).toList == List("a", "a/b", "a/b/c"))
    // trailing delimiter rides on the last token (endDelimiter path)
    assert(pathHierarchy("/a/b/").map(_.term).toList == List("/a", "/a/b", "/a/b/"))
    // skip drops leading components; emitted tokens start AT the delimiter
    assert(pathHierarchy("/a/b/c", skip = 1).map(t => (t.term, t.startOffset)).toList ==
      List(("/b", 2), ("/b/c", 2)))
    assert(pathHierarchy("a/b/c", skip = 2).map(_.term).toList == List("/c"))
    assert(pathHierarchy("a/b", skip = 2).isEmpty)
    // delimiter replacement rewrite
    assert(pathHierarchy("/a/b", replacement = '\\').map(_.term).toList ==
      List("\\a", "\\a\\b"))
  }

  test("ReversePathHierarchyTokenizer suffixes") {
    assert(reversePathHierarchy("/a/b/c").map(t => (t.term, t.startOffset, t.endOffset)).toList ==
      List(("/a/b/c", 0, 6), ("a/b/c", 1, 6), ("b/c", 3, 6), ("c", 5, 6)))
    // skip drops trailing components; the delimiter stays on the kept side
    assert(reversePathHierarchy("/a/b/c", skip = 1).map(_.term).toList ==
      List("/a/b/", "a/b/", "b/"))
    assert(reversePathHierarchy("c", skip = 2).isEmpty)
  }

  test("PatternTokenizer split and group modes") {
    assert(patternTokenize("alpha, beta,gamma", ",\\s*").map(_.term).toList ==
      List("alpha", "beta", "gamma"))
    assert(patternTokenize("a1b22c333", "(\\d+)", group = 1).map(_.term).toList ==
      List("1", "22", "333"))
    // split mode drops empty segments
    assert(patternTokenize(",a,,b,", ",").map(_.term).toList == List("a", "b"))
  }

  test("PatternReplaceFilter and PatternCaptureGroup") {
    val in = List(Token("foo-bar", 0, 0, 7, TokenType.ALPHANUM))
    assert(patternReplace(in.iterator, "-", "_").next().term == "foo_bar")
    val caps = captureGroups(in.iterator, "([a-z]+)-([a-z]+)").map(_.term).toList
    assert(caps == List("foo-bar", "foo", "bar"))
    val capsNoOrig = captureGroups(in.iterator, "([a-z]+)-([a-z]+)",
      preserveOriginal = false).map(_.term).toList
    assert(capsNoOrig == List("foo", "bar"))
    // captures stack at the source position
    assert(captureGroups(in.iterator, "([a-z]+)-([a-z]+)").map(_.position).toList ==
      List(0, 0, 0))
  }

  test("Scandinavian normalization and folding") {
    assert(scandinavianNormalize("blaabaersyltetoej") == "blåbærsyltetøj")
    assert(scandinavianNormalize("räksmörgås") == "ræksmørgås")
    assert(scandinavianFold("räksmörgås") == "raksmorgas")
    assert(scandinavianFold("blåbærsyltetøj") == "blabarsyltetoj")
    assert(scandinavianFold("blaabaersyltetoej") == "blabarsyltetoj")
  }

  test("HyphenatedWordsFilter joins parts, closes gaps, restores dangling hyphen") {
    val out = HyphenatedAnalyzer.tokenize("ecologi- cal disaster over-").toList
    assert(out.map(t => (t.term, t.position)) ==
      List(("ecological", 0), ("disaster", 1), ("over-", 2)))
    // joined token spans first part start to last part end
    assert(out.head.startOffset == 0 && out.head.endOffset == 12)
  }

  test("KeywordRepeat + stem + RemoveDuplicates") {
    val out = KeywordRepeatAnalyzer.tokenize("running data").toList
    // original + stem at the same position; identical stem collapses
    assert(out.map(t => (t.term, t.position)) ==
      List(("running", 0), ("run", 0), ("data", 1)))
  }

  test("StemmerOverrideFilter bypasses the stemmer on dictionary hits") {
    assert(StemmerOverrideAnalyzer.tokenize("running walking").map(_.term).toList ==
      List("sprint", "walk"))
  }

  test("guardedStem protects keyword-marked terms") {
    val in = SimpleAnalyzer.tokenize("running walking")
    assert(guardedStem(in, TokenFilters.PorterStemmer.stem,
      protect = Set("running")).map(_.term).toList == List("running", "walk"))
  }

  test("keep/codepoint/truncate/limit filters") {
    def mk(ws: String*) = ws.zipWithIndex.map { case (w, i) =>
      Token(w, i, 0, w.length, TokenType.ALPHANUM)
    }.iterator
    assert(keepWords(mk("a", "b", "c"), Set("b")).map(_.term).toList == List("b"))
    assert(codepointCount(mk("a", "ab", "abc"), 2, 2).map(_.term).toList == List("ab"))
    assert(truncate(mk("abcdef", "ab"), 3).map(_.term).toList == List("abc", "ab"))
    assert(limitTokenCount(mk("a", "b", "c"), 2).map(_.term).toList == List("a", "b"))
    assert(limitTokenPosition(mk("a", "b", "c"), 2).map(_.term).toList == List("a", "b"))
  }

  test("RemoveDuplicates drops same term at same position only") {
    val in = List(
      Token("a", 0, 0, 1, TokenType.ALPHANUM), Token("a", 0, 0, 1, TokenType.ALPHANUM),
      Token("b", 0, 0, 1, TokenType.ALPHANUM), Token("a", 1, 2, 3, TokenType.ALPHANUM))
    assert(removeDuplicates(in.iterator).map(t => (t.term, t.position)).toList ==
      List(("a", 0), ("b", 0), ("a", 1)))
  }

  test("PositionFilter stacks everything at the first position") {
    val in = SimpleAnalyzer.tokenize("one two three")
    assert(positionFilter(in).map(_.position).toList == List(0, 0, 0))
    val in2 = SimpleAnalyzer.tokenize("one two three")
    assert(positionFilter(in2, increment = 1).map(_.position).toList == List(0, 1, 2))
  }

  test("TeeSink routes copies into typed/range/date sinks") {
    val in = WhitespaceAnalyzer.tokenize("alpha 2024-01-15 beta 3/4/2024")
    val (main, sinks) = teeSink(in, Seq(dateRecognizerSink, tokenRangeSink(1, 3)))
    assert(main.size == 4)
    assert(sinks(0).map(_.term) == Seq("2024-01-15", "3/4/2024"))
    assert(sinks(1).map(_.term) == Seq("2024-01-15", "beta"))
  }

  test("charfilter chains registered by name") {
    for (n <- Seq("html_strip", "mapping_fixture", "patrep_fixture", "path_hier",
                  "path_hier_rev", "pattern_csv", "scandinavian_fold",
                  "scandinavian_norm", "hyphenated", "keyword_repeat", "stemmer_override"))
      assert(Analyzers.byName(n).tokenize("abc/def, ghi").nonEmpty)
  }
}
