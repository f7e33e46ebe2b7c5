package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.analysis._

/** Pins for the Knuth-Liang hyphenator + HyphenationCompoundWordTokenFilter
  * (HyphenationCompound.scala) against HyphenationTree.hyphenate /
  * Decompose semantics. */
class HyphenationSpec extends AnyFunSuite {
  private val hyph = HyphCompoundFixtureAnalyzer.Hyphenator

  test("pattern values break at odd inter-letter values") {
    // s1b fires between s|b, l1s between l|s
    assert(hyph.hyphenationPoints("fussballspiel").map(_.toList)
      .contains(List(0, 4, 8, 13)))
  }

  test("no matching pattern -> None (reference returns null)") {
    assert(new LiangHyphenator(Seq("x1y")).hyphenationPoints("hello").isEmpty)
  }

  test("remain/push char counts bound the break positions") {
    val h = new LiangHyphenator(Seq("a1b"))
    assert(h.hyphenationPoints("xabx").map(_.toList).contains(List(0, 2, 4)))
    // the same break 2 chars in is forbidden with remainCharCount=3
    assert(h.hyphenationPoints("xabx", remainCharCount = 3).isEmpty)
    // ...and a break 2 chars from the end with pushCharCount=3
    assert(h.hyphenationPoints("xabx", pushCharCount = 3).isEmpty)
    // a 1-char word is too short to hyphenate at the defaults
    assert(h.hyphenationPoints("a").isEmpty)
  }

  test("even values suppress hyphens (inhibiting patterns win by max)") {
    // l1s allows the break; l2sp (higher, even) must inhibit it
    val h = new LiangHyphenator(Seq("l1s", "l2sp"))
    assert(h.hyphenationPoints("ballspiel").isEmpty)
    // ...but it still breaks where no 'p' follows
    assert(h.hyphenationPoints("ballsaal").isDefined)
  }

  test("word-boundary dots participate in patterns") {
    // .un1 only fires at the word start
    val h = new LiangHyphenator(Seq(".un1"))
    assert(h.hyphenationPoints("untied").map(_.toList).contains(List(0, 2, 6)))
    assert(h.hyphenationPoints("shunt").isEmpty)
  }

  test("compound filter emits dictionary parts at the original position") {
    val out = HyphCompoundFixtureAnalyzer.tokenize("fussballspiel heute").toList
    assert(out.map(_.term) == List("fussballspiel", "fuss", "ball", "spiel", "heute"))
    // parts share the compound's position and offsets (4.4 semantics)
    assert(out.take(4).map(_.position).distinct == List(0))
    assert(out.take(4).map(t => (t.startOffset, t.endOffset)).distinct.size == 1)
    assert(out.last.position == 1)
  }

  test("parts absent from the dictionary are not emitted") {
    // regenwetter: n1w splits regen|wetter, both in dict
    val out = HyphCompoundFixtureAnalyzer.tokenize("regenwetter").toList
    assert(out.map(_.term) == List("regenwetter", "regen", "wetter"))
    // seen|wetter splits but 'seen' is not in the dictionary
    val out2 = HyphCompoundFixtureAnalyzer.tokenize("seenwetter").toList
    assert(out2.map(_.term) == List("seenwetter", "wetter"))
  }

  test("null dictionary emits every hyphen-delimited slice") {
    val out = HyphenationCompound.filter(
      Iterator(Token("fussballspiel", 0, 0, 13, 0)),
      HyphCompoundFixtureAnalyzer.Hyphenator, dict = null).toList
    assert(out.map(_.term).toSet ==
      Set("fussballspiel", "fuss", "fussball", "ball", "ballspiel", "spiel"))
  }

  test("onlyLongestMatch keeps one part per start point") {
    val out = HyphenationCompound.filter(
      Iterator(Token("fussballspiel", 0, 0, 13, 0)),
      HyphCompoundFixtureAnalyzer.Hyphenator, dict = null,
      maxSubwordSize = 8, onlyLongestMatch = true).toList
    assert(out.map(_.term) ==
      List("fussballspiel", "fussball", "ball", "spiel"))
  }

  test("short tokens and sub-minimum parts stay intact") {
    val out = HyphenationCompound.filter(
      Iterator(Token("ball", 0, 0, 4, 0)),
      HyphCompoundFixtureAnalyzer.Hyphenator, HyphCompoundFixtureAnalyzer.Dict).toList
    assert(out.map(_.term) == List("ball")) // < minWordSize
  }

  test("XML pattern reader collects pattern elements") {
    val h = LiangHyphenator.fromXml("<x><pattern> a1b </pattern><pattern>c2d</pattern></x>")
    assert(h.hyphenationPoints("xaby").map(_.toList).contains(List(0, 2, 4)))
  }
}
