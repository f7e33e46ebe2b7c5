package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.analysis._
import graft.analysis.Hunspell

/** Pins for the Hunspell affix-dictionary stemmer (Hunspell.scala) against
  * the Stemmer.cs recursion semantics, on the embedded fixture dictionary:
  * walk/ABC, try/B, drink; PFX A=re-, SFX B=ed|y->ied, SFX C=ing/D, SFX D=s. */
class HunspellSpec extends AnyFunSuite {
  private val d = HunspellFixtureAnalyzer.dict

  test("dictionary word is its own stem") {
    assert(Hunspell.stem(d, "walk") == List("walk"))
    assert(Hunspell.stem(d, "drink") == List("drink"))
  }

  test("unknown word has no stems") {
    assert(Hunspell.stem(d, "zebra") == Nil)
  }

  test("simple suffix strip with flag check") {
    assert(Hunspell.stem(d, "walked") == List("walk"))
    // drink has no B flag: 'drinked' must NOT stem
    assert(Hunspell.stem(d, "drinked") == Nil)
  }

  test("strip+append rule with condition class: y -> ied") {
    assert(Hunspell.stem(d, "tried") == List("try"))
    // the [^y] branch must not fire for 'tryed' (condition fails on 'try')
    assert(Hunspell.stem(d, "walkied") == Nil)
  }

  test("prefix strip") {
    assert(Hunspell.stem(d, "rewalk") == List("walk"))
    // drink has no A flag
    assert(Hunspell.stem(d, "redrink") == Nil)
  }

  test("cross-product: prefix + suffix together") {
    assert(Hunspell.stem(d, "rewalked") == List("walk"))
    // a suffix WITH a continuation class only chains after a prefix when
    // that class contains the prefix flag (Stemmer.cs hasCrossCheckedFlag:
    // matchEmpty covers empty classes only) — ing/D does not name A
    assert(Hunspell.stem(d, "rewalking") == Nil)
    // try has B but not A: 'retried' must NOT stem
    assert(Hunspell.stem(d, "retried") == Nil)
  }

  test("two-stage suffix through the continuation class: ing/D + s") {
    assert(Hunspell.stem(d, "walkings") == List("walk"))
    // walk does NOT carry D directly: a bare plural cannot strip
    assert(Hunspell.stem(d, "walks") == Nil)
    // ...and 'ed' has no continuation licensing D
    assert(Hunspell.stem(d, "walkeds") == Nil)
  }

  test("stemFilter: unknown words pass through; stems replace known forms") {
    val toks = HunspellFixtureAnalyzer.tokenize("rewalked zebra tried").toList
    assert(toks.map(_.term) == List("walk", "zebra", "try"))
    assert(toks.map(_.position) == List(0, 1, 2))
  }

  test("stemFilter all-stems mode emits every stem at one position") {
    // add an ambiguous entry: 'walking' also a dictionary noun
    val d2 = Hunspell.parse(
      aff = "SFX C Y 1\nSFX C 0 ing .\n",
      dic = "2\nwalk/C\nwalking\n")
    val in = Iterator(Token("walking", 0, 0, 7, 0))
    val out = Hunspell.stemFilter(in, d2).toList
    assert(out.map(_.term).toSet == Set("walking", "walk"))
    assert(out.map(_.position).distinct == List(0))
  }

  test("longestOnly keeps the single longest stem") {
    val d2 = Hunspell.parse(
      aff = "SFX C Y 1\nSFX C 0 ing .\n",
      dic = "2\nwalk/C\nwalking\n")
    val in = Iterator(Token("walking", 0, 0, 7, 0))
    val out = Hunspell.stemFilter(in, d2, longestOnly = true).toList
    assert(out.map(_.term) == List("walking"))
  }

  test("comments and blank lines are tolerated; count line optional") {
    val d2 = Hunspell.parse(
      aff = "# comment\n\nSFX B Y 1  # trailing\nSFX B 0 ed .\n",
      dic = "walk/B  # entry comment\n")
    assert(Hunspell.stem(d2, "walked") == List("walk"))
  }

  // ---- ICONV/OCONV + CIRCUMFIX (HunspellIconvAnalyzer fixture dictionary)

  private val di = HunspellIconvAnalyzer.dict

  test("ICONV cleans input AND dictionary entries (ß -> ss, longest match)") {
    // dic spells fußball with ß; both spellings stem to the converted form
    assert(Hunspell.stem(di, "fußball") == List("fussball"))
    assert(Hunspell.stem(di, "fussball") == List("fussball"))
    assert(Hunspell.stem(di, "fußballen") == List("fussball"))
  }

  test("ICONV longest-match-at-position prefers the longer from-pattern") {
    val d2 = Hunspell.parse(
      aff = "ICONV 2\nICONV a x\nICONV ab yy\n",
      dic = "1\nyyc\n")
    // 'abc': 'ab' (len 2) beats 'a' (len 1) at position 0
    assert(Hunspell.stem(d2, "abc") == List("yyc"))
  }

  test("OCONV rewrites emitted stems") {
    val d2 = Hunspell.parse(
      aff = "OCONV 1\nOCONV ss ß\nSFX B Y 1\nSFX B 0 ed .\n",
      dic = "1\npass/B\n")
    assert(Hunspell.stem(d2, "passed") == List("paß"))
  }

  test("CIRCUMFIX: the pair strips; either half alone is rejected") {
    assert(Hunspell.stem(di, "gelauft") == List("lauf")) // ge- + -t together
    assert(Hunspell.stem(di, "gelauf") == Nil) // circumfix prefix alone
    assert(Hunspell.stem(di, "lauft") == Nil) // circumfix suffix alone
  }

  test("non-circumfix affixes still work in a CIRCUMFIX dictionary") {
    assert(Hunspell.stem(di, "wetter") == List("wetter"))
    assert(Hunspell.stem(di, "fußballen") == List("fussball")) // plain SFX E
  }
}
