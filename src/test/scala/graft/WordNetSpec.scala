package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.search._
import graft.analysis.Analyzers

/** contrib/WordNet: wn_s.pl parse fidelity (Syns2Index.cs), SynLookup
  * synonym sets, SynExpand boosted expansion with global dedup. */
class WordNetSpec extends AnyFunSuite {

  private val db = WordNet.parsePrologLines(Iterator(
    "s(100,1,'quick',a,1,0).",
    "s(100,2,'fast',a,1,0).",
    // the reference parse truncates at the FIRST quote (Syns2Index.cs:147),
    // so an escaped-quote word stores its head segment: 'o''brien' -> "o"
    "s(100,3,'o''brien',a,1,0).",
    "s(100,4,'speedy_gonzales',a,1,0).", // underscore -> dropped
    "s(101,1,'quick',a,2,0).",
    "s(101,2,'prompt',a,1,0).",
    "s(102,1,'fast',a,2,0).",
    "s(102,2,'firm',a,1,0).",
    "s(103,1,'UPPER',n,1,0)." // lowercased on parse
  ))

  test("parse keeps only decent lowercased words, both maps populated") {
    assert(db.word2Nums.keySet ==
      Set("quick", "fast", "o", "prompt", "firm", "upper"))
    assert(db.word2Nums("quick") == List("100", "101"))
    assert(db.num2Words("100") == List("quick", "fast", "o"))
  }

  test("non-s( line is rejected like the reference") {
    intercept[IllegalArgumentException] {
      WordNet.parsePrologLines(Iterator("x(1,2,'a',n,1,0)."))
    }
  }

  test("synonyms union across synsets, first-seen order, self excluded") {
    assert(db.synonyms("quick") == List("fast", "o", "prompt"))
    assert(db.synonyms("fast") == List("quick", "o", "firm"))
    assert(db.synonyms("nosuch") == Nil)
  }

  test("expand: query terms unboosted first, synonyms boosted, global dedup") {
    val q = WordNet.expand("quick fast", db, Analyzers.byName("simple"), 0.9f)
    val BoolQ(clauses, _) = q: @unchecked
    assert(clauses.forall(_._1 == Occur.Should))
    val qs = clauses.map(_._2)
    // 'fast' is a query term AND a synonym of quick: emitted once, unboosted;
    // 'quick' likewise never re-added as fast's synonym
    assert(qs == List(TermQ("quick"), TermQ("fast"),
      TermQ("o", 0.9f), TermQ("prompt", 0.9f), TermQ("firm", 0.9f)))
  }

  test("boost 0 adds synonyms unboosted (SynExpand.cs boost<=0 branch)") {
    val q = WordNet.expand("quick", db, Analyzers.byName("simple"), 0f)
    val BoolQ(clauses, _) = q: @unchecked
    assert(clauses.map(_._2) ==
      List(TermQ("quick"), TermQ("fast"), TermQ("o"), TermQ("prompt")))
  }
}
