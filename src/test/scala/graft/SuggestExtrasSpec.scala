package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.search.{StringDistances, Suggest}

/** SuggestStopFilter analysis, BlendedInfix blenders, and the
  * LuceneLevenshteinDistance vectors. */
class SuggestExtrasSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("suggestStopAnalyze: trailing stopword kept only without a separator") {
    // mid-query stopword always drops
    assert(Suggest.suggestStopAnalyze("find the popsicle") === (List("find"), Some("popsicle")))
    // trailing stopword, no separator: kept as the prefix token
    assert(Suggest.suggestStopAnalyze("find the") === (List("find"), Some("the")))
    // trailing separator: the stopword was complete, drop it; no prefix token
    assert(Suggest.suggestStopAnalyze("find the ") === (List("find"), None))
    // a lone stopword mid-typing is still a prefix
    assert(Suggest.suggestStopAnalyze("the") === (List(), Some("the")))
  }

  test("completeSuggestStop: 'find the' completes through 'theory'") {
    import spark.implicits._
    val sugg = Seq(
      ("find theory now", 10L), ("find path now", 50L), ("lost theory", 99L))
      .toDF("surface", "weight")
    val out = Suggest.completeSuggestStop(sugg, "surface", "weight", "find the", 5)
      .collect().map(_.getString(0)).toList
    assert(out === List("find theory now")) // needs find exact AND the* prefix
    val out2 = Suggest.completeSuggestStop(sugg, "surface", "weight", "find the ", 5)
      .collect().map(_.getString(0)).toList
    assert(out2 === List("find path now", "find theory now")) // "the" dropped
  }

  test("blended infix: reciprocal and linear coefficients, truncated score") {
    import spark.implicits._
    val sugg = Seq(
      ("data first", 100L), // match at position 0
      ("big data second", 100L), // match at position 1
      ("one two data third", 100L)) // match at position 2
      .toDF("surface", "weight")
    val rec = Suggest.completeBlendedInfix(sugg, "surface", "weight", "data", 5,
        reciprocal = true)
      .collect().map(r => (r.getString(0), r.getLong(1))).toList
    assert(rec === List(
      ("data first", 100L), // 100 * 1/1
      ("big data second", 50L), // 100 * 1/2
      ("one two data third", 33L))) // 100 * 1/3 truncated
    val lin = Suggest.completeBlendedInfix(sugg, "surface", "weight", "data", 5)
      .collect().map(r => (r.getString(0), r.getLong(1))).toList
    assert(lin === List(
      ("data first", 100L), // 1 - 0.10*0
      ("big data second", 90L), // 1 - 0.10*1
      ("one two data third", 80L))) // 1 - 0.10*2
  }

  test("LuceneLevenshteinDistance: transposition is one edit; min-len norm") {
    import StringDistances.luceneLevenshtein
    assert(luceneLevenshtein("abc", "abc") === 1.0)
    // plain levenshtein would charge 2 for the swap; Damerau charges 1
    assert(luceneLevenshtein("abcd", "abdc") === 1.0 - 1.0 / 4)
    assert(luceneLevenshtein("lv1x", "lv1") === 1.0 - 1.0 / 3) // min(m,n) = 3
    // reference quirk preserved: empty vs non-empty returns the raw distance
    assert(luceneLevenshtein("", "abc") === 3.0)
    assert(luceneLevenshtein("", "") === 0.0)
  }
}
