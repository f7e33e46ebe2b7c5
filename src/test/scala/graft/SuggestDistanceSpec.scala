package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.search.{StringDistances, Suggest}

/** AnalyzingSuggester + alternative spell-checker distances
  * (Suggest/Analyzing/AnalyzingSuggester.cs, Spell/JaroWinklerDistance.cs,
  * Spell/NGramDistance.cs).
  */
class SuggestDistanceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("JaroWinkler matches classic published values") {
    assert(math.abs(StringDistances.jaroWinkler("martha", "marhta") - 0.9611111) < 1e-6)
    assert(math.abs(StringDistances.jaroWinkler("dixon", "dicksonx") - 0.8133333) < 1e-6)
    assert(StringDistances.jaroWinkler("abc", "abc") == 1.0)
    assert(StringDistances.jaroWinkler("abc", "xyz") == 0.0)
    // below the 0.7 threshold the raw Jaro value is returned (no bonus)
    val j = StringDistances.jaroWinkler("abcdxx", "abyyyy")
    assert(j < 0.7 && j > 0)
  }

  test("nGram distance properties (Kondrak, null-prefix discount)") {
    assert(StringDistances.nGram("abcd", "abcd") == 1.0)
    assert(StringDistances.nGram("", "") == 1.0)
    assert(StringDistances.nGram("a", "") == 0.0)
    assert(StringDistances.nGram("a", "ab") == 0.5) // short-string positional path
    assert(StringDistances.nGram("abcd", "wxyz") == 0.0)
    val close = StringDistances.nGram("algorithm", "algorithms")
    val far = StringDistances.nGram("algorithm", "logarithm")
    assert(close > far && far > 0)
  }

  test("suggestScored ranks by (score desc, df desc, term asc)") {
    import spark.implicits._
    val dict = Seq(("modal", 5L), ("model", 50L), ("mode", 20L), ("yodel", 9L))
      .toDF("term", "df")
    val got = StringDistances.suggestScored(dict, "madel", 2, 3, "jarowinkler")
      .select("term", "rank").collect().map(r => (r.getString(0), r.getInt(1))).toList
    // model/modal: two substitution-distance candidates; exact scores pin order
    assert(got.map(_._1).contains("model"))
    assert(got.map(_._2) == (1 to got.size).toList)
  }

  test("native SpellDistance expression is bit-identical to the direct functions") {
    import spark.implicits._
    val terms = Seq("martha", "marhta", "dixon", "model", "modal", "a", "", "algorithms")
    val df = terms.toDF("term")
    for ((kind, f) <- Seq[(String, (String, String) => Double)](
        "jarowinkler" -> ((a, b) => StringDistances.jaroWinkler(a, b)),
        "ngram" -> ((a, b) => StringDistances.nGram(a, b)),
        "lucenelevenshtein" -> ((a, b) => StringDistances.luceneLevenshtein(a, b)))) {
      val got = df.select(col("term"),
          graft.functions.ScalarExpressions.spellDistance(kind, "madel", col("term")).as("d"))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      for (t <- terms)
        assert(got(t) == f("madel", t), s"$kind($t)")
    }
  }

  test("SpellDistance stays inside whole-stage codegen") {
    // a range source (not a LocalRelation, which the optimizer would
    // constant-fold away) so the executed plan carries a codegen stage
    val df = spark.range(4).selectExpr("concat('mode', cast(id as string)) AS term")
      .select(graft.functions.ScalarExpressions.spellDistance("ngram", "madel", col("term")).as("d"))
    // the "*(n)" prefix marks operators fused into a WholeStageCodegen stage
    val fused = df.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(fused.nonEmpty && df.queryExecution.executedPlan.toString.startsWith("*(1) Project"),
      df.queryExecution.executedPlan.toString)
    // and the codegen'd values equal the direct function
    val got = df.collect().map(_.getDouble(0)).toSeq
    val want = (0 until 4).map(i => StringDistances.nGram("madel", s"mode$i"))
    assert(got == want)
  }

  test("completeAnalyzed matches on the analyzed form, returns the surface") {
    import spark.implicits._
    val sugg = Seq(
      ("Running Systems", 10L), ("Runner Up", 30L), ("Walking Paths", 99L),
      ("Ran Away", 7L)).toDF("surface", "weight")
    val got = Suggest.completeAnalyzed(sugg, "surface", "weight",
        "english_snowball", "Runs", 5)
      .select("surface", "rank").collect().map(r => (r.getString(0), r.getInt(1))).toList
    // "Runs" -> analyzed key "run"; matches are BYTE-prefix on the analyzed
    // form (the FST key): "run system" and "runner up" both match, ranked
    // by weight desc; "walking paths" / "ran away" don't. A raw surface
    // prefix ("Runs") would have matched nothing.
    assert(got == List(("Runner Up", 1), ("Running Systems", 2)))
  }
}
