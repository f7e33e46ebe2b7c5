package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.build.{IndexBuilder, PagesGen}
import graft.search._
import java.nio.file.Files

/** FuzzyLikeThisQuery (contrib/Queries/FuzzyLikeThisQuery.cs): fuzzified
  * sample text — variant enumeration, difference^2 * idf scoring with the
  * source-df (or integer-average) rule, global top-N, per-source grouping.
  */
class FuzzyLikeThisSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private lazy val se = {
    val base = Files.createTempDirectory("graftflt").toString
    val df = spark.createDataFrame(PagesGen.local(300)).toDF("url", "text")
    IndexBuilder.build(spark, df, base, IndexBuilder.BuildConfig(2, "simple", groupSize = 2))
    new Searcher(spark, base)
  }

  test("misspelling selects the real dictionary term with a positive score") {
    val rows = se.fuzzyLikeThisTerms(Seq(se.defaultField -> "quikc"), maxNumTerms = 10)
    assert(rows.nonEmpty)
    assert(rows.exists(_._3 == "quick"), s"expected 'quick' among ${rows.map(_._3)}")
    assert(rows.forall(_._4 > 0))
    // the exact-distance ranking: ed=1 variants beat ed=2 at equal idf class
    val simOf = rows.map(r => r._3 -> r._4).toMap
    assert(simOf.keySet.contains("quick"))
  }

  test("variants of one source group into a nested SHOULD; search matches") {
    val q = se.fuzzyLikeThisQuery(Seq(se.defaultField -> "quikc"), maxNumTerms = 5)
    val hits = se.search(q, 20).collect()
    assert(hits.nonEmpty, "fuzzified query should match docs containing 'quick'")
    // every boost in the rewritten tree is the selection's score
    def boosts(q: Query): Seq[Float] = q match {
      case TermQ(_, b) => Seq(b)
      case BoolQ(cs, _) => cs.flatMap(c => boosts(c._2))
      case _ => Nil
    }
    assert(boosts(q).forall(_ > 0f))
  }

  test("exact source term uses its own df for idf; absent uses the integer average") {
    // 'quick' exists: its variants' idf uses df('quick'); scores consistent
    // with a direct recomputation over the dictionary
    import org.apache.spark.sql.functions._
    val dict = se.dictionary(se.defaultField)
      .select("term", "df").as[(String, Long)](
        org.apache.spark.sql.Encoders.product[(String, Long)]).collect().toMap
    val rows = se.fuzzyLikeThisTerms(Seq(se.defaultField -> "quick"), maxNumTerms = 50)
    val dfQuick = dict("quick")
    val idf = math.log(se.maxDoc / (dfQuick + 1).toDouble) + 1.0
    rows.foreach { case (_, src, term, score) =>
      assert(src == "quick")
      val qLen = 5
      val ed = graft.oracle.OracleIndex.levenshtein(term, "quick")
      val sim = 1.0 - ed.toDouble / math.min(term.length, qLen)
      assert(math.abs(score - sim * sim * idf) < 1e-12,
        s"score mismatch for $term: $score vs ${sim * sim * idf}")
    }
  }
}
