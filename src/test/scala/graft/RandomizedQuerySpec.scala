package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.analysis.StandardAnalyzer
import graft.build.{IndexBuilder, PagesGen}
import graft.oracle.OracleIndex
import graft.search._
import java.nio.file.Files
import scala.util.Random

/** Randomized corpora + random query trees vs the oracle — the in-repo
  * analog of RandomIndexWriter-based fuzzing (SURVEY.md §5, FIXTURES.md §4
  * property suites). Seeded, fully deterministic.
  */
class RandomizedQuerySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val N = 300
  private lazy val pages = PagesGen.local(N)
  private lazy val oracle = new OracleIndex(pages, 2, StandardAnalyzer)
  private lazy val searcher: Searcher = {
    val base = Files.createTempDirectory("graftrand").toString
    val df = spark.createDataFrame(pages).toDF("url", "text")
    IndexBuilder.build(spark, df, base, IndexBuilder.BuildConfig(2, "standard", groupSize = 2))
    new Searcher(spark, base)
  }

  private def randTerm(rnd: Random): String = PagesGen.word(rnd.nextInt(600))

  /** Random query tree of bounded depth; weighted towards realistic shapes. */
  private def randQuery(rnd: Random, depth: Int): Query = {
    if (depth == 0 || rnd.nextInt(3) == 0) {
      rnd.nextInt(10) match {
        case 0 | 1 | 2 => TermQ(randTerm(rnd))
        case 3 => PhraseQ(List("quick" -> 0, "brown" -> 1))
        case 4 => PrefixQ(randTerm(rnd).take(2 + rnd.nextInt(2)))
        case 5 => TermQ(randTerm(rnd), boost = 1f + rnd.nextInt(3))
        case 6 =>
          val near = SpanNearS(List(SpanTermS("quick"), SpanTermS("fox")),
            rnd.nextInt(4), inOrder = rnd.nextBoolean())
          rnd.nextInt(5) match {
            case 0 => SpanScoreQ(near)
            // payload-less index: PayloadFunction.DocScore defaults to 1.0,
            // so PayloadNearQ must equal the plain SpanScoreQ (and the
            // oracle's explicit degeneration)
            case 4 => PayloadNearQ(near, if (rnd.nextBoolean()) "avg" else "max")
            // default-field mask is an identity on a one-field index —
            // engine (real mask machinery) must equal the oracle
            // (transparent-mask wrapper)
            case 1 => SpanScoreQ(SpanNearS(List(
              SpanFieldMaskS(SpanTermS("quick"), "text"), SpanTermS("fox")),
              rnd.nextInt(4), inOrder = rnd.nextBoolean()))
            // payload checks on a payload-less index: the plain check
            // accepts every span, the near check none
            case 2 => SpanMatchQ(SpanPayloadCheckS(SpanTermS("quick"),
              List(Array[Byte](1, 2, 3, 4))))
            case 3 => SpanMatchQ(SpanNearPayloadCheckS(near, List(Array[Byte](9))))
          }
        case 7 => FuzzyQ(randTerm(rnd), 1)
        case 8 => FuzzyTopQ(randTerm(rnd), 1, 10)
        case 9 => FieldQ("text", TermQ(randTerm(rnd))) // default-field binding identity
      }
    } else {
      val n = 2 + rnd.nextInt(3)
      val clauses = List.fill(n) {
        val occ = rnd.nextInt(10) match {
          case 0 | 1 => Occur.Must
          case 2 => Occur.MustNot
          case _ => Occur.Should
        }
        occ -> randQuery(rnd, depth - 1)
      }
      val shoulds = clauses.count(_._1 == Occur.Should)
      val msm = if (shoulds > 1 && rnd.nextInt(4) == 0) 1 + rnd.nextInt(shoulds) else 0
      BoolQ(clauses, msm)
    }
  }

  test("80 random query trees rank+score identical to the oracle") {
    val rnd = new Random(20260816)
    var nonEmpty = 0
    (0 until 80).foreach { i =>
      val q = randQuery(rnd, 2)
      val k = 5 + rnd.nextInt(15)
      val expected = oracle.search(q, k).map(h => (h.key, h.score)).toList
      val got = searcher.search(q, k).collect()
        .map(r => (r.getString(0), r.getDouble(1).toFloat)).toList
      assert(got == expected, s"query #$i mismatch: $q\ngot=$got\nexpected=$expected")
      if (expected.nonEmpty) nonEmpty += 1
    }
    assert(nonEmpty > 30, s"too few non-empty results ($nonEmpty) — generator too weak")
  }

  test("random counts match the oracle") {
    val rnd = new Random(777)
    (0 until 15).foreach { _ =>
      val q = randQuery(rnd, 1)
      assert(searcher.count(q) == oracle.count(q), s"count mismatch for $q")
    }
  }
}
