package graft.drive

import org.apache.spark.sql.SparkSession
import graft.analysis.StandardAnalyzer
import graft.build.{IndexBuilder, PagesGen}
import graft.oracle.OracleIndex
import graft.search._
import scala.util.Random

/** Oracle-grounded fuzz at 50k docs: random trees over ALL operator families
  * (bool/minsm/phrase/sloppy/multiphrase/span/dismax/prefix/constant) checked
  * rank+score-identical against the single-JVM oracle.
  */
object SoakOracle {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(50000)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val pages = PagesGen.local(n)
    val t0 = System.nanoTime()
    val oracle = new OracleIndex(pages, 8, StandardAnalyzer)
    println(f"SOAK3 oracle built in ${(System.nanoTime() - t0) / 1e9}%.1f s")
    val base = java.nio.file.Files.createTempDirectory("graftsoak3").toString
    IndexBuilder.build(spark, spark.createDataFrame(pages).toDF("url", "text"), base,
      IndexBuilder.BuildConfig(8, "standard", groupSize = 8))
    val s = new Searcher(spark, base)

    val rnd = new Random(4242)
    def t(): String = PagesGen.word(rnd.nextInt(1500))
    def leaf(): Query = rnd.nextInt(10) match {
      case 0 | 1 => TermQ(t())
      case 2 => PhraseQ(List("quick" -> 0, "brown" -> 1))
      case 3 => PhraseQ(List("quick" -> 0, "fox" -> 1), slop = 1 + rnd.nextInt(3))
      case 4 => MultiPhraseQ(List((Set("quick", "lazy"), 0), (Set("brown", "fox"), 1)))
      case 5 => SpanMatchQ(SpanNearS(List(SpanTermS("quick"), SpanTermS("fox")),
        rnd.nextInt(4), inOrder = rnd.nextBoolean()))
      case 6 => PrefixQ(t().take(3))
      case 7 => DisMaxQ(List(TermQ(t()), TermQ(t())), 0.5f)
      case 8 => SpanScoreQ(SpanNearS(List(SpanTermS("quick"), SpanTermS("fox")),
        rnd.nextInt(4), inOrder = rnd.nextBoolean()))
      case 9 => FuzzyQ(t(), 1)
    }
    def tree(depth: Int): Query =
      if (depth == 0 || rnd.nextInt(3) == 0) leaf()
      else {
        val cs = List.fill(2 + rnd.nextInt(3)) {
          (rnd.nextInt(8) match {
            case 0 | 1 => Occur.Must
            case 2 => Occur.MustNot
            case _ => Occur.Should
          }) -> tree(depth - 1)
        }
        val sh = cs.count(_._1 == Occur.Should)
        BoolQ(cs, if (sh > 1 && rnd.nextInt(4) == 0) 1 + rnd.nextInt(sh) else 0)
      }

    val tfidf = new Searcher(spark, base, similarity = TfIdfSim)
    var pass = 0
    (0 until 40).foreach { i =>
      val q = tree(2)
      val k = 5 + rnd.nextInt(25)
      val expected = oracle.search(q, k).map(h => (h.key, h.score)).toList
      val got = s.search(q, k).collect().map(r => (r.getString(0), r.getDouble(1).toFloat)).toList
      require(got == expected, s"SOAK3 #$i mismatch for $q\ngot=${got.take(4)}\nexp=${expected.take(4)}")
      // same tree under TFIDF/DefaultSimilarity (coord + queryNorm)
      val expectedT = oracle.searchTfIdf(q, k).map(h => (h.key, h.score)).toList
      val gotT = tfidf.search(q, k).collect().map(r => (r.getString(0), r.getDouble(1).toFloat)).toList
      require(gotT == expectedT, s"SOAK3 #$i TFIDF mismatch for $q\ngot=${gotT.take(4)}\nexp=${expectedT.take(4)}")
      pass += 1
      if (i % 10 == 9) println(s"SOAK3 $pass/40 identical so far (BM25 + TFIDF)")
    }
    println(s"SOAK3 done: $pass/40 rank+score identical at $n docs under both similarities")
    spark.stop()
  }
}
