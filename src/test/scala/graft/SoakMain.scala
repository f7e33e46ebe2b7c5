package graft.drive

import org.apache.spark.sql.SparkSession
import graft.build.{CheckIndex, IndexBuilder, PagesGen}
import graft.search._

/** Large-corpus metamorphic soak (manual drive, not part of the suite):
  * builds the same 1M-page corpus at two segmentations, asserts identical
  * (url, score) result sets for a query battery, and runs CheckIndex on both.
  */
object Soak {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(1000000L)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val base = java.nio.file.Files.createTempDirectory("graftsoak").toString
    val pages = PagesGen.df(spark, n, partitions = 64).select("url", "text")

    val t0 = System.nanoTime()
    IndexBuilder.build(spark, pages, s"$base/a", IndexBuilder.BuildConfig(16, "standard", groupSize = 16))
    IndexBuilder.build(spark, pages, s"$base/b", IndexBuilder.BuildConfig(64, "standard", groupSize = 64))
    println(f"SOAK built 2 indexes over $n docs in ${(System.nanoTime() - t0) / 1e9}%.1f s")

    val sa = new Searcher(spark, s"$base/a")
    val sb = new Searcher(spark, s"$base/b")
    require(sa.maxDoc == n && sb.maxDoc == n, s"maxDoc ${sa.maxDoc}/${sb.maxDoc}")
    require(sa.sumTotalTermFreq == sb.sumTotalTermFreq, "sumTtf differs between segmentations!")

    val queries: List[(String, Query)] = List(
      "or2" -> BoolQ(List(Occur.Should -> TermQ(PagesGen.word(3)), Occur.Should -> TermQ(PagesGen.word(77)))),
      "and2" -> BoolQ(List(Occur.Must -> TermQ(PagesGen.word(3)), Occur.Must -> TermQ(PagesGen.word(77)))),
      "rare" -> TermQ(PagesGen.word(4500)),
      "phrase" -> PhraseQ(List("quick" -> 0, "brown" -> 1, "fox" -> 2)),
      "sloppy" -> PhraseQ(List("quick" -> 0, "fox" -> 1), slop = 2),
      "minsm" -> BoolQ(List(Occur.Should -> TermQ(PagesGen.word(3)),
        Occur.Should -> TermQ(PagesGen.word(9)), Occur.Should -> TermQ(PagesGen.word(60))), 2),
      "span" -> SpanMatchQ(SpanNearS(List(SpanTermS("quick"), SpanTermS("fox")), 2, inOrder = true)))

    queries.foreach { case (name, q) =>
      def top(s: Searcher) = s.search(q, 50).collect()
        .map(r => (r.getString(0), r.getDouble(1))).sortBy(x => (-x._2, x._1)).toList
      val (ra, rb) = (top(sa), top(sb))
      // identical result sets incl. scores; tie order inside equal scores may
      // differ across segmentations, hence the canonical (score, url) sort —
      // but the k-boundary can cut tie groups differently, so compare the
      // prefix above the boundary score
      val boundary = math.min(ra.map(_._2).lastOption.getOrElse(0d), rb.map(_._2).lastOption.getOrElse(0d))
      val (pa, pb) = (ra.filter(_._2 > boundary), rb.filter(_._2 > boundary))
      require(pa == pb, s"SOAK $name mismatch above boundary:\n a=${pa.take(5)}\n b=${pb.take(5)}")
      println(s"SOAK $name ok (${ra.size} hits; ${pa.size} above tie boundary)")
    }

    val ca = CheckIndex.run(spark, s"$base/a")
    val cb = CheckIndex.run(spark, s"$base/b")
    require(ca.ok && cb.ok, (ca.violations ++ cb.violations).mkString("; "))
    println(s"SOAK CheckIndex ok: a=${ca.segments} segs/${ca.postingRows} rows, b=${cb.segments} segs/${cb.postingRows} rows")
    spark.stop()
  }
}
