package graft.build

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthetic Common-Crawl-shaped corpus (FIXTURES.md §1):
  * table pages(url, warc_ts, html, text, lang) with the per-row invariant
  * "same url => byte-identical text", independent of partitioning — each
  * row's text is a pure function of its url (seeded by murmur3(url)).
  */
object PagesGen {
  private val VocabSize = 5000
  private val Sites = 50

  /** Deterministic pseudo-word for vocab index j (letters only). */
  def word(j: Int): String = {
    val sb = new StringBuilder
    var v = j + 7
    while (v > 0) { sb.append(('a' + v % 26).toChar); v /= 26 }
    "w" + sb.toString
  }

  /** Memoized vocabulary (word() per token was a generation hotspot). */
  private lazy val words: Array[String] = Array.tabulate(VocabSize)(word)

  private val specials = Array(
    "O'Reilly's guide", "visit wiki.apache.org now", "U.S.A. rocks",
    "AT&T and Excite@Home", "version 1.2.3 beta", "mail bob_1@mail-host.org",
    "x-15b flies high", "semi-final match 3,14")

  def urlOf(i: Long): String = s"https://site-${i % Sites}.example/p/$i"

  /** Text for row i — pure function of the url (FIXTURES.md invariant). */
  def textOf(i: Long): String = {
    val url = urlOf(i)
    val rnd = new scala.util.Random(42 ^ scala.util.hashing.MurmurHash3.stringHash(url))
    val len = math.min(2000, math.max(20, math.exp(3.6 + 1.0 * rnd.nextGaussian()).toInt))
    val sb = new StringBuilder
    var k = 0
    while (k < len) {
      // log-uniform vocab sampling (zipf-ish head)
      val idx = math.min(VocabSize - 1, math.exp(rnd.nextDouble() * math.log(VocabSize)).toInt)
      sb.append(words(idx))
      sb.append(if (rnd.nextInt(12) == 0) ". " else " ")
      k += 1
    }
    if (i % 7 == 0) sb.append(specials((i % specials.length).toInt)).append(' ')
    if (rnd.nextInt(3) == 0) sb.append("the quick brown fox ")
    sb.toString
  }

  /** Distributed generation for bench-scale corpora. */
  def df(spark: SparkSession, n: Long, partitions: Int = 0): DataFrame = {
    import spark.implicits._
    val parts = if (partitions > 0) partitions else spark.sparkContext.defaultParallelism
    spark.range(0, n, 1, parts)
      .map { i => (i, urlOf(i), textOf(i)) }
      .toDF("i", "url", "text")
      .withColumn("warc_ts", timestamp_seconds(lit(1388534400L) + col("i")))
      .withColumn("html", concat(lit("<html><body>"), col("text"), lit("</body></html>")).cast("binary"))
      .withColumn("lang", lit("en"))
      .select("url", "warc_ts", "html", "text", "lang")
  }

  /** Local generation for unit tests / the oracle. */
  def local(n: Int): Seq[(String, String)] =
    (0 until n).map(i => (urlOf(i.toLong), textOf(i.toLong)))
}
