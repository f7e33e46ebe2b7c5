package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.build.{DictTable, IndexBuilder}
import graft.search._
import java.nio.file.Files

/** Storage-level pruning of fuzzy dictionary scans (VERDICT r3 #3): the dict
  * table materializes `len` and is range-sorted by (field, len, term), so the
  * fuzzy length band |len - len(q)| <= maxEdits becomes a plain column range
  * that Parquet row-group min/max stats prune — the scan reads a bounded
  * slice of the dictionary instead of every row (the storage analog of the
  * reference's Levenshtein-automaton term walk,
  * /root/reference/src/Lucene.Net.Core/Util/Automaton/LevenshteinAutomata.cs).
  */
class FuzzyPruneSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  /** Synthetic index whose dictionary holds many distinct terms with a wide
    * length spread (lengths 4..23), written with small Parquet row groups so
    * row-group pruning is observable at test scale. */
  private lazy val (base, nTerms) = {
    import spark.implicits._
    val hc = spark.sparkContext.hadoopConfiguration
    val prevBlock = hc.get("parquet.block.size")
    val prevPage = hc.get("parquet.page.size")
    hc.setInt("parquet.block.size", 32 * 1024)
    hc.setInt("parquet.page.size", 8 * 1024)
    try {
      val b = Files.createTempDirectory("graftfuzzyprune").toString
      // 4000 docs x 10 unique terms; term length varies with the term index
      val pages = (0 until 4000).map { i =>
        val terms = (0 until 10).map { j =>
          val k = i * 10 + j
          val stem = s"t${k}x" * 3 // >= 9 chars
          stem.take(4 + k % 20)    // lengths 4..23
        }
        (f"u$i%05d", terms.mkString(" "))
      }
      IndexBuilder.build(spark, pages.toDF("url", "text"), b,
        IndexBuilder.BuildConfig(2, "simple", groupSize = 2))
      val n = spark.read.parquet(DictTable.dictPath(b)).count()
      (b, n)
    } finally {
      if (prevBlock == null) hc.unset("parquet.block.size") else hc.set("parquet.block.size", prevBlock)
      if (prevPage == null) hc.unset("parquet.page.size") else hc.set("parquet.page.size", prevPage)
    }
  }

  test("dict table carries len and is freshness-valid") {
    val dict = spark.read.parquet(DictTable.dictPath(base))
    assert(dict.columns.contains("len"))
    assert(DictTable.isValid(spark, base))
    assert(nTerms > 10000, s"expected a large dictionary, got $nTerms")
  }

  test("fuzzy scan reads a bounded row-group subset (len band pushed to Parquet)") {
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false") // plain plan for metric walk
    try {
      val se = new Searcher(spark, base)
      val probe = "t1222x" // an actual dict term (k=1222: 4 + k%20 = 6 chars); band [5, 7]
      // useGrams=false pins THIS spec to the length-band path (the gram
      // index path has its own pruning assertions in GramIndexSpec)
      val df = se.fuzzyDictScan(se.defaultField, probe, 1, useGrams = false)
      df.collect()
      val scans = df.queryExecution.executedPlan.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => s
      }
      assert(scans.nonEmpty, "expected a FileSourceScan over the dict table")
      val pushed = scans.head.metadata.getOrElse("PushedFilters", "")
      assert(pushed.contains("len"), s"len band not pushed to the scan: $pushed")
      val scanned = scans.head.metrics("numOutputRows").value
      // band [5,7] covers 3 of 20 length values ~ 15% of terms; row-group
      // pruning must keep the scan well under half the dictionary
      assert(scanned < nTerms / 2,
        s"scan read $scanned of $nTerms dict rows — row groups not pruned")
      assert(scanned > 0)
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }

  test("pruned fuzzy results equal the unpruned dictionary filter") {
    val se = new Searcher(spark, base)
    val probe = "t1222x"
    val got = se.fuzzyDictScan(se.defaultField, probe, 1, useGrams = false)
      .withColumn("ed", levenshtein(col("term"), lit(probe)))
      .filter(col("ed") <= 1)
      .select("term").collect().map(_.getString(0)).toSet
    val want = se.dictionary(se.defaultField)
      .withColumn("ed", levenshtein(col("term"), lit(probe)))
      .filter(col("ed") <= 1)
      .select("term").collect().map(_.getString(0)).toSet
    assert(got == want, "pruned scan changed fuzzy candidate results")
    assert(want.nonEmpty)
  }

  test("FuzzyQ search matches a brute-force scan on the pruned dictionary") {
    val se = new Searcher(spark, base)
    val q = FuzzyQ("t1222x", 1)
    val urls = se.search(q, 50).collect().map(_.getString(0)).toSet
    assert(urls.nonEmpty)
    // doc u00122 contains term "t1222x" (k = 1222): must match exactly
    assert(urls.contains("u00122"))
  }
}
