package graft.drive

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.build.{CheckIndex, Deletes, IndexBuilder, PagesGen}
import graft.merge.{MergeJob, TieredMergePolicy}
import graft.search._
import graft.streaming.StreamingIndexer

/** Full-lifecycle integration soak (manual drive): batch build -> streaming
  * appends -> delete-by-query -> tiered merges (purging, id bands) -> NRT
  * refresh -> queries under both similarities + Explain. Exercises every
  * cross-feature seam in one index: stats generations, dict freshness
  * fallback, live-docs on all paths, piece rows, multi-field.
  */
object SoakLifecycle {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(200000)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val base = java.nio.file.Files.createTempDirectory("graftlife").toString

    // 1. batch build, multi-field (url-derived site keyword field)
    val pages = PagesGen.df(spark, n, partitions = 32).select("url", "text")
      .withColumn("site", concat(lit("site"), pmod(crc32(col("url")), lit(11))))
    IndexBuilder.build(spark, pages, base,
      IndexBuilder.BuildConfig(8, "standard", groupSize = 8,
        extraFields = Seq("site" -> "keyword")))
    val mgr = new graft.streaming.SearcherManager(spark, base)
    val s0 = mgr.acquire()
    val total0 = s0.count(MatchAllQ)
    require(total0 == n, s"build count $total0 != $n")

    // 2. streaming appends (two micro-batches, multi-field from config)
    def batch(tag: String, m: Int) = spark.createDataFrame(
        PagesGen.local(m).map { case (u, t) => (s"$tag/$u", t) }).toDF("url", "text")
      .withColumn("site", lit("sitestreamed"))
    StreamingIndexer.appendBatch(spark, batch("s0", 500), base, "standard", 2, 0)
    StreamingIndexer.appendBatch(spark, batch("s1", 500), base, "standard", 2, 1)
    val s1 = mgr.acquire()
    require(s1 ne s0, "SearcherManager must refresh after appends")
    require(s1.count(MatchAllQ) == n + 1000, "appended docs missing")
    val streamed = s1.search(FieldQ("site", TermQ("sitestreamed")), 2000).collect()
    require(streamed.length == 1000, s"field query over appends: ${streamed.length}")

    // 3. delete by query (a rare term), NumDocs semantics
    val rare = TermQ(PagesGen.word(2000))
    val rareCount = s1.count(rare)
    require(rareCount > 0, "fixture needs rare-term matches")
    Deletes.deleteByQuery(s1, base, rare)
    val s2 = mgr.acquire()
    require(s2.count(rare) == 0, "deleted docs still match")
    require(s2.count(MatchAllQ) == n + 1000 - rareCount, "NumDocs after delete")
    require(s2.maxDoc == n + 1000, "maxDoc must stay un-decremented pre-merge")

    // 4. tiered merges (purge deletes, fresh-band ids)
    val merges = MergeJob.mergeToPolicy(spark, base,
      new TieredMergePolicy(segsPerTier = 2.0, maxMergeAtOnce = 6, floorSegmentDocs = 100))
    require(merges >= 1, "expected merge rounds")
    val s3 = mgr.acquire()
    require(s3.count(rare) == 0, "purged docs resurrected")
    require(s3.count(MatchAllQ) == n + 1000 - rareCount, "count after merge")
    val report = CheckIndex.run(spark, base)
    require(report.ok, report.violations.mkString("; "))

    // 5. queries under both similarities + Explain≡Score on a live hit
    val q = BoolQ(List(Occur.Must -> TermQ(PagesGen.word(3)),
      Occur.Should -> TermQ(PagesGen.word(60))))
    val bm = s3.search(q, 10).collect()
    require(bm.nonEmpty, "post-lifecycle query empty")
    val tf = new Searcher(spark, base, similarity = TfIdfSim)
    require(tf.search(q, 10).collect().nonEmpty, "tfidf query empty")
    val h = s3.compile(q).collect().head
    val e = s3.explain(q, h.segmentId, h.docId)
    require(e.matched && e.value == h.score, s"explain != score post-lifecycle\n$e")

    // 6. serving-path soak on the merged, delete-carrying index: the fox
    //    sentence co-occurs as one exact phrase in ~n/3 docs and its words
    //    appear nowhere else (vocab words are w-prefixed), so term / AND /
    //    phrase / ordered-span counts must all be EQUAL — one chain checks
    //    leapfrog conjunction, doc-first phrase intersection, and span
    //    matching against each other at scale.
    val (qk, br, fx) = (TermQ("quick"), TermQ("brown"), TermQ("fox"))
    val nQuick = s3.count(qk)
    require(nQuick > n / 4, s"fox-sentence fixture too small: $nQuick")
    val nAnd = s3.count(BoolQ(List(Occur.Must -> qk, Occur.Must -> br, Occur.Must -> fx)))
    val nPhrase = s3.count(PhraseQ(List("quick" -> 0, "brown" -> 1, "fox" -> 2)))
    val nSpan = s3.count(SpanMatchQ(SpanNearS(
      List(SpanTermS("quick"), SpanTermS("fox")), slop = 1, inOrder = true)))
    require(nAnd == nQuick && nPhrase == nQuick && nSpan == nQuick,
      s"serving-path counts diverge: quick=$nQuick and=$nAnd phrase=$nPhrase span=$nSpan")

    // minShouldMatch(2 of 2 shoulds) == conjunction; dismax == disjunction
    val mid = TermQ(PagesGen.word(200))
    val nMinSm = s3.count(BoolQ(List(Occur.Should -> qk, Occur.Should -> mid), minShouldMatch = 2))
    val nAnd2 = s3.count(BoolQ(List(Occur.Must -> qk, Occur.Must -> mid)))
    require(nMinSm == nAnd2, s"minSM(2)=$nMinSm != AND=$nAnd2")
    val nDismax = s3.count(DisMaxQ(List(qk, mid)))
    val nOr = s3.count(BoolQ(List(Occur.Should -> qk, Occur.Should -> mid)))
    require(nDismax == nOr, s"dismax=$nDismax != OR=$nOr")

    // WAND top-k must equal the exhaustive plan top-k (same docs, same order)
    val orQ = BoolQ(List(Occur.Should -> mid, Occur.Should -> TermQ(PagesGen.word(500))))
    val planTop = s3.search(orQ, 10).collect().map(_.getString(0)).toSeq
    val wandTop = s3.searchWand(orQ, 10).collect().map(_.getString(0)).toSeq
    require(planTop == wandTop, s"WAND != plan top-k:\n$planTop\n$wandTop")

    // scored fuzzy rewrite stays bounded and matches at least the exact term
    val nFuzzy = s3.count(FuzzyQ("quik", 1))
    require(nFuzzy >= nQuick, s"fuzzy(quik,1)=$nFuzzy < quick=$nQuick")

    // LM-Dirichlet reader over the same index: non-empty + Explain≡Score
    val lm = new Searcher(spark, base, similarity = LmDirichletSim())
    val lmHit = lm.compile(orQ).collect().maxBy(_.score)
    val lmE = lm.explain(orQ, lmHit.segmentId, lmHit.docId)
    require(lmE.matched && lmE.value == lmHit.score, s"LM explain != score\n$lmE")

    println(s"LIFECYCLE ok: n=$n streamed=1000 deleted=$rareCount merges=$merges " +
      s"segs=${report.segments} docs=${report.docs} explain==score " +
      s"serving[quick=$nQuick and=$nAnd phrase=$nPhrase span=$nSpan wand==plan fuzzy=$nFuzzy lm==explain]")
    spark.stop()
  }
}
