package graft.drive
import graft.analysis._
import graft.codec._
import graft.oracle._
import graft.search._
object Drive {
  def main(args: Array[String]): Unit = {
    val text = "The U.S.A.-based AT&T unit visits wiki.apache.org — O'Reilly's 3,14 guide to 日本語"
    println("TOKENS: " + StandardAnalyzer.tokenize(text).map(t => s"${t.term}@${t.position}").mkString(" "))
    val pages = Seq(
      "url://a" -> "the quick brown fox jumps over the lazy dog",
      "url://b" -> "quick quick quick fox",
      "url://c" -> "brown dogs and brown cats sleep",
      "url://d" -> "nothing relevant here at all",
      "url://e" -> "fox news covers the quick election")
    val idx = new OracleIndex(pages, 2, StandardAnalyzer)
    val hits = idx.search(BoolQ(List(Occur.Should -> TermQ("quick"), Occur.Should -> TermQ("brown"))), 3)
    println("TOP3: " + hits.map(h => f"${h.key}:${h.score}%.4f").mkString(" "))
    println("PHRASE: " + idx.search(PhraseQ(List("quick" -> 0, "brown" -> 1)), 5).map(_.key).mkString(","))
    println("NOTFOX: " + idx.search(BoolQ(List(Occur.Must -> TermQ("brown"), Occur.MustNot -> TermQ("fox"))), 5).map(_.key).mkString(","))
    val enc = new PostingsCodec.Encoder
    (0 until 300).foreach(i => enc.add(i * 7, 1 + i % 4, Array.tabulate(1 + i % 4)(_ * 2), i % 100 + 10))
    val e = enc.finish()
    val dec = PostingsCodec.decode(e.df, e.docDeltas, e.tfs, e.positions, e.lens)
    println(s"CODEC: df=${e.df} skips=${e.skips.length} lastDoc=${dec.docIds.last} docBytes=${e.docDeltas.length}")
    println("EMPTY: [" + StandardAnalyzer.tokenize("").mkString(",") + "]")
    println("STOPONLY: [" + StandardAnalyzer.tokenize("the and of to").mkString(",") + "]")
    println("LONG: [" + StandardAnalyzer.tokenize("x " + "b"*257 + " y").map(t => s"${t.term}@${t.position}").mkString(",") + "]")
    println("ABSENT: " + idx.search(TermQ("zzznope"), 5).size)
    println("STOPQUERY: " + idx.search(TermQ("the"), 5).size)
    // WordNet expansion drives the oracle engine end-to-end
    val wn = WordNet.parsePrologLines(Iterator(
      "s(1,1,'quick',a,1,0).", "s(1,2,'fast',a,1,0)."))
    val wq = WordNet.expand("quick", wn, StandardAnalyzer, 0.5f)
    println("WORDNET: " + idx.search(wq, 3).map(_.key).mkString(","))
    driveSparkMerge()
    driveSpatialValueSources()
    driveSpanExtras()
    println("EMPTYDOC_NORM: " + idx.docs.map(d => d.fieldLen).mkString(","))
  }

  /** Spatial + ValueSource/Filters package-boundary drive. */
  def driveSpatialValueSources(): Unit = {
    val spark = graft.SparkTestSession.spark
    import spark.implicits._
    val pts = Seq((1L, 48.86, 2.35), (2L, 51.5, -0.13), (3L, -33.9, 151.2))
      .toDF("id", "lat", "lon")
    val near = graft.pipeline.Spatial.applyToPoints(pts, "lat", "lon",
      graft.pipeline.Spatial.parseArgs("Intersects(Circle(2.0 48.0 d=5))"))
      .select("id").collect().map(_.getLong(0)).toList
    println(s"SPATIAL: paris_circle=$near")
    val base = java.nio.file.Files.createTempDirectory("drivevs").toString
    val df = spark.createDataFrame(graft.build.PagesGen.local(80)).toDF("url", "text")
    graft.build.IndexBuilder.build(spark, df, base,
      graft.build.IndexBuilder.BuildConfig(2, "standard", groupSize = 4))
    val se = new Searcher(spark, base)
    import graft.search.ValueSources._
    val fq = graft.search.ValueSources.functionQuery(se,
      ReciprocalVS(ColVS("fieldLen"), 1.0, 100.0, 10.0))
    println("FUNCQ: " + fq.orderBy(org.apache.spark.sql.functions.col("score").desc,
      org.apache.spark.sql.functions.col("url")).limit(2)
      .collect().map(r => f"${r.getString(0)}:${r.getDouble(1)}%.3f").mkString(" "))
    val filt = Filters.boolean(se, Seq(
      Occur.Should -> Filters.terms(se, Seq("quick", "fox")),
      Occur.MustNot -> Filters.query(se, TermQ("lazy"))))
    println("FILTERS: n=" + filt.count())
  }

  /** Field-masked spans, payload checks, PayloadNear and PayloadSpanUtil
    * at the package boundary. */
  def driveSpanExtras(): Unit = {
    val spark = graft.SparkTestSession.spark
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("drivespan").toString
    val df = (0 until 60).map { id =>
      (f"doc$id%04d", s"alpha|${id % 5} beta|${id % 3}")
    }.toDF("url", "text")
    graft.build.IndexBuilder.build(spark, df, base,
      graft.build.IndexBuilder.BuildConfig(2, "delimited_payload", groupSize = 4))
    val se = new Searcher(spark, base)
    import graft.analysis.DelimitedPayloadAnalyzer.encodeInt
    val check = se.count(SpanMatchQ(SpanPayloadCheckS(SpanTermS("alpha"), List(encodeInt(2)))))
    val near = SpanNearS(List(SpanTermS("alpha"), SpanTermS("beta")), 0, inOrder = true)
    val pn = se.search(PayloadNearQ(near, "max"), 3).collect()
      .map(r => f"${r.getString(0)}:${r.getDouble(1)}%.2f").mkString(" ")
    val utilRows = PayloadSpanUtil.payloadsForQuery(se, TermQ("beta")).count()
    println(s"SPANPAY: check=$check near_top=[$pn] util_rows=$utilRows")
  }

  /** End-to-end Spark drive: build multi-segment index from generated pages,
    * tier-merge it, CheckIndex, query before/after. */
  def driveSparkMerge(): Unit = {
    val spark = graft.SparkTestSession.spark
    val base = java.nio.file.Files.createTempDirectory("drivemerge").toString
    val df = spark.createDataFrame(graft.build.PagesGen.local(200)).toDF("url", "text")
    val rep = graft.build.IndexBuilder.build(spark, df, base,
      graft.build.IndexBuilder.BuildConfig(6, "standard", groupSize = 6))
    println(s"BUILD: docs=${rep.numDocs} segs=${rep.numSegments} rate=${rep.docsPerSec.toInt}/s")
    val s1 = new Searcher(spark, base)
    val q = BoolQ(List(Occur.Should -> TermQ(graft.build.PagesGen.word(2)),
      Occur.Should -> TermQ(graft.build.PagesGen.word(9))))
    val pre = s1.search(q, 5).collect().map(r => (r.getString(0), r.getDouble(1))).toList
    val merges = graft.merge.MergeJob.mergeToPolicy(spark, base,
      new graft.merge.TieredMergePolicy(segsPerTier = 2.0, maxMergeAtOnce = 3, floorSegmentDocs = 5))
    val check = graft.build.CheckIndex.run(spark, base)
    val post = new Searcher(spark, base).search(q, 5).collect()
      .map(r => (r.getString(0), r.getDouble(1))).toList
    println(s"MERGE: rounds=$merges check_ok=${check.ok} segs=${check.segments} invariant=${pre == post}")
    println(s"TOPHIT: ${post.headOption}")
  }
}
