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
    driveWebtextAnnServing()
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

  /** Closing-round surfaces: webtext curation, trained ANN (k-means + PQ),
    * warm serving — each printed as one proof line. */
  def driveWebtextAnnServing(): Unit = {
    val spark = graft.SparkTestSession.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    import graft.pipeline.{Ann, Dedup, TextStats}
    // webtext: line dedup + URL canon over tiny inline fixtures
    val docs = Seq((1L, "head\nbody one"), (2L, "head\nbody two")).toDF("doc_id", "text")
    val ld = Dedup.lineDedup(docs, "doc_id", "text").orderBy("id")
      .collect().map(r => s"${r.getLong(0)}:${r.getLong(1)}/${r.getLong(2)}").mkString(" ")
    val canon = TextStats.canonicalUrl(
        Seq((1L, "HTTP://Ex.COM:80/a/?utm_source=t&b=2&a=1#f")).toDF("doc_id", "url"),
        "doc_id", "url").collect().head.getString(1)
    println(s"WEBTEXT: lines=[$ld] canon=$canon")
    // trained ANN: k-means cells + PQ/ADC top-1 self-hit on a toy corpus
    val emb = (0L until 40L).map(id =>
      (id, Array.tabulate(8)(d => (((id * 31 + d * 17) % 100) / 50.0f) - 1.0f)))
      .toDF("vec_id", "embedding")
    val cents = Ann.kmeansCentroids(emb, "vec_id", "embedding", every = 8, iters = 2)
    val books = Ann.pqTrain(emb, "vec_id", "embedding", dim = 8, m = 2, every = 1, iters = 0)
    val qv = emb.filter(col("vec_id") === 5L).select("embedding")
      .collect()(0).getSeq[Float](0).toArray
    val pqTop = Ann.pqTopK(emb, "vec_id", "embedding", qv, 1, 8, books)
      .collect().head.getLong(0)
    println(s"ANN: cells=${cents.length} pq_self_top1=$pqTop (expect 5)")
    // warm serving: fuzzy + wildcard over the merge drive's index shape
    val base = java.nio.file.Files.createTempDirectory("drivewarm").toString
    val df = spark.createDataFrame(graft.build.PagesGen.local(120)).toDF("url", "text")
    graft.build.IndexBuilder.build(spark, df, base,
      graft.build.IndexBuilder.BuildConfig(2, "standard", groupSize = 4))
    val sess = new ServingSession(new Searcher(spark, base))
    val w = graft.build.PagesGen.word(3)
    val fuzzy = sess.fuzzyTopK("text", w.dropRight(1) + "q", 2, 50, 3)
    val wild = sess.wildcardTopK("text", "*" + w.drop(1), 3)
    println(s"WARM: fuzzy_hits=${fuzzy.length} wildcard_hits=${wild.length} (both > 0)")
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
