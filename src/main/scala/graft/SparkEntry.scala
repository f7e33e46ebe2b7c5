package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.build.IndexBuilder
import graft.search._

/** Driver contract — one `queries` entry per implemented operator
  * (SURVEY.md §2), each with a DuckDB-runnable `oracleSql` twin over the same
  * parquet tables.
  *
  * SQL-parity rules (so the driver's hash compare is exact):
  *  - tokenization for oracle-checked search queries = SimpleAnalyzer =
  *    `regexp_extract_all(lower(text), '[a-z0-9]+')` on both sides;
  *  - outputs prefer integers/strings; BM25-ranked outputs expose doc_id +
  *    rank (ordering computed in double precision on both sides);
  *  - single-segment index for these queries so the engine's global doc order
  *    (tie-break) equals doc_id order — multi-segment invariance is covered
  *    by SparkEngineSpec instead.
  */
object SparkEntry {

  /** Flagship query on sf=0.001: BM25 top-10 disjunction over the documents
    * corpus through the full index+search path.
    */
  def entry(spark: SparkSession): DataFrame = {
    val s = IndexCache.searcher(spark, "/root/testdata/sf0.001")
    s.searchText("data model system", 10)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Queries.all

  def oracleSql: Map[String, String] = Queries.oracle
}

/** Builds (once per sfDir per JVM) a single-segment SimpleAnalyzer index over
  * `documents.parquet` with url = zero-padded doc_id, so docId order ==
  * doc_id order.
  */
object IndexCache {
  private val cache = scala.collection.concurrent.TrieMap.empty[String, Searcher]
  private val fcache = scala.collection.concurrent.TrieMap.empty[String, Searcher]

  /** Bump when the on-disk postings layout changes — stale caches from a
    * previous engine version must not be reused across driver runs. */
  val FormatVersion = 12 // v12: completed ar/el/th/bg/hi/fa/ckb stop lists + stop-proof fixture words

  def indexPath(sfDir: String): String = {
    val tag = sfDir.replaceAll("[^a-zA-Z0-9.]", "_")
    s"/tmp/graft_index/v$FormatVersion/$tag"
  }

  def pagesFromDocuments(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(format_string("doc%09d", col("doc_id")).as("url"), col("text"))

  def searcher(spark: SparkSession, sfDir: String): Searcher = cache.getOrElseUpdate(sfDir, {
    val path = indexPath(sfDir)
    val done = IndexBuilder.completedSegments(spark, path)
    if (done.isEmpty) {
      IndexBuilder.build(spark, pagesFromDocuments(spark, sfDir), path,
        IndexBuilder.BuildConfig(numSegments = 1, analyzerName = "simple",
          termVectors = true))
    }
    // ExactDouble scoring: the mode an ANSI-SQL oracle can replicate exactly
    new Searcher(spark, path, mode = ExactDouble)
  })

  /** TFIDF/DefaultSimilarity reader over the main gate index (the reference
    * engine default, Search/IndexSearcher.cs:89), ExactDouble for the oracle.
    */
  def tfidfSearcher(spark: SparkSession, sfDir: String): Searcher = tcache.getOrElseUpdate(sfDir, {
    searcher(spark, sfDir) // ensure the index is built
    new Searcher(spark, indexPath(sfDir), mode = ExactDouble, similarity = TfIdfSim)
  })
  private val tcache = scala.collection.concurrent.TrieMap.empty[String, Searcher]

  /** Re-sharded copy of the main gate index (MergeJob.splitIndex, 1 -> 3
    * segments — the IndexSplitter analog): query results must be identical
    * to the source index, so its gate shares q_term_topk's oracle. */
  def splitSearcher(spark: SparkSession, sfDir: String): Searcher = splitCache.getOrElseUpdate(sfDir, {
    searcher(spark, sfDir) // ensure the source index is built
    val dst = indexPath(sfDir) + "_split3"
    if (IndexBuilder.completedSegments(spark, dst).isEmpty)
      graft.merge.MergeJob.splitIndex(spark, indexPath(sfDir), dst, 3)
    new Searcher(spark, dst, mode = ExactDouble)
  })
  private val splitCache = scala.collection.concurrent.TrieMap.empty[String, Searcher]

  /** Even-doc_id half of a PK-partitioned copy of the main gate index
    * (MergeJob.partitionIndex — the PKIndexSplitter analog): membership is
    * the oracle-checkable contract (ids only; each half carries its own
    * collection stats, as in the reference). */
  def pkSearcher(spark: SparkSession, sfDir: String): Searcher = pkCache.getOrElseUpdate(sfDir, {
    searcher(spark, sfDir) // ensure the source index is built
    val a = indexPath(sfDir) + "_pk_even"
    val b = indexPath(sfDir) + "_pk_odd"
    if (IndexBuilder.completedSegments(spark, a).isEmpty)
      graft.merge.MergeJob.partitionIndex(spark, indexPath(sfDir), a, b,
        expr("cast(substring(url, 4) as bigint) % 2 = 0"))
    new Searcher(spark, a, mode = ExactDouble)
  })
  private val pkCache = scala.collection.concurrent.TrieMap.empty[String, Searcher]

  /** LM-Dirichlet (mu=2000) reader over the main gate index
    * (Search/Similarities/LMDirichletSimilarity.cs), ExactDouble for the
    * oracle. */
  def lmSearcher(spark: SparkSession, sfDir: String): Searcher = lcache.getOrElseUpdate(sfDir, {
    searcher(spark, sfDir) // ensure the index is built
    new Searcher(spark, indexPath(sfDir), mode = ExactDouble, similarity = LmDirichletSim())
  })
  private val lcache = scala.collection.concurrent.TrieMap.empty[String, Searcher]

  /** Index-SORTED gate fixture: 4 segments over documents with
    * indexSort=n_chars, so each segment's docId order is (n_chars, url)
    * order — the early-terminating sorted collector's precondition
    * (Lucene.Net.Misc/Index/Sorter/EarlyTerminatingSortingCollector.cs).
    * Multi-segment on purpose: the gate then proves per-segment heads merge
    * to the exact global top-k. */
  def sortedSearcher(spark: SparkSession, sfDir: String): Searcher = sortCache.getOrElseUpdate(sfDir, {
    val path = indexPath(sfDir) + "_sorted"
    val done = IndexBuilder.completedSegments(spark, path)
    if (done.isEmpty) {
      val pages = spark.read.parquet(s"$sfDir/documents.parquet")
        .select(format_string("doc%09d", col("doc_id")).as("url"),
          col("text"), col("n_chars"))
      IndexBuilder.build(spark, pages, path,
        IndexBuilder.BuildConfig(numSegments = 4, analyzerName = "simple",
          indexSort = Some("n_chars")))
    }
    new Searcher(spark, path, mode = ExactDouble)
  })
  private val sortCache = scala.collection.concurrent.TrieMap.empty[String, Searcher]

  /** Sorted-MERGE gate fixture: the 4-segment index-sorted index merged to
    * one segment through the DISTRIBUTED sorted-merge path (broadcast
    * budget forced to 0, so the permutation is a table, postings take the
    * salted (field, term, salt) shuffle, and pieces stay bounded —
    * merge/MergeJob.scala mergeSortedDistributed). A correct re-sorting
    * merge (SortingMergePolicy semantics) must leave every sorted-collector
    * result exactly as the unmerged index produced it.
    */
  def sortedMergedSearcher(spark: SparkSession, sfDir: String): Searcher =
    smCache.getOrElseUpdate(sfDir, {
      val path = indexPath(sfDir) + "_sortmerged"
      if (IndexBuilder.completedSegments(spark, path).isEmpty) {
        val pages = spark.read.parquet(s"$sfDir/documents.parquet")
          .select(format_string("doc%09d", col("doc_id")).as("url"),
            col("text"), col("n_chars"))
        IndexBuilder.build(spark, pages, path,
          IndexBuilder.BuildConfig(numSegments = 4, analyzerName = "simple",
            indexSort = Some("n_chars")))
      }
      if (IndexBuilder.statsGen(spark, path) == 0) { // merge not committed yet
        val segs = IndexBuilder.completedSegments(spark, path).toList.sorted
        graft.merge.MergeJob.merge(spark, path, segs, sortedPermBroadcastMax = 0)
      }
      new Searcher(spark, path, mode = ExactDouble)
    })
  private val smCache = scala.collection.concurrent.TrieMap.empty[String, Searcher]

  /** LM Jelinek-Mercer (lambda=0.5) reader over the main gate index. */
  def lmJmSearcher(spark: SparkSession, sfDir: String): Searcher = jcache.getOrElseUpdate(sfDir, {
    searcher(spark, sfDir) // ensure the index is built
    new Searcher(spark, indexPath(sfDir), mode = ExactDouble,
      similarity = LmJelinekMercerSim(0.5f))
  })
  private val jcache = scala.collection.concurrent.TrieMap.empty[String, Searcher]

  /** SweetSpotSimilarity reader (plateau lengthNorm 20..40, steep 0.5)
    * over the main gate index, ExactDouble for the oracle. */
  def sweetSearcher(spark: SparkSession, sfDir: String): Searcher = swCache.getOrElseUpdate(sfDir, {
    searcher(spark, sfDir)
    new Searcher(spark, indexPath(sfDir), mode = ExactDouble,
      similarity = SweetSpotSim(lnMin = 20, lnMax = 40, steep = 0.5f))
  })
  private val swCache = scala.collection.concurrent.TrieMap.empty[String, Searcher]

  /** DFR I(n)L2 (c=1) reader over the main gate index. */
  def dfrSearcher(spark: SparkSession, sfDir: String): Searcher = dfrCache.getOrElseUpdate(sfDir, {
    searcher(spark, sfDir)
    new Searcher(spark, indexPath(sfDir), mode = ExactDouble, similarity = DfrInL2Sim())
  })
  private val dfrCache = scala.collection.concurrent.TrieMap.empty[String, Searcher]

  /** IB LL-DF-H2 (c=1) reader over the main gate index. */
  def ibSearcher(spark: SparkSession, sfDir: String): Searcher = ibCache.getOrElseUpdate(sfDir, {
    searcher(spark, sfDir)
    new Searcher(spark, indexPath(sfDir), mode = ExactDouble, similarity = IbLlSim())
  })
  private val ibCache = scala.collection.concurrent.TrieMap.empty[String, Searcher]

  /** General-framework similarity readers over the main gate index (the full
    * DFR basicModel × afterEffect × normalization and IB distribution ×
    * lambda × normalization catalogs — DFRSimilarity.cs, IBSimilarity.cs).
    * Combos chosen to cover every SQL-gated component at least once:
    * G+B+H1, P+L+Z(0.3), Ine+none+H2, SPL+TTF+H3(800). */
  def simSearcher(spark: SparkSession, sfDir: String, kind: SimilarityKind): Searcher =
    simCache.getOrElseUpdate((sfDir, kind), {
      searcher(spark, sfDir)
      new Searcher(spark, indexPath(sfDir), mode = ExactDouble, similarity = kind)
    })
  private val simCache = scala.collection.concurrent.TrieMap.empty[(String, SimilarityKind), Searcher]

  /** Deterministic StandardAnalyzer gate fixture: per-doc synthetic text
    * exercising the classic JFlex grammar's signature rules — APOSTROPHE
    * (possessive strip), ACRONYM (dot removal), HOST, EMAIL, and stopword
    * position gaps — parameterized ONLY by doc_id so a DuckDB twin can
    * construct the exact expected token stream analytically.
    *
    * Standard-chain tokens (fieldLen = 10 for every doc):
    *   smith@1 ibm@2 server@3 host{id%7}.example.com@4 went@5
    *   school|market@7 admin@site{id%5}.org@9 about@10 data@12 engine@13
    * ('The'@0, 'to'@6, 'with'@8, 'the'@11 are stopwords — dropped with
    * their positions preserved as gaps.)
    */
  def stdFixturePages(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/documents.parquet").select(
      col("doc_id"),
      format_string("doc%09d", col("doc_id")).as("url"),
      concat(lit("The Smith's I.B.M. server host"),
        (col("doc_id") % 7).cast("string"),
        lit(".example.com went to "),
        when(col("doc_id") % 2 === 0, "school").otherwise("market"),
        lit(" with admin@site"), (col("doc_id") % 5).cast("string"),
        lit(".org about the data engine")).as("text"))

  /** Single-segment STANDARD-analyzer index over the fixture — the gate
    * coverage for the classic tokenizer grammar + StandardFilter + StopFilter
    * that the SimpleAnalyzer gate indexes never exercise (VERDICT r2 #2). */
  def stdSearcher(spark: SparkSession, sfDir: String): Searcher = scache.getOrElseUpdate(sfDir, {
    val path = indexPath(sfDir) + "_std"
    if (IndexBuilder.completedSegments(spark, path).isEmpty) {
      IndexBuilder.build(spark, stdFixturePages(spark, sfDir).drop("doc_id"), path,
        IndexBuilder.BuildConfig(numSegments = 1, analyzerName = "standard"))
    }
    new Searcher(spark, path, mode = ExactDouble)
  })
  private val scache = scala.collection.concurrent.TrieMap.empty[String, Searcher]

  /** Payload gate fixture: each doc holds "alpha|{id%7} beta|{id%13}
    * alpha|{(id+3)%7}" indexed through the DelimitedPayloadTokenFilter
    * analog (4-byte-int payloads in the postings payload stream), so a
    * DuckDB twin recomputes min/max/avg analytically from doc_id. */
  def payloadSearcher(spark: SparkSession, sfDir: String): Searcher = pcache.getOrElseUpdate(sfDir, {
    val path = indexPath(sfDir) + "_payload"
    if (IndexBuilder.completedSegments(spark, path).isEmpty) {
      val pages = spark.read.parquet(s"$sfDir/documents.parquet").select(
        format_string("doc%09d", col("doc_id")).as("url"),
        concat(lit("alpha|"), (col("doc_id") % 7).cast("string"),
          lit(" beta|"), (col("doc_id") % 13).cast("string"),
          lit(" alpha|"), ((col("doc_id") + 3) % 7).cast("string")).as("text"))
      IndexBuilder.build(spark, pages, path,
        IndexBuilder.BuildConfig(numSegments = 1, analyzerName = "delimited_payload"))
    }
    new Searcher(spark, path, mode = ExactDouble)
  })
  private val pcache = scala.collection.concurrent.TrieMap.empty[String, Searcher]

  /** Index with live deletes applied (urls of source='src1' docs), for the
    * delete-semantics entries: matches vanish, stats stay un-decremented
    * until merge (IndexWriter.DeleteDocuments / FixedBitSet live docs).
    */
  def deletedSearcher(spark: SparkSession, sfDir: String): Searcher = dcache.getOrElseUpdate(sfDir, {
    val path = indexPath(sfDir) + "_del"
    val done = IndexBuilder.completedSegments(spark, path)
    if (done.isEmpty) {
      IndexBuilder.build(spark, pagesFromDocuments(spark, sfDir), path,
        IndexBuilder.BuildConfig(numSegments = 1, analyzerName = "simple"))
    }
    if (!graft.build.Deletes.exists(spark, path)) {
      val urls = spark.read.parquet(s"$sfDir/documents.parquet")
        .filter(col("source") === "src1")
        .select(format_string("doc%09d", col("doc_id")).as("url"))
      graft.build.Deletes.deleteUrls(spark, path, urls)
    }
    new Searcher(spark, path, mode = ExactDouble)
  })
  private val dcache = scala.collection.concurrent.TrieMap.empty[String, Searcher]

  /** Multi-SEGMENT index (4 segments, url-hash routed, no deletes): gate
    * coverage for cross-segment search — per-segment walks + TopDocs-merge
    * tie-breaks (Search/TopDocs.cs:111-135) — which the single-segment gate
    * indexes never exercise. Ranked outputs order by (score, doc_id) via
    * the url key so the oracle is segment-layout independent. */
  def multisegSearcher(spark: SparkSession, sfDir: String): Searcher = m2cache.getOrElseUpdate(sfDir, {
    val path = indexPath(sfDir) + "_multi"
    if (IndexBuilder.completedSegments(spark, path).isEmpty) {
      IndexBuilder.build(spark, pagesFromDocuments(spark, sfDir), path,
        IndexBuilder.BuildConfig(numSegments = 4, analyzerName = "simple", groupSize = 4))
    }
    new Searcher(spark, path, mode = ExactDouble)
  })
  private val m2cache = scala.collection.concurrent.TrieMap.empty[String, Searcher]

  /** Merged index: 4 segments built, src1 docs deleted, then a REAL purging
    * MergeJob.merge of all four — the gate coverage for the merge path
    * (SegmentMerger/MergeDocIDRemapper semantics: compacted docIds,
    * decremented stats, pruned markers). The DuckDB twin recomputes over
    * `documents WHERE source <> 'src1'`, i.e. an index built without the
    * purged docs — which a correct merge must equal exactly. */
  def mergedSearcher(spark: SparkSession, sfDir: String): Searcher = mcache.getOrElseUpdate(sfDir, {
    val path = indexPath(sfDir) + "_merged"
    if (IndexBuilder.completedSegments(spark, path).isEmpty) {
      IndexBuilder.build(spark, pagesFromDocuments(spark, sfDir), path,
        IndexBuilder.BuildConfig(numSegments = 4, analyzerName = "simple", groupSize = 4))
    }
    if (IndexBuilder.statsGen(spark, path) == 0) { // merge not committed yet
      val urls = spark.read.parquet(s"$sfDir/documents.parquet")
        .filter(col("source") === "src1")
        .select(format_string("doc%09d", col("doc_id")).as("url"))
      graft.build.Deletes.deleteUrls(spark, path, urls)
      // through the SCHEDULER (mergeToPolicy), not a hand-picked merge —
      // the gate then covers TieredMergePolicy selection + merge rounds
      val merges = graft.merge.MergeJob.mergeToPolicy(spark, path,
        new graft.merge.TieredMergePolicy(segsPerTier = 2.0, maxMergeAtOnce = 4,
          floorSegmentDocs = 5))
      require(merges >= 1, "merged gate fixture expected at least one merge")
    }
    new Searcher(spark, path, mode = ExactDouble)
  })
  private val mcache = scala.collection.concurrent.TrieMap.empty[String, Searcher]

  /** (hits, k) -> (doc_id, rank) by (score desc, doc_id asc) — the
    * segment-layout-INDEPENDENT ranked shape for multi-segment/merged gate
    * indexes, where engine docId order no longer equals doc_id order. */
  def rankedByDocId(se: Searcher, q: graft.search.Query, k: Int): DataFrame = {
    val hits = se.compile(q)
      .join(se.docs.select("segmentId", "docId", "url"), Seq("segmentId", "docId"))
      .withColumn("doc_id", expr("cast(substring(url, 4) as bigint)"))
      .select("doc_id", "score")
    Ranks.rankTopK(hits, k, Seq(col("score").desc, col("doc_id").asc))
      .select("doc_id", "rank").orderBy("rank")
  }

  /** Multi-field index (text + keyword-indexed source/lang StringFields) for
    * the field-qualified query entries (Index/Term.cs (field, term) keys).
    */
  def fieldedSearcher(spark: SparkSession, sfDir: String): Searcher = fcache.getOrElseUpdate(sfDir, {
    val path = indexPath(sfDir) + "_fielded"
    val done = IndexBuilder.completedSegments(spark, path)
    if (done.isEmpty) {
      val pages = spark.read.parquet(s"$sfDir/documents.parquet")
        .select(format_string("doc%09d", col("doc_id")).as("url"),
          col("text"), col("source"), col("lang"))
      IndexBuilder.build(spark, pages, path,
        IndexBuilder.BuildConfig(numSegments = 1, analyzerName = "simple",
          extraFields = Seq("source" -> "keyword", "lang" -> "keyword")))
    }
    new Searcher(spark, path, mode = ExactDouble)
  })

  /** Two-parallel-analyzed-field fixture for FieldMaskingSpanQuery
    * (Search/Spans/FieldMaskingSpanQuery.cs — the denormalized
    * studentfirstname/studentsurname example): position-aligned token
    * streams in the default `text` field ("a{id%4} b{(id+2)%5}") and a
    * second analyzed field `surname` ("s{id%3} t{(id+1)%4}"), disjoint
    * alphabets per slot so the DuckDB twin is analytic over doc_id. */
  def maskSearcher(spark: SparkSession, sfDir: String): Searcher = kcache.getOrElseUpdate(sfDir, {
    val path = indexPath(sfDir) + "_mask"
    if (IndexBuilder.completedSegments(spark, path).isEmpty) {
      val pages = spark.read.parquet(s"$sfDir/documents.parquet").select(
        format_string("doc%09d", col("doc_id")).as("url"),
        concat(lit("a"), (col("doc_id") % 4).cast("string"),
          lit(" b"), ((col("doc_id") + 2) % 5).cast("string")).as("text"),
        concat(lit("s"), (col("doc_id") % 3).cast("string"),
          lit(" t"), ((col("doc_id") + 1) % 4).cast("string")).as("surname"))
      IndexBuilder.build(spark, pages, path,
        IndexBuilder.BuildConfig(numSegments = 1, analyzerName = "simple",
          extraFields = Seq("surname" -> "simple")))
    }
    new Searcher(spark, path, mode = ExactDouble)
  })
  private val kcache = scala.collection.concurrent.TrieMap.empty[String, Searcher]

  /** German-analyzer gate fixture: per-doc text whose GermanAnalyzer chain
    * (lowercase -> German stops -> German2 normalization -> Savoy light
    * stem) is analytically derivable from doc_id —
    *   "Die Häuser und Gärten zeigen {Felder|Wälder} Bildern"
    * => haus@1 gart@3 zeig@4 {feld|wald}@5 bild@6 (Die@0, und@2 stops). */
  def deSearcher(spark: SparkSession, sfDir: String): Searcher = deCache.getOrElseUpdate(sfDir, {
    val path = indexPath(sfDir) + "_de"
    if (IndexBuilder.completedSegments(spark, path).isEmpty) {
      val pages = spark.read.parquet(s"$sfDir/documents.parquet").select(
        format_string("doc%09d", col("doc_id")).as("url"),
        concat(lit("Die Häuser und Gärten zeigen "),
          when(col("doc_id") % 2 === 0, "Felder").otherwise("Wälder"),
          // "welche" stops only via the FULL Snowball german_stop.txt set
          // (absent from the 3.x contrib core) — q_lang_de_stop pins it
          lit(" Bildern welche")).as("text"))
      IndexBuilder.build(spark, pages, path,
        IndexBuilder.BuildConfig(numSegments = 1, analyzerName = "german"))
    }
    new Searcher(spark, path, mode = ExactDouble)
  })
  private val deCache = scala.collection.concurrent.TrieMap.empty[String, Searcher]

  /** French-analyzer gate fixture (elision + stops + minimal stem):
    *   "Les auteurs de l'histoire donnent des {chevaux|journaux}"
    * => auteu@1 histoir@3 donnent@4 {cheval|journal}@6. */
  def frSearcher(spark: SparkSession, sfDir: String): Searcher = frCache.getOrElseUpdate(sfDir, {
    val path = indexPath(sfDir) + "_fr"
    if (IndexBuilder.completedSegments(spark, path).isEmpty) {
      val pages = spark.read.parquet(s"$sfDir/documents.parquet").select(
        format_string("doc%09d", col("doc_id")).as("url"),
        concat(lit("Les auteurs de l'histoire donnent des "),
          when(col("doc_id") % 3 === 0, "chevaux").otherwise("journaux")).as("text"))
      IndexBuilder.build(spark, pages, path,
        IndexBuilder.BuildConfig(numSegments = 1, analyzerName = "french"))
    }
    new Searcher(spark, path, mode = ExactDouble)
  })
  private val frCache = scala.collection.concurrent.TrieMap.empty[String, Searcher]

  /** Spanish-analyzer gate fixture (stops + light stem, accent folding):
    *   "Las casas y jardines económicos muestran {campos|bosques}"
    * => cas@1 jardin@3 economic@4 muestran@5 {camp|bosque}@6 (las@0, y@2
    * stopped — the position gaps ride through). */
  def esSearcher(spark: SparkSession, sfDir: String): Searcher = esCache.getOrElseUpdate(sfDir, {
    val path = indexPath(sfDir) + "_es"
    if (IndexBuilder.completedSegments(spark, path).isEmpty) {
      val pages = spark.read.parquet(s"$sfDir/documents.parquet").select(
        format_string("doc%09d", col("doc_id")).as("url"),
        concat(lit("Las casas y jardines económicos muestran "),
          when(col("doc_id") % 2 === 0, "campos").otherwise("bosques")).as("text"))
      IndexBuilder.build(spark, pages, path,
        IndexBuilder.BuildConfig(numSegments = 1, analyzerName = "spanish"))
    }
    new Searcher(spark, path, mode = ExactDouble)
  })
  private val esCache = scala.collection.concurrent.TrieMap.empty[String, Searcher]

  /** Italian-analyzer gate fixture (elision + stops + light stem):
    *   "Le case e i giardini dell'arte mostrano {fioriture|boschetti}"
    * => case@1 giardin@4 arte@5 mostran@6 {fioritur|boschett}@7
    * (le@0, e@2, i@3 stopped; dell'arte elides to arte). */
  def itSearcher(spark: SparkSession, sfDir: String): Searcher = itCache.getOrElseUpdate(sfDir, {
    val path = indexPath(sfDir) + "_it"
    if (IndexBuilder.completedSegments(spark, path).isEmpty) {
      val pages = spark.read.parquet(s"$sfDir/documents.parquet").select(
        format_string("doc%09d", col("doc_id")).as("url"),
        concat(lit("Le case e i giardini dell'arte mostrano "),
          when(col("doc_id") % 2 === 0, "fioriture").otherwise("boschetti")).as("text"))
      IndexBuilder.build(spark, pages, path,
        IndexBuilder.BuildConfig(numSegments = 1, analyzerName = "italian"))
    }
    new Searcher(spark, path, mode = ExactDouble)
  })
  private val itCache = scala.collection.concurrent.TrieMap.empty[String, Searcher]

  /** Portuguese-analyzer gate fixture (stops + light stem, -ns -> -m):
    *   "As casas e os jardins mostram {flores|pedras}"
    * => casa@1 jardim@4 mostram@5 {flor|pedr}@6 (as@0, e@2, os@3 stopped). */
  def ptSearcher(spark: SparkSession, sfDir: String): Searcher = ptCache.getOrElseUpdate(sfDir, {
    val path = indexPath(sfDir) + "_pt"
    if (IndexBuilder.completedSegments(spark, path).isEmpty) {
      val pages = spark.read.parquet(s"$sfDir/documents.parquet").select(
        format_string("doc%09d", col("doc_id")).as("url"),
        concat(lit("As casas e os jardins mostram "),
          when(col("doc_id") % 2 === 0, "flores").otherwise("pedras")).as("text"))
      IndexBuilder.build(spark, pages, path,
        IndexBuilder.BuildConfig(numSegments = 1, analyzerName = "portuguese"))
    }
    new Searcher(spark, path, mode = ExactDouble)
  })
  private val ptCache = scala.collection.concurrent.TrieMap.empty[String, Searcher]

  private def langFixture(spark: SparkSession, sfDir: String, tag: String,
                          analyzerName: String, textCol: org.apache.spark.sql.Column): Searcher = {
    val path = indexPath(sfDir) + "_" + tag
    if (IndexBuilder.completedSegments(spark, path).isEmpty) {
      val pages = spark.read.parquet(s"$sfDir/documents.parquet").select(
        format_string("doc%09d", col("doc_id")).as("url"), textCol.as("text"))
      IndexBuilder.build(spark, pages, path,
        IndexBuilder.BuildConfig(numSegments = 1, analyzerName = analyzerName))
    }
    new Searcher(spark, path, mode = ExactDouble)
  }

  /** Snowball-English (Porter2) gate fixture:
    *   "The data of {running|walking} systems joined quickly"
    * => data@1 {run|walk}@3 system@4 join@5 quick@6 (The@0, of@2 stopped —
    * gaps preserved). */
  def en2Searcher(spark: SparkSession, sfDir: String): Searcher =
    langCache.getOrElseUpdate((sfDir, "en2"), langFixture(spark, sfDir, "en2", "english_snowball",
      concat(lit("The data of "),
        when(col("doc_id") % 2 === 0, "running").otherwise("walking"),
        lit(" systems joined quickly"))))

  /** Snowball-German gate fixture (full program, not the light default):
    * häuser->haus / bücher->buch; "und" stopped. */
  def deSbSearcher(spark: SparkSession, sfDir: String): Searcher =
    langCache.getOrElseUpdate((sfDir, "desb"), langFixture(spark, sfDir, "desb", "german_snowball",
      concat(when(col("doc_id") % 2 === 0, "häuser").otherwise("bücher"),
        lit(" und wasser"))))

  /** Snowball-German2 gate fixture: ae/oe/ue folding makes haeuser->haus
    * / buecher->buch, which plain German cannot reach. */
  def de2SbSearcher(spark: SparkSession, sfDir: String): Searcher =
    langCache.getOrElseUpdate((sfDir, "de2sb"), langFixture(spark, sfDir, "de2sb", "german2_snowball",
      concat(when(col("doc_id") % 2 === 0, "haeuser").otherwise("buecher"),
        lit(" und wasser"))))

  /** Snowball-Spanish gate fixture (full program, not the light default):
    * canciones->cancion / corriendo->corr; "y" stopped. */
  def esSbSearcher(spark: SparkSession, sfDir: String): Searcher =
    langCache.getOrElseUpdate((sfDir, "essb"), langFixture(spark, sfDir, "essb", "spanish_snowball",
      concat(when(col("doc_id") % 2 === 0, "canciones").otherwise("corriendo"),
        lit(" y niños"))))

  /** Snowball-Italian gate fixture (full program, not the light default):
    * abbandonata->abbandon / caratteristiche->caratterist; "e" stopped. */
  def itSbSearcher(spark: SparkSession, sfDir: String): Searcher =
    langCache.getOrElseUpdate((sfDir, "itsb"), langFixture(spark, sfDir, "itsb", "italian_snowball",
      concat(when(col("doc_id") % 2 === 0, "abbandonata").otherwise("caratteristiche"),
        lit(" e libri"))))

  /** Snowball-Portuguese gate fixture (full program, not the light
    * default): primeira->primeir (the eira->eir rule) /
    * grandeza->grandez; "e" stopped. */
  def ptSbSearcher(spark: SparkSession, sfDir: String): Searcher =
    langCache.getOrElseUpdate((sfDir, "ptsb"), langFixture(spark, sfDir, "ptsb", "portuguese_snowball",
      concat(when(col("doc_id") % 2 === 0, "primeira").otherwise("grandeza"),
        lit(" e livros"))))

  /** Snowball-French gate fixture (full program, not the light default):
    * donnerait->don (verb erait + onn undouble) / heureuse->heureux;
    * "et" stopped. */
  def frSbSearcher(spark: SparkSession, sfDir: String): Searcher =
    langCache.getOrElseUpdate((sfDir, "frsb"), langFixture(spark, sfDir, "frsb", "french_snowball",
      concat(when(col("doc_id") % 2 === 0, "donnerait").otherwise("heureuse"),
        lit(" et maisons"))))

  /** Snowball-Porter (classic 1980 program) gate fixture:
    * hopping->hop (1b undouble) / troubling->troubl; "the" stopped. */
  def porterSbSearcher(spark: SparkSession, sfDir: String): Searcher =
    langCache.getOrElseUpdate((sfDir, "ptrsb"), langFixture(spark, sfDir, "ptrsb", "porter_snowball",
      concat(when(col("doc_id") % 2 === 0, "hopping").otherwise("troubling"),
        lit(" the systems"))))

  /** Snowball-Lovins gate fixture: believes->belief (ending retry + iev
    * recode) / nationally->nat; "the" stopped. */
  def lovinsSbSearcher(spark: SparkSession, sfDir: String): Searcher =
    langCache.getOrElseUpdate((sfDir, "lovsb"), langFixture(spark, sfDir, "lovsb", "lovins_snowball",
      concat(when(col("doc_id") % 2 === 0, "believes").otherwise("nationally"),
        lit(" the systems"))))

  /** Snowball-Kp (Kraaij-Pohlmann) gate fixture: lopen->loop (vowel
    * lengthening) / huizen->huis (z->s); "en" stopped. */
  def kpSbSearcher(spark: SparkSession, sfDir: String): Searcher =
    langCache.getOrElseUpdate((sfDir, "kpsb"), langFixture(spark, sfDir, "kpsb", "kp_snowball",
      concat(when(col("doc_id") % 2 === 0, "lopen").otherwise("maten"),
        lit(" en huizen"))))

  /** Dutch (Snowball DutchStemmer) gate fixture:
    *   "De katten en boeken lopen {huizen|straten}"
    * => kat@1 boek@3 lop@4 {huiz|strat}@5 (de@0, en@2 stopped). */
  def nlSearcher(spark: SparkSession, sfDir: String): Searcher =
    langCache.getOrElseUpdate((sfDir, "nl"), langFixture(spark, sfDir, "nl", "dutch",
      concat(lit("De katten en boeken lopen "),
        when(col("doc_id") % 2 === 0, "huizen").otherwise("straten"))))

  /** Swedish (Snowball SwedishStemmer) gate fixture:
    *   "Det är bilarna och katterna i husen {flickorna|hundarna}"
    * => bil@2 katt@4 hus@6 {flick|hund}@7 (det@0, är@1, och@3, i@5 stopped). */
  def svSearcher(spark: SparkSession, sfDir: String): Searcher =
    langCache.getOrElseUpdate((sfDir, "sv"), langFixture(spark, sfDir, "sv", "swedish",
      concat(lit("Det är bilarna och katterna i husen "),
        when(col("doc_id") % 2 === 0, "flickorna").otherwise("hundarna"))))

  /** Russian (Snowball RussianStemmer) gate fixture:
    *   "и книги в домах столов {красивая|важная}"
    * => книг@1 дом@3 стол@4 {красив|важн}@5 (и@0, в@2 stopped). */
  def ruSearcher(spark: SparkSession, sfDir: String): Searcher =
    langCache.getOrElseUpdate((sfDir, "ru"), langFixture(spark, sfDir, "ru", "russian",
      concat(lit("и книги в домах столов "),
        when(col("doc_id") % 2 === 0, "красивая").otherwise("важная"))))

  /** Danish (Snowball DanishStemmer) gate fixture:
    *   "og bogen i husene kattene {bilerne|dagene}"
    * => bog@1 hus@3 kat@4 {bil|dag}@5 (og@0, i@2 stopped). */
  def daSearcher(spark: SparkSession, sfDir: String): Searcher =
    langCache.getOrElseUpdate((sfDir, "da"), langFixture(spark, sfDir, "da", "danish",
      concat(lit("og bogen i husene kattene "),
        when(col("doc_id") % 2 === 0, "bilerne").otherwise("dagene"))))

  /** Norwegian (Snowball NorwegianStemmer) gate fixture:
    *   "og huset i bøkene {guttane|jentene}"
    * => hus@1 bøk@3 {gutt|jent}@4 (og@0, i@2 stopped). */
  def noSearcher(spark: SparkSession, sfDir: String): Searcher =
    langCache.getOrElseUpdate((sfDir, "no"), langFixture(spark, sfDir, "no", "norwegian",
      concat(lit("og huset i bøkene "),
        when(col("doc_id") % 2 === 0, "guttane").otherwise("jentene"))))

  /** CJK bigram gate fixture (CJKAnalyzer):
    *   "{数据系统|数据分析} the engine"
    * => even: 数据@0 据系@1 系统@2 engine@4; odd: 数据@0 据分@1 分析@2
    *   engine@4 ('the'@3 stopped with its gap preserved). */
  def cjkSearcher(spark: SparkSession, sfDir: String): Searcher =
    langCache.getOrElseUpdate((sfDir, "cjk"), langFixture(spark, sfDir, "cjk", "cjk",
      concat(when(col("doc_id") % 2 === 0, "数据系统").otherwise("数据分析"),
        lit(" the engine"))))

  // ---- generic-filter-catalog gate fixtures (VERDICT r3: the one component
  // green only in ScalaTest) — each named chain under an analytic fixture

  /** ShingleFilter: "alpha beta {gamma|delta}" => unigrams + "alpha beta"@0,
    * "beta gamma"@1 on even docs. */
  def shingleSearcher(spark: SparkSession, sfDir: String): Searcher =
    langCache.getOrElseUpdate((sfDir, "shingle"), langFixture(spark, sfDir, "shingle", "shingle",
      concat(lit("alpha beta "),
        when(col("doc_id") % 2 === 0, "gamma").otherwise("delta"))))

  /** NGramTokenFilter(3,3): "{abcdef|uvwxyz}" => char trigrams at pos 0. */
  def ngramSearcher(spark: SparkSession, sfDir: String): Searcher =
    langCache.getOrElseUpdate((sfDir, "ngram"), langFixture(spark, sfDir, "ngram", "ngram3",
      when(col("doc_id") % 2 === 0, "abcdef").otherwise("uvwxyz")))

  /** SynonymFilter (fixture map fast->quick, posIncr=0 injection):
    * "the {fast|slow} engine" => quick@1 rides WITH fast@1 on even docs. */
  def synonymSearcher(spark: SparkSession, sfDir: String): Searcher =
    langCache.getOrElseUpdate((sfDir, "syn"), langFixture(spark, sfDir, "syn", "synonym_fixture",
      concat(lit("the "),
        when(col("doc_id") % 2 === 0, "fast").otherwise("slow"),
        lit(" engine"))))

  /** PorterStemFilter via the english chain: "The {running|jumped} engines
    * quickly" => {run|jump}@1 engin@2 quickli@3 ('The'@0 stopped). */
  def porterSearcher(spark: SparkSession, sfDir: String): Searcher =
    langCache.getOrElseUpdate((sfDir, "porter"), langFixture(spark, sfDir, "porter", "english",
      concat(lit("The "),
        when(col("doc_id") % 2 === 0, "running").otherwise("jumped"),
        lit(" engines quickly"))))

  /** ASCIIFoldingFilter: "Café {Zürich|München} visit" => cafe@0
    * {zurich|munchen}@1 visit@2. */
  def asciiSearcher(spark: SparkSession, sfDir: String): Searcher =
    langCache.getOrElseUpdate((sfDir, "ascii"), langFixture(spark, sfDir, "ascii", "ascii",
      concat(lit("Café "),
        when(col("doc_id") % 2 === 0, "Zürich").otherwise("München"),
        lit(" visit"))))

  /** PhoneticFilter(Soundex, inject=true): "{robert|smith} jones" =>
    * {robert+R163|smith+S530}@0, jones+J520@1. */
  def soundexSearcher(spark: SparkSession, sfDir: String): Searcher =
    langCache.getOrElseUpdate((sfDir, "soundex"), langFixture(spark, sfDir, "soundex", "soundex",
      concat(when(col("doc_id") % 2 === 0, "robert").otherwise("smith"),
        lit(" jones"))))

  /** WordDelimiterFilter defaults: "{PowerShot|FlashMax}-500's zoom" =>
    * {power|flash}@0 {shot|max}@1 500@2 zoom@3 (case-change + numeric
    * splits, possessive stripped, parts consume positions). */
  def wordDelimSearcher(spark: SparkSession, sfDir: String): Searcher =
    langCache.getOrElseUpdate((sfDir, "wdf"), langFixture(spark, sfDir, "wdf", "word_delimiter",
      concat(when(col("doc_id") % 2 === 0, "PowerShot").otherwise("FlashMax"),
        lit("-500's zoom"))))

  /** EdgeNGramTokenFilter(2,3): "{dataset|moonbeam}" => {da,dat|mo,moo}@0. */
  def edgeSearcher(spark: SparkSession, sfDir: String): Searcher =
    langCache.getOrElseUpdate((sfDir, "edge"), langFixture(spark, sfDir, "edge", "edge23",
      when(col("doc_id") % 2 === 0, "dataset").otherwise("moonbeam")))

  /** CommonGramsFilter: "{the|an} engine" => {the|an}@0 +
    * {the_engine|an_engine}@0 engine@1 — stopword-adjacent bigram overlays
    * at the first word's position. */
  def commonGramsSearcher(spark: SparkSession, sfDir: String): Searcher =
    langCache.getOrElseUpdate((sfDir, "cgrams"), langFixture(spark, sfDir, "cgrams", "commongrams",
      concat(when(col("doc_id") % 2 === 0, "the").otherwise("an"),
        lit(" engine"))))

  /** DictionaryCompoundWordTokenFilter: "{fussballspiel|regenwetter}
    * heute" => original@0 + dictionary parts {fuss,ball,spiel | regen,
    * wetter}@0. */
  def compoundSearcher(spark: SparkSession, sfDir: String): Searcher =
    langCache.getOrElseUpdate((sfDir, "compound"), langFixture(spark, sfDir, "compound", "compound_fixture",
      concat(when(col("doc_id") % 2 === 0, "fussballspiel").otherwise("regenwetter"),
        lit(" heute"))))

  // ---- second analyzer-catalog wave (Fi/Hu/Cz/Bg/Hi/Ar/Fa/Id chains)

  /** Finnish (Snowball default): talossa->talo on even docs, autossa->auto
    * on odd; "ja" stopped; vesi untouched (no case ending in R1). */
  def fiSearcher(spark: SparkSession, sfDir: String): Searcher =
    langCache.getOrElseUpdate((sfDir, "fi"), langFixture(spark, sfDir, "fi", "finnish",
      // trailing "vaikka" stops only via the full Snowball finnish list
      concat(when(col("doc_id") % 2 === 0, "talossa").otherwise("autossa"),
        lit(" ja vesi vaikka"))))

  /** Finnish light variant: kirjassa->kirj on even docs (the Snowball
    * default also reaches kirj; the light chain is pinned by its own
    * analyzer name so the gate proves the catalog member exists). */
  def fiLightSearcher(spark: SparkSession, sfDir: String): Searcher =
    langCache.getOrElseUpdate((sfDir, "fil"), langFixture(spark, sfDir, "fil", "finnish_light",
      concat(when(col("doc_id") % 2 === 0, "kirjassa").otherwise("autossa"),
        lit(" ja vesi"))))

  /** Hungarian (Snowball default): házakban->ház (-ban case, -ak plural,
    * accents kept) / kertekben->kert; "és" stopped. */
  def huSearcher(spark: SparkSession, sfDir: String): Searcher =
    langCache.getOrElseUpdate((sfDir, "hu"), langFixture(spark, sfDir, "hu", "hungarian",
      concat(when(col("doc_id") % 2 === 0, "házakban").otherwise("kertekben"),
        lit(" és alma"))))

  /** Hungarian light variant: házakban->haz (accents FOLDED — the Savoy
    * light rules' distinguishing behavior vs the Snowball default). */
  def huLightSearcher(spark: SparkSession, sfDir: String): Searcher =
    langCache.getOrElseUpdate((sfDir, "hul"), langFixture(spark, sfDir, "hul", "hungarian_light",
      concat(when(col("doc_id") % 2 === 0, "házakban").otherwise("kertekben"),
        lit(" és alma"))))

  /** Czech stem: studentech->student / městech->měst; "a" stopped. */
  def csSearcher(spark: SparkSession, sfDir: String): Searcher =
    langCache.getOrElseUpdate((sfDir, "cs"), langFixture(spark, sfDir, "cs", "czech",
      concat(when(col("doc_id") % 2 === 0, "studentech").otherwise("městech"),
        lit(" a škola"))))

  /** Bulgarian stem: градовете->град / книгите->книг; "на" stopped;
    * "обаче" stops only via the full published list (q_lang_bg_stop). */
  def bgSearcher(spark: SparkSession, sfDir: String): Searcher =
    langCache.getOrElseUpdate((sfDir, "bg"), langFixture(spark, sfDir, "bg", "bulgarian",
      concat(when(col("doc_id") % 2 === 0, "градовете").otherwise("книгите"),
        lit(" на страна обаче"))))

  /** Hindi normalize+stem: किताबें->किताब / कमरे->कमर; "और" stopped
    * (matched post-normalization as ओर). */
  def hiSearcher(spark: SparkSession, sfDir: String): Searcher =
    langCache.getOrElseUpdate((sfDir, "hi"), langFixture(spark, sfDir, "hi", "hindi",
      concat(when(col("doc_id") % 2 === 0, "किताबें").otherwise("कमरे"),
        lit(" और कलम लेकिन"))))

  /** Arabic stem: الكتاب->كتاب / والقلم->قلم; "في" stopped (surface form,
    * before normalization — ArabicAnalyzer.cs chain order). */
  def arSearcher(spark: SparkSession, sfDir: String): Searcher =
    langCache.getOrElseUpdate((sfDir, "ar"), langFixture(spark, sfDir, "ar", "arabic",
      concat(when(col("doc_id") % 2 === 0, "الكتاب").otherwise("والقلم"),
        lit(" في البيت سنوات"))))

  /** Persian normalization: کتابی (farsi yeh + keheh) -> كتابي on even
    * docs; "در" stopped post-normalization. */
  def faSearcher(spark: SparkSession, sfDir: String): Searcher =
    langCache.getOrElseUpdate((sfDir, "fa"), langFixture(spark, sfDir, "fa", "persian",
      concat(when(col("doc_id") % 2 === 0, "کتابی").otherwise("قلمها"),
        lit(" در خانه درباره"))))

  /** Sorani stem: پیاوەکان (definite plural) -> پیاو / کتێبەکە (definite
    * singular) -> کتێب; "لە" stopped. */
  def ckbSearcher(spark: SparkSession, sfDir: String): Searcher =
    langCache.getOrElseUpdate((sfDir, "ckb"), langFixture(spark, sfDir, "ckb", "sorani",
      concat(when(col("doc_id") % 2 === 0, "پیاوەکان").otherwise("کتێبەکە"),
        lit(" لە شار چونکە"))))

  /** Romanian (Snowball): studenţilor -> studenţ / oraşelor -> oraş;
    * "în" stopped. */
  def roSearcher(spark: SparkSession, sfDir: String): Searcher =
    langCache.getOrElseUpdate((sfDir, "ro"), langFixture(spark, sfDir, "ro", "romanian",
      concat(when(col("doc_id") % 2 === 0, "studenţilor").otherwise("oraşelor"),
        lit(" în lume"))))

  /** Greek fold+stem: Υπολογιστές -> υπολογιστ / Θάλασσα -> θαλασσ;
    * "και" stopped. */
  def elSearcher(spark: SparkSession, sfDir: String): Searcher =
    langCache.getOrElseUpdate((sfDir, "el"), langFixture(spark, sfDir, "el", "greek",
      concat(when(col("doc_id") % 2 === 0, "Υπολογιστές").otherwise("Θάλασσα"),
        lit(" και δεδομένα εκείνος"))))

  /** Thai segmentation: ภาษาไทย splits to ภาษา|ไทย at consecutive
    * positions (BreakIterator dictionary word-break); และ stopped. */
  def thSearcher(spark: SparkSession, sfDir: String): Searcher =
    langCache.getOrElseUpdate((sfDir, "th"), langFixture(spark, sfDir, "th", "thai",
      concat(when(col("doc_id") % 2 === 0, "ภาษาไทย").otherwise("โรงเรียน"),
        lit(" และ หนังสือ เพื่อ"))))

  /** Indonesian stem: membaca->baca / berjalan->jalan; "yang" stopped. */
  def idSearcher(spark: SparkSession, sfDir: String): Searcher =
    langCache.getOrElseUpdate((sfDir, "id"), langFixture(spark, sfDir, "id", "indonesian",
      concat(when(col("doc_id") % 2 === 0, "membaca").otherwise("berjalan"),
        lit(" yang buku"))))

  // ---- third analyzer-catalog wave (Lv/Br/Gl/Ga/Tr/Ca/Eu/Hy chains)

  /** Latvian light stem: ceļiem->cel (plural dative -iem + ļ
    * unpalatalization) / mājām->māj; "un" stopped; zivis->ziv. */
  def lvSearcher(spark: SparkSession, sfDir: String): Searcher =
    langCache.getOrElseUpdate((sfDir, "lv"), langFixture(spark, sfDir, "lv", "latvian",
      concat(when(col("doc_id") % 2 === 0, "ceļiem").otherwise("mājām"),
        lit(" un zivis"))))

  /** Brazilian stem: meninas->menin / casas->cas; "de" stopped (gap kept);
    * trabalhador->trabalh. */
  def brSearcher(spark: SparkSession, sfDir: String): Searcher =
    langCache.getOrElseUpdate((sfDir, "br"), langFixture(spark, sfDir, "br", "brazilian",
      concat(when(col("doc_id") % 2 === 0, "meninas").otherwise("casas"),
        lit(" de trabalhador"))))

  /** Galician full chain: traballadores->traballador / casas->cas;
    * "non" stopped; cancións->canci. */
  def glSearcher(spark: SparkSession, sfDir: String): Searcher =
    langCache.getOrElseUpdate((sfDir, "gl"), langFixture(spark, sfDir, "gl", "galician",
      concat(when(col("doc_id") % 2 === 0, "traballadores").otherwise("casas"),
        lit(" non cancións"))))

  /** GalicianMinimal (RSLP-S plural-only): camións->camión / luces->luz;
    * mulleres->muller. */
  def glMinSearcher(spark: SparkSession, sfDir: String): Searcher =
    langCache.getOrElseUpdate((sfDir, "glmin"), langFixture(spark, sfDir, "glmin", "galician_minimal",
      concat(when(col("doc_id") % 2 === 0, "camións").otherwise("luces"),
        lit(" non mulleres"))))

  /** Irish chain: nAthair -> n-athair (IrishLowerCaseFilter) -> athair
    * (initial-mutation undo) on even docs / scoil; "agus" stopped;
    * filíocht->fil (-íocht noun suffix). */
  def gaSearcher(spark: SparkSession, sfDir: String): Searcher =
    langCache.getOrElseUpdate((sfDir, "ga"), langFixture(spark, sfDir, "ga", "irish",
      concat(when(col("doc_id") % 2 === 0, "nAthair").otherwise("scoil"),
        lit(" agus filíocht"))))

  /** Turkish chain: İstanbul'da -> apostrophe strip + Turkish İ->i
    * lowercase -> istanbul on even docs / Ankara'ya -> ankar; "ve"
    * stopped; kitapları->kitap (Snowball noun suffixes). */
  def trSearcher(spark: SparkSession, sfDir: String): Searcher =
    langCache.getOrElseUpdate((sfDir, "tr"), langFixture(spark, sfDir, "tr", "turkish",
      concat(when(col("doc_id") % 2 === 0, "İstanbul'da").otherwise("Ankara'ya"),
        lit(" ve kitapları"))))

  /** Catalan chain: catalanes->catalan / cases->cas; "i" stopped;
    * l'aigua -> elision -> aigua -> aigu (residual vowel). */
  def caSearcher(spark: SparkSession, sfDir: String): Searcher =
    langCache.getOrElseUpdate((sfDir, "ca"), langFixture(spark, sfDir, "ca", "catalan",
      concat(when(col("doc_id") % 2 === 0, "catalanes").otherwise("cases"),
        lit(" i l'aigua"))))

  /** Basque chain: etxeak->etxe / mendietan->mendi; "eta" stopped;
    * liburuarekin->liburu. */
  def euSearcher(spark: SparkSession, sfDir: String): Searcher =
    langCache.getOrElseUpdate((sfDir, "eu"), langFixture(spark, sfDir, "eu", "basque",
      concat(when(col("doc_id") % 2 === 0, "etxeak").otherwise("mendietan"),
        lit(" eta liburuarekin"))))

  /** Armenian chain: գրքերը->գրքեր (article ը) / տներում->տներ (-ում);
    * "և" stopped; քաղաքից->քաղաք (-ից ablative). */
  def hySearcher(spark: SparkSession, sfDir: String): Searcher =
    langCache.getOrElseUpdate((sfDir, "hy"), langFixture(spark, sfDir, "hy", "armenian",
      concat(when(col("doc_id") % 2 === 0, "գրքերը").otherwise("տներում"),
        lit(" և քաղաքից"))))

  /** Chinese (unigram) chain: single-char CJK tokens; "the" dropped
    * WITHOUT a position gap (pre-posIncr ChineseFilter) so 据@1 模@2 are
    * phrase-adjacent across it on even docs. */
  def zhSearcher(spark: SparkSession, sfDir: String): Searcher =
    langCache.getOrElseUpdate((sfDir, "zh"), langFixture(spark, sfDir, "zh", "chinese",
      concat(when(col("doc_id") % 2 === 0, "数据").otherwise("系统"),
        lit(" the 模型"))))

  // ---- char-filter / generic tokenizer wave (CharFilter, Path, Pattern,
  //      Miscellaneous directories)

  /** HTMLStripCharFilter fixture: variant word inside markup; script
    * content ("hidden") must NOT index; caf&eacute; decodes to café. */
  def htmlSearcher(spark: SparkSession, sfDir: String): Searcher =
    langCache.getOrElseUpdate((sfDir, "html"), langFixture(spark, sfDir, "html", "html_strip",
      concat(lit("<html><body><h1>"),
        when(col("doc_id") % 2 === 0, "alpha").otherwise("beta"),
        lit("</h1><script>var hidden=1;</script><p>caf&eacute; corpus</p></body></html>"))))

  /** MappingCharFilter fixture (ph->f pre-tokenization): photo->foto. */
  def mapcfSearcher(spark: SparkSession, sfDir: String): Searcher =
    langCache.getOrElseUpdate((sfDir, "mapcf"), langFixture(spark, sfDir, "mapcf", "mapping_fixture",
      concat(when(col("doc_id") % 2 === 0, "photo").otherwise("graph"),
        lit(" topic"))))

  /** PatternReplaceCharFilter fixture: 123-456 -> one token 123456. */
  def patrepSearcher(spark: SparkSession, sfDir: String): Searcher =
    langCache.getOrElseUpdate((sfDir, "patrep"), langFixture(spark, sfDir, "patrep", "patrep_fixture",
      concat(when(col("doc_id") % 2 === 0, "123-456").otherwise("789-012"),
        lit(" code"))))

  /** PathHierarchyTokenizer fixture: the whole field is a path. */
  def pathSearcher(spark: SparkSession, sfDir: String): Searcher =
    langCache.getOrElseUpdate((sfDir, "path"), langFixture(spark, sfDir, "path", "path_hier",
      when(col("doc_id") % 2 === 0, "/usr/share/docs").otherwise("/var/log/app")))

  /** ReversePathHierarchyTokenizer fixture (suffix hierarchy). */
  def pathRevSearcher(spark: SparkSession, sfDir: String): Searcher =
    langCache.getOrElseUpdate((sfDir, "pathrev"), langFixture(spark, sfDir, "pathrev", "path_hier_rev",
      when(col("doc_id") % 2 === 0, "/usr/share/docs").otherwise("/var/log/app")))

  /** PatternTokenizer fixture: comma-separated values. */
  def csvSearcher(spark: SparkSession, sfDir: String): Searcher =
    langCache.getOrElseUpdate((sfDir, "csv"), langFixture(spark, sfDir, "csv", "pattern_csv",
      when(col("doc_id") % 2 === 0, "alpha, beta, gamma").otherwise("delta, epsilon")))

  /** ScandinavianFoldingFilter fixture: räksmörgås->raksmorgas. */
  def scandSearcher(spark: SparkSession, sfDir: String): Searcher =
    langCache.getOrElseUpdate((sfDir, "scand"), langFixture(spark, sfDir, "scand", "scandinavian_fold",
      concat(when(col("doc_id") % 2 === 0, "räksmörgås").otherwise("blåbær"),
        lit(" smak"))))

  /** HyphenatedWordsFilter fixture: "ecologi- cal" joins to ecological@0
    * and the position gap closes (disaster@1). */
  def hyphSearcher(spark: SparkSession, sfDir: String): Searcher =
    langCache.getOrElseUpdate((sfDir, "hyph"), langFixture(spark, sfDir, "hyph", "hyphenated",
      concat(when(col("doc_id") % 2 === 0, "ecologi- cal").otherwise("standard"),
        lit(" disaster"))))

  /** KeywordRepeatFilter fixture: running AND run both index at pos 0. */
  def repeatSearcher(spark: SparkSession, sfDir: String): Searcher =
    langCache.getOrElseUpdate((sfDir, "repeat"), langFixture(spark, sfDir, "repeat", "keyword_repeat",
      concat(when(col("doc_id") % 2 === 0, "running").otherwise("jumped"),
        lit(" quickly"))))

  /** StemmerOverrideFilter fixture: running -> sprint (dictionary wins
    * over Porter). */
  def overrideSearcher(spark: SparkSession, sfDir: String): Searcher =
    langCache.getOrElseUpdate((sfDir, "override"), langFixture(spark, sfDir, "override", "stemmer_override",
      concat(when(col("doc_id") % 2 === 0, "running").otherwise("walking"),
        lit(" daily"))))

  /** WikipediaTokenizer fixture: wiki markup — internal links, headings,
    * external links, citations, categories. */
  def wikiSearcher(spark: SparkSession, sfDir: String): Searcher =
    langCache.getOrElseUpdate((sfDir, "wiki"), langFixture(spark, sfDir, "wiki", "wikipedia",
      concat(lit("intro [["),
        when(col("doc_id") % 2 === 0, "alpha beta]] ==Solar Power== [http://example.com/a click]")
          .otherwise("gamma delta]] ==Wind Power== [http://example.com/b visit]"),
        lit(" <ref>cite "),
        when(col("doc_id") % 2 === 0, "alpha").otherwise("gamma"),
        lit("</ref> [[Category:"),
        when(col("doc_id") % 2 === 0, "science fiction").otherwise("space opera"),
        lit("]]"))))

  /** UNTOKENIZED_ONLY twin of the wiki fixture: links + categories collapse
    * to single multi-word terms. */
  def wikiUntokSearcher(spark: SparkSession, sfDir: String): Searcher =
    langCache.getOrElseUpdate((sfDir, "wikiuntok"), langFixture(spark, sfDir, "wikiuntok", "wikipedia_untok",
      concat(lit("intro [["),
        when(col("doc_id") % 2 === 0, "alpha beta").otherwise("gamma delta"),
        lit("]] [[Category:"),
        when(col("doc_id") % 2 === 0, "science fiction").otherwise("space opera"),
        lit("]]"))))

  /** UAX29URLEmailTokenizer fixture: a URL and an email embedded in prose. */
  def uaxSearcher(spark: SparkSession, sfDir: String): Searcher =
    langCache.getOrElseUpdate((sfDir, "uax"), langFixture(spark, sfDir, "uax", "uax_url_email",
      concat(lit("contact "),
        when(col("doc_id") % 2 === 0, "bob@example.org").otherwise("eve@sample.net"),
        lit(" or visit "),
        when(col("doc_id") % 2 === 0, "https://example.com/a?x=1").otherwise("https://sample.net/b"),
        lit(" today."))))

  /** Hunspell fixture: affix-dictionary stemming (re-+walk+-ed collapse to
    * the dictionary stem; unknown words index unchanged). */
  def hunspellSearcher(spark: SparkSession, sfDir: String): Searcher =
    langCache.getOrElseUpdate((sfDir, "hunspell"), langFixture(spark, sfDir, "hunspell", "hunspell_fixture",
      concat(when(col("doc_id") % 2 === 0, "rewalked").otherwise("tried"),
        lit(" zebra"))))

  /** Lucene-RegExp-dialect fixture: numeric tokens for `<n-m>` intervals
    * (7 in range on even docs, 42 out of range on odd) and a la<ne|te>
    * minimal pair for concatenated complements. */
  def luceneRegexSearcher(spark: SparkSession, sfDir: String): Searcher =
    langCache.getOrElseUpdate((sfDir, "lregex"), langFixture(spark, sfDir, "lregex", "simple",
      concat(when(col("doc_id") % 2 === 0, "item 7 lane ready")
        .otherwise("item 42 late ready"), lit(""))))

  /** Hunspell ICONV/CIRCUMFIX fixture: even docs carry ß-spelled fußball
    * (reaches the index as fussball via ICONV), odd docs carry the
    * circumfix pair ge-lauf-t (stems to lauf only because BOTH circumfix
    * halves strip together). */
  def hunspellIconvSearcher(spark: SparkSession, sfDir: String): Searcher =
    langCache.getOrElseUpdate((sfDir, "hunspelliconv"), langFixture(spark, sfDir, "hunspelliconv", "hunspell_iconv",
      concat(when(col("doc_id") % 2 === 0, "fußball").otherwise("gelauft"),
        lit(" heute"))))

  /** HyphenationCompound fixture: Liang-pattern decompounding against the
    * part dictionary — compounds searchable by their parts. */
  def hyphCompoundSearcher(spark: SparkSession, sfDir: String): Searcher =
    langCache.getOrElseUpdate((sfDir, "hyphcomp"), langFixture(spark, sfDir, "hyphcomp", "hyph_compound",
      concat(when(col("doc_id") % 2 === 0, "fussballspiel").otherwise("regenwetter"),
        lit(" heute"))))

  /** KStem fixture: dictionary-backed stemming — an irregular form (direct
    * conflation), a -ied past tense, and a doubled-consonant -ing all
    * collapse to their dictionary roots. */
  def kstemSearcher(spark: SparkSession, sfDir: String): Searcher =
    langCache.getOrElseUpdate((sfDir, "kstem"), langFixture(spark, sfDir, "kstem", "english_kstem",
      // brightness/announcement resolve only through the KStemLexicon
      // head-word list (-ness/-ment restoration; roots absent from the
      // rule-pinned core) — q_kstem_ness / q_kstem_ment pin them
      concat(when(col("doc_id") % 2 === 0, "dying running brightness")
          .otherwise("tried walking announcement"),
        lit(" zebra"))))

  /** EnglishMinimalStem fixture: plural-only stemming. */
  def enMinimalSearcher(spark: SparkSession, sfDir: String): Searcher =
    langCache.getOrElseUpdate((sfDir, "enmin"), langFixture(spark, sfDir, "enmin", "english_minimal",
      concat(when(col("doc_id") % 2 === 0, "cats").otherwise("dogs"),
        lit(" bowl"))))

  /** EnglishPossessive fixture: the U+2019 curly-apostrophe 's strip that
    * only the dedicated possessive filter handles. */
  def enPossessiveSearcher(spark: SparkSession, sfDir: String): Searcher =
    langCache.getOrElseUpdate((sfDir, "enposs"), langFixture(spark, sfDir, "enposs", "english_possessive",
      concat(when(col("doc_id") % 2 === 0, "Bob’s").otherwise("Eve’s"),
        lit(" bowl"))))

  /** Bloom-postings fixture (BloomFilteringPostingsFormat analog): a
    * 4-segment index built with per-segment term blooms; term queries prune
    * the segment list driver-side before any postings scan. */
  def bloomSearcher(spark: SparkSession, sfDir: String): Searcher =
    langCache.getOrElseUpdate((sfDir, "bloom"), {
      val path = indexPath(sfDir) + "_bloom"
      if (IndexBuilder.completedSegments(spark, path).isEmpty) {
        val pages = spark.read.parquet(s"$sfDir/documents.parquet").select(
          format_string("doc%09d", col("doc_id")).as("url"),
          concat(when(col("doc_id") % 2 === 0, "needle").otherwise("haystack"),
            lit(" probe")).as("text"))
        IndexBuilder.build(spark, pages, path,
          IndexBuilder.BuildConfig(numSegments = 4, analyzerName = "simple",
            groupSize = 4, bloomFilter = true))
      }
      new Searcher(spark, path, mode = ExactDouble)
    })

  private val langCache = scala.collection.concurrent.TrieMap.empty[(String, String), Searcher]

  /** STREAMED gate fixture: docs >= 50 batch-built (segments 0..1), docs
    * < 50 appended through StreamingIndexer.appendBatch into the streaming
    * id band (2^20..) — the gate then queries across both bands, putting
    * the incremental-indexing path under the DuckDB oracle. */
  def streamedSearcher(spark: SparkSession, sfDir: String): Searcher = stCache.getOrElseUpdate(sfDir, {
    val path = indexPath(sfDir) + "_streamed"
    if (IndexBuilder.completedSegments(spark, path).isEmpty) {
      val all = spark.read.parquet(s"$sfDir/documents.parquet")
        .select(format_string("doc%09d", col("doc_id")).as("url"), col("text"),
          col("doc_id"))
      IndexBuilder.build(spark, all.filter(col("doc_id") >= 50).drop("doc_id"), path,
        IndexBuilder.BuildConfig(numSegments = 2, analyzerName = "simple"))
      graft.streaming.StreamingIndexer.appendBatch(spark,
        all.filter(col("doc_id") < 50).drop("doc_id"), path,
        "simple", segmentsPerBatch = 2, batchId = 0L)
    }
    new Searcher(spark, path, mode = ExactDouble)
  })
  private val stCache = scala.collection.concurrent.TrieMap.empty[String, Searcher]

  /** Offsets gate fixture pages: variable-length filler then ' target
    * finale', so the token "target"'s character startOffset = 6 + doc_id%11
    * is analytically derivable — the DuckDB twin recomputes the passage
    * slice with pure string arithmetic. */
  def offsetsFixturePages(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/documents.parquet").select(
      format_string("doc%09d", col("doc_id")).as("url"),
      expr("concat(repeat('x', cast(5 + doc_id % 11 as int)), ' target finale')").as("text"))

  /** Index with per-position character offsets stored IN THE POSTINGS
    * (IndexOptions ..._AND_OFFSETS, BuildConfig.indexOffsets = true) — the
    * PostingsHighlighter gate fixture: highlighting slices the stored text
    * at postings offsets, no term vectors, no re-analysis. Two segments so
    * the offsets path is exercised across segment boundaries. */
  def offsetsSearcher(spark: SparkSession, sfDir: String): Searcher = offCache.getOrElseUpdate(sfDir, {
    val path = indexPath(sfDir) + "_offsets"
    if (IndexBuilder.completedSegments(spark, path).isEmpty) {
      IndexBuilder.build(spark, offsetsFixturePages(spark, sfDir), path,
        IndexBuilder.BuildConfig(numSegments = 2, analyzerName = "simple",
          indexOffsets = true))
    }
    new Searcher(spark, path, mode = ExactDouble)
  })
  private val offCache = scala.collection.concurrent.TrieMap.empty[String, Searcher]

  /** FastVectorHighlighter PHRASE gate fixture — analytic in doc_id so the
    * oracle recomputes snippets by string arithmetic. Three doc classes:
    * doc_id%3==0 carries the phrase "alpha beta" three times (the middle
    * window holds TWO complete matches — the phrase-scored best fragment);
    * %3==1 has the terms apart, %3==2 reversed — both must produce NOTHING
    * under phrase highlighting though term highlighting would fire. */
  def fvhFixturePages(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/documents.parquet").select(
      format_string("doc%09d", col("doc_id")).as("url"),
      expr("""concat(repeat('y', cast(doc_id % 7 as int)),
             |  case cast(doc_id % 3 as int)
             |    when 0 then ' alpha beta end alpha beta alpha beta'
             |    when 1 then ' alpha end beta'
             |    else ' beta alpha end' end)""".stripMargin).as("text"))

  /** Term-vector-enabled index over the FVH phrase fixture (two segments so
    * vector fetch crosses segment boundaries). */
  def fvhSearcher(spark: SparkSession, sfDir: String): Searcher = fvhCache.getOrElseUpdate(sfDir, {
    val path = indexPath(sfDir) + "_fvh"
    if (IndexBuilder.completedSegments(spark, path).isEmpty) {
      IndexBuilder.build(spark, fvhFixturePages(spark, sfDir), path,
        IndexBuilder.BuildConfig(numSegments = 2, analyzerName = "simple",
          termVectors = true))
    }
    new Searcher(spark, path, mode = ExactDouble)
  })
  private val fvhCache = scala.collection.concurrent.TrieMap.empty[String, Searcher]

  /** NRT-REFRESH gate fixture (VERDICT r3 #4): batch-build docs >= 50, open
    * a [[graft.streaming.SearcherManager]], query it, then APPEND docs < 50
    * through the streaming band and DELETE source='src1' docs — and serve
    * the gate queries through the SAME manager's maybeRefresh/acquire
    * (Search/SearcherManager.cs MaybeRefresh semantics), never a hand-built
    * Searcher. The refresh contract is asserted at fixture build time:
    * unchanged -> no refresh; the pre-change reader keeps its point-in-time
    * view; changed (appends + deletes) -> refresh hands out a new reader.
    * Gate outputs are match SETS and counts (scoring-mode independent, so
    * the manager's default reader is oracle-comparable). */
  def nrtSearcher(spark: SparkSession, sfDir: String): Searcher = nrtCache.getOrElseUpdate(sfDir, {
    val path = indexPath(sfDir) + "_nrt"
    if (IndexBuilder.completedSegments(spark, path).nonEmpty) {
      // fixture already materialized by an earlier driver run: the refresh
      // transitions were asserted then; serve through a manager all the same
      new graft.streaming.SearcherManager(spark, path).acquire()
    } else {
      val all = spark.read.parquet(s"$sfDir/documents.parquet")
        .select(format_string("doc%09d", col("doc_id")).as("url"), col("text"),
          col("doc_id"))
      IndexBuilder.build(spark, all.filter(col("doc_id") >= 50).drop("doc_id"), path,
        IndexBuilder.BuildConfig(numSegments = 2, analyzerName = "simple"))
      val mgr = new graft.streaming.SearcherManager(spark, path)
      val s0 = mgr.acquire()
      require(!mgr.maybeRefresh(), "unchanged index must not trigger a refresh")
      val n0 = s0.count(MatchAllQ)
      graft.streaming.StreamingIndexer.appendBatch(spark,
        all.filter(col("doc_id") < 50).drop("doc_id"), path, "simple",
        segmentsPerBatch = 2, batchId = 0L)
      graft.build.Deletes.deleteUrls(spark, path,
        spark.read.parquet(s"$sfDir/documents.parquet")
          .filter(col("source") === "src1")
          .select(format_string("doc%09d", col("doc_id")).as("url")))
      require(s0.count(MatchAllQ) == n0,
        "pre-refresh reader lost its point-in-time view")
      require(mgr.maybeRefresh(), "append + delete must trigger a refresh")
      val s1 = mgr.acquire()
      require(s1 ne s0, "refresh must hand out a new reader")
      s1
    }
  })
  private val nrtCache = scala.collection.concurrent.TrieMap.empty[String, Searcher]

  /** PerFieldSimilarityWrapper reader over the fielded gate index: the lang
    * keyword field scores TFIDF while text stays BM25 (queryNorm = coord = 1
    * per the reference wrapper's sealed non-overrides). */
  def perFieldSearcher(spark: SparkSession, sfDir: String): Searcher = pfCache.getOrElseUpdate(sfDir, {
    fieldedSearcher(spark, sfDir) // ensure the index is built
    new Searcher(spark, indexPath(sfDir) + "_fielded", mode = ExactDouble,
      perFieldSimilarity = Map("lang" -> TfIdfSim))
  })
  private val pfCache = scala.collection.concurrent.TrieMap.empty[String, Searcher]

  /** (url, score, segmentId, docId) -> (doc_id, rank) for SQL-stable output.
    * Rank is computed distributed (Ranks.appendRank) — no unpartitioned
    * window funnel even for unbounded result sets (q_filtered-shaped).
    */
  def rankedIds(df: DataFrame): DataFrame = {
    val withId = df.withColumn("doc_id", expr("cast(substring(url, 4) as bigint)"))
    Ranks.appendRank(withId, "rank",
        Seq(col("score").desc, col("segmentId").asc, col("docId").asc))
      .select(col("doc_id"), col("rank"))
      .orderBy(col("rank"))
  }
}
