package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.search._

/** The driver-contract query battery: one entry per operator family
  * (SURVEY.md §2), each routed through the real engine (index build + query
  * compile + BM25), with a DuckDB twin in [[Queries.oracle]] that recomputes
  * the same semantics relationally from documents.parquet.
  *
  * Parity rules documented at [[SparkEntry]]: SimpleAnalyzer tokenization
  * (= regexp_extract_all(lower(text), '[a-z0-9]+')); ExactDouble scoring with
  * identical operation order; integer/string outputs; ranked outputs emit
  * (doc_id, rank) with ORDER BY score DESC, doc_id ASC.
  */
object Queries {

  // -------------------------------------------------------------- helpers

  private def searcher(s: SparkSession, dir: String): Searcher = IndexCache.searcher(s, dir)

  /** Engine hits -> (doc_id, rank), the SQL-stable ranked output shape. */
  private def ranked(df: DataFrame): DataFrame = IndexCache.rankedIds(df)

  /** Payload-scored hits -> (doc_id, pay) ordered — int cast for min/max
    * (exact), double for avg (exact: integer sum / count). */
  private def payloadIds(s: Searcher, q: Query, intScore: Boolean): DataFrame = {
    val hits = s.compile(q)
      .join(s.docs.select("segmentId", "docId", "url"), Seq("segmentId", "docId"))
      .withColumn("doc_id", expr("cast(substring(url, 4) as bigint)"))
    val pay = if (intScore) col("score").cast("int") else col("score")
    hits.select(col("doc_id"), pay.as("pay")).orderBy("doc_id")
  }

  /** Engine hits -> sorted doc_id set. */
  /** Stop-list-is-LIVE proof: `word` must vanish in the named chain — if
    * it survived the stop filter its stem would match every fixture doc
    * and the empty oracle would fail; if stopped we query a term that is
    * never indexed so the result is empty like the oracle. */
  private def stopProof(se: Searcher, analyzerName: String, word: String): DataFrame =
    graft.analysis.Analyzers.byName(analyzerName).tokenize(word)
      .map(_.term).toList match {
      case Nil => idsOf(se, TermQ("zz_never_indexed"))
      case t :: _ => idsOf(se, TermQ(t))
    }

  private def idsOf(s: Searcher, q: Query): DataFrame = {
    val hits = s.compile(q)
    hits.join(s.docs.select("segmentId", "docId", "url"), Seq("segmentId", "docId"))
      .select(expr("cast(substring(url, 4) as bigint)").as("doc_id"))
      .orderBy("doc_id")
  }

  /** Shared DuckDB prelude: tokenization with positions + BM25 ingredients.
    * Mirrors SimpleAnalyzer + the engine's ExactDouble scorer op-for-op.
    */
  private def prelude(cond: String): String =
    s"""WITH docsrc AS (SELECT * FROM documents WHERE $cond),
      |arrs AS (
      |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS arr FROM docsrc),
      |toks AS (
      |  SELECT doc_id, arr[i] AS term, i - 1 AS pos
      |  FROM arrs, unnest(generate_series(1, len(arr))) AS t(i)),
      |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
      |dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
      |dfs AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
      |consts AS (
      |  SELECT (SELECT count(*) FROM docsrc) AS n,
      |         (SELECT coalesce(sum(dl), 0) FROM dl) AS sttf)""".stripMargin

  private val P = prelude("1 = 1")

  /** Prelude over the corpus as a purging merge leaves it (src1 deleted). */
  private val PDel = prelude("source <> 'src1'")

  /** BM25 score of `term` per doc as CTE `scores_<name>` (ExactDouble parity:
    * ((ln(1+((n-df)+0.5)/(df+0.5)) * (1.2+1)) * tf) / (tf + 1.2*((1-0.75)+((0.75*dl)/avgdl)))
    */
  /** [[scoreCte]] with a query boost multiplying the idf in place
    * (ExactDouble boost point — same shape as the q_parsed_boost oracle). */
  private def boostedScoreCte(name: String, term: String, boost: String): String =
    s"""scores_$name AS (
       |  SELECT tf.doc_id,
       |    ((ln(1 + ((c.n - d.df) + 0.5) / (d.df + 0.5)) * $boost) * (1.2 + 1)) * tf.tf /
       |    (tf.tf + 1.2 * ((1 - 0.75) + ((0.75 * dl.dl) / (CAST(c.sttf AS DOUBLE) / c.n)))) AS s
       |  FROM tf JOIN dl USING (doc_id) JOIN dfs d ON d.term = tf.term CROSS JOIN consts c
       |  WHERE tf.term = '$term')""".stripMargin

  private def scoreCte(name: String, term: String): String =
    s"""scores_$name AS (
       |  SELECT tf.doc_id,
       |    (ln(1 + ((c.n - d.df) + 0.5) / (d.df + 0.5)) * (1.2 + 1)) * tf.tf /
       |    (tf.tf + 1.2 * ((1 - 0.75) + ((0.75 * dl.dl) / (CAST(c.sttf AS DOUBLE) / c.n)))) AS s
       |  FROM tf JOIN dl USING (doc_id) JOIN dfs d ON d.term = tf.term CROSS JOIN consts c
       |  WHERE tf.term = '$term')""".stripMargin

  // -------------------------------------------------------------- queries

  def all: Map[String, (SparkSession, String) => DataFrame] =
    searchAll ++ QueriesPipeline.pipeAll

  def oracle: Map[String, String] = searchOracle ++ QueriesPipeline.pipeOracle

  private def searchAll: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- term / posting-list scan (TermQuery/TermScorer, SURVEY.md §2.5)
    "q_term_docs" -> ((s, dir) => {
      val se = searcher(s, dir)
      se.termPostings("data")
        .select(expr("cast(substring(url, 4) as bigint)").as("doc_id"),
          col("tf").cast("long").as("tf"))
        .orderBy("doc_id")
    }),
    "q_term_topk" -> ((s, dir) => ranked(searcher(s, dir).search(TermQ("data"), 10))),
    // IndexSplitter analog: the re-sharded (1 -> 3 segment) copy must score
    // identically to the source index, so it shares q_term_topk's oracle
    "q_split_topk" -> ((s, dir) => ranked(IndexCache.splitSearcher(s, dir).search(TermQ("data"), 10))),
    // PKIndexSplitter analog: the even-doc_id partition serves exactly the
    // even-id matches
    "q_split_pk" -> ((s, dir) => idsOf(IndexCache.pkSearcher(s, dir), TermQ("data"))),

    // --- boolean algebra (BooleanQuery/ConjunctionScorer/DisjunctionSumScorer/ReqExclScorer)
    "q_bool_and" -> ((s, dir) => idsOf(searcher(s, dir),
      BoolQ(List(Occur.Must -> TermQ("vector"), Occur.Must -> TermQ("stream"))))),
    "q_bool_or_topk" -> ((s, dir) => ranked(searcher(s, dir).search(
      BoolQ(List(Occur.Should -> TermQ("vector"), Occur.Should -> TermQ("stream"))), 10))),
    // Explain ≡ Score gated (CheckHits.VerifyExplanation): for each top-10
    // hit of the OR query, the explanation tree's value must equal the
    // compiled score EXACTLY — ok=1 rides next to the oracle-ranked rows,
    // so any drift (or a non-match explanation) breaks the hash
    "q_explain_parity" -> ((s, dir) => {
      val se = searcher(s, dir)
      val q = BoolQ(List(Occur.Should -> TermQ("vector"), Occur.Should -> TermQ("stream")))
      val top = se.search(q, 10).collect() // (url, score, segmentId, docId)
      val rows = top.zipWithIndex.map { case (r, i) =>
        val ex = se.explain(q, r.getInt(2), r.getInt(3))
        val ok = ex.matched && ex.value == r.getDouble(1)
        (r.getString(0).drop(3).toLong, i + 1, if (ok) 1 else 0)
      }
      import s.implicits._
      rows.toSeq.toDF("doc_id", "rank", "ok").orderBy("rank")
    }),
    // ranked conjunction through the per-segment leapfrog path (Leapfrog.scala)
    "q_and_topk" -> ((s, dir) => ranked(searcher(s, dir).search(
      BoolQ(List(Occur.Must -> TermQ("vector"), Occur.Must -> TermQ("stream"))), 10))),
    "q_bool_not" -> ((s, dir) => idsOf(searcher(s, dir),
      BoolQ(List(Occur.Must -> TermQ("vector"), Occur.MustNot -> TermQ("stream"))))),
    "q_minsm" -> ((s, dir) => idsOf(searcher(s, dir),
      BoolQ(List(Occur.Should -> TermQ("vector"), Occur.Should -> TermQ("stream"),
        Occur.Should -> TermQ("window")), minShouldMatch = 2))),
    "q_dismax_topk" -> ((s, dir) => ranked(searcher(s, dir).search(
      DisMaxQ(List(TermQ("vector"), TermQ("stream")), 0.5f), 10))),

    // --- positional (PhraseQuery/ExactPhraseScorer)
    "q_phrase" -> ((s, dir) => idsOf(searcher(s, dir),
      PhraseQ(List("hash" -> 0, "join" -> 1)))),
    "q_phrase_topk" -> ((s, dir) => ranked(searcher(s, dir).search(
      PhraseQ(List("hash" -> 0, "join" -> 1)), 10))),

    // --- sloppy phrase through the gate (SloppyPhraseScorer: 2-term match
    //     iff |posB - posA - 1| <= slop; transposed order costs 2)
    "q_phrase_sloppy" -> ((s, dir) => idsOf(searcher(s, dir),
      PhraseQ(List("hash" -> 0, "join" -> 1), slop = 2))),

    // --- dictionary expansion (Prefix/Range/Wildcard/Fuzzy, MultiTermQuery)
    "q_prefix" -> ((s, dir) => idsOf(searcher(s, dir), PrefixQ("sp"))),
    "q_range" -> ((s, dir) => idsOf(searcher(s, dir),
      RangeQ("query", "sort", includeLo = true, includeHi = false))),
    "q_wildcard" -> ((s, dir) => idsOf(searcher(s, dir), WildcardQ("s?a*"))),
    // leading wildcard: candidate fetch via the dict_grams positional-bigram
    // index (required grams of the literal run), NOT a full dictionary scan
    "q_wildcard_lead" -> ((s, dir) => idsOf(searcher(s, dir), WildcardQ("*tion"))),
    "q_regexp" -> ((s, dir) => idsOf(searcher(s, dir), RegexpQ("st[aeiou]+.*"))),
    // Lucene's OWN RegExp dialect (Util/Automaton/RegExp.cs): operators the
    // Java dialect lacks — & intersection, ~ complement, <n-m> intervals
    "q_lucene_regexp" -> ((s, dir) =>
      idsOf(searcher(s, dir), LuceneRegexpQ("dat.&.{4}"))),
    // concatenated complement: la~(ne) keeps "late", drops "lane"
    "q_lucene_regexp_compl" -> ((s, dir) =>
      idsOf(IndexCache.luceneRegexSearcher(s, dir), LuceneRegexpQ("la~(ne)"))),
    // numeric interval: 7 ∈ [1,30] (even docs), 42 ∉ (odd docs)
    "q_lucene_regexp_interval" -> ((s, dir) =>
      idsOf(IndexCache.luceneRegexSearcher(s, dir), LuceneRegexpQ("<1-30>"))),
    // mandatory literals {st, eam} -> dict_grams candidate fetch, rlike verify
    "q_regexp_gram" -> ((s, dir) => idsOf(searcher(s, dir), RegexpQ("st.*eam.?"))),
    "q_fuzzy" -> ((s, dir) => idsOf(searcher(s, dir), FuzzyQ("joins", 1))),
    // the reference FuzzyQuery default: scored top-terms rewrite with
    // boost = 1 - ed/min(len), maxExpansions cap, term-ordered clauses
    "q_fuzzy_topk" -> ((s, dir) => ranked(searcher(s, dir).search(
      FuzzyTopQ("joins", 1, 50), 10))),

    // --- dictionary & stats (HighFreqTerms, CollectionStatistics)
    "q_dict" -> ((s, dir) => {
      searcher(s, dir).dictionary()
        .select(col("term"), col("df"), col("ttf"))
        .orderBy(desc("df"), asc("term")).limit(20)
    }),
    "q_stats" -> ((s, dir) => {
      val se = searcher(s, dir)
      val sdf = se.dictionary().agg(count(lit(1)).cast("long").as("n_terms"),
        sum("df").cast("long").as("sum_df"))
      sdf.withColumn("max_doc", lit(se.maxDoc))
        .withColumn("sum_ttf", lit(se.sumTotalTermFreq))
        .select("max_doc", "sum_ttf", "n_terms", "sum_df")
    }),
    "q_matchall_count" -> ((s, dir) => {
      import s.implicits._
      Seq(searcher(s, dir).count(MatchAllQ)).toDF("cnt")
    }),

    // --- MultiCollector analog (Search/MultiCollector.cs): several
    //     collectors fed by ONE scorer pass — here TotalHitCount + max-score
    //     as a single aggregation over the compiled hit stream
    "q_multi_collect" -> ((s, dir) =>
      searcher(s, dir).compile(TermQ("data"))
        .agg(count(lit(1)).as("cnt"), max(col("score")).as("max_s"))),

    // --- term vectors (TermVectorsConsumer / .tvd analog): one doc's
    //     doc-major (term, tf, positions) fetched without a postings scan
    "q_termvector" -> ((s, dir) => {
      val se = searcher(s, dir)
      se.termVectors
        .join(se.docs.select("segmentId", "docId", "url"), Seq("segmentId", "docId"))
        .filter(expr("cast(substring(url, 4) as bigint)") === 7)
        .select(col("term"), col("tf").cast("long").as("tf"),
          expr("array_join(positions, ',')").as("pos_list"))
        .orderBy("term")
    }),

    // --- early-terminating sorted collection over an index-SORTED,
    //     multi-segment index (EarlyTerminatingSortingCollector +
    //     Sorter.cs): per-segment heads only, merged on the sort key
    "q_sorted_limit" -> ((s, dir) =>
      Ranks.rankTopK(
        IndexCache.sortedSearcher(s, dir).sortedTopK(10)
          .select(expr("cast(substring(url, 4) as bigint)").as("doc_id"),
            col("sortKey").cast("long").as("n_chars")),
        10, Seq(col("n_chars").asc, col("doc_id").asc))),
    "q_sorted_early" -> ((s, dir) =>
      Ranks.rankTopK(
        IndexCache.sortedSearcher(s, dir).searchSortedEarly(TermQ("data"), 10)
          .select(expr("cast(substring(url, 4) as bigint)").as("doc_id"),
            col("sortKey").cast("long").as("n_chars")),
        10, Seq(col("n_chars").asc, col("doc_id").asc))),

    // same early-terminated sorted collection AFTER a distributed sorted
    // merge of the 4 segments (salted-shuffle path forced): the merge must
    // preserve (sortKey, url) doc order exactly
    "q_sorted_merged_topk" -> ((s, dir) =>
      Ranks.rankTopK(
        IndexCache.sortedMergedSearcher(s, dir).searchSortedEarly(TermQ("data"), 10)
          .select(expr("cast(substring(url, 4) as bigint)").as("doc_id"),
            col("sortKey").cast("long").as("n_chars")),
        10, Seq(col("n_chars").asc, col("doc_id").asc))),

    // --- time-limited collection (TimeLimitingCollector tick-clock analog):
    //     unlimited budget == plain top-k; budget 1 == first doc collected
    //     before the clock fires, with the partial-result flag surfaced
    "q_timelimit_topk" -> ((s, dir) =>
      ranked(searcher(s, dir).searchTimeLimited(TermQ("data"), 10, Long.MaxValue)._1)),
    "q_timelimit_partial" -> ((s, dir) => {
      val (df, timedOut) = searcher(s, dir).searchTimeLimited(TermQ("data"), 10, 1)
      df.select(expr("cast(substring(url, 4) as bigint)").as("doc_id"))
        .withColumn("timed_out", lit(timedOut))
    }),

    // --- caching collector (CachingCollector.cs): ONE scored pass, two
    //     replayed collectors (total count + top-k) off the pinned stream
    "q_cached_replay" -> ((s, dir) => {
      val se = searcher(s, dir)
      val c = se.cacheHits(TermQ("vector"))
      val total = c.replay(_.count())
      val top = c.replay(ds =>
        ds.orderBy(col("score").desc, col("segmentId").asc, col("docId").asc).limit(10))
        .join(se.docs.select("segmentId", "docId", "url"), Seq("segmentId", "docId"))
        .select(col("url"), col("score"), col("segmentId"), col("docId"))
      val out = ranked(top).withColumn("total", lit(total))
      out.collect() // materialize before releasing the pinned stream
      c.release()
      out
    }),

    // --- MultiFieldQueryParser (Classic/MultiFieldQueryParser.cs): unscoped
    //     words search ALL fields, each copy analyzed per field
    "q_multifield_parsed" -> ((s, dir) => {
      val q = MultiFieldQueryParser.parse("en data",
        Seq("text" -> graft.analysis.Analyzers.byName("simple"),
          "lang" -> graft.analysis.Analyzers.byName("keyword")))
      ranked(IndexCache.fieldedSearcher(s, dir).search(q, 10))
    }),

    // --- streaming appends through the gate (StreamingIndexer band ids +
    //     cross-band reads): batch + streamed halves answer as one index
    "q_streamed_docs" -> ((s, dir) =>
      idsOf(IndexCache.streamedSearcher(s, dir), TermQ("data"))),
    "q_streamed_count" -> ((s, dir) => {
      import s.implicits._
      Seq(IndexCache.streamedSearcher(s, dir).count(MatchAllQ)).toDF("cnt")
    }),

    // --- AnalyzingSuggester (Suggest/Analyzing/AnalyzingSuggester.cs):
    //     completion matches the ANALYZED form, returns the SURFACE form —
    //     "Runs" stems to "run" and completes "Running Systems ..." (a raw
    //     character-prefix suggester matches nothing here)
    "q_suggest_analyzing" -> ((s, dir) => {
      val sugg = s.read.parquet(s"$dir/documents.parquet").select(
        concat(when(col("doc_id") % 2 === 0, "Running Systems ").otherwise("Walking Paths "),
          col("doc_id").cast("string")).as("surface"),
        ((col("doc_id") * 37) % 101).as("weight"))
      Suggest.completeAnalyzed(sugg, "surface", "weight", "english_snowball", "Runs", 5)
    }),

    // --- DirectSpellChecker with the JaroWinklerDistance option
    //     (Spell/JaroWinklerDistance.cs; DuckDB's jaro_winkler_similarity
    //     is formula-identical on this fixture — verified exhaustively)
    "q_spell_jw" -> ((s, dir) => {
      val dict = s.read.parquet(s"$dir/documents.parquet")
        .select(concat(lit("jw"), (col("doc_id") % 40).cast("string")).as("term"))
        .groupBy("term").agg(count(lit(1)).as("df"))
      StringDistances.suggestScored(dict, "jw1x", 2, 5, "jarowinkler")
        .select(col("term"), round(col("score"), 4).as("score"), col("rank"))
        .orderBy("rank")
    }),

    // DirectSpellChecker's own scoring distance: Damerau/transposition edit
    // distance normalized 1 - dist/min(len) (LuceneLevenshteinDistance.cs)
    "q_spell_lucenelev" -> ((s, dir) => {
      val dict = s.read.parquet(s"$dir/documents.parquet")
        .select(concat(lit("lv"), (col("doc_id") % 40).cast("string")).as("term"))
        .groupBy("term").agg(count(lit(1)).as("df"))
      StringDistances.suggestScored(dict, "lv1x", 2, 5, "lucenelevenshtein")
        .select(col("term"), round(col("score"), 4).as("score"), col("rank"))
        .orderBy("rank")
    }),

    // --- PostingsHighlighter (Postingshighlight/PostingsHighlighter.cs):
    //     passage offsets come from the postings' OFFSET stream
    //     (IndexOptions ..._AND_OFFSETS) — no term vectors, no re-analysis
    "q_postings_highlight" -> ((s, dir) => {
      val se = IndexCache.offsetsSearcher(s, dir)
      Highlighter.postingsSnippet(se, IndexCache.offsetsFixturePages(s, dir),
          "url", "text", Seq("target"), 12)
        .select(expr("cast(substring(url, 4) as bigint)").as("doc_id"), col("snippet"))
        .orderBy("doc_id")
    }),

    // --- FastVectorHighlighter PHRASE semantics (contrib/
    //     FastVectorHighlighter/FieldPhraseList.cs): only COMPLETE
    //     consecutive-position phrase matches highlight — terms-apart and
    //     reversed docs yield nothing; the best fragment is the window
    //     holding the most complete matches (two, here), not the earliest
    "q_fvh_phrase" -> ((s, dir) => {
      val se = IndexCache.fvhSearcher(s, dir)
      Highlighter.phraseVectorSnippet(se, IndexCache.fvhFixturePages(s, dir),
          "url", "text", Seq("alpha", "beta"), 21)
        .select(expr("cast(substring(url, 4) as bigint)").as("doc_id"), col("snippet"))
        .orderBy("doc_id")
    }),

    // --- NRT refresh (Search/SearcherManager.cs MaybeRefresh): the served
    //     reader came from the SAME manager across build -> query -> append
    //     + delete -> refresh (IndexCache.nrtSearcher asserts the refresh
    //     transitions); outputs are the post-refresh view
    "q_nrt_docs" -> ((s, dir) =>
      idsOf(IndexCache.nrtSearcher(s, dir), TermQ("data"))),
    "q_nrt_count" -> ((s, dir) => {
      import s.implicits._
      Seq(IndexCache.nrtSearcher(s, dir).count(MatchAllQ)).toDF("cnt")
    }),

    // --- JoinUtil with a ScoreMode (Join/JoinUtil.cs:18-67 CreateJoinQuery):
    //     from-side BM25 scores aggregate (Max mode) onto to-side docs
    //     through the join field — the scored query-time join
    "q_join_score" -> ((s, dir) => {
      val se = searcher(s, dir)
      val docsTbl = s.read.parquet(s"$dir/documents.parquet")
      val fromScores = se.compile(TermQ("vector"))
        .join(se.docs.select("segmentId", "docId", "url"), Seq("segmentId", "docId"))
        .withColumn("doc_id", expr("cast(substring(url, 4) as bigint)"))
        .join(docsTbl.select("doc_id", "source"), "doc_id")
        .groupBy("source").agg(max("score").as("js"))
      val to = docsTbl.select(col("doc_id"), col("source"))
        .join(broadcast(fromScores), "source")
      Ranks.rankTopK(to.select(col("doc_id"), col("js")), 15,
          Seq(col("js").desc, col("doc_id").asc))
        .select("doc_id", "rank")
    }),

    // --- AllGroupsCollector (Grouping/AbstractAllGroupsCollector.cs):
    //     the number of distinct groups among a query's matches
    "q_group_all" -> ((s, dir) => {
      val se = searcher(s, dir)
      val docsTbl = s.read.parquet(s"$dir/documents.parquet")
      se.compile(TermQ("vector"))
        .join(se.docs.select("segmentId", "docId", "url"), Seq("segmentId", "docId"))
        .withColumn("doc_id", expr("cast(substring(url, 4) as bigint)"))
        .join(docsTbl.select("doc_id", "source"), "doc_id")
        .agg(countDistinct("source").as("groups"))
    }),

    // --- DistinctValuesCollector (Grouping/Term/TermDistinctValuesCollector
    //     .cs): per group, the count of distinct values of a second field
    //     among the matches
    "q_group_distinct" -> ((s, dir) => {
      val se = searcher(s, dir)
      val docsTbl = s.read.parquet(s"$dir/documents.parquet")
      se.compile(TermQ("vector"))
        .join(se.docs.select("segmentId", "docId", "url"), Seq("segmentId", "docId"))
        .withColumn("doc_id", expr("cast(substring(url, 4) as bigint)"))
        .join(docsTbl.select("doc_id", "source", "lang"), "doc_id")
        .groupBy("source").agg(countDistinct("lang").as("nlang"))
        .orderBy("source")
    }),

    // --- per-language analyzers (Analysis/De, Analysis/Fr): German light
    //     stemming + stop gaps; French elision + minimal stemming
    "q_lang_de" -> ((s, dir) =>
      idsOf(IndexCache.deSearcher(s, dir), TermQ("feld"))),
    // Snowball English (Porter2): running -> run on even docs only
    "q_lang_en2" -> ((s, dir) =>
      idsOf(IndexCache.en2Searcher(s, dir), TermQ("run"))),
    // data@1 .. system@4: the exact gap over the stopped "of" + the
    // variant slot proves Porter2 positions ride the stop-gap contract
    "q_lang_en2_phrase" -> ((s, dir) =>
      idsOf(IndexCache.en2Searcher(s, dir), PhraseQ(List("data" -> 0, "system" -> 3)))),
    // Dutch Snowball: katten -> kat everywhere; straten -> strat on odd docs
    "q_lang_nl" -> ((s, dir) =>
      idsOf(IndexCache.nlSearcher(s, dir), TermQ("strat"))),
    // Swedish Snowball: flickorna -> flick on even docs
    "q_lang_sv" -> ((s, dir) =>
      idsOf(IndexCache.svSearcher(s, dir), TermQ("flick"))),
    // Russian Snowball: красивая -> красив on even docs
    "q_lang_ru" -> ((s, dir) =>
      idsOf(IndexCache.ruSearcher(s, dir), TermQ("красив"))),
    // Danish Snowball: bilerne -> bil on even docs
    "q_lang_da" -> ((s, dir) =>
      idsOf(IndexCache.daSearcher(s, dir), TermQ("bil"))),
    // Norwegian Snowball: guttane -> gutt on even docs
    "q_lang_no" -> ((s, dir) =>
      idsOf(IndexCache.noSearcher(s, dir), TermQ("gutt"))),
    // CJK bigrams: 系统 exists only where the even-parity run produced it
    "q_lang_cjk" -> ((s, dir) =>
      idsOf(IndexCache.cjkSearcher(s, dir), TermQ("系统"))),
    // bigram positions + the stopped-'the' gap: 数据@0 .. engine@4 everywhere
    "q_lang_cjk_phrase" -> ((s, dir) =>
      idsOf(IndexCache.cjkSearcher(s, dir), PhraseQ(List("数据" -> 0, "engine" -> 4)))),

    // --- generic filter catalog under the gate (Shingle/NGram/Synonym/
    //     Porter/ASCIIFolding/Phonetic chains — Analysis.Common catalog)
    "q_filter_shingle" -> ((s, dir) =>
      idsOf(IndexCache.shingleSearcher(s, dir), TermQ("beta gamma"))),
    "q_filter_ngram" -> ((s, dir) =>
      idsOf(IndexCache.ngramSearcher(s, dir), TermQ("bcd"))),
    // NGramPhraseQuery rewrite over the CJK bigram chain (the gram
    // TOKENIZER case the reference optimizes — consecutive positions):
    // "数据 据系 系统" keeps 数据@0 + 系统@2, dropping the middle bigram's
    // posting list; same doc set (even docs)
    "q_ngram_phrase" -> ((s, dir) => {
      val full = PhraseQ(List("数据" -> 0, "据系" -> 1, "系统" -> 2))
      val opt = Query.ngramPhrase(2, full)
      require(opt.terms == List("数据" -> 0, "系统" -> 2), s"rewrite shape: $opt")
      idsOf(IndexCache.cjkSearcher(s, dir), opt)
    }),
    // the injected synonym must sit at the SOURCE position (posIncr = 0):
    // phrase quick->engine with the source gap proves it
    "q_filter_synonym" -> ((s, dir) =>
      idsOf(IndexCache.synonymSearcher(s, dir), PhraseQ(List("quick" -> 0, "engine" -> 1)))),
    "q_filter_porter" -> ((s, dir) =>
      idsOf(IndexCache.porterSearcher(s, dir), TermQ("run"))),
    "q_filter_ascii" -> ((s, dir) =>
      idsOf(IndexCache.asciiSearcher(s, dir), TermQ("zurich"))),
    "q_filter_soundex" -> ((s, dir) =>
      idsOf(IndexCache.soundexSearcher(s, dir), TermQ("R163"))),
    // case-change split parts occupy CONSECUTIVE positions: power@0 shot@1
    "q_filter_worddelim" -> ((s, dir) =>
      idsOf(IndexCache.wordDelimSearcher(s, dir), PhraseQ(List("power" -> 0, "shot" -> 1)))),
    // numeric part present in BOTH variants, shifted to position 2
    "q_filter_worddelim_num" -> ((s, dir) =>
      idsOf(IndexCache.wordDelimSearcher(s, dir), PhraseQ(List("500" -> 0, "zoom" -> 1)))),
    "q_filter_edge" -> ((s, dir) =>
      idsOf(IndexCache.edgeSearcher(s, dir), TermQ("dat"))),
    "q_filter_commongrams" -> ((s, dir) =>
      idsOf(IndexCache.commonGramsSearcher(s, dir), TermQ("the_engine"))),
    // decompounded part rides at the SOURCE position (posIncr 0): the
    // phrase original->heute still holds, and "ball" matches even docs
    "q_filter_compound" -> ((s, dir) =>
      idsOf(IndexCache.compoundSearcher(s, dir), TermQ("ball"))),
    "q_filter_compound_phrase" -> ((s, dir) =>
      idsOf(IndexCache.compoundSearcher(s, dir), PhraseQ(List("spiel" -> 0, "heute" -> 1)))),
    // --- second analyzer-catalog wave: each term exists only through the
    //     language chain's stem/normalize rules on even docs
    "q_lang_fi" -> ((s, dir) => idsOf(IndexCache.fiSearcher(s, dir), TermQ("talo"))),
    // full-Snowball stop sets are LIVE: "welche"/"vaikka" (absent from the
    // 3.x contrib cores) must vanish in the chain — if either survived the
    // stop filter its stem would match every fixture doc and the empty
    // oracle would fail
    "q_lang_de_stop" -> ((s, dir) => {
      val se = IndexCache.deSearcher(s, dir)
      graft.analysis.Analyzers.byName("german").tokenize("welche")
        .map(_.term).toList match {
        case Nil => idsOf(se, TermQ("zz_never_indexed"))
        case t :: _ => idsOf(se, TermQ(t))
      }
    }),
    "q_lang_fi_stop" -> ((s, dir) => {
      val se = IndexCache.fiSearcher(s, dir)
      graft.analysis.Analyzers.byName("finnish").tokenize("vaikka")
        .map(_.term).toList match {
        case Nil => idsOf(se, TermQ("zz_never_indexed"))
        case t :: _ => idsOf(se, TermQ(t))
      }
    }),
    // completed stop lists are LIVE (each fixture text CONTAINS the probe
    // word, so a survivor would match every doc and fail the empty oracle):
    // Arabic = full in-tree contrib list ("سنوات"), Greek = full in-tree
    // GREEK_STOP_WORDS ("εκείνος"), Thai/Bulgarian/Hindi/Persian/Sorani =
    // reconstructed published lists
    // full contrib Snowball programs (SnowballAnalyzer dispatch): each stem
    // exists only through the full program, not the analyzer-default light
    // stems
    "q_lang_de_sb" -> ((s, dir) => idsOf(IndexCache.deSbSearcher(s, dir), TermQ("haus"))),
    "q_lang_de2_sb" -> ((s, dir) => idsOf(IndexCache.de2SbSearcher(s, dir), TermQ("haus"))),
    "q_lang_es_sb" -> ((s, dir) => idsOf(IndexCache.esSbSearcher(s, dir), TermQ("cancion"))),
    "q_lang_it_sb" -> ((s, dir) => idsOf(IndexCache.itSbSearcher(s, dir), TermQ("abbandon"))),
    "q_lang_pt_sb" -> ((s, dir) => idsOf(IndexCache.ptSbSearcher(s, dir), TermQ("primeir"))),
    "q_lang_fr_sb" -> ((s, dir) => idsOf(IndexCache.frSbSearcher(s, dir), TermQ("don"))),
    "q_lang_porter_sb" -> ((s, dir) => idsOf(IndexCache.porterSbSearcher(s, dir), TermQ("hop"))),
    "q_lang_lovins_sb" -> ((s, dir) => idsOf(IndexCache.lovinsSbSearcher(s, dir), TermQ("belief"))),
    "q_lang_kp_sb" -> ((s, dir) => idsOf(IndexCache.kpSbSearcher(s, dir), TermQ("loop"))),
    "q_lang_ar_stop" -> ((s, dir) => stopProof(IndexCache.arSearcher(s, dir), "arabic", "سنوات")),
    "q_lang_el_stop" -> ((s, dir) => stopProof(IndexCache.elSearcher(s, dir), "greek", "εκείνος")),
    "q_lang_th_stop" -> ((s, dir) => stopProof(IndexCache.thSearcher(s, dir), "thai", "เพื่อ")),
    "q_lang_bg_stop" -> ((s, dir) => stopProof(IndexCache.bgSearcher(s, dir), "bulgarian", "обаче")),
    "q_lang_hi_stop" -> ((s, dir) => stopProof(IndexCache.hiSearcher(s, dir), "hindi", "लेकिन")),
    "q_lang_fa_stop" -> ((s, dir) => stopProof(IndexCache.faSearcher(s, dir), "persian", "درباره")),
    "q_lang_ckb_stop" -> ((s, dir) => stopProof(IndexCache.ckbSearcher(s, dir), "sorani", "چونکە")),
    "q_lang_hu" -> ((s, dir) => idsOf(IndexCache.huSearcher(s, dir), TermQ("ház"))),
    "q_lang_hu_light" -> ((s, dir) => idsOf(IndexCache.huLightSearcher(s, dir), TermQ("haz"))),
    "q_lang_cs" -> ((s, dir) => idsOf(IndexCache.csSearcher(s, dir), TermQ("student"))),
    "q_lang_bg" -> ((s, dir) => idsOf(IndexCache.bgSearcher(s, dir), TermQ("град"))),
    "q_lang_hi" -> ((s, dir) => idsOf(IndexCache.hiSearcher(s, dir), TermQ("किताब"))),
    "q_lang_ar" -> ((s, dir) => idsOf(IndexCache.arSearcher(s, dir), TermQ("كتاب"))),
    "q_lang_fa" -> ((s, dir) => idsOf(IndexCache.faSearcher(s, dir), TermQ("كتابي"))),
    "q_lang_id" -> ((s, dir) => idsOf(IndexCache.idSearcher(s, dir), TermQ("baca"))),
    "q_lang_ckb" -> ((s, dir) => idsOf(IndexCache.ckbSearcher(s, dir), TermQ("پیاو"))),
    "q_lang_el" -> ((s, dir) => idsOf(IndexCache.elSearcher(s, dir), TermQ("υπολογιστ"))),
    "q_lang_ro" -> ((s, dir) => idsOf(IndexCache.roSearcher(s, dir), TermQ("studenţ"))),
    // the segmented pieces sit at CONSECUTIVE positions: phrase proof
    "q_lang_th" -> ((s, dir) =>
      idsOf(IndexCache.thSearcher(s, dir), PhraseQ(List("ภาษา" -> 0, "ไทย" -> 1)))),
    // the stopped connective's position gap survives the Finnish chain:
    // talo@0 .. vesi@2 ("ja"@1 stopped; Snowball keeps the final i)
    "q_lang_fi_phrase" -> ((s, dir) =>
      idsOf(IndexCache.fiSearcher(s, dir), PhraseQ(List("talo" -> 0, "vesi" -> 2)))),
    // FinnishLightStemFilter variant: kirjassa -> kirj (Savoy light rules)
    "q_lang_fi_light" -> ((s, dir) =>
      idsOf(IndexCache.fiLightSearcher(s, dir), TermQ("kirj"))),
    // --- third analyzer-catalog wave: Lv/Br/Gl/Ga/Tr/Ca/Eu/Hy
    "q_lang_lv" -> ((s, dir) => idsOf(IndexCache.lvSearcher(s, dir), TermQ("cel"))),
    "q_lang_br" -> ((s, dir) => idsOf(IndexCache.brSearcher(s, dir), TermQ("menin"))),
    // menin@0 .. trabalh@2: gap over the stopped "de" must be exact
    "q_lang_br_phrase" -> ((s, dir) =>
      idsOf(IndexCache.brSearcher(s, dir), PhraseQ(List("menin" -> 0, "trabalh" -> 2)))),
    "q_lang_gl" -> ((s, dir) => idsOf(IndexCache.glSearcher(s, dir), TermQ("traballador"))),
    "q_lang_gl_min" -> ((s, dir) => idsOf(IndexCache.glMinSearcher(s, dir), TermQ("camión"))),
    // nAthair -> IrishLowerCaseFilter n-athair -> initial-mutation undo
    "q_lang_ga" -> ((s, dir) => idsOf(IndexCache.gaSearcher(s, dir), TermQ("athair"))),
    // -íocht derivational strip reaches every doc
    "q_lang_ga_deriv" -> ((s, dir) => idsOf(IndexCache.gaSearcher(s, dir), TermQ("fil"))),
    // İstanbul'da -> ApostropheFilter + TurkishLowerCaseFilter (İ->i)
    "q_lang_tr" -> ((s, dir) => idsOf(IndexCache.trSearcher(s, dir), TermQ("istanbul"))),
    // kitapları -> Snowball Turkish noun-suffix chain, every doc
    "q_lang_tr_stem" -> ((s, dir) => idsOf(IndexCache.trSearcher(s, dir), TermQ("kitap"))),
    "q_lang_ca" -> ((s, dir) => idsOf(IndexCache.caSearcher(s, dir), TermQ("catalan"))),
    // l'aigua -> elision -> residual-vowel strip, every doc
    "q_lang_ca_elision" -> ((s, dir) => idsOf(IndexCache.caSearcher(s, dir), TermQ("aigu"))),
    "q_lang_eu" -> ((s, dir) => idsOf(IndexCache.euSearcher(s, dir), TermQ("etxe"))),
    "q_lang_hy" -> ((s, dir) => idsOf(IndexCache.hySearcher(s, dir), TermQ("գրքեր"))),
    "q_lang_zh" -> ((s, dir) => idsOf(IndexCache.zhSearcher(s, dir), TermQ("数"))),
    // ChineseFilter leaves NO gap at the dropped "the": 据@1 模@2 adjacent
    "q_lang_zh_nogap" -> ((s, dir) =>
      idsOf(IndexCache.zhSearcher(s, dir), PhraseQ(List("据" -> 0, "模" -> 1)))),
    // --- char-filter / generic tokenizer wave
    // variant word inside <h1> markup reaches the index
    "q_html_strip" -> ((s, dir) => idsOf(IndexCache.htmlSearcher(s, dir), TermQ("alpha"))),
    // caf&eacute; decodes to café on every doc; script content never indexes
    "q_html_entity" -> ((s, dir) => idsOf(IndexCache.htmlSearcher(s, dir), TermQ("café"))),
    "q_html_script" -> ((s, dir) =>
      idsOf(IndexCache.htmlSearcher(s, dir),
        BoolQ(List(Occur.Must -> TermQ("corpus"), Occur.MustNot -> TermQ("hidden"))))),
    "q_charfilter_map" -> ((s, dir) => idsOf(IndexCache.mapcfSearcher(s, dir), TermQ("foto"))),
    "q_charfilter_patrep" -> ((s, dir) =>
      idsOf(IndexCache.patrepSearcher(s, dir), TermQ("123456"))),
    "q_path_hier" -> ((s, dir) => idsOf(IndexCache.pathSearcher(s, dir), TermQ("/usr/share"))),
    "q_path_hier_full" -> ((s, dir) =>
      idsOf(IndexCache.pathSearcher(s, dir), TermQ("/var/log/app"))),
    "q_path_rev" -> ((s, dir) => idsOf(IndexCache.pathRevSearcher(s, dir), TermQ("share/docs"))),
    "q_pattern_tok" -> ((s, dir) => idsOf(IndexCache.csvSearcher(s, dir), TermQ("beta"))),
    "q_scandinavian" -> ((s, dir) =>
      idsOf(IndexCache.scandSearcher(s, dir), TermQ("raksmorgas"))),
    "q_hyphenated" -> ((s, dir) => idsOf(IndexCache.hyphSearcher(s, dir), TermQ("ecological"))),
    // the joined token closes the position gap: ecological@0 disaster@1
    "q_hyphenated_phrase" -> ((s, dir) =>
      idsOf(IndexCache.hyphSearcher(s, dir),
        PhraseQ(List("ecological" -> 0, "disaster" -> 1)))),
    // KeywordRepeat: surface AND stem both live at position 0
    "q_keyword_repeat" -> ((s, dir) =>
      idsOf(IndexCache.repeatSearcher(s, dir),
        BoolQ(List(Occur.Must -> TermQ("running"), Occur.Must -> TermQ("run"))))),
    "q_stemmer_override" -> ((s, dir) =>
      idsOf(IndexCache.overrideSearcher(s, dir), TermQ("sprint"))),
    // WikipediaTokenizer: word inside [[internal link]] markup is searchable
    "q_wiki_link" -> ((s, dir) => idsOf(IndexCache.wikiSearcher(s, dir), TermQ("alpha"))),
    // ==heading== words keep adjacent positions: solar@_ power@_+1
    "q_wiki_heading" -> ((s, dir) =>
      idsOf(IndexCache.wikiSearcher(s, dir), PhraseQ(List("solar" -> 0, "power" -> 1)))),
    // [http://url label]: the URL is ONE token typed elu
    "q_wiki_url" -> ((s, dir) =>
      idsOf(IndexCache.wikiSearcher(s, dir), TermQ("http://example.com/a"))),
    // UNTOKENIZED_ONLY: the whole link / category collapses to one term
    "q_wiki_collapsed" -> ((s, dir) =>
      idsOf(IndexCache.wikiUntokSearcher(s, dir), TermQ("alpha beta"))),
    "q_wiki_category" -> ((s, dir) =>
      idsOf(IndexCache.wikiUntokSearcher(s, dir), TermQ("science fiction"))),
    // UAX29URLEmail: a full email / URL is ONE searchable token
    "q_uax_email" -> ((s, dir) =>
      idsOf(IndexCache.uaxSearcher(s, dir), TermQ("bob@example.org"))),
    "q_uax_url" -> ((s, dir) =>
      idsOf(IndexCache.uaxSearcher(s, dir), TermQ("https://example.com/a?x=1"))),
    // Hunspell: "rewalked" stems to the dictionary form "walk"
    "q_hunspell" -> ((s, dir) => idsOf(IndexCache.hunspellSearcher(s, dir), TermQ("walk"))),
    "q_hunspell_try" -> ((s, dir) =>
      idsOf(IndexCache.hunspellSearcher(s, dir), TermQ("try"))),
    // ICONV: input ß-spelling indexes under the converted ss-form
    "q_hunspell_iconv" -> ((s, dir) =>
      idsOf(IndexCache.hunspellIconvSearcher(s, dir), TermQ("fussball"))),
    // CIRCUMFIX: ge-…-t pair strips to the root (either half alone would not)
    "q_hunspell_circumfix" -> ((s, dir) =>
      idsOf(IndexCache.hunspellIconvSearcher(s, dir), TermQ("lauf"))),
    // HyphenationCompound: a compound is searchable by its hyphen-cut part
    "q_hyph_compound" -> ((s, dir) =>
      idsOf(IndexCache.hyphCompoundSearcher(s, dir), TermQ("spiel"))),
    "q_hyph_compound_part" -> ((s, dir) =>
      idsOf(IndexCache.hyphCompoundSearcher(s, dir), TermQ("regen"))),
    // KStem: "dying" reaches the index as its direct-conflation root "die"
    "q_kstem" -> ((s, dir) => idsOf(IndexCache.kstemSearcher(s, dir), TermQ("die"))),
    // "tried" -> "try" (-ied rule + dictionary), "running" -> "run" (doubled C)
    "q_kstem_try" -> ((s, dir) => idsOf(IndexCache.kstemSearcher(s, dir), TermQ("try"))),
    "q_kstem_dict" -> ((s, dir) => idsOf(IndexCache.kstemSearcher(s, dir), TermQ("run"))),
    // dictionary-gated derivational rules reachable only via the full
    // head-word lexicon: brightness -> bright (-ness), announcement ->
    // announce (-ment) — the ~300-word rule core lacks both roots
    "q_kstem_ness" -> ((s, dir) => idsOf(IndexCache.kstemSearcher(s, dir), TermQ("bright"))),
    "q_kstem_ment" -> ((s, dir) => idsOf(IndexCache.kstemSearcher(s, dir), TermQ("announce"))),
    // EnglishMinimalStem: cats -> cat (plural-only)
    "q_en_minimal" -> ((s, dir) => idsOf(IndexCache.enMinimalSearcher(s, dir), TermQ("cat"))),
    // EnglishPossessive: Bob’s (U+2019) -> bob
    "q_en_possessive" -> ((s, dir) =>
      idsOf(IndexCache.enPossessiveSearcher(s, dir), TermQ("bob"))),
    // SuggestStopFilter: the trailing "the" (no separator after it) is KEPT
    // as the prefix token, so it completes to "theory"
    "q_suggest_stop" -> ((s, dir) => {
      val sugg = s.read.parquet(s"$dir/documents.parquet").select(
        concat(when(col("doc_id") % 2 === 0, "find theory ").otherwise("find path "),
          col("doc_id").cast("string")).as("surface"),
        ((col("doc_id") * 37) % 101).as("weight"))
      Suggest.completeSuggestStop(sugg, "surface", "weight", "find the", 5)
    }),
    // Bloom postings format: term query over a bloom-built 4-segment index
    // (driver-side segment pruning; results must be bloom-invisible)
    "q_bloom_term" -> ((s, dir) => idsOf(IndexCache.bloomSearcher(s, dir), TermQ("needle"))),
    // BlendedInfixSuggester: infix completions re-ranked by first-match
    // token position (reciprocal blender), score = (weight * coef) as long
    "q_suggest_blended" -> ((s, dir) => {
      val sugg = s.read.parquet(s"$dir/documents.parquet").select(
        concat(when(col("doc_id") % 2 === 0, "alpha data systems ").otherwise("data alpha tools "),
          col("doc_id").cast("string")).as("surface"),
        ((col("doc_id") * 37) % 101).as("weight"))
      Suggest.completeBlendedInfix(sugg, "surface", "weight", "data", 5, reciprocal = true)
    }),

    "q_lang_de_phrase" -> ((s, dir) =>
      // haus@1 .. gart@3: the gap over the stopped "und" must be exact
      idsOf(IndexCache.deSearcher(s, dir), PhraseQ(List("haus" -> 0, "gart" -> 2)))),
    "q_lang_fr" -> ((s, dir) =>
      idsOf(IndexCache.frSearcher(s, dir),
        BoolQ(List(Occur.Must -> TermQ("histoir"), Occur.Must -> TermQ("cheval"))))),
    "q_lang_es" -> ((s, dir) =>
      idsOf(IndexCache.esSearcher(s, dir), TermQ("camp"))),
    "q_lang_es_phrase" -> ((s, dir) =>
      // cas@1 .. jardin@3: the gap over the stopped "y" must be exact
      idsOf(IndexCache.esSearcher(s, dir), PhraseQ(List("cas" -> 0, "jardin" -> 2)))),
    "q_lang_it" -> ((s, dir) =>
      // elided dell'arte -> arte must land at position 5 next to giardin@4
      idsOf(IndexCache.itSearcher(s, dir),
        BoolQ(List(Occur.Must -> TermQ("fioritur"),
          Occur.Must -> SpanMatchQ(SpanNearS(
            List(SpanTermS("giardin"), SpanTermS("arte")), 0, inOrder = true)))))),
    "q_lang_pt" -> ((s, dir) =>
      idsOf(IndexCache.ptSearcher(s, dir),
        BoolQ(List(Occur.Must -> TermQ("flor"), Occur.Must -> TermQ("jardim"))))),
    // --- AnalyzingQueryParser (QueryParser/Analyzing/): `Häus*` analyzes
    //     its chunk through the German chain (-> haus) so the prefix hits
    //     the normalized+stemmed dictionary — the classic parser's raw
    //     `häus` prefix would match nothing
    "q_analyzing_parsed" -> ((s, dir) =>
      idsOf(IndexCache.deSearcher(s, dir), AnalyzingQueryParser.parse(
        "Häus*", graft.analysis.Analyzers.byName("german")))),

    // --- percolation (MemoryIndex.cs: one single-doc index per incoming
    //     doc, matched against broadcast stored queries)
    "q_percolate" -> ((s, dir) =>
      graft.pipeline.Percolator.percolate(
        s.read.parquet(s"$dir/documents.parquet"), "doc_id", "text",
        Seq(
          "p_term" -> TermQ("data"),
          "p_and" -> BoolQ(List(Occur.Must -> TermQ("vector"), Occur.Must -> TermQ("stream"))),
          "p_phrase" -> PhraseQ(List("hash" -> 0, "join" -> 1)),
          "p_prefix" -> PrefixQ("st")),
        "simple")
        .orderBy("doc_id", "query_id")),

    // --- classification (Lucene.Net.Classification): NB class ranking and
    //     KNN majority vote over the labeled documents table
    "q_classify_nb" -> ((s, dir) =>
      graft.pipeline.Classify.naiveBayes(
        s.read.parquet(s"$dir/documents.parquet"), "text", "lang",
        "data stream engine")),
    // DatasetSplitter: train/test/cv assignment from the sequential
    // quota-writer loop's closed form over the global doc position
    "q_dataset_split" -> ((s, dir) =>
      graft.pipeline.Classify.splitDataset(
          s.read.parquet(s"$dir/documents.parquet").select("doc_id"),
          Seq(col("doc_id")), 0.2, 0.1)
        .select(col("doc_id"), col("split")).orderBy("doc_id")),
    "q_classify_knn" -> ((s, dir) => {
      val labels = s.read.parquet(s"$dir/documents.parquet")
        .select(format_string("doc%09d", col("doc_id")).as("url"), col("lang").as("cls"))
      graft.pipeline.Classify.knn(searcher(s, dir), labels, "data stream engine", 25)
    }),

    // --- parsed query end-to-end (QueryParser §3.3)
    "q_parsed_topk" -> ((s, dir) => {
      val se = searcher(s, dir)
      ranked(se.search(QueryParser.parse("+vector stream -\"hash join\"", se.analyzer), 10))
    }),

    // --- SimpleQueryParser dialect (QueryParser/Simple/SimpleQueryParser.cs):
    //     `+` AND, `|` OR, left-fold tree building — (vector AND stream) OR data
    "q_simple_parsed" -> ((s, dir) => {
      val se = searcher(s, dir)
      idsOf(se, SimpleQueryParser.parse("vector + stream | data", se.analyzer))
    }),

    // --- ComplexPhraseQueryParser (QueryParser/ComplexPhrase/): a phrase
    //     with an embedded prefix — span-near(data, or(que*-terms), 0, ordered)
    "q_complex_phrase" -> ((s, dir) => {
      val se = searcher(s, dir)
      idsOf(se, ComplexPhraseParser.parse("\"data que*\"", se.analyzer, se))
    }),

    // --- surround dialect (QueryParser/Surround/): prefix-form unordered
    //     distance operator, window 4
    "q_surround" -> ((s, dir) => {
      val se = searcher(s, dir)
      idsOf(se, SurroundParser.parse("4n(data, stream)", se))
    }),

    // --- PrecedenceQueryParser (QueryParser/Flexible/Precedence/): AND binds
    //     tighter than OR — (vector AND stream) OR (hash AND join), where the
    //     classic parser would flatten to all-four-MUST
    "q_precedence_parsed" -> ((s, dir) => {
      val se = searcher(s, dir)
      idsOf(se, PrecedenceQueryParser.parse("vector AND stream OR hash AND join", se.analyzer))
    }),

    // --- ExtendableQueryParser (QueryParser/Ext/): `:pfx:que` dispatches the
    //     registered prefix extension; `-vector` stays a classic clause
    "q_ext_parsed" -> ((s, dir) => {
      val se = searcher(s, dir)
      val exts: Map[String, ExtendableQueryParser.ParserExtension] =
        Map("pfx" -> ((_, term) => PrefixQ(term.toLowerCase)))
      idsOf(se, ExtendableQueryParser.parse(":pfx:que -vector", se.analyzer, exts))
    }),

    // --- Expressions module (Lucene.Net.Expressions/ExpressionSortField.cs
    //     + JS/JavascriptCompiler.cs): a string expression over _score and
    //     bound doc values ranks the matches — compiled through Catalyst
    "q_expr_sort" -> ((s, dir) => {
      val se = searcher(s, dir)
      val bindings = s.read.parquet(s"$dir/documents.parquet")
        .select(format_string("doc%09d", col("doc_id")).as("url"),
          col("n_chars").cast("double").as("n_chars"))
      val ranked = Expressions.sortBy(se, TermQ("vector"),
        "_score * ln(1.0 + n_chars)", bindings, 10)
      IndexCache.rankedIds(ranked.select(col("url"),
        col("expr_score").as("score"), col("segmentId"), col("docId")))
    }),

    // --- MultiSimilarity (Search/Similarities/MultiSimilarity.cs): score =
    //     sum of the sub-similarities' scores (BM25 + TFIDF here)
    "q_multisim_topk" -> ((s, dir) => ranked(IndexCache.simSearcher(s, dir,
      MultiSim(List(Bm25Sim, TfIdfSim))).search(TermQ("vector"), 10))),

    // --- QueryAutoStopWordAnalyzer (Analysis/Query/
    //     QueryAutoStopWordAnalyzer.cs): stop words DERIVED from the index —
    //     terms in more than 40% of docs
    "q_auto_stopwords" -> ((s, dir) => {
      import s.implicits._
      val terms = AutoStopAnalyzer.stopTermsByPercent(searcher(s, dir), 0.4f)
      s.createDataset(terms).toDF("term")
    }),

    // --- FuzzyLikeThisQuery (contrib/Queries/FuzzyLikeThisQuery.cs):
    //     "fuzzify" sample text — emit the selected (src, variant, score)
    //     rewrite table (difference^2 * idf, global top-N); the oracle
    //     recomputes the same expansion in SQL
    "q_fuzzy_mlt" -> ((s, dir) => {
      import s.implicits._
      val se = searcher(s, dir)
      val rows = se.fuzzyLikeThisTerms(
        Seq(se.defaultField -> "vektor strean"), maxNumTerms = 20)
      s.createDataset(rows).toDF("ord", "src", "term", "score")
        .select(col("src"), col("term"), col("score"))
    }),

    // --- DuplicateFilter (contrib/Queries/DuplicateFilter.cs,
    //     KM_USE_FIRST_OCCURRENCE): among a query's hits, keep only the
    //     first doc (index order) per key-field value
    "q_duplicate_filter" -> ((s, dir) => {
      val se = searcher(s, dir)
      val meta = s.read.parquet(s"$dir/documents.parquet")
        .select(format_string("doc%09d", col("doc_id")).as("url"), col("source"))
      se.compile(TermQ("vector"))
        .join(se.docs.select("segmentId", "docId", "url"), Seq("segmentId", "docId"))
        .join(meta, Seq("url"))
        .select(expr("cast(substring(url, 4) as bigint)").as("doc_id"), col("source"))
        .groupBy("source").agg(min("doc_id").as("doc_id"))
        .select("doc_id").orderBy("doc_id")
    }),

    // --- XML query syntax (QueryParser/Xml/CoreParser.cs): boolean of
    //     term clauses with a SpanNear mustNot — ranked
    "q_xml_parsed" -> ((s, dir) => {
      val se = searcher(s, dir)
      ranked(se.search(XmlQueryParser.parse(
        """<BooleanQuery>
          |  <Clause occurs="must"><TermQuery>vector</TermQuery></Clause>
          |  <Clause occurs="should"><TermQuery>stream</TermQuery></Clause>
          |  <Clause occurs="mustNot">
          |    <SpanNear slop="2" inOrder="true">
          |      <SpanTerm>hash</SpanTerm><SpanTerm>join</SpanTerm>
          |    </SpanNear>
          |  </Clause>
          |</BooleanQuery>""".stripMargin, se.analyzer), 10))
    }),

    // --- parsed `^boost` syntax (Classic/QueryParserBase boost production):
    //     power-of-two boosts keep the float/double algebra bit-exact on
    //     both sides regardless of association
    "q_parsed_boost" -> ((s, dir) => {
      val se = searcher(s, dir)
      ranked(se.search(QueryParser.parse("vector^2 stream \"hash join\"^4", se.analyzer), 10))
    }),

    // --- parsed `field:(a b)` grouping: the binding scopes every clause in
    //     the group (round 2's parser silently dropped it)
    "q_field_group" -> ((s, dir) => {
      val se = IndexCache.fieldedSearcher(s, dir)
      idsOf(se, QueryParser.parse("source:(src3 src4) AND vector", se.analyzer))
    }),

    // --- parsed `field:"phrase"`: the binding wraps the phrase clause
    "q_field_phrase" -> ((s, dir) => {
      val se = searcher(s, dir)
      idsOf(se, QueryParser.parse("text:\"hash join\"", se.analyzer))
    }),

    // --- multi-phrase (term alternatives per slot, MultiPhraseQuery)
    "q_multiphrase" -> ((s, dir) => idsOf(searcher(s, dir),
      MultiPhraseQ(List((Set("hash", "merge"), 0), (Set("join"), 1))))),

    // --- field-qualified queries over the multi-field index ((field, term)
    //     posting keys — Index/Term.cs; keyword-indexed StringFields)
    "q_field_term" -> ((s, dir) => idsOf(IndexCache.fieldedSearcher(s, dir),
      FieldQ("source", TermQ("src3")))),
    "q_field_bool" -> ((s, dir) => idsOf(IndexCache.fieldedSearcher(s, dir),
      BoolQ(List(Occur.Must -> FieldQ("source", TermQ("src3")),
        Occur.Must -> TermQ("vector"))))),
    // ranked cross-field disjunction: text BM25 + lang-field BM25 (per-field
    // df/avgdl statistics), clause-ordered double chain
    "q_field_topk" -> ((s, dir) => ranked(IndexCache.fieldedSearcher(s, dir).search(
      BoolQ(List(Occur.Should -> TermQ("vector"),
        Occur.Should -> FieldQ("lang", TermQ("en")))), 10))),
    // parsed field syntax end-to-end (QueryParser `field:` -> FieldQ)
    "q_field_parsed" -> ((s, dir) => {
      val se = IndexCache.fieldedSearcher(s, dir)
      idsOf(se, QueryParser.parse("source:src3 AND stream", se.analyzer))
    }),

    // --- PerFieldSimilarityWrapper: lang field scores TFIDF, text stays
    //     BM25, queryNorm = coord = 1 (the wrapper's sealed non-overrides)
    "q_perfield_topk" -> ((s, dir) => ranked(IndexCache.perFieldSearcher(s, dir).search(
      BoolQ(List(Occur.Should -> TermQ("vector"),
        Occur.Should -> FieldQ("lang", TermQ("en")))), 10))),

    // --- TFIDF/DefaultSimilarity (the reference engine default): coord *
    //     queryNorm * sum(sqrt(tf) * idf^2 * norm), per-doc coord factor
    "q_tfidf_topk" -> ((s, dir) => ranked(IndexCache.tfidfSearcher(s, dir).search(
      BoolQ(List(Occur.Should -> TermQ("vector"), Occur.Should -> TermQ("stream"))), 10))),

    // --- multi-segment search (4 url-hash segments): per-segment walks +
    //     cross-segment top-k; ranked output keyed by (score, doc_id)
    "q_multiseg_topk" -> ((s, dir) =>
      IndexCache.rankedByDocId(IndexCache.multisegSearcher(s, dir), TermQ("data"), 10)),
    "q_multiseg_phrase" -> ((s, dir) => idsOf(IndexCache.multisegSearcher(s, dir),
      PhraseQ(List("hash" -> 0, "join" -> 1)))),

    // --- the MERGE path through the gate: 4 segments + deletes, then a real
    //     purging MergeJob.merge — results must equal an index built without
    //     the purged docs (compacted docIds, decremented stats)
    "q_merged_docs" -> ((s, dir) => idsOf(IndexCache.mergedSearcher(s, dir), TermQ("data"))),
    "q_merged_topk" -> ((s, dir) =>
      IndexCache.rankedByDocId(IndexCache.mergedSearcher(s, dir), TermQ("data"), 10)),
    "q_merged_count" -> ((s, dir) => {
      import s.implicits._
      Seq(IndexCache.mergedSearcher(s, dir).count(MatchAllQ)).toDF("cnt")
    }),
    "q_merged_stats" -> ((s, dir) => {
      import s.implicits._
      val se = IndexCache.mergedSearcher(s, dir)
      Seq((se.maxDoc, se.sumTotalTermFreq)).toDF("max_doc", "sum_ttf")
    }),

    // --- StandardAnalyzer chain through the gate (classic JFlex grammar +
    //     StandardFilter + LowerCase + StopFilter with skippedPositions —
    //     Analysis/Standard/StandardTokenizerImpl.jflex, StandardFilter.cs:
    //     51-80, StopFilter.cs:128-146) over the deterministic fixture.
    //     The token stream itself, distributed through the analyzer:
    "q_std_tokens" -> ((s, dir) => {
      import s.implicits._
      IndexCache.stdFixturePages(s, dir).filter(col("doc_id") < 10)
        .select(col("doc_id"), col("text")).as[(Long, String)]
        .flatMap { case (id, text) =>
          graft.analysis.Analyzers.byName("standard").tokenize(text)
            .map(t => (id, t.position, t.term))
        }.toDF("doc_id", "pos", "term").orderBy("doc_id", "pos")
    }),
    //     exact phrase ACROSS a stopword gap ("went to school": 'to' dropped,
    //     'school' two positions later) through the full std index:
    "q_std_phrase" -> ((s, dir) => idsOf(IndexCache.stdSearcher(s, dir),
      PhraseQ(List("went" -> 0, "school" -> 2)))),
    //     HOST rule end-to-end (one token with internal dots):
    "q_std_host" -> ((s, dir) => idsOf(IndexCache.stdSearcher(s, dir),
      TermQ("host3.example.com"))),
    //     ACRONYM (I.B.M. -> ibm) + EMAIL conjunction:
    "q_std_acr_email" -> ((s, dir) => idsOf(IndexCache.stdSearcher(s, dir),
      BoolQ(List(Occur.Must -> TermQ("ibm"), Occur.Must -> TermQ("admin@site2.org"))))),

    // --- payload scoring (PayloadTermQuery + Min/Max/AveragePayloadFunction)
    //     over the payload-stream fixture index
    "q_payload_max" -> ((s, dir) => payloadIds(IndexCache.payloadSearcher(s, dir),
      PayloadScoreQ("alpha", "max"), intScore = true)),
    "q_payload_min" -> ((s, dir) => payloadIds(IndexCache.payloadSearcher(s, dir),
      PayloadScoreQ("alpha", "min"), intScore = true)),
    "q_payload_avg" -> ((s, dir) => payloadIds(IndexCache.payloadSearcher(s, dir),
      PayloadScoreQ("alpha", "avg"), intScore = false)),

    // --- PayloadNearQuery: span score x avg payload over the one (alpha
    //     beta) span per doc; the span-weight factor is constant across the
    //     fixture (equal dfs, fieldLen 3), so rank order is the payload avg
    //     (doc_id%7 + doc_id%13)/2 with doc_id tie-break
    "q_payload_near" -> ((s, dir) => {
      val se = IndexCache.payloadSearcher(s, dir)
      val hits = se.compile(PayloadNearQ(
        SpanNearS(List(SpanTermS("alpha"), SpanTermS("beta")), 0, inOrder = true), "avg"))
        .join(se.docs.select("segmentId", "docId", "url"), Seq("segmentId", "docId"))
        .withColumn("doc_id", expr("cast(substring(url, 4) as bigint)"))
        .select("doc_id", "score")
      Ranks.rankTopK(hits, 15, Seq(col("score").desc, col("doc_id").asc))
        .select("doc_id", "rank").orderBy("rank")
    }),

    // --- PayloadSpanUtil: the SET of payloads touched by a standard
    //     query's matches — (doc_id, payload-int) rows, int-decoded
    "q_payload_spanutil" -> ((s, dir) => {
      val se = IndexCache.payloadSearcher(s, dir)
      PayloadSpanUtil.payloadsForQuery(se,
        BoolQ(List(Occur.Should -> TermQ("alpha"), Occur.Should -> TermQ("beta"))))
        .join(se.docs.select("segmentId", "docId", "url"), Seq("segmentId", "docId"))
        .select(expr("cast(substring(url, 4) as bigint)").as("doc_id"),
          expr("cast(conv(hex(payload), 16, 10) as int)").as("pay"))
        .orderBy("doc_id", "pay")
    }),

    // --- LM Dirichlet similarity (LMDirichletSimilarity, mu=2000): per-term
    //     score = ln(1 + tf/(mu*(ttf+1)/(sttf+1))) + ln(mu/(dl+mu)), clip 0
    "q_lm_topk" -> ((s, dir) => ranked(IndexCache.lmSearcher(s, dir).search(
      BoolQ(List(Occur.Should -> TermQ("vector"), Occur.Should -> TermQ("stream"))), 10))),

    // --- LM Jelinek-Mercer (lambda=0.5): s = ln(1 + ((1-l)*tf/dl)/(l*p))
    "q_lmjm_topk" -> ((s, dir) => ranked(IndexCache.lmJmSearcher(s, dir).search(
      BoolQ(List(Occur.Should -> TermQ("vector"), Occur.Should -> TermQ("stream"))), 10))),

    // --- SweetSpotSimilarity: TFIDF with a plateau lengthNorm
    "q_sweet_topk" -> ((s, dir) => ranked(IndexCache.sweetSearcher(s, dir).search(
      BoolQ(List(Occur.Should -> TermQ("vector"), Occur.Should -> TermQ("stream"))), 10))),

    // --- DFR I(n)L2 and IB LL-DF-H2 (SimilarityBase family)
    "q_dfr_topk" -> ((s, dir) => ranked(IndexCache.dfrSearcher(s, dir).search(
      BoolQ(List(Occur.Should -> TermQ("vector"), Occur.Should -> TermQ("stream"))), 10))),
    "q_ib_topk" -> ((s, dir) => ranked(IndexCache.ibSearcher(s, dir).search(
      BoolQ(List(Occur.Should -> TermQ("vector"), Occur.Should -> TermQ("stream"))), 10))),

    // --- the FULL DFR / IB frameworks (any basicModel × afterEffect ×
    //     normalization, any distribution × lambda × normalization):
    //     combos gated so every SQL-expressible component appears at least
    //     once — G+B+H1, P+L+Z(0.3), Ine+none+H2, SPL+TTF+H3(800)
    "q_dfr_gb1_topk" -> ((s, dir) => ranked(IndexCache.simSearcher(s, dir,
      DfrSim("g", "b", "h1")).search(TermQ("vector"), 10))),
    "q_dfr_pz_topk" -> ((s, dir) => ranked(IndexCache.simSearcher(s, dir,
      DfrSim("p", "l", "z", 0.3f)).search(TermQ("vector"), 10))),
    "q_dfr_ine_topk" -> ((s, dir) => ranked(IndexCache.simSearcher(s, dir,
      DfrSim("ine", "none", "h2")).search(TermQ("vector"), 10))),
    "q_ib_spl_topk" -> ((s, dir) => ranked(IndexCache.simSearcher(s, dir,
      IbSim("spl", "ttf", "h3", 800f)).search(TermQ("vector"), 10))),

    // --- deletes (IndexWriter.DeleteDocuments / live-docs overlay): matches
    //     vanish immediately; BM25 stats stay un-decremented until merge
    "q_deleted" -> ((s, dir) => idsOf(IndexCache.deletedSearcher(s, dir), TermQ("data"))),
    "q_deleted_topk" -> ((s, dir) =>
      ranked(IndexCache.deletedSearcher(s, dir).search(TermQ("data"), 10))),
    "q_deleted_count" -> ((s, dir) => {
      import s.implicits._
      Seq(IndexCache.deletedSearcher(s, dir).count(MatchAllQ)).toDF("cnt")
    }),

    // --- paging (TopScoreDocCollector.SearchAfter): page 2 strictly after
    //     page 1's (score, segmentId, docId) cursor
    "q_search_after" -> ((s, dir) => {
      val se = searcher(s, dir)
      val last = se.search(TermQ("data"), 5).collect().last
      ranked(se.searchAfter(TermQ("data"), 5,
        last.getDouble(1), last.getInt(2), last.getInt(3)))
    }),

    // --- CommonTermsQuery (df-threshold splits high/low-frequency clauses)
    "q_common_terms" -> ((s, dir) => {
      val se = searcher(s, dir)
      val terms = List("data", "stream")
      idsOf(se, Query.commonTerms(terms, se.termStats(terms.toSet), se.maxDoc))
    }),

    // --- prefix completion (AnalyzingSuggester analog: weight-ranked)
    "q_suggest" -> ((s, dir) =>
      Suggest.complete(searcher(s, dir).dictionary(), "st", 5)),

    // --- infix suggester (AnalyzingInfixSuggester analog: substring match,
    //     weight-ranked)
    "q_suggest_infix" -> ((s, dir) =>
      Suggest.completeInfix(searcher(s, dir).dictionary(), "ata", 5)),

    // --- fuzzy suggester (FuzzySuggester analog: input-length prefix within
    //     maxEdits, weight-ranked completions)
    "q_suggest_fuzzy" -> ((s, dir) =>
      Suggest.completeFuzzy(searcher(s, dir).dictionary(), "strem", 1, 5)),

    // --- free-text suggester (FreeTextSuggester analog: bigram-LM next-word
    //     continuations of a context word)
    "q_suggest_freetext" -> ((s, dir) =>
      Suggest.freeText(s.read.parquet(s"$dir/documents.parquet"), "doc_id", "text", "data", 5)),

    // --- spell suggestion (DirectSpellChecker analog over the dictionary)
    "q_spell" -> ((s, dir) =>
      Spell.suggest(searcher(s, dir).dictionary(), "strema", 2, 5)),

    // --- word-break suggestion (WordBreakSpellChecker analog)
    "q_wordbreak" -> ((s, dir) =>
      WordBreak.suggest(searcher(s, dir).dictionary(), "hashjoin", 5)),

    // --- highlighter (token-window fragment around first occurrence)
    "q_highlight" -> ((s, dir) => {
      val docs = s.read.parquet(s"$dir/documents.parquet")
      Highlighter.firstSnippet(docs, "doc_id", "text", "vector", 3, 3).orderBy("doc_id")
    }),

    // --- passage-SCORED highlighting (PostingsHighlighter passage ranking):
    //     best window by (distinct terms, total matches, earliest start)
    "q_highlight_best" -> ((s, dir) => {
      val docs = s.read.parquet(s"$dir/documents.parquet")
      Highlighter.bestSnippet(docs, "doc_id", "text", Seq("vector", "stream"), 7)
        .orderBy("doc_id")
    }),

    // --- numeric range (NumericRangeQuery -> native Catalyst predicate)
    "q_numrange" -> ((s, dir) =>
      s.read.parquet(s"$dir/lineitem.parquet")
        .filter(col("l_quantity") >= 10 && col("l_quantity") < 30 &&
          col("l_shipdate") >= "1995-01-01")
        .groupBy(col("l_returnflag")).agg(count(lit(1)).as("cnt"))
        .orderBy("l_returnflag")),

    // --- CheckIndex invariants surfaced through the gate
    "q_checkindex" -> ((s, dir) => {
      import s.implicits._
      val se = searcher(s, dir) // ensure the index exists
      val report = graft.build.CheckIndex.run(s, IndexCache.indexPath(dir))
      Seq((report.docs, report.postingRows, report.violations.size.toLong))
        .toDF("docs", "posting_rows", "violations")
    }),

    // --- grouped SEARCH (GroupingSearch/TwoPass collectors): top-2 docs per
    //     source group of the query's matches, groups ordered by best score
    "q_group_search" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val se = searcher(s, dir)
      val meta = s.read.parquet(s"$dir/documents.parquet").select("doc_id", "source")
      val hits = se.compile(TermQ("vector"))
        .join(se.docs.select("segmentId", "docId", "url"), Seq("segmentId", "docId"))
        .withColumn("doc_id", expr("cast(substring(url, 4) as bigint)"))
        .join(meta, "doc_id")
      hits.withColumn("rn", row_number().over(
          Window.partitionBy(col("source"))
            .orderBy(col("score").desc, col("doc_id").asc)))
        .filter(col("rn") <= 2)
        .select(col("source"), col("doc_id"), col("rn"))
        .orderBy("source", "rn")
    }),

    // --- Sort/SortField (TopFieldCollector): matching docs by field order.
    //     Top-k FIRST (parallel TakeOrderedAndProject — the TopFieldCollector
    //     bounded heap analog), then the <=k winners rank driver-side: the
    //     unbounded match set never funnels through one window task.
    "q_sort_field" -> ((s, dir) => {
      val se = searcher(s, dir)
      val meta = s.read.parquet(s"$dir/documents.parquet").select("doc_id", "n_chars")
      val matches = idsOf(se, TermQ("vector")).join(meta, "doc_id")
      Ranks.rankTopK(matches, 15, Seq(col("n_chars").desc, col("doc_id").asc))
        .select("doc_id", "rank").orderBy("rank")
    }),

    // --- span near (ordered/unordered proximity, Search/Spans family)
    "q_spannear" -> ((s, dir) => idsOf(searcher(s, dir),
      SpanMatchQ(SpanNearS(List(SpanTermS("hash"), SpanTermS("join")), 2, inOrder = true)))),
    // scored spans (SpanScorer): freq = sum of 1/(matchLength+1) over spans
    "q_spanscore_topk" -> ((s, dir) => ranked(searcher(s, dir).search(
      SpanScoreQ(SpanNearS(List(SpanTermS("hash"), SpanTermS("join")), 2, inOrder = true)), 10))),
    "q_spannear_un" -> ((s, dir) => idsOf(searcher(s, dir),
      SpanMatchQ(SpanNearS(List(SpanTermS("vector"), SpanTermS("stream")), 1, inOrder = false)))),

    // --- FilteredQuery analog: search restricted by a metadata predicate
    // --- BoostingQuery (Queries/BoostingQuery.cs): full scores for the
    //     match query, demoted (x boost) where the context query also hits
    "q_boosting" -> ((s, dir) => {
      val se = searcher(s, dir)
      val ctx = se.compile(TermQ("stream")).select(col("segmentId"), col("docId"))
        .withColumn("inctx", lit(1))
      val hits = se.compile(TermQ("vector"))
        .join(broadcast(ctx), Seq("segmentId", "docId"), "left_outer")
        .withColumn("score",
          when(col("inctx").isNotNull, col("score") * 0.5d).otherwise(col("score")))
        .join(se.docs.select("segmentId", "docId", "url"), Seq("segmentId", "docId"))
      IndexCache.rankedIds(hits.select("url", "score", "segmentId", "docId"))
    }),

    // --- ChainedFilter (Queries/ChainedFilter.cs AND/OR/ANDNOT chains):
    //     (source=src1 OR source=src3) ANDNOT lang='en', over a term query
    "q_chained_filter" -> ((s, dir) => {
      val se = searcher(s, dir)
      val meta = s.read.parquet(s"$dir/documents.parquet")
        .filter((col("source") === "src1" || col("source") === "src3") &&
          col("lang") =!= "en")
        .select(format_string("doc%09d", col("doc_id")).as("url"))
      se.compile(TermQ("vector"))
        .join(se.docs.select("segmentId", "docId", "url"), Seq("segmentId", "docId"))
        .join(meta, Seq("url"), "left_semi")
        .select(expr("cast(substring(url, 4) as bigint)").as("doc_id"))
        .orderBy("doc_id")
    }),

    "q_filtered" -> ((s, dir) => {
      val se = searcher(s, dir)
      val allowed = s.read.parquet(s"$dir/documents.parquet")
        .filter(col("source") === "src3")
        .select(format_string("doc%09d", col("doc_id")).as("url"))
      val hits = se.compile(TermQ("vector"))
        .join(se.docs.select("segmentId", "docId", "url"), Seq("segmentId", "docId"))
        .join(allowed, Seq("url"), "left_semi")
      IndexCache.rankedIds(hits.select("url", "score", "segmentId", "docId"))
    }),

    // --- CustomScoreQuery / FunctionQuery analog: score * fn(doc value)
    "q_custom_score" -> ((s, dir) => {
      val se = searcher(s, dir)
      val hits = se.compile(TermQ("vector"))
        .join(se.docs.select("segmentId", "docId", "url", "fieldLen"), Seq("segmentId", "docId"))
        .withColumn("score", col("score") * log(lit(1.0d) + col("fieldLen")))
      IndexCache.rankedIds(hits.select("url", "score", "segmentId", "docId")).limit(10)
    }),

    // --- QueryRescorer analog: re-rank the top window with a phrase bonus
    "q_rescore" -> ((s, dir) => {
      val se = searcher(s, dir)
      val rescored = Rescorer.rescore(se,
        BoolQ(List(Occur.Should -> TermQ("vector"), Occur.Should -> TermQ("stream"))),
        window = 20, PhraseQ(List("hash" -> 0, "join" -> 1)), weight = 2.0d)
      val withUrl = broadcast(rescored)
        .join(se.docs.select("segmentId", "docId", "url"), Seq("segmentId", "docId"))
      IndexCache.rankedIds(withUrl.select("url", "score", "segmentId", "docId")).limit(10)
    }),

    // --- TermsFilter (Queries/TermsFilter.cs): docs containing ANY of a
    //     term set, as a doc-id-set filter (constant score)
    "q_terms_filter" -> ((s, dir) => {
      val se = searcher(s, dir)
      Filters.terms(se, Seq("merge", "commit"))
        .join(se.docs.select("segmentId", "docId", "url"), Seq("segmentId", "docId"))
        .select(expr("cast(substring(url, 4) as bigint)").as("doc_id"))
        .orderBy("doc_id")
    }),

    // --- BooleanFilter (Queries/BooleanFilter.cs Occur-composed clauses):
    //     ((merge OR commit) ANDNOT stream) AND data
    "q_boolean_filter" -> ((s, dir) => {
      val se = searcher(s, dir)
      val f = Filters.boolean(se, Seq(
        Occur.Should -> Filters.terms(se, Seq("merge")),
        Occur.Should -> Filters.terms(se, Seq("commit")),
        Occur.MustNot -> Filters.query(se, TermQ("stream")),
        Occur.Must -> Filters.query(se, TermQ("data"))))
      f.join(se.docs.select("segmentId", "docId", "url"), Seq("segmentId", "docId"))
        .select(expr("cast(substring(url, 4) as bigint)").as("doc_id"))
        .orderBy("doc_id")
    }),

    // --- FunctionQuery (Queries/Function/FunctionQuery.cs): every doc
    //     scored by a ValueSource tree — reciprocal + rangemap + linear
    //     over the doc length (Float/IntFieldSource analog = fieldLen)
    "q_func_query" -> ((s, dir) => {
      import ValueSources._
      val se = searcher(s, dir)
      val vs = SumVS(List(
        ReciprocalVS(ColVS("fieldLen"), m = 1.0, a = 1000.0, b = 100.0),
        RangeMapVS(ColVS("fieldLen"), lo = 50.0, hi = 100.0, target = 5.0,
          default = Some(0.0)),
        LinearVS(ColVS("fieldLen"), slope = 0.01, intercept = 1.0)))
      IndexCache.rankedIds(ValueSources.functionQuery(se, vs)).limit(10)
    }),

    // --- BoostedQuery (Queries/Function/BoostedQuery.cs): BM25 score *
    //     scale(fieldLen, 0, 1) — ScaleFloatFunction's observed min/max
    //     resolve over ALL docs at weight creation
    "q_func_boosted" -> ((s, dir) => {
      import ValueSources._
      val se = searcher(s, dir)
      IndexCache.rankedIds(ValueSources.boostedQuery(se, TermQ("vector"),
        ScaleVS(ColVS("fieldLen"), 0.0, 1.0))).limit(10)
    }),

    // --- Ord/ReverseOrd + TermFreq + IDF sources composed:
    //     tf('vector') * idf('vector') + rord(url) * 1e-4
    "q_func_ord" -> ((s, dir) => {
      import ValueSources._
      val se = searcher(s, dir)
      val vs = SumVS(List(
        ProductVS(List(TermFreqVS("vector"), IdfVS("vector"))),
        ProductVS(List(RordVS("url"), ConstVS(0.0001)))))
      IndexCache.rankedIds(ValueSources.functionQuery(se, vs)).limit(10)
    }),

    // --- SpanPositionRangeQuery: 'vector' spans inside positions [5, 50)
    "q_span_posrange" -> ((s, dir) => idsOf(searcher(s, dir),
      SpanMatchQ(SpanPosRangeS(SpanTermS("vector"), 5, 50)))),

    // --- SpanMultiTermQueryWrapper: prefix expanded to a SpanOr inside an
    //     unordered near (merg* within 2 of 'data')
    "q_span_multiterm" -> ((s, dir) => {
      val se = searcher(s, dir)
      idsOf(se, SpanMatchQ(SpanNearS(
        List(SpanMulti.wrap(se, PrefixQ("merg")), SpanTermS("data")),
        slop = 2, inOrder = false)))
    }),

    // --- FieldMaskingSpanQuery: surname-field span 'lying' about its field
    //     inside a text-field SpanNear; unordered slop=-1 = position-aligned
    //     (the reference class doc's studentfirstname/studentsurname query
    //     uses exactly this -1 trick). Matches docs whose text token b@1
    //     is 'b1' AND surname token t@1 is 't2'.
    "q_span_fieldmask" -> ((s, dir) => idsOf(IndexCache.maskSearcher(s, dir),
      SpanMatchQ(SpanNearS(List(
        SpanTermS("b1"),
        SpanFieldMaskS(SpanTermS("t2"), "surname")), slop = -1, inOrder = false)))),

    // --- SpanPayloadCheckQuery: 'alpha' spans whose position payload is
    //     int(3) — matches via either alpha occurrence (payloads id%7 and
    //     (id+3)%7 in the payload fixture)
    "q_span_paycheck" -> ((s, dir) => idsOf(IndexCache.payloadSearcher(s, dir),
      SpanMatchQ(SpanPayloadCheckS(SpanTermS("alpha"),
        List(graft.analysis.DelimitedPayloadAnalyzer.encodeInt(3)))))),

    // --- SpanNearPayloadCheckQuery: ordered near (alpha beta) whose two
    //     collected payloads each equal one of {int(2), int(5)} (unordered
    //     containment per the reference's AcceptPosition)
    "q_span_nearpaycheck" -> ((s, dir) => idsOf(IndexCache.payloadSearcher(s, dir),
      SpanMatchQ(SpanNearPayloadCheckS(
        SpanNearS(List(SpanTermS("alpha"), SpanTermS("beta")), slop = 0, inOrder = true),
        List(graft.analysis.DelimitedPayloadAnalyzer.encodeInt(2),
          graft.analysis.DelimitedPayloadAnalyzer.encodeInt(5)))))),

    // --- contrib/WordNet SynExpand: query terms + synonyms from a wn_s.pl
    //     synonym table as boosted SHOULD clauses (multiword synset members
    //     are dropped by the IsDecent letter check, like Syns2Index.cs)
    "q_wordnet_expand" -> ((s, dir) => {
      val se = searcher(s, dir)
      val wn = WordNet.parsePrologLines(Iterator(
        "s(100001,1,'vector',n,1,0).",
        "s(100001,2,'table',n,1,0).",
        "s(100001,3,'data_structure',n,1,0).", // rejected: non-letter char
        "s(100002,1,'stream',n,1,0).",
        "s(100002,2,'batch',n,1,0)."))
      ranked(se.search(WordNet.expand("vector stream", wn, se.analyzer, 0.5f), 10))
    })
  )

  private def searchOracle: Map[String, String] = Map(
    "q_term_docs" ->
      s"""$P SELECT doc_id, tf FROM tf WHERE term = 'data' ORDER BY doc_id""",

    "q_term_topk" ->
      s"""$P, ${scoreCte("a", "data")}
         |SELECT doc_id, CAST(row_number() OVER (ORDER BY s DESC, doc_id) AS INT) AS rank
         |FROM scores_a ORDER BY s DESC, doc_id LIMIT 10""".stripMargin,

    "q_split_topk" ->
      s"""$P, ${scoreCte("a", "data")}
         |SELECT doc_id, CAST(row_number() OVER (ORDER BY s DESC, doc_id) AS INT) AS rank
         |FROM scores_a ORDER BY s DESC, doc_id LIMIT 10""".stripMargin,

    "q_split_pk" ->
      s"""$P SELECT DISTINCT doc_id FROM tf
         |WHERE term = 'data' AND doc_id % 2 = 0 ORDER BY doc_id""".stripMargin,

    "q_bool_and" ->
      s"""$P SELECT DISTINCT a.doc_id FROM tf a JOIN tf b USING (doc_id)
         |WHERE a.term = 'vector' AND b.term = 'stream' ORDER BY doc_id""".stripMargin,

    "q_bool_or_topk" ->
      s"""$P, ${scoreCte("a", "vector")}, ${scoreCte("b", "stream")}
         |SELECT doc_id, CAST(row_number() OVER (ORDER BY s DESC, doc_id) AS INT) AS rank FROM (
         |  SELECT coalesce(a.doc_id, b.doc_id) AS doc_id,
         |         (coalesce(a.s, 0) + coalesce(b.s, 0)) AS s
         |  FROM scores_a a FULL OUTER JOIN scores_b b ON a.doc_id = b.doc_id)
         |ORDER BY s DESC, doc_id LIMIT 10""".stripMargin,

    "q_explain_parity" ->
      s"""$P, ${scoreCte("a", "vector")}, ${scoreCte("b", "stream")}
         |SELECT doc_id, CAST(row_number() OVER (ORDER BY s DESC, doc_id) AS INT) AS rank,
         |       1 AS ok FROM (
         |  SELECT coalesce(a.doc_id, b.doc_id) AS doc_id,
         |         (coalesce(a.s, 0) + coalesce(b.s, 0)) AS s
         |  FROM scores_a a FULL OUTER JOIN scores_b b ON a.doc_id = b.doc_id)
         |ORDER BY s DESC, doc_id LIMIT 10""".stripMargin,

    "q_and_topk" ->
      s"""$P, ${scoreCte("a", "vector")}, ${scoreCte("b", "stream")}
         |SELECT doc_id, CAST(row_number() OVER (ORDER BY s DESC, doc_id) AS INT) AS rank FROM (
         |  SELECT a.doc_id, (a.s + b.s) AS s
         |  FROM scores_a a JOIN scores_b b ON a.doc_id = b.doc_id)
         |ORDER BY s DESC, doc_id LIMIT 10""".stripMargin,

    "q_bool_not" ->
      s"""$P SELECT DISTINCT doc_id FROM tf WHERE term = 'vector'
         |AND doc_id NOT IN (SELECT doc_id FROM tf WHERE term = 'stream')
         |ORDER BY doc_id""".stripMargin,

    "q_minsm" ->
      s"""$P SELECT doc_id FROM tf WHERE term IN ('vector', 'stream', 'window')
         |GROUP BY doc_id HAVING count(DISTINCT term) >= 2 ORDER BY doc_id""".stripMargin,

    "q_dismax_topk" ->
      s"""$P, ${scoreCte("a", "vector")}, ${scoreCte("b", "stream")}
         |SELECT doc_id, CAST(row_number() OVER (ORDER BY s DESC, doc_id) AS INT) AS rank FROM (
         |  SELECT coalesce(a.doc_id, b.doc_id) AS doc_id,
         |    greatest(coalesce(a.s, -3.4028234663852886e38), coalesce(b.s, -3.4028234663852886e38))
         |    + 0.5 * ((coalesce(a.s, 0) + coalesce(b.s, 0))
         |             - greatest(coalesce(a.s, -3.4028234663852886e38), coalesce(b.s, -3.4028234663852886e38))) AS s
         |  FROM scores_a a FULL OUTER JOIN scores_b b ON a.doc_id = b.doc_id)
         |ORDER BY s DESC, doc_id LIMIT 10""".stripMargin,

    "q_phrase" ->
      s"""$P SELECT DISTINCT a.doc_id FROM toks a JOIN toks b
         |  ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
         |WHERE a.term = 'hash' AND b.term = 'join' ORDER BY 1""".stripMargin,

    // 2-term sloppy predicate: |posB - posA - 1| <= slop (transposition = 2)
    "q_phrase_sloppy" ->
      s"""$P SELECT DISTINCT a.doc_id FROM toks a JOIN toks b
         |  ON a.doc_id = b.doc_id AND abs(b.pos - a.pos - 1) <= 2
         |WHERE a.term = 'hash' AND b.term = 'join' ORDER BY 1""".stripMargin,

    "q_phrase_topk" ->
      s"""$P, pf AS (
         |  SELECT a.doc_id, count(*) AS freq FROM toks a JOIN toks b
         |    ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
         |  WHERE a.term = 'hash' AND b.term = 'join' GROUP BY a.doc_id),
         |ps AS (
         |  SELECT pf.doc_id,
         |    ((ln(1 + ((c.n - dh.df) + 0.5) / (dh.df + 0.5))
         |      + ln(1 + ((c.n - dj.df) + 0.5) / (dj.df + 0.5))) * (1.2 + 1)) * pf.freq /
         |    (pf.freq + 1.2 * ((1 - 0.75) + ((0.75 * dl.dl) / (CAST(c.sttf AS DOUBLE) / c.n)))) AS s
         |  FROM pf JOIN dl USING (doc_id) CROSS JOIN consts c
         |  JOIN dfs dh ON dh.term = 'hash' JOIN dfs dj ON dj.term = 'join')
         |SELECT doc_id, CAST(row_number() OVER (ORDER BY s DESC, doc_id) AS INT) AS rank
         |FROM ps ORDER BY s DESC, doc_id LIMIT 10""".stripMargin,

    "q_prefix" ->
      s"""$P SELECT DISTINCT doc_id FROM tf WHERE term LIKE 'sp%' ORDER BY doc_id""",

    "q_range" ->
      s"""$P SELECT DISTINCT doc_id FROM tf
         |WHERE term >= 'query' AND term < 'sort' ORDER BY doc_id""".stripMargin,

    "q_wildcard" ->
      s"""$P SELECT DISTINCT doc_id FROM tf
         |WHERE regexp_matches(term, '^s.a.*$$') ORDER BY doc_id""".stripMargin,

    "q_wildcard_lead" ->
      s"""$P SELECT DISTINCT doc_id FROM tf
         |WHERE term LIKE '%tion' ORDER BY doc_id""".stripMargin,

    "q_fuzzy" ->
      s"""$P SELECT DISTINCT doc_id FROM tf
         |WHERE levenshtein(term, 'joins') <= 1 ORDER BY doc_id""".stripMargin,

    "q_regexp" ->
      s"""$P SELECT DISTINCT doc_id FROM tf
         |WHERE regexp_matches(term, '^st[aeiou]+.*$$') ORDER BY doc_id""".stripMargin,

    "q_lucene_regexp" ->
      s"""$P SELECT DISTINCT doc_id FROM tf
         |WHERE regexp_matches(term, '^dat.$$') AND length(term) = 4
         |ORDER BY doc_id""".stripMargin,

    "q_lucene_regexp_compl" ->
      """SELECT doc_id FROM documents WHERE doc_id % 2 = 1 ORDER BY doc_id""",

    "q_lucene_regexp_interval" ->
      """SELECT doc_id FROM documents WHERE doc_id % 2 = 0 ORDER BY doc_id""",

    "q_regexp_gram" ->
      s"""$P SELECT DISTINCT doc_id FROM tf
         |WHERE regexp_matches(term, '^st.*eam.?$$') ORDER BY doc_id""".stripMargin,

    "q_fuzzy_topk" ->
      s"""$P, cands AS (
         |  SELECT term, df, levenshtein(term, 'joins') AS ed FROM dfs
         |  WHERE levenshtein(term, 'joins') <= 1),
         |boosted AS (
         |  SELECT term, df,
         |    CASE WHEN ed = 0 THEN CAST(1.0 AS FLOAT)
         |         ELSE CAST(1.0 - (CAST(ed AS FLOAT) / CAST(least(length(term), 5) AS FLOAT)) AS FLOAT)
         |    END AS boost
         |  FROM cands
         |  WHERE ed = 0 OR CAST(1.0 - (CAST(ed AS FLOAT) / CAST(least(length(term), 5) AS FLOAT)) AS FLOAT) > 0),
         |top AS (SELECT term, df, boost FROM boosted ORDER BY boost DESC, term ASC LIMIT 50),
         |cl AS (
         |  SELECT tf.doc_id, t.term,
         |    ((ln(1 + ((c.n - t.df) + 0.5) / (t.df + 0.5)) * t.boost) * (1.2 + 1)) * tf.tf /
         |    (tf.tf + 1.2 * ((1 - 0.75) + ((0.75 * dl.dl) / (CAST(c.sttf AS DOUBLE) / c.n)))) AS s
         |  FROM top t JOIN tf ON tf.term = t.term JOIN dl USING (doc_id) CROSS JOIN consts c),
         |agg AS (SELECT doc_id, sum(s ORDER BY term) AS s FROM cl GROUP BY doc_id)
         |SELECT doc_id, CAST(row_number() OVER (ORDER BY s DESC, doc_id) AS INT) AS rank
         |FROM agg ORDER BY s DESC, doc_id LIMIT 10""".stripMargin,

    "q_dict" ->
      s"""$P SELECT term, df, CAST(sum_tf AS BIGINT) AS ttf FROM (
         |  SELECT tf.term, count(*) AS df, sum(tf.tf) AS sum_tf FROM tf GROUP BY tf.term)
         |ORDER BY df DESC, term LIMIT 20""".stripMargin,

    "q_stats" ->
      s"""$P SELECT c.n AS max_doc, CAST(c.sttf AS BIGINT) AS sum_ttf,
         |  (SELECT count(*) FROM dfs) AS n_terms,
         |  (SELECT CAST(sum(df) AS BIGINT) FROM dfs) AS sum_df
         |FROM consts c""".stripMargin,

    "q_matchall_count" ->
      """SELECT count(*) AS cnt FROM documents""",

    "q_multi_collect" ->
      s"""$P, ${scoreCte("a", "data")}
         |SELECT count(*) AS cnt, max(s) AS max_s FROM scores_a""".stripMargin,

    "q_sorted_limit" ->
      s"""SELECT doc_id, n_chars,
         |CAST(row_number() OVER (ORDER BY n_chars, doc_id) AS INT) AS rank
         |FROM documents ORDER BY n_chars, doc_id LIMIT 10""".stripMargin,

    "q_sorted_early" ->
      s"""$P, m AS (SELECT DISTINCT doc_id FROM toks WHERE term = 'data')
         |SELECT d.doc_id, d.n_chars,
         |CAST(row_number() OVER (ORDER BY d.n_chars, d.doc_id) AS INT) AS rank
         |FROM documents d JOIN m ON m.doc_id = d.doc_id
         |ORDER BY d.n_chars, d.doc_id LIMIT 10""".stripMargin,

    // the distributed sorted merge is invisible to results: same oracle
    "q_sorted_merged_topk" ->
      s"""$P, m AS (SELECT DISTINCT doc_id FROM toks WHERE term = 'data')
         |SELECT d.doc_id, d.n_chars,
         |CAST(row_number() OVER (ORDER BY d.n_chars, d.doc_id) AS INT) AS rank
         |FROM documents d JOIN m ON m.doc_id = d.doc_id
         |ORDER BY d.n_chars, d.doc_id LIMIT 10""".stripMargin,

    // 'en' is never a text token and 'data' never a lang value, so the
    // four expanded leaves reduce to lang-BM25('en') + text-BM25('data')
    "q_multifield_parsed" ->
      s"""$P, ${scoreCte("a", "data")},
         |lconst AS (SELECT count(*) AS dfl FROM documents WHERE lang = 'en'),
         |scores_l AS (
         |  SELECT doc_id,
         |    (ln(1 + ((c.n - lc.dfl) + 0.5) / (lc.dfl + 0.5)) * (1.2 + 1)) * 1 /
         |    (1 + 1.2 * ((1 - 0.75) + ((0.75 * 1) / 1.0))) AS s
         |  FROM documents CROSS JOIN consts c CROSS JOIN lconst lc
         |  WHERE lang = 'en')
         |SELECT doc_id, CAST(row_number() OVER (ORDER BY s DESC, doc_id) AS INT) AS rank FROM (
         |  SELECT coalesce(a.doc_id, l.doc_id) AS doc_id,
         |         (coalesce(a.s, 0) + coalesce(l.s, 0)) AS s
         |  FROM scores_a a FULL OUTER JOIN scores_l l ON a.doc_id = l.doc_id)
         |ORDER BY s DESC, doc_id LIMIT 10""".stripMargin,

    "q_streamed_docs" ->
      s"""$P SELECT DISTINCT doc_id FROM tf WHERE term = 'data' ORDER BY doc_id""",

    "q_streamed_count" ->
      """SELECT count(*) AS cnt FROM documents""",

    "q_suggest_analyzing" ->
      """WITH sugg AS (
        |  SELECT doc_id,
        |    (CASE WHEN doc_id % 2 = 0 THEN 'Running Systems ' ELSE 'Walking Paths ' END)
        |      || CAST(doc_id AS VARCHAR) AS surface,
        |    (doc_id * 37) % 101 AS weight
        |  FROM documents)
        |SELECT surface, weight,
        |  CAST(row_number() OVER (ORDER BY weight DESC, surface) AS INT) AS rank
        |FROM sugg WHERE doc_id % 2 = 0
        |ORDER BY rank LIMIT 5""".stripMargin,

    "q_spell_jw" ->
      """WITH dict AS (
        |  SELECT 'jw' || CAST(doc_id % 40 AS VARCHAR) AS term, count(*) AS df
        |  FROM documents GROUP BY 1),
        |cands AS (
        |  SELECT term, df, jaro_winkler_similarity('jw1x', term) AS s
        |  FROM dict
        |  WHERE levenshtein(term, 'jw1x') <= 2 AND term <> 'jw1x'
        |    AND jaro_winkler_similarity('jw1x', term) >= 0.5)
        |SELECT term, round(s, 4) AS score,
        |  CAST(row_number() OVER (ORDER BY s DESC, df DESC, term) AS INT) AS rank
        |FROM cands ORDER BY rank LIMIT 5""".stripMargin,

    "q_spell_lucenelev" ->
      """WITH dict AS (
        |  SELECT 'lv' || CAST(doc_id % 40 AS VARCHAR) AS term, count(*) AS df
        |  FROM documents GROUP BY 1),
        |cands AS (
        |  SELECT term, df,
        |    1.0 - CAST(damerau_levenshtein('lv1x', term) AS DOUBLE)
        |          / LEAST(length('lv1x'), length(term)) AS s
        |  FROM dict
        |  WHERE levenshtein(term, 'lv1x') <= 2 AND term <> 'lv1x'
        |    AND 1.0 - CAST(damerau_levenshtein('lv1x', term) AS DOUBLE)
        |          / LEAST(length('lv1x'), length(term)) >= 0.5)
        |SELECT term, round(s, 4) AS score,
        |  CAST(row_number() OVER (ORDER BY s DESC, df DESC, term) AS INT) AS rank
        |FROM cands ORDER BY rank LIMIT 5""".stripMargin,

    // PostingsHighlighter: the fixture text is analytic in doc_id, so the
    // snippet is a pure string-arithmetic slice at the token's startOffset
    "q_postings_highlight" ->
      """SELECT doc_id,
        |  substring(concat(repeat('x', CAST(5 + doc_id % 11 AS INT)), ' target finale'),
        |            CAST(7 + doc_id % 11 AS INT), 12) AS snippet
        |FROM documents ORDER BY doc_id""".stripMargin,

    // FVH phrase: only doc_id%3==0 docs carry the complete phrase; the best
    // 21-char window anchors at the SECOND match (it holds matches 2 and 3),
    // start offset = (doc_id%7) + 16 zero-based -> +17 one-based
    "q_fvh_phrase" ->
      """SELECT doc_id,
        |  substring(concat(repeat('y', CAST(doc_id % 7 AS INT)),
        |                   ' alpha beta end alpha beta alpha beta'),
        |            CAST(doc_id % 7 + 17 AS INT), 21) AS snippet
        |FROM documents WHERE doc_id % 3 = 0 ORDER BY doc_id""".stripMargin,

    // NRT refresh: final view = full corpus appended, src1 docs deleted
    // (markers, not purged — matches vanish, the live set shrinks)
    "q_nrt_docs" ->
      s"""$PDel SELECT DISTINCT doc_id FROM tf WHERE term = 'data' ORDER BY doc_id""",
    "q_nrt_count" ->
      """SELECT count(*) AS cnt FROM documents WHERE source <> 'src1'""",

    "q_join_score" ->
      s"""$P, ${scoreCte("a", "vector")},
         |m AS (SELECT d.source, max(sc.s) AS js
         |  FROM scores_a sc JOIN documents d USING (doc_id) GROUP BY d.source)
         |SELECT d.doc_id,
         |  CAST(row_number() OVER (ORDER BY m.js DESC, d.doc_id) AS INT) AS rank
         |FROM documents d JOIN m USING (source)
         |ORDER BY m.js DESC, d.doc_id LIMIT 15""".stripMargin,

    "q_group_all" ->
      s"""$P SELECT count(DISTINCT d.source) AS groups
         |FROM (SELECT DISTINCT doc_id FROM tf WHERE term = 'vector') q
         |JOIN documents d USING (doc_id)""".stripMargin,

    "q_group_distinct" ->
      s"""$P SELECT d.source, count(DISTINCT d.lang) AS nlang
         |FROM (SELECT DISTINCT doc_id FROM tf WHERE term = 'vector') q
         |JOIN documents d USING (doc_id)
         |GROUP BY d.source ORDER BY d.source""".stripMargin,

    // analytic twins: the language fixtures are pure functions of doc_id
    "q_lang_de" ->
      """SELECT doc_id FROM documents WHERE doc_id % 2 = 0 ORDER BY doc_id""",

    "q_lang_en2" ->
      """SELECT doc_id FROM documents WHERE doc_id % 2 = 0 ORDER BY doc_id""",
    "q_lang_en2_phrase" ->
      """SELECT doc_id FROM documents ORDER BY doc_id""",
    "q_lang_nl" ->
      """SELECT doc_id FROM documents WHERE doc_id % 2 = 1 ORDER BY doc_id""",
    "q_lang_sv" ->
      """SELECT doc_id FROM documents WHERE doc_id % 2 = 0 ORDER BY doc_id""",
    "q_lang_ru" ->
      """SELECT doc_id FROM documents WHERE doc_id % 2 = 0 ORDER BY doc_id""",
    "q_lang_da" ->
      """SELECT doc_id FROM documents WHERE doc_id % 2 = 0 ORDER BY doc_id""",
    "q_lang_no" ->
      """SELECT doc_id FROM documents WHERE doc_id % 2 = 0 ORDER BY doc_id""",
    "q_lang_cjk" ->
      """SELECT doc_id FROM documents WHERE doc_id % 2 = 0 ORDER BY doc_id""",
    "q_lang_cjk_phrase" ->
      """SELECT doc_id FROM documents ORDER BY doc_id""",
    "q_filter_shingle" ->
      """SELECT doc_id FROM documents WHERE doc_id % 2 = 0 ORDER BY doc_id""",
    "q_filter_ngram" ->
      """SELECT doc_id FROM documents WHERE doc_id % 2 = 0 ORDER BY doc_id""",
    "q_ngram_phrase" ->
      """SELECT doc_id FROM documents WHERE doc_id % 2 = 0 ORDER BY doc_id""",
    "q_filter_synonym" ->
      """SELECT doc_id FROM documents WHERE doc_id % 2 = 0 ORDER BY doc_id""",
    "q_filter_porter" ->
      """SELECT doc_id FROM documents WHERE doc_id % 2 = 0 ORDER BY doc_id""",
    "q_filter_ascii" ->
      """SELECT doc_id FROM documents WHERE doc_id % 2 = 0 ORDER BY doc_id""",
    "q_filter_soundex" ->
      """SELECT doc_id FROM documents WHERE doc_id % 2 = 0 ORDER BY doc_id""",
    "q_filter_worddelim" ->
      """SELECT doc_id FROM documents WHERE doc_id % 2 = 0 ORDER BY doc_id""",
    "q_filter_worddelim_num" ->
      """SELECT doc_id FROM documents ORDER BY doc_id""",
    "q_filter_edge" ->
      """SELECT doc_id FROM documents WHERE doc_id % 2 = 0 ORDER BY doc_id""",
    "q_filter_commongrams" ->
      """SELECT doc_id FROM documents WHERE doc_id % 2 = 0 ORDER BY doc_id""",
    "q_filter_compound" ->
      """SELECT doc_id FROM documents WHERE doc_id % 2 = 0 ORDER BY doc_id""",
    "q_filter_compound_phrase" ->
      """SELECT doc_id FROM documents WHERE doc_id % 2 = 0 ORDER BY doc_id""",

    "q_lang_de_stop" ->
      """SELECT doc_id FROM documents WHERE 1 = 0""",
    "q_lang_fi_stop" ->
      """SELECT doc_id FROM documents WHERE 1 = 0""",
    "q_lang_de_sb" ->
      """SELECT doc_id FROM documents WHERE doc_id % 2 = 0 ORDER BY doc_id""",
    "q_lang_de2_sb" ->
      """SELECT doc_id FROM documents WHERE doc_id % 2 = 0 ORDER BY doc_id""",
    "q_lang_es_sb" ->
      """SELECT doc_id FROM documents WHERE doc_id % 2 = 0 ORDER BY doc_id""",
    "q_lang_it_sb" ->
      """SELECT doc_id FROM documents WHERE doc_id % 2 = 0 ORDER BY doc_id""",
    "q_lang_pt_sb" ->
      """SELECT doc_id FROM documents WHERE doc_id % 2 = 0 ORDER BY doc_id""",
    "q_lang_fr_sb" ->
      """SELECT doc_id FROM documents WHERE doc_id % 2 = 0 ORDER BY doc_id""",
    "q_lang_porter_sb" ->
      """SELECT doc_id FROM documents WHERE doc_id % 2 = 0 ORDER BY doc_id""",
    "q_lang_lovins_sb" ->
      """SELECT doc_id FROM documents WHERE doc_id % 2 = 0 ORDER BY doc_id""",
    "q_lang_kp_sb" ->
      """SELECT doc_id FROM documents WHERE doc_id % 2 = 0 ORDER BY doc_id""",
    "q_lang_ar_stop" ->
      """SELECT doc_id FROM documents WHERE 1 = 0""",
    "q_lang_el_stop" ->
      """SELECT doc_id FROM documents WHERE 1 = 0""",
    "q_lang_th_stop" ->
      """SELECT doc_id FROM documents WHERE 1 = 0""",
    "q_lang_bg_stop" ->
      """SELECT doc_id FROM documents WHERE 1 = 0""",
    "q_lang_hi_stop" ->
      """SELECT doc_id FROM documents WHERE 1 = 0""",
    "q_lang_fa_stop" ->
      """SELECT doc_id FROM documents WHERE 1 = 0""",
    "q_lang_ckb_stop" ->
      """SELECT doc_id FROM documents WHERE 1 = 0""",
    "q_lang_fi" ->
      """SELECT doc_id FROM documents WHERE doc_id % 2 = 0 ORDER BY doc_id""",
    "q_lang_hu" ->
      """SELECT doc_id FROM documents WHERE doc_id % 2 = 0 ORDER BY doc_id""",
    "q_lang_hu_light" ->
      """SELECT doc_id FROM documents WHERE doc_id % 2 = 0 ORDER BY doc_id""",
    "q_lang_cs" ->
      """SELECT doc_id FROM documents WHERE doc_id % 2 = 0 ORDER BY doc_id""",
    "q_lang_bg" ->
      """SELECT doc_id FROM documents WHERE doc_id % 2 = 0 ORDER BY doc_id""",
    "q_lang_hi" ->
      """SELECT doc_id FROM documents WHERE doc_id % 2 = 0 ORDER BY doc_id""",
    "q_lang_ar" ->
      """SELECT doc_id FROM documents WHERE doc_id % 2 = 0 ORDER BY doc_id""",
    "q_lang_fa" ->
      """SELECT doc_id FROM documents WHERE doc_id % 2 = 0 ORDER BY doc_id""",
    "q_lang_id" ->
      """SELECT doc_id FROM documents WHERE doc_id % 2 = 0 ORDER BY doc_id""",
    "q_lang_ckb" ->
      """SELECT doc_id FROM documents WHERE doc_id % 2 = 0 ORDER BY doc_id""",
    "q_lang_el" ->
      """SELECT doc_id FROM documents WHERE doc_id % 2 = 0 ORDER BY doc_id""",
    "q_lang_ro" ->
      """SELECT doc_id FROM documents WHERE doc_id % 2 = 0 ORDER BY doc_id""",
    "q_lang_th" ->
      """SELECT doc_id FROM documents WHERE doc_id % 2 = 0 ORDER BY doc_id""",
    "q_lang_fi_phrase" ->
      """SELECT doc_id FROM documents WHERE doc_id % 2 = 0 ORDER BY doc_id""",
    "q_lang_fi_light" ->
      """SELECT doc_id FROM documents WHERE doc_id % 2 = 0 ORDER BY doc_id""",

    "q_lang_lv" ->
      """SELECT doc_id FROM documents WHERE doc_id % 2 = 0 ORDER BY doc_id""",
    "q_lang_br" ->
      """SELECT doc_id FROM documents WHERE doc_id % 2 = 0 ORDER BY doc_id""",
    "q_lang_br_phrase" ->
      """SELECT doc_id FROM documents WHERE doc_id % 2 = 0 ORDER BY doc_id""",
    "q_lang_gl" ->
      """SELECT doc_id FROM documents WHERE doc_id % 2 = 0 ORDER BY doc_id""",
    "q_lang_gl_min" ->
      """SELECT doc_id FROM documents WHERE doc_id % 2 = 0 ORDER BY doc_id""",
    "q_lang_ga" ->
      """SELECT doc_id FROM documents WHERE doc_id % 2 = 0 ORDER BY doc_id""",
    "q_lang_ga_deriv" ->
      """SELECT doc_id FROM documents ORDER BY doc_id""",
    "q_lang_tr" ->
      """SELECT doc_id FROM documents WHERE doc_id % 2 = 0 ORDER BY doc_id""",
    "q_lang_tr_stem" ->
      """SELECT doc_id FROM documents ORDER BY doc_id""",
    "q_lang_ca" ->
      """SELECT doc_id FROM documents WHERE doc_id % 2 = 0 ORDER BY doc_id""",
    "q_lang_ca_elision" ->
      """SELECT doc_id FROM documents ORDER BY doc_id""",
    "q_lang_eu" ->
      """SELECT doc_id FROM documents WHERE doc_id % 2 = 0 ORDER BY doc_id""",
    "q_lang_hy" ->
      """SELECT doc_id FROM documents WHERE doc_id % 2 = 0 ORDER BY doc_id""",
    "q_lang_zh" ->
      """SELECT doc_id FROM documents WHERE doc_id % 2 = 0 ORDER BY doc_id""",
    "q_lang_zh_nogap" ->
      """SELECT doc_id FROM documents WHERE doc_id % 2 = 0 ORDER BY doc_id""",
    "q_html_strip" ->
      """SELECT doc_id FROM documents WHERE doc_id % 2 = 0 ORDER BY doc_id""",
    "q_html_entity" ->
      """SELECT doc_id FROM documents ORDER BY doc_id""",
    "q_html_script" ->
      """SELECT doc_id FROM documents ORDER BY doc_id""",
    "q_charfilter_map" ->
      """SELECT doc_id FROM documents WHERE doc_id % 2 = 0 ORDER BY doc_id""",
    "q_charfilter_patrep" ->
      """SELECT doc_id FROM documents WHERE doc_id % 2 = 0 ORDER BY doc_id""",
    "q_path_hier" ->
      """SELECT doc_id FROM documents WHERE doc_id % 2 = 0 ORDER BY doc_id""",
    "q_path_hier_full" ->
      """SELECT doc_id FROM documents WHERE doc_id % 2 = 1 ORDER BY doc_id""",
    "q_path_rev" ->
      """SELECT doc_id FROM documents WHERE doc_id % 2 = 0 ORDER BY doc_id""",
    "q_pattern_tok" ->
      """SELECT doc_id FROM documents WHERE doc_id % 2 = 0 ORDER BY doc_id""",
    "q_scandinavian" ->
      """SELECT doc_id FROM documents WHERE doc_id % 2 = 0 ORDER BY doc_id""",
    "q_hyphenated" ->
      """SELECT doc_id FROM documents WHERE doc_id % 2 = 0 ORDER BY doc_id""",
    "q_hyphenated_phrase" ->
      """SELECT doc_id FROM documents WHERE doc_id % 2 = 0 ORDER BY doc_id""",
    "q_keyword_repeat" ->
      """SELECT doc_id FROM documents WHERE doc_id % 2 = 0 ORDER BY doc_id""",
    "q_stemmer_override" ->
      """SELECT doc_id FROM documents WHERE doc_id % 2 = 0 ORDER BY doc_id""",
    "q_wiki_link" ->
      """SELECT doc_id FROM documents WHERE doc_id % 2 = 0 ORDER BY doc_id""",
    "q_wiki_heading" ->
      """SELECT doc_id FROM documents WHERE doc_id % 2 = 0 ORDER BY doc_id""",
    "q_wiki_url" ->
      """SELECT doc_id FROM documents WHERE doc_id % 2 = 0 ORDER BY doc_id""",
    "q_wiki_collapsed" ->
      """SELECT doc_id FROM documents WHERE doc_id % 2 = 0 ORDER BY doc_id""",
    "q_wiki_category" ->
      """SELECT doc_id FROM documents WHERE doc_id % 2 = 0 ORDER BY doc_id""",
    "q_uax_email" ->
      """SELECT doc_id FROM documents WHERE doc_id % 2 = 0 ORDER BY doc_id""",
    "q_uax_url" ->
      """SELECT doc_id FROM documents WHERE doc_id % 2 = 0 ORDER BY doc_id""",
    "q_hunspell" ->
      """SELECT doc_id FROM documents WHERE doc_id % 2 = 0 ORDER BY doc_id""",
    "q_hunspell_try" ->
      """SELECT doc_id FROM documents WHERE doc_id % 2 = 1 ORDER BY doc_id""",
    "q_hunspell_iconv" ->
      """SELECT doc_id FROM documents WHERE doc_id % 2 = 0 ORDER BY doc_id""",
    "q_hunspell_circumfix" ->
      """SELECT doc_id FROM documents WHERE doc_id % 2 = 1 ORDER BY doc_id""",
    "q_hyph_compound" ->
      """SELECT doc_id FROM documents WHERE doc_id % 2 = 0 ORDER BY doc_id""",
    "q_hyph_compound_part" ->
      """SELECT doc_id FROM documents WHERE doc_id % 2 = 1 ORDER BY doc_id""",
    "q_kstem" ->
      """SELECT doc_id FROM documents WHERE doc_id % 2 = 0 ORDER BY doc_id""",
    "q_kstem_try" ->
      """SELECT doc_id FROM documents WHERE doc_id % 2 = 1 ORDER BY doc_id""",
    "q_kstem_dict" ->
      """SELECT doc_id FROM documents WHERE doc_id % 2 = 0 ORDER BY doc_id""",
    "q_kstem_ness" ->
      """SELECT doc_id FROM documents WHERE doc_id % 2 = 0 ORDER BY doc_id""",
    "q_kstem_ment" ->
      """SELECT doc_id FROM documents WHERE doc_id % 2 = 1 ORDER BY doc_id""",
    "q_en_minimal" ->
      """SELECT doc_id FROM documents WHERE doc_id % 2 = 0 ORDER BY doc_id""",
    "q_en_possessive" ->
      """SELECT doc_id FROM documents WHERE doc_id % 2 = 0 ORDER BY doc_id""",
    "q_bloom_term" ->
      """SELECT doc_id FROM documents WHERE doc_id % 2 = 0 ORDER BY doc_id""",
    "q_dataset_split" ->
      """WITH t AS (
        |  SELECT doc_id, row_number() OVER (ORDER BY doc_id) - 1 AS b,
        |    (SELECT count(*) FROM documents) AS size
        |  FROM documents),
        |caps AS (SELECT CAST(CEIL(size * 0.2) AS BIGINT) AS capt,
        |                CAST(CEIL(size * 0.1) AS BIGINT) AS capc, * FROM t)
        |SELECT doc_id,
        |  CASE WHEN b % 2 = 0 AND b / 2.0 < capt THEN 'test'
        |       WHEN NOT (b % 2 = 0 AND b / 2.0 < capt)
        |            AND (b // 2 + GREATEST(CAST(CEIL(b / 2.0) AS BIGINT) - capt, 0)) < capc
        |         THEN 'cv'
        |       ELSE 'train' END AS split
        |FROM caps ORDER BY doc_id""".stripMargin,
    "q_suggest_stop" ->
      """WITH sugg AS (
        |  SELECT 'find theory ' || CAST(doc_id AS VARCHAR) AS surface,
        |    (doc_id * 37) % 101 AS weight
        |  FROM documents WHERE doc_id % 2 = 0),
        |top AS (SELECT surface, weight FROM sugg ORDER BY weight DESC, surface ASC LIMIT 5)
        |SELECT surface, weight, CAST(row_number() OVER (ORDER BY weight DESC, surface ASC) AS INT) AS rank
        |FROM top ORDER BY rank""".stripMargin,
    "q_suggest_blended" ->
      """WITH sugg AS (
        |  SELECT (CASE WHEN doc_id % 2 = 0 THEN 'alpha data systems ' ELSE 'data alpha tools ' END)
        |      || CAST(doc_id AS VARCHAR) AS surface,
        |    (doc_id * 37) % 101 AS weight,
        |    CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END AS pos
        |  FROM documents),
        |scored AS (
        |  SELECT surface, CAST(FLOOR(weight * (1.0/(1.0+pos))) AS BIGINT) AS score FROM sugg),
        |top AS (SELECT surface, score FROM scored ORDER BY score DESC, surface ASC LIMIT 5)
        |SELECT surface, score, CAST(row_number() OVER (ORDER BY score DESC, surface ASC) AS INT) AS rank
        |FROM top ORDER BY rank""".stripMargin,

    "q_lang_de_phrase" ->
      """SELECT doc_id FROM documents ORDER BY doc_id""",

    "q_lang_fr" ->
      """SELECT doc_id FROM documents WHERE doc_id % 3 = 0 ORDER BY doc_id""",

    "q_lang_es" ->
      """SELECT doc_id FROM documents WHERE doc_id % 2 = 0 ORDER BY doc_id""",

    "q_lang_es_phrase" ->
      """SELECT doc_id FROM documents ORDER BY doc_id""",

    "q_lang_it" ->
      """SELECT doc_id FROM documents WHERE doc_id % 2 = 0 ORDER BY doc_id""",

    "q_lang_pt" ->
      """SELECT doc_id FROM documents WHERE doc_id % 2 = 0 ORDER BY doc_id""",

    // every de-fixture doc contains Häuser -> haus
    "q_analyzing_parsed" ->
      """SELECT doc_id FROM documents ORDER BY doc_id""",

    "q_percolate" ->
      s"""$P, m AS (
         |  SELECT doc_id, 'p_term' AS query_id FROM tf WHERE term = 'data'
         |  UNION ALL
         |  SELECT a.doc_id, 'p_and' FROM tf a JOIN tf b USING (doc_id)
         |    WHERE a.term = 'vector' AND b.term = 'stream'
         |  UNION ALL
         |  SELECT DISTINCT a.doc_id, 'p_phrase' FROM toks a JOIN toks b
         |    ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
         |    WHERE a.term = 'hash' AND b.term = 'join'
         |  UNION ALL
         |  SELECT DISTINCT doc_id, 'p_prefix' FROM tf WHERE term LIKE 'st%')
         |SELECT doc_id, query_id FROM m ORDER BY doc_id, query_id""".stripMargin,

    // NB twin replicates SimpleNaiveBayesClassifier op-for-op: prior
    // ln(nc)-ln(n); per input word ln((df(w,c)+1)/(avgUnique*nc+n)) with
    // word multiplicity; output is the class RANKING (rank-stable even if
    // ln differs in the last ulp)
    "q_classify_nb" ->
      s"""$P, words(term, mult) AS (VALUES ('data', 1), ('stream', 1), ('engine', 1)),
         |cls AS (SELECT lang AS cls, count(*) AS nc FROM documents GROUP BY lang),
         |tot AS (SELECT (SELECT count(*) FROM tf) AS pairs, (SELECT count(*) FROM documents) AS n),
         |dfc AS (SELECT d.lang AS cls, t.term, count(*) AS df
         |  FROM tf t JOIN documents d USING (doc_id)
         |  WHERE t.term IN (SELECT term FROM words) GROUP BY 1, 2),
         |scored AS (
         |  SELECT c.cls,
         |    ln(CAST(c.nc AS DOUBLE)) - ln(CAST(t.n AS DOUBLE)) +
         |    sum(w.mult * ln((coalesce(d.df, 0) + 1.0) /
         |        ((CAST(t.pairs AS DOUBLE) / t.n) * c.nc + t.n))) AS score
         |  FROM cls c CROSS JOIN words w CROSS JOIN tot t
         |  LEFT JOIN dfc d ON d.cls = c.cls AND d.term = w.term
         |  GROUP BY c.cls, c.nc, t.n, t.pairs)
         |SELECT cls, CAST(row_number() OVER (ORDER BY score DESC, cls ASC) AS INT) AS rank
         |FROM scored ORDER BY rank""".stripMargin,

    "q_classify_knn" ->
      s"""$P, ${scoreCte("a", "data")}, ${scoreCte("b", "stream")}, ${scoreCte("c", "engine")},
         |ab AS (SELECT coalesce(a.doc_id, b.doc_id) AS doc_id,
         |         (coalesce(a.s, 0) + coalesce(b.s, 0)) AS s
         |       FROM scores_a a FULL OUTER JOIN scores_b b ON a.doc_id = b.doc_id),
         |abc AS (SELECT coalesce(ab.doc_id, c.doc_id) AS doc_id,
         |          (coalesce(ab.s, 0) + coalesce(c.s, 0)) AS s
         |        FROM ab FULL OUTER JOIN scores_c c ON ab.doc_id = c.doc_id),
         |top AS (SELECT doc_id FROM abc ORDER BY s DESC, doc_id LIMIT 25),
         |votes AS (SELECT d.lang AS cls, count(*) AS votes
         |  FROM top JOIN documents d USING (doc_id) GROUP BY d.lang)
         |SELECT cls, votes, CAST(row_number() OVER (ORDER BY votes DESC, cls ASC) AS INT) AS rank
         |FROM votes ORDER BY rank""".stripMargin,

    "q_timelimit_topk" ->
      s"""$P, ${scoreCte("a", "data")}
         |SELECT doc_id, CAST(row_number() OVER (ORDER BY s DESC, doc_id) AS INT) AS rank
         |FROM scores_a ORDER BY rank LIMIT 10""".stripMargin,

    // single-segment gate index: docId order == doc_id order, so a tick
    // budget of 1 collects exactly the smallest matching doc_id; the term
    // matches >1 doc, so the collector reports partial results
    "q_timelimit_partial" ->
      s"""$P SELECT doc_id, TRUE AS timed_out FROM
         |(SELECT DISTINCT doc_id FROM toks WHERE term = 'data')
         |ORDER BY doc_id LIMIT 1""".stripMargin,

    "q_cached_replay" ->
      s"""$P, ${scoreCte("a", "vector")}
         |SELECT doc_id, CAST(row_number() OVER (ORDER BY s DESC, doc_id) AS INT) AS rank,
         |(SELECT count(*) FROM scores_a) AS total
         |FROM scores_a ORDER BY rank LIMIT 10""".stripMargin,

    "q_termvector" ->
      s"""$P SELECT term, count(*) AS tf,
         |string_agg(CAST(pos AS VARCHAR), ',' ORDER BY pos) AS pos_list
         |FROM toks WHERE doc_id = 7 GROUP BY term ORDER BY term""".stripMargin,

    "q_parsed_topk" ->
      s"""$P, ${scoreCte("a", "vector")}, ${scoreCte("b", "stream")},
         |ph AS (SELECT DISTINCT a.doc_id FROM toks a JOIN toks b
         |  ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
         |  WHERE a.term = 'hash' AND b.term = 'join')
         |SELECT doc_id, CAST(row_number() OVER (ORDER BY s DESC, doc_id) AS INT) AS rank FROM (
         |  SELECT a.doc_id, (coalesce(a.s, 0) + coalesce(b.s, 0)) AS s
         |  FROM scores_a a LEFT JOIN scores_b b ON a.doc_id = b.doc_id
         |  WHERE a.doc_id NOT IN (SELECT doc_id FROM ph))
         |ORDER BY s DESC, doc_id LIMIT 10""".stripMargin,

    // SimpleQueryParser left-fold: (vector AND stream) OR data
    "q_simple_parsed" ->
      s"""$P SELECT DISTINCT doc_id FROM (
         |  SELECT doc_id FROM tf WHERE term = 'data'
         |  UNION
         |  SELECT a.doc_id FROM tf a JOIN tf b USING (doc_id)
         |  WHERE a.term = 'vector' AND b.term = 'stream')
         |ORDER BY doc_id""".stripMargin,

    // ComplexPhrase "data que*": data immediately followed by a que%-term
    "q_complex_phrase" ->
      s"""$P SELECT DISTINCT a.doc_id FROM toks a JOIN toks b
         |  ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
         |WHERE a.term = 'data' AND b.term LIKE 'que%' ORDER BY 1""".stripMargin,

    // surround 4n(data, stream): two single-term spans, window - 2 <= 3
    "q_surround" ->
      s"""$P SELECT DISTINCT a.doc_id FROM toks a JOIN toks b
         |  ON a.doc_id = b.doc_id AND abs(a.pos - b.pos) <= 4
         |WHERE a.term = 'data' AND b.term = 'stream' ORDER BY 1""".stripMargin,

    // precedence grammar: (vector AND stream) OR (hash AND join)
    "q_precedence_parsed" ->
      s"""$P SELECT DISTINCT doc_id FROM (
         |  SELECT a.doc_id FROM tf a JOIN tf b USING (doc_id)
         |  WHERE a.term = 'vector' AND b.term = 'stream'
         |  UNION
         |  SELECT a.doc_id FROM tf a JOIN tf b USING (doc_id)
         |  WHERE a.term = 'hash' AND b.term = 'join')
         |ORDER BY doc_id""".stripMargin,

    // extension dispatch: prefix(que) minus docs containing 'vector'
    "q_ext_parsed" ->
      s"""$P SELECT DISTINCT doc_id FROM tf WHERE term LIKE 'que%'
         |AND doc_id NOT IN (SELECT doc_id FROM tf WHERE term = 'vector')
         |ORDER BY doc_id""".stripMargin,

    // Expressions twin: bm25 score * ln(1 + n_chars) ranks the matches
    "q_expr_sort" ->
      s"""$P, ${scoreCte("a", "vector")}
         |SELECT doc_id, CAST(row_number() OVER (ORDER BY s2 DESC, doc_id) AS INT) AS rank FROM (
         |  SELECT sa.doc_id, sa.s * ln(1.0 + d.n_chars) AS s2
         |  FROM scores_a sa JOIN documents d USING (doc_id))
         |ORDER BY s2 DESC, doc_id LIMIT 10""".stripMargin,

    // MultiSimilarity twin: bm25_double + tfidf_double (qn = 1, boost = 1;
    // tfidf value = idf*idf written as a product, not pow, for ulp parity)
    "q_multisim_topk" ->
      s"""$P, ms AS (
         |  SELECT tf.doc_id,
         |    ((ln(1 + ((c.n - d.df) + 0.5) / (d.df + 0.5)) * (1.2 + 1)) * tf.tf /
         |     (tf.tf + 1.2 * ((1 - 0.75) + ((0.75 * dl.dl) / (CAST(c.sttf AS DOUBLE) / c.n))))
         |    + (sqrt(tf.tf) * ((ln(c.n / (d.df + 1.0)) + 1.0) * (ln(c.n / (d.df + 1.0)) + 1.0)))
         |      * (1.0 / sqrt(dl.dl))) AS s
         |  FROM tf JOIN dl USING (doc_id) JOIN dfs d ON d.term = tf.term CROSS JOIN consts c
         |  WHERE tf.term = 'vector')
         |SELECT doc_id, CAST(row_number() OVER (ORDER BY s DESC, doc_id) AS INT) AS rank
         |FROM ms ORDER BY s DESC, doc_id LIMIT 10""".stripMargin,

    // auto-stopword derivation twin: terms with df > floor(0.4 * n)
    "q_auto_stopwords" ->
      s"""$P SELECT term FROM dfs CROSS JOIN consts c
         |WHERE df > CAST(floor(0.4 * c.n) AS BIGINT) ORDER BY term""".stripMargin,

    // FuzzyLikeThis expansion twin: per source term, variants with
    // sim = 1 - ed/min(len) > 0 within ed<=2, df0 = exact df else integer
    // avg of variant dfs, idf = ln(n/(df0+1))+1, score = sim^2*idf;
    // top-50 per term by (sim desc, term), global top-20 by (score desc, term)
    "q_fuzzy_mlt" ->
      s"""$P, src(q, ord) AS (VALUES ('vektor', 0), ('strean', 1)),
         |vars AS (
         |  SELECT s.q AS src, s.ord, d.term, d.df,
         |    1.0 - CAST(levenshtein(d.term, s.q) AS DOUBLE)
         |      / least(length(d.term), length(s.q)) AS sim
         |  FROM dfs d CROSS JOIN src s
         |  WHERE levenshtein(d.term, s.q) <= 2
         |    AND abs(length(d.term) - length(s.q)) <= 2),
         |vpos AS (SELECT * FROM vars WHERE sim > 0),
         |stats AS (
         |  SELECT src, count(*) AS nv, sum(df) AS tot,
         |    coalesce(sum(CASE WHEN term = src THEN df END), 0) AS srcdf
         |  FROM vpos GROUP BY src),
         |idfs AS (
         |  SELECT src, ln((SELECT n FROM consts) /
         |    (CASE WHEN srcdf > 0 THEN srcdf ELSE tot // nv END + 1.0)) + 1.0 AS idf
         |  FROM stats),
         |topv AS (
         |  SELECT v.src, v.ord, v.term, (v.sim * v.sim) * i.idf AS score,
         |    row_number() OVER (PARTITION BY v.src ORDER BY v.sim DESC, v.term) AS r
         |  FROM vpos v JOIN idfs i USING (src)),
         |sel AS (
         |  SELECT src, ord, term, score FROM topv WHERE r <= 50
         |  ORDER BY score DESC, term LIMIT 20)
         |SELECT src, term, score FROM sel ORDER BY ord, score, term""".stripMargin,

    // DuplicateFilter KM_USE_FIRST_OCCURRENCE: min doc_id per source value
    "q_duplicate_filter" ->
      s"""$P SELECT min(t.doc_id) AS doc_id FROM tf t JOIN documents d USING (doc_id)
         |WHERE t.term = 'vector' GROUP BY d.source ORDER BY 1""".stripMargin,

    // XML boolean: must vector (scored) + should stream (scored),
    // excluding docs with an ordered hash..join within slop 2
    "q_xml_parsed" ->
      s"""$P, ${scoreCte("a", "vector")}, ${scoreCte("b", "stream")},
         |ph AS (SELECT DISTINCT a.doc_id FROM toks a JOIN toks b
         |  ON a.doc_id = b.doc_id AND b.pos > a.pos AND (b.pos - a.pos - 1) <= 2
         |  WHERE a.term = 'hash' AND b.term = 'join')
         |SELECT doc_id, CAST(row_number() OVER (ORDER BY s DESC, doc_id) AS INT) AS rank FROM (
         |  SELECT a.doc_id, (coalesce(a.s, 0) + coalesce(b.s, 0)) AS s
         |  FROM scores_a a LEFT JOIN scores_b b ON a.doc_id = b.doc_id
         |  WHERE a.doc_id NOT IN (SELECT doc_id FROM ph))
         |ORDER BY s DESC, doc_id LIMIT 10""".stripMargin,

    "q_multiphrase" ->
      s"""$P SELECT DISTINCT a.doc_id FROM toks a JOIN toks b
         |  ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
         |WHERE a.term IN ('hash', 'merge') AND b.term = 'join' ORDER BY 1""".stripMargin,

    // engine op order: per clause w = ((idf * boost) * (k1+1)); chain =
    // ((s_vector + s_stream) + s_phrase) in doubles (power-of-two boosts are
    // exact under any association, but the order is mirrored anyway)
    "q_parsed_boost" ->
      s"""$P, bs_a AS (
         |  SELECT tf.doc_id,
         |    ((ln(1 + ((c.n - d.df) + 0.5) / (d.df + 0.5)) * 2.0) * (1.2 + 1)) * tf.tf /
         |    (tf.tf + 1.2 * ((1 - 0.75) + ((0.75 * dl.dl) / (CAST(c.sttf AS DOUBLE) / c.n)))) AS s
         |  FROM tf JOIN dl USING (doc_id) JOIN dfs d ON d.term = tf.term CROSS JOIN consts c
         |  WHERE tf.term = 'vector'),
         |${scoreCte("b", "stream")},
         |pf AS (
         |  SELECT a.doc_id, count(*) AS freq FROM toks a JOIN toks b
         |    ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
         |  WHERE a.term = 'hash' AND b.term = 'join' GROUP BY a.doc_id),
         |ps AS (
         |  SELECT pf.doc_id,
         |    (((ln(1 + ((c.n - dh.df) + 0.5) / (dh.df + 0.5))
         |       + ln(1 + ((c.n - dj.df) + 0.5) / (dj.df + 0.5))) * 4.0) * (1.2 + 1)) * pf.freq /
         |    (pf.freq + 1.2 * ((1 - 0.75) + ((0.75 * dl.dl) / (CAST(c.sttf AS DOUBLE) / c.n)))) AS s
         |  FROM pf JOIN dl USING (doc_id) CROSS JOIN consts c
         |  JOIN dfs dh ON dh.term = 'hash' JOIN dfs dj ON dj.term = 'join'),
         |m AS (
         |  SELECT coalesce(ab.doc_id, p.doc_id) AS doc_id,
         |         (coalesce(ab.s, 0) + coalesce(p.s, 0)) AS s
         |  FROM (
         |    SELECT coalesce(a.doc_id, b.doc_id) AS doc_id,
         |           (coalesce(a.s, 0) + coalesce(b.s, 0)) AS s
         |    FROM bs_a a FULL OUTER JOIN scores_b b ON a.doc_id = b.doc_id) ab
         |  FULL OUTER JOIN ps p ON ab.doc_id = p.doc_id)
         |SELECT doc_id, CAST(row_number() OVER (ORDER BY s DESC, doc_id) AS INT) AS rank
         |FROM m ORDER BY s DESC, doc_id LIMIT 10""".stripMargin,

    "q_field_group" ->
      s"""$P SELECT DISTINCT doc_id FROM tf JOIN documents USING (doc_id)
         |WHERE term = 'vector' AND source IN ('src3', 'src4') ORDER BY doc_id""".stripMargin,

    "q_field_phrase" ->
      s"""$P SELECT DISTINCT a.doc_id FROM toks a JOIN toks b
         |  ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
         |WHERE a.term = 'hash' AND b.term = 'join' ORDER BY 1""".stripMargin,

    "q_field_term" ->
      """SELECT doc_id FROM documents WHERE source = 'src3' ORDER BY doc_id""",

    "q_field_bool" ->
      s"""$P SELECT DISTINCT doc_id FROM tf JOIN documents USING (doc_id)
         |WHERE term = 'vector' AND source = 'src3' ORDER BY doc_id""".stripMargin,

    // lang leaf = TFIDF double twin with qn=1 on a keyword field (tf=1,
    // len=1): score = idf*idf, idf = ln(n/(dfl+1)) + 1; text leaf = BM25
    "q_perfield_topk" ->
      s"""$P, ${scoreCte("a", "vector")},
         |lconst AS (SELECT count(*) AS dfl FROM documents WHERE lang = 'en'),
         |scores_l AS (
         |  SELECT d.doc_id,
         |    ((ln(c.n / (lc.dfl + 1.0)) + 1) * (ln(c.n / (lc.dfl + 1.0)) + 1)) AS s
         |  FROM documents d CROSS JOIN consts c CROSS JOIN lconst lc
         |  WHERE d.lang = 'en')
         |SELECT doc_id, CAST(row_number() OVER (ORDER BY s DESC, doc_id) AS INT) AS rank FROM (
         |  SELECT coalesce(a.doc_id, l.doc_id) AS doc_id,
         |         (coalesce(a.s, 0) + coalesce(l.s, 0)) AS s
         |  FROM scores_a a FULL OUTER JOIN scores_l l ON a.doc_id = l.doc_id)
         |ORDER BY s DESC, doc_id LIMIT 10""".stripMargin,

    "q_field_topk" ->
      s"""$P, ${scoreCte("a", "vector")},
         |lconst AS (SELECT count(*) AS dfl FROM documents WHERE lang = 'en'),
         |scores_l AS (
         |  SELECT doc_id,
         |    (ln(1 + ((c.n - lc.dfl) + 0.5) / (lc.dfl + 0.5)) * (1.2 + 1)) * 1 /
         |    (1 + 1.2 * ((1 - 0.75) + ((0.75 * 1) / 1.0))) AS s
         |  FROM documents CROSS JOIN consts c CROSS JOIN lconst lc
         |  WHERE lang = 'en')
         |SELECT doc_id, CAST(row_number() OVER (ORDER BY s DESC, doc_id) AS INT) AS rank FROM (
         |  SELECT coalesce(a.doc_id, l.doc_id) AS doc_id,
         |         (coalesce(a.s, 0) + coalesce(l.s, 0)) AS s
         |  FROM scores_a a FULL OUTER JOIN scores_l l ON a.doc_id = l.doc_id)
         |ORDER BY s DESC, doc_id LIMIT 10""".stripMargin,

    "q_field_parsed" ->
      s"""$P SELECT DISTINCT doc_id FROM tf JOIN documents USING (doc_id)
         |WHERE term = 'stream' AND source = 'src3' ORDER BY doc_id""".stripMargin,

    // sweet-spot twin: TFIDF chain with lnorm = 1/sqrt(0.5*(|dl-20|+|dl-40|-20)+1)
    "q_sweet_topk" ->
      s"""$P, iv AS (SELECT ln(c.n / CAST(d.df + 1 AS DOUBLE)) + 1.0 AS idf
         |  FROM dfs d CROSS JOIN consts c WHERE d.term = 'vector'),
         |iw AS (SELECT ln(c.n / CAST(d.df + 1 AS DOUBLE)) + 1.0 AS idf
         |  FROM dfs d CROSS JOIN consts c WHERE d.term = 'stream'),
         |qn AS (SELECT 1.0 / sqrt(iv.idf * iv.idf + iw.idf * iw.idf) AS v FROM iv, iw),
         |sa AS (SELECT tf.doc_id,
         |    (sqrt(tf.tf) * (((iv.idf * 1.0) * qn.v) * iv.idf)) *
         |    (1.0 / sqrt(0.5 * (abs(dl.dl - 20) + abs(dl.dl - 40) - 20) + 1.0)) AS s
         |  FROM tf JOIN dl USING (doc_id) CROSS JOIN iv CROSS JOIN qn WHERE tf.term = 'vector'),
         |sb AS (SELECT tf.doc_id,
         |    (sqrt(tf.tf) * (((iw.idf * 1.0) * qn.v) * iw.idf)) *
         |    (1.0 / sqrt(0.5 * (abs(dl.dl - 20) + abs(dl.dl - 40) - 20) + 1.0)) AS s
         |  FROM tf JOIN dl USING (doc_id) CROSS JOIN iw CROSS JOIN qn WHERE tf.term = 'stream'),
         |m AS (SELECT coalesce(a.doc_id, b.doc_id) AS doc_id,
         |    (coalesce(a.s, 0) + coalesce(b.s, 0)) *
         |    (CAST((CASE WHEN a.s IS NOT NULL THEN 1 ELSE 0 END +
         |           CASE WHEN b.s IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE) / 2) AS s
         |  FROM sa a FULL OUTER JOIN sb b ON a.doc_id = b.doc_id)
         |SELECT doc_id, CAST(row_number() OVER (ORDER BY s DESC, doc_id) AS INT) AS rank
         |FROM m ORDER BY s DESC, doc_id LIMIT 10""".stripMargin,

    // sweet-spot twin: TFIDF chain with lnorm = 1/sqrt(0.5*(|dl-20|+|dl-40|-20)+1)
    "q_sweet_topk" ->
      s"""$P, iv AS (SELECT ln(c.n / CAST(d.df + 1 AS DOUBLE)) + 1.0 AS idf
         |  FROM dfs d CROSS JOIN consts c WHERE d.term = 'vector'),
         |iw AS (SELECT ln(c.n / CAST(d.df + 1 AS DOUBLE)) + 1.0 AS idf
         |  FROM dfs d CROSS JOIN consts c WHERE d.term = 'stream'),
         |qn AS (SELECT 1.0 / sqrt(iv.idf * iv.idf + iw.idf * iw.idf) AS v FROM iv, iw),
         |sa AS (SELECT tf.doc_id,
         |    (sqrt(tf.tf) * (((iv.idf * 1.0) * qn.v) * iv.idf)) *
         |    (1.0 / sqrt(0.5 * (abs(dl.dl - 20) + abs(dl.dl - 40) - 20) + 1.0)) AS s
         |  FROM tf JOIN dl USING (doc_id) CROSS JOIN iv CROSS JOIN qn WHERE tf.term = 'vector'),
         |sb AS (SELECT tf.doc_id,
         |    (sqrt(tf.tf) * (((iw.idf * 1.0) * qn.v) * iw.idf)) *
         |    (1.0 / sqrt(0.5 * (abs(dl.dl - 20) + abs(dl.dl - 40) - 20) + 1.0)) AS s
         |  FROM tf JOIN dl USING (doc_id) CROSS JOIN iw CROSS JOIN qn WHERE tf.term = 'stream'),
         |m AS (SELECT coalesce(a.doc_id, b.doc_id) AS doc_id,
         |    (coalesce(a.s, 0) + coalesce(b.s, 0)) *
         |    (CAST((CASE WHEN a.s IS NOT NULL THEN 1 ELSE 0 END +
         |           CASE WHEN b.s IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE) / 2) AS s
         |  FROM sa a FULL OUTER JOIN sb b ON a.doc_id = b.doc_id)
         |SELECT doc_id, CAST(row_number() OVER (ORDER BY s DESC, doc_id) AS INT) AS rank
         |FROM m ORDER BY s DESC, doc_id LIMIT 10""".stripMargin,

    "q_tfidf_topk" ->
      s"""$P, iv AS (SELECT ln(c.n / CAST(d.df + 1 AS DOUBLE)) + 1.0 AS idf
         |  FROM dfs d CROSS JOIN consts c WHERE d.term = 'vector'),
         |iw AS (SELECT ln(c.n / CAST(d.df + 1 AS DOUBLE)) + 1.0 AS idf
         |  FROM dfs d CROSS JOIN consts c WHERE d.term = 'stream'),
         |qn AS (SELECT 1.0 / sqrt(iv.idf * iv.idf + iw.idf * iw.idf) AS v FROM iv, iw),
         |sa AS (SELECT tf.doc_id,
         |    (sqrt(tf.tf) * (((iv.idf * 1.0) * qn.v) * iv.idf)) * (1.0 / sqrt(dl.dl)) AS s
         |  FROM tf JOIN dl USING (doc_id) CROSS JOIN iv CROSS JOIN qn WHERE tf.term = 'vector'),
         |sb AS (SELECT tf.doc_id,
         |    (sqrt(tf.tf) * (((iw.idf * 1.0) * qn.v) * iw.idf)) * (1.0 / sqrt(dl.dl)) AS s
         |  FROM tf JOIN dl USING (doc_id) CROSS JOIN iw CROSS JOIN qn WHERE tf.term = 'stream'),
         |m AS (SELECT coalesce(a.doc_id, b.doc_id) AS doc_id,
         |    (coalesce(a.s, 0) + coalesce(b.s, 0)) *
         |    (CAST((CASE WHEN a.s IS NOT NULL THEN 1 ELSE 0 END +
         |           CASE WHEN b.s IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE) / 2) AS s
         |  FROM sa a FULL OUTER JOIN sb b ON a.doc_id = b.doc_id)
         |SELECT doc_id, CAST(row_number() OVER (ORDER BY s DESC, doc_id) AS INT) AS rank
         |FROM m ORDER BY s DESC, doc_id LIMIT 10""".stripMargin,

    "q_multiseg_topk" ->
      s"""$P, ${scoreCte("a", "data")}
         |SELECT doc_id, CAST(row_number() OVER (ORDER BY s DESC, doc_id) AS INT) AS rank
         |FROM scores_a ORDER BY s DESC, doc_id LIMIT 10""".stripMargin,

    "q_multiseg_phrase" ->
      s"""$P SELECT DISTINCT a.doc_id FROM toks a JOIN toks b
         |  ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
         |WHERE a.term = 'hash' AND b.term = 'join' ORDER BY 1""".stripMargin,

    "q_merged_docs" ->
      s"""$PDel SELECT DISTINCT doc_id FROM tf WHERE term = 'data' ORDER BY doc_id""",

    "q_merged_topk" ->
      s"""$PDel, ${scoreCte("a", "data")}
         |SELECT doc_id, CAST(row_number() OVER (ORDER BY s DESC, doc_id) AS INT) AS rank
         |FROM scores_a ORDER BY s DESC, doc_id LIMIT 10""".stripMargin,

    "q_merged_count" ->
      """SELECT count(*) AS cnt FROM documents WHERE source <> 'src1'""",

    "q_merged_stats" ->
      s"""$PDel SELECT c.n AS max_doc, CAST(c.sttf AS BIGINT) AS sum_ttf FROM consts c""",

    "q_payload_max" ->
      """SELECT doc_id, CAST(greatest(doc_id % 7, (doc_id + 3) % 7) AS INT) AS pay
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_payload_min" ->
      """SELECT doc_id, CAST(least(doc_id % 7, (doc_id + 3) % 7) AS INT) AS pay
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_payload_avg" ->
      """SELECT doc_id, CAST((doc_id % 7) + ((doc_id + 3) % 7) AS DOUBLE) / 2 AS pay
        |FROM documents ORDER BY doc_id""".stripMargin,

    // distinct payload ints per doc among {id%7, (id+3)%7, id%13}
    "q_payload_spanutil" ->
      """SELECT doc_id, CAST(pay AS INT) AS pay FROM (
        |  SELECT DISTINCT doc_id, doc_id % 7 AS pay FROM documents
        |  UNION SELECT doc_id, (doc_id + 3) % 7 FROM documents
        |  UNION SELECT doc_id, doc_id % 13 FROM documents)
        |ORDER BY doc_id, pay""".stripMargin,

    // span-weight factor constant across docs (equal dfs, fieldLen 3):
    // rank == payload average (doc_id%7 + doc_id%13)/2 desc, doc_id asc
    "q_payload_near" ->
      """SELECT doc_id, CAST(row_number() OVER (
        |  ORDER BY (doc_id % 7) + (doc_id % 13) DESC, doc_id) AS INT) AS rank
        |FROM documents ORDER BY rank LIMIT 15""".stripMargin,

    // analytic twin of the classic-grammar token stream on the fixture
    "q_std_tokens" ->
      """WITH f AS (SELECT doc_id, doc_id % 7 AS k, doc_id % 5 AS m,
        |            CASE WHEN doc_id % 2 = 0 THEN 'school' ELSE 'market' END AS w
        |           FROM documents WHERE doc_id < 10)
        |SELECT doc_id, CAST(u.pos AS INT) AS pos, u.term AS term FROM f, unnest([
        |  {'pos': 1, 'term': 'smith'},
        |  {'pos': 2, 'term': 'ibm'},
        |  {'pos': 3, 'term': 'server'},
        |  {'pos': 4, 'term': 'host' || k || '.example.com'},
        |  {'pos': 5, 'term': 'went'},
        |  {'pos': 7, 'term': w},
        |  {'pos': 9, 'term': 'admin@site' || m || '.org'},
        |  {'pos': 10, 'term': 'about'},
        |  {'pos': 12, 'term': 'data'},
        |  {'pos': 13, 'term': 'engine'}
        |]) AS t(u)
        |ORDER BY doc_id, u.pos""".stripMargin,

    "q_std_phrase" ->
      """SELECT doc_id FROM documents WHERE doc_id % 2 = 0 ORDER BY doc_id""",

    "q_std_host" ->
      """SELECT doc_id FROM documents WHERE doc_id % 7 = 3 ORDER BY doc_id""",

    "q_std_acr_email" ->
      """SELECT doc_id FROM documents WHERE doc_id % 5 = 2 ORDER BY doc_id""",

    // engine op order: p = (ttf+1)/(sttf+1); s = 1.0 * (ln(1 + tf/(2000*p))
    // + ln(2000/(dl+2000))); per-clause clip at 0; clause-ordered sum
    "q_lm_topk" ->
      s"""$P, ttfs AS (SELECT term, sum(tf) AS ttf FROM tf GROUP BY term),
         |lm_a AS (
         |  SELECT tf.doc_id, greatest(
         |    1.0 * (ln(1 + tf.tf / (2000.0 * ((t.ttf + 1.0) / (c.sttf + 1.0))))
         |           + ln(2000.0 / (dl.dl + 2000.0))), 0) AS s
         |  FROM tf JOIN dl USING (doc_id) JOIN ttfs t ON t.term = tf.term CROSS JOIN consts c
         |  WHERE tf.term = 'vector'),
         |lm_b AS (
         |  SELECT tf.doc_id, greatest(
         |    1.0 * (ln(1 + tf.tf / (2000.0 * ((t.ttf + 1.0) / (c.sttf + 1.0))))
         |           + ln(2000.0 / (dl.dl + 2000.0))), 0) AS s
         |  FROM tf JOIN dl USING (doc_id) JOIN ttfs t ON t.term = tf.term CROSS JOIN consts c
         |  WHERE tf.term = 'stream')
         |SELECT doc_id, CAST(row_number() OVER (ORDER BY s DESC, doc_id) AS INT) AS rank FROM (
         |  SELECT coalesce(a.doc_id, b.doc_id) AS doc_id,
         |         (coalesce(a.s, 0) + coalesce(b.s, 0)) AS s
         |  FROM lm_a a FULL OUTER JOIN lm_b b ON a.doc_id = b.doc_id)
         |ORDER BY s DESC, doc_id LIMIT 10""".stripMargin,

    // engine op order: bd * ln(1 + (((1-0.5)*tf)/dl) / (0.5*p)), no clip;
    // 0.5 is exact in binary so the float param and the SQL double agree
    "q_lmjm_topk" ->
      s"""$P, ttfs AS (SELECT term, sum(tf) AS ttf FROM tf GROUP BY term),
         |jm_a AS (
         |  SELECT tf.doc_id,
         |    1.0 * ln(1 + (((1 - 0.5) * tf.tf) / dl.dl)
         |                 / (0.5 * ((t.ttf + 1.0) / (c.sttf + 1.0)))) AS s
         |  FROM tf JOIN dl USING (doc_id) JOIN ttfs t ON t.term = tf.term CROSS JOIN consts c
         |  WHERE tf.term = 'vector'),
         |jm_b AS (
         |  SELECT tf.doc_id,
         |    1.0 * ln(1 + (((1 - 0.5) * tf.tf) / dl.dl)
         |                 / (0.5 * ((t.ttf + 1.0) / (c.sttf + 1.0)))) AS s
         |  FROM tf JOIN dl USING (doc_id) JOIN ttfs t ON t.term = tf.term CROSS JOIN consts c
         |  WHERE tf.term = 'stream')
         |SELECT doc_id, CAST(row_number() OVER (ORDER BY s DESC, doc_id) AS INT) AS rank FROM (
         |  SELECT coalesce(a.doc_id, b.doc_id) AS doc_id,
         |         (coalesce(a.s, 0) + coalesce(b.s, 0)) AS s
         |  FROM jm_a a FULL OUTER JOIN jm_b b ON a.doc_id = b.doc_id)
         |ORDER BY s DESC, doc_id LIMIT 10""".stripMargin,

    // DFR I(n)L2 double twin, engine op order:
    //   tfn = tf * (ln(1 + (c*avg)/dl)/ln(2)), avg = sttf/n
    //   s = bd * (tfn * (ln((n+1)/(df+0.5))/ln(2))) * (1/(tfn+1))
    "q_dfr_topk" ->
      s"""$P, dfr_a AS (
         |  SELECT tf.doc_id,
         |    (1.0 * ((tf.tf * (ln(1 + (1.0 * (CAST(c.sttf AS DOUBLE) / c.n)) / dl.dl) / ln(2.0)))
         |            * (ln((c.n + 1) / (d.df + 0.5)) / ln(2.0))))
         |      * (1.0 / ((tf.tf * (ln(1 + (1.0 * (CAST(c.sttf AS DOUBLE) / c.n)) / dl.dl) / ln(2.0))) + 1.0)) AS s
         |  FROM tf JOIN dl USING (doc_id) JOIN dfs d ON d.term = tf.term CROSS JOIN consts c
         |  WHERE tf.term = 'vector'),
         |dfr_b AS (
         |  SELECT tf.doc_id,
         |    (1.0 * ((tf.tf * (ln(1 + (1.0 * (CAST(c.sttf AS DOUBLE) / c.n)) / dl.dl) / ln(2.0)))
         |            * (ln((c.n + 1) / (d.df + 0.5)) / ln(2.0))))
         |      * (1.0 / ((tf.tf * (ln(1 + (1.0 * (CAST(c.sttf AS DOUBLE) / c.n)) / dl.dl) / ln(2.0))) + 1.0)) AS s
         |  FROM tf JOIN dl USING (doc_id) JOIN dfs d ON d.term = tf.term CROSS JOIN consts c
         |  WHERE tf.term = 'stream')
         |SELECT doc_id, CAST(row_number() OVER (ORDER BY s DESC, doc_id) AS INT) AS rank FROM (
         |  SELECT coalesce(a.doc_id, b.doc_id) AS doc_id,
         |         (coalesce(a.s, 0) + coalesce(b.s, 0)) AS s
         |  FROM dfr_a a FULL OUTER JOIN dfr_b b ON a.doc_id = b.doc_id)
         |ORDER BY s DESC, doc_id LIMIT 10""".stripMargin,

    // IB LL-DF-H2 double twin: lambda = (df+1)/(n+1);
    //   s = bd * (-ln(lambda/(tfn+lambda)))
    "q_ib_topk" ->
      s"""$P, ib_a AS (
         |  SELECT tf.doc_id,
         |    1.0 * (-ln(((d.df + 1.0) / (c.n + 1.0)) /
         |      ((tf.tf * (ln(1 + (1.0 * (CAST(c.sttf AS DOUBLE) / c.n)) / dl.dl) / ln(2.0)))
         |       + ((d.df + 1.0) / (c.n + 1.0))))) AS s
         |  FROM tf JOIN dl USING (doc_id) JOIN dfs d ON d.term = tf.term CROSS JOIN consts c
         |  WHERE tf.term = 'vector'),
         |ib_b AS (
         |  SELECT tf.doc_id,
         |    1.0 * (-ln(((d.df + 1.0) / (c.n + 1.0)) /
         |      ((tf.tf * (ln(1 + (1.0 * (CAST(c.sttf AS DOUBLE) / c.n)) / dl.dl) / ln(2.0)))
         |       + ((d.df + 1.0) / (c.n + 1.0))))) AS s
         |  FROM tf JOIN dl USING (doc_id) JOIN dfs d ON d.term = tf.term CROSS JOIN consts c
         |  WHERE tf.term = 'stream')
         |SELECT doc_id, CAST(row_number() OVER (ORDER BY s DESC, doc_id) AS INT) AS rank FROM (
         |  SELECT coalesce(a.doc_id, b.doc_id) AS doc_id,
         |         (coalesce(a.s, 0) + coalesce(b.s, 0)) AS s
         |  FROM ib_a a FULL OUTER JOIN ib_b b ON a.doc_id = b.doc_id)
         |ORDER BY s DESC, doc_id LIMIT 10""".stripMargin,

    // DFR G + B + H1 double twin:
    //   tfn = tf*avg/dl; F = ttf+1; lam = F/(n+F)
    //   basic = ln(lam+1)/ln2 + tfn*(ln((1+lam)/lam)/ln2)
    //   ae = (ttf+2)/((df+1)*(tfn+1))   [AfterEffectB: F=ttf+1, n=df+1]
    //   s = (basic)*(ae)
    "q_dfr_gb1_topk" ->
      s"""$P, ttfs AS (SELECT term, sum(tf) AS ttf FROM tf GROUP BY term),
         |g AS (
         |  SELECT tf.doc_id,
         |    (tf.tf * (CAST(c.sttf AS DOUBLE) / c.n) / dl.dl) AS tfn,
         |    ((t.ttf + 1.0) / (c.n + t.ttf + 1.0)) AS lam,
         |    t.ttf AS ttf, d.df AS df
         |  FROM tf JOIN dl USING (doc_id) JOIN dfs d ON d.term = tf.term
         |       JOIN ttfs t ON t.term = tf.term CROSS JOIN consts c
         |  WHERE tf.term = 'vector')
         |SELECT doc_id, CAST(row_number() OVER (ORDER BY s DESC, doc_id) AS INT) AS rank FROM (
         |  SELECT doc_id,
         |    ((ln(lam + 1) / ln(2.0)) + tfn * (ln((1 + lam) / lam) / ln(2.0)))
         |      * ((ttf + 2.0) / ((df + 1.0) * (tfn + 1.0))) AS s
         |  FROM g)
         |ORDER BY s DESC, doc_id LIMIT 10""".stripMargin,

    // DFR P + L + Z(0.3) double twin:
    //   tfn = tf*pow(avg/dl, 0.3); lambda = (ttf+1)/(n+1)
    //   basic = tfn*(ln(tfn/lambda)/ln2) + (lambda + 1/(12*tfn) - tfn)
    //           *(ln(e)/ln2) + 0.5*(ln(2*pi*tfn)/ln2)
    //   ae = 1/(tfn+1); s = basic*ae
    "q_dfr_pz_topk" ->
      s"""$P, ttfs AS (SELECT term, sum(tf) AS ttf FROM tf GROUP BY term),
         |g AS (
         |  SELECT tf.doc_id,
         |    (tf.tf * pow((CAST(c.sttf AS DOUBLE) / c.n) / dl.dl, 0.30000001192092896)) AS tfn,
         |    ((t.ttf + 1.0) / (c.n + 1.0)) AS lambda
         |  FROM tf JOIN dl USING (doc_id) JOIN dfs d ON d.term = tf.term
         |       JOIN ttfs t ON t.term = tf.term CROSS JOIN consts c
         |  WHERE tf.term = 'vector')
         |SELECT doc_id, CAST(row_number() OVER (ORDER BY s DESC, doc_id) AS INT) AS rank FROM (
         |  SELECT doc_id,
         |    (tfn * (ln(tfn / lambda) / ln(2.0))
         |     + (lambda + 1.0 / (12.0 * tfn) - tfn) * (ln(2.718281828459045) / ln(2.0))
         |     + 0.5 * (ln(2 * pi() * tfn) / ln(2.0)))
         |      * (1.0 / (tfn + 1.0)) AS s
         |  FROM g)
         |ORDER BY s DESC, doc_id LIMIT 10""".stripMargin,

    // DFR Ine + (no after effect) + H2(c=1) double twin:
    //   tfn = tf*(ln(1 + avg/dl)/ln2); ne = n*(1 - pow((n-1)/n, ttf))
    //   s = tfn*(ln((n+1)/(ne+0.5))/ln2)
    "q_dfr_ine_topk" ->
      s"""$P, ttfs AS (SELECT term, sum(tf) AS ttf FROM tf GROUP BY term),
         |g AS (
         |  SELECT tf.doc_id,
         |    (tf.tf * (ln(1 + (1.0 * (CAST(c.sttf AS DOUBLE) / c.n)) / dl.dl) / ln(2.0))) AS tfn,
         |    (c.n * (1 - pow((c.n - 1.0) / c.n, t.ttf))) AS ne,
         |    c.n AS n
         |  FROM tf JOIN dl USING (doc_id) JOIN dfs d ON d.term = tf.term
         |       JOIN ttfs t ON t.term = tf.term CROSS JOIN consts c
         |  WHERE tf.term = 'vector')
         |SELECT doc_id, CAST(row_number() OVER (ORDER BY s DESC, doc_id) AS INT) AS rank FROM (
         |  SELECT doc_id, tfn * (ln((n + 1) / (ne + 0.5)) / ln(2.0)) AS s FROM g)
         |ORDER BY s DESC, doc_id LIMIT 10""".stripMargin,

    // IB SPL + TTF + H3(mu=800) double twin:
    //   tfn = (tf + mu*((ttf+1)/(sttf+1)))/(dl+mu)*mu; lambda = (ttf+1)/(n+1)
    //   s = -ln((pow(lambda, tfn/(tfn+1)) - lambda)/(1 - lambda))
    "q_ib_spl_topk" ->
      s"""$P, ttfs AS (SELECT term, sum(tf) AS ttf FROM tf GROUP BY term),
         |g AS (
         |  SELECT tf.doc_id,
         |    ((tf.tf + 800.0 * ((t.ttf + 1.0) / (c.sttf + 1.0))) / (dl.dl + 800.0) * 800.0) AS tfn,
         |    ((t.ttf + 1.0) / (c.n + 1.0)) AS lambda
         |  FROM tf JOIN dl USING (doc_id) JOIN dfs d ON d.term = tf.term
         |       JOIN ttfs t ON t.term = tf.term CROSS JOIN consts c
         |  WHERE tf.term = 'vector')
         |SELECT doc_id, CAST(row_number() OVER (ORDER BY s DESC, doc_id) AS INT) AS rank FROM (
         |  SELECT doc_id,
         |    -ln((pow(lambda, tfn / (tfn + 1.0)) - lambda) / (1.0 - lambda)) AS s
         |  FROM g)
         |ORDER BY s DESC, doc_id LIMIT 10""".stripMargin,

    "q_deleted" ->
      s"""$P SELECT DISTINCT doc_id FROM tf WHERE term = 'data'
         |AND doc_id NOT IN (SELECT doc_id FROM documents WHERE source = 'src1')
         |ORDER BY doc_id""".stripMargin,

    // NOTE: scores use the FULL corpus statistics (deletes do not decrement
    // df/maxDoc/avgdl until merged away) — only the result set shrinks
    "q_deleted_topk" ->
      s"""$P, ${scoreCte("a", "data")}
         |SELECT doc_id, CAST(row_number() OVER (ORDER BY s DESC, doc_id) AS INT) AS rank
         |FROM scores_a
         |WHERE doc_id NOT IN (SELECT doc_id FROM documents WHERE source = 'src1')
         |ORDER BY s DESC, doc_id LIMIT 10""".stripMargin,

    "q_deleted_count" ->
      """SELECT count(*) AS cnt FROM documents WHERE source <> 'src1'""",

    "q_search_after" ->
      s"""$P, ${scoreCte("a", "data")},
         |ord AS (SELECT doc_id, row_number() OVER (ORDER BY s DESC, doc_id) AS rn FROM scores_a)
         |SELECT doc_id, CAST(rn - 5 AS INT) AS rank FROM ord
         |WHERE rn BETWEEN 6 AND 10 ORDER BY rn""".stripMargin,

    "q_common_terms" ->
      s"""$P, sel AS (SELECT 'data' AS term UNION ALL SELECT 'stream'),
         |cls AS (SELECT s.term, CASE WHEN coalesce(d.df, 0) * 1.0 / c.n > 0.4 THEN 1 ELSE 0 END AS high
         |  FROM sel s LEFT JOIN dfs d ON d.term = s.term CROSS JOIN consts c),
         |lowt AS (SELECT term FROM cls WHERE high = 0),
         |hight AS (SELECT term FROM cls WHERE high = 1),
         |lowmatch AS (
         |  SELECT doc_id FROM tf JOIN lowt USING (term) GROUP BY doc_id
         |  HAVING count(DISTINCT term) = (SELECT count(*) FROM lowt))
         |SELECT DISTINCT doc_id FROM (
         |  SELECT doc_id FROM lowmatch WHERE (SELECT count(*) FROM lowt) > 0
         |  UNION ALL
         |  SELECT doc_id FROM tf JOIN hight USING (term)
         |  WHERE (SELECT count(*) FROM lowt) = 0)
         |ORDER BY doc_id""".stripMargin,

    "q_suggest" ->
      s"""$P SELECT term, df, CAST(row_number() OVER (ORDER BY df DESC, term ASC) AS INT) AS rank
         |FROM dfs WHERE term LIKE 'st%' ORDER BY rank LIMIT 5""".stripMargin,

    "q_suggest_freetext" ->
      s"""$P, bg AS (
         |  SELECT b.term AS term, count(*) AS cnt FROM toks a JOIN toks b
         |    ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
         |  WHERE a.term = 'data' GROUP BY b.term),
         |top AS (SELECT term, cnt FROM bg ORDER BY cnt DESC, term ASC LIMIT 5)
         |SELECT term, cnt, CAST(row_number() OVER (ORDER BY cnt DESC, term ASC) AS INT) AS rank
         |FROM top ORDER BY rank""".stripMargin,

    "q_suggest_infix" ->
      s"""$P, top AS (
         |  SELECT term, df FROM dfs WHERE term LIKE '%ata%'
         |  ORDER BY df DESC, term ASC LIMIT 5)
         |SELECT term, df, CAST(row_number() OVER (ORDER BY df DESC, term ASC) AS INT) AS rank
         |FROM top ORDER BY rank""".stripMargin,

    "q_suggest_fuzzy" ->
      s"""$P, top AS (
         |  SELECT term, df FROM dfs WHERE levenshtein(substr(term, 1, 5), 'strem') <= 1
         |  ORDER BY df DESC, term ASC LIMIT 5)
         |SELECT term, df, CAST(row_number() OVER (ORDER BY df DESC, term ASC) AS INT) AS rank
         |FROM top ORDER BY rank""".stripMargin,

    "q_spell" ->
      s"""$P, d AS (SELECT term, count(*) AS df FROM tf GROUP BY term)
         |SELECT term, CAST(row_number() OVER (
         |  ORDER BY levenshtein(term, 'strema') ASC, df DESC, term ASC) AS INT) AS rank
         |FROM d WHERE levenshtein(term, 'strema') <= 2 AND term <> 'strema'
         |ORDER BY rank LIMIT 5""".stripMargin,

    "q_wordbreak" ->
      s"""$P, d AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
         |splits AS (
         |  SELECT substr('hashjoin', 1, i) AS l, substr('hashjoin', i + 1) AS r
         |  FROM unnest(generate_series(1, length('hashjoin') - 1)) AS t(i))
         |SELECT l AS left, r AS right, CAST(row_number() OVER (
         |  ORDER BY (dl.df + dr.df) DESC, l ASC) AS INT) AS rank
         |FROM splits JOIN d dl ON dl.term = l JOIN d dr ON dr.term = r
         |ORDER BY rank LIMIT 5""".stripMargin,

    "q_highlight" ->
      """WITH arrs AS (
        |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS arr FROM documents),
        |hits AS (
        |  SELECT doc_id, arr, list_position(arr, 'vector') AS p FROM arrs)
        |SELECT doc_id,
        |  array_to_string(list_slice(arr, greatest(p - 3, 1), greatest(p - 3, 1) + 6), ' ') AS snippet
        |FROM hits WHERE p IS NOT NULL AND p > 0 ORDER BY doc_id""".stripMargin,

    "q_highlight_best" ->
      """WITH arrs AS (
        |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS arr FROM documents),
        |toks AS (
        |  SELECT doc_id, arr[i] AS term, i - 1 AS pos
        |  FROM arrs, unnest(generate_series(1, len(arr))) AS t(i)),
        |m AS (SELECT doc_id, pos, term FROM toks WHERE term IN ('vector', 'stream')),
        |scored AS (
        |  SELECT c.doc_id, c.pos AS start,
        |    count(DISTINCT m2.term) AS nterm, count(*) AS nmatch
        |  FROM m c JOIN m m2 ON m2.doc_id = c.doc_id
        |    AND m2.pos >= c.pos AND m2.pos < c.pos + 7
        |  GROUP BY c.doc_id, c.pos),
        |best AS (
        |  SELECT doc_id, start FROM (
        |    SELECT doc_id, start, row_number() OVER (
        |      PARTITION BY doc_id ORDER BY nterm DESC, nmatch DESC, start ASC) AS rn
        |    FROM scored) WHERE rn = 1)
        |SELECT b.doc_id, array_to_string(a.arr[b.start + 1:b.start + 7], ' ') AS snippet
        |FROM best b JOIN arrs a USING (doc_id) ORDER BY b.doc_id""".stripMargin,

    "q_numrange" ->
      """SELECT l_returnflag, count(*) AS cnt FROM lineitem
        |WHERE l_quantity >= 10 AND l_quantity < 30 AND l_shipdate >= '1995-01-01'
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_checkindex" ->
      s"""$P SELECT (SELECT count(*) FROM documents) AS docs,
         |  (SELECT count(*) FROM dfs) AS posting_rows,
         |  CAST(0 AS BIGINT) AS violations""".stripMargin,

    "q_group_search" ->
      s"""$P, ${scoreCte("a", "vector")}
         |SELECT source, doc_id, rn FROM (
         |  SELECT d.source, s.doc_id,
         |    CAST(row_number() OVER (
         |      PARTITION BY d.source ORDER BY s.s DESC, s.doc_id ASC) AS INT) AS rn
         |  FROM scores_a s JOIN documents d USING (doc_id))
         |WHERE rn <= 2 ORDER BY source, rn""".stripMargin,

    "q_sort_field" ->
      s"""$P SELECT doc_id, CAST(row_number() OVER (ORDER BY n_chars DESC, doc_id) AS INT) AS rank
         |FROM documents WHERE doc_id IN (SELECT DISTINCT doc_id FROM tf WHERE term = 'vector')
         |ORDER BY rank LIMIT 15""".stripMargin,

    "q_spannear" ->
      s"""$P SELECT DISTINCT a.doc_id FROM toks a JOIN toks b
         |  ON a.doc_id = b.doc_id AND b.pos > a.pos AND (b.pos - a.pos - 1) <= 2
         |WHERE a.term = 'hash' AND b.term = 'join' ORDER BY 1""".stripMargin,

    "q_spanscore_topk" ->
      s"""$P, sp AS (
         |  SELECT DISTINCT a.doc_id, a.pos AS s, b.pos + 1 AS e
         |  FROM toks a JOIN toks b
         |    ON a.doc_id = b.doc_id AND b.pos > a.pos AND (b.pos - a.pos - 1) <= 2
         |  WHERE a.term = 'hash' AND b.term = 'join'),
         |pf AS (SELECT doc_id, sum(1.0 / ((e - s) + 1) ORDER BY s, e) AS freq FROM sp GROUP BY doc_id),
         |ps AS (
         |  SELECT pf.doc_id,
         |    ((ln(1 + ((c.n - dh.df) + 0.5) / (dh.df + 0.5))
         |      + ln(1 + ((c.n - dj.df) + 0.5) / (dj.df + 0.5))) * (1.2 + 1)) * pf.freq /
         |    (pf.freq + 1.2 * ((1 - 0.75) + ((0.75 * dl.dl) / (CAST(c.sttf AS DOUBLE) / c.n)))) AS s
         |  FROM pf JOIN dl USING (doc_id) CROSS JOIN consts c
         |  JOIN dfs dh ON dh.term = 'hash' JOIN dfs dj ON dj.term = 'join')
         |SELECT doc_id, CAST(row_number() OVER (ORDER BY s DESC, doc_id) AS INT) AS rank
         |FROM ps ORDER BY s DESC, doc_id LIMIT 10""".stripMargin,

    "q_spannear_un" ->
      s"""$P SELECT DISTINCT a.doc_id FROM toks a JOIN toks b
         |  ON a.doc_id = b.doc_id AND a.pos <> b.pos
         |  AND (greatest(a.pos, b.pos) - least(a.pos, b.pos) - 1) <= 1
         |WHERE a.term = 'vector' AND b.term = 'stream' ORDER BY 1""".stripMargin,

    "q_filtered" ->
      s"""$P, ${scoreCte("a", "vector")}
         |SELECT doc_id, CAST(row_number() OVER (ORDER BY s DESC, doc_id) AS INT) AS rank
         |FROM scores_a JOIN documents USING (doc_id)
         |WHERE source = 'src3' ORDER BY rank""".stripMargin,

    "q_boosting" ->
      s"""$P, ${scoreCte("a", "vector")},
         |ctx AS (SELECT DISTINCT doc_id FROM tf WHERE term = 'stream'),
         |b AS (SELECT sc.doc_id,
         |    CASE WHEN c.doc_id IS NOT NULL THEN sc.s * 0.5 ELSE sc.s END AS s
         |  FROM scores_a sc LEFT JOIN ctx c ON c.doc_id = sc.doc_id)
         |SELECT doc_id, CAST(row_number() OVER (ORDER BY s DESC, doc_id) AS INT) AS rank
         |FROM b ORDER BY rank""".stripMargin,

    "q_chained_filter" ->
      s"""$P SELECT DISTINCT t.doc_id FROM tf t JOIN documents d USING (doc_id)
         |WHERE t.term = 'vector' AND (d.source = 'src1' OR d.source = 'src3')
         |  AND d.lang <> 'en' ORDER BY 1""".stripMargin,

    "q_custom_score" ->
      s"""$P, ${scoreCte("a", "vector")}
         |SELECT doc_id, CAST(row_number() OVER (ORDER BY s2 DESC, doc_id) AS INT) AS rank FROM (
         |  SELECT a.doc_id, a.s * ln(1.0 + dl.dl) AS s2
         |  FROM scores_a a JOIN dl ON dl.doc_id = a.doc_id)
         |ORDER BY s2 DESC, doc_id LIMIT 10""".stripMargin,

    "q_rescore" ->
      s"""$P, ${scoreCte("a", "vector")}, ${scoreCte("b", "stream")},
         |pf AS (
         |  SELECT x.doc_id, count(*) AS freq FROM toks x JOIN toks y
         |    ON x.doc_id = y.doc_id AND y.pos = x.pos + 1
         |  WHERE x.term = 'hash' AND y.term = 'join' GROUP BY x.doc_id),
         |ps AS (
         |  SELECT pf.doc_id,
         |    ((ln(1 + ((c.n - dh.df) + 0.5) / (dh.df + 0.5))
         |      + ln(1 + ((c.n - dj.df) + 0.5) / (dj.df + 0.5))) * (1.2 + 1)) * pf.freq /
         |    (pf.freq + 1.2 * ((1 - 0.75) + ((0.75 * dl.dl) / (CAST(c.sttf AS DOUBLE) / c.n)))) AS s
         |  FROM pf JOIN dl USING (doc_id) CROSS JOIN consts c
         |  JOIN dfs dh ON dh.term = 'hash' JOIN dfs dj ON dj.term = 'join'),
         |base AS (
         |  SELECT coalesce(a.doc_id, b.doc_id) AS doc_id,
         |         (coalesce(a.s, 0) + coalesce(b.s, 0)) AS s
         |  FROM scores_a a FULL OUTER JOIN scores_b b ON a.doc_id = b.doc_id),
         |win AS (SELECT * FROM base ORDER BY s DESC, doc_id LIMIT 20),
         |resc AS (
         |  SELECT w.doc_id, w.s + 2.0 * coalesce(p.s, 0) AS s
         |  FROM win w LEFT JOIN ps p ON p.doc_id = w.doc_id)
         |SELECT doc_id, CAST(row_number() OVER (ORDER BY s DESC, doc_id) AS INT) AS rank
         |FROM resc ORDER BY s DESC, doc_id LIMIT 10""".stripMargin,

    "q_terms_filter" ->
      s"""$P SELECT DISTINCT doc_id FROM tf
         |WHERE term IN ('merge', 'commit') ORDER BY doc_id""".stripMargin,

    "q_boolean_filter" ->
      s"""$P SELECT DISTINCT doc_id FROM tf
         |WHERE term IN ('merge', 'commit')
         |AND doc_id NOT IN (SELECT doc_id FROM tf WHERE term = 'stream')
         |AND doc_id IN (SELECT doc_id FROM tf WHERE term = 'data')
         |ORDER BY doc_id""".stripMargin,

    // reciprocal: 1000/(dl*1+100); rangemap: dl in [50,100] -> 5 else 0;
    // linear: dl*0.01+1 — summed left-to-right like the engine's reduce
    "q_func_query" ->
      s"""$P SELECT doc_id, CAST(row_number() OVER (ORDER BY s DESC, doc_id) AS INT) AS rank
         |FROM (
         |  SELECT doc_id,
         |    1000.0 / (CAST(dl AS DOUBLE) * 1.0 + 100.0)
         |    + (CASE WHEN CAST(dl AS DOUBLE) >= 50.0 AND CAST(dl AS DOUBLE) <= 100.0
         |            THEN 5.0 ELSE 0.0 END)
         |    + (CAST(dl AS DOUBLE) * 0.01 + 1.0) AS s
         |  FROM dl)
         |ORDER BY s DESC, doc_id LIMIT 10""".stripMargin,

    // scale(dl, 0, 1): (dl - minObs) * ((1-0)/(maxObs-minObs)) + 0, min/max
    // observed over ALL docs; score = bm25(vector) * scaled
    "q_func_boosted" ->
      s"""$P, ${scoreCte("a", "vector")},
         |mm AS (SELECT CAST(min(dl) AS DOUBLE) AS mindl,
         |              CAST(max(dl) AS DOUBLE) AS maxdl FROM dl)
         |SELECT doc_id, CAST(row_number() OVER (ORDER BY s DESC, doc_id) AS INT) AS rank
         |FROM (
         |  SELECT a.doc_id,
         |    a.s * ((CAST(dl.dl AS DOUBLE) - mm.mindl)
         |           * ((1.0 - 0.0) / (mm.maxdl - mm.mindl)) + 0.0) AS s
         |  FROM scores_a a JOIN dl USING (doc_id) CROSS JOIN mm)
         |ORDER BY s DESC, doc_id LIMIT 10""".stripMargin,

    // tf('vector') * (ln(n/(df+1))+1) + rord(url) * 1e-4; urls sort like
    // doc_ids (zero-padded), so ord = row_number over doc_id - 1
    "q_func_ord" ->
      s"""$P, idfv AS (
         |  SELECT ln(c.n / (d.df + 1.0)) + 1.0 AS v
         |  FROM dfs d CROSS JOIN consts c WHERE d.term = 'vector'),
         |ords AS (
         |  SELECT doc_id,
         |    CAST(row_number() OVER (ORDER BY doc_id) - 1 AS DOUBLE) AS ord,
         |    (SELECT CAST(count(*) AS DOUBLE) FROM docsrc) AS cnt
         |  FROM docsrc)
         |SELECT doc_id, CAST(row_number() OVER (ORDER BY s DESC, doc_id) AS INT) AS rank
         |FROM (
         |  SELECT o.doc_id,
         |    CAST(coalesce(t.tf, 0) AS DOUBLE) * i.v
         |    + (o.cnt - o.ord - 1.0) * 0.0001 AS s
         |  FROM ords o CROSS JOIN idfv i
         |  LEFT JOIN (SELECT doc_id, tf FROM tf WHERE term = 'vector') t
         |    USING (doc_id))
         |ORDER BY s DESC, doc_id LIMIT 10""".stripMargin,

    "q_span_posrange" ->
      s"""$P SELECT DISTINCT doc_id FROM toks
         |WHERE term = 'vector' AND pos >= 5 AND pos + 1 <= 50
         |ORDER BY doc_id""".stripMargin,

    "q_span_multiterm" ->
      s"""$P SELECT DISTINCT a.doc_id FROM toks a JOIN toks b
         |  ON a.doc_id = b.doc_id
         |  AND (greatest(a.pos, b.pos) - least(a.pos, b.pos) - 1) <= 2
         |WHERE a.term LIKE 'merg%' AND b.term = 'data' ORDER BY 1""".stripMargin,

    // mask fixture: text = "a{id%4} b{(id+2)%5}", surname = "s{id%3}
    // t{(id+1)%4}" — position-aligned AND is analytic over doc_id
    "q_span_fieldmask" ->
      s"""SELECT doc_id FROM documents
         |WHERE (doc_id + 2) % 5 = 1 AND (doc_id + 1) % 4 = 2
         |ORDER BY doc_id""".stripMargin,

    // payload fixture: "alpha|{id%7} beta|{id%13} alpha|{(id+3)%7}"
    "q_span_paycheck" ->
      s"""SELECT doc_id FROM documents
         |WHERE doc_id % 7 = 3 OR (doc_id + 3) % 7 = 3
         |ORDER BY doc_id""".stripMargin,

    "q_span_nearpaycheck" ->
      s"""SELECT doc_id FROM documents
         |WHERE (doc_id % 7) IN (2, 5) AND (doc_id % 13) IN (2, 5)
         |ORDER BY doc_id""".stripMargin,

    // clause order [vector, stream, table^0.5, batch^0.5]; the engine sums
    // clause-ordered ((v+s)+t)+b, so the full outer joins nest the same way
    "q_wordnet_expand" ->
      s"""$P, ${scoreCte("v", "vector")}, ${scoreCte("w", "stream")},
         |${boostedScoreCte("t", "table", "0.5")},
         |${boostedScoreCte("b", "batch", "0.5")},
         |m1 AS (
         |  SELECT coalesce(v.doc_id, w.doc_id) AS doc_id,
         |         (coalesce(v.s, 0) + coalesce(w.s, 0)) AS s
         |  FROM scores_v v FULL OUTER JOIN scores_w w ON v.doc_id = w.doc_id),
         |m2 AS (
         |  SELECT coalesce(m1.doc_id, t.doc_id) AS doc_id,
         |         (coalesce(m1.s, 0) + coalesce(t.s, 0)) AS s
         |  FROM m1 FULL OUTER JOIN scores_t t ON m1.doc_id = t.doc_id),
         |m3 AS (
         |  SELECT coalesce(m2.doc_id, b.doc_id) AS doc_id,
         |         (coalesce(m2.s, 0) + coalesce(b.s, 0)) AS s
         |  FROM m2 FULL OUTER JOIN scores_b b ON m2.doc_id = b.doc_id)
         |SELECT doc_id, CAST(row_number() OVER (ORDER BY s DESC, doc_id) AS INT) AS rank
         |FROM m3 ORDER BY s DESC, doc_id LIMIT 10""".stripMargin
  )
}
