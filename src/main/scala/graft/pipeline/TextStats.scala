package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data curation — all integer/string
  * outputs from codegen'd expressions (SQL-oracle-replicable):
  * quality scoring, marker-based language ID, token counting, fingerprinting.
  */
object TextStats {

  val StopWords33: Seq[String] = graft.analysis.StandardAnalyzer.EnglishStopWords.toSeq.sorted

  private def toksCol(textCol: String): Column =
    expr(s"regexp_extract_all(lower($textCol), '[a-z0-9]+', 0)")

  /** Quality metrics: token count, stopword count, char count, digit-token
    * count — the signals behind length/stopword-ratio quality filters.
    */
  def quality(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val stopArr = StopWords33.map(w => s"'$w'").mkString(", ")
    // tokenize ONCE into an alias the optimizer keeps in its own projection
    // (used 3x and non-cheap, so CollapseProject leaves it): the old shape
    // re-ran the token regex per derived column
    df.select(col(idCol), toksCol(textCol).as("toks"),
        length(col(textCol)).cast("long").as("n_chars"))
      .select(
        col(idCol),
        size(col("toks")).cast("long").as("n_tokens"),
        expr(s"size(filter(toks, x -> array_contains(array($stopArr), x)))")
          .cast("long").as("n_stop"),
        col("n_chars"),
        expr("size(filter(toks, x -> x rlike '^[0-9]+$'))")
          .cast("long").as("n_numeric"))
  }

  /** Marker-word language ID (n-gram-free heuristic): count per-language
    * marker hits; argmax with (count desc, lang asc) tie-break; 0 hits => 'und'.
    */
  val Markers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "en" -> Seq("the", "a", "is", "of", "and"),
    "es" -> Seq("el", "los", "es", "y", "que"),
    "fr" -> Seq("le", "les", "est", "et", "une"))

  def langId(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val counts = Markers.map { case (lang, words) =>
      val arr = words.map(w => s"'$w'").mkString(", ")
      lang -> expr(s"size(filter(toks, x -> array_contains(array($arr), x)))")
        .as(s"c_$lang")
    }
    // one tokenization pass shared by all four marker counters
    val withCounts = df.select(col(idCol), toksCol(textCol).as("toks"))
      .select(col(idCol) +: counts.map(_._2): _*)
    // argmax by (count desc, lang asc): fold a CASE chain in lang order
    val best = Markers.map(_._1).foldLeft(lit("und").as("l") -> lit(0).as("c")) {
      case ((bl, bc), lang) =>
        val c = col(s"c_$lang")
        (when(c > bc, lit(lang)).otherwise(bl), when(c > bc, c).otherwise(bc))
    }
    withCounts.select(col(idCol), best._1.as("pred_lang"))
  }

  /** Token counting: whitespace tokens + a BPE-ish regex segmentation
    * (letter runs / digit runs / single punctuation marks).
    */
  def tokenCounts(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol),
      expr(s"size(regexp_extract_all($textCol, '\\\\S+', 0))").cast("long").as("n_ws"),
      expr(s"size(regexp_extract_all(lower($textCol), '[a-z]+|[0-9]+|[^a-z0-9\\\\s]', 0))")
        .cast("long").as("n_bpe"))

  /** Content fingerprint: md5 of the normalized (tokenized, single-space
    * joined) text — invariant to whitespace/punctuation layout.
    */
  def fingerprint(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol),
      md5(expr(s"cast(concat_ws(' ', regexp_extract_all(lower($textCol), '[a-z0-9]+', 0)) as binary)"))
        .as("fp"))

  /** MoreLikeThis analog (Queries/Mlt/MoreLikeThis.cs:127): top tf-idf terms
    * of one document. idf = the BM25 idf (ln(1+(n-df+0.5)/(df+0.5))).
    */
  def topTfIdfTerms(df: DataFrame, idCol: String, textCol: String,
                    targetId: Long, k: Int): DataFrame = {
    val tf = df.select(col(idCol).as("id"), explode(toksCol(textCol)).as("term"))
      .groupBy("id", "term").agg(count(lit(1)).as("tf"))
    val n = df.count()
    val dfs = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val scored = tf.filter(col("id") === targetId)
      .join(dfs, "term")
      .withColumn("s", col("tf") * log(lit(1d) + ((lit(n) - col("df")) + 0.5d) / (col("df") + 0.5d)))
    graft.Ranks.rankTopK(scored, k, Seq(col("s").desc, col("term").asc))
      .select(col("term"), col("rank"))
  }

  /** URL canonicalization — the web-pipeline normalization pass that runs
    * before URL-level dedup of a crawl: lowercase scheme and host, strip
    * the fragment, drop default ports (http:80 / https:443), drop `utm_*`
    * tracking params, sort surviving query params, collapse trailing path
    * slashes (empty path → "/"). Output: (idCol, canon).
    *
    * Pure codegen'd string/array expressions (regexp_extract / filter /
    * array_sort — no UDF), replicable in a SQL oracle with the same
    * regexes; `[?]` is used instead of `\?` so the pattern text survives
    * both SQL dialects' string escaping identically. One narrow projection,
    * zero shuffles — dedup on the canon column is then one hash groupBy.
    */
  def canonicalUrl(df: DataFrame, idCol: String, urlCol: String): DataFrame =
    df.select(col(idCol), expr(s"regexp_replace($urlCol, '#.*$$', '')").as("base"))
      .select(
        col(idCol),
        expr("lower(regexp_extract(base, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))").as("scheme"),
        expr("lower(regexp_extract(base, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1))").as("hostport"),
        expr("regexp_extract(base, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1)").as("rawpath"),
        expr("regexp_extract(base, '[?](.*)$', 1)").as("query"))
      .select(
        col(idCol),
        concat(
          col("scheme"), lit("://"),
          when(col("scheme") === "http" && col("hostport").endsWith(":80"),
            expr("substr(hostport, 1, length(hostport) - 3)"))
            .when(col("scheme") === "https" && col("hostport").endsWith(":443"),
              expr("substr(hostport, 1, length(hostport) - 4)"))
            .otherwise(col("hostport")),
          when(expr("regexp_replace(rawpath, '/+$', '')") === "", lit("/"))
            .otherwise(expr("regexp_replace(rawpath, '/+$', '')")),
          when(expr("array_join(array_sort(filter(split(query, '&'), " +
              "x -> x != '' AND NOT startswith(x, 'utm_'))), '&')") === "", lit(""))
            .otherwise(concat(lit("?"), expr("array_join(array_sort(filter(split(query, '&'), " +
              "x -> x != '' AND NOT startswith(x, 'utm_'))), '&')")))
        ).as("canon"))

  /** Per-host crawl stats over canonicalized URLs — the webtext corpus
    * health view (docs per host, distinct pages per host, URL-level dup
    * rate): host extracted from the canon form, one hash groupBy with a
    * distinct-on-(host, canon) pre-pass (two partial-aggregated shuffles,
    * both keyed small). Output: (host, n_docs, n_pages).
    */
  def hostStats(df: DataFrame, idCol: String, urlCol: String): DataFrame = {
    val canon = canonicalUrl(df, idCol, urlCol)
      .withColumn("host", expr("regexp_extract(canon, '^[a-z][a-z0-9+.-]*://([^/]+)', 1)"))
    canon.groupBy("host")
      .agg(count(lit(1)).as("n_docs"), countDistinct(col("canon")).as("n_pages"))
  }

  /** MoreLikeThis over INDEX-TIME term vectors — the reference's preferred
    * path (Queries/Mlt/MoreLikeThis.cs:736 RetrieveTerms uses
    * reader.GetTermVector when vectors were stored): the doc is never
    * re-analyzed; its tf comes from the vector row (O(doc) fetch), df from
    * the term dictionary. Same tf·idf ranking as [[topTfIdfTerms]].
    */
  def mltFromVector(se: graft.search.Searcher, segmentId: Int, docId: Int,
                    k: Int): DataFrame = {
    val vec = se.termVector(segmentId, docId)
      .filter(col("field") === se.defaultField)
      .select(col("term"), col("tf"))
    val n = se.maxDoc
    val scored = vec.join(se.dictionary(), "term")
      .withColumn("s", col("tf") * log(lit(1d) + ((lit(n) - col("df")) + 0.5d) / (col("df") + 0.5d)))
    graft.Ranks.rankTopK(scored, k, Seq(col("s").desc, col("term").asc))
      .select(col("term"), col("rank"))
  }
}
