package graft.search

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Prefix completion suggester — the AnalyzingSuggester/FST-completion analog
  * (/root/reference/src/Lucene.Net.Suggest/Suggest/Analyzing/
  * AnalyzingSuggester.cs): completions of an analyzed prefix ranked by
  * weight. The reference walks a weighted FST; the Spark-native equivalent
  * ranks the (Parquet min/max-prunable) sorted term dictionary by the same
  * weight — here df (ttf works too), tie-break term asc, exactly the
  * suggester's (weight desc, key asc) output order.
  */
object Suggest {

  /** Top-k completions of `prefix` from a (term, df, ttf) dictionary. */
  def complete(dictionary: DataFrame, prefix: String, k: Int): DataFrame =
    graft.Ranks.rankTopK(dictionary.filter(col("term").startsWith(prefix)), k,
        Seq(col("df").desc, col("term").asc))
      .select(col("term"), col("df"), col("rank"))
      .orderBy("rank")

  /** AnalyzingInfixSuggester analog (/root/reference/src/Lucene.Net.Suggest/
    * Suggest/Analyzing/AnalyzingInfixSuggester.cs): completions whose text
    * CONTAINS the analyzed input anywhere (the reference indexes suggestion
    * text with edge n-grams and matches any token prefix), ranked by weight
    * desc then key asc. Here: dictionary terms containing `input` as a
    * substring, weight = df.
    */
  def completeInfix(dictionary: DataFrame, input: String, k: Int): DataFrame =
    graft.Ranks.rankTopK(dictionary.filter(col("term").contains(input)), k,
        Seq(col("df").desc, col("term").asc))
      .select(col("term"), col("df"), col("rank"))
      .orderBy("rank")

  /** FreeTextSuggester analog (/root/reference/src/Lucene.Net.Suggest/
    * Suggest/Analyzing/FreeTextSuggester.cs): an n-gram language model over
    * the corpus token stream, queried for next-word continuations of a
    * context word. The reference walks a weighted n-gram FST; relationally
    * the bigram model is one positional self-join of the token table —
    * continuations ranked by bigram count desc, word asc.
    */
  def freeText(docs: DataFrame, idCol: String, textCol: String,
               context: String, k: Int): DataFrame = {
    val toks = docs.select(col(idCol).as("id"),
        posexplode(expr(s"regexp_extract_all(lower($textCol), '[a-z0-9]+', 0)"))
          .as(Seq("pos", "term")))
    val next = toks.filter(col("term") === context).select(col("id"), col("pos"))
      .join(toks.select(col("id"), (col("pos") - 1).as("pos"), col("term").as("nxt")),
        Seq("id", "pos"))
      .groupBy("nxt").agg(count(lit(1)).as("cnt"))
    graft.Ranks.rankTopK(next, k, Seq(col("cnt").desc, col("nxt").asc))
      .select(col("nxt").as("term"), col("cnt"), col("rank"))
      .orderBy("rank")
  }

  /** AnalyzingSuggester analog proper (/root/reference/src/
    * Lucene.Net.Suggest/Suggest/Analyzing/AnalyzingSuggester.cs): each
    * suggestion's SURFACE form is run through the analysis chain at build
    * time; completion matches the ANALYZED form of the input as a prefix of
    * the suggestion's analyzed form; results return the surface form ranked
    * (weight desc, surface asc). "Runs" therefore completes "Running
    * Systems ..." through the shared stem, which no raw-prefix suggester
    * can do. The reference walks a surface-output FST keyed by analyzed
    * bytes; relationally the analyzed key is a derived column and the
    * prefix match a filter over it.
    *
    * `suggestions` = (surfaceCol: string, weightCol: numeric).
    */
  def completeAnalyzed(suggestions: DataFrame, surfaceCol: String, weightCol: String,
                       analyzerName: String, input: String, k: Int): DataFrame = {
    val spark = suggestions.sparkSession
    import spark.implicits._
    val key = graft.analysis.Analyzers.byName(analyzerName)
      .terms(input).mkString(" ")
    val analyzed = suggestions
      .select(col(surfaceCol).cast("string").as("surface"),
        col(weightCol).cast("long").as("weight"))
      .as[(String, Long)]
      .mapPartitions { rows =>
        val a = graft.analysis.Analyzers.byName(analyzerName)
        rows.map { case (s, w) => (s, w, a.terms(if (s == null) "" else s).mkString(" ")) }
      }.toDF("surface", "weight", "akey")
    graft.Ranks.rankTopK(analyzed.filter(col("akey").startsWith(key)), k,
        Seq(col("weight").desc, col("surface").asc))
      .select(col("surface"), col("weight"), col("rank"))
      .orderBy("rank")
  }

  /** SuggestStopFilter query analysis (/root/reference/src/Lucene.Net.Suggest/
    * Suggest/Analyzing/SuggestStopFilter.cs): stop words drop EXCEPT a
    * trailing one not followed by a separator — the user may still be typing
    * it ("find the" keeps "the" as the prefix token, because it could become
    * "theory"; "find the " drops it). Returns (exact tokens, optional prefix
    * token): with a trailing separator every kept token matches exactly and
    * there is no prefix token (the suggester's prefixToken == null case). */
  def suggestStopAnalyze(input: String,
                         stopWords: Set[String] = graft.analysis.StandardAnalyzer.EnglishStopWords)
      : (List[String], Option[String]) = {
    val raw = input.toLowerCase.split("\\s+").filter(_.nonEmpty).toList
    val endsWithSep = input.nonEmpty && Character.isWhitespace(input.charAt(input.length - 1))
    val kept = raw.zipWithIndex.collect {
      case (t, i) if !stopWords.contains(t) || (i == raw.length - 1 && !endsWithSep) => t
    }
    if (endsWithSep || kept.isEmpty) (kept, None) else (kept.dropRight(1), Some(kept.last))
  }

  /** AnalyzingInfixSuggester lookup with SuggestStopFilter query analysis:
    * all exact tokens must appear in the suggestion (allTermsRequired), the
    * prefix token prefix-matches any token; weight desc, surface asc. */
  def completeSuggestStop(suggestions: DataFrame, surfaceCol: String, weightCol: String,
                          input: String, k: Int,
                          stopWords: Set[String] = graft.analysis.StandardAnalyzer.EnglishStopWords)
      : DataFrame = {
    val (exact, prefix) = suggestStopAnalyze(input, stopWords)
    require(exact.nonEmpty || prefix.nonEmpty, s"input analyzed to nothing: '$input'")
    val toks = split(lower(col(surfaceCol)), "\\s+")
    val condExact = exact.map(t => array_contains(toks, t)).foldLeft(lit(true))(_ && _)
    val cond = prefix match {
      case Some(p) => condExact && exists(toks, t => t.startsWith(lit(p)))
      case None => condExact
    }
    val matched = suggestions
      .select(col(surfaceCol).cast("string").as("surface"),
        col(weightCol).cast("long").as("weight"))
      .filter(cond)
    graft.Ranks.rankTopK(matched, k, Seq(col("weight").desc, col("surface").asc))
      .select(col("surface"), col("weight"), col("rank"))
      .orderBy("rank")
  }

  /** BlendedInfixSuggester analog (/root/reference/src/Lucene.Net.Suggest/
    * Suggest/Analyzing/BlendedInfixSuggester.cs): infix completion where the
    * weight is blended with the POSITION of the first matched token in the
    * suggestion — POSITION_LINEAR: weight*(1 - 0.10*position);
    * POSITION_RECIPROCAL: weight/(1+position); score truncated to long
    * (BlendedInfixSuggester.cs:76-80,183). The reference over-fetches
    * num*numFactor from the unblended index then re-ranks; relationally we
    * rank ALL matches by the blended score directly, which is the exact
    * (non-approximate) form of the same ordering.
    *
    * `suggestions` = (surfaceCol: string, weightCol: numeric); `input` is a
    * single query token, prefix-matched like the suggester's last token.
    */
  def completeBlendedInfix(suggestions: DataFrame, surfaceCol: String, weightCol: String,
                           input: String, k: Int, reciprocal: Boolean = false): DataFrame = {
    val toks = split(lower(col(surfaceCol)), "\\s+")
    val hit = array_position(transform(toks, t => t.startsWith(lit(input.toLowerCase))), true)
    val pos = (hit - 1).cast("double") // 0-based first-match token position
    val coef = if (reciprocal) lit(1.0) / (lit(1.0) + pos)
               else lit(1.0) - lit(0.10) * pos
    val scored = suggestions
      .select(col(surfaceCol).cast("string").as("surface"),
        col(weightCol).cast("long").as("weight"), hit.as("hit"), coef.as("coef"))
      .filter(col("hit") > 0)
      .withColumn("score", (col("weight") * col("coef")).cast("long"))
    graft.Ranks.rankTopK(scored, k, Seq(col("score").desc, col("surface").asc))
      .select(col("surface"), col("score"), col("rank"))
      .orderBy("rank")
  }

  /** FuzzySuggester analog (/root/reference/src/Lucene.Net.Suggest/Suggest/
    * Analyzing/FuzzySuggester.cs): completions whose PREFIX of the input's
    * length is within `maxEdits` Levenshtein of the input (the reference
    * intersects a Levenshtein automaton of the analyzed input with the
    * suggestion FST, then completes), ranked by weight desc then key asc.
    */
  def completeFuzzy(dictionary: DataFrame, input: String, maxEdits: Int, k: Int): DataFrame = {
    val cands = dictionary.filter(
      levenshtein(substring(col("term"), 1, input.length), lit(input)) <= maxEdits)
    graft.Ranks.rankTopK(cands, k, Seq(col("df").desc, col("term").asc))
      .select(col("term"), col("df"), col("rank"))
      .orderBy("rank")
  }
}
