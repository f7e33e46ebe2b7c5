package graft.search

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

/** Spell suggestion + highlighting decorations over the term dictionary /
  * token streams — the Suggest/Highlighter module analogs (SURVEY.md §2.7).
  */
object Spell {

  /** DirectSpellChecker analog (/root/reference/src/Lucene.Net.Suggest/
    * Spell/DirectSpellChecker.cs): dictionary terms within `maxEdits` of the
    * input, ranked by (edit distance asc, df desc, term asc), top-k.
    * `dictionary` = (term, df, ttf) as produced by Searcher.dictionary().
    */
  def suggest(dictionary: DataFrame, input: String, maxEdits: Int, k: Int): DataFrame = {
    // parallel TakeOrderedAndProject top-k; the <=k winners rank driver-side
    // (no window operator at all — Ranks.rankTopK)
    val cands = dictionary
      .withColumn("dist", levenshtein(col("term"), lit(input)))
      .filter(col("dist") <= maxEdits && col("term") =!= input)
    graft.Ranks.rankTopK(cands, k,
        Seq(col("dist").asc, col("df").desc, col("term").asc))
      .select(col("term"), col("rank"))
      .orderBy("rank")
  }
}

/** Alternative string distances for the spell checker — the
  * DirectSpellChecker `Distance` seam (/root/reference/src/
  * Lucene.Net.Suggest/Spell/JaroWinklerDistance.cs, NGramDistance.cs):
  * semantics-faithful fresh implementations of the published algorithms
  * (Winkler 1990; Kondrak 2005 position-based n-gram distance with the
  * null-prefix discount).
  */
object StringDistances {

  /** Jaro-Winkler similarity, reference semantics: match window
    * max(maxLen/2 - 1, 0); transpositions halved; common prefix NOT capped
    * at 4 (it runs to the shorter string's length, the reference's loop);
    * Winkler bonus min(0.1, 1/maxLen) * prefix * (1-j) applied only when
    * jaro >= threshold (default 0.7). */
  def jaroWinkler(s1: String, s2: String, threshold: Double = 0.7): Double = {
    val (mx, mn) = if (s1.length > s2.length) (s1, s2) else (s2, s1)
    val range = math.max(mx.length / 2 - 1, 0)
    val matchIndexes = Array.fill(mn.length)(-1)
    val matchFlags = new Array[Boolean](mx.length)
    var matches = 0
    var mi = 0
    while (mi < mn.length) {
      val c1 = mn.charAt(mi)
      var xi = math.max(mi - range, 0)
      val xn = math.min(mi + range + 1, mx.length)
      var hit = false
      while (xi < xn && !hit) {
        if (!matchFlags(xi) && c1 == mx.charAt(xi)) {
          matchIndexes(mi) = xi
          matchFlags(xi) = true
          matches += 1
          hit = true
        }
        xi += 1
      }
      mi += 1
    }
    if (matches == 0) return 0d
    val ms1 = new Array[Char](matches)
    val ms2 = new Array[Char](matches)
    var si = 0
    mi = 0
    while (mi < mn.length) {
      if (matchIndexes(mi) != -1) { ms1(si) = mn.charAt(mi); si += 1 }
      mi += 1
    }
    si = 0
    mi = 0
    while (mi < mx.length) {
      if (matchFlags(mi)) { ms2(si) = mx.charAt(mi); si += 1 }
      mi += 1
    }
    val transpositions = (0 until matches).count(i => ms1(i) != ms2(i)) / 2
    var prefix = 0
    mi = 0
    var cont = true
    while (mi < mn.length && cont) {
      if (s1.charAt(mi) == s2.charAt(mi)) prefix += 1 else cont = false
      mi += 1
    }
    val m = matches.toDouble
    val j = (m / s1.length + m / s2.length + (m - transpositions) / m) / 3
    if (j < threshold) j
    else j + math.min(0.1, 1.0 / mx.length) * prefix * (1 - j)
  }

  /** Kondrak n-gram similarity (default bigrams): DP over n-gram windows
    * with an (n-1)-null prefix so the first character participates in n
    * n-grams; null-prefix matches are discounted; result normalized as
    * 1 - cost/max(|s|,|t|). Strings shorter than n compare positionally. */
  def nGram(source: String, target: String, n: Int = 2): Double = {
    val sl = source.length
    val tl = target.length
    if (sl == 0 || tl == 0) return if (sl == tl) 1d else 0d
    if (sl < n || tl < n) {
      var cost = 0
      var i = 0
      val ni = math.min(sl, tl)
      while (i < ni) { if (source.charAt(i) == target.charAt(i)) cost += 1; i += 1 }
      return cost.toDouble / math.max(sl, tl)
    }
    val sa = new Array[Char](sl + n - 1)
    var i = 0
    while (i < sa.length) {
      sa(i) = if (i < n - 1) 0.toChar else source.charAt(i - n + 1)
      i += 1
    }
    var p = Array.tabulate(sl + 1)(_.toDouble)
    var d = new Array[Double](sl + 1)
    val tj = new Array[Char](n)
    var j = 1
    while (j <= tl) {
      if (j < n) {
        var ti = 0
        while (ti < n - j) { tj(ti) = 0.toChar; ti += 1 }
        while (ti < n) { tj(ti) = target.charAt(ti - (n - j)); ti += 1 }
      } else {
        var ti = 0
        while (ti < n) { tj(ti) = target.charAt(j - n + ti); ti += 1 }
      }
      d(0) = j
      i = 1
      while (i <= sl) {
        var cost = 0
        var tn = n
        var ni = 0
        while (ni < n) {
          if (sa(i - 1 + ni) != tj(ni)) cost += 1
          else if (sa(i - 1 + ni) == 0.toChar) tn -= 1
          ni += 1
        }
        val ec = cost.toDouble / tn
        d(i) = math.min(math.min(d(i - 1) + 1, p(i) + 1), p(i - 1) + ec)
        i += 1
      }
      val t = p; p = d; d = t
      j += 1
    }
    1.0 - p(sl) / math.max(tl, sl)
  }

  /** LuceneLevenshteinDistance (Spell/LuceneLevenshteinDistance.cs:32-92):
    * Damerau edit distance (adjacent transposition = 1 edit) normalized as
    * 1 - dist/min(len) — the variant DirectSpellChecker itself scores with.
    * The reference's empty-string branch returns max(n, m) — the raw
    * DISTANCE, not a similarity — and that quirk is preserved. */
  def luceneLevenshtein(target: String, other: String): Double = {
    val n = target.length
    val m = other.length
    if (n == 0 || m == 0) return if (n == m) 0d else math.max(n, m).toDouble
    val d = Array.ofDim[Int](n + 1, m + 1)
    var i = 0
    while (i <= n) { d(i)(0) = i; i += 1 }
    var j = 0
    while (j <= m) { d(0)(j) = j; j += 1 }
    j = 1
    while (j <= m) {
      val tj = other.charAt(j - 1)
      i = 1
      while (i <= n) {
        val cost = if (target.charAt(i - 1) == tj) 0 else 1
        var v = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1), d(i - 1)(j - 1) + cost)
        if (i > 1 && j > 1 && target.charAt(i - 1) == other.charAt(j - 2) &&
            target.charAt(i - 2) == other.charAt(j - 1))
          v = math.min(v, d(i - 2)(j - 2) + cost)
        d(i)(j) = v
        i += 1
      }
      j += 1
    }
    1.0 - d(n)(m).toDouble / math.min(m, n)
  }

  /** DirectSpellChecker with a pluggable similarity
    * (DirectSpellChecker.Distance + SuggestWordQueue comparer: score desc,
    * freq desc, term asc; `accuracy` is the default 0.5 score floor):
    * candidates within `maxEdits`, scored by `distanceName`
    * ("jarowinkler" | "ngram" | "lucenelevenshtein"), top-k. The distance
    * is a native codegen'd expression (SpellDistance) over the already
    * levenshtein-filtered candidate set. */
  def suggestScored(dictionary: DataFrame, input: String, maxEdits: Int, k: Int,
                    distanceName: String, accuracy: Double = 0.5): DataFrame = {
    val cands = dictionary
      .withColumn("ed", levenshtein(col("term"), lit(input)))
      .filter(col("ed") <= maxEdits && col("term") =!= input)
      .withColumn("score",
        graft.functions.ScalarExpressions.spellDistance(distanceName, input, col("term")))
      .filter(col("score") >= accuracy)
    graft.Ranks.rankTopK(cands, k,
        Seq(col("score").desc, col("df").desc, col("term").asc))
      .select(col("term"), col("score"), col("rank"))
      .orderBy("rank")
  }
}

/** WordBreakSpellChecker analog (/root/reference/src/Lucene.Net.Suggest/
  * Spell/WordBreakSpellChecker.cs): split an unbroken input at every cut
  * point where BOTH halves are dictionary terms; ranked by combined df.
  */
object WordBreak {
  def suggest(dictionary: DataFrame, input: String, k: Int): DataFrame = {
    val spark = dictionary.sparkSession
    import spark.implicits._
    val splits = (1 until input.length)
      .map(i => (input.substring(0, i), input.substring(i))).toDF("left", "right")
    val dl = dictionary.select(col("term").as("left"), col("df").as("df_l"))
    val dr = dictionary.select(col("term").as("right"), col("df").as("df_r"))
    val joined = splits.join(dl, "left").join(dr, "right")
    graft.Ranks.rankTopK(joined, k,
        Seq((col("df_l") + col("df_r")).desc, col("left").asc))
      .select("left", "right", "rank")
      .orderBy("rank")
  }
}

/** Top-window re-ranking — the QueryRescorer analog
  * (/root/reference/src/Lucene.Net.Core/Search/QueryRescorer.cs): collect the
  * top `window` hits of the base query, then combine each with the rescore
  * query's score (newScore = base + weight * rescore, missing -> 0) and
  * re-sort. Docs outside the window keep their base ranking excluded.
  */
object Rescorer {
  def rescore(s: Searcher, base: Query, window: Int, rq: Query, weight: Double): DataFrame = {
    val top = s.compile(base)
      .orderBy(col("score").desc, col("segmentId").asc, col("docId").asc)
      .limit(window)
      .withColumnRenamed("score", "baseScore")
    val re = s.compile(rq).withColumnRenamed("score", "reScore")
    broadcast(top).join(re, Seq("segmentId", "docId"), "left_outer")
      .withColumn("score", col("baseScore") + lit(weight) * coalesce(col("reScore"), lit(0d)))
      .select(col("segmentId"), col("docId"), col("score"))
      .orderBy(col("score").desc, col("segmentId").asc, col("docId").asc)
  }
}

/** Token-window fragment extraction — the PostingsHighlighter analog
  * (/root/reference/src/Lucene.Net.Highlighter/Postingshighlight/): fragments
  * are built from analysis-chain token positions, not raw substring search,
  * so "data" never highlights inside "database".
  */
object Highlighter {

  /** For each doc containing `term`, the `before`+1+`after` token window
    * around its FIRST occurrence, joined with spaces: (id, snippet).
    * SQL-parity: array_position / slice / array_join over the same
    * tokenization.
    */
  def firstSnippet(docs: DataFrame, idCol: String, textCol: String,
                   term: String, before: Int, after: Int): DataFrame = {
    val arr: Column = expr(s"regexp_extract_all(lower($textCol), '[a-z0-9]+', 0)")
    docs
      .withColumn("arr", arr)
      .withColumn("p", array_position(col("arr"), term)) // 1-based, 0 if absent
      .filter(col("p") > 0)
      .withColumn("start", greatest(col("p") - before, lit(1)))
      .withColumn("snippet", array_join(
        slice(col("arr"), col("start"), lit(before + 1 + after)), " "))
      .select(col(idCol), col("snippet"))
  }

  /** PASSAGE-SCORED highlighting — the PostingsHighlighter passage-ranking
    * analog (/root/reference/src/Lucene.Net.Highlighter/Postingshighlight/
    * PostingsHighlighter.cs): candidate passages are `window`-token spans
    * anchored at each query-term occurrence; the best passage per doc
    * maximizes (distinct matching terms, total matches, earliest start) —
    * a deterministic stand-in for the reference's weighted passage score
    * that an ANSI-SQL oracle replicates exactly.
    */
  def bestSnippet(docs: DataFrame, idCol: String, textCol: String,
                  terms: Seq[String], window: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = docs.select(col(idCol).as("id"),
      expr(s"regexp_extract_all(lower($textCol), '[a-z0-9]+', 0)").as("arr"))
    val toks = base.select(col("id"),
      posexplode(col("arr")).as(Seq("pos", "term")))
    val matches = toks.filter(col("term").isInCollection(terms))
    // explicit renames on the anchor side: both inputs share a lineage
    // (self-join), so disambiguate by column NAME, not alias resolution
    val cand = matches.select(col("id").as("cid"), col("pos").as("start"))
    val scored = cand.join(matches.as("m"),
        col("m.id") === col("cid") &&
          col("m.pos") >= col("start") && col("m.pos") < col("start") + window)
      .groupBy(col("cid").as("id"), col("start"))
      .agg(countDistinct(col("m.term")).as("nterm"), count(lit(1)).as("nmatch"))
    val best = scored.withColumn("rn", row_number().over(
        Window.partitionBy(col("id"))
          .orderBy(col("nterm").desc, col("nmatch").desc, col("start").asc)))
      .filter(col("rn") === 1)
      .select(col("id"), col("start"))
    best.join(base, "id")
      .withColumn("snippet", array_join(slice(col("arr"), col("start") + 1, lit(window)), " "))
      .select(col("id").as(idCol), col("snippet"))
  }

  /** FastVectorHighlighter analog (/root/reference/src/Lucene.Net.Highlighter/
    * Vectorhighlight/FastVectorHighlighter.cs, FieldTermStack.cs:69-113):
    * fragments come from the INDEX-TIME term vectors' character offsets —
    * the original text is never re-analyzed at highlight time. Candidate
    * fragments are `width`-char windows anchored at each query-term
    * startOffset; the best per doc maximizes (distinct matching terms,
    * total matches, earliest anchor), then the snippet is a raw substring
    * of the stored text at those offsets.
    *
    * `pages` is the doc store (urlCol, textCol); vectors join to it through
    * the searcher's docs table, so the whole path is one partitioned join
    * chain — no driver collect, no re-tokenization.
    */
  def vectorSnippet(se: Searcher, pages: DataFrame, urlCol: String, textCol: String,
                    terms: Seq[String], width: Int): DataFrame = {
    val m = se.termVectors
      .filter(col("field") === se.defaultField && col("term").isInCollection(terms))
      .select(col("segmentId"), col("docId"), col("term"),
        explode(col("starts")).as("start"))
    snippetFromOffsets(se, m, pages, urlCol, textCol, width)
  }

  /** PHRASE-aware FastVectorHighlighter — the FieldPhraseList semantics
    * (/root/reference/src/contrib/FastVectorHighlighter/FieldPhraseList.cs:40-76
    * over FieldTermStack.cs): a fragment highlights only where the COMPLETE
    * phrase matches at consecutive positions — docs containing the terms
    * apart (or reversed) produce nothing, where term-based highlighting
    * would still fire. Each complete match is a WeightedPhraseInfo spanning
    * [start of first term, end of last term] in character offsets; candidate
    * fragments are `width`-char windows anchored at each match start, scored
    * by the number of matches FULLY inside the window (the totalBoost sum
    * with unit boosts, ScoreOrderFragmentsBuilder discipline), best per doc
    * by (matches desc, earliest anchor).
    *
    * Spark shape: per phrase slot i, vector rows for term_i explode to
    * (pos - i, charStart, charEnd); one groupBy on (segment, doc, base)
    * finds complete runs (countDistinct(slot) == phrase length) — a single
    * shuffle keyed by doc, no self-join per adjacent pair, so a 20-term
    * phrase costs the same exchange as a 2-term one.
    */
  def phraseVectorSnippet(se: Searcher, pages: DataFrame, urlCol: String, textCol: String,
                          phrase: Seq[String], width: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(phrase.nonEmpty, "empty phrase")
    val occ = phrase.zipWithIndex.map { case (t, i) =>
      se.termVectors
        .filter(col("field") === se.defaultField && col("term") === t)
        .select(col("segmentId"), col("docId"),
          explode(arrays_zip(col("positions"), col("starts"), col("ends"))).as("z"))
        .select(col("segmentId"), col("docId"), lit(i).as("slot"),
          (col("z.positions") - i).as("base"),
          col("z.starts").as("cstart"), col("z.ends").as("cend"))
    }.reduce(_ unionByName _)
    // complete runs only: slots 0..L-1 all present at the same base position
    val matches = occ.groupBy(col("segmentId"), col("docId"), col("base"))
      .agg(countDistinct(col("slot")).as("nslot"),
        min(struct(col("slot"), col("cstart"))).getField("cstart").as("pstart"),
        max(struct(col("slot"), col("cend"))).getField("cend").as("pend"))
      .filter(col("nslot") === phrase.length)
    val cand = matches.select(col("segmentId").as("cseg"), col("docId").as("cdoc"),
      col("pstart").as("anchor"))
    val scored = cand.join(matches,
        col("segmentId") === col("cseg") && col("docId") === col("cdoc") &&
          col("pstart") >= col("anchor") && col("pend") <= col("anchor") + width)
      .groupBy(col("cseg").as("segmentId"), col("cdoc").as("docId"), col("anchor"))
      .agg(count(lit(1)).as("nmatch"))
    val best = scored.withColumn("rn", row_number().over(
        Window.partitionBy(col("segmentId"), col("docId"))
          .orderBy(col("nmatch").desc, col("anchor").asc)))
      .filter(col("rn") === 1)
      .select(col("segmentId"), col("docId"), col("anchor"))
    best.join(se.docs.select(col("segmentId"), col("docId"), col("url")),
        Seq("segmentId", "docId"))
      .join(pages.select(col(urlCol).as("url"), col(textCol).as("fvh_text")), Seq("url"))
      .withColumn("snippet", expr(s"substring(fvh_text, anchor + 1, $width)"))
      .select(col("url").as(urlCol), col("snippet"))
  }

  /** PostingsHighlighter analog proper (/root/reference/src/
    * Lucene.Net.Highlighter/Postingshighlight/PostingsHighlighter.cs):
    * character offsets come from the POSTINGS' offset stream (IndexOptions
    * ..._AND_OFFSETS, BuildConfig.indexOffsets) — no term vectors stored, no
    * re-analysis at highlight time; candidate passages and the best-passage
    * choice are the same deterministic rule as [[vectorSnippet]], and the
    * snippet is a raw substring of the stored text at those offsets.
    */
  def postingsSnippet(se: Searcher, pages: DataFrame, urlCol: String, textCol: String,
                      terms: Seq[String], width: Int): DataFrame = {
    val m = se.postingsOffsets(terms, se.defaultField)
      .select(col("segmentId"), col("docId"), col("term"), col("start"))
    snippetFromOffsets(se, m, pages, urlCol, textCol, width)
  }

  /** Shared passage scoring + text slicing over (segmentId, docId, term,
    * start) occurrence rows: candidate fragments are `width`-char windows
    * anchored at each occurrence; best per doc = (distinct matching terms,
    * total matches, earliest anchor). */
  private def snippetFromOffsets(se: Searcher, m: DataFrame, pages: DataFrame,
                                 urlCol: String, textCol: String, width: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cand = m.select(col("segmentId").as("cseg"), col("docId").as("cdoc"),
      col("start").as("anchor"))
    val scored = cand.join(m,
        col("segmentId") === col("cseg") && col("docId") === col("cdoc") &&
          col("start") >= col("anchor") && col("start") < col("anchor") + width)
      .groupBy(col("cseg").as("segmentId"), col("cdoc").as("docId"), col("anchor"))
      .agg(countDistinct(col("term")).as("nterm"), count(lit(1)).as("nmatch"))
    val best = scored.withColumn("rn", row_number().over(
        Window.partitionBy(col("segmentId"), col("docId"))
          .orderBy(col("nterm").desc, col("nmatch").desc, col("anchor").asc)))
      .filter(col("rn") === 1)
      .select(col("segmentId"), col("docId"), col("anchor"))
    // one row per highlighted doc — unbounded, so the join strategy is left
    // to Catalyst/AQE (callers highlight a top-k page in practice)
    best.join(se.docs.select(col("segmentId"), col("docId"), col("url")),
        Seq("segmentId", "docId"))
      .join(pages.select(col(urlCol).as("url"), col(textCol).as("vs_text")), Seq("url"))
      .withColumn("snippet", expr(s"substring(vs_text, anchor + 1, $width)"))
      .select(col("url").as(urlCol), col("snippet"))
  }
}
