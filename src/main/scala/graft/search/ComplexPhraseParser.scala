package graft.search

import graft.analysis.Analyzer

/** ComplexPhraseQueryParser — classic syntax whose quoted phrases may embed
  * wildcards, prefixes, fuzzy terms, ranges and boolean groups
  * (/root/reference/src/Lucene.Net.QueryParser/ComplexPhrase/
  * ComplexPhraseQueryParser.cs): `"(john jon jonathan~) peters*"~2`.
  *
  * Reference shape: pass 1 parses the outer query, recording each quoted
  * section; pass 2 re-parses each section's contents with the classic
  * grammar and `Rewrite` converts the resulting tree to spans
  * (ComplexPhraseQuery.Rewrite:261-356): each top-level clause becomes one
  * SpanNear position — TermQuery → SpanTerm, boolean-of-alternatives →
  * SpanOr (AddComplexPhraseClause:358-413), multi-term queries expand
  * through the dictionary under SCORING_BOOLEAN_QUERY_REWRITE (Parse:103).
  * MUST_NOT clauses produce SpanNot(include-near(slop+numNegatives),
  * exclude-near(slop)) (:322-355).
  *
  * Our pass-2 expansion happens at parse time against the searcher's
  * dictionary (Searcher.expandMultiTerm — the same scoring-boolean-rewrite
  * expansion, budget-capped), producing `SpanScoreQ`, which scores via
  * sloppyFreq exactly like the reference's SpanNearQuery.
  */
object ComplexPhraseParser {

  private val Marker = "graftcpqmarker"

  def parse(query: String, analyzer: Analyzer, searcher: Searcher,
            inOrder: Boolean = true,
            perField: Map[String, Analyzer] = Map.empty): Query = {
    // pass 1: pull out quoted sections (with optional ~slop), leave markers
    val phrases = scala.collection.mutable.ArrayBuffer.empty[(String, Int)]
    val rewritten = new StringBuilder
    var i = 0
    val n = query.length
    while (i < n) {
      val c = query.charAt(i)
      if (c == '"') {
        val end = query.indexOf('"', i + 1)
        if (end < 0) { rewritten += c; i += 1 } // unmatched: literal
        else {
          val body = query.substring(i + 1, end)
          i = end + 1
          var slop = 0
          if (i < n && query.charAt(i) == '~') {
            var j = i + 1
            while (j < n && Character.isDigit(query.charAt(j))) j += 1
            if (j > i + 1) slop = query.substring(i + 1, j).toInt
            i = j
          }
          // surrounding spaces keep the marker a standalone token even when
          // the quote butts against adjacent text ("a""b", "a"~2x, foo"b")
          rewritten ++= s" $Marker${phrases.length} "
          phrases += ((body, slop))
        }
      } else { rewritten += c; i += 1 }
    }
    val outer = QueryParser.parse(rewritten.toString, analyzer, perField)
    substitute(outer, searcher.defaultField, analyzer, perField, searcher, phrases.toSeq, inOrder)
  }

  /** Replace marker terms by their resolved phrase queries; a FieldQ binding
    * above a marker scopes the phrase's field and analyzer (the reference
    * re-parses contents with `qp.field = this.field`, :247-252). */
  private def substitute(q: Query, field: String, analyzer: Analyzer,
                         perField: Map[String, Analyzer], searcher: Searcher,
                         phrases: Seq[(String, Int)], inOrder: Boolean): Query = q match {
    case TermQ(t, boost) if t.startsWith(Marker) =>
      val (body, slop) = phrases(t.drop(Marker.length).toInt)
      val inner = resolvePhrase(body, slop, field, analyzer, perField, searcher, inOrder)
      Query.withBoost(inner, boost)
    case FieldQ(f, inner) =>
      FieldQ(f, substitute(inner, f, perField.getOrElse(f, analyzer), perField, searcher, phrases, inOrder))
    case BoolQ(cs, msm) =>
      BoolQ(cs.map { case (o, c) => (o, substitute(c, field, analyzer, perField, searcher, phrases, inOrder)) }, msm)
    case DisMaxQ(cs, tb) =>
      DisMaxQ(cs.map(substitute(_, field, analyzer, perField, searcher, phrases, inOrder)), tb)
    case ConstantScoreQ(inner, b) =>
      ConstantScoreQ(substitute(inner, field, analyzer, perField, searcher, phrases, inOrder), b)
    case other => other
  }

  /** ComplexPhraseQuery.Rewrite analog. */
  private def resolvePhrase(body: String, slop: Int, field: String, analyzer: Analyzer,
                            perField: Map[String, Analyzer], searcher: Searcher,
                            inOrder: Boolean): Query = {
    val contents = QueryParser.parse(body, perField.getOrElse(field, analyzer), perField)
    contents match {
      case t: TermQ => t // single-term phrase stays a plain TermQuery (:264-267)
      case BoolQ(clauses, _) =>
        val numNegatives = clauses.count(_._1 == Occur.MustNot)
        val allSpans = clauses.map { case (_, qc) => clauseSpan(qc, field, searcher) }
        if (numNegatives == 0) SpanScoreQ(SpanNearS(allSpans, slop, inOrder))
        else {
          val positives = clauses.zip(allSpans).collect {
            case ((o, _), sp) if o != Occur.MustNot => sp
          }
          val include =
            if (positives.size == 1) positives.head
            // MUST_NOT clauses widen the window they were allowed to occupy
            // (Rewrite:350: slopFactor + numNegatives)
            else SpanNearS(positives, slop + numNegatives, inOrder)
          val exclude = SpanNearS(allSpans, slop, inOrder)
          SpanScoreQ(SpanNotS(include, exclude))
        }
      case other =>
        // a phrase that analyzed/parsed to one non-boolean query (e.g. a
        // lone wildcard): one-position near over its span
        SpanScoreQ(SpanNearS(List(clauseSpan(other, field, searcher)), slop, inOrder))
    }
  }

  /** One phrase position: TermQ → SpanTerm; boolean group → SpanOr (with
    * SpanNot when the group holds MUST_NOTs — AddComplexPhraseClause);
    * multi-term queries expand through the dictionary. */
  private def clauseSpan(q: Query, field: String, searcher: Searcher): SpanQ = q match {
    case TermQ(t, _) => SpanTermS(t)
    case FieldQ(_, inner) => clauseSpan(inner, field, searcher)
    case PhraseQ(ts, _, _) => SpanNearS(ts.map(t => SpanTermS(t._1): SpanQ), 0, inOrder = true)
    case BoolQ(cs, _) =>
      val ors = scala.collection.mutable.ListBuffer.empty[SpanQ]
      val nots = scala.collection.mutable.ListBuffer.empty[SpanQ]
      cs.foreach { case (o, cq) =>
        val dst = if (o == Occur.MustNot) nots else ors
        dst += clauseSpan(cq, field, searcher)
      }
      if (ors.isEmpty) noMatchSpan
      else {
        val soq = if (ors.size == 1) ors.head else SpanOrS(ors.toList)
        if (nots.isEmpty) soq
        else SpanNotS(soq, if (nots.size == 1) nots.head else SpanOrS(nots.toList))
      }
    case mtq @ (PrefixQ(_) | WildcardQ(_) | RegexpQ(_) | RangeQ(_, _, _, _) | FuzzyQ(_, _)) =>
      expandSpan(mtq, field, searcher)
    case FuzzyTopQ(t, me, _, _) => expandSpan(FuzzyQ(t, me), field, searcher)
    case other => noMatchSpan
  }

  private def expandSpan(q: Query, field: String, searcher: Searcher): SpanQ = {
    val terms = searcher.expandMultiTerm(field, q)
    if (terms.isEmpty) noMatchSpan
    else if (terms.size == 1) SpanTermS(terms.head)
    else SpanOrS(terms.map(t => SpanTermS(t): SpanQ).toList)
  }

  /** The reference's "Dummy clause because no terms found" span (:304). */
  private def noMatchSpan: SpanQ = SpanTermS(SpanMatcher.NoMatchTerm)
}
