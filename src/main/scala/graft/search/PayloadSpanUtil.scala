package graft.search

import org.apache.spark.sql.{DataFrame, Dataset}

/** PayloadSpanUtil (Search/Payloads/PayloadSpanUtil.cs): gather the set of
  * payloads touched by a standard query's matches. The reference converts
  * the query to span form (GetPayloadsForQuery:63-113 — BooleanQuery
  * recurses over non-prohibited clauses, PhraseQuery becomes
  * SpanNearQuery(slop, inOrder = slop == 0), TermQuery becomes
  * SpanTermQuery, DisjunctionMaxQuery iterates its disjuncts, span queries
  * pass through) and walks each span's payload collection.
  *
  * Unlike the reference's single-doc MemoryIndex discipline, this runs
  * distributed: one row per (doc, payload occurrence), evaluated with the
  * same leapfrog span machinery as the payload checks.
  */
object PayloadSpanUtil {

  /** Span conversions of `q` whose payloads should be gathered; dictionary
    * queries expand through the budget-capped SpanMulti.wrap (the "query
    * should be rewritten for wild/fuzzy support" contract). */
  def toSpans(se: Searcher, q: Query, field: String): List[SpanQ] = q match {
    case TermQ(t, _) => List(SpanTermS(t))
    case PhraseQ(ts, _, slop) =>
      List(SpanNearS(ts.map(t => SpanTermS(t._1): SpanQ), slop, inOrder = slop == 0))
    case BoolQ(cs, _) =>
      cs.filter(_._1 != Occur.MustNot).flatMap(c => toSpans(se, c._2, field))
    case DisMaxQ(cs, _) => cs.flatMap(toSpans(se, _, field))
    case ConstantScoreQ(inner, _) => toSpans(se, inner, field)
    case FieldQ(f, inner) => toSpans(se, inner, f).map(SpanFieldMaskS(_, f))
    case SpanMatchQ(sp, _) => List(sp)
    case SpanScoreQ(sp, _) => List(sp)
    case PayloadNearQ(sp, _, _) => List(sp)
    case PayloadScoreQ(t, _, _) => List(SpanTermS(t))
    case mtq @ (PrefixQ(_) | WildcardQ(_) | RegexpQ(_) | FuzzyQ(_, _) |
                RangeQ(_, _, _, _)) => List(SpanMulti.wrap(se, mtq, field))
    case _ => Nil
  }

  /** All payloads of the query's span matches: (segmentId, docId, payload)
    * rows, one per payload-carrying position covered by a matching span. */
  def payloadsForQuery(se: Searcher, q: Query, field: String = ""): DataFrame = {
    val f = if (field.isEmpty) se.defaultField else field
    val spark = se.session
    val spans = toSpans(se, q, f)
    val parts = spans.map(sp => Leapfrog.spanPayloads(se, spark, f, sp,
      se.fieldTermStats(SpanMatcher.fieldTermsOf(sp, f))))
    if (parts.isEmpty) {
      import spark.implicits._
      spark.emptyDataset[(Int, Int, Array[Byte])].toDF("segmentId", "docId", "payload")
    } else parts.map(_.toDF("segmentId", "docId", "payload")).reduce(_ union _).distinct()
  }
}
