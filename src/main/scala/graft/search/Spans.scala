package graft.search

/** Span query algebra — positional span matching per the reference's
  * Search/Spans family (/root/reference/src/Lucene.Net.Core/Search/Spans/:
  * SpanTermQuery, SpanNearQuery:38 ordered/unordered, SpanNotQuery,
  * SpanOrQuery, SpanFirstQuery). A span is a [start, end) position interval;
  * SpanNear matches when one span per clause fits in a window with
  * (window - total span length) <= slop, respecting order when inOrder.
  *
  * v1 scope: doc-matching (constant score), evaluated by a matcher shared by
  * the Spark executors and the oracle. Enumeration is exact over the per-doc
  * position lists (bounded: positions per term per doc are short).
  */
sealed trait SpanQ extends Serializable
final case class SpanTermS(term: String) extends SpanQ
final case class SpanNearS(clauses: List[SpanQ], slop: Int, inOrder: Boolean) extends SpanQ
final case class SpanOrS(clauses: List[SpanQ]) extends SpanQ
final case class SpanNotS(include: SpanQ, exclude: SpanQ) extends SpanQ
final case class SpanFirstS(inner: SpanQ, end: Int) extends SpanQ
/** SpanPositionRangeQuery.cs:43-51: keep spans with start >= `start` and
  * end <= `end` (SpanFirst is the start=0 case). */
final case class SpanPosRangeS(inner: SpanQ, start: Int, end: Int) extends SpanQ

object SpanMulti {
  /** SpanMultiTermQueryWrapper.cs: a multi-term query (prefix/wildcard/
    * fuzzy/regexp/range) inside a span tree — rewritten to the SpanOr of
    * its matching dictionary terms (the SpanRewriteMethod's
    * SCORING_SPAN_QUERY_REWRITE: one SpanTermQuery per expanded term),
    * budget-capped like every other rewrite. No match -> the shared
    * never-matches sentinel. */
  def wrap(se: Searcher, q: Query, field: String = ""): SpanQ = {
    val f = if (field.isEmpty) se.defaultField else field
    val terms = se.expandMultiTerm(f, q)
    if (terms.isEmpty) SpanTermS(SpanMatcher.NoMatchTerm)
    else SpanOrS(terms.toList.map(SpanTermS))
  }
}

object SpanMatcher {

  type Span = (Int, Int) // [start, end)

  /** Shared never-matches sentinel term (the reference's "Dummy clause
    * because no terms found" span, ComplexPhraseQueryParser.cs:304): NUL
    * delimiters cannot survive any analyzer, so no indexed term — not even
    * a keyword-analyzed stored value — can collide with it. */
  val NoMatchTerm: String = "\u0000-no-match-\u0000"

  def termsOf(q: SpanQ): Set[String] = q match {
    case SpanTermS(t) => Set(t)
    case SpanNearS(cs, _, _) => cs.flatMap(termsOf).toSet
    case SpanOrS(cs) => cs.flatMap(termsOf).toSet
    case SpanNotS(i, e) => termsOf(i) ++ termsOf(e)
    case SpanFirstS(i, _) => termsOf(i)
    case SpanPosRangeS(i, _, _) => termsOf(i)
  }

  /** All spans of `q` in a doc given term -> ascending positions. */
  def spans(q: SpanQ, positions: Map[String, Array[Int]]): List[Span] = q match {
    case SpanTermS(t) =>
      positions.getOrElse(t, Array.empty[Int]).toList.map(p => (p, p + 1))

    case SpanOrS(cs) =>
      cs.flatMap(c => spans(c, positions)).distinct.sorted

    case SpanNotS(inc, exc) =>
      val ex = spans(exc, positions)
      spans(inc, positions).filterNot { case (s, e) =>
        ex.exists { case (xs, xe) => xs < e && s < xe } // overlap
      }

    case SpanFirstS(inner, end) =>
      spans(inner, positions).filter(_._2 <= end)

    case SpanPosRangeS(inner, start, end) =>
      spans(inner, positions).filter(s => s._1 >= start && s._2 <= end)

    case SpanNearS(clauses, slop, inOrder) =>
      val childSpans = clauses.map(c => spans(c, positions))
      if (childSpans.exists(_.isEmpty)) Nil
      else {
        val out = scala.collection.mutable.LinkedHashSet.empty[Span]
        // exact enumeration of one-span-per-clause combinations
        def rec(i: Int, chosen: List[Span]): Unit = {
          if (i == clauses.length) {
            val c = chosen.reverse
            val start = c.map(_._1).min
            val end = c.map(_._2).max
            val totalLen = c.map(s => s._2 - s._1).sum
            // ordered: clause spans must follow query order without overlap
            // (NearSpansOrdered.DocSpansOrdered). Unordered: the reference's
            // AtMatch (NearSpansUnordered.cs:424-427) checks ONLY
            // (max.End - min.Start - totalLength) <= slop — overlapping
            // clause spans (e.g. via SpanOr sharing a term) still match.
            val ok = (end - start - totalLen) <= slop &&
              (!inOrder || c.sliding(2).forall {
                case List(a, b) => a._2 <= b._1
                case _ => true
              })
            if (ok) out += ((start, end))
          } else {
            childSpans(i).foreach(s => rec(i + 1, s :: chosen))
          }
        }
        rec(0, Nil)
        out.toList.sorted
      }
  }

  def matches(q: SpanQ, positions: Map[String, Array[Int]]): Boolean =
    spans(q, positions).nonEmpty
}
