package graft.search

/** Span query algebra — positional span matching per the reference's
  * Search/Spans family (/root/reference/src/Lucene.Net.Core/Search/Spans/:
  * SpanTermQuery, SpanNearQuery:38 ordered/unordered, SpanNotQuery,
  * SpanOrQuery, SpanFirstQuery, FieldMaskingSpanQuery,
  * SpanPayloadCheckQuery, SpanNearPayloadCheckQuery). A span is a
  * [start, end) position interval; SpanNear matches when one span per
  * clause fits in a window with (window - total span length) <= slop,
  * respecting order when inOrder.
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
/** FieldMaskingSpanQuery.cs: `inner` matches against ITS OWN field
  * (`field` here) while participating in a composite built over the
  * enclosing field — 'lying' about its search field. Position-aligned
  * parallel fields (the denormalized studentfirstname/studentsurname
  * example in the reference's class doc) then compose under one SpanNear.
  * Scoring follows the reference's documented behavior: collection stats
  * (norms/avgdl) of the MASKED (enclosing) field, term stats (df/ttf) of
  * each term's real field (SpanWeight builds TermContexts on the actual
  * terms while CreateWeight runs over Field = the mask). */
final case class SpanFieldMaskS(inner: SpanQ, field: String) extends SpanQ
/** SpanPayloadCheckQuery.cs:54-84 AcceptPosition: a span whose position
  * carries NO payload is accepted (the `result == false` fall-through
  * returns YES); with payloads, the collected list must have exactly
  * `payloadToMatch.Count` entries, byte-equal IN ORDER. SpanNearQuery is
  * rejected at construction (ctor throws) — use SpanNearPayloadCheckS. */
final case class SpanPayloadCheckS(inner: SpanQ, payloadToMatch: List[Array[Byte]]) extends SpanQ {
  require(!inner.isInstanceOf[SpanNearS],
    "SpanNearQuery not allowed") // SpanPayloadCheckQuery.cs:47-50
}
/** SpanNearPayloadCheckQuery.cs:45-84 AcceptPosition: payload-less spans are
  * REJECTED (the fall-through returns NO); with payloads, count must equal
  * and each collected payload must byte-equal SOME expected payload
  * (unordered containment count — "can't rely on order here"). */
final case class SpanNearPayloadCheckS(inner: SpanNearS, payloadToMatch: List[Array[Byte]]) extends SpanQ

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

  /** A span with its collected payloads (PayloadSpans.GetPayload analog):
    * one entry per payload-carrying position the span covers, in span
    * collection order (clause order for SpanNear). */
  final case class PSpan(start: Int, end: Int, pays: List[Array[Byte]])

  /** (field, term) -> ascending positions of the doc under evaluation. */
  type PosLookup = (String, String) => Array[Int]
  /** (field, term, position) -> payload bytes at that position; null = none. */
  type PayLookup = (String, String, Int) => Array[Byte]

  val NoPositions: Array[Int] = Array.empty[Int]
  val NoPayloads: PayLookup = (_, _, _) => null

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
    case SpanFieldMaskS(i, _) => termsOf(i)
    case SpanPayloadCheckS(i, _) => termsOf(i)
    case SpanNearPayloadCheckS(i, _) => termsOf(i)
  }

  /** Field-qualified terms: masked subtrees resolve to their REAL field
    * (FieldMaskingSpanQuery.ExtractTerms delegates to the masked query,
    * whose Term objects carry their own field). */
  def fieldTermsOf(q: SpanQ, field: String): Set[(String, String)] = q match {
    case SpanTermS(t) => Set(field -> t)
    case SpanNearS(cs, _, _) => cs.flatMap(fieldTermsOf(_, field)).toSet
    case SpanOrS(cs) => cs.flatMap(fieldTermsOf(_, field)).toSet
    case SpanNotS(i, e) => fieldTermsOf(i, field) ++ fieldTermsOf(e, field)
    case SpanFirstS(i, _) => fieldTermsOf(i, field)
    case SpanPosRangeS(i, _, _) => fieldTermsOf(i, field)
    case SpanFieldMaskS(i, f) => fieldTermsOf(i, f)
    case SpanPayloadCheckS(i, _) => fieldTermsOf(i, field)
    case SpanNearPayloadCheckS(i, _) => fieldTermsOf(i, field)
  }

  /** True when evaluation needs the postings payload stream decoded. */
  def needsPayloads(q: SpanQ): Boolean = q match {
    case SpanPayloadCheckS(_, _) | SpanNearPayloadCheckS(_, _) => true
    case SpanNearS(cs, _, _) => cs.exists(needsPayloads)
    case SpanOrS(cs) => cs.exists(needsPayloads)
    case SpanNotS(i, e) => needsPayloads(i) || needsPayloads(e)
    case SpanFirstS(i, _) => needsPayloads(i)
    case SpanPosRangeS(i, _, _) => needsPayloads(i)
    case SpanFieldMaskS(i, _) => needsPayloads(i)
    case _ => false
  }

  /** True when the tree masks any subtree to a non-default field. */
  def hasFieldMask(q: SpanQ): Boolean = q match {
    case SpanFieldMaskS(_, _) => true
    case SpanNearS(cs, _, _) => cs.exists(hasFieldMask)
    case SpanOrS(cs) => cs.exists(hasFieldMask)
    case SpanNotS(i, e) => hasFieldMask(i) || hasFieldMask(e)
    case SpanFirstS(i, _) => hasFieldMask(i)
    case SpanPosRangeS(i, _, _) => hasFieldMask(i)
    case SpanPayloadCheckS(i, _) => hasFieldMask(i)
    case SpanNearPayloadCheckS(i, _) => hasFieldMask(i)
    case _ => false
  }

  private def payKey(p: PSpan): (Int, Int, List[Seq[Byte]]) =
    (p.start, p.end, p.pays.map(_.toSeq))

  /** All payload-annotated spans of `q` in one doc. `field` is the
    * enclosing field; mask nodes switch it for their subtree. Result is
    * distinct by (start, end, payload bytes), sorted by (start, end). */
  def pspans(q: SpanQ, field: String, pos: PosLookup, pay: PayLookup): List[PSpan] = q match {
    case SpanTermS(t) =>
      pos(field, t).toList.map { p =>
        val pl = pay(field, t, p)
        PSpan(p, p + 1, if (pl == null) Nil else List(pl))
      }

    case SpanOrS(cs) =>
      dedup(cs.flatMap(c => pspans(c, field, pos, pay)))

    case SpanNotS(inc, exc) =>
      val ex = pspans(exc, field, pos, pay)
      pspans(inc, field, pos, pay).filterNot { s =>
        ex.exists(x => x.start < s.end && s.start < x.end) // overlap
      }

    case SpanFirstS(inner, end) =>
      pspans(inner, field, pos, pay).filter(_.end <= end)

    case SpanPosRangeS(inner, start, end) =>
      pspans(inner, field, pos, pay).filter(s => s.start >= start && s.end <= end)

    case SpanFieldMaskS(inner, f) =>
      pspans(inner, f, pos, pay)

    case SpanPayloadCheckS(inner, toMatch) =>
      // SpanPayloadCheckQuery.AcceptPosition: no payload -> YES; else exact
      // count + byte-equal in order
      pspans(inner, field, pos, pay).filter { s =>
        s.pays.isEmpty ||
          (s.pays.lengthCompare(toMatch.length) == 0 &&
            s.pays.zip(toMatch).forall { case (a, b) => java.util.Arrays.equals(a, b) })
      }

    case SpanNearPayloadCheckS(inner, toMatch) =>
      // SpanNearPayloadCheckQuery.AcceptPosition: no payload -> NO; else
      // count equal + each collected payload equals SOME expected one
      // (unordered, first-match-break per candidate)
      pspans(inner, field, pos, pay).filter { s =>
        s.pays.nonEmpty && s.pays.lengthCompare(toMatch.length) == 0 &&
          s.pays.forall(c => toMatch.exists(e => java.util.Arrays.equals(c, e)))
      }

    case SpanNearS(clauses, slop, inOrder) =>
      val childSpans = clauses.map(c => pspans(c, field, pos, pay))
      if (childSpans.exists(_.isEmpty)) Nil
      else {
        val out = scala.collection.mutable.LinkedHashSet.empty[(Int, Int, List[Seq[Byte]])]
        val keep = scala.collection.mutable.ListBuffer.empty[PSpan]
        // exact enumeration of one-span-per-clause combinations
        def rec(i: Int, chosen: List[PSpan]): Unit = {
          if (i == clauses.length) {
            val c = chosen.reverse // clause order
            val start = c.map(_.start).min
            val end = c.map(_.end).max
            val totalLen = c.map(s => s.end - s.start).sum
            // ordered: clause spans must follow query order without overlap
            // (NearSpansOrdered.DocSpansOrdered). Unordered: the reference's
            // AtMatch (NearSpansUnordered.cs:424-427) checks ONLY
            // (max.End - min.Start - totalLength) <= slop — overlapping
            // clause spans (e.g. via SpanOr sharing a term) still match.
            val ok = (end - start - totalLen) <= slop &&
              (!inOrder || c.sliding(2).forall {
                case List(a, b) => a.end <= b.start
                case _ => true
              })
            if (ok) {
              // payloads collected sub-span by sub-span in clause order
              // (NearSpansOrdered.GetPayload gathers child payloads)
              val p = PSpan(start, end, c.flatMap(_.pays))
              if (out.add(payKey(p))) keep += p
            }
          } else {
            childSpans(i).foreach(s => rec(i + 1, s :: chosen))
          }
        }
        rec(0, Nil)
        keep.toList.sortBy(s => (s.start, s.end))
      }
  }

  private def dedup(ss: List[PSpan]): List[PSpan] = {
    val seen = scala.collection.mutable.LinkedHashSet.empty[(Int, Int, List[Seq[Byte]])]
    ss.filter(s => seen.add(payKey(s))).sortBy(s => (s.start, s.end))
  }

  /** Distinct (start, end) spans — the scoring shape (SpanScorer counts each
    * distinct interval once for sloppyFreq). */
  def spansF(q: SpanQ, field: String, pos: PosLookup,
             pay: PayLookup = NoPayloads): List[Span] =
    pspans(q, field, pos, pay).map(s => (s.start, s.end)).distinct.sorted

  /** Single-field compatibility shape (the in-memory oracle/MemoryIndex
    * engines): every field resolves to the one position map — masks become
    * transparent (a one-field index has nothing to mask), and payload
    * checks see a payload-less index (SpanPayloadCheck accepts all spans,
    * SpanNearPayloadCheck none — exactly the reference over an index whose
    * postings carry no payloads). */
  def spans(q: SpanQ, positions: Map[String, Array[Int]]): List[Span] =
    spansF(q, "", (_, t) => positions.getOrElse(t, NoPositions))

  def matches(q: SpanQ, positions: Map[String, Array[Int]]): Boolean =
    spans(q, positions).nonEmpty

  def matchesF(q: SpanQ, field: String, pos: PosLookup, pay: PayLookup): Boolean =
    pspans(q, field, pos, pay).nonEmpty
}
