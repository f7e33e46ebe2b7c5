package graft.search

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.{Hit, PostingRow}
import graft.codec.PostingsCodec

/** Per-segment leapfrog evaluation of Boolean-of-terms queries — the
  * ConjunctionScorer / BooleanScorer2 analog
  * (/root/reference/src/Lucene.Net.Core/Search/ConjunctionScorer.cs:26-133 —
  * cost-sorted cursors, least-frequent list leads;
  * Search/BooleanScorer2.cs req/opt/prohibited combination).
  *
  * Plan shape (the 100 TB shape): the query terms' ENCODED posting rows are
  * shuffled by segment (KBs of compressed blocks per term — proportional to
  * query-term df, never to candidate count... and the shuffle payload is the
  * compressed index, not decoded hits); each task leapfrogs within its
  * segments, decoding only the blocks the rarest clause steers it into, and
  * emits exactly the matching docs. The union+groupBy fallback in
  * Searcher.compileBool shuffles every clause's decoded postings — for
  * `rare AND the` that is corpus-sized; this path is result-sized.
  *
  * Scoring matches the DataFrame path bit-for-bit: per-clause scores summed
  * in clause order (float chain under LuceneFloat, double under ExactDouble),
  * matching BS2's in-order accumulation (SURVEY.md §7.3 rank-identity note).
  */
object Leapfrog {

  /** occur: 0 = Must, 1 = Should, 2 = MustNot. Posting key = (field, term). */
  final case class ClauseSpec(occur: Int, field: String, term: String)

  /** Filter predicate for a set of (field, term) posting keys. */
  private def keysPred(keys: Set[(String, String)]): org.apache.spark.sql.Column =
    keys.groupBy(_._1).map { case (f, ks) =>
      col("field") === f && col("term").isInCollection(ks.map(_._2))
    }.reduce(_ || _)

  /** Positions-free posting rows for the query keys, routed to segment
    * tasks — compressed blocks only cross the wire (shared by the boolean
    * and disMax walks).
    */
  private def slimRows(searcher: Searcher,
                       keys: Set[(String, String)]): Dataset[Wand.WandRow] = {
    val spark = searcher.postingsRaw.sparkSession
    import spark.implicits._
    searcher.postingsRaw
      .filter(keysPred(keys))
      .select("segmentId", "field", "term", "df", "docDeltas", "tfs", "lens", "skips")
      .as[Wand.WandRow]
      .repartition(col("segmentId"))
  }

  /** Independent per-CLAUSE cursors over one segment's rows (two clauses on
    * one key must not share iteration state); null = key absent here. */
  private def clauseCursors(rows: Array[Wand.WandRow],
                            keys: Array[(String, String)]): Array[ClauseCursor] = {
    val byKey = rows.groupBy(r => (r.field, r.term))
    keys.map { k =>
      val pieces = byKey.getOrElse(k, Array.empty).map(p =>
        new PostingCursor(p.df, p.docDeltas, p.tfs, p.lens, p.skips))
      if (pieces.isEmpty) null else new ClauseCursor(pieces)
    }
  }

  /** Compile a Boolean query whose every clause is a (field-bound) TermQ.
    * Caller guarantees `stats` covers all present keys (Searcher.compile does).
    */
  def boolTerms(searcher: Searcher, spark: SparkSession,
                clauses: List[(Occur.Value, String, TermQ)], msm: Int,
                stats: Map[(String, String), (Long, Long)],
                qn: Double = 1d, coords: Array[Double] = null): Dataset[Hit] = {
    import spark.implicits._

    val specs: Array[ClauseSpec] = clauses.map { case (o, f, tq) =>
      ClauseSpec(o match {
        case Occur.Must => 0
        case Occur.Should => 1
        case Occur.MustNot => 2
      }, f, tq.term)
    }.toArray

    // a Must clause over an absent term matches nothing
    if (specs.exists(s => s.occur == 0 && !stats.contains((s.field, s.term))))
      return spark.emptyDataset[Hit]
    val scoringExists = specs.exists(_.occur != 2)
    if (!scoringExists) return spark.emptyDataset[Hit] // prohibited-only

    val hasMust = specs.exists(_.occur == 0)
    val shouldCount = specs.count(_.occur == 1)
    val needed = math.max(msm, if (!hasMust && shouldCount > 0) 1 else 0)
    if (needed > shouldCount) return spark.emptyDataset[Hit] // unsatisfiable
    if (!hasMust && shouldCount == 0) return spark.emptyDataset[Hit]

    // per-clause scorer, constants folded on the driver (TermWeight analog)
    val scorers: Array[(Double, Int) => Double] = clauses.map { case (o, f, tq) =>
      if (o == Occur.MustNot) null
      else stats.get((f, tq.term)).map { case (df, ttf) =>
        searcher.makeScorer(f, df, tq.boost, qn, ttf = ttf) }.orNull
    }.toArray

    val floatMode = searcher.mode == LuceneFloat
    // identity coords when absent (BM25 callers)
    val coordArr: Array[Double] =
      if (coords != null) coords
      else Array.fill(specs.count(_.occur != 2) + 1)(1d)
    val present: Set[(String, String)] =
      specs.map(s => (s.field, s.term)).toSet.filter(stats.contains)
    if (present.isEmpty) return spark.emptyDataset[Hit]

    slimRows(searcher, present)
      .mapPartitions { rows =>
        val bySeg = rows.toArray.groupBy(_.segmentId)
        bySeg.toSeq.sortBy(_._1).iterator.flatMap { case (seg, ps) =>
          segmentHits(seg, ps, specs, scorers, needed, floatMode, coordArr)
        }
      }
  }

  /** Lazy per-segment match iterator. */
  private[search] def segmentHits(seg: Int, rows: Array[Wand.WandRow], specs: Array[ClauseSpec],
                          scorers: Array[(Double, Int) => Double], needed: Int,
                          floatMode: Boolean, coords: Array[Double]): Iterator[Hit] = {
    val cursors = clauseCursors(rows, specs.map(s => (s.field, s.term)))
    val n = specs.length

    val mustIdx = (0 until n).filter(specs(_).occur == 0).toArray
    val shouldIdx = (0 until n).filter(i => specs(i).occur == 1 && cursors(i) != null).toArray
    val notIdx = (0 until n).filter(i => specs(i).occur == 2 && cursors(i) != null).toArray

    // a Must term absent in THIS segment: the segment contributes nothing
    if (mustIdx.exists(cursors(_) == null)) return Iterator.empty
    if (mustIdx.isEmpty && shouldIdx.isEmpty) return Iterator.empty

    // least-frequent MUST leads (ConjunctionScorer.cs:48-51 cost sort)
    val lead: Array[ClauseCursor] = mustIdx.map(cursors(_)).sortBy(_.cost)
    lead.foreach(_.next())
    shouldIdx.foreach(i => cursors(i).next())
    notIdx.foreach(i => cursors(i).next())

    new Iterator[Hit] {
      private var pending: Hit = null
      private var done = false

      private def nextCandidate(): Int = {
        if (lead.nonEmpty) {
          // leapfrog to agreement on all MUST cursors
          while (true) {
            if (lead.exists(_.exhausted)) return -1
            var cand = lead(0).doc
            var agreed = true
            var j = 1
            while (j < lead.length) {
              val c = lead(j)
              if (c.doc < cand) { c.advance(cand); if (c.exhausted) return -1 }
              if (c.doc > cand) { cand = c.doc; agreed = false }
              j += 1
            }
            if (agreed) return cand
            lead(0).advance(cand)
          }
          -1
        } else {
          // disjunction: minimum doc across live SHOULD cursors
          var best = Int.MaxValue
          var j = 0
          while (j < shouldIdx.length) {
            val c = cursors(shouldIdx(j))
            if (!c.exhausted && c.doc < best) best = c.doc
            j += 1
          }
          if (best == Int.MaxValue) -1 else best
        }
      }

      private def advancePast(cand: Int): Unit = {
        if (lead.nonEmpty) lead.foreach(_.advance(cand + 1))
        else shouldIdx.foreach { i =>
          val c = cursors(i)
          if (!c.exhausted && c.doc == cand) c.advance(cand + 1)
        }
      }

      private def step(): Unit = {
        val cand = nextCandidate()
        if (cand < 0) { done = true; return }
        // prohibited check (ReqExclScorer)
        var rejected = false
        var j = 0
        while (j < notIdx.length && !rejected) {
          val c = cursors(notIdx(j))
          if (!c.exhausted && c.doc < cand) c.advance(cand)
          if (!c.exhausted && c.doc == cand) rejected = true
          j += 1
        }
        if (!rejected) {
          // align optional cursors (ReqOptSumScorer / MinShouldMatch)
          var matchedShoulds = 0
          j = 0
          while (j < shouldIdx.length) {
            val c = cursors(shouldIdx(j))
            if (!c.exhausted && c.doc < cand) c.advance(cand)
            if (!c.exhausted && c.doc == cand) matchedShoulds += 1
            j += 1
          }
          if (needed == 0 || matchedShoulds >= needed) {
            // clause-ordered score chain (float or double per mode), then
            // * coordFactors[matched] (BooleanScorer2.cs:348-353; 1 for BM25)
            var accF = 0f
            var accD = 0d
            var matched = 0
            var k = 0
            while (k < specs.length) {
              val c = cursors(k)
              if (scorers(k) != null && c != null && !c.exhausted && c.doc == cand) {
                val s = scorers(k)(c.tf.toDouble, c.len)
                if (floatMode) accF += s.toFloat else accD += s
                matched += 1
              }
              k += 1
            }
            val coord = coords(matched)
            pending = Hit(seg, cand,
              if (floatMode) (accF * coord.toFloat).toDouble else accD * coord)
          }
        }
        advancePast(cand)
      }

      override def hasNext: Boolean = {
        while (pending == null && !done) step()
        pending != null
      }

      override def next(): Hit = {
        if (!hasNext) throw new NoSuchElementException
        val h = pending
        pending = null
        h
      }
    }
  }

  /** DisjunctionMaxQuery over (field-bound) terms — same per-segment cursor
    * walk as boolTerms, DisMax score combination (max + tie * (sum - max),
    * DisjunctionMaxScorer): one exchange of compressed rows, no groupBy.
    */
  def disMaxTerms(searcher: Searcher, spark: SparkSession,
                  clauses: List[(String, TermQ)], tie: Float,
                  stats: Map[(String, String), (Long, Long)], qn: Double): Dataset[Hit] = {
    import spark.implicits._
    val specs: Array[(String, String)] = clauses.map { case (f, tq) => (f, tq.term) }.toArray
    val scorers: Array[(Double, Int) => Double] = clauses.map { case (f, tq) =>
      stats.get((f, tq.term)).map { case (df, ttf) =>
        searcher.makeScorer(f, df, tq.boost, qn, ttf = ttf) }.orNull
    }.toArray
    val present = specs.toSet.filter(stats.contains)
    if (present.isEmpty) return spark.emptyDataset[Hit]
    val floatMode = searcher.mode == LuceneFloat

    slimRows(searcher, present)
      .mapPartitions { rows =>
        val bySeg = rows.toArray.groupBy(_.segmentId)
        bySeg.toSeq.sortBy(_._1).iterator.flatMap { case (seg, ps) =>
          val cursors = clauseCursors(ps, specs)
          val live = cursors.filter(_ != null)
          if (live.isEmpty) Iterator.empty
          else {
            live.foreach(_.next())
            new Iterator[Hit] {
              private var pending: Hit = null
              private def step(): Unit = {
                var cand = Int.MaxValue
                var i = 0
                while (i < live.length) {
                  val c = live(i)
                  if (!c.exhausted && c.doc < cand) cand = c.doc
                  i += 1
                }
                if (cand == Int.MaxValue) return
                // clause-ordered combination matching the DataFrame plan:
                // sum chain with 0 for missing; max over matched; then
                // max + tie * (sum - max), all in the mode's precision
                var sumF = 0f; var mxF = Float.MinValue
                var sumD = 0d; var mxD = Float.MinValue.toDouble
                var k = 0
                while (k < specs.length) {
                  val c = cursors(k)
                  if (scorers(k) != null && c != null && !c.exhausted && c.doc == cand) {
                    val s = scorers(k)(c.tf.toDouble, c.len)
                    if (floatMode) {
                      val sf = s.toFloat
                      sumF += sf
                      if (sf > mxF) mxF = sf
                    } else {
                      sumD += s
                      if (s > mxD) mxD = s
                    }
                  }
                  k += 1
                }
                pending = Hit(seg, cand,
                  if (floatMode) (mxF + (tie * (sumF - mxF))).toDouble
                  else mxD + (tie.toDouble * (sumD - mxD)))
                var j = 0
                while (j < live.length) {
                  val c = live(j)
                  if (!c.exhausted && c.doc == cand) c.advance(cand + 1)
                  j += 1
                }
              }
              override def hasNext: Boolean = { if (pending == null) step(); pending != null }
              override def next(): Hit = {
                if (!hasNext) throw new NoSuchElementException
                val h = pending; pending = null; h
              }
            }
          }
        }
      }
  }

  // ------------------------------------------------- positional pre-intersect

  /** Exact/sloppy phrase and multi-phrase — ExactPhraseScorer semantics
    * (/root/reference/src/Lucene.Net.Core/Search/ExactPhraseScorer.cs:26-49:
    * intersect docs FIRST, count positions only for survivors). Candidate
    * docs come from a leapfrog conjunction of the slots' doc streams; the
    * position stream of a block is decoded only when a candidate lands in it.
    * The old plan shipped every term-matching doc's position arrays through a
    * groupByKey — frequent-term positions dominated the shuffle (VERDICT r1
    * #2); this one shuffles compressed posting rows only.
    */
  /** Phrase weight construction shared by the cluster and warm-serving
    * paths: present-alternative groups, slot offsets and the scorer.
    * None when some slot has no present alternative (no match possible). */
  def phrasePlan(searcher: Searcher, field: String,
                 slots: List[(Set[String], Int)], boost: Float,
                 stats: Map[(String, String), (Long, Long)], qn: Double)
      : Option[(Array[Array[String]], Array[Int], (Double, Int) => Double)] = {
    if (slots.exists { case (ts, _) => ts.forall(t => !stats.contains((field, t))) })
      return None // a slot with no present alternative

    // idf over all alternatives of all slots (IdfExplain(termStats[]));
    // per-similarity idf formula
    val allTerms = slots.flatMap { case (ts, _) => ts.toList.sorted }
    def dfOf(t: String): Long = stats.get((field, t)).map(_._1).getOrElse(0L)
    val idfSumF = allTerms.map(t => searcher.idfFloat(dfOf(t))).foldLeft(0.0f)(_ + _)
    val idfSumD = allTerms.map(t => searcher.idfDouble(dfOf(t))).sum
    val lmTtfs = Some(allTerms.map(t => stats.get((field, t)).map(_._2).getOrElse(0L)))
    val scorer = searcher.makeScorer(field, 0L, boost, qn, Some(idfSumF), Some(idfSumD),
      lmTtfs = lmTtfs, lmDfs = Some(allTerms.map(dfOf)))
    val groups: Array[Array[String]] = slots.map(_._1.filter(t => stats.contains((field, t))).toArray).toArray
    Some((groups, slots.map(_._2).toArray, scorer))
  }

  /** One segment's phrase hits over its posting rows — the shared kernel of
    * the distributed partition body below and ServingSession.phraseTopK
    * (identical results by construction). */
  def phraseSegmentHits(seg: Int, ps: Array[PostingRow], groups: Array[Array[String]],
                        offsets: Array[Int], slop: Int,
                        scorer: (Double, Int) => Double): Iterator[Hit] = {
    val cursors = groups.map(g => slotCursor(ps, g))
    if (cursors.exists(_ == null)) Iterator.empty
    else candidateDocs(cursors).flatMap { cand =>
      val nSlots = cursors.length
      val posBySlot = new Array[Array[Int]](nSlots)
      var fieldLen = 0
      var i = 0
      while (i < nSlots) {
        posBySlot(i) = cursors(i).positionsMerged()
        fieldLen = cursors(i).len
        i += 1
      }
      val freq: Double =
        if (slop > 0) SloppyMatcher.phraseFreq(posBySlot, offsets, slop).toDouble
        else exactPhraseFreq(posBySlot, offsets).toDouble
      if (freq == 0d) None else Some(Hit(seg, cand, scorer(freq, fieldLen)))
    }
  }

  def phraseSlots(searcher: Searcher, spark: SparkSession, field: String,
                  slots: List[(Set[String], Int)], boost: Float,
                  stats: Map[(String, String), (Long, Long)], slop: Int,
                  qn: Double = 1d): Dataset[Hit] = {
    import spark.implicits._
    phrasePlan(searcher, field, slots, boost, stats, qn) match {
      case None => spark.emptyDataset[Hit]
      case Some((groups, offsets, scorer)) =>
        val present = groups.flatten.toSet.map((t: String) => (field, t))
        postingRows(searcher, present).mapPartitions { rows =>
          rows.toArray.groupBy(_.segmentId).toSeq.sortBy(_._1).iterator.flatMap {
            case (seg, ps) => phraseSegmentHits(seg, ps, groups, offsets, slop, scorer)
          }
        }
    }
  }

  /** Span-algebra doc matching (constant score): candidates from a leapfrog
    * over the span tree's CNF over-approximation (SpanOr group = any of its
    * terms; SpanNear = all children; SpanNot/SpanFirst = inner), then the
    * exact SpanMatcher verifies with lazily-decoded positions.
    */
  def spanMatch(searcher: Searcher, spark: SparkSession, field: String, span: SpanQ,
                boost: Float, stats: Map[(String, String), (Long, Long)]): Dataset[Hit] =
    spanEval(searcher, spark, field, span, boost, stats, scored = false, 1d)

  /** SpanScorer semantics (Search/Spans/SpanScorer.cs:72-88): per-doc freq =
    * sum over (distinct, sorted) spans of 1/(matchLength+1) — the
    * similarity's sloppyFreq — scored with the span terms' summed idf.
    */
  def spanScore(searcher: Searcher, spark: SparkSession, field: String, span: SpanQ,
                boost: Float, stats: Map[(String, String), (Long, Long)],
                qn: Double): Dataset[Hit] =
    spanEval(searcher, spark, field, span, boost, stats, scored = true, qn)

  /** PayloadNearQuery (Search/Payloads/PayloadNearQuery.cs): span score ×
    * PayloadFunction aggregate over the payloads of every matching span. */
  def payloadNear(searcher: Searcher, spark: SparkSession, field: String, span: SpanNearS,
                  payFn: String, boost: Float, stats: Map[(String, String), (Long, Long)],
                  qn: Double): Dataset[Hit] =
    spanEval(searcher, spark, field, span, boost, stats, scored = true, qn, payFn = payFn)

  private def spanEval(searcher: Searcher, spark: SparkSession, field: String, span: SpanQ,
                       boost: Float, stats: Map[(String, String), (Long, Long)],
                       scored: Boolean, qn: Double, payFn: String = null): Dataset[Hit] = {
    import spark.implicits._
    val groups0 = spanCnf(span, field).map(_.filter(stats.contains))
    if (groups0.exists(_.isEmpty)) return spark.emptyDataset[Hit]
    val groups: Array[Array[(String, String)]] = groups0.map(_.toArray).toArray
    // exclusion terms (SpanNot.exclude) are needed for verification only
    val verifyKeys = SpanMatcher.fieldTermsOf(span, field).filter(stats.contains).toArray
    val needPay = SpanMatcher.needsPayloads(span) || payFn != null
    val bd = boost.toDouble
    val floatMode = searcher.mode == LuceneFloat
    val scorer: (Double, Int) => Double =
      if (!scored) null
      else {
        // summed idf over ALL the span's terms (SpanWeight ~ phrase weight;
        // absent terms contribute idf at df = 0, like phraseSlots). With
        // field masks: term stats come from each term's REAL field while
        // the norm/collection side (makeScorer's `field`) stays the masked
        // one — the reference's documented FieldMaskingSpanQuery scoring.
        val keys = SpanMatcher.fieldTermsOf(span, field).toList.sorted
        def dfOf(k: (String, String)): Long = stats.get(k).map(_._1).getOrElse(0L)
        val idfSumF = keys.map(k => searcher.idfFloat(dfOf(k))).foldLeft(0.0f)(_ + _)
        val idfSumD = keys.map(k => searcher.idfDouble(dfOf(k))).sum
        val ttfs = keys.map(k => stats.get(k).map(_._2).getOrElse(0L))
        searcher.makeScorer(field, 0L, boost, qn, Some(idfSumF), Some(idfSumD),
          lmTtfs = Some(ttfs), lmDfs = Some(keys.map(dfOf)))
      }

    postingRows(searcher, verifyKeys.toSet).mapPartitions { rows =>
      val bySeg = rows.toArray.groupBy(_.segmentId)
      bySeg.toSeq.sortBy(_._1).iterator.flatMap { case (seg, ps) =>
        val groupCursors = groups.map(g => slotCursorF(ps, g))
        // independent per-key cursors for position verification
        val termCursors: Map[(String, String), ClauseCursor] =
          verifyKeys.flatMap(k => Option(slotCursorF(ps, Array(k))).map(k -> _)).toMap
        // payload lookups decode the full row once per (segment, key) —
        // same cost class as PayloadTermQuery, only when the tree checks
        // payloads (needPay); piece rows have disjoint ranges, so docs
        // resolve by binary search within each piece
        val payIdx: Map[(String, String), PayloadIndex] =
          if (!needPay) Map.empty
          else verifyKeys.flatMap { k =>
            val pieces = ps.filter(r => r.field == k._1 && r.term == k._2 && r.payloads != null)
            if (pieces.isEmpty) None else Some(k -> new PayloadIndex(pieces))
          }.toMap
        if (groupCursors.exists(_ == null)) Iterator.empty
        else candidateDocs(groupCursors).flatMap { cand =>
          var fieldLen = 0
          var maskedLen = 0
          val posMap: Map[(String, String), Array[Int]] = termCursors.flatMap { case (k, c) =>
            if (!c.exhausted && c.doc < cand) c.advance(cand)
            if (!c.exhausted && c.doc == cand) {
              // norm length from the top (masked) field's postings; fall
              // back to any field only if no top-field term hit the doc
              if (k._1 == field) fieldLen = c.len else maskedLen = c.len
              Some(k -> c.positionsMerged())
            } else None
          }
          if (fieldLen == 0) fieldLen = maskedLen
          val pos: SpanMatcher.PosLookup =
            (f, t) => posMap.getOrElse((f, t), SpanMatcher.NoPositions)
          val pay: SpanMatcher.PayLookup =
            if (!needPay) SpanMatcher.NoPayloads
            else (f, t, p) => payIdx.get((f, t)).map(_.payloadAt(cand, p)).orNull
          if (!scored) {
            if (SpanMatcher.matchesF(span, field, pos, pay)) Some(Hit(seg, cand, bd)) else None
          } else {
            val matched = SpanMatcher.pspans(span, field, pos, pay)
            if (matched.isEmpty) None
            else {
              val spans = matched.map(s => (s.start, s.end)).distinct // sorted already
              val freq: Double =
                if (floatMode) {
                  var f = 0f
                  spans.foreach { case (s, e) => f += 1f / ((e - s) + 1) }
                  f.toDouble
                } else {
                  var f = 0d
                  spans.foreach { case (s, e) => f += 1.0 / ((e - s) + 1) }
                  f
                }
              val score =
                if (payFn == null) scorer(freq, fieldLen)
                else {
                  // PayloadNearSpanScorer.ScoreCurrentDoc: span score ×
                  // PayloadFunction.DocScore (float product in float mode)
                  val factor = payloadAggregate(matched, payFn)
                  if (floatMode) (scorer(freq, fieldLen).toFloat * factor.toFloat).toDouble
                  else scorer(freq, fieldLen) * factor
                }
              Some(Hit(seg, cand, score))
            }
          }
        }
      }
    }
  }

  /** Query-key posting rows (with positions) routed to segment tasks —
    * compressed blocks only cross the wire.
    */
  private def postingRows(searcher: Searcher, keys: Set[(String, String)]): Dataset[PostingRow] = {
    val spark = searcher.postingsRaw.sparkSession
    import spark.implicits._
    searcher.postingsRaw
      .filter(keysPred(keys))
      .transform(graft.build.IndexBuilder.withPayloadsCol)
      .select("segmentId", "field", "term", "df", "ttf", "docDeltas", "tfs", "positions", "lens", "skips", "payloads", "offsets")
      .as[PostingRow]
      .repartition(col("segmentId"))
  }

  /** CNF over-approximation in (field, term) keys — masked subtrees
    * resolve to their REAL field (FieldMaskingSpanQuery.GetSpans runs the
    * masked query unchanged). */
  private def spanCnf(q: SpanQ, f: String): List[Set[(String, String)]] = q match {
    case SpanTermS(t) => List(Set(f -> t))
    case SpanNearS(cs, _, _) => cs.flatMap(spanCnf(_, f))
    case SpanOrS(cs) => List(cs.flatMap(SpanMatcher.fieldTermsOf(_, f)).toSet)
    case SpanNotS(i, _) => spanCnf(i, f)
    case SpanFirstS(i, _) => spanCnf(i, f)
    case SpanPosRangeS(i, _, _) => spanCnf(i, f)
    case SpanFieldMaskS(i, mf) => spanCnf(i, mf)
    case SpanPayloadCheckS(i, _) => spanCnf(i, f)
    case SpanNearPayloadCheckS(i, _) => spanCnf(i, f)
  }

  /** PayloadSpanUtil's gather step: (segmentId, docId, payload) rows — one
    * per payload-carrying position covered by a matching span of `span`.
    * Delete overlays are NOT applied (the reference util's contract is an
    * "IndexReader [that] should only contain doc of interest"). */
  def spanPayloads(searcher: Searcher, spark: SparkSession, field: String, span: SpanQ,
                   stats: Map[(String, String), (Long, Long)]): Dataset[(Int, Int, Array[Byte])] = {
    import spark.implicits._
    val groups0 = spanCnf(span, field).map(_.filter(stats.contains))
    if (groups0.exists(_.isEmpty))
      return spark.emptyDataset[(Int, Int, Array[Byte])]
    val groups: Array[Array[(String, String)]] = groups0.map(_.toArray).toArray
    val verifyKeys = SpanMatcher.fieldTermsOf(span, field).filter(stats.contains).toArray
    postingRows(searcher, verifyKeys.toSet).mapPartitions { rows =>
      val bySeg = rows.toArray.groupBy(_.segmentId)
      bySeg.toSeq.sortBy(_._1).iterator.flatMap { case (seg, ps) =>
        val groupCursors = groups.map(g => slotCursorF(ps, g))
        val termCursors: Map[(String, String), ClauseCursor] =
          verifyKeys.flatMap(k => Option(slotCursorF(ps, Array(k))).map(k -> _)).toMap
        val payIdx: Map[(String, String), PayloadIndex] = verifyKeys.flatMap { k =>
          val pieces = ps.filter(r => r.field == k._1 && r.term == k._2 && r.payloads != null)
          if (pieces.isEmpty) None else Some(k -> new PayloadIndex(pieces))
        }.toMap
        if (groupCursors.exists(_ == null)) Iterator.empty
        else candidateDocs(groupCursors).flatMap { cand =>
          val posMap = termCursors.flatMap { case (k, c) =>
            if (!c.exhausted && c.doc < cand) c.advance(cand)
            if (!c.exhausted && c.doc == cand) Some(k -> c.positionsMerged()) else None
          }
          val pos: SpanMatcher.PosLookup =
            (f, t) => posMap.getOrElse((f, t), SpanMatcher.NoPositions)
          val pay: SpanMatcher.PayLookup =
            (f, t, p) => payIdx.get((f, t)).map(_.payloadAt(cand, p)).orNull
          SpanMatcher.pspans(span, field, pos, pay).flatMap(_.pays).map(b => (seg, cand, b))
        }
      }
    }
  }

  /** PayloadFunction.DocScore over every payload of every matching span
    * (Payloads/AveragePayloadFunction.cs, Min/MaxPayloadFunction.cs):
    * 4-byte-int payloads decode like PayloadScoreQ; payloadsSeen == 0 ->
    * the 1.0 default. */
  private def payloadAggregate(ps: List[SpanMatcher.PSpan], fn: String): Double = {
    var sum = 0L; var mn = Int.MaxValue; var mx = Int.MinValue; var n = 0
    ps.foreach(_.pays.foreach { b =>
      if (b.length == 4) {
        val v = graft.analysis.DelimitedPayloadAnalyzer.decodeInt(b, 0)
        sum += v; if (v < mn) mn = v; if (v > mx) mx = v; n += 1
      }
    })
    if (n == 0) 1.0 else fn match {
      case "min" => mn.toDouble
      case "max" => mx.toDouble
      case _ => sum.toDouble / n
    }
  }

  /** Field-qualified slot cursor — the span path fetches rows from SEVERAL
    * fields when the tree holds FieldMaskingSpanQuery subtrees, so piece
    * selection must match on (field, term), not term alone. */
  private def slotCursorF(rows: Array[PostingRow], keys: Array[(String, String)]): ClauseCursor = {
    val pieces = rows.filter(r => keys.contains((r.field, r.term))).map(p =>
      new PostingCursor(p.df, p.docDeltas, p.tfs, p.lens, p.skips, p.positions))
    if (pieces.isEmpty) null else new ClauseCursor(pieces)
  }

  /** Per-(field, term) payload lookup for the span payload checks:
    * full-decodes each piece row's doc/position/payload streams once per
    * segment task (same cost class as PayloadTermQuery, which must read
    * every matching doc's payloads anyway), then answers
    * payloadAt(docId, position) by binary search — piece rows carry
    * disjoint docId ranges, so at most one piece holds the doc. */
  private final class PayloadIndex(pieces: Array[PostingRow]) {
    private val decoded = pieces.map { p =>
      val d = PostingsCodec.decode(p.df, p.docDeltas, p.tfs, p.positions, p.lens)
      val (starts, lens, flat) =
        PostingsCodec.decodePayloads(d.posStart(d.tfs.length), p.payloads)
      (d, starts, lens, flat)
    }
    /** Payload bytes of `docId`'s occurrence at `position`; null = none. */
    def payloadAt(docId: Int, position: Int): Array[Byte] = {
      var i = 0
      while (i < decoded.length) {
        val (d, starts, lens, flat) = decoded(i)
        val di = java.util.Arrays.binarySearch(d.docIds, docId)
        if (di >= 0) {
          var k = d.posStart(di)
          while (k < d.posStart(di + 1)) {
            if (d.posFlat(k) == position) {
              return if (lens(k) == 0) null
              else java.util.Arrays.copyOfRange(flat, starts(k), starts(k) + lens(k))
            }
            k += 1
          }
          return null
        }
        i += 1
      }
      null
    }
  }

  /** Cursor over the union of `terms`' pieces in this segment (alternatives
    * of one slot / one CNF group); null when none present.
    */
  private def slotCursor(rows: Array[PostingRow], terms: Array[String]): ClauseCursor = {
    val pieces = rows.filter(r => terms.contains(r.term)).map(p =>
      new PostingCursor(p.df, p.docDeltas, p.tfs, p.lens, p.skips, p.positions))
    if (pieces.isEmpty) null else new ClauseCursor(pieces)
  }

  /** Leapfrog conjunction over group cursors: docs where EVERY group matches.
    * Cursors are left SITTING ON the emitted candidate until the next
    * hasNext() call, so the consumer can read tf/len/positions for it.
    */
  private def candidateDocs(groups: Array[ClauseCursor]): Iterator[Int] = {
    groups.foreach(_.next())
    new Iterator[Int] {
      private var pending = -1
      private var lastEmitted = -1
      private var done = groups.exists(_.exhausted)

      private def step(): Unit = {
        if (done || pending >= 0) return
        if (lastEmitted >= 0) {
          groups.foreach(g => if (!g.exhausted) g.advance(lastEmitted + 1))
          lastEmitted = -1
          if (groups.exists(_.exhausted)) { done = true; return }
        }
        while (pending < 0 && !done) {
          var cand = groups(0).doc
          var agreed = true
          var j = 0
          while (j < groups.length) {
            val c = groups(j)
            if (!c.exhausted && c.doc < cand) c.advance(cand)
            if (c.exhausted) { done = true; return }
            if (c.doc > cand) { cand = c.doc; agreed = false }
            j += 1
          }
          if (agreed) pending = cand
          else {
            groups(0).advance(cand)
            if (groups(0).exhausted) done = true
          }
        }
      }

      override def hasNext: Boolean = { step(); pending >= 0 }

      override def next(): Int = {
        if (!hasNext) throw new NoSuchElementException
        val c = pending
        pending = -1
        lastEmitted = c
        c
      }
    }
  }

  /** ExactPhraseScorer counting: slot-0 occurrences whose base position has a
    * matching position in every other slot (binary search, merged arrays).
    */
  private def exactPhraseFreq(posBySlot: Array[Array[Int]], offsets: Array[Int]): Int = {
    var freq = 0
    val base = posBySlot(0)
    var bi = 0
    while (bi < base.length) {
      val start = base(bi) - offsets(0)
      var ok = true
      var ti = 1
      while (ok && ti < posBySlot.length) {
        ok = java.util.Arrays.binarySearch(posBySlot(ti), start + offsets(ti)) >= 0
        ti += 1
      }
      if (ok) freq += 1
      bi += 1
    }
    freq
  }
}
