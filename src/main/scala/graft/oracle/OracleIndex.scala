package graft.oracle

import graft.analysis.Analyzer
import graft.search._
import scala.collection.mutable

/** Single-JVM, no-Spark reference implementation of the whole engine
  * (naive maps), encoding exactly the formulas of SURVEY.md §2.6. Every Spark
  * query result must be rank- and score-identical to this oracle — the
  * CheckHits-style strategy of the reference
  * (/root/reference/src/Lucene.Net.TestFramework/Search/CheckHits.cs:94).
  *
  * Deterministic doc addressing shared with the Spark engine:
  * segmentId = floorMod(MurmurHash3.stringHash(key), numSegments);
  * docId = rank of key within its segment (ascending key order).
  */
final class OracleIndex(pages: Seq[(String, String)], numSegments: Int,
                        analyzer: Analyzer, bm25: Bm25 = Bm25.default) {

  final case class Doc(key: String, segmentId: Int, docId: Int, fieldLen: Int,
                       normByte: Byte, positions: Map[String, Array[Int]])

  val docs: Vector[Doc] = {
    val bySeg = pages.groupBy { case (key, _) => OracleIndex.segmentOf(key, numSegments) }
    (0 until numSegments).flatMap { seg =>
      bySeg.getOrElse(seg, Nil).sortBy(_._1).zipWithIndex.map { case ((key, text), docId) =>
        val toks = analyzer.tokenize(text).toVector
        val pos = toks.groupBy(_.term).map { case (t, ts) => t -> ts.map(_.position).toArray }
        Doc(key, seg, docId, toks.length, bm25.encodeNormValue(1f, toks.length), pos)
      }
    }.toVector.sortBy(d => (d.segmentId, d.docId))
  }

  val maxDoc: Long = docs.length.toLong
  val sumTotalTermFreq: Long = docs.map(_.fieldLen.toLong).sum
  val docFreq: Map[String, Long] = {
    val m = mutable.Map.empty[String, Long].withDefaultValue(0L)
    docs.foreach(d => d.positions.keys.foreach(t => m(t) += 1))
    m.toMap.withDefaultValue(0L)
  }
  val totalTermFreq: Map[String, Long] = {
    val m = mutable.Map.empty[String, Long].withDefaultValue(0L)
    docs.foreach(d => d.positions.foreach { case (t, ps) => m(t) += ps.length })
    m.toMap.withDefaultValue(0L)
  }
  /** Sorted dictionary for prefix/range/wildcard/fuzzy expansion. */
  lazy val dictionary: Vector[String] = docFreq.keys.toVector.sorted

  private def weight(term: String, boost: Float): bm25.TermWeight =
    bm25.termWeight(docFreq(term), maxDoc, sumTotalTermFreq, boost)

  /** Score of `q` for one doc, or None if it doesn't match.
    * Float accumulation in clause order (our canonical in-order semantics,
    * SURVEY.md §7.3).
    */
  def scoreDoc(q: Query, d: Doc): Option[Float] = q match {
    // the oracle corpus is single-field: the default binding is an identity,
    // any other field has no postings here
    case FieldQ(f, inner) =>
      if (f == graft.build.IndexBuilder.DefaultField) scoreDoc(inner, d) else None

    case TermQ(t, boost) =>
      d.positions.get(t).map { ps => weight(t, boost).score(ps.length.toFloat, d.normByte) }

    // PayloadTermQuery MATCHES exactly like TermQuery (payloads only shape
    // the score); the oracle stores no payload streams, so its score stands
    // in with the BM25 term score — match/count semantics are what
    // MemoryIndex/Percolator consume from this path.
    case PayloadScoreQ(t, _, boost) => scoreDoc(TermQ(t, boost), d)

    case BoolQ(clauses, msm) =>
      val scoring = clauses.filter(_._1 != Occur.MustNot)
      val musts = clauses.filter(_._1 == Occur.Must)
      val nots = clauses.filter(_._1 == Occur.MustNot)
      val shoulds = clauses.filter(_._1 == Occur.Should)
      if (scoring.isEmpty) None // prohibited-only boolean matches nothing
      else if (nots.exists(c => scoreDoc(c._2, d).isDefined)) None
      else if (musts.exists(c => scoreDoc(c._2, d).isEmpty)) None
      else {
        val shouldMatched = shoulds.count(c => scoreDoc(c._2, d).isDefined)
        val needed = math.max(msm, if (musts.isEmpty && shoulds.nonEmpty) 1 else 0)
        if (shouldMatched < needed) None
        else {
          var s = 0.0f
          scoring.foreach { c => scoreDoc(c._2, d).foreach(v => s += v) }
          Some(s)
        }
      }

    case PhraseQ(terms, boost, slop) =>
      val arrays = terms.map { case (t, off) => (d.positions.get(t), off) }
      if (arrays.exists(_._1.isEmpty)) None
      else {
        val freq: Float =
          if (slop > 0)
            graft.search.SloppyMatcher.phraseFreq(
              arrays.map(_._1.get).toArray, terms.map(_._2).toArray, slop)
          else {
            val base = arrays.head._1.get
            val baseOff = arrays.head._2
            var f = 0
            base.foreach { p =>
              val start = p - baseOff
              if (arrays.forall { case (ps, off) => ps.get.contains(start + off) }) f += 1
            }
            f.toFloat
          }
        if (freq == 0f) None
        else {
          // combined weight: summed idf over terms (BM25Similarity.cs:208-221)
          var idfSum = 0.0f
          terms.foreach { case (t, _) => idfSum += bm25.idf(docFreq(t), maxDoc) }
          val avgCache = weight(terms.head._1, 1f).cache // cache is term-independent
          val w = bm25.TermWeight(idfSum * boost * (bm25.k1 + 1), avgCache)
          Some(w.score(freq, d.normByte))
        }
      }

    case MultiPhraseQ(slots, boost) =>
      val arrays = slots.map { case (ts, off) =>
        val merged = ts.toList.flatMap(t => d.positions.getOrElse(t, Array.empty[Int]).toList).sorted
        (merged, off)
      }
      if (arrays.exists(_._1.isEmpty)) None
      else {
        val (base, baseOff) = arrays.head
        var freq = 0
        base.foreach { p =>
          val start = p - baseOff
          if (arrays.forall { case (ps, off) => ps.contains(start + off) }) freq += 1
        }
        if (freq == 0) None
        else {
          var idfSum = 0.0f
          slots.flatMap(_._1.toList.sorted).foreach { t =>
            idfSum += bm25.idf(docFreq.getOrElse(t, 0L), maxDoc)
          }
          val cache = weight(slots.head._1.head, 1f).cache
          val w = bm25.TermWeight(idfSum * boost * (bm25.k1 + 1), cache)
          Some(w.score(freq.toFloat, d.normByte))
        }
      }

    case SpanMatchQ(span, boost) =>
      if (SpanMatcher.matches(span, d.positions)) Some(boost) else None

    // the oracle stores no payload streams: PayloadFunction.DocScore
    // defaults to 1.0, so PayloadNearQuery degenerates to the span score
    case PayloadNearQ(span, _, boost) => scoreDoc(SpanScoreQ(span, boost), d)

    case SpanScoreQ(span, boost) =>
      // SpanScorer.cs:72-88: freq = sum of sloppyFreq(end-start) over spans
      val spans = SpanMatcher.spans(span, d.positions)
      if (spans.isEmpty) None
      else {
        var f = 0f
        spans.foreach { case (s, e) => f += 1f / ((e - s) + 1) }
        var idfSum = 0.0f
        SpanMatcher.termsOf(span).toList.sorted.foreach { t =>
          idfSum += bm25.idf(docFreq(t), maxDoc)
        }
        val cache = weight(SpanMatcher.termsOf(span).head, 1f).cache
        val w = bm25.TermWeight(idfSum * boost * (bm25.k1 + 1), cache)
        Some(w.score(f, d.normByte))
      }

    case PrefixQ(p) =>
      if (d.positions.keys.exists(_.startsWith(p))) Some(1.0f) else None

    case RangeQ(lo, hi, incLo, incHi) =>
      val ok = d.positions.keys.exists { t =>
        (lo == null || (if (incLo) t >= lo else t > lo)) &&
        (hi == null || (if (incHi) t <= hi else t < hi))
      }
      if (ok) Some(1.0f) else None

    case WildcardQ(pat) =>
      val re = Query.wildcardRegex(pat).r
      if (d.positions.keys.exists(t => re.matches(t))) Some(1.0f) else None

    case RegexpQ(pat) =>
      val re = ("^" + pat + "$").r
      if (d.positions.keys.exists(t => re.matches(t))) Some(1.0f) else None

    case LuceneRegexpQ(pat) =>
      val ast = LuceneRegExp.parse(pat)
      if (d.positions.keys.exists(t => LuceneRegExp.matches(ast, t))) Some(1.0f) else None

    case FuzzyQ(t, maxEdits) =>
      val ms = d.positions.keys.exists(term => OracleIndex.levenshtein(term, t) <= maxEdits)
      if (ms) Some(1.0f) else None

    case fq: FuzzyTopQ => scoreDoc(fuzzyTopRewrite(fq), d)

    case MatchAllQ => Some(1.0f)

    case ConstantScoreQ(inner, boost) =>
      scoreDoc(inner, d).map(_ => boost)

    case DisMaxQ(cs, tie) =>
      val scores = cs.flatMap(c => scoreDoc(c, d))
      if (scores.isEmpty) None
      else {
        val mx = scores.max
        Some(mx + tie * (scores.sum - mx))
      }
  }

  /** FuzzyQuery default rewrite (TopTermsScoringBooleanQueryRewrite): same
    * expansion/boost/top-N rules as the engine's fuzzyExpand. */
  private def fuzzyTopRewrite(fq: FuzzyTopQ): Query = {
    val qLen = fq.term.codePointCount(0, fq.term.length)
    val boosted = dictionary.flatMap { t =>
      val ed = OracleIndex.levenshtein(t, fq.term)
      if (ed > fq.maxEdits) None
      else if (ed == 0) Some((t, 1f))
      else {
        val sim = 1f - ed.toFloat / math.min(t.codePointCount(0, t.length), qLen).toFloat
        if (sim > 0f) Some((t, sim)) else None
      }
    }
    val top = boosted.sortBy { case (t, b) => (-b, t) }
      .take(math.min(fq.maxExpansions, Query.MaxClauseCount))
      .sortBy(_._1)
    if (top.isEmpty) BoolQ(List(Occur.Must -> TermQ(" absent")))
    else BoolQ(top.map { case (t, b) => Occur.Should -> (TermQ(t, fq.boost * b): Query) }.toList)
  }

  // ------------------------------------------------------------ TFIDF twin

  /** DefaultSimilarity idf = (float)(ln(N/(df+1)) + 1), DefaultSimilarity.cs:156. */
  private def tfIdfIdf(df: Long): Float =
    (math.log(maxDoc / (df + 1).toDouble) + 1.0).toFloat

  /** Sum of squared clause weights in clause order, prohibited skipped
    * (BooleanWeight.ValueForNormalization, BooleanQuery.cs:257-276). */
  private def sswTfIdf(q: Query): Float = q match {
    case FieldQ(f, inner) =>
      if (f == graft.build.IndexBuilder.DefaultField) sswTfIdf(inner) else 0f
    case TermQ(t, b) => val w = tfIdfIdf(docFreq(t)) * b; w * w
    case BoolQ(cs, _) =>
      cs.filter(_._1 != Occur.MustNot).map(c => sswTfIdf(c._2)).foldLeft(0f)(_ + _)
    case PhraseQ(ts, b, _) =>
      val w = ts.map(t => tfIdfIdf(docFreq(t._1))).foldLeft(0f)(_ + _) * b; w * w
    case SpanScoreQ(sp, b) =>
      val w = SpanMatcher.termsOf(sp).toList.sorted
        .map(t => tfIdfIdf(docFreq(t))).foldLeft(0f)(_ + _) * b; w * w
    case MultiPhraseQ(ss, b) =>
      val w = ss.flatMap(_._1.toList.sorted)
        .map(t => tfIdfIdf(docFreq(t))).foldLeft(0f)(_ + _) * b; w * w
    case DisMaxQ(cs, _) => cs.map(sswTfIdf).foldLeft(0f)(_ + _)
    case ConstantScoreQ(_, b) => b * b
    case _ => 1f
  }

  /** TFIDF/DefaultSimilarity scoring (the reference engine default):
    * value = ((idf*boost)*queryNorm)*idf; score = tf(freq)*value*decodeNorm
    * (TFIDFSimilarity.cs:707-711,753-769); booleans multiply the clause-chain
    * sum by coord = matched/maxOverlap AFTER summing (BooleanScorer2.cs:348).
    */
  def scoreDocTfIdf(q: Query, d: Doc, qn: Float): Option[Float] = q match {
    case FieldQ(f, inner) =>
      if (f == graft.build.IndexBuilder.DefaultField) scoreDocTfIdf(inner, d, qn) else None

    case TermQ(t, boost) =>
      d.positions.get(t).map { ps =>
        val idf = tfIdfIdf(docFreq(t))
        val value = idf * boost * qn * idf
        val raw = math.sqrt(ps.length.toDouble).toFloat * value
        raw * graft.codec.SmallFloat.byte315ToFloat(d.normByte)
      }

    case BoolQ(clauses, msm) =>
      val scoring = clauses.filter(_._1 != Occur.MustNot)
      val musts = clauses.filter(_._1 == Occur.Must)
      val nots = clauses.filter(_._1 == Occur.MustNot)
      val shoulds = clauses.filter(_._1 == Occur.Should)
      if (scoring.isEmpty) None
      else if (nots.exists(c => scoreDocTfIdf(c._2, d, qn).isDefined)) None
      else if (musts.exists(c => scoreDocTfIdf(c._2, d, qn).isEmpty)) None
      else {
        val shouldMatched = shoulds.count(c => scoreDocTfIdf(c._2, d, qn).isDefined)
        val needed = math.max(msm, if (musts.isEmpty && shoulds.nonEmpty) 1 else 0)
        if (shouldMatched < needed) None
        else {
          var s = 0.0f
          var matched = 0
          scoring.foreach { c => scoreDocTfIdf(c._2, d, qn).foreach { v => s += v; matched += 1 } }
          Some(s * (matched / scoring.size.toFloat))
        }
      }

    case PhraseQ(terms, boost, slop) =>
      // reuse the BM25 matcher for freq, swap the weight formula
      val arrays = terms.map { case (t, off) => (d.positions.get(t), off) }
      if (arrays.exists(_._1.isEmpty)) None
      else {
        val freq: Float =
          if (slop > 0)
            graft.search.SloppyMatcher.phraseFreq(
              arrays.map(_._1.get).toArray, terms.map(_._2).toArray, slop)
          else {
            val base = arrays.head._1.get
            val baseOff = arrays.head._2
            var f = 0
            base.foreach { p =>
              val start = p - baseOff
              if (arrays.forall { case (ps, off) => ps.get.contains(start + off) }) f += 1
            }
            f.toFloat
          }
        if (freq == 0f) None
        else {
          var idfSum = 0.0f
          terms.foreach { case (t, _) => idfSum += tfIdfIdf(docFreq(t)) }
          val value = idfSum * boost * qn * idfSum
          val raw = math.sqrt(freq.toDouble).toFloat * value
          Some(raw * graft.codec.SmallFloat.byte315ToFloat(d.normByte))
        }
      }

    case SpanScoreQ(span, boost) =>
      val spans = SpanMatcher.spans(span, d.positions)
      if (spans.isEmpty) None
      else {
        var f = 0f
        spans.foreach { case (s, e) => f += 1f / ((e - s) + 1) }
        var idfSum = 0.0f
        SpanMatcher.termsOf(span).toList.sorted.foreach(t => idfSum += tfIdfIdf(docFreq(t)))
        val value = idfSum * boost * qn * idfSum
        val raw = math.sqrt(f.toDouble).toFloat * value
        Some(raw * graft.codec.SmallFloat.byte315ToFloat(d.normByte))
      }

    case MultiPhraseQ(slots, boost) =>
      val arrays = slots.map { case (ts, off) =>
        val merged = ts.toList.flatMap(t => d.positions.getOrElse(t, Array.empty[Int]).toList).sorted
        (merged, off)
      }
      if (arrays.exists(_._1.isEmpty)) None
      else {
        val (base, baseOff) = arrays.head
        var freq = 0
        base.foreach { p =>
          val start = p - baseOff
          if (arrays.forall { case (ps, off) => ps.contains(start + off) }) freq += 1
        }
        if (freq == 0) None
        else {
          var idfSum = 0.0f
          slots.flatMap(_._1.toList.sorted).foreach(t => idfSum += tfIdfIdf(docFreq(t)))
          val value = idfSum * boost * qn * idfSum
          val raw = math.sqrt(freq.toDouble).toFloat * value
          Some(raw * graft.codec.SmallFloat.byte315ToFloat(d.normByte))
        }
      }

    case DisMaxQ(cs, tie) =>
      val scores = cs.flatMap(c => scoreDocTfIdf(c, d, qn))
      if (scores.isEmpty) None
      else {
        val mx = scores.max
        Some(mx + tie * (scores.sum - mx))
      }

    case fq: FuzzyTopQ => scoreDocTfIdf(fuzzyTopRewrite(fq), d, qn)

    case ConstantScoreQ(inner, boost) => scoreDocTfIdf(inner, d, qn).map(_ => boost)
    case MatchAllQ => Some(1.0f)
    case other => scoreDoc(other, d) // constant-score dictionary queries
  }

  /** LM Dirichlet scoring (Search/Similarities/LMDirichletSimilarity.cs:
    * 74-78): per-term score = boost * (float)(ln(1 + freq/(mu*p)) +
    * ln(mu/(docLen+mu))), clipped at 0, with p = (ttf+1)/(sumTotalTermFreq+1)
    * as float (LMSimilarity.DefaultCollectionModel, LMSimilarity.cs:164-166)
    * and docLen = the byte315-decoded quantized length
    * (SimilarityBase.DecodeNormValue). Composites sum one per-term score at
    * the shared freq, each clipped (MultiSimilarity.MultiSimScorer); coord
    * and queryNorm are identity (Similarity defaults).
    */
  def scoreDocLm(q: Query, d: Doc, mu: Float): Option[Float] = {
    def lm(freq: Float, ttfs: Seq[Long], boost: Float): Float = {
      val dl = bm25.normTable(d.normByte & 0xff)
      var acc = 0f
      ttfs.foreach { t =>
        val p = (t + 1f) / (sumTotalTermFreq + 1f)
        val inner = (math.log((1f + freq / (mu * p)).toDouble) +
          math.log((mu / (dl + mu)).toDouble)).toFloat
        val s = boost * inner
        if (s > 0f) acc += s
      }
      acc
    }
    q match {
      case FieldQ(f, inner) =>
        if (f == graft.build.IndexBuilder.DefaultField) scoreDocLm(inner, d, mu) else None
      case TermQ(t, boost) =>
        d.positions.get(t).map(ps => lm(ps.length.toFloat, Seq(totalTermFreq(t)), boost))
      case BoolQ(clauses, msm) =>
        val scoring = clauses.filter(_._1 != Occur.MustNot)
        val musts = clauses.filter(_._1 == Occur.Must)
        val nots = clauses.filter(_._1 == Occur.MustNot)
        val shoulds = clauses.filter(_._1 == Occur.Should)
        if (scoring.isEmpty) None
        else if (nots.exists(c => scoreDocLm(c._2, d, mu).isDefined)) None
        else if (musts.exists(c => scoreDocLm(c._2, d, mu).isEmpty)) None
        else {
          val shouldMatched = shoulds.count(c => scoreDocLm(c._2, d, mu).isDefined)
          val needed = math.max(msm, if (musts.isEmpty && shoulds.nonEmpty) 1 else 0)
          if (shouldMatched < needed) None
          else {
            var s = 0.0f
            scoring.foreach { c => scoreDocLm(c._2, d, mu).foreach(v => s += v) }
            Some(s)
          }
        }
      case PhraseQ(terms, boost, slop) =>
        val arrays = terms.map { case (t, off) => (d.positions.get(t), off) }
        if (arrays.exists(_._1.isEmpty)) None
        else {
          val freq: Float =
            if (slop > 0)
              graft.search.SloppyMatcher.phraseFreq(
                arrays.map(_._1.get).toArray, terms.map(_._2).toArray, slop)
            else {
              val base = arrays.head._1.get
              val baseOff = arrays.head._2
              var f = 0
              base.foreach { p =>
                val start = p - baseOff
                if (arrays.forall { case (ps, off) => ps.get.contains(start + off) }) f += 1
              }
              f.toFloat
            }
          if (freq == 0f) None
          else Some(lm(freq, terms.map(t => totalTermFreq(t._1)), boost))
        }
      case ConstantScoreQ(inner, boost) => scoreDocLm(inner, d, mu).map(_ => boost)
      case MatchAllQ => Some(1.0f)
      case other => scoreDoc(other, d) // constant-score dictionary queries
    }
  }

  def searchLm(q: Query, k: Int, mu: Float = 2000f): Vector[Hit] = {
    val rw = Query.rewrite(q)
    docs.flatMap(d => scoreDocLm(rw, d, mu).map(s => Hit(d.key, d.segmentId, d.docId, s)))
      .sortBy(h => (-h.score, h.segmentId, h.docId))
      .take(k)
  }

  def searchTfIdf(q: Query, k: Int): Vector[Hit] = {
    val rw = Query.rewrite(q)
    val ssw = sswTfIdf(rw)
    val qn = if (ssw <= 0f) 1f else (1.0 / math.sqrt(ssw.toDouble)).toFloat
    docs.flatMap(d => scoreDocTfIdf(rw, d, qn).map(s => Hit(d.key, d.segmentId, d.docId, s)))
      .sortBy(h => (-h.score, h.segmentId, h.docId))
      .take(k)
  }

  final case class Hit(key: String, segmentId: Int, docId: Int, score: Float)

  /** Top-k with the exact tie-break of HitQueue.cs:78-88 + TopDocs.Merge:
    * score desc, then global doc order (segmentId asc, docId asc).
    */
  def search(q: Query, k: Int): Vector[Hit] = {
    val rw = Query.rewrite(q)
    docs.flatMap(d => scoreDoc(rw, d).map(s => Hit(d.key, d.segmentId, d.docId, s)))
      .sortBy(h => (-h.score, h.segmentId, h.docId))
      .take(k)
  }

  def count(q: Query): Long = {
    val rw = Query.rewrite(q)
    docs.count(d => scoreDoc(rw, d).isDefined).toLong
  }
}

object OracleIndex {
  /** Deterministic segment assignment shared with the Spark build. */
  def segmentOf(key: String, numSegments: Int): Int =
    graft.model.Addressing.segmentOf(key, numSegments)

  def levenshtein(a: String, b: String): Int = {
    val dp = Array.tabulate(b.length + 1)(identity)
    for (i <- 1 to a.length) {
      var prev = dp(0)
      dp(0) = i
      for (j <- 1 to b.length) {
        val tmp = dp(j)
        dp(j) = math.min(math.min(dp(j) + 1, dp(j - 1) + 1),
          prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
        prev = tmp
      }
    }
    dp(b.length)
  }
}
