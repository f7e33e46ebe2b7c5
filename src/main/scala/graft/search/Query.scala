package graft.search

/** Query ADT — the analog of the reference's Query class tree
  * (/root/reference/src/Lucene.Net.Core/Search/: TermQuery, BooleanQuery,
  * PhraseQuery, PrefixQuery, TermRangeQuery, WildcardQuery, FuzzyQuery,
  * MatchAllDocsQuery, ConstantScoreQuery, DisjunctionMaxQuery).
  */
sealed trait Query extends Serializable

object Occur extends Enumeration {
  val Must, Should, MustNot = Value
}

final case class TermQ(term: String, boost: Float = 1f) extends Query

/** Clause algebra per BooleanQuery.cs:429-495; minShouldMatch applies to
  * Should clauses only. Clause count is capped at 1024
  * (BooleanQuery.MaxClauseCount / TooManyClauses, BooleanQuery.cs:44).
  */
final case class BoolQ(clauses: List[(Occur.Value, Query)], minShouldMatch: Int = 0) extends Query {
  require(clauses.size <= Query.MaxClauseCount,
    s"too many boolean clauses: ${clauses.size} > ${Query.MaxClauseCount}")
}

/** Exact phrase: terms with their relative positions (gaps > 1 encode removed
  * stopwords, PhraseQuery.cs:383-402 / ExactPhraseScorer.cs:26-49).
  */
final case class PhraseQ(terms: List[(String, Int)], boost: Float = 1f,
                         /** slop > 0 switches to SloppyPhraseScorer semantics
                           * (sloppyFreq = 1/(distance+1)); terms must be distinct. */
                         slop: Int = 0) extends Query

/** Phrase with term alternatives per slot (MultiPhraseQuery.cs): slot i
  * matches if ANY of its terms sits at base + offset_i. idf = sum over all
  * alternatives of all slots (IdfExplain(termStats[]) semantics).
  */
final case class MultiPhraseQ(slots: List[(Set[String], Int)], boost: Float = 1f) extends Query

/** Span-algebra matching as a constant-score query (Search/Spans family). */
final case class SpanMatchQ(span: SpanQ, boost: Float = 1f) extends Query

/** Scored span query — the SpanScorer semantics (Search/Spans/SpanScorer.cs:
  * 72-88): per-doc freq = sum over the doc's (distinct) spans of
  * sloppyFreq(end - start) = 1/(matchLength + 1), scored with the summed idf
  * of the span's terms like a phrase (SpanWeight). */
final case class SpanScoreQ(span: SpanQ, boost: Float = 1f) extends Query

final case class PrefixQ(prefix: String) extends Query
/** Term range [lo, hi]; null bound = open (TermRangeQuery.cs). */
final case class RangeQ(lo: String, hi: String, includeLo: Boolean = true, includeHi: Boolean = true) extends Query
/** Wildcard with * (any run) and ? (one char), WildcardQuery.cs. */
final case class WildcardQ(pattern: String) extends Query
/** Regular-expression dictionary scan (RegexpQuery.cs; matching is anchored
  * over the whole term exactly like the reference's automaton intersection —
  * dialect here is Java/Spark rlike rather than Lucene's RegExp class;
  * [[LuceneRegexpQ]] carries the faithful Lucene dialect). */
final case class RegexpQ(pattern: String) extends Query
/** RegexpQuery in Lucene's OWN RegExp dialect (Util/Automaton/RegExp.cs
  * grammar incl. `~` complement, `&` intersection, `<n-m>` intervals, `@`
  * any-string, `#` empty, `"..."` literals): parsed by
  * [[LuceneRegExp.parse]], pruned in-plan by a sargable over-approximation,
  * decided exactly by the span matcher. */
final case class LuceneRegexpQ(pattern: String) extends Query
/** Terms within Levenshtein distance maxEdits, CONSTANT_SCORE_FILTER rewrite
  * (doc-set semantics; FuzzyQuery.cs:57-85 with a filter rewrite). */
final case class FuzzyQ(term: String, maxEdits: Int = 2) extends Query
/** The reference FuzzyQuery's DEFAULT behavior: top-`maxExpansions` expanded
  * terms by boost = 1 - ed/min(|cand|, |term|) (exact match -> 1), planned as
  * a scored SHOULD-disjunction of boosted term queries in term order —
  * TopTermsScoringBooleanQueryRewrite (FuzzyQuery.cs:106,
  * FuzzyTermsEnum.cs:440-460 raw-edits path with minSimilarity=0 scale=1,
  * TopTermsRewrite.cs:72-87 PQ by (boost, then smaller-term-wins) + final
  * term-order clause assembly).
  */
final case class FuzzyTopQ(term: String, maxEdits: Int = 2, maxExpansions: Int = 50,
                           boost: Float = 1f) extends Query
/** Payload-driven scoring of one term's matches — the PayloadTermQuery
  * (includeSpanScore = false) analog (/root/reference/src/Lucene.Net.Core/
  * Search/Payloads/PayloadTermQuery.cs with MinPayloadFunction /
  * MaxPayloadFunction / AveragePayloadFunction): score = fn over the
  * 4-byte-int payloads attached to the term's positions in the doc
  * (payload-less matches score the 1.0 default, PayloadFunction default).
  * `fn` is one of "min" | "max" | "avg".
  */
final case class PayloadScoreQ(term: String, fn: String = "avg", boost: Float = 1f) extends Query

/** PayloadNearQuery (Search/Payloads/PayloadNearQuery.cs): a SpanNearQuery
  * whose score is the SpanScorer value MULTIPLIED by a PayloadFunction
  * aggregate (`fn` = "min" | "max" | "avg") over the payloads collected
  * from every matching span of the doc (PayloadNearSpanScorer.GetPayloads
  * walks all sub-spans; DocScore defaults to 1.0 when no payloads seen).
  * Payload bytes decode as 4-byte ints like PayloadScoreQ (the
  * IntegerEncoder discipline). */
final case class PayloadNearQ(span: SpanNearS, fn: String = "avg", boost: Float = 1f) extends Query

case object MatchAllQ extends Query
final case class ConstantScoreQ(inner: Query, boost: Float = 1f) extends Query
/** score = max + tieBreaker * (sum - max), DisjunctionMaxQuery.cs:46,113. */
final case class DisMaxQ(clauses: List[Query], tieBreaker: Float = 0f) extends Query
/** Rebind the field of the whole subtree (a posting key is (field, term) —
  * Index/Term.cs; QueryParser's `field:` syntax produces this wrapper).
  * Innermost binding wins, matching the classic parser's scoping.
  */
final case class FieldQ(field: String, inner: Query) extends Query

object Query {
  /** BooleanQuery.cs:44 maxClauseCount default. */
  val MaxClauseCount = 1024

  /** Rewrite-to-fixpoint normalization (IndexSearcher.cs:673-680 analog):
    * 1-term phrase -> term (PhraseQuery.cs:164); single-clause MUST/SHOULD bool
    * collapse (BooleanQuery.cs:522).
    */
  def rewrite(q: Query): Query = q match {
    case PhraseQ((t, _) :: Nil, boost, _) => TermQ(t, boost)
    case BoolQ((occ, inner) :: Nil, msm) if occ != Occur.MustNot && msm <= (if (occ == Occur.Should) 1 else 0) =>
      rewrite(inner)
    case BoolQ(cs, msm) => BoolQ(cs.map { case (o, c) => (o, rewrite(c)) }, msm)
    case DisMaxQ(cs, tb) => DisMaxQ(cs.map(rewrite), tb)
    case ConstantScoreQ(inner, boost) => ConstantScoreQ(rewrite(inner), boost)
    case FieldQ(f, inner) => rewrite(inner) match {
      case FieldQ(g, q2) => FieldQ(g, q2) // innermost binding wins
      case q2 => FieldQ(f, q2)
    }
    case other => other
  }

  /** All (field, term) posting keys a query needs lists for, given the
    * default field (dictionary-expanding queries like prefix/range/wildcard/
    * fuzzy are resolved separately).
    */
  def fieldTerms(q: Query, field: String): Set[(String, String)] = q match {
    case TermQ(t, _) => Set(field -> t)
    case BoolQ(cs, _) => cs.flatMap(c => fieldTerms(c._2, field)).toSet
    case PhraseQ(ts, _, _) => ts.map(field -> _._1).toSet
    case MultiPhraseQ(ss, _) => ss.flatMap(_._1).map(field -> _).toSet
    case SpanMatchQ(sp, _) => SpanMatcher.fieldTermsOf(sp, field)
    case SpanScoreQ(sp, _) => SpanMatcher.fieldTermsOf(sp, field)
    case PayloadScoreQ(t, _, _) => Set(field -> t)
    case PayloadNearQ(sp, _, _) => SpanMatcher.fieldTermsOf(sp, field)
    case DisMaxQ(cs, _) => cs.flatMap(fieldTerms(_, field)).toSet
    case ConstantScoreQ(inner, _) => fieldTerms(inner, field)
    case FieldQ(f, inner) => fieldTerms(inner, f)
    case _ => Set.empty
  }

  /** CommonTermsQuery rewrite (Queries/CommonTermsQuery.cs:56): terms with
    * df/maxDoc above `maxTermFrequency` become SHOULD-only (scoring bonus),
    * rare terms keep the given occur — high-frequency terms stop gating
    * recall exactly as in the reference.
    */
  def commonTerms(terms: List[String], stats: Map[String, (Long, Long)], maxDoc: Long,
                  lowFreqOccur: Occur.Value = Occur.Must,
                  maxTermFrequency: Double = 0.4): Query = {
    val clauses = terms.map { t =>
      val df = stats.get(t).map(_._1).getOrElse(0L)
      val occ = if (df.toDouble / math.max(maxDoc, 1) > maxTermFrequency) Occur.Should else lowFreqOccur
      occ -> (TermQ(t): Query)
    }
    BoolQ(clauses)
  }

  /** Apply a `^boost` multiplicatively — the classic parser's boost
    * production (Classic/QueryParserBase.cs:497-515 and the `^` handling in
    * QueryParser.cs). Boosting a composite distributes into its scoring
    * children, which is exactly the reference's Weight normalization: a
    * parent's boost propagates down as topLevelBoost and multiplies into
    * every child weight (Search/Weight.cs Normalize(norm, topLevelBoost));
    * all our combiners (sum, max+tie*(sum-max)) are linear, so the scores
    * are identical. Constant-score dictionary queries gain a
    * ConstantScoreQ wrapper (their score IS the boost).
    */
  def withBoost(q: Query, b: Float): Query =
    if (b == 1f) q
    else q match {
      case TermQ(t, b0) => TermQ(t, b0 * b)
      case PhraseQ(ts, b0, s) => PhraseQ(ts, b0 * b, s)
      case MultiPhraseQ(ss, b0) => MultiPhraseQ(ss, b0 * b)
      case SpanMatchQ(s, b0) => SpanMatchQ(s, b0 * b)
      case SpanScoreQ(s, b0) => SpanScoreQ(s, b0 * b)
      case FuzzyTopQ(t, e, m, b0) => FuzzyTopQ(t, e, m, b0 * b)
      case PayloadScoreQ(t, f, b0) => PayloadScoreQ(t, f, b0 * b)
      case PayloadNearQ(s, f, b0) => PayloadNearQ(s, f, b0 * b)
      case ConstantScoreQ(i, b0) => ConstantScoreQ(i, b0 * b)
      case BoolQ(cs, msm) =>
        BoolQ(cs.map { case (o, c) => (o, if (o == Occur.MustNot) c else withBoost(c, b)) }, msm)
      case DisMaxQ(cs, t) => DisMaxQ(cs.map(withBoost(_, b)), t)
      case FieldQ(f, i) => FieldQ(f, withBoost(i, b))
      case other => ConstantScoreQ(other, b) // MatchAll / dictionary queries
    }

  /** NGramPhraseQuery (Search/NGramPhraseQuery.cs:46-88 Rewrite): an EXACT
    * (slop 0) phrase of consecutive-position n-gram terms keeps only every
    * n-th slot plus the last — adjacent n-grams overlap by n-1 chars, so
    * the retained slots pin the identical doc set with fewer posting
    * lists. Non-optimizable shapes (slop != 0, n < 2, < 3 terms,
    * non-consecutive positions) return the phrase unchanged, like the
    * reference's base.Rewrite fallthrough. */
  def ngramPhrase(n: Int, q: PhraseQ): PhraseQ = {
    if (q.slop != 0 || n < 2 || q.terms.lengthCompare(3) < 0) return q
    val consecutive = q.terms.map(_._2).sliding(2).forall {
      case Seq(a, b) => a + 1 == b
      case _ => true
    }
    if (!consecutive) return q
    val lastIdx = q.terms.length - 1
    PhraseQ(q.terms.zipWithIndex.collect {
      case ((t, p), i) if i % n == 0 || i >= lastIdx => (t, p)
    }, q.boost, 0)
  }

  /** Wildcard pattern -> regex (anchored), for dictionary scans. */
  def wildcardRegex(pattern: String): String = {
    val sb = new StringBuilder
    pattern.foreach {
      case '*' => sb.append(".*")
      case '?' => sb.append(".")
      case c if "\\.[]{}()<>+-=!^$|".indexOf(c) >= 0 => sb.append('\\').append(c)
      case c => sb.append(c)
    }
    sb.toString
  }
}
