package graft.search

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Lucene.Net.Queries/Function analog: the ValueSource algebra
  * (/root/reference/src/Lucene.Net.Queries/Function/ValueSources/ — ~50
  * composable per-doc value sources) plus the two queries built on it,
  * FunctionQuery.cs (match-all, score = the value) and BoostedQuery.cs
  * (score = inner query score * the value).
  *
  * Spark-first: every source BINDS to a Catalyst [[Column]] over the hit
  * frame — arithmetic sources fold into whole-stage codegen; per-doc
  * sources (tf, query score) bind as left joins against term-pruned
  * postings reads; corpus stats (maxDoc, sumTotalTermFreq, docFreq, the
  * scale() min/max) resolve ONCE at query-build time from the reader's
  * collected stats — exactly where the reference resolves them
  * (FunctionQuery.CreateWeight / ScaleFloatFunction.CreateScaleInfo), so
  * nothing per-row leaves codegen.
  *
  * Arithmetic runs in double (the repo-wide ExactDouble oracle convention;
  * the reference computes these in float — documented divergence, same as
  * every other ExactDouble gate).
  *
  * Formula fidelity (file:line in the reference):
  *  - ReciprocalFloatFunction.cs:85  a / (m*x + b)
  *  - LinearFloatFunction.cs:71      x*slope + intercept
  *  - RangeMapFloatFunction.cs:88    lo<=x<=hi ? target : (default ?? x)
  *  - ScaleFloatFunction.cs:115,144  (x - minObserved) * scale + min,
  *    scale = (max-min)/(maxObs-minObs) (0 when degenerate), min/max
  *    observed over ALL docs of the index at weight creation
  *  - OrdFieldSource.cs / ReverseOrdFieldSource.cs:91  ordinal in the
  *    sorted distinct-value dictionary (0-based; missing = -1), rord =
  *    valueCount - ord - 1
  *  - IDFValueSource.cs:55           DefaultSimilarity.Idf = ln(maxDoc/(df+1))+1
  *  - TFValueSource.cs:184           DefaultSimilarity.Tf  = sqrt(freq)
  *  - TermFreqValueSource.cs         raw freq (0 when absent)
  *  - NormValueSource.cs             decode(encodedNorm) — byte315 roundtrip
  *  - QueryValueSource.cs            inner query score, defVal when no match
  */
object ValueSources {

  sealed trait VSrc extends Serializable
  final case class ConstVS(v: Double) extends VSrc
  /** Numeric doc column already on the hit frame (Float/Int/...FieldSource:
    * the doc-values analog — docs-table columns like fieldLen, or a column
    * joined in by the caller). */
  final case class ColVS(name: String) extends VSrc
  final case class LinearVS(src: VSrc, slope: Double, intercept: Double) extends VSrc
  final case class ReciprocalVS(src: VSrc, m: Double, a: Double, b: Double) extends VSrc
  final case class ScaleVS(src: VSrc, min: Double, max: Double) extends VSrc
  final case class RangeMapVS(src: VSrc, lo: Double, hi: Double, target: Double,
                              default: Option[Double]) extends VSrc
  final case class SumVS(srcs: List[VSrc]) extends VSrc
  final case class ProductVS(srcs: List[VSrc]) extends VSrc
  final case class MaxVS(a: VSrc, b: VSrc) extends VSrc
  final case class MinVS(a: VSrc, b: VSrc) extends VSrc
  final case class PowVS(a: VSrc, b: VSrc) extends VSrc
  final case class DivVS(a: VSrc, b: VSrc) extends VSrc
  /** IfFunction.cs: cond exists && != 0 -> then else otherwise. */
  final case class IfVS(cond: VSrc, thenV: VSrc, elseV: VSrc) extends VSrc
  /** Ordinal of the doc's value in the sorted distinct-value dictionary of a
    * STRING doc column (0-based, missing -> -1). */
  final case class OrdVS(field: String) extends VSrc
  final case class RordVS(field: String) extends VSrc
  /** sqrt(freq of `term` in the doc), DefaultSimilarity.Tf. */
  final case class TfVS(term: String) extends VSrc
  /** Raw freq of `term` in the doc (TermFreqValueSource). */
  final case class TermFreqVS(term: String) extends VSrc
  final case class IdfVS(term: String) extends VSrc
  final case class DocFreqVS(term: String) extends VSrc
  case object MaxDocVS extends VSrc
  case object NumDocsVS extends VSrc
  case object SumTotalTermFreqVS extends VSrc
  /** Decoded norm byte of the default field: byte315 roundtrip of
    * 1/sqrt(fieldLen) (NormValueSource.cs with DefaultSimilarity decode). */
  case object NormVS extends VSrc
  /** Inner query's score for the doc, `default` when it does not match. */
  final case class QueryVS(q: Query, default: Double) extends VSrc

  private val uid = new java.util.concurrent.atomic.AtomicInteger(0)
  private def fresh(prefix: String) = s"__vs_${prefix}_${uid.incrementAndGet()}"

  /** Reader-held stats, resolved like the reference's TermContext lookup at
    * query build: one term-pruned tiny read per distinct stat term. */
  private def docFreqOf(se: Searcher, term: String): Long = {
    val row = se.postingsSlim
      .filter(col("field") === se.defaultField && col("term") === term)
      .agg(sum(col("df")).cast("long")).collect()(0)
    if (row.isNullAt(0)) 0L else row.getLong(0)
  }

  /** Bind `vs` over `df` (must carry segmentId, docId and any ColVS/OrdVS
    * columns). Returns the frame (possibly widened by per-doc joins) and the
    * value column. */
  def bind(se: Searcher, df: DataFrame, vs: VSrc): (DataFrame, Column) = vs match {
    case ConstVS(v) => (df, lit(v))
    case ColVS(name) => (df, col(name).cast("double"))
    case LinearVS(s, m, c) =>
      val (d2, x) = bind(se, df, s); (d2, x * m + c)
    case ReciprocalVS(s, m, a, b) =>
      val (d2, x) = bind(se, df, s); (d2, lit(a) / (x * m + b))
    case RangeMapVS(s, lo, hi, t, dflt) =>
      val (d2, x) = bind(se, df, s)
      val other = dflt.map(lit).getOrElse(x)
      (d2, when(x >= lo && x <= hi, lit(t)).otherwise(other))
    case ScaleVS(s, mn, mx) =>
      // ScaleInfo at weight-creation time: min/max of the source observed
      // over ALL live docs (ScaleFloatFunction.cs:67-103 iterates maxDoc),
      // not just this query's hits.
      val base = se.docs
      val (bb, bx) = bind(se, base, s)
      val row = bb.agg(min(bx).cast("double"), max(bx).cast("double")).collect()(0)
      val (minObs, maxObs) =
        if (row.isNullAt(0)) (0d, 0d) else (row.getDouble(0), row.getDouble(1))
      val scale = if (maxObs - minObs == 0d) 0d else (mx - mn) / (maxObs - minObs)
      val (d2, x) = bind(se, df, s)
      (d2, (x - minObs) * scale + mn)
    case SumVS(ss) =>
      val (d2, cols) = bindAll(se, df, ss); (d2, cols.reduce(_ + _))
    case ProductVS(ss) =>
      val (d2, cols) = bindAll(se, df, ss); (d2, cols.reduce(_ * _))
    case MaxVS(a, b) =>
      val (d2, ca) = bind(se, df, a); val (d3, cb) = bind(se, d2, b)
      (d3, greatest(ca, cb))
    case MinVS(a, b) =>
      val (d2, ca) = bind(se, df, a); val (d3, cb) = bind(se, d2, b)
      (d3, least(ca, cb))
    case PowVS(a, b) =>
      val (d2, ca) = bind(se, df, a); val (d3, cb) = bind(se, d2, b)
      (d3, pow(ca, cb))
    case DivVS(a, b) =>
      val (d2, ca) = bind(se, df, a); val (d3, cb) = bind(se, d2, b)
      (d3, ca / cb)
    case IfVS(c, t, e) =>
      val (d2, cc) = bind(se, df, c)
      val (d3, ct) = bind(se, d2, t); val (d4, ce) = bind(se, d3, e)
      (d4, when(cc.isNotNull && cc =!= 0d, ct).otherwise(ce))
    case OrdVS(f) => bindOrd(se, df, f, reverse = false)
    case RordVS(f) => bindOrd(se, df, f, reverse = true)
    case TfVS(term) =>
      val (d2, c) = bindTermFreq(se, df, term); (d2, sqrt(c))
    case TermFreqVS(term) => bindTermFreq(se, df, term)
    case IdfVS(term) =>
      val dfq = docFreqOf(se, term)
      (df, lit(math.log(se.maxDoc.toDouble / (dfq + 1).toDouble) + 1.0))
    case DocFreqVS(term) => (df, lit(docFreqOf(se, term).toDouble))
    case MaxDocVS => (df, lit(se.maxDoc.toDouble))
    case NumDocsVS => (df, lit((se.maxDoc - se.deletedCount).toDouble))
    case SumTotalTermFreqVS => (df, lit(se.sumTotalTermFreq.toDouble))
    case NormVS =>
      // byte315 roundtrip of 1/sqrt(dl), evaluated through the same
      // SmallFloat tables the scorer uses (decode(encode(boost/sqrt(len)))).
      (df, graft.functions.ScalarExpressions.byte315Norm(col("fieldLen")))
    case QueryVS(q, default) =>
      val c = fresh("q")
      val hits = se.compile(q).toDF("segmentId", "docId", c)
      val joined = df.join(hits, Seq("segmentId", "docId"), "left_outer")
      (joined, coalesce(col(c), lit(default)))
  }

  private def bindAll(se: Searcher, df: DataFrame,
                      ss: List[VSrc]): (DataFrame, List[Column]) =
    ss.foldLeft((df, List.empty[Column])) { case ((d, acc), s) =>
      val (d2, c) = bind(se, d, s); (d2, acc :+ c)
    }

  /** Ordinal join: the sorted distinct-value dictionary of the column is
    * ranked distributed (Ranks.appendRank — value domains are bounded, and
    * even unbounded ones never funnel through one task), then joined back.
    * Missing value -> ord -1 (SortedDocValues.GetOrd). */
  private def bindOrd(se: Searcher, df: DataFrame, field: String,
                      reverse: Boolean): (DataFrame, Column) = {
    val ordCol = fresh(if (reverse) "rord" else "ord")
    val distinctVals = df.select(col(field)).filter(col(field).isNotNull).distinct()
    val valueCount = distinctVals.count()
    val ranked = graft.Ranks.appendRank(distinctVals, ordCol, Seq(col(field).asc))
      .withColumn(ordCol, col(ordCol).cast("long") - 1L)
    val joined = df.join(ranked, Seq(field), "left_outer")
    val ord = coalesce(col(ordCol), lit(-1L))
    val out = if (reverse) lit(valueCount) - ord - 1L else ord
    (joined, out.cast("double"))
  }

  /** Raw term frequency via a term-pruned postings read, 0 when absent. */
  private def bindTermFreq(se: Searcher, df: DataFrame,
                           term: String): (DataFrame, Column) = {
    val c = fresh("tf")
    val tfs = se.termPostings(term).select(col("url"), col("tf").cast("double").as(c))
    val joined = df.join(tfs, Seq("url"), "left_outer")
    (joined, coalesce(col(c), lit(0d)))
  }

  /** FunctionQuery.cs: matches every live doc, score = boost * value.
    * Returns (url, score, segmentId, docId) — rank with IndexCache.rankedIds. */
  def functionQuery(se: Searcher, vs: VSrc, boost: Double = 1.0): DataFrame = {
    val base = se.compile(MatchAllQ).toDF("segmentId", "docId", "__mscore")
      .join(se.docs, Seq("segmentId", "docId"))
    val (bound, c) = bind(se, base, vs)
    bound.withColumn("score", c * boost)
      .select("url", "score", "segmentId", "docId")
  }

  /** BoostedQuery.cs: score = inner query score * value. */
  def boostedQuery(se: Searcher, q: Query, vs: VSrc): DataFrame = {
    val base = se.compile(q)
      .join(se.docs.select("segmentId", "docId", "url", "fieldLen"),
        Seq("segmentId", "docId"))
    val (bound, c) = bind(se, base, vs)
    bound.withColumn("score", col("score") * c)
      .select("url", "score", "segmentId", "docId")
  }
}
