package graft.search

import graft.analysis.{Analyzer, Token}
import org.apache.spark.sql.functions._

/** QueryAutoStopWordAnalyzer (/root/reference/src/Lucene.Net.Analysis.Common/
  * Analysis/Query/QueryAutoStopWordAnalyzer.cs): wraps a delegate analyzer
  * and additionally drops terms whose INDEX docFreq exceeds a threshold —
  * stop words derived from the corpus itself rather than a fixed list
  * (AddStopWords: terms with df > maxDocFreq; the percentage overload uses
  * maxDocFreq = (int)(maxPercentDocs * numDocs)).
  *
  * The derivation is one pruned dictionary scan (df > threshold matches few
  * terms by construction — high-df terms are the rare tail of the term-df
  * distribution, a handful of stopword-scale entries even at web scale), so
  * the collected set is tiny. Dropped terms leave position gaps exactly
  * like a StopFilter (tokens carry absolute positions).
  */
object AutoStopAnalyzer {

  /** Index-derived stop terms of `field`: df > maxDocFreq, term order. */
  def stopTerms(se: Searcher, maxDocFreq: Long, field: String = null): Seq[String] = {
    val f = if (field == null) se.defaultField else field
    se.dictionary(f).filter(col("df") > maxDocFreq)
      .select("term").orderBy("term")
      .collect().map(_.getString(0)).toSeq
  }

  /** Percentage overload (QueryAutoStopWordAnalyzer.cs AddStopWords(reader,
    * maxPercentDocs)): threshold = (int)(maxPercentDocs * numDocs) with
    * numDocs = LIVE docs (maxDoc minus delete markers — the reference's
    * IndexReader.NumDocs, not MaxDoc). The product truncates in double (the
    * reference's float product differs by ulps only; double keeps the SQL
    * oracle twin exact). */
  def stopTermsByPercent(se: Searcher, maxPercentDocs: Double, field: String = null): Seq[String] =
    stopTerms(se, (maxPercentDocs * (se.maxDoc - se.deletedCount)).toLong, field)

  /** The wrapping analyzer: delegate chain, then drop the derived stops. */
  def apply(delegate: Analyzer, stops: Set[String]): Analyzer = new Analyzer {
    override def tokenize(text: String): Iterator[Token] =
      delegate.tokenize(text).filterNot(t => stops.contains(t.term))
  }

  def fromIndex(delegate: Analyzer, se: Searcher, maxPercentDocs: Double,
                field: String = null): Analyzer =
    apply(delegate, stopTermsByPercent(se, maxPercentDocs, field).toSet)
}
