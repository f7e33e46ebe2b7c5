package graft.search

import graft.analysis.Analyzer

/** AnalyzingQueryParser (/root/reference/src/Lucene.Net.QueryParser/
  * Analyzing/AnalyzingQueryParser.cs): classic grammar whose MULTI-TERM
  * operands also run through the analyzer — wildcard patterns analyze each
  * literal chunk between wildcards (GetWildcardQuery:74-112), prefix
  * (:142-146), fuzzy (:166-171) and range endpoints analyze whole. The
  * classic parser deliberately bypasses analysis for these (terms like
  * `Häus*` would otherwise never match an analyzed index); this dialect
  * closes that gap for normalizing/stemming analyzers.
  *
  * AnalyzeSingleChunk (:189-231): a chunk must analyze to EXACTLY one
  * token — zero ("analyzer returned no output") or several tokens raise
  * the reference's ParseException (IllegalArgumentException here).
  */
object AnalyzingQueryParser {

  def parse(query: String, analyzer: Analyzer,
            perField: Map[String, Analyzer] = Map.empty): Query =
    // lowerMultiTerm = false: chunks reach the analyzer in ORIGINAL case,
    // so case-preserving per-field analyzers (keyword) see the raw text
    transform(QueryParser.parse(query, analyzer, perField, lowerMultiTerm = false),
      analyzer, perField)

  private def transform(q: Query, analyzer: Analyzer,
                        perField: Map[String, Analyzer]): Query = q match {
    case FieldQ(f, inner) =>
      FieldQ(f, transform(inner, perField.getOrElse(f, analyzer), perField))
    case BoolQ(cs, msm) =>
      BoolQ(cs.map { case (o, c) => (o, transform(c, analyzer, perField)) }, msm)
    case DisMaxQ(cs, tb) => DisMaxQ(cs.map(transform(_, analyzer, perField)), tb)
    case ConstantScoreQ(inner, b) => ConstantScoreQ(transform(inner, analyzer, perField), b)
    case PrefixQ(p) => PrefixQ(chunk(analyzer, p))
    case WildcardQ(pat) => WildcardQ(analyzeWildcard(analyzer, pat))
    case FuzzyQ(t, me) => FuzzyQ(chunk(analyzer, t), me)
    case FuzzyTopQ(t, me, mx, b) => FuzzyTopQ(chunk(analyzer, t), me, mx, b)
    case RangeQ(lo, hi, il, ih) =>
      RangeQ(if (lo == null) null else chunk(analyzer, lo),
        if (hi == null) null else chunk(analyzer, hi), il, ih)
    case other => other
  }

  /** GetWildcardQuery: analyze each literal chunk, keep the wildcards. */
  private def analyzeWildcard(analyzer: Analyzer, pattern: String): String = {
    val sb = new StringBuilder
    val cur = new StringBuilder
    def flush(): Unit = {
      if (cur.nonEmpty) { sb ++= chunk(analyzer, cur.toString); cur.clear() }
    }
    pattern.foreach {
      case w @ ('*' | '?') => flush(); sb += w
      case c => cur += c
    }
    flush()
    sb.toString
  }

  /** AnalyzeSingleChunk: exactly one analyzed token or error. */
  private def chunk(analyzer: Analyzer, s: String): String = {
    val toks = analyzer.tokenize(s).map(_.term).toList
    toks match {
      case one :: Nil => one
      case Nil => throw new IllegalArgumentException(
        s"analyzer returned no output for chunk '$s'")
      case many => throw new IllegalArgumentException(
        s"analyzer returned several tokens for chunk '$s': ${many.mkString(",")}")
    }
  }
}
