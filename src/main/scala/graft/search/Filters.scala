package graft.search

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Lucene.Net.Queries filter algebra: TermsFilter.cs (docs containing ANY of
  * a set of terms), BooleanFilter.cs (Occur-composed filter clauses) and
  * FilteredQuery-style application of a filter to a scored query.
  *
  * A Filter here IS its doc-id set: a (segmentId, docId) DataFrame — the
  * DocIdSet analog, distributed instead of a per-segment FixedBitSet. Set
  * algebra is joins (semi/anti) and unions; Catalyst picks broadcast vs
  * shuffle per side, and at web scale none of the combinators funnels
  * through the driver.
  *
  * BooleanFilter composition order replicates BooleanFilter.cs:GetDocIdSet:
  * SHOULD clauses OR together first (present-but-empty SHOULD union =>
  * nothing matches); MUST_NOT subtracts (from the all-docs set when no
  * SHOULD exists — "may set bits on deleted docs" in the reference; here the
  * all-docs base is the live docs table, documented divergence in favor of
  * never resurrecting deletes); MUST clauses AND last.
  */
object Filters {

  /** TermsFilter.cs: docs containing ANY of `terms` in `field` — a
    * constant-score disjunction routed through the engine's own compile
    * path (term-pruned postings reads). */
  def terms(se: Searcher, ts: Seq[String], field: String = ""): DataFrame = {
    val f = if (field.isEmpty) se.defaultField else field
    val inner = BoolQ(ts.toList.map(t => Occur.Should -> (TermQ(t): Query)))
    val q: Query = if (f == se.defaultField) inner else FieldQ(f, inner)
    query(se, ConstantScoreQ(q))
  }

  /** QueryWrapperFilter.cs: any query as a filter (scores discarded). */
  def query(se: Searcher, q: Query): DataFrame =
    se.compile(q).toDF("segmentId", "docId", "__s")
      .select("segmentId", "docId").distinct()

  /** NumericRangeFilter over a numeric docs-table column (inclusive). */
  def numericRange(se: Searcher, colName: String, lo: Long, hi: Long): DataFrame =
    se.docs.filter(col(colName) >= lo && col(colName) <= hi)
      .select("segmentId", "docId")

  /** BooleanFilter.cs: compose clause doc-id sets by Occur. */
  def boolean(se: Searcher, clauses: Seq[(Occur.Value, DataFrame)]): DataFrame = {
    val shoulds = clauses.collect { case (Occur.Should, f) => f }
    val nots = clauses.collect { case (Occur.MustNot, f) => f }
    val musts = clauses.collect { case (Occur.Must, f) => f }
    val keys = Seq("segmentId", "docId")

    // SHOULD union (BooleanFilter.cs: res |= disi). No shoulds -> None.
    var res: Option[DataFrame] =
      if (shoulds.isEmpty) None
      else Some(shoulds.reduce(_.unionByName(_)).distinct())
    // MUST_NOT (res.AndNot): when res is still null the reference starts
    // from the full maxDoc bitset; the live docs table is our base.
    if (nots.nonEmpty) {
      val base = res.getOrElse(se.docs.select("segmentId", "docId"))
      res = Some(nots.foldLeft(base)((acc, n) => acc.join(n, keys, "left_anti")))
    }
    // MUST (res.And, or init from the first MUST).
    val out = musts.foldLeft(res) {
      case (None, m) => Some(m)
      case (Some(acc), m) => Some(acc.join(m, keys, "left_semi"))
    }
    out.getOrElse(se.docs.limit(0).select("segmentId", "docId"))
  }

  /** FilteredQuery application: the query's scored hits restricted to the
    * filter's doc-id set (scores preserved — QUERY_FIRST_FILTER_STRATEGY
    * shape: the scorer drives, the filter is a semi-join). */
  def filtered(se: Searcher, q: Query, filter: DataFrame): DataFrame =
    se.compile(q).join(filter, Seq("segmentId", "docId"), "left_semi")
}
