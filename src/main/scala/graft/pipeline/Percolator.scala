package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.analysis.Analyzers
import graft.search._

/** Percolation — the inverted search pattern MemoryIndex exists for
  * (/root/reference/src/Lucene.Net.Memory/MemoryIndex.cs class docs: match
  * a stream of documents against many STORED queries, one single-doc index
  * per document). Spark shape: the parsed query set is broadcast (queries
  * are small; documents are the 100 TB side), one narrow pass over the doc
  * stream builds a per-row MemoryIndex and emits (doc, query) match pairs —
  * no shuffle at all until the caller aggregates.
  */
object Percolator {

  /** Guard-term set of a query: a doc can match only if it contains at
    * least ONE of these terms (a necessary condition, never sufficient).
    * None = unguardable (match-all, multi-term expansion, pure negation) —
    * such queries are evaluated against every doc. For a conjunction the
    * SMALLEST single clause guard suffices (every MUST must hold), the
    * index-the-queries trick of production percolators.
    */
  private[pipeline] def guardTerms(q: Query): Option[Set[String]] = q match {
    case TermQ(t, _) => Some(Set(t))
    case PayloadScoreQ(t, _, _) => Some(Set(t)) // matches iff the term matches
    case PayloadNearQ(sp, _, _) => Some(SpanMatcher.termsOf(sp))
    case PhraseQ(terms, _, _) => Some(terms.map(_._1).toSet)
    case MultiPhraseQ(slots, _) => Some(slots.flatMap(_._1).toSet)
    case FieldQ(_, inner) => guardTerms(inner)
    case ConstantScoreQ(inner, _) => guardTerms(inner)
    case SpanMatchQ(span, _) => Some(SpanMatcher.termsOf(span))
    case SpanScoreQ(span, _) => Some(SpanMatcher.termsOf(span))
    case DisMaxQ(clauses, _) =>
      val gs = clauses.map(guardTerms)
      if (gs.exists(_.isEmpty)) None else Some(gs.flatMap(_.get).toSet)
    case BoolQ(clauses, _) =>
      val mustClauses = clauses.filter(_._1 == Occur.Must)
      val mustGuards = mustClauses.flatMap(c => guardTerms(c._2))
      if (mustGuards.nonEmpty) Some(mustGuards.minBy(_.size)) // cheapest necessary clause
      else if (mustClauses.nonEmpty) None // MUSTs exist but are unguardable:
      // SHOULD clauses are then OPTIONAL (needed = 0), so their union is NOT
      // a necessary condition — the query must be evaluated everywhere
      else {
        val should = clauses.filter(_._1 == Occur.Should).map(c => guardTerms(c._2))
        if (should.isEmpty || should.exists(_.isEmpty)) None
        else Some(should.flatMap(_.get).toSet)
      }
    case _ => None // MatchAll, prefix/wildcard/regexp/fuzzy/range, payload
  }

  /** Match every doc against every stored query: (idCol value, query_id)
    * pairs. Queries are rewritten and GUARD-INDEXED once on the driver
    * (term -> candidate queries); each doc then evaluates only the queries
    * whose guard intersects its term set, plus the unguardable ones — with
    * selective stored queries a doc touches a handful of candidates instead
    * of the whole query store.
    */
  def percolate(docs: DataFrame, idCol: String, textCol: String,
                queries: Seq[(String, Query)], analyzerName: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val parsed = queries.map { case (name, q) => (name, Query.rewrite(q)) }.toArray
    val byTerm: Map[String, Array[Int]] = parsed.zipWithIndex
      .flatMap { case ((_, q), i) => guardTerms(q).toSeq.flatMap(_.map(_ -> i)) }
      .groupBy(_._1).map { case (t, xs) => t -> xs.map(_._2).distinct.sorted }
    val always: Array[Int] = parsed.zipWithIndex
      .collect { case ((_, q), i) if guardTerms(q).isEmpty => i }
    val qB = spark.sparkContext.broadcast((parsed, byTerm, always))
    docs.select(col(idCol).cast("long").as("id"), col(textCol).as("text"))
      .as[(Long, String)]
      .mapPartitions { rows =>
        val analyzer = Analyzers.byName(analyzerName)
        val (qs, guards, unguarded) = qB.value
        rows.flatMap { case (id, text) =>
          val mi = new MemoryIndex(if (text == null) "" else text, analyzer)
          val cands = (mi.terms.iterator.flatMap(t => guards.getOrElse(t, Array.empty[Int]))
            ++ unguarded.iterator).toArray.distinct.sorted
          cands.iterator.collect { case i if mi.matches(qs(i)._2) => (id, qs(i)._1) }
        }
      }
      .toDF(idCol, "query_id")
  }
}
