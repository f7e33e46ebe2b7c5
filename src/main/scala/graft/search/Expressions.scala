package graft.search

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Lucene.Net.Expressions analog (/root/reference/src/Lucene.Net.Expressions/):
  * the reference compiles a JavaScript-like arithmetic expression over
  * bindings — `_score` plus numeric doc values — to bytecode
  * (JS/JavascriptCompiler.cs, SimpleBindings.cs) and uses it as a sort
  * field (ExpressionSortField.cs) or a rescorer (ExpressionRescorer.cs).
  *
  * Spark-first, the expression language IS Catalyst: the string compiles
  * through `expr()` against the same bindings (the hit's `_score` column
  * plus any numeric columns of a url-keyed bindings table — the doc-values
  * analog), executes inside whole-stage codegen, and supports a strict
  * superset of the reference's JS arithmetic (+ - * / %, comparisons,
  * ternary via CASE/if, ln/log/sqrt/pow/abs/min/max trig...).
  *
  * A doc with no bindings row keeps ranking with its values bound to 0 —
  * the reference's missing-doc-value semantics (a LEFT join + coalesce,
  * not an inner join that would drop the hit).
  */
object Expressions {

  /** Shared ranking tail: bind `_score` + doc values (absent rows -> 0),
    * evaluate the expression, rank desc with url tie-break. The bindings
    * table is corpus-sized (one row per doc with values) and a LEFT OUTER
    * join can only build on ITS side — so it is first pruned with a semi
    * join against the hit urls (there the hit set IS a valid build side):
    * the outer join's right side then carries at most one row per hit and
    * broadcasts, whatever the corpus size. */
  private def rankByExpr(hits: DataFrame, expression: String, bindings: DataFrame,
                         k: Int): DataFrame = {
    val boundCols = bindings.columns.filterNot(_ == "url")
    val pruned = bindings.join(hits.select("url"), Seq("url"), "left_semi")
    val joined0 = hits.withColumnRenamed("score", "_score")
      .join(pruned, Seq("url"), "left_outer")
    val joined = boundCols.foldLeft(joined0) { (df, c) =>
      df.withColumn(c, coalesce(col(c), lit(0d)))
    }
    joined.withColumn("expr_score", expr(expression))
      .select("url", "expr_score", "segmentId", "docId")
      .orderBy(col("expr_score").desc, col("url").asc)
      .limit(k)
  }

  /** ExpressionSortField: the expression's value ranks the query's matches
    * (descending, reverse=true analog), ties on url. Returns
    * (url, expr_score, segmentId, docId) top-k. */
  def sortBy(se: Searcher, q: Query, expression: String, bindings: DataFrame,
             k: Int): DataFrame =
    rankByExpr(
      se.compile(q).join(se.docs.select("segmentId", "docId", "url"),
        Seq("segmentId", "docId")),
      expression, bindings, k)

  /** ExpressionRescorer.Rescore: re-rank only the top-`window` first-pass
    * hits by the expression (second pass over a bounded candidate set). */
  def rescoreTopK(se: Searcher, q: Query, window: Int, expression: String,
                  bindings: DataFrame, k: Int): DataFrame =
    rankByExpr(se.search(q, window), expression, bindings, k)
}
