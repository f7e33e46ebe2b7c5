package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.analysis.Analyzers
import graft.search.{MemoryIndex, Query}

/** Percolation — the inverted search pattern MemoryIndex exists for
  * (/root/reference/src/Lucene.Net.Memory/MemoryIndex.cs class docs: match
  * a stream of documents against many STORED queries, one single-doc index
  * per document). Spark shape: the parsed query set is broadcast (queries
  * are small; documents are the 100 TB side), one narrow pass over the doc
  * stream builds a per-row MemoryIndex and emits (doc, query) match pairs —
  * no shuffle at all until the caller aggregates.
  */
object Percolator {

  /** Match every doc against every stored query: (idCol value, query_id)
    * pairs. Queries are rewritten once on the driver; per-partition the
    * analyzer is instantiated once.
    */
  def percolate(docs: DataFrame, idCol: String, textCol: String,
                queries: Seq[(String, Query)], analyzerName: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val qB = spark.sparkContext.broadcast(
      queries.map { case (name, q) => (name, Query.rewrite(q)) })
    docs.select(col(idCol).cast("long").as("id"), col(textCol).as("text"))
      .as[(Long, String)]
      .mapPartitions { rows =>
        val analyzer = Analyzers.byName(analyzerName)
        rows.flatMap { case (id, text) =>
          val mi = new MemoryIndex(if (text == null) "" else text, analyzer)
          qB.value.iterator.collect { case (name, q) if mi.matches(q) => (id, name) }
        }
      }
      .toDF(idCol, "query_id")
  }
}
