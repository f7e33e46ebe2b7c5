package graft.search

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Prefix completion suggester — the AnalyzingSuggester/FST-completion analog
  * (/root/reference/src/Lucene.Net.Suggest/Suggest/Analyzing/
  * AnalyzingSuggester.cs): completions of an analyzed prefix ranked by
  * weight. The reference walks a weighted FST; the Spark-native equivalent
  * ranks the (Parquet min/max-prunable) sorted term dictionary by the same
  * weight — here df (ttf works too), tie-break term asc, exactly the
  * suggester's (weight desc, key asc) output order.
  */
object Suggest {

  /** Top-k completions of `prefix` from a (term, df, ttf) dictionary. */
  def complete(dictionary: DataFrame, prefix: String, k: Int): DataFrame =
    dictionary
      .filter(col("term").startsWith(prefix))
      .orderBy(col("df").desc, col("term").asc)
      .limit(k) // parallel top-k; the rank window below sees only k rows
      .withColumn("rank", row_number().over(
        Window.partitionBy(lit(0)).orderBy(col("df").desc, col("term").asc)))
      .select(col("term"), col("df"), col("rank"))
      .orderBy("rank")
}
