package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.analysis.Analyzers
import graft.search.{BoolQ, Occur, Searcher, TermQ}

/** Classification module — the Lucene.Net.Classification analogs.
  *
  * The reference trains against an index (AtomicReader) and issues DocFreq /
  * count queries per (word, class); here training reads the labeled doc
  * store directly — one tokenize pass + one (class, term) aggregation — the
  * same statistics with one shuffle instead of |words|×|classes| queries,
  * which is the 100 TB shape.
  */
object Classify {

  /** SimpleNaiveBayesClassifier analog (/root/reference/src/
    * Lucene.Net.Classification/SimpleNaiveBayesClassifier.cs:127-201),
    * formula-faithful:
    *   score(c) = ln(nc) - ln(n)                        (CalculateLogPrior)
    *            + Σ_w ln((df(w,c) + 1) / den(c))        (CalculateLogLikelihood)
    *   den(c)   = avgUniqueTermsPerDoc * nc + n         (GetTextTermFreqForClass
    *                                                     + docsWithClassSize)
    * where df(w,c) counts docs of class c containing w, the word sum runs
    * over the input's tokens WITH duplicates (the reference iterates the
    * tokenized doc), and avgUniqueTermsPerDoc = sumDocFreq / docCount.
    *
    * Returns every class ranked by (score desc, class asc): (cls, rank).
    */
  def naiveBayes(docs: DataFrame, textCol: String, classCol: String,
                 inputText: String, analyzerName: String = "simple"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val words: Seq[(String, Int)] = {
      val ts = Analyzers.byName(analyzerName).terms(inputText)
      ts.distinct.map(w => w -> ts.count(_ == w))
    }
    require(words.nonEmpty, "input text analyzed to zero tokens")

    // one tokenize pass over the labeled store: distinct (class, term) doc pairs
    val pairs = docs.select(col(classCol).cast("string").as("cls"), col(textCol).as("text"))
      .as[(String, String)]
      .mapPartitions { rows =>
        val a = Analyzers.byName(analyzerName)
        rows.flatMap { case (cls, text) =>
          a.terms(if (text == null) "" else text).distinct.map(t => (cls, t))
        }
      }.toDF("cls", "term")

    val n = docs.count()
    val totalPairs = pairs.count() // sumDocFreq over the text field
    val avgUnique = totalPairs.toDouble / n

    val classes = docs.groupBy(col(classCol).cast("string").as("cls"))
      .agg(count(lit(1)).as("nc"))
    val dfc = pairs.groupBy("cls", "term").agg(count(lit(1)).as("df"))
    val wordsDf = spark.createDataset(words).toDF("term", "mult")

    val nClasses = classes.count().toInt // true rank bound: one row per class
    val scored = classes.crossJoin(broadcast(wordsDf))
      .join(dfc, Seq("cls", "term"), "left_outer")
      .withColumn("dfw", coalesce(col("df"), lit(0L)))
      .withColumn("den", lit(avgUnique) * col("nc") + lit(n.toDouble))
      .groupBy("cls", "nc")
      .agg(sum(col("mult") * log((col("dfw") + 1d) / col("den"))).as("lik"))
      .withColumn("score", log(col("nc").cast("double")) - log(lit(n.toDouble)) + col("lik"))
      .select(col("cls"), col("score"))
    graft.Ranks.rankTopK(scored, nClasses, Seq(col("score").desc, col("cls").asc))
      .select("cls", "rank")
  }

  /** KNearestNeighborClassifier analog (/root/reference/src/
    * Lucene.Net.Classification/KNearestNeighborClassifier.cs:105-116): a
    * more-like-this disjunction of the input's distinct terms retrieves the
    * BM25 top-k neighbours; the class with the most votes wins (score =
    * votes/k). Returns per-class votes ranked (votes desc, class asc).
    * `labels` maps the doc store's url to its class: (url, cls).
    */
  def knn(se: Searcher, labels: DataFrame, inputText: String, k: Int,
          analyzerName: String = "simple"): DataFrame = {
    val terms = Analyzers.byName(analyzerName).terms(inputText).distinct
    require(terms.nonEmpty, "input text analyzed to zero tokens")
    val q = BoolQ(terms.map(t => Occur.Should -> TermQ(t)).toList)
    val top = se.search(q, k).select("url")
    val votes = broadcast(top).join(labels, "url")
      .groupBy(col("cls")).agg(count(lit(1)).as("votes"))
    // k neighbours cast at most k distinct class votes — the exact bound
    graft.Ranks.rankTopK(votes, k, Seq(col("votes").desc, col("cls").asc))
      .select("cls", "votes", "rank")
  }
}
