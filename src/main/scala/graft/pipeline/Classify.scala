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

  /** DatasetSplitter analog (/root/reference/src/Lucene.Net.Classification/
    * Utils/DatasetSplitter.cs:113-124): split a corpus into train / test /
    * cross-validation sets. The reference walks docs in order with three
    * quota-bounded writers: an even-position doc goes to TEST while the test
    * writer is under size*testRatio; otherwise the doc goes to CV while the
    * cv writer is under size*cvRatio; else TRAINING. That sequential loop
    * has a closed form over the doc's global position b (no per-row state):
    *   test  <=> b even       && b/2 < capTest
    *   cvBefore(b) = floor(b/2) + max(0, ceil(b/2) - capTest)
    *   cv    <=> !test && cvBefore(b) < capCv
    * (floor(b/2) odd positions before b all attempted cv; even positions
    * beyond the test quota overflow into cv in order). The global position
    * comes from Ranks.appendRank — parallel, no single-partition window.
    * `order` must be a total order (the reference's MatchAll docId order).
    *
    * Returns the input with a `split` column in {"test", "cv", "train"}.
    */
  def splitDataset(df: DataFrame, order: Seq[org.apache.spark.sql.Column],
                   testRatio: Double, cvRatio: Double): DataFrame = {
    val size = df.count()
    val capTest = math.ceil(size * testRatio).toLong
    val capCv = math.ceil(size * cvRatio).toLong
    val withB = graft.Ranks.appendRank(df, "splitPos", order)
      .withColumn("b", col("splitPos").cast("long") - 1L)
    val isTest = col("b") % 2 === 0 && col("b") / 2 < capTest
    val cvBefore = floor(col("b") / 2) +
      greatest(ceil(col("b") / 2) - capTest, lit(0L))
    val isCv = !isTest && cvBefore < capCv
    withB
      .withColumn("split",
        when(isTest, "test").when(isCv, "cv").otherwise("train"))
      .drop("splitPos", "b")
  }
}
