package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.pipeline.Classify

/** DatasetSplitter closed form vs a direct simulation of the reference's
  * sequential quota-writer loop (DatasetSplitter.cs:113-124). */
class DatasetSplitSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  /** The reference loop, verbatim: three counters, docs in order. */
  private def simulate(size: Int, testRatio: Double, cvRatio: Double): Seq[String] = {
    var testN = 0L
    var cvN = 0L
    (0 until size).map { b =>
      if (b % 2 == 0 && testN < size * testRatio) { testN += 1; "test" }
      else if (cvN < size * cvRatio) { cvN += 1; "cv" }
      else "train"
    }
  }

  test("closed form matches the sequential writer for varied sizes/ratios") {
    import spark.implicits._
    for ((size, tr, cr) <- Seq((100, 0.2, 0.1), (101, 0.33, 0.25), (7, 0.5, 0.5),
                               (64, 0.0, 0.3), (50, 0.9, 0.0), (1, 0.2, 0.2))) {
      val df = (0 until size).map(i => i).toDF("id")
      val got = Classify.splitDataset(df, Seq(col("id")), tr, cr)
        .orderBy("id").collect().map(_.getString(1)).toSeq
      assert(got === simulate(size, tr, cr), s"size=$size test=$tr cv=$cr")
    }
  }

  test("ratios are honored and every doc lands in exactly one set") {
    import spark.implicits._
    val df = (0 until 1000).map(i => i).toDF("id")
    val counts = Classify.splitDataset(df, Seq(col("id")), 0.2, 0.1)
      .groupBy("split").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("test") === 200)
    assert(counts("cv") === 100)
    assert(counts("train") === 700)
  }
}
