package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.Dedup

/** Duplicate clustering (connected components over the dup-pair graph via
  * hash-min label propagation): chains collapse to one representative,
  * separate components keep their own minima, non-convergence throws.
  */
class DupClustersSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def clusters(pairs: Seq[(Long, Long)], maxIter: Int = 20): Map[Long, Long] =
    Dedup.dupClusters(pairs.toDF("ida", "idb"), maxIter)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("a chain collapses to one cluster labeled by its minimum") {
    // 7-3, 3-9, 9-5: one component, min id 3
    assert(clusters(Seq((7L, 3L), (3L, 9L), (9L, 5L))) ==
      Map(3L -> 3L, 5L -> 3L, 7L -> 3L, 9L -> 3L))
  }

  test("separate components keep separate representatives") {
    assert(clusters(Seq((1L, 2L), (10L, 11L), (11L, 12L))) ==
      Map(1L -> 1L, 2L -> 1L, 10L -> 10L, 11L -> 10L, 12L -> 10L))
  }

  test("a long path needs diameter rounds and converges") {
    val path = (1L to 6L).sliding(2).map(s => (s(1), s(0))).toSeq // 2-1,3-2,...,6-5
    assert(clusters(path) == (1L to 6L).map(_ -> 1L).toMap)
  }

  test("non-convergence within maxIter throws, never mislabels") {
    val path = (1L to 6L).sliding(2).map(s => (s(1), s(0))).toSeq
    val e = intercept[IllegalArgumentException] { clusters(path, maxIter = 2) }
    assert(e.getMessage.contains("did not converge"))
  }

  test("docs without a pair are not emitted") {
    assert(!clusters(Seq((1L, 2L))).contains(3L))
  }
}
