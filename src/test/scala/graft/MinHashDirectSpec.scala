package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.pipeline.Dedup

/** The one-narrow-pass MinHash signature (MinHashSig expression) must be
  * VALUE-identical to the exploded-shingles -> distinct -> groupBy
  * formulation, and nearDupPairs must return the same pairs through the
  * candidate-restricted shingle path. */
class MinHashDirectSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private lazy val docs = {
    import spark.implicits._
    // overlapping shingle structure + exact dup + short-doc edge (< k tokens)
    (0 until 300).map { id =>
      val words = (0 until 4 + id % 9).map(j => s"w${(id / 3 + j) % 40}")
      (id.toLong, words.mkString(" "))
    }.toDF("doc_id", "text")
      .union(Seq((900L, "w1 w2"), (901L, "")).toDF("doc_id", "text"))
  }

  test("direct signature rows equal the exploded-shingle signature exactly") {
    val classic = Dedup.minhashSignature(
        Dedup.shingles(docs, "doc_id", "text", 3), 16)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val direct = Dedup.minhashSignatureDirect(docs, "doc_id", "text", 3, 16)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(direct == classic)
    assert(classic.nonEmpty)
    // short docs (< k tokens) are absent from BOTH
    assert(!classic.exists(t => t._1 == 900L || t._1 == 901L))
  }

  test("direct SimHash fingerprints equal the exploded-tf formulation exactly") {
    val classic = Dedup.simhash48(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val direct = Dedup.simhash48Direct(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(direct == classic) // incl. dropping token-less docs (doc 901)
    assert(classic.nonEmpty && !classic.contains(901L))
  }

  test("nearDupPairs through the direct path equals the all-shingles formulation") {
    val sh = Dedup.shingles(docs, "doc_id", "text", 3)
    val classicPairs = Dedup.jaccardVerify(sh,
        Dedup.lshCandidates(Dedup.minhashSignature(sh, 16), 4), 1, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val directPairs = Dedup.nearDupPairs(docs, "doc_id", "text", 3, 16, 4, 1, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(directPairs == classicPairs)
    assert(directPairs.nonEmpty, "fixture should produce near-dup pairs")
  }
}
