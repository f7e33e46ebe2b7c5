package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.pipeline.Ann

/** IVF pruned ANN: deterministic cells, pruned probe, and the metamorphic
  * guarantee that probing ALL cells reproduces the brute-force top-k exactly.
  */
class AnnIvfSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private lazy val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
  private lazy val qv = emb.filter(col("vec_id") === 1).select("embedding")
    .collect()(0).getAs[scala.collection.Seq[Float]](0).toArray

  test("every vector lands in exactly one cell; cells are centroids") {
    val n = emb.count()
    val assign = Ann.ivfAssign(emb, "vec_id", "embedding", every = 10)
    assert(assign.count() == n)
    val cells = assign.select("cid").distinct().collect().map(_.getLong(0)).toSet
    val cents = Ann.ivfCentroids(emb, "vec_id", "embedding", 10)
      .select("cid").collect().map(_.getLong(0)).toSet
    assert(cells.subsetOf(cents))
    // a centroid is assigned to itself (d2 = 0 minimal, tie-break on cid holds)
    val self = assign.filter(col("vec_id") % 10 === 0)
      .filter(col("vec_id") =!= col("cid")).count()
    assert(self == 0)
  }

  test("fused argmin assignment == crossJoin/min(struct) formulation, zero Exchange") {
    val fused = Ann.ivfAssign(emb, "vec_id", "embedding", every = 10)
    val joined = Ann.ivfAssignJoin(emb, "vec_id", "embedding", every = 10)
    val a = fused.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toList
    val b = joined.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toList
    assert(a == b)
    // the fused plan is one narrow pass: no Exchange anywhere
    val plan = fused.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("probing all cells reproduces brute-force top-k exactly") {
    val cellCount = Ann.ivfCentroids(emb, "vec_id", "embedding", 10).count().toInt
    val brute = Ann.cosineTopK(emb, "vec_id", "embedding", qv, 10, Some(1L))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toList
    val full = Ann.ivfTopK(emb, "vec_id", "embedding", qv, 10, every = 10,
      nprobe = cellCount, excludeId = Some(1L))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toList
    assert(full == brute)
  }

  test("pruned probe returns k results from probed cells only") {
    val pruned = Ann.ivfTopK(emb, "vec_id", "embedding", qv, 10, every = 10,
      nprobe = 2, excludeId = Some(1L)).collect()
    assert(pruned.length == 10)
    // results are a subset of the union of 2 cells' members
    val assign = Ann.ivfAssign(emb, "vec_id", "embedding", 10)
    val cellsOfResults = assign
      .filter(col("vec_id").isInCollection(pruned.map(_.getLong(0)).toSeq))
      .select("cid").distinct().count()
    assert(cellsOfResults <= 2)
  }

  test("persisted IVF layout: indexed probe == in-memory probe, scan is partition-pruned") {
    val path = java.nio.file.Files.createTempDirectory("graftivf").toString
    Ann.writeIvfIndex(emb, "vec_id", "embedding", every = 10, path)
    val fromIndex = Ann.ivfTopKIndexed(spark, path, "vec_id", "embedding", qv,
      10, nprobe = 2, excludeId = Some(1L))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toList
    val inMemory = Ann.ivfTopK(emb, "vec_id", "embedding", qv, 10, every = 10,
      nprobe = 2, excludeId = Some(1L))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toList
    assert(fromIndex == inMemory)
    // the probed scan lists only the probed cells' partitions
    val plan = spark.read.parquet(s"$path/vectors")
      .filter(col("cid").isInCollection(Seq(0L, 10L)))
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cid"), plan)
  }

  test("media embeddings feed the real ANN cosine top-k (brute == hand-computed)") {
    import spark.implicits._
    import graft.pipeline.{Ann, Multimodal}
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"))
    // real decoded-pixel-stat embeddings over real encoded image fixtures
    val media = Multimodal.imageFixtures(docs, "doc_id", checker = true)
    val emb = Multimodal.embed(spark, media, dim = 5)
    val qv = Multimodal.embedImage(Multimodal.syntheticImage(424242L, checker = true), 5)
    val got = Ann.cosineTopK(emb, "id", "embedding", qv, 5)
      .orderBy("rank").as[(Long, Int)].collect().toList
    // hand-computed expectation over the same decode path, driver-side
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      (0 until 5).foreach { i =>
        d += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i)
      }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val want = docs.as[Long].collect()
      .map { id =>
        (id, cos(Multimodal.embedImage(Multimodal.syntheticImage(id, checker = true), 5), qv))
      }
      .sortBy { case (id, c) => (-c, id) }.take(5).map(_._1).toList
    assert(got.map(_._1) == want)
  }
}
