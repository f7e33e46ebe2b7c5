package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.pipeline.Ann

/** Product quantization (the IVFPQ compression layer): per-subspace
  * exact-integer codebooks, bit-stable encode, and the ADC identity — with
  * every vector its own codeword the ADC ranking IS the exact quantized-L2
  * ranking, so approximation error comes only from codebook coarseness.
  */
class PqSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val dim = 8

  // deterministic corpus: 80 vectors, dim 8
  private lazy val emb = {
    val rows = (0L until 80L).map { id =>
      (id, Array.tabulate(dim)(d =>
        (((id * 6151 + d * 13007) % 4000) / 1000.0f) - 2.0f))
    }
    rows.toDF("vec_id", "embedding")
  }

  private def qvec(id: Long): Array[Float] =
    emb.filter(col("vec_id") === id).select("embedding")
      .collect()(0).getSeq[Float](0).toArray

  test("ADC with every-vector codebooks == exact quantized-L2 ranking") {
    val books = Ann.pqTrain(emb, "vec_id", "embedding", dim, m = 2, every = 1, iters = 0)
    val q = qvec(0)
    val got = Ann.pqTopK(emb, "vec_id", "embedding", q, 10, dim, books,
        excludeId = Some(0L))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toList
    // exact quantized L2 computed driver-side
    val qz = Ann.quantized(emb, "vec_id", "embedding", 1000)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val qq = q.map(v => math.floor(v.toDouble * 1000))
    val want = qz.toSeq.filter(_._1 != 0L).map { case (id, v) =>
      var d2 = 0d; var i = 0
      while (i < dim) { val d = v(i) - qq(i); d2 += d * d; i += 1 }
      (d2, id)
    }.sorted.take(10).zipWithIndex.map { case ((_, id), r) => (id, r + 1) }.toList
    assert(got == want)
  }

  test("encode is bit-stable under repartitioning; codes index the codebooks") {
    val books = Ann.pqTrain(emb, "vec_id", "embedding", dim, m = 2, every = 10, iters = 1)
    val a = Ann.pqEncode(emb, "vec_id", "embedding", dim, books)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toList).toMap
    val b = Ann.pqEncode(emb.repartition(7, col("vec_id")), "vec_id", "embedding", dim, books)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toList).toMap
    assert(a == b)
    val valid = books.map(_.map(_._1).toSet)
    assert(a.values.forall(cs => cs.zipWithIndex.forall { case (c, m) => valid(m)(c) }))
  }

  test("Lloyd refinement per subspace lowers or holds the codebook objective") {
    def objective(iters: Int): Double = {
      val books = Ann.pqTrain(emb, "vec_id", "embedding", dim, m = 2, every = 10, iters = iters)
      val qz = Ann.quantized(emb, "vec_id", "embedding", 1000)
        .collect().map(_.getSeq[Float](1).toArray)
      qz.map { v =>
        books.zipWithIndex.map { case (book, s) =>
          book.map { case (_, c) =>
            var d2 = 0d; var i = 0
            while (i < c.length) { val d = v(s * c.length + i).toDouble - c(i); d2 += d * d; i += 1 }
            d2
          }.min
        }.sum
      }.sum
    }
    val objs = (0 to 2).map(objective)
    assert(objs.sliding(2).forall(p => p(1) <= p(0)), objs.toString)
  }

  test("two-stage IVF+PQ with full probe and full rerank == brute-force cosine") {
    val q = qvec(0)
    val brute = Ann.cosineTopK(emb, "vec_id", "embedding", q, 10, excludeId = Some(0L))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toList
    val cells = Ann.kmeansCentroids(emb, "vec_id", "embedding", every = 10, iters = 1).length
    val got = Ann.ivfpqTopK(emb, "vec_id", "embedding", q, 10, dim,
        every = 10, iters = 1, m = 2, nprobe = cells, rerank = 80,
        excludeId = Some(0L))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toList
    assert(got == brute)
  }

  test("two-stage IVF+PQ: pruning narrows candidates but keeps rank order sane") {
    val q = qvec(3)
    val got = Ann.ivfpqTopK(emb, "vec_id", "embedding", q, 5, dim,
        every = 10, iters = 1, m = 2, nprobe = 2, rerank = 20,
        excludeId = Some(3L))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toList
    assert(got.nonEmpty && got.map(_._2) == (1 to got.size).toList)
  }

  test("encode plan has zero Exchange (M fused argmins in one projection)") {
    val books = Ann.pqTrain(emb, "vec_id", "embedding", dim, m = 2, every = 10, iters = 0)
    val plan = Ann.pqEncode(emb, "vec_id", "embedding", dim, books)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }
}
