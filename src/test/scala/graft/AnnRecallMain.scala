package graft.drive

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** ANN recall evaluation (manual drive): recall@10 of the IVF pruned path
  * (Ann.ivfTopK) against the brute-force cosine ground truth
  * (Ann.cosineTopK) over an nprobe sweep, on a clustered synthetic corpus
  * — the measured quality/speed tradeoff that picks nprobe at production
  * scale. The corpus is deterministic (group centroids + per-id ripple)
  * so runs are reproducible; the assignment is computed ONCE and reused,
  * as the persisted bucket layout would be.
  *
  * Run: sbt "Test/runMain graft.drive.AnnRecall 200000"
  */
object AnnRecall {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(200000L)
    val dim = 64
    val groups = 53 // prime vs every=500, so sampled centroids cover all groups
    val every = 500 // ~n/500 centroids
    val k = 10
    val nQueries = 20
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.pipeline.Ann

    // clustered corpus: group base direction + small per-id ripple
    val emb = spark.range(0, n, 1, 32).select(col("id").as("vec_id"),
      expr(s"""transform(sequence(0, ${dim - 1}), j ->
              |  cast(cos(0.13 * cast(id % $groups as double) * (j + 1))
              |       + 0.45 * sin(id * 13.7 + j) as float))""".stripMargin)
        .as("embedding")).persist()
    emb.count()

    // queries = midpoints of two corpus vectors from DIFFERENT groups: the
    // true top-k straddles (at least) two cells, so nprobe=1 must miss part
    // of it — the regime where the sweep actually measures something
    val anchorIds = (0 until nQueries).flatMap(i =>
      Seq(i.toLong * (n / nQueries), i.toLong * (n / nQueries) + 1))
    val anchors = emb.filter(col("vec_id").isInCollection(anchorIds))
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val qvecs: Map[Long, Array[Float]] = (0 until nQueries).map { i =>
      val a = anchors(i.toLong * (n / nQueries))
      val b = anchors(i.toLong * (n / nQueries) + 1)
      i.toLong -> a.zip(b).map { case (x, y) => (x + y) / 2 }
    }.toMap

    // ground truth: brute cosine top-10 per query
    val truth = qvecs.map { case (qid, qv) =>
      qid -> Ann.cosineTopK(emb, "vec_id", "embedding", qv, k, None)
        .collect().map(_.getLong(0)).toSet
    }

    // IVF layout once (the build-time pass)
    var t0 = System.nanoTime()
    val assigned = Ann.ivfAssign(emb, "vec_id", "embedding", every).persist()
    val nCells = assigned.select("cid").distinct().count()
    val assignWall = (System.nanoTime() - t0) / 1e9
    println(f"ANNRECALL n=$n dim=$dim cells=$nCells assign=$assignWall%.1f s")

    val sweep = Seq(1, 2, 4, 8, 16).map { nprobe =>
      t0 = System.nanoTime()
      val recalls = qvecs.map { case (qid, qv) =>
        val got = Ann.ivfTopK(emb, "vec_id", "embedding", qv, k, every, nprobe,
          None, assignment = Some(assigned))
          .collect().map(_.getLong(0)).toSet
        got.intersect(truth(qid)).size.toDouble / k
      }
      val wall = (System.nanoTime() - t0) / 1e9 / nQueries
      val recall = recalls.sum / recalls.size
      println(f"ANNRECALL nprobe=$nprobe recall@$k=$recall%.3f mean_query_wall=$wall%.2f s scanned~${nprobe.toDouble / nCells * 100}%.1f%% of cells")
      (nprobe, recall)
    }
    // recall must be monotone non-decreasing in nprobe and near-perfect at 16
    sweep.sliding(2).foreach { case Seq((_, a), (_, b)) =>
      assert(b >= a - 1e-9, s"recall regressed across nprobe: $sweep")
    }
    assert(sweep.last._2 >= 0.95, s"recall@16 too low: ${sweep.last._2}")
    assert(sweep.head._2 > 0.0, "nprobe=1 found nothing")

    // TRAINED quantizer: 2 Lloyd updates from the same seeds; the same
    // nprobe sweep over the trained layout — at equal scan budget, trained
    // cells should match or beat the sampled ones on this clustered corpus
    t0 = System.nanoTime()
    val cents = Ann.kmeansCentroids(emb, "vec_id", "embedding", every, iters = 2)
    val q2 = Ann.quantized(emb, "vec_id", "embedding", 1000)
    val trainedAssign = q2.select(col("vec_id"),
      graft.functions.VectorExpressions
        .argMinCentroid(col("qe"), cents.map(_._1), cents.map(_._2)).as("cid"))
      .persist()
    val nCellsT = trainedAssign.select("cid").distinct().count()
    val trainWall = (System.nanoTime() - t0) / 1e9
    println(f"ANNRECALL trained cells=$nCellsT train=$trainWall%.1f s (2 Lloyd updates)")
    val sweepT = Seq(1, 2, 4, 8, 16).map { nprobe =>
      t0 = System.nanoTime()
      val recalls = qvecs.map { case (qid, qv) =>
        val got = Ann.kmeansIvfTopK(emb, "vec_id", "embedding", qv, k, every,
          iters = 2, nprobe = nprobe, None,
          assignment = Some(trainedAssign), centroids = Some(cents))
          .collect().map(_.getLong(0)).toSet
        got.intersect(truth(qid)).size.toDouble / k
      }
      val wall = (System.nanoTime() - t0) / 1e9 / nQueries
      val recall = recalls.sum / recalls.size
      println(f"ANNRECALL trained nprobe=$nprobe recall@$k=$recall%.3f mean_query_wall=$wall%.2f s")
      (nprobe, recall)
    }
    sweepT.sliding(2).foreach { case Seq((_, a), (_, b)) =>
      assert(b >= a - 1e-9, s"trained recall regressed across nprobe: $sweepT")
    }
    assert(sweepT.last._2 >= 0.95, s"trained recall@16 too low: ${sweepT.last._2}")

    // two-stage IVF+PQ: ADC shortlist inside the probed trained cells, exact
    // cosine refine — the compressed serving path (M bytes of codes per
    // vector instead of 256 B of floats). The honest PQ question is the
    // REFINE BUDGET: at fixed nprobe, how small can the exact-rerank
    // shortlist be before recall drops below the IVF ceiling? (This corpus
    // is adversarial for PQ — the per-id ripple that defines true
    // neighborhoods is i.i.d. noise the subspace codebooks cannot encode,
    // so the ADC shortlist needs headroom; smoother corpora need less.)
    t0 = System.nanoTime()
    val books = Ann.pqTrain(emb, "vec_id", "embedding", dim, m = 8, every = every, iters = 2)
    val codes = Ann.pqEncode(emb, "vec_id", "embedding", dim, books).persist()
    codes.count()
    val pqWall = (System.nanoTime() - t0) / 1e9
    println(f"ANNRECALL pq train+encode=$pqWall%.1f s (8 subspaces, 2 Lloyd updates)")
    val np = 4
    val ceiling = sweepT.find(_._1 == np).get._2
    val sweepP = Seq(50, 200, 800, 3200).map { rr =>
      t0 = System.nanoTime()
      val recalls = qvecs.map { case (qid, qv) =>
        val got = Ann.ivfpqTopK(emb, "vec_id", "embedding", qv, k, dim,
          every = every, iters = 2, m = 8, nprobe = np, rerank = rr, None,
          centroids = Some(cents), codebooks = Some(books),
          assignment = Some(trainedAssign), codes = Some(codes))
          .collect().map(_.getLong(0)).toSet
        got.intersect(truth(qid)).size.toDouble / k
      }
      val wall = (System.nanoTime() - t0) / 1e9 / nQueries
      val recall = recalls.sum / recalls.size
      println(f"ANNRECALL ivfpq nprobe=$np rerank=$rr recall@$k=$recall%.3f mean_query_wall=$wall%.2f s (ivf ceiling $ceiling%.3f)")
      (rr, recall)
    }
    sweepP.sliding(2).foreach { case Seq((_, a), (_, b)) =>
      assert(b >= a - 1e-9, s"ivfpq recall regressed as rerank grew: $sweepP")
    }
    assert(sweepP.last._2 >= ceiling - 0.05,
      s"ivfpq with a full-cell rerank must approach the IVF ceiling: $sweepP vs $ceiling")
    println("ANNRECALL OK")
    spark.stop()
  }
}
