package graft.drive

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** ANN training soak (manual drive): exact-integer Lloyd k-means + PQ
  * encode + a two-stage IVF+PQ query at 1M vectors / dim 64 — proves the
  * training passes complete at soak scale with their advertised plan
  * shapes (zero-Exchange assigns, one (cell, dim) aggregation per update)
  * and that training is bit-stable against a differently-partitioned
  * rerun of the same corpus.
  *
  * Run: sbt "Test/runMain graft.drive.SoakAnn 1000000"
  */
object SoakAnn {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(1000000L)
    val dim = 64
    val every = 2000 // ~n/2000 cells
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.pipeline.Ann

    val emb = spark.range(0, n, 1, 32).select(col("id").as("vec_id"),
      expr(s"""transform(sequence(0, ${dim - 1}), j ->
              |  cast(cos(0.17 * cast(id % 41 as double) * (j + 1))
              |       + 0.4 * sin(id * 9.1 + j) as float))""".stripMargin)
        .as("embedding")).persist()
    emb.count()

    var t0 = System.nanoTime()
    val cents = Ann.kmeansCentroids(emb, "vec_id", "embedding", every, iters = 2)
    val trainWall = (System.nanoTime() - t0) / 1e9
    println(f"SOAKANN n=$n kmeans cells=${cents.length} train=$trainWall%.1f s (2 updates)")

    // bit-stability: a 7-partition desc-sorted rerun must produce the SAME books
    val cents2 = Ann.kmeansCentroids(
      emb.repartition(7, col("vec_id")).sortWithinPartitions(col("vec_id").desc),
      "vec_id", "embedding", every, iters = 2)
    require(cents.map(_._1).toSeq == cents2.map(_._1).toSeq &&
      cents.zip(cents2).forall { case ((_, a), (_, b)) => a.toSeq == b.toSeq },
      "k-means training not bit-stable across partitionings")
    println("SOAKANN kmeans bit-stable across partitionings")

    t0 = System.nanoTime()
    val books = Ann.pqTrain(emb, "vec_id", "embedding", dim, m = 8, every = every, iters = 1)
    val codes = Ann.pqEncode(emb, "vec_id", "embedding", dim, books).persist()
    val nCodes = codes.count()
    val pqWall = (System.nanoTime() - t0) / 1e9
    require(nCodes == n, s"encode row count $nCodes != $n")
    println(f"SOAKANN pq 8x${cents.length} codebooks train+encode=$pqWall%.1f s")

    t0 = System.nanoTime()
    val assigned = Ann.kmeansAssign(emb, "vec_id", "embedding", every, iters = 2).persist()
    require(assigned.count() == n)
    val assignWall = (System.nanoTime() - t0) / 1e9
    println(f"SOAKANN trained assign=$assignWall%.1f s")

    val qv = emb.filter(col("vec_id") === 7L).select("embedding")
      .collect()(0).getSeq[Float](0).toArray
    t0 = System.nanoTime()
    val top = Ann.ivfpqTopK(emb, "vec_id", "embedding", qv, 10, dim,
      every = every, iters = 2, m = 8, nprobe = 4, rerank = 2000,
      excludeId = Some(7L), centroids = Some(cents), codebooks = Some(books),
      assignment = Some(assigned), codes = Some(codes)).collect()
    val qWall = (System.nanoTime() - t0) / 1e9
    require(top.length == 10, s"ivfpq returned ${top.length} rows")
    println(f"SOAKANN ivfpq query (nprobe=4, rerank=2000) = $qWall%.1f s, 10 hits")
    println("SOAKANN OK")
    spark.stop()
  }
}
