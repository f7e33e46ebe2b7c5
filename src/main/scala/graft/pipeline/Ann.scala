package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor operators over an embedding column
  * (ARRAY<FLOAT>), pure Catalyst expressions (codegen'd higher-order
  * functions — no UDFs):
  *
  *  - brute-force cosine top-k: the correctness baseline; one pass, one
  *    TakeOrderedAndProject. Dot/norm folds use `aggregate` (sequential
  *    left fold) so the double result is order-deterministic and
  *    reproducible by an external SQL oracle's list_reduce.
  *  - hyperplane LSH bucketing: the scale path — buckets partition the
  *    corpus so candidate search touches one bucket (plus neighbors if
  *    desired). Hyperplane components are md5-derived rationals
  *    ((H mod 2001 - 1000)/1000), so no RNG state and no libm calls are
  *    needed on either side.
  *
  * At 100 TB: brute force is a full scan per query — LSH bucketing (or an
  * IVF coarse quantizer built the same way) turns it into a pruned scan on a
  * bucket-partitioned table.
  */
object Ann {

  /** Sequential-fold dot product of the embedding column with a literal
    * query vector, in double precision.
    */
  def dotCol(embCol: String, q: Array[Float]): Column = {
    val qArr = array(q.toIndexedSeq.map(v => lit(v)): _*)
    aggregate(
      zip_with(col(embCol), qArr, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0d), (acc, x) => acc + x)
  }

  def normCol(c: Column): Column =
    sqrt(aggregate(c, lit(0.0d), (acc, x) => acc + x.cast("double") * x.cast("double")))

  /** Brute-force cosine top-k: (vec_id, rank). */
  def cosineTopK(emb: DataFrame, idCol: String, embCol: String,
                 q: Array[Float], k: Int, excludeId: Option[Long] = None): DataFrame = {
    val qNorm = {
      var s = 0.0d
      q.foreach(v => s += v.toDouble * v.toDouble)
      math.sqrt(s)
    }
    val scored = emb
      .filter(excludeId.map(col(idCol) =!= _).getOrElse(lit(true)))
      // one fused codegen pass (identical math to
      // dotCol(...) / (normCol(...) * qNorm) — see CosineToQuery)
      .withColumn("cos",
        graft.functions.VectorExpressions.cosineToQuery(col(embCol), q, qNorm))
    // parallel TakeOrderedAndProject top-k; the <=k winners rank driver-side
    graft.Ranks.rankTopK(scored, k, Seq(col("cos").desc, col(idCol).asc))
      .select(col(idCol), col("rank"))
  }

  /** Deterministic hyperplane component for (dim i, plane j):
    * ((first-8-hex of md5("i_j") as int) mod 2001 - 1000) / 1000.0.
    */
  def planeComponent(i: Int, j: Int): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"${i}_$j".getBytes("UTF-8")).take(4)
      .map(b => f"${b & 0xff}%02x").mkString
    ((java.lang.Long.parseLong(hex, 16) % 2001) - 1000) / 1000.0
  }

  def planes(dim: Int, nBits: Int): Array[Array[Double]] =
    Array.tabulate(nBits)(j => Array.tabulate(dim)(i => planeComponent(i, j)))

  /** Sequential-fold squared L2 distance between two array columns. */
  def l2sqCol(a: Column, b: Column): Column =
    graft.functions.VectorExpressions.l2sq(a, b)

  /** HOF twin of [[l2sqCol]] kept as the cross-check baseline (see
    * VectorExpressionsSpec: the codegen'd expressions must be bit-identical
    * to these folds). */
  def l2sqColHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => (x.cast("double") - y.cast("double")) * (x.cast("double") - y.cast("double"))),
      lit(0.0d), (acc, x) => acc + x)

  /** IVF coarse quantizer with deterministic centroids: every `every`-th
    * vector (id % every == 0) is a centroid. No RNG/k-means state — the
    * assignment is replicable by a SQL oracle and stable across reruns.
    */
  def ivfCentroids(emb: DataFrame, idCol: String, embCol: String, every: Int): DataFrame =
    emb.filter(col(idCol) % every === 0)
      .select(col(idCol).as("cid"), col(embCol).as("ce"))

  /** Cell assignment: nearest centroid by (squared L2 asc, cid asc), ONE
    * narrow fused-codegen pass — the centroid matrix rides into every task
    * as a reference object (the broadcast), so the plan has ZERO Exchange:
    * no per-centroid row blowup, no corpus-wide argmin aggregate. This is
    * the bucketing that makes a 100 TB scan pruned: persist/partition by
    * `cid` and a query touches only its probed cells.
    */
  def ivfAssign(emb: DataFrame, idCol: String, embCol: String, every: Int): DataFrame = {
    val cents = ivfCentroids(emb, idCol, embCol, every)
      .select(col("cid").cast("long"), col("ce").cast("array<float>"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      .sortBy(_._1) // cid asc: strict-< scan keeps the smallest cid on d2 ties
    if (cents.isEmpty) // no centroids -> empty assignment (join-formulation parity)
      emb.select(col(idCol), lit(0L).as("cid")).filter(lit(false))
    else
      emb.select(col(idCol),
        graft.functions.VectorExpressions
          .argMinCentroid(col(embCol), cents.map(_._1), cents.map(_._2)).as("cid"))
  }

  /** The pre-fusion formulation (crossJoin × broadcast × min(struct)) kept
    * as the spec parity baseline for [[ivfAssign]] — same (d2, cid)
    * lexicographic argmin, expressed relationally.
    */
  def ivfAssignJoin(emb: DataFrame, idCol: String, embCol: String, every: Int): DataFrame =
    emb.crossJoin(broadcast(ivfCentroids(emb, idCol, embCol, every)))
      .withColumn("d2", l2sqCol(col(embCol), col("ce")))
      .groupBy(col(idCol))
      .agg(min(struct(col("d2"), col("cid"))).as("m"))
      .select(col(idCol), col("m.cid").as("cid"))

  /** Pruned top-k: probe the `nprobe` cells nearest to the query, brute-force
    * cosine only inside them. Scan cost ~ nprobe/numCells of the corpus
    * instead of all of it (the IVF scale path; brute cosineTopK remains the
    * correctness baseline). Pass a pre-computed `assignment` (the persisted
    * bucket layout at production scale — cell assignment is a BUILD-time
    * pass, like segment construction) to amortize it across queries.
    */
  def ivfTopK(emb: DataFrame, idCol: String, embCol: String, q: Array[Float],
              k: Int, every: Int, nprobe: Int, excludeId: Option[Long] = None,
              assignment: Option[DataFrame] = None): DataFrame = {
    import emb.sparkSession.implicits._
    val qArr = array(q.toIndexedSeq.map(v => lit(v)): _*)
    val probed: Array[Long] = ivfCentroids(emb, idCol, embCol, every)
      .withColumn("d2", l2sqCol(col("ce"), qArr))
      .orderBy(col("d2").asc, col("cid").asc)
      .limit(nprobe)
      .select(col("cid").cast("long")).as[Long].collect()
    val assigned = assignment.getOrElse(ivfAssign(emb, idCol, embCol, every))
    val cand = emb.join(
      assigned.filter(col("cid").isInCollection(probed)),
      Seq(idCol), "left_semi")
    cosineTopK(cand, idCol, embCol, q, k, excludeId)
  }

  /** PERSIST the IVF layout: vectors written as parquet PARTITIONED BY
    * cell id, plus a `_centroids` side table — the build-time pass that
    * makes 100 TB ANN serving a pruned scan: a probe reads only its
    * nprobe cells' directories (Spark partition pruning; see
    * [[ivfTopKIndexed]] and the PartitionFilters assertion in AnnIvfSpec).
    */
  def writeIvfIndex(emb: DataFrame, idCol: String, embCol: String,
                    every: Int, path: String): Unit = {
    val assigned = ivfAssign(emb, idCol, embCol, every)
    emb.join(assigned, Seq(idCol))
      .select(col(idCol), col(embCol).cast("array<float>").as(embCol), col("cid"))
      .write.mode("overwrite").partitionBy("cid").parquet(s"$path/vectors")
    ivfCentroids(emb, idCol, embCol, every)
      .select(col("cid"), col("ce").cast("array<float>").as("ce"))
      .write.mode("overwrite").parquet(s"$path/centroids")
  }

  /** Pruned top-k over a PERSISTED layout: centroid probe (tiny side
    * table) -> cid-filtered scan of the partitioned vectors (only the
    * probed cells' files are listed/read) -> fused cosine top-k. Results
    * are identical to [[ivfTopK]] over the same (corpus, every, nprobe).
    */
  def ivfTopKIndexed(spark: org.apache.spark.sql.SparkSession, path: String,
                     idCol: String, embCol: String, q: Array[Float],
                     k: Int, nprobe: Int, excludeId: Option[Long] = None): DataFrame = {
    import spark.implicits._
    val qArr = array(q.toIndexedSeq.map(v => lit(v)): _*)
    val probed: Array[Long] = spark.read.parquet(s"$path/centroids")
      .withColumn("d2", l2sqCol(col("ce"), qArr))
      .orderBy(col("d2").asc, col("cid").asc)
      .limit(nprobe)
      .select(col("cid").cast("long")).as[Long].collect()
    val cand = spark.read.parquet(s"$path/vectors")
      .filter(col("cid").isInCollection(probed)) // partition-pruned
    cosineTopK(cand, idCol, embCol, q, k, excludeId)
  }

  /** Quantized view for exact-arithmetic k-means: component floor(v * scale)
    * as an integer-valued FLOAT (float*scale is exact in double, floor is
    * exact, and the integer magnitudes stay far below 2^24 so the float
    * carries them losslessly). Integer sums commute EXACTLY, so the trained
    * centroids are bit-identical under any partitioning/row order — and an
    * external SQL oracle reproduces them. */
  def quantized(emb: DataFrame, idCol: String, embCol: String, scale: Int): DataFrame =
    emb.select(col(idCol),
      expr(s"transform($embCol, x -> CAST(floor(CAST(x AS DOUBLE) * $scale) AS FLOAT))").as("qe"))

  /** Deterministic Lloyd k-means over the quantized view: seeds = every
    * `every`-th vector (the ivfCentroids rule), each iteration assigns with
    * the fused ArgMinCentroid pass (zero Exchange) and re-centers cells at
    * floor(sum / count) per dimension — INTEGER arithmetic throughout, so
    * training is reproducible to the bit on any cluster. Cells that lose
    * all members drop (classic Lloyd). Returns (cid, centroid) sorted by
    * cid; cid keeps the seed's id label.
    *
    * Scale shape per iteration: one narrow assignment pass over the corpus
    * plus ONE (cid, dim)-keyed aggregation whose map-side combine reduces
    * every partition to at most numCells x dim rows before the exchange —
    * no corpus-sized shuffle, no driver-side data beyond numCells x dim.
    */
  def kmeansCentroids(emb: DataFrame, idCol: String, embCol: String,
                      every: Int, iters: Int, scale: Int = 1000): Array[(Long, Array[Float])] = {
    val q = quantized(emb, idCol, embCol, scale)
    var cents = q.filter(col(idCol) % every === 0)
      .select(col(idCol).cast("long").as("cid"), col("qe"))
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      .sortBy(_._1)
    var it = 0
    while (it < iters && cents.nonEmpty) {
      val assigned = q.select(
        graft.functions.VectorExpressions
          .argMinCentroid(col("qe"), cents.map(_._1), cents.map(_._2)).as("cid"),
        col("qe"))
      val sums = assigned
        .select(col("cid"), posexplode(col("qe")).as(Seq("i", "qv")))
        .groupBy(col("cid"), col("i"))
        .agg(sum(col("qv").cast("long")).as("s"), count(lit(1)).as("n"))
        .collect()
      cents = sums.groupBy(_.getLong(0)).toArray.map { case (cid, rows) =>
        val arr = new Array[Float](rows.map(_.getInt(1)).max + 1)
        rows.foreach { r =>
          arr(r.getInt(1)) = math.floor(r.getLong(2).toDouble / r.getLong(3)).toFloat
        }
        (cid, arr)
      }.sortBy(_._1)
      it += 1
    }
    cents
  }

  /** Cell assignment under TRAINED centroids ([[kmeansCentroids]]) — same
    * zero-Exchange fused argmin as [[ivfAssign]], same (d2 asc, cid asc)
    * tie rule, over the quantized view the training used. */
  def kmeansAssign(emb: DataFrame, idCol: String, embCol: String,
                   every: Int, iters: Int, scale: Int = 1000): DataFrame =
    assignWith(emb, idCol, embCol,
      kmeansCentroids(emb, idCol, embCol, every, iters, scale), scale)

  /** Assignment under an EXPLICIT centroid set — the helper every trained
    * query path shares, so probe centroids and membership labels can never
    * come from two different trainings. */
  private def assignWith(emb: DataFrame, idCol: String, embCol: String,
                         cents: Array[(Long, Array[Float])], scale: Int): DataFrame = {
    val q = quantized(emb, idCol, embCol, scale)
    if (cents.isEmpty)
      q.select(col(idCol), lit(0L).as("cid")).filter(lit(false))
    else
      q.select(col(idCol),
        graft.functions.VectorExpressions
          .argMinCentroid(col("qe"), cents.map(_._1), cents.map(_._2)).as("cid"))
  }

  /** IVF top-k under TRAINED centroids: the probe ranks centroids against
    * the quantized query DRIVER-SIDE (centroids are already in memory — no
    * Spark job), the probed cells' members come from [[kmeansAssign]], and
    * final scoring is exact cosine over the ORIGINAL float embeddings. */
  def kmeansIvfTopK(emb: DataFrame, idCol: String, embCol: String, qv: Array[Float],
                    k: Int, every: Int, iters: Int, nprobe: Int,
                    excludeId: Option[Long] = None, scale: Int = 1000,
                    assignment: Option[DataFrame] = None,
                    centroids: Option[Array[(Long, Array[Float])]] = None): DataFrame = {
    val cents = centroids.getOrElse(
      kmeansCentroids(emb, idCol, embCol, every, iters, scale))
    val qq = qv.map(v => math.floor(v.toDouble * scale))
    val probed = cents.map { case (cid, ce) =>
      var d2 = 0d; var i = 0
      while (i < ce.length) { val d = ce(i) - qq(i); d2 += d * d; i += 1 }
      (d2, cid)
    }.sorted.take(nprobe).map(_._2)
    val assigned = assignment.getOrElse(assignWith(emb, idCol, embCol, cents, scale))
    val cand = emb.join(
      assigned.filter(col("cid").isInCollection(probed.toSeq)),
      Seq(idCol), "left_semi")
    cosineTopK(cand, idCol, embCol, qv, k, excludeId)
  }

  // ---- product quantization (the FAISS-style IVFPQ compression layer) ----
  // At 100 TB raw float vectors do not fit the serving tier: PQ splits each
  // vector into M subvectors, trains a small codebook per subspace with the
  // SAME exact-integer Lloyd machinery (bit-stable under any partitioning),
  // and stores only M small codes per vector. Queries score with the ADC
  // (asymmetric distance computation) rule: a per-subspace lookup table of
  // exact query-to-codeword distances, summed by code — one narrow pass
  // over the codes table, no float vectors touched at query time.

  /** Per-subspace codebooks: subspace m covers dims [m*dim/M, (m+1)*dim/M);
    * seeds = every `every`-th vector's subvector (labels keep the seed id),
    * refined by `iters` exact-integer Lloyd updates. */
  def pqTrain(emb: DataFrame, idCol: String, embCol: String, dim: Int, m: Int,
              every: Int, iters: Int, scale: Int = 1000): Array[Array[(Long, Array[Float])]] = {
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val sub = dim / m
    Array.tabulate(m) { s =>
      val sliced = emb.select(col(idCol),
        expr(s"slice($embCol, ${s * sub + 1}, $sub)").as("sv"))
      kmeansCentroids(sliced, idCol, "sv", every, iters, scale)
    }
  }

  /** PQ codes: (id, codes ARRAY<BIGINT>) — codes(m) = the cid of subspace
    * m's nearest codeword under the quantized view (the argMinCentroid
    * (d2 asc, cid asc) rule), M fused passes folded into one projection. */
  def pqEncode(emb: DataFrame, idCol: String, embCol: String, dim: Int,
               codebooks: Array[Array[(Long, Array[Float])]],
               scale: Int = 1000): DataFrame = {
    val m = codebooks.length
    require(m > 0 && dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val sub = dim / m
    require(codebooks.forall(b => b.isEmpty || b.head._2.length == sub),
      s"codebook subvector width != $sub — codebooks trained at a different dim/m")
    val q = emb.select(col(idCol) +: Array.tabulate(m) { s =>
      expr(s"transform(slice($embCol, ${s * sub + 1}, $sub), " +
          s"x -> CAST(floor(CAST(x AS DOUBLE) * $scale) AS FLOAT))").as(s"qs$s")
    }: _*)
    q.select(col(idCol), array(Array.tabulate(m) { s =>
      graft.functions.VectorExpressions
        .argMinCentroid(col(s"qs$s"), codebooks(s).map(_._1), codebooks(s).map(_._2))
    }: _*).as("codes"))
  }

  /** ADC top-k over PQ codes: the query quantizes driver-side, the per-
    * subspace distance tables are exact integer-valued doubles keyed by
    * codeword cid, and every vector's approximate d2 is M map lookups + a
    * sum — ranked (approx d2 asc, id asc). `codes` = a pre-encoded table
    * (the persisted layout at scale); pass None to encode inline. */
  def pqTopK(emb: DataFrame, idCol: String, embCol: String, qv: Array[Float],
             k: Int, dim: Int, codebooks: Array[Array[(Long, Array[Float])]],
             excludeId: Option[Long] = None, scale: Int = 1000,
             codes: Option[DataFrame] = None): DataFrame = {
    val m = codebooks.length
    require(m > 0 && dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val sub = dim / m
    require(codebooks.forall(b => b.isEmpty || b.head._2.length == sub),
      s"codebook subvector width != $sub — codebooks trained at a different dim/m")
    val qq = qv.map(v => math.floor(v.toDouble * scale))
    val lookup: Array[Map[Long, Double]] = Array.tabulate(m) { s =>
      codebooks(s).map { case (cid, ce) =>
        var d2 = 0d; var i = 0
        while (i < sub) { val d = qq(s * sub + i) - ce(i); d2 += d * d; i += 1 }
        cid -> d2
      }.toMap
    }
    val encoded = codes.getOrElse(pqEncode(emb, idCol, embCol, dim, codebooks, scale))
    val approx = Array.tabulate(m) { s =>
      val entries = lookup(s).toSeq.sortBy(_._1)
        .flatMap { case (cid, d) => Seq(lit(cid), lit(d)) }
      element_at(map(entries: _*), col("codes")(s))
    }.reduce(_ + _)
    val scored = encoded
      .filter(excludeId.map(col(idCol) =!= _).getOrElse(lit(true)))
      .withColumn("ad2", approx)
    graft.Ranks.rankTopK(scored, k, Seq(col("ad2").asc, col(idCol).asc))
      .select(col(idCol), col("rank"))
  }

  /** Two-stage IVF+PQ top-k — the production serving shape: probe the
    * `nprobe` trained cells nearest the query (driver-side over in-memory
    * centroids), ADC-score ONLY those cells' codes (M map lookups per
    * member), keep the best `rerank` candidates by approximate distance,
    * then re-rank exactly with the original float vectors (cosine) — the
    * refine step that buys back PQ's quantization error on a candidate
    * list thousands of times smaller than the corpus. With nprobe covering
    * every cell and rerank >= corpus the result IS brute-force cosineTopK
    * (spec-pinned identity).
    */
  def ivfpqTopK(emb: DataFrame, idCol: String, embCol: String, qv: Array[Float],
                k: Int, dim: Int, every: Int, iters: Int, m: Int,
                nprobe: Int, rerank: Int, excludeId: Option[Long] = None,
                scale: Int = 1000,
                centroids: Option[Array[(Long, Array[Float])]] = None,
                codebooks: Option[Array[Array[(Long, Array[Float])]]] = None,
                assignment: Option[DataFrame] = None,
                codes: Option[DataFrame] = None): DataFrame = {
    val cents = centroids.getOrElse(kmeansCentroids(emb, idCol, embCol, every, iters, scale))
    val books = codebooks.getOrElse(pqTrain(emb, idCol, embCol, dim, m, every, iters, scale))
    val qq = qv.map(v => math.floor(v.toDouble * scale))
    val probed = cents.map { case (cid, ce) =>
      var d2 = 0d; var i = 0
      while (i < ce.length) { val d = ce(i) - qq(i); d2 += d * d; i += 1 }
      (d2, cid)
    }.sorted.take(nprobe).map(_._2)
    val assigned = assignment.getOrElse(assignWith(emb, idCol, embCol, cents, scale))
    val encoded = codes.getOrElse(pqEncode(emb, idCol, embCol, dim, books, scale))
    val cells = assigned.filter(col("cid").isInCollection(probed.toSeq)).select(idCol)
    val candCodes = encoded.join(cells, Seq(idCol), "left_semi")
    val shortlist = pqTopK(emb, idCol, embCol, qv, rerank, dim, books,
        excludeId, scale, codes = Some(candCodes))
      .select(idCol)
    cosineTopK(emb.join(shortlist, Seq(idCol), "left_semi"),
      idCol, embCol, qv, k, excludeId)
  }

  /** Embedding-cosine near-duplicate pairs: candidates from shared
    * hyperplane-LSH buckets, verified by exact cosine — the embedding analog
    * of Dedup.nearDupPairs. `maxBucket` caps bucket sizes (a dominant-
    * direction bucket beyond the cap is dropped rather than joined
    * quadratically). Returns (ida < idb) with cosine >= minCos.
    */
  def embedDupPairs(emb: DataFrame, idCol: String, embCol: String,
                    nBits: Int, dim: Int, minCos: Double,
                    maxBucket: Int = 10000): DataFrame = {
    // bucket computed inline on the same row — no join back to the source
    val withBucket0 = emb.select(col(idCol).as("id"), col(embCol).as("e"),
      bucketCol(embCol, nBits, dim).as("bucket"))
    val withBucket =
      if (maxBucket == Int.MaxValue) withBucket0
      else Dedup.dropOverCap(withBucket0, Seq("bucket"), maxBucket, "embedDupPairs")
    val a = withBucket.as("a")
    val b = withBucket.as("b")
    a.join(b, col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id"))
      // one fused pass for dot + both norms (identical association to
      // dot / (norm(a) * norm(b)) — see CosinePair)
      .withColumn("cos",
        graft.functions.VectorExpressions.cosinePair(col("a.e"), col("b.e")))
      .filter(col("cos") >= minCos)
      .select(col("a.id").as("ida"), col("b.id").as("idb"))
  }

  /** Hyperplane-LSH bucket expression: bit j = 1 iff dot(v, plane_j) > 0;
    * bucket = sum bit_j * 2^j. */
  def bucketCol(embCol: String, nBits: Int, dim: Int): Column =
    // all nBits plane dots in one codegen'd loop (LshBucket) — same per-plane
    // left-fold order and > 0 bit rule as the former per-plane HOF folds
    graft.functions.VectorExpressions.lshBucket(col(embCol), planes(dim, nBits))

  /** LSH bucket id per vector (the persisted bucket-layout column). */
  def lshBuckets(emb: DataFrame, idCol: String, embCol: String, nBits: Int, dim: Int): DataFrame =
    emb.select(col(idCol), bucketCol(embCol, nBits, dim).as("bucket"))
}
