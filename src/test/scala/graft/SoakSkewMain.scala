package graft.drive

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dedup/ANN skew soak (manual drive): N docs with ADVERSARIAL boilerplate —
  * a near-identical cluster far larger than the bucket cap — proving
  *  (a) nearDupPairs / simhashPairs / embedDupPairs complete at skew without
  *      a quadratic bucket explosion (wall-clock bounded),
  *  (b) the dropped-bucket accounting SURFACES the cap (no silent caps):
  *      PipelineMetrics reports the boilerplate bucket as dropped,
  *  (c) organic (under-cap) near-dup pairs are still found.
  *
  * Run: sbt "Test/runMain graft.drive.SoakSkew 10000000"
  */
object SoakSkew {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(10000000L)
    val boiler = math.max(50000L, n / 200) // boilerplate cluster size
    val cap = 1000 // bucket cap the cluster must blow through
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.pipeline.{Ann, Dedup, PipelineMetrics}

    // corpus: ids [0, boiler) share one boilerplate text (identical shingle
    // sets -> identical MinHash signature -> ONE band bucket of size
    // `boiler`); ids [boiler, boiler+10) are an organic near-dup family
    // (one trailing token differs); the rest are unique 8-token docs.
    val docs = spark.range(0, n, 1, 64).select(col("id"),
      when(col("id") < boiler,
        lit("terms of service apply to all pages on this site"))
        .when(col("id") < boiler + 10,
          concat(lit("the quick brown fox jumps over the lazy dog variant "),
            (col("id") % 3).cast("string")))
        .otherwise(concat(lit("unique doc "),
          col("id").cast("string"), lit(" alpha "), (col("id") * 7 % 1000003).cast("string"),
          lit(" beta "), (col("id") * 13 % 999983).cast("string"),
          lit(" gamma "), (col("id") * 31 % 1000033).cast("string")))
      .as("text"))
      .persist()
    println(s"SOAKSKEW corpus n=$n boiler=$boiler cap=$cap")

    // ---- MinHash-LSH near-dup pairs under skew
    var t0 = System.nanoTime()
    val pairs = Dedup.nearDupPairs(docs, "id", "text", k = 3, numHashes = 12,
      rowsPerBand = 3, tNum = 7, tDen = 10, maxBucket = cap).count()
    val tLsh = (System.nanoTime() - t0) / 1e9
    val dLsh = PipelineMetrics.lastDrops("lshCandidates")
    println(f"SOAKSKEW nearDupPairs pairs=$pairs wall=$tLsh%.1f s dropped=" +
      s"${dLsh.buckets} buckets/${dLsh.rows} rows")
    require(dLsh.buckets >= 1, "boilerplate bucket was NOT surfaced as dropped")
    require(dLsh.rows >= boiler, s"dropped rows ${dLsh.rows} < boiler $boiler")
    // organic family survives: 10 docs in 3 variant groups pair within group
    require(pairs >= 10, s"organic near-dup pairs missing: $pairs")

    // ---- SimHash pairs under the same skew
    t0 = System.nanoTime()
    val sPairs = Dedup.simhashPairs(docs, "id", "text", maxHamming = 2, maxBand = cap).count()
    val tSim = (System.nanoTime() - t0) / 1e9
    val dSim = PipelineMetrics.lastDrops("simhashPairs")
    println(f"SOAKSKEW simhashPairs pairs=$sPairs wall=$tSim%.1f s dropped=" +
      s"${dSim.buckets} buckets/${dSim.rows} rows")
    require(dSim.buckets >= 1, "simhash boilerplate band was NOT surfaced")

    // ---- embedding near-dup pairs: dominant-direction cluster blows the cap
    val emb = spark.range(0, n / 10, 1, 64).select(col("id"),
      when(col("id") < boiler / 10,
        array(lit(1f), lit(0f), lit(0f), lit(0f))) // one dominant direction
        .otherwise(array(
          (pmod(col("id") * 37, lit(1000)).cast("float") / 500f - 1f),
          (pmod(col("id") * 59, lit(1000)).cast("float") / 500f - 1f),
          (pmod(col("id") * 73, lit(1000)).cast("float") / 500f - 1f),
          (pmod(col("id") * 97, lit(1000)).cast("float") / 500f - 1f)))
      .as("embedding"))
    t0 = System.nanoTime()
    val ePairs = Ann.embedDupPairs(emb, "id", "embedding", nBits = 10, dim = 4,
      minCos = 0.999, maxBucket = cap).count()
    val tEmb = (System.nanoTime() - t0) / 1e9
    val dEmb = PipelineMetrics.lastDrops("embedDupPairs")
    println(f"SOAKSKEW embedDupPairs pairs=$ePairs wall=$tEmb%.1f s dropped=" +
      s"${dEmb.buckets} buckets/${dEmb.rows} rows")
    require(dEmb.buckets >= 1, "embedding boilerplate bucket was NOT surfaced")

    println(f"SOAKSKEW OK total=${tLsh + tSim + tEmb}%.1f s")
    spark.stop()
  }
}
