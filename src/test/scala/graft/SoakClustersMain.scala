package graft.drive

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Duplicate-clustering soak (manual drive): connected components via
  * Dedup.dupClusters over a synthetic million-node pair graph with the two
  * shapes real dedup produces —
  *  (a) STARS (hub-spoke): what LSH bucket pair-emission looks like
  *      (diameter 2, converges in 2-3 rounds), and
  *  (b) CHAINS of length 10: the adversarial transitive case (a~b, b~c,
  *      ... — diameter 9 forces label propagation the full length).
  * Proves convergence within default maxIter, exact labels on the known
  * structure, and bounded wall-clock at 1M nodes / ~1M edges.
  *
  * Run: sbt "Test/runMain graft.drive.SoakClusters 1000000"
  */
object SoakClusters {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(1000000L)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.pipeline.Dedup

    // node ids [0, n). Even-millionths ranges alternate: ids in [0, n/2)
    // form chains of 10 consecutive ids; ids in [n/2, n) form stars of 1000
    // around each hub (id % 1000 == 0).
    val half = n / 2
    val chainEdges = spark.range(0, half, 1, 64)
      .filter(col("id") % 10 =!= 9) // no edge across chain boundaries
      .select(col("id").as("ida"), (col("id") + 1).as("idb"))
    val starEdges = spark.range(half, n, 1, 64)
      .filter(col("id") % 1000 =!= 0)
      .select((col("id") - (col("id") % 1000)).as("ida"), col("id").as("idb"))
    val pairs = chainEdges.unionByName(starEdges).persist()
    val nEdges = pairs.count()
    println(s"SOAKCLUSTERS n=$n edges=$nEdges (chains of 10 + stars of 1000)")

    val t0 = System.nanoTime()
    val labeled = Dedup.dupClusters(pairs).persist()
    val total = labeled.count()
    val wall = (System.nanoTime() - t0) / 1e9
    println(f"SOAKCLUSTERS clustered nodes=$total wall=$wall%.1f s")

    // chains: every id in [0, half) must be labeled by its chain base
    val badChain = labeled.filter(col("doc_id") < half)
      .filter(col("cluster") =!= col("doc_id") - (col("doc_id") % 10)).count()
    // stars: every id in [half, n) must be labeled by its hub
    val badStar = labeled.filter(col("doc_id") >= half)
      .filter(col("cluster") =!= col("doc_id") - (col("doc_id") % 1000)).count()
    val nClusters = labeled.select("cluster").distinct().count()
    val expected = (half / 10) + (n - half) / 1000
    println(s"SOAKCLUSTERS badChain=$badChain badStar=$badStar clusters=$nClusters expected=$expected")
    assert(badChain == 0, s"$badChain chain nodes mislabeled")
    assert(badStar == 0, s"$badStar star nodes mislabeled")
    assert(nClusters == expected, s"cluster count $nClusters != $expected")
    assert(total == n, s"clustered $total of $n paired nodes")
    println("SOAKCLUSTERS OK")
    spark.stop()
  }
}
