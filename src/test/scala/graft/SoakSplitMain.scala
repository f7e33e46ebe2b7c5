package graft.drive

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.build.{CheckIndex, Deletes, IndexBuilder, PagesGen}
import graft.merge.MergeJob
import graft.search._

/** Scale soak for the re-shard path: build a large corpus at 8 segments,
  * delete 1%, split to 32 segments (no re-analysis), then prove CheckIndex
  * invariants, live-doc accounting, and query identity vs the source.
  * `Test/runMain graft.drive.SoakSplit 1000000`.
  */
object SoakSplit {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(1000000L)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val base = java.nio.file.Files.createTempDirectory("graftsoaksplit").toString
    val pages = PagesGen.df(spark, n, partitions = 64).select("url", "text")
    val tb0 = System.nanoTime()
    IndexBuilder.build(spark, pages, s"$base/src",
      IndexBuilder.BuildConfig(8, "standard", groupSize = 8))
    println(f"SOAKSPLIT build: $n docs in ${(System.nanoTime() - tb0) / 1e9}%.1f s")

    // delete ~1% of urls before the split
    val dropped = pages.select("url").filter(abs(hash(col("url"))) % 100 === 0)
    val nDropped = dropped.count()
    Deletes.deleteUrls(spark, s"$base/src", dropped)

    val t0 = System.nanoTime()
    val live = MergeJob.splitIndex(spark, s"$base/src", s"$base/dst", 32)
    val wall = (System.nanoTime() - t0) / 1e9
    println(f"SOAKSPLIT split 8->32: $live live docs in $wall%.1f s (${live / wall}%.0f docs/s)")
    require(live == n - nDropped, s"live=$live expected=${n - nDropped}")

    val report = CheckIndex.run(spark, s"$base/dst")
    require(report.ok, report.violations.mkString("; "))
    require(report.segments == 32, s"segments=${report.segments}")
    println(s"SOAKSPLIT checkindex: ok, ${report.segments} segments, ${report.docs} docs")

    // membership identity on rare terms (FULL match sets, score-free — the
    // source still counts deleted docs in its stats until a merge purges
    // them, so scores legitimately drift while membership cannot)
    val src = new Searcher(spark, s"$base/src")
    val dst = new Searcher(spark, s"$base/dst")
    (0 until 8).foreach { i =>
      val q = TermQ(PagesGen.word(3000 + i * 137))
      val a = src.search(q, 50000).collect().map(_.getString(0)).toSet
      val b = dst.search(q, 50000).collect().map(_.getString(0)).toSet
      require(a.nonEmpty, s"query #$i matched nothing in the source")
      require(a == b, s"query #$i membership mismatch: src=${a.size} dst=${b.size}")
    }
    println("SOAKSPLIT membership identity: 8/8 full match sets equal")
    println("SOAKSPLIT OK")
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(base), true)
    spark.stop()
  }
}
