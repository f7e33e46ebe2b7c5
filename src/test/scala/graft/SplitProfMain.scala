package graft.drive

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerJobEnd}
import scala.collection.concurrent.TrieMap

object SplitProf {
  def main(args: Array[String]): Unit = {
    val spark = graft.SparkTestSession.spark
    val sfDir = "/root/testdata/sf0.1"
    val pages = graft.IndexCache.pagesFromDocuments(spark, sfDir)
    val starts = TrieMap[Int, (Long, String)]()
    val lines = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        starts(j.jobId) = (System.nanoTime(),
          Option(j.properties.getProperty("spark.job.description")).getOrElse("") + " | " +
          j.stageInfos.map(_.name.take(60)).mkString(";"))
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        starts.get(j.jobId).foreach { case (t0, desc) =>
          lines.add(f"job ${j.jobId}%3d ${(System.nanoTime()-t0)/1e9}%7.3f s  $desc")
        }
    })
    val idxPath = java.nio.file.Files.createTempDirectory("splitprof").toString
    graft.build.IndexBuilder.build(spark, pages, idxPath,
      graft.build.IndexBuilder.BuildConfig(numSegments = 8, analyzerName = "simple", groupSize = 8))
    Thread.sleep(500); lines.clear()
    // warm trial then profiled trial
    val w = java.nio.file.Files.createTempDirectory("splitprofw").toString
    graft.merge.MergeJob.splitIndex(spark, idxPath, w, 16)
    Thread.sleep(500); lines.clear()
    val t0 = System.nanoTime()
    val dst = java.nio.file.Files.createTempDirectory("splitprofd").toString
    graft.merge.MergeJob.splitIndex(spark, idxPath, dst, 16)
    val wall = (System.nanoTime()-t0)/1e9
    Thread.sleep(500)
    println(f"SPLIT WALL $wall%.3f s")
    lines.forEach(l => println(l))
  }
}
