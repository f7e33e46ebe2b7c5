package graft.drive

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler._
import graft.build.{IndexBuilder, PagesGen}

object Profile {
  def main(args: Array[String]): Unit = {
    val cpus = args.headOption.getOrElse("8").toInt
    val n = if (args.length > 1) args(1).toLong else 200000L
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val stages = new java.util.concurrent.ConcurrentHashMap[Int, (String, Long, Long, Int, Long)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val wall = si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)
        val run = si.taskMetrics.executorRunTime
        val gc = si.taskMetrics.jvmGCTime
        stages.put(si.stageId, (si.name.split(" ").head, wall, run, si.numTasks, gc))
      }
    })
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROFILE $name ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    val pages = PagesGen.df(spark, n, partitions = cpus * 2).select("url", "text")
    t("gen_count") { pages.count() }
    val idx = java.nio.file.Files.createTempDirectory(s"prof$cpus").toString
    t("full_build") {
      IndexBuilder.build(spark, pages, idx, IndexBuilder.BuildConfig(64, "standard", groupSize = 64))
    }
    Thread.sleep(500)
    import scala.jdk.CollectionConverters._
    stages.asScala.toSeq.sortBy(_._1).foreach { case (id, (name, wall, run, nt, gc)) =>
      println(f"STAGE $id%3d $name%-22s wall=${wall/1000.0}%6.1fs cpu=${run/1000.0}%7.1fs gc=${gc/1000.0}%5.1fs tasks=$nt")
    }
    spark.stop()
  }
}
