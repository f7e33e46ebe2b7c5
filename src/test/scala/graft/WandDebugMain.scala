package graft.drive

import org.apache.spark.sql.SparkSession
import graft.build.{IndexBuilder, PagesGen}
import graft.search._

object WandDebug {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(1000000L)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val base = java.nio.file.Files.createTempDirectory("wanddbg").toString
    val pages = PagesGen.df(spark, n, partitions = 64).select("url", "text")
    IndexBuilder.build(spark, pages, base, IndexBuilder.BuildConfig(16, "standard", groupSize = 16))
    val s = new Searcher(spark, base)
    val qs = List(
      "or2" -> BoolQ(List(Occur.Should -> TermQ(PagesGen.word(3)), Occur.Should -> TermQ(PagesGen.word(77)))),
      "term" -> TermQ(PagesGen.word(3)),
      "rare" -> TermQ(PagesGen.word(4500)))
    qs.foreach { case (name, q) =>
      val plan = s.searchPlan(q, 20).collect().map(r => (r.getString(0), r.getDouble(1))).toList
      val wand = s.searchWand(q, 20).collect().map(r => (r.getString(0), r.getDouble(1))).toList
      val same = plan == wand
      println(s"WANDDBG $name same=$same")
      if (!same) {
        println(s"  plan=${plan.take(6)}")
        println(s"  wand=${wand.take(6)}")
      }
    }
    spark.stop()
  }
}
