package graft.drive

import org.apache.spark.sql.functions._
import graft.build.{IndexBuilder, PagesGen}
import graft.search._

/** Physical-plan audit: confirm pushdown/pruning on the serving path. */
object Plans {
  def main(args: Array[String]): Unit = {
    val spark = graft.SparkTestSession.spark
    val base = java.nio.file.Files.createTempDirectory("plans").toString
    val df = spark.createDataFrame(PagesGen.local(300)).toDF("url", "text")
    IndexBuilder.build(spark, df, base, IndexBuilder.BuildConfig(4, "standard", groupSize = 4))
    val s = new Searcher(spark, base)

    println("=== term filter scan (postings) ===")
    s.postingsRaw.filter(col("term") === "quick").select("term", "df").explain("formatted")

    println("=== term stats aggregate ===")
    s.postingsRaw.select("term", "df", "ttf").filter(col("term").isInCollection(Set("quick", "brown")))
      .groupBy("term").agg(sum("df")).explain("formatted")

    println("=== top-k plan (OR query) ===")
    val q = BoolQ(List(Occur.Should -> TermQ("quick"), Occur.Should -> TermQ("brown")))
    s.search(q, 10).explain("formatted")
  }
}
