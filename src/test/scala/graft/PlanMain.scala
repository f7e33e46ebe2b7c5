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

    println("=== (field, term) pruned postings scan — the real leaf lookup ===")
    s.postingsRaw.filter(col("field") === "text" && col("term") === "quick")
      .select("field", "term", "df").explain("formatted")

    println("=== term stats aggregate (dict fallback path) ===")
    s.postingsRaw.select("field", "term", "df", "ttf")
      .filter(col("field") === "text" && col("term").isInCollection(Set("quick", "brown")))
      .groupBy("field", "term").agg(sum("df")).explain("formatted")

    println("=== leapfrog conjunction: ONE exchange of compressed rows ===")
    s.compile(BoolQ(List(Occur.Must -> TermQ("quick"), Occur.Must -> TermQ("brown"))))
      .explain("formatted")

    println("=== phrase pre-intersection: same single-exchange shape ===")
    s.compile(PhraseQ(List("quick" -> 0, "brown" -> 1))).explain("formatted")

    println("=== top-k plan (OR query, WAND path result assembly) ===")
    val q = BoolQ(List(Occur.Should -> TermQ("quick"), Occur.Should -> TermQ("brown")))
    s.search(q, 10).explain("formatted")
  }
}
