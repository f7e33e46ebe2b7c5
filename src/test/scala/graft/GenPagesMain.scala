package graft.drive

/** Writes a small pages parquet for CLI smoke drives. */
object GenPages {
  def main(args: Array[String]): Unit = {
    val spark = graft.SparkTestSession.spark
    graft.build.PagesGen.df(spark, 2000).write.mode("overwrite").parquet("/tmp/clipages")
    println("WROTE /tmp/clipages")
  }
}
