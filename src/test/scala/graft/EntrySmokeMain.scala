package graft.drive
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = graft.SparkTestSession.spark
    val df = graft.SparkEntry.entry(spark)
    val n = df.count()
    println(s"ENTRY_ROWS: $n")
    df.show(5, truncate = false)
  }
}
