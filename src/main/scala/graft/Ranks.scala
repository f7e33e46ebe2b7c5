package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed contiguous ranking without a single-partition window funnel.
  *
  * `row_number() over (order by ...)` with no partition moves the entire
  * input through one task ("No Partition Defined for Window" — a scale-killer
  * for unbounded inputs). Instead: global range-sort (parallel), count rows
  * per physical partition (a tiny job over the cached sort), then rank =
  * partition offset + per-partition row_number. Identical output, no funnel.
  */
object Ranks {

  /** Append a contiguous 1-based integer `rankCol` in `order`. The order must
    * be total (include a unique tie-break key) so ranks are deterministic.
    */
  def appendRank(df: DataFrame, rankCol: String, order: Seq[Column]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // eager localCheckpoint (not cache): partition boundaries stay fixed
    // between the size job and the rank job, lineage is cut, and the blocks
    // are released by the ContextCleaner when the result is dropped — no
    // session-lifetime pin per ranked query
    val sorted = df.orderBy(order: _*).localCheckpoint(true)
    val sizes = sorted
      .select(spark_partition_id().as("pid"))
      .groupBy("pid").count()
      .as[(Int, Long)].collect().sortBy(_._1)
    val offsets: Map[Int, Long] = {
      var acc = 0L
      sizes.map { case (pid, n) => val o = pid -> acc; acc += n; o }.toMap
    }
    val offDf = spark.createDataset(offsets.toSeq).toDF("pid", "off")
    val local = sorted
      .withColumn("pid", spark_partition_id())
      .withColumn("r", row_number().over(Window.partitionBy(col("pid")).orderBy(order: _*)))
    local.join(broadcast(offDf), "pid")
      .withColumn(rankCol, (col("off") + col("r")).cast("int"))
      .drop("pid", "off", "r")
  }
}
