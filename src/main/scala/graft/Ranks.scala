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

  /** Top-k in `order` with a contiguous 1-based `rankCol` appended — for
    * SMALL k only. The top-k itself is a parallel TakeOrderedAndProject;
    * the <=k winners are then ranked on the DRIVER (a window over a
    * foldable/absent partition key is still an unpartitioned physical
    * window — Catalyst folds `partitionBy(lit(0))` away, so the old trick
    * kept emitting "No Partition Defined for Window" warnings even though
    * the data volume was harmless). Output order: rank asc.
    */
  def rankTopK(df: DataFrame, k: Int, order: Seq[Column],
               rankCol: String = "rank"): DataFrame = {
    val spark = df.sparkSession
    val top = df.orderBy(order: _*).limit(k)
    val rows = top.collect() // <=k rows, already in rank order (global sort)
    val schema = org.apache.spark.sql.types.StructType(
      top.schema.fields :+ org.apache.spark.sql.types.StructField(
        rankCol, org.apache.spark.sql.types.IntegerType, nullable = false))
    val ranked = rows.zipWithIndex.map { case (r, i) =>
      org.apache.spark.sql.Row.fromSeq(r.toSeq :+ (i + 1))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(ranked.toIndexedSeq, 1), schema)
  }
}
