package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video ride as opaque BINARY
  * columns with typed metadata. The Spark side — schema, partition-preserving
  * mapPartitions batches, deterministic outputs — is real and tested; the
  * actual byte decode is STUBBED (deterministic fake) because no image/audio
  * codec libraries exist in this container. Swap [[decodeImageStub]] for a
  * real decoder at the marked point.
  */
object Multimodal {

  final case class MediaMeta(id: Long, nBytes: Long, headByte: Int,
                             fakeWidth: Int, fakeHeight: Int, format: String)

  val mediaSchema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("media", BinaryType, nullable = true),
    StructField("mediaType", StringType, nullable = true)))

  /** STUB — deterministic fake decode standing in for a real image decoder.
    * Real implementation would parse the container header (PNG/JPEG markers)
    * and hand pixel planes to a vectorized kernel; the surrounding batch
    * shape (one partition -> streaming iterator -> typed rows) is the real
    * contract this module tests.
    */
  def decodeImageStub(bytes: Array[Byte]): (Int, Int, String) = {
    if (bytes == null || bytes.isEmpty) (0, 0, "empty")
    else {
      val w = 64 + math.floorMod(bytes.length, 577)
      val h = 64 + math.floorMod(bytes.length * 31 + (bytes(0) & 0xff), 417)
      val fmt = if ((bytes(0) & 0xff) == 0x89) "png-like"
                else if ((bytes(0) & 0xff) == 0xff) "jpeg-like" else "raw"
      (w, h, fmt)
    }
  }

  /** Per-partition metadata extraction — the mapInPandas-equivalent batch
    * path (one JVM iterator per partition, no per-row task overhead).
    */
  def extractMeta(spark: SparkSession, media: DataFrame): Dataset[MediaMeta] = {
    import spark.implicits._
    media.select(col("id").cast("long"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          val (w, h, fmt) = decodeImageStub(bytes)
          MediaMeta(id,
            if (bytes == null) 0L else bytes.length.toLong,
            if (bytes == null || bytes.isEmpty) -1 else bytes(0) & 0xff,
            w, h, fmt)
        }
      }
  }

  /** Frame-sampling stub for video-like payloads: pick every `stride`-th
    * chunk boundary deterministically (plumbing: one row in, n rows out).
    */
  def sampleFrames(spark: SparkSession, media: DataFrame, chunk: Int, stride: Int): DataFrame = {
    import spark.implicits._
    media.select(col("id").cast("long"), col("media"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        if (bytes == null) Iterator.empty
        else (0 until bytes.length by chunk * stride).iterator.map { off =>
          val end = math.min(off + chunk, bytes.length)
          (id, off, java.util.Arrays.copyOfRange(bytes, off, end))
        }
      }
      .toDF("id", "offset", "frame")
  }
}
