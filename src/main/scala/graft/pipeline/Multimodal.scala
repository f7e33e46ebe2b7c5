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

  /** STUB resize — deterministic fake downscale standing in for a real
    * pixel kernel: output dims clamp to (maxW, maxH), output payload is a
    * deterministic byte slice sized from the clamped dims. The real
    * contract is the batch shape: binary in, (dims, binary) out, one
    * partition-preserving pass. */
  def resizeStub(bytes: Array[Byte], maxW: Int, maxH: Int): (Int, Int, Array[Byte]) = {
    if (bytes == null || bytes.isEmpty) return (0, 0, Array.empty[Byte])
    val (w, h, _) = decodeImageStub(bytes)
    val ow = math.min(w, maxW)
    val oh = math.min(h, maxH)
    val n = math.max(1, (ow * oh) % 256)
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) { out(i) = bytes(i % bytes.length); i += 1 }
    (ow, oh, out)
  }

  /** Batch resize pass: (id, out_w, out_h, out_len, thumb). */
  def resize(spark: SparkSession, media: DataFrame, maxW: Int, maxH: Int): DataFrame = {
    import spark.implicits._
    media.select(col("id").cast("long"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val (ow, oh, out) = resizeStub(bytes, maxW, maxH)
        (id, ow, oh, out.length, out)
      })
      .toDF("id", "out_w", "out_h", "out_len", "thumb")
  }

  /** STUB feature extraction — a deterministic integer-arithmetic
    * "embedding" of the payload (real systems run a vision/audio encoder
    * here): dim exact-double features from (nBytes, head byte), suitable
    * for feeding the REAL Ann cosine machinery downstream. */
  def embedStub(bytes: Array[Byte], dim: Int): Array[Float] = {
    val n = if (bytes == null) 0 else bytes.length
    val head = if (n == 0) 0 else bytes(0) & 0xff
    Array.tabulate(dim) { i =>
      val c = 31 * (i + 1) + 7
      val m = 211 + 16 * i
      ((n.toLong * c + head) % m).toFloat
    }
  }

  /** Batch feature-extract pass: (id, embedding) — pipe into
    * [[graft.pipeline.Ann]] for media similarity search. */
  def embed(spark: SparkSession, media: DataFrame, dim: Int = 4): DataFrame = {
    import spark.implicits._
    media.select(col("id").cast("long"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => (id, embedStub(bytes, dim)) })
      .toDF("id", "embedding")
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
