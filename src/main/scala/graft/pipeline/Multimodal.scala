package graft.pipeline

import java.awt.image.{BufferedImage, IndexColorModel}
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.{IIOImage, ImageIO, ImageTypeSpecifier}
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns: image/audio/video ride as opaque BINARY columns with
  * typed metadata, processed in partition-preserving mapPartitions batches
  * (the JVM analog of a mapInPandas batch pass: one streaming iterator per
  * partition, no per-row task overhead, no shuffle).
  *
  * Decode is REAL:
  *  - images: JDK ImageIO (PNG/BMP/GIF/JPEG readers), real header + raster
  *    decode, real Graphics2D downscale, real pixel-statistics embedding;
  *  - animated GIF: real multi-frame decode through the GIF ImageReader;
  *  - audio: real WAV (RIFF/PCM) encode + parse via javax.sound.sampled.
  * Only VIDEO containers remain a documented stub ([[chunkFrames]]) — the
  * JDK ships no video codec, so frame sampling over video bytes is modeled
  * as deterministic byte chunking with the same batch shape a real codec
  * pass would use.
  *
  * Fixture synthesis (for tests/gates) uses the same real encoders in
  * reverse: deterministic dims/colors that are pure integer formulas of the
  * row id are drawn into a BufferedImage and encoded with ImageIO, so an
  * external SQL oracle can recompute every decoded value from the id while
  * the decode path genuinely parses PNG/BMP/GIF/WAV bytes.
  *
  * Reference: Lucene has no media module — this family comes from the
  * training-data-pipeline brief, not the reference surface.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("media", BinaryType, nullable = true),
    StructField("mediaType", StringType, nullable = true)))

  // ======================================================================
  // deterministic fixture formulas (id -> dims/colors/format), shared with
  // the SQL oracle
  // ======================================================================

  /** Fixture dims: w in [8,64], h in [8,48] — pure formulas of id. */
  def fixtureDims(id: Long): (Int, Int) =
    (8 + math.floorMod(id, 57L).toInt, 8 + math.floorMod(id * 13L, 41L).toInt)

  /** Fixture base color (r, g, b). */
  def fixtureColor(id: Long): (Int, Int, Int) =
    (math.floorMod(id, 256L).toInt,
      math.floorMod(id * 31L, 256L).toInt,
      math.floorMod(id * 77L, 256L).toInt)

  /** Fixture container format rotates across the three lossless JDK codecs. */
  def fixtureFormat(id: Long): String = math.floorMod(id, 3L) match {
    case 0L => "png"
    case 1L => "bmp"
    case _  => "gif"
  }

  /** 4-format rotation for the header-decode (meta) gate: adds JPEG —
    * lossy, so only dims/format are oracle-checked through it, never
    * pixels (the lossless trio carries the raster proofs). */
  def fixtureFormat4(id: Long): String = math.floorMod(id, 4L) match {
    case 0L => "png"
    case 1L => "bmp"
    case 2L => "gif"
    case _  => "jpeg"
  }

  /** Solid fixture in the 4-format rotation (real JPEG encode included). */
  def syntheticImage4(id: Long): Array[Byte] =
    encodeFixture(id, checker = false, fixtureFormat4(id))

  /** Encode a deterministic fixture image with a REAL JDK encoder.
    * `checker = false`: solid base color. `checker = true`: 1px checkerboard
    * of base color (at (x+y) even) and its inverse (at odd) — decode must
    * walk the raster, not just the header, to reproduce pixel statistics.
    * GIF frames draw into an indexed image with an exact 2-entry palette so
    * the palette quantizer cannot shift colors; PNG/BMP are 24-bit exact.
    */
  def syntheticImage(id: Long, checker: Boolean): Array[Byte] =
    encodeFixture(id, checker, fixtureFormat(id))

  private def encodeFixture(id: Long, checker: Boolean, fmt: String): Array[Byte] = {
    val (w, h) = fixtureDims(id)
    val (r, g, b) = fixtureColor(id)
    val rgbA = (r << 16) | (g << 8) | b
    val rgbB = ((255 - r) << 16) | ((255 - g) << 8) | (255 - b)
    val img =
      if (fmt == "gif") {
        val cm = new IndexColorModel(1, 2,
          Array(r.toByte, (255 - r).toByte),
          Array(g.toByte, (255 - g).toByte),
          Array(b.toByte, (255 - b).toByte))
        new BufferedImage(w, h, BufferedImage.TYPE_BYTE_BINARY, cm)
      } else new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val odd = checker && ((x + y) & 1) == 1
        img.setRGB(x, y, if (odd) rgbB else rgbA)
        x += 1
      }
      y += 1
    }
    val baos = new ByteArrayOutputStream()
    ImageIO.write(img, fmt, baos)
    baos.toByteArray
  }

  /** Animated-GIF fixture: `nFrames` full-size solid frames, frame f filled
    * with ((r+40f)%256, (g+40f)%256, (b+40f)%256); written through the real
    * GIF sequence writer (one exact-palette indexed frame each).
    */
  def syntheticAnimatedGif(id: Long, nFrames: Int): Array[Byte] = {
    val (w, h) = fixtureDims(id)
    val (r, g, b) = fixtureColor(id)
    val baos = new ByteArrayOutputStream()
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    val ios = ImageIO.createImageOutputStream(baos)
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    var f = 0
    while (f < nFrames) {
      val fr = (r + 40 * f) % 256
      val fg = (g + 40 * f) % 256
      val fb = (b + 40 * f) % 256
      val cm = new IndexColorModel(1, 2,
        Array(fr.toByte, fr.toByte), Array(fg.toByte, fg.toByte),
        Array(fb.toByte, fb.toByte))
      val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_BINARY, cm)
      val g2 = img.createGraphics()
      g2.setColor(new java.awt.Color(fr, fg, fb))
      g2.fillRect(0, 0, w, h)
      g2.dispose()
      writer.writeToSequence(new IIOImage(img, null, null), null)
      f += 1
    }
    writer.endWriteSequence()
    ios.close()
    writer.dispose()
    baos.toByteArray
  }

  /** WAV fixture: 16-bit PCM little-endian, real RIFF container via
    * javax.sound. sampleRate/channels/frames are formulas of id; sample
    * bytes are ((i*7 + id) % 256) so payload decode is oracle-checkable.
    */
  def fixtureAudioParams(id: Long): (Int, Int, Int) = {
    val rate = math.floorMod(id, 3L) match {
      case 0L => 8000; case 1L => 16000; case _ => 44100
    }
    val channels = 1 + math.floorMod(id, 2L).toInt
    val frames = 100 + math.floorMod(id * 17L, 400L).toInt
    (rate, channels, frames)
  }

  def syntheticWav(id: Long): Array[Byte] = {
    val (rate, channels, frames) = fixtureAudioParams(id)
    val nBytes = frames * channels * 2
    val pcm = new Array[Byte](nBytes)
    var i = 0
    while (i < nBytes) { pcm(i) = ((i * 7 + id) % 256).toByte; i += 1 }
    val fmt = new AudioFormat(rate.toFloat, 16, channels, true, false)
    val ais = new AudioInputStream(new ByteArrayInputStream(pcm), fmt, frames.toLong)
    val baos = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, baos)
    baos.toByteArray
  }

  /** DataFrame of (id, media) image fixtures for each id in `ids`. */
  def imageFixtures(ids: DataFrame, idCol: String, checker: Boolean): DataFrame = {
    val spark = ids.sparkSession
    import spark.implicits._
    ids.select(col(idCol).cast("long")).as[Long]
      .mapPartitions(_.map(id => (id, syntheticImage(id, checker))))
      .toDF("id", "media")
  }

  // ======================================================================
  // REAL decode paths
  // ======================================================================

  final case class ImageMeta(id: Long, width: Int, height: Int, format: String)

  /** Real container decode: reader selection by header sniffing, format name
    * from the matched ImageReader, dims + raster from a full decode.
    * Returns (image, formatName) or None for undecodable bytes.
    */
  def decodeImage(bytes: Array[Byte]): Option[(BufferedImage, String)] = {
    if (bytes == null || bytes.isEmpty) return None
    val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
    try {
      val readers = ImageIO.getImageReaders(iis)
      if (!readers.hasNext) None
      else {
        val reader = readers.next()
        try {
          reader.setInput(iis)
          Some((reader.read(0), reader.getFormatName.toLowerCase))
        } finally reader.dispose()
      }
    } finally iis.close()
  }

  /** Per-partition metadata extraction (real header + raster decode). */
  def extractMeta(spark: SparkSession, media: DataFrame): Dataset[ImageMeta] = {
    import spark.implicits._
    media.select(col("id").cast("long"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        decodeImage(bytes) match {
          case Some((img, fmt)) => ImageMeta(id, img.getWidth, img.getHeight, fmt)
          case None             => ImageMeta(id, 0, 0, "undecodable")
        }
      })
  }

  /** Aspect-preserving clamp in exact integer arithmetic (no double
    * rounding, so an external oracle reproduces it): never upscale; the
    * binding dimension hits its max, the other floors by integer division.
    */
  def clampDims(w: Int, h: Int, maxW: Int, maxH: Int): (Int, Int) =
    if (w <= maxW && h <= maxH) (w, h)
    else if (w.toLong * maxH >= h.toLong * maxW)
      (maxW, math.max(1, (h.toLong * maxW / w).toInt))
    else (math.max(1, (w.toLong * maxH / h).toInt), maxH)

  /** Real downscale: decode -> Graphics2D bilinear draw into the clamped
    * target -> re-encode PNG. Returns (outW, outH, pngBytes).
    */
  def resizeImage(bytes: Array[Byte], maxW: Int, maxH: Int): (Int, Int, Array[Byte]) =
    decodeImage(bytes) match {
      case None => (0, 0, Array.empty[Byte])
      case Some((img, _)) =>
        val (ow, oh) = clampDims(img.getWidth, img.getHeight, maxW, maxH)
        val out = new BufferedImage(ow, oh, BufferedImage.TYPE_INT_RGB)
        val g2 = out.createGraphics()
        g2.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g2.drawImage(img, 0, 0, ow, oh, null)
        g2.dispose()
        val baos = new ByteArrayOutputStream()
        ImageIO.write(out, "png", baos)
        (ow, oh, baos.toByteArray)
    }

  /** Batch resize pass: (id, out_w, out_h, thumb-PNG bytes). */
  def resize(spark: SparkSession, media: DataFrame, maxW: Int, maxH: Int): DataFrame = {
    import spark.implicits._
    media.select(col("id").cast("long"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val (ow, oh, out) = resizeImage(bytes, maxW, maxH)
        (id, ow, oh, out)
      })
      .toDF("id", "out_w", "out_h", "thumb")
  }

  /** Real pixel-statistics embedding from a full raster decode. Components
    * are EXACT small integers (so float carries them losslessly and an
    * oracle reproduces them bit-for-bit): [w, h, sumR, sumG, sumB] cycled
    * to `dim`. Feeds [[graft.pipeline.Ann]] downstream like any other
    * ARRAY<FLOAT> embedding column.
    */
  def embedImage(bytes: Array[Byte], dim: Int): Array[Float] =
    decodeImage(bytes) match {
      case None => new Array[Float](dim)
      case Some((img, _)) =>
        val w = img.getWidth
        val h = img.getHeight
        var sr = 0L; var sg = 0L; var sb = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val p = img.getRGB(x, y)
            sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
            x += 1
          }
          y += 1
        }
        val base = Array(w.toFloat, h.toFloat, sr.toFloat, sg.toFloat, sb.toFloat)
        Array.tabulate(dim)(i => base(i % base.length))
    }

  /** Batch feature-extract pass: (id, embedding). */
  def embed(spark: SparkSession, media: DataFrame, dim: Int = 5): DataFrame = {
    import spark.implicits._
    media.select(col("id").cast("long"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => (id, embedImage(bytes, dim)) })
      .toDF("id", "embedding")
  }

  /** Real multi-frame decode (animated GIF): one output row per frame with
    * dims and the frame's (0,0) pixel. One row in, n rows out, partition-
    * preserving — the batch shape a video frame sampler shares.
    */
  def gifFrames(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select(col("id").cast("long"), col("media"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        if (bytes == null || bytes.isEmpty) Iterator.empty
        else {
          val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
          try {
            val readers = ImageIO.getImageReaders(iis)
            if (!readers.hasNext) Iterator.empty
            else {
              val reader = readers.next()
              try {
                reader.setInput(iis)
                val n = reader.getNumImages(true)
                (0 until n).map { f =>
                  val img = reader.read(f)
                  val p = img.getRGB(0, 0)
                  (id, f, img.getWidth, img.getHeight,
                    (p >> 16) & 0xff, (p >> 8) & 0xff, p & 0xff)
                }.iterator
              } finally reader.dispose()
            }
          } finally iis.close()
        }
      }
      .toDF("id", "frame_idx", "w", "h", "r", "g", "b")
  }

  /** Real WAV metadata + payload decode via javax.sound: container header
    * (rate/channels/bits/frame count) plus the unsigned sum of the decoded
    * PCM byte stream (proves the payload, not just the header, was read).
    */
  def audioMeta(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select(col("id").cast("long"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        if (bytes == null || bytes.isEmpty) (id, 0, 0, 0, 0L, 0L)
        else {
          val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
          try {
            val fmt = ais.getFormat
            val frames = ais.getFrameLength
            var sum = 0L
            val buf = new Array[Byte](8192)
            var n = ais.read(buf)
            while (n > 0) {
              var i = 0
              while (i < n) { sum += buf(i) & 0xff; i += 1 }
              n = ais.read(buf)
            }
            (id, fmt.getSampleRate.toInt, fmt.getChannels,
              fmt.getSampleSizeInBits, frames, sum)
          } finally ais.close()
        }
      })
      .toDF("id", "sample_rate", "channels", "bits", "frames", "byte_sum")
  }

  /** Frame sampling for VIDEO payloads — documented STUB (the JDK ships no
    * video codec): deterministic byte chunking with the batch shape a real
    * demuxer pass would use (one row in, n rows out, no shuffle). Swap the
    * chunker for a real demuxer where one is available on the cluster.
    */
  def chunkFrames(spark: SparkSession, media: DataFrame, chunk: Int, stride: Int): DataFrame = {
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
