package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.pipeline.Multimodal

/** Real JDK-codec multimodal paths: ImageIO decode (PNG/BMP/GIF), real
  * Graphics2D downscale, pixel-statistics embedding, animated-GIF
  * multi-frame decode, and WAV encode/parse via javax.sound — each verified
  * against the deterministic fixture formulas an external SQL oracle also
  * computes.
  */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("decodeImage round-trips dims + format through real PNG/BMP/GIF bytes") {
    for (id <- 0L until 60L) {
      val bytes = Multimodal.syntheticImage(id, checker = true)
      val (w, h) = Multimodal.fixtureDims(id)
      val Some((img, fmt)) = Multimodal.decodeImage(bytes)
      assert(img.getWidth == w, s"id=$id")
      assert(img.getHeight == h, s"id=$id")
      assert(fmt == Multimodal.fixtureFormat(id), s"id=$id")
    }
  }

  test("checkerboard raster decodes pixel-exact in all three formats") {
    for (id <- Seq(0L, 1L, 2L, 33L, 34L, 35L)) {
      val bytes = Multimodal.syntheticImage(id, checker = true)
      val (r, g, b) = Multimodal.fixtureColor(id)
      val Some((img, _)) = Multimodal.decodeImage(bytes)
      val even = img.getRGB(0, 0)
      assert(((even >> 16) & 0xff, (even >> 8) & 0xff, even & 0xff) == ((r, g, b)), s"id=$id even")
      if (img.getWidth > 1) {
        val odd = img.getRGB(1, 0)
        assert(((odd >> 16) & 0xff, (odd >> 8) & 0xff, odd & 0xff)
          == ((255 - r, 255 - g, 255 - b)), s"id=$id odd")
      }
    }
  }

  test("4-format rotation incl. JPEG: real header decode recovers dims + format") {
    for (id <- 0L until 40L) {
      val bytes = Multimodal.syntheticImage4(id)
      val (w, h) = Multimodal.fixtureDims(id)
      val Some((img, fmt)) = Multimodal.decodeImage(bytes)
      assert((img.getWidth, img.getHeight) == ((w, h)), s"id=$id")
      assert(fmt == Multimodal.fixtureFormat4(id), s"id=$id")
    }
  }

  test("clampDims: exact integer aspect-preserving clamp, never upscales") {
    assert(Multimodal.clampDims(64, 48, 128, 96) == ((64, 48)))
    assert(Multimodal.clampDims(256, 96, 128, 96) == ((128, 48)))
    assert(Multimodal.clampDims(100, 400, 128, 96) == ((24, 96)))
    assert(Multimodal.clampDims(1000, 1, 128, 96) == ((128, 1)))
    assert(Multimodal.clampDims(1, 1000, 128, 96) == ((1, 96)))
  }

  test("resize: real downscale; thumb re-decodes with clamped dims and exact solid color") {
    for (id <- Seq(5L, 49L, 50L, 123L)) {
      val bytes = Multimodal.syntheticImage(id, checker = false)
      val (w, h) = Multimodal.fixtureDims(id)
      val (r, g, b) = Multimodal.fixtureColor(id)
      val (ow, oh, thumb) = Multimodal.resizeImage(bytes, 32, 24)
      assert((ow, oh) == Multimodal.clampDims(w, h, 32, 24))
      val Some((timg, tfmt)) = Multimodal.decodeImage(thumb)
      assert(tfmt == "png")
      assert((timg.getWidth, timg.getHeight) == ((ow, oh)))
      val p = timg.getRGB(0, 0) // solid in == solid out under any interpolation
      assert((((p >> 16) & 0xff), ((p >> 8) & 0xff), (p & 0xff)) == ((r, g, b)))
    }
  }

  test("embedImage: exact-integer pixel sums match the checkerboard formula") {
    for (id <- Seq(0L, 7L, 11L, 100L)) {
      val bytes = Multimodal.syntheticImage(id, checker = true)
      val (w, h) = Multimodal.fixtureDims(id)
      val (r, g, b) = Multimodal.fixtureColor(id)
      val n = w.toLong * h
      val nEven = (n + 1) / 2 // (x+y) even count for any w,h: ceil(n/2)
      val nOdd = n - nEven
      val e = Multimodal.embedImage(bytes, 5)
      assert(e(0) == w.toFloat && e(1) == h.toFloat)
      assert(e(2) == (nEven * r + nOdd * (255 - r)).toFloat, s"id=$id sumR")
      assert(e(3) == (nEven * g + nOdd * (255 - g)).toFloat, s"id=$id sumG")
      assert(e(4) == (nEven * b + nOdd * (255 - b)).toFloat, s"id=$id sumB")
    }
  }

  test("animated GIF: real multi-frame decode recovers every frame's dims + color") {
    import spark.implicits._
    val ids = spark.range(0, 40).select(col("id"))
    val media = ids.as[Long]
      .mapPartitions(_.map(id =>
        (id, Multimodal.syntheticAnimatedGif(id, 2 + (id % 3).toInt))))
      .toDF("id", "media")
    val rows = Multimodal.gifFrames(spark, media)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3),
        r.getInt(4), r.getInt(5), r.getInt(6)))
    assert(rows.length == (0L until 40L).map(id => 2 + (id % 3).toInt).sum)
    rows.foreach { case (id, f, w, h, r, g, b) =>
      val (ew, eh) = Multimodal.fixtureDims(id)
      val (er, eg, eb) = Multimodal.fixtureColor(id)
      assert((w, h) == ((ew, eh)), s"id=$id f=$f")
      assert((r, g, b) == (((er + 40 * f) % 256, (eg + 40 * f) % 256, (eb + 40 * f) % 256)),
        s"id=$id f=$f")
    }
  }

  test("WAV: real RIFF encode + javax.sound parse recovers header and payload sum") {
    import spark.implicits._
    val ids = spark.range(0, 30).select(col("id"))
    val media = ids.as[Long]
      .mapPartitions(_.map(id => (id, Multimodal.syntheticWav(id))))
      .toDF("id", "media")
    val rows = Multimodal.audioMeta(spark, media).collect()
    assert(rows.length == 30)
    rows.foreach { r =>
      val id = r.getLong(0)
      val (rate, channels, frames) = Multimodal.fixtureAudioParams(id)
      assert(r.getInt(1) == rate, s"id=$id rate")
      assert(r.getInt(2) == channels, s"id=$id channels")
      assert(r.getInt(3) == 16, s"id=$id bits")
      assert(r.getLong(4) == frames.toLong, s"id=$id frames")
      val nBytes = frames * channels * 2
      val want = (0 until nBytes).map(i => (i * 7 + id) % 256).sum
      assert(r.getLong(5) == want, s"id=$id byte_sum")
    }
  }

  test("cluster-side batch pass: extractMeta over mixed formats, all 500 docs") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"))
    val media = Multimodal.imageFixtures(docs, "doc_id", checker = true)
    val metas = Multimodal.extractMeta(spark, media).collect()
    assert(metas.nonEmpty)
    metas.foreach { m =>
      val (w, h) = Multimodal.fixtureDims(m.id)
      assert((m.width, m.height) == ((w, h)))
      assert(m.format == Multimodal.fixtureFormat(m.id))
    }
  }
}
