package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.analysis.DelimitedPayloadAnalyzer
import graft.build.IndexBuilder
import graft.codec.PostingsCodec
import graft.merge.MergeJob
import graft.search._
import java.nio.file.Files

/** Payload stream — the .pay-file / PayloadAttribute analog: the
  * DelimitedPayloadTokenFilter chain attaches 4-byte-int payloads, the codec
  * carries one vByte(len)+bytes frame per position, PayloadScoreQ folds them
  * with Min/Max/Average payload functions, and a merge re-encodes the stream
  * aligned through purge/rebase.
  */
class PayloadSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("delimited payload analyzer attaches int payloads") {
    val ts = DelimitedPayloadAnalyzer.tokenize("Alpha|5 beta Gamma|12").toList
    assert(ts.map(_.term) == List("alpha", "beta", "gamma"))
    assert(ts(0).payload.toSeq == Seq[Byte](0, 0, 0, 5))
    assert(ts(1).payload == null)
    assert(DelimitedPayloadAnalyzer.decodeInt(ts(2).payload, 0) == 12)
  }

  test("codec payload stream roundtrip with mixed presence") {
    val enc = new PostingsCodec.Encoder
    enc.add(0, 2, Array(1, 5), 10, Array(DelimitedPayloadAnalyzer.encodeInt(3), null))
    enc.add(7, 1, Array(2), 8, Array(DelimitedPayloadAnalyzer.encodeInt(9)))
    val e = enc.finish()
    assert(e.payloads != null)
    val d = PostingsCodec.decode(e.df, e.docDeltas, e.tfs, e.positions, e.lens)
    val (starts, lens, flat) = PostingsCodec.decodePayloads(d.posStart(d.tfs.length), e.payloads)
    assert(lens.toSeq == Seq(4, 0, 4))
    assert(DelimitedPayloadAnalyzer.decodeInt(flat, starts(0)) == 3)
    assert(DelimitedPayloadAnalyzer.decodeInt(flat, starts(2)) == 9)
    // payload-free lists carry no stream at all
    val enc2 = new PostingsCodec.Encoder
    enc2.add(0, 1, Array(1), 4)
    assert(enc2.finish().payloads == null)
  }

  test("PayloadScoreQ min/max/avg; payloads survive a purging merge") {
    import spark.implicits._
    val base = Files.createTempDirectory("graftpay").toString
    val pages = (0 until 60).map { i =>
      (f"u$i%04d", s"alpha|$i beta|${i % 5} alpha|${(i * 3) % 11}")
    }
    IndexBuilder.build(spark, pages.toDF("url", "text"), base,
      IndexBuilder.BuildConfig(2, "delimited_payload", groupSize = 2))
    val s0 = new Searcher(spark, base, mode = ExactDouble)

    def scores(s: Searcher, q: Query): Map[String, Double] =
      s.compile(q)
        .join(s.docs.select("segmentId", "docId", "url"), Seq("segmentId", "docId"))
        .select("url", "score").collect()
        .map(r => r.getString(0) -> r.getDouble(1)).toMap

    val avg = scores(s0, PayloadScoreQ("alpha", "avg"))
    val mx = scores(s0, PayloadScoreQ("alpha", "max"))
    val mn = scores(s0, PayloadScoreQ("alpha", "min"))
    (0 until 60).foreach { i =>
      val u = f"u$i%04d"
      val (a, b) = (i, (i * 3) % 11)
      assert(avg(u) == (a + b) / 2.0, s"avg $u")
      assert(mx(u) == math.max(a, b).toDouble, s"max $u")
      assert(mn(u) == math.min(a, b).toDouble, s"min $u")
    }
    // boost multiplies the payload score (PayloadTermQuery boost)
    val boosted = scores(s0, PayloadScoreQ("alpha", "max", boost = 2f))
    assert(boosted(f"u${7}%04d") == mx(f"u${7}%04d") * 2)

    // delete a few docs, merge, and re-check: the stream stays aligned
    // through purge + rebase + stitch
    graft.build.Deletes.deleteUrls(spark, base,
      Seq("u0003", "u0017", "u0042").toDF("url"))
    MergeJob.merge(spark, base, List(0, 1))
    val s1 = new Searcher(spark, base, mode = ExactDouble)
    val avg1 = scores(s1, PayloadScoreQ("alpha", "avg"))
    assert(avg1 == avg -- Seq("u0003", "u0017", "u0042"))
    val report = graft.build.CheckIndex.run(spark, base)
    assert(report.ok, report.violations.mkString("; "))
  }
}
