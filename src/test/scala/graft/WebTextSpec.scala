package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.pipeline.{Dedup, TextStats}

/** Webtext curation operators: repeated-span mining, line-level dedup,
  * benchmark decontamination, URL canonicalization. Hand-computed fixtures;
  * each test pins exact outputs, not just shapes.
  */
class WebTextSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // ---- repeatedSpans

  test("repeatedSpans counts distinct docs per k-gram and keeps >= minDocs") {
    val df = Seq(
      (1L, "a b c d"),        // shingles: "a b c", "b c d"
      (2L, "a b c x"),        // "a b c", "b c x"
      (3L, "a b c a b c")     // "a b c" twice in ONE doc -> counts once
    ).toDF("doc_id", "text")
    val out = Dedup.repeatedSpans(df, "doc_id", "text", k = 3, minDocs = 2)
      .orderBy("span").collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // "a b c" in docs 1,2,3; all other shingles in exactly one doc
    assert(out.toSeq == Seq(("a b c", 3L, 1L)))
  }

  test("repeatedSpans is a single partial-aggregated shuffle (no join)") {
    val df = Seq((1L, "a b c d"), (2L, "a b c x")).toDF("doc_id", "text")
    val plan = Dedup.repeatedSpans(df, "doc_id", "text", 3, 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan)
  }

  // ---- lineDedup

  test("lineDedup keeps first occurrence in (doc, pos) order, digests content") {
    val df = Seq(
      (1L, "alpha\nbeta\nalpha"),  // alpha@ (1,0) kept, beta kept, alpha@(1,2) dropped
      (2L, "beta\ngamma")          // beta dropped (first was (1,1)), gamma kept
    ).toDF("doc_id", "text")
    val out = Dedup.lineDedup(df, "doc_id", "text").orderBy("id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    def digest(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    assert(out.toSeq == Seq(
      (1L, 2L, 3L, digest("alpha\nbeta")),
      (2L, 1L, 2L, digest("gamma"))))
  }

  test("lineDedup: a doc whose every line occurred earlier digests the empty string") {
    val df = Seq((1L, "x\ny"), (2L, "x\ny")).toDF("doc_id", "text")
    val out = Dedup.lineDedup(df, "doc_id", "text").orderBy("id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(3)))
    assert(out(1)._2 == 0L)
    assert(out(1)._3 == "d41d8cd98f00b204e9800998ecf8427e") // md5("")
  }

  test("lineDedup accounts for null-text docs explicitly (0, 0, md5(''))") {
    val df = Seq((1L, "x\ny"), (2L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val out = Dedup.lineDedup(df, "doc_id", "text").orderBy("id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(out.length == 2)
    assert(out(1) == ((2L, 0L, 0L, "d41d8cd98f00b204e9800998ecf8427e")))
  }

  // ---- contamination

  test("contamination reports distinct probe hits per doc, matches only") {
    val df = Seq(
      (1L, "the quick brown fox jumps"),
      (2L, "quick brown fox runs far"),
      (3L, "nothing shared here at all")
    ).toDF("doc_id", "text")
    val probes = Seq("the quick brown", "quick brown fox", "quick brown fox") // dup probe
    val out = Dedup.contamination(df, "doc_id", "text", probes, 3)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq == Seq((1L, 2L), (2L, 1L))) // doc 3 absent
  }

  test("contamination normalizes raw probes with the shingle tokenization rule") {
    val df = Seq((1L, "the quick brown fox")).toDF("doc_id", "text")
    // raw benchmark phrase: case + punctuation would never match verbatim
    val out = Dedup.contamination(df, "doc_id", "text", Seq("The QUICK, brown!"), 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq == Seq((1L, 1L)))
  }

  test("contamination: small probe sets run the fully narrow path (no join, no Exchange)") {
    val df = Seq((1L, "a b c d")).toDF("doc_id", "text")
    val plan = Dedup.contamination(df, "doc_id", "text", Seq("a b c"), 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan)
    assert(!plan.contains("Exchange"), plan)
  }

  test("contamination: over-bound probe sets broadcast (never a corpus-wide shuffle join)") {
    val df = Seq((1L, "a b c d")).toDF("doc_id", "text")
    val many = (0 to Dedup.ContaminationLiteralMax).map(i => s"p$i q$i r$i") :+ "a b c"
    val gated = Dedup.contamination(df, "doc_id", "text", many, 3)
    assert(gated.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))
    // both paths agree on the result
    assert(gated.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((1L, 1L)))
  }

  test("contamination: narrow and broadcast paths are value-identical") {
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "quick brown fox runs far away from here"),
      (3L, "nothing shared here at all today friends")
    ).toDF("doc_id", "text")
    val probes = Seq("the quick brown", "quick brown fox", "lazy dog end")
    val narrow = Dedup.contamination(df, "doc_id", "text", probes, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val padded = probes ++ (0 to Dedup.ContaminationLiteralMax).map(i => s"x$i y$i z$i")
    val broad = Dedup.contamination(df, "doc_id", "text", padded, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(narrow == broad)
    assert(narrow == Seq((1L, 2L), (2L, 1L)))
  }

  // ---- canonicalUrl

  private def canon(url: String): String =
    TextStats.canonicalUrl(Seq((1L, url)).toDF("doc_id", "url"), "doc_id", "url")
      .collect().head.getString(1)

  test("canonicalUrl lowercases scheme and host, keeps path case") {
    assert(canon("HTTP://ExAmple.COM/Path") == "http://example.com/Path")
  }

  test("canonicalUrl strips default ports only for the matching scheme") {
    assert(canon("http://a.com:80/x") == "http://a.com/x")
    assert(canon("https://a.com:443/x") == "https://a.com/x")
    assert(canon("http://a.com:443/x") == "http://a.com:443/x")
    assert(canon("http://a.com:8080/x") == "http://a.com:8080/x")
  }

  test("canonicalUrl strips fragment, collapses trailing slashes, roots empty path") {
    assert(canon("http://a.com/x/#frag") == "http://a.com/x")
    assert(canon("http://a.com") == "http://a.com/")
    assert(canon("http://a.com///") == "http://a.com/")
  }

  test("canonicalUrl drops utm_ params and sorts the rest") {
    assert(canon("http://a.com/x?utm_source=t&b=2&a=1") == "http://a.com/x?a=1&b=2")
    assert(canon("http://a.com/x?utm_source=t&utm_medium=u") == "http://a.com/x")
  }

  test("canonicalUrl variants that differ only in case/port/slash/tracking collapse") {
    val raws = Seq(
      "HTTP://A.com:80/x/?utm_source=1&k=v",
      "http://a.COM/x?k=v",
      "http://a.com/x/?k=v&utm_medium=2")
    val out = TextStats.canonicalUrl(
        raws.zipWithIndex.map { case (u, i) => (i.toLong, u) }.toDF("doc_id", "url"),
        "doc_id", "url")
      .select("canon").distinct().collect().map(_.getString(0))
    assert(out.toSeq == Seq("http://a.com/x?k=v"))
  }

  test("hostStats counts docs vs distinct canonical pages per host") {
    val df = Seq(
      (1L, "HTTP://A.com/x?utm_source=1"),
      (2L, "http://a.COM/x"),                // same canonical page as 1
      (3L, "http://a.com/y"),
      (4L, "https://b.com/z")
    ).toDF("doc_id", "url")
    val out = TextStats.hostStats(df, "doc_id", "url").orderBy("host")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq(("a.com", 3L, 2L), ("b.com", 1L, 1L)))
  }

  test("canonicalUrl is shuffle-free (pure projection)") {
    val df = Seq((1L, "http://a.com/x")).toDF("doc_id", "url")
    val plan = TextStats.canonicalUrl(df, "doc_id", "url")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }
}
