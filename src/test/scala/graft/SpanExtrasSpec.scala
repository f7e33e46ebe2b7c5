package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.build.IndexBuilder
import graft.search._
import graft.analysis.DelimitedPayloadAnalyzer.encodeInt
import java.nio.file.Files

/** FieldMaskingSpanQuery + SpanPayloadCheckQuery/SpanNearPayloadCheckQuery —
  * the last two members of the Search/Spans family
  * (Search/Spans/FieldMaskingSpanQuery.cs, SpanPayloadCheckQuery.cs,
  * SpanNearPayloadCheckQuery.cs). */
class SpanExtrasSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import SpanMatcher._

  // ------------------------------------------------------------ matcher unit

  /** The reference class doc's denormalized teacher example: teacher 1 has
    * (james, jones) aligned; teacher 2 has james@0/jones@1 in DIFFERENT
    * child rows (first: james@0 sally@1; surname: smith@0 jones@1). */
  private def teacherPos(t: Int): PosLookup = (f, term) => (f, term, t) match {
    case ("first", "james", 1) => Array(0)
    case ("surname", "jones", 1) => Array(0)
    case ("first", "james", 2) => Array(0)
    case ("first", "sally", 2) => Array(1)
    case ("surname", "smith", 2) => Array(0)
    case ("surname", "jones", 2) => Array(1)
    case _ => NoPositions
  }

  private val maskedJamesJones = SpanNearS(List(
    SpanTermS("james"),
    SpanFieldMaskS(SpanTermS("jones"), "surname")), slop = -1, inOrder = false)

  test("field mask: the reference's james/jones example matches teacher 1 only") {
    assert(pspans(maskedJamesJones, "first", teacherPos(1), NoPayloads).nonEmpty)
    assert(pspans(maskedJamesJones, "first", teacherPos(2), NoPayloads).isEmpty)
    // without the mask, 'jones' never appears in the first field -> no match
    val unmasked = SpanNearS(List(SpanTermS("james"), SpanTermS("jones")), -1, inOrder = false)
    assert(pspans(unmasked, "first", teacherPos(1), NoPayloads).isEmpty)
  }

  test("field mask: qualified terms resolve to the real field; single-field wrapper is transparent") {
    assert(fieldTermsOf(maskedJamesJones, "first") ==
      Set("first" -> "james", "surname" -> "jones"))
    assert(termsOf(maskedJamesJones) == Set("james", "jones"))
    // single-field map (oracle engines): mask is transparent, both terms
    // resolve against the one positions map
    assert(SpanMatcher.matches(maskedJamesJones,
      Map("james" -> Array(3), "jones" -> Array(3))))
  }

  private def payOf(m: Map[(String, Int), Array[Byte]]): PayLookup =
    (f, t, p) => m.getOrElse((t, p), null)

  test("SpanPayloadCheck: exact ordered byte equality; payload-less spans pass") {
    val pos: PosLookup = (_, t) => if (t == "a") Array(0, 5) else NoPositions
    val pay = payOf(Map(("a", 0) -> encodeInt(7))) // a@5 carries NO payload
    // expected [7]: a@0 passes (payload equal), a@5 passes (no payload -> YES)
    assert(pspans(SpanPayloadCheckS(SpanTermS("a"), List(encodeInt(7))), "f", pos, pay)
      .map(s => (s.start, s.end)) == List((0, 1), (5, 6)))
    // expected [8]: a@0 fails (bytes differ), a@5 still passes
    assert(pspans(SpanPayloadCheckS(SpanTermS("a"), List(encodeInt(8))), "f", pos, pay)
      .map(_.start) == List(5))
    // count mismatch: expected 2 payloads vs collected 1 -> only payload-less survives
    assert(pspans(SpanPayloadCheckS(SpanTermS("a"),
      List(encodeInt(7), encodeInt(7))), "f", pos, pay).map(_.start) == List(5))
    // SpanNearQuery directly inside is rejected like the reference ctor
    intercept[IllegalArgumentException] {
      SpanPayloadCheckS(SpanNearS(List(SpanTermS("a")), 0, inOrder = true), Nil)
    }
  }

  test("SpanNearPayloadCheck: unordered containment; payload-less spans REJECTED") {
    val pos: PosLookup = (_, t) =>
      if (t == "a") Array(0) else if (t == "b") Array(1) else NoPositions
    val near = SpanNearS(List(SpanTermS("a"), SpanTermS("b")), 0, inOrder = true)
    val pay = payOf(Map(("a", 0) -> encodeInt(4), ("b", 1) -> encodeInt(9)))
    // collected [4, 9]; expected in the OTHER order still matches (unordered)
    assert(pspans(SpanNearPayloadCheckS(near, List(encodeInt(9), encodeInt(4))),
      "f", pos, pay).nonEmpty)
    // the ordered variant would reject that order
    assert(pspans(SpanPayloadCheckS(SpanOrS(List(near)), // not SpanNearS directly
      List(encodeInt(9), encodeInt(4))), "f", pos, pay).isEmpty)
    assert(pspans(SpanNearPayloadCheckS(near, List(encodeInt(4), encodeInt(9))),
      "f", pos, pay).nonEmpty)
    // one byte off -> no match
    assert(pspans(SpanNearPayloadCheckS(near, List(encodeInt(4), encodeInt(8))),
      "f", pos, pay).isEmpty)
    // payload-less near span: AcceptPosition falls through to NO
    assert(pspans(SpanNearPayloadCheckS(near, List(encodeInt(4), encodeInt(9))),
      "f", pos, NoPayloads).isEmpty)
  }

  // ------------------------------------------------------- engine end-to-end

  private val N = 400
  private lazy val maskIdx = {
    val base = Files.createTempDirectory("graftmask").toString
    import spark.implicits._
    val df = (0 until N).map { id =>
      (f"doc$id%05d", s"a${id % 4} b${(id + 2) % 5}", s"s${id % 3} t${(id + 1) % 4}")
    }.toDF("url", "text", "surname")
    IndexBuilder.build(spark, df, base,
      IndexBuilder.BuildConfig(2, "simple", groupSize = 4,
        extraFields = Seq("surname" -> "simple")))
    base
  }
  private lazy val maskSe = new Searcher(spark, maskIdx)

  private def ids(se: Searcher, q: Query): Set[Int] =
    se.search(q, N + 1).collect().map(r => r.getString(0).drop(3).toInt).toSet

  test("engine: masked position-aligned AND equals the analytic expectation") {
    val q = SpanMatchQ(SpanNearS(List(
      SpanTermS("b1"),
      SpanFieldMaskS(SpanTermS("t2"), "surname")), slop = -1, inOrder = false))
    val expected = (0 until N).filter(id => (id + 2) % 5 == 1 && (id + 1) % 4 == 2).toSet
    assert(expected.nonEmpty)
    assert(ids(maskSe, q) == expected)
  }

  test("engine: ordered cross-field near respects positions across fields") {
    // surname s1@0 then text b3@1, ordered slop 0
    val q = SpanMatchQ(SpanNearS(List(
      SpanFieldMaskS(SpanTermS("s1"), "surname"),
      SpanTermS("b3")), slop = 0, inOrder = true))
    val expected = (0 until N).filter(id => id % 3 == 1 && (id + 2) % 5 == 3).toSet
    assert(expected.nonEmpty)
    assert(ids(maskSe, q) == expected)
  }

  test("engine: masked SpanScore explain equals the compile score") {
    val q = SpanScoreQ(SpanNearS(List(
      SpanTermS("b1"),
      SpanFieldMaskS(SpanTermS("t2"), "surname")), slop = -1, inOrder = false))
    val hits = maskSe.compile(q).collect()
    assert(hits.nonEmpty)
    hits.take(5).foreach { h =>
      val e = maskSe.explain(q, h.segmentId, h.docId)
      assert(e.matched && math.abs(e.value - h.score) < 1e-12,
        s"explain ${e.value} vs score ${h.score}")
    }
  }

  test("randomized masked span trees equal a brute-force two-field evaluation") {
    import scala.util.Random
    val rnd = new Random(20260818)
    // per-doc token streams of both fixture fields (positions = indexes)
    def toksOf(id: Int): Map[String, Array[String]] = Map(
      "text" -> Array(s"a${id % 4}", s"b${(id + 2) % 5}"),
      "surname" -> Array(s"s${id % 3}", s"t${(id + 1) % 4}"))
    val vocab: Map[String, IndexedSeq[String]] = Map(
      "text" -> ((0 until 4).map(i => s"a$i") ++ (0 until 5).map(i => s"b$i")),
      "surname" -> ((0 until 3).map(i => s"s$i") ++ (0 until 4).map(i => s"t$i")))
    def randTree(depth: Int, field: String): SpanQ =
      if (depth == 0 || rnd.nextInt(3) == 0)
        rnd.nextInt(4) match {
          case 0 | 1 => SpanTermS(vocab(field)(rnd.nextInt(vocab(field).size)))
          case 2 =>
            val f2 = if (field == "text") "surname" else "text"
            SpanFieldMaskS(SpanTermS(vocab(f2)(rnd.nextInt(vocab(f2).size))), f2)
          case 3 => SpanOrS(List(
            SpanTermS(vocab(field)(rnd.nextInt(vocab(field).size))),
            SpanTermS(vocab(field)(rnd.nextInt(vocab(field).size)))))
        }
      else rnd.nextInt(3) match {
        case 0 => SpanNearS(List(randTree(depth - 1, field), randTree(depth - 1, field)),
          rnd.nextInt(3) - 1, inOrder = rnd.nextBoolean())
        case 1 => SpanNotS(randTree(depth - 1, field), randTree(depth - 1, field))
        case 2 => SpanPosRangeS(randTree(depth - 1, field), 0, 1 + rnd.nextInt(2))
      }
    def brutePos(id: Int): SpanMatcher.PosLookup = (f, t) =>
      toksOf(id).get(f).map(_.zipWithIndex.filter(_._1 == t).map(_._2))
        .getOrElse(SpanMatcher.NoPositions)
    var nonEmpty = 0
    (0 until 60).foreach { i =>
      val tree = randTree(2, "text")
      val got = ids(maskSe, SpanMatchQ(tree))
      val want = (0 until N).filter(id =>
        SpanMatcher.pspans(tree, "text", brutePos(id), SpanMatcher.NoPayloads).nonEmpty).toSet
      assert(got == want, s"tree #$i mismatch: $tree")
      if (want.nonEmpty) nonEmpty += 1
    }
    assert(nonEmpty > 25, s"generator too weak: $nonEmpty non-empty")
  }

  private lazy val payIdx = {
    val base = Files.createTempDirectory("graftpaycheck").toString
    import spark.implicits._
    // alpha@0 carries id%5; bare@1 carries NO payload; beta@2 carries id%3
    val df = (0 until N).map { id =>
      (f"doc$id%05d", s"alpha|${id % 5} bare beta|${id % 3}")
    }.toDF("url", "text")
    IndexBuilder.build(spark, df, base,
      IndexBuilder.BuildConfig(2, "delimited_payload", groupSize = 4))
    base
  }
  private lazy val paySe = new Searcher(spark, payIdx)

  test("engine: SpanPayloadCheck filters by payload; payload-less term always passes") {
    val q = SpanMatchQ(SpanPayloadCheckS(SpanTermS("alpha"), List(encodeInt(2))))
    assert(ids(paySe, q) == (0 until N).filter(_ % 5 == 2).toSet)
    // 'bare' has no payload stream entry -> the AcceptPosition YES quirk
    val qb = SpanMatchQ(SpanPayloadCheckS(SpanTermS("bare"), List(encodeInt(99))))
    assert(ids(paySe, qb) == (0 until N).toSet)
    // explain agrees on a matching and a non-matching doc
    val hit = paySe.compile(q).collect().head
    assert(paySe.explain(q, hit.segmentId, hit.docId).matched)
  }

  test("engine: PayloadNearQuery = span score x payload function") {
    val near = SpanNearS(List(SpanTermS("alpha"), SpanTermS("beta")), 1, inOrder = true)
    def scores(fn: String): Map[Int, Double] =
      paySe.compile(PayloadNearQ(near, fn))
        .join(paySe.docs.select("segmentId", "docId", "url"), Seq("segmentId", "docId"))
        .select("url", "score").collect()
        .map(r => r.getString(0).drop(3).toInt -> r.getDouble(1)).toMap
    val span = scores("avg") // payloads [id%5, id%3]
    assert(span.keySet == (0 until N).toSet)
    // the span-weight factor C is constant across the fixture (equal dfs and
    // field lengths): scores must be proportional to the payload aggregate
    // (avg of [0, 0] is 0.0 — payloadsSeen = 2, NOT the no-payload default)
    val base = span.collectFirst { case (id, s) if (id % 5 + id % 3) > 0 => s * 2 / (id % 5 + id % 3) }.get
    (0 until N).foreach { id =>
      val want = base * (id % 5 + id % 3) / 2.0
      assert(math.abs(span(id) - want) < 1e-9 * math.max(1.0, math.abs(want)),
        s"doc $id: ${span(id)} vs $want")
    }
    val mx = scores("max"); val mn = scores("min")
    (0 until N).foreach { id =>
      assert(mx(id) + 1e-12 >= span(id) && span(id) + 1e-12 >= mn(id))
      assert(math.abs(mx(id) - base * math.max(id % 5, id % 3)) < 1e-9 * math.max(1.0, mx(id)))
    }
    // explain equals compile
    val h = paySe.compile(PayloadNearQ(near, "avg")).collect().maxBy(_.score)
    val e = paySe.explain(PayloadNearQ(near, "avg"), h.segmentId, h.docId)
    assert(e.matched && math.abs(e.value - h.score) < 1e-12)
  }

  test("engine: PayloadSpanUtil gathers the payload set of standard queries") {
    import graft.analysis.DelimitedPayloadAnalyzer.decodeInt
    // phrase "alpha beta"~2 converts to an unordered SpanNear (slop != 0);
    // 'bare' matches but carries no payloads
    val q = BoolQ(List(
      Occur.Should -> PhraseQ(List("alpha" -> 0, "beta" -> 1), slop = 2),
      Occur.Should -> TermQ("bare")))
    val rows = PayloadSpanUtil.payloadsForQuery(paySe, q)
      .join(paySe.docs.select("segmentId", "docId", "url"), Seq("segmentId", "docId"))
      .select("url", "payload").collect()
      .map(r => r.getString(0).drop(3).toInt -> decodeInt(r.getAs[Array[Byte]](1), 0))
      .groupBy(_._1).map { case (id, vs) => id -> vs.map(_._2).toSet }
    assert(rows.keySet == (0 until N).toSet)
    (0 until N).foreach { id =>
      assert(rows(id) == Set(id % 5, id % 3), s"doc $id")
    }
    // prohibited clauses contribute nothing (GetPayloadsForQuery skips them)
    val qNot = BoolQ(List(Occur.Must -> TermQ("bare"), Occur.MustNot -> TermQ("alpha")))
    assert(PayloadSpanUtil.payloadsForQuery(paySe, qNot).count() == 0)
  }

  test("engine: SpanNearPayloadCheck gathers sub-span payloads unordered") {
    // near (alpha, beta) slop 1 (bare sits between them), payloads {id%5, id%3}
    val near = SpanNearS(List(SpanTermS("alpha"), SpanTermS("beta")), 1, inOrder = true)
    val q = SpanMatchQ(SpanNearPayloadCheckS(near, List(encodeInt(1), encodeInt(4))))
    val expected = (0 until N).filter(id =>
      Set(id % 5, id % 3) == Set(1, 4) ||
        (id % 5 == 1 && id % 3 == 1) || (id % 5 == 4 && id % 3 == 4)).toSet
    // quirky containment count: each collected must equal SOME expected
    val expectedRef = (0 until N).filter(id =>
      Seq(id % 5, id % 3).forall(v => v == 1 || v == 4)).toSet
    assert(expected == expectedRef)
    assert(ids(paySe, q) == expectedRef)
    // near through a payload-less-only tree never matches
    val qn = SpanMatchQ(SpanNearPayloadCheckS(
      SpanNearS(List(SpanTermS("bare")), 0, inOrder = true), List(encodeInt(1))))
    assert(ids(paySe, qn).isEmpty)
  }
}
