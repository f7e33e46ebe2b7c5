package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.codec._
import scala.util.Random

/** Round-trip + property tests for the codec layer (seeded randoms — the
  * randomized analog of the reference's RandomIndexWriter strategy).
  */
class CodecSpec extends AnyFunSuite {

  test("vbyte round-trip ints") {
    val rnd = new Random(42)
    (0 until 50).foreach { _ =>
      val xs = List.fill(rnd.nextInt(200))(rnd.nextInt(Int.MaxValue))
      val out = new ByteBuf()
      xs.foreach(VByte.writeInt(out, _))
      val buf = out.toArray
      val c = new Cursor(0)
      assert(xs.map(_ => VByte.readInt(buf, c)) == xs)
      assert(c.pos == buf.length)
    }
  }

  test("vbyte round-trip longs") {
    val rnd = new Random(43)
    (0 until 50).foreach { _ =>
      val xs = List.fill(rnd.nextInt(200))(rnd.nextLong().abs.max(0L))
      val out = new ByteBuf()
      xs.foreach(VByte.writeLong(out, _))
      val buf = out.toArray
      val c = new Cursor(0)
      assert(xs.map(_ => VByte.readLong(buf, c)) == xs)
    }
  }

  test("FOR block round-trip at all bit widths") {
    val rnd = new Random(44)
    (0 to 31).foreach { bits =>
      val bound = if (bits == 0) 1 else 1L << bits
      val block = Array.fill(128)((rnd.nextLong().abs % bound).toInt)
      val out = new ByteBuf()
      ForBlock.encode(block, 0, out)
      val dst = new Array[Int](128)
      ForBlock.decode(out.toArray, new Cursor(0), dst, 0)
      assert(dst.toSeq == block.toSeq, s"bits=$bits")
    }
    // negative-free full-range ints
    val block = Array.fill(128)(new Random(7).nextInt(Int.MaxValue))
    val out = new ByteBuf()
    ForBlock.encode(block, 0, out)
    val dst = new Array[Int](128)
    ForBlock.decode(out.toArray, new Cursor(0), dst, 0)
    assert(dst.toSeq == block.toSeq)
  }

  test("FOR block of zeros takes 1 byte") {
    val out = new ByteBuf()
    ForBlock.encode(new Array[Int](128), 0, out)
    assert(out.size == 1)
  }

  test("byte315 reference values") {
    // spot values from the reference docs (SmallFloat.cs:88-92)
    assert(SmallFloat.byte315ToFloat(1) == 5.820766e-10f)
    assert(SmallFloat.byte315ToFloat(-1) == 7.5161928e9f)
    assert(SmallFloat.byte315ToFloat(0) == 0.0f)
    assert(SmallFloat.floatToByte315(0f) == 0)
  }

  test("byte315 encode.decode.encode == encode") {
    val rnd = new Random(45)
    (0 until 1000).foreach { _ =>
      val f = rnd.nextFloat() * 100f
      val b = SmallFloat.floatToByte315(f)
      assert(SmallFloat.floatToByte315(SmallFloat.byte315ToFloat(b)) == b)
    }
  }

  test("postings encoder/decoder round-trip incl. positions, norms, skips") {
    val rnd = new Random(46)
    (0 until 30).foreach { _ =>
      val n = 1 + rnd.nextInt(400)
      var docId = -1
      val entries = (0 until n).map { _ =>
        docId += 1 + rnd.nextInt(50)
        val tf = 1 + rnd.nextInt(5)
        var p = -1
        val positions = Array.fill(tf) { p += 1 + rnd.nextInt(10); p }
        val len = 1 + rnd.nextInt(2000)
        (docId, tf, positions, len)
      }
      val enc = new PostingsCodec.Encoder
      entries.foreach { case (d, tf, ps, len) => enc.add(d, tf, ps, len) }
      val e = enc.finish()
      assert(e.df == n)
      assert(e.ttf == entries.map(_._2.toLong).sum)
      val d = PostingsCodec.decode(e.df, e.docDeltas, e.tfs, e.positions, e.lens)
      assert(d.docIds.toSeq == entries.map(_._1))
      assert(d.tfs.toSeq == entries.map(_._2))
      entries.zipWithIndex.foreach { case ((_, _, ps, len), i) =>
        assert(d.posFlat.slice(d.posStart(i), d.posStart(i + 1)).toSeq == ps.toSeq)
        assert(d.lens(i) == len)
      }
      val fullBlocks = n / 128
      assert(e.skips.length == fullBlocks)
      e.skips.zipWithIndex.foreach { case (sk, b) =>
        assert(sk.cumDocs == b * 128)
        assert(sk.lastDoc == entries((b + 1) * 128 - 1)._1)
        assert(sk.maxTf == entries.slice(b * 128, (b + 1) * 128).map(_._2).max)
      }
    }
  }

  test("multi-million-entry posting list round-trip (Test2BPostings-style stress, scaled)") {
    // 5M docs, block count ~39k — exercises offset arithmetic far past any
    // small-index paths (the scaled analog of core/Index/Test2BPostings.cs)
    val n = 5000000
    val enc = new PostingsCodec.Encoder
    var doc = 0
    var i = 0
    while (i < n) {
      doc += 1 + (i % 7)
      enc.add(doc, 1 + (i % 3), if (i % 3 == 0) Array(i % 1000) else Array(i % 1000, i % 1000 + 5), 100 + (i % 900))
      i += 1
    }
    val e = enc.finish()
    assert(e.df == n)
    assert(e.skips.length == n / 128)
    val (docIds, tfs, lens) = PostingsCodec.decodeDocs(e.df, e.docDeltas, e.tfs, e.lens)
    assert(docIds.length == n)
    var j = 0
    var prev = 0
    var ok = true
    while (j < n && ok) {
      ok = docIds(j) > prev && tfs(j) >= 1 && lens(j) >= 100
      prev = docIds(j)
      j += 1
    }
    assert(ok, s"invariant broke near index ${j - 1}")
    // spot-check skip entries deep into the list
    val sk = e.skips(e.skips.length / 2)
    assert(sk.cumDocs == (e.skips.length / 2) * 128)
    assert(sk.lastDoc == docIds(sk.cumDocs + 127))
  }

  test("bm25 norm table matches the reference construction") {
    val bm = graft.search.Bm25.default
    (1 until 256).foreach { i =>
      val f = SmallFloat.byte315ToFloat(i.toByte)
      assert(bm.normTable(i) == 1.0f / (f * f))
    }
    assert(bm.normTable(0) == Float.PositiveInfinity)
  }

  test("bm25 idf/avgdl/score shapes") {
    val bm = graft.search.Bm25.default
    assert(bm.idf(1, 100) > bm.idf(50, 100))
    assert(bm.avgFieldLength(0, 10) == 1f)
    assert(bm.avgFieldLength(1000, 10) == 100f)
    val w = bm.termWeight(10, 1000, 50000)
    val shortDoc = bm.encodeNormValue(1f, 10)
    val longDoc = bm.encodeNormValue(1f, 1000)
    assert(w.score(2f, shortDoc) > w.score(2f, longDoc))
    assert(w.score(5f, shortDoc) > w.score(1f, shortDoc))
  }

  test("PostingCursor.advance bisects skip blocks (multi-level-skip equivalent)") {
    // 200k docs (>1500 blocks): random forward advances must land on the
    // first docId >= target, identical to a reference linear-scan walk
    val rnd = new Random(77)
    val enc = new PostingsCodec.Encoder
    val docIds = new Array[Int](200000)
    var acc = -1
    var i = 0
    while (i < docIds.length) {
      acc += 1 + rnd.nextInt(5)
      docIds(i) = acc
      enc.add(acc, 1 + (i % 3), Array(i % 7), 10 + (i % 50))
      i += 1
    }
    val e = enc.finish()
    val skips = e.skips.map(s => graft.model.SkipRow(s.lastDoc, s.docOff,
      s.tfOff, s.posOff, s.cumDocs, s.maxTf, s.minLen))
    val c = new graft.search.PostingCursor(e.df, e.docDeltas, e.tfs, e.lens,
      skips, e.positions)
    var target = 0
    while (target <= acc) {
      c.advance(target)
      // expected: first docId >= target
      val idx = {
        val k = java.util.Arrays.binarySearch(docIds, target)
        if (k >= 0) k else -k - 1
      }
      assert(c.doc == docIds(idx), s"advance($target)")
      assert(c.tf == 1 + (idx % 3) && c.len == 10 + (idx % 50))
      target = c.doc + 1 + rnd.nextInt(4000) // mix of near and far jumps
    }
    c.advance(acc + 1)
    assert(c.exhausted)
  }
}
