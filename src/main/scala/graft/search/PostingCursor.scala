package graft.search

import graft.codec.{Cursor, ForBlock, VByte}
import graft.model.SkipRow

/** Lazy block-decoding iterator over one encoded posting row — the
  * DocsEnum/DocsAndPositionsEnum analog
  * (/root/reference/src/Lucene.Net.Core/Codecs/Lucene41/Lucene41PostingsReader.cs:293,490-548):
  * forward `advance(target)` skips whole 128-doc blocks via the skip entries
  * without decoding them; per-block positions decode lazily and only for
  * blocks actually visited by a positions consumer. Shared by Block-Max WAND
  * (Wand.scala) and the leapfrog conjunction / phrase paths (Leapfrog.scala).
  */
final class PostingCursor(val dfCount: Int, docDeltas: Array[Byte], tfBytes: Array[Byte],
                          lenBytes: Array[Byte], skips: Array[SkipRow],
                          posBytes: Array[Byte] = null) {
  val nFull: Int = dfCount / ForBlock.BlockSize
  private val tailLen = dfCount - nFull * ForBlock.BlockSize
  private val docBuf = new Array[Int](ForBlock.BlockSize)
  private val tfBuf = new Array[Int](ForBlock.BlockSize)
  private val lenBuf = new Array[Int](ForBlock.BlockSize)
  private var blockIdx = -1 // loaded block index (nFull == tail)
  private var blockLen = 0
  private var pos = 0
  var doc: Int = -1
  var exhausted: Boolean = dfCount == 0

  def blockMeta(b: Int): SkipRow = skips(b)
  def hasTail: Boolean = tailLen > 0

  // lens blocks carry no skip offsets (skips index doc/tf/pos streams);
  // compute their byte offsets once by scanning the 1-byte headers
  private lazy val lenOffs: Array[Int] = {
    val offs = new Array[Int](nFull + 1)
    var off = 0
    var b = 0
    while (b < nFull) {
      offs(b) = off
      off += 1 + ((lenBytes(off) & 0xff) * ForBlock.BlockSize + 7) / 8
      b += 1
    }
    offs(nFull) = off // tail start
    offs
  }

  private lazy val (tailDocOff, tailTfOff) = {
    if (nFull == 0) (0, 0)
    else {
      var dOff = 0
      var tOff = 0
      var b = 0
      while (b < nFull) {
        dOff += 1 + ((docDeltas(dOff) & 0xff) * ForBlock.BlockSize + 7) / 8
        tOff += 1 + ((tfBytes(tOff) & 0xff) * ForBlock.BlockSize + 7) / 8
        b += 1
      }
      (dOff, tOff)
    }
  }

  /** (maxTf, minLen) of the vByte tail — decoded lazily once. */
  lazy val tailStats: (Int, Int) = {
    if (tailLen == 0) (0, 1)
    else {
      val (_, ts, ls) = decodeTailArrays()
      (ts.max, ls.min)
    }
  }

  /** Block metadata covering the first doc >= target:
    * (maxTf, minLen, lastDoc); lastDoc = Int.MaxValue for the tail / none.
    */
  def blockMetaFor(target: Int): (Int, Int, Int) = {
    val b = findBlock(math.max(blockIdx, 0), target)
    if (b < nFull) (skips(b).maxTf, skips(b).minLen, skips(b).lastDoc)
    else if (tailLen > 0) (tailStats._1, tailStats._2, Int.MaxValue)
    else (0, 1, Int.MaxValue)
  }

  /** First block index >= `from` whose lastDoc >= target (nFull = tail).
    * Binary search over the in-memory skip array — the O(log df) seek the
    * reference needs MULTI-LEVEL skip lists for (skipMultiplier = 8,
    * Codecs/MultiLevelSkipListWriter.cs:42-43): on-disk skips must be read
    * sequentially per level, while a decoded sorted array bisects directly,
    * so one level + binary search strictly dominates the 8x level tower. */
  private def findBlock(from: Int, target: Int): Int = {
    var lo = from
    var hi = nFull
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (skips(mid).lastDoc < target) lo = mid + 1 else hi = mid
    }
    lo
  }

  private def decodeTailArrays(): (Array[Int], Array[Int], Array[Int]) = {
    val base = if (nFull == 0) 0 else skips(nFull - 1).lastDoc
    val dc = new Cursor(tailDocOff)
    val tc = new Cursor(tailTfOff)
    val lc = new Cursor(lenOffs(nFull))
    val ds = new Array[Int](tailLen)
    val ts = new Array[Int](tailLen)
    val ls = new Array[Int](tailLen)
    var acc = base
    var i = 0
    while (i < tailLen) {
      acc += VByte.readInt(docDeltas, dc)
      ds(i) = acc
      ts(i) = VByte.readInt(tfBytes, tc)
      ls(i) = VByte.readInt(lenBytes, lc)
      i += 1
    }
    (ds, ts, ls)
  }

  private def loadBlock(b: Int): Unit = {
    blockIdx = b
    if (b < nFull) {
      ForBlock.decode(docDeltas, new Cursor(skips(b).docOff), docBuf, 0)
      ForBlock.decode(tfBytes, new Cursor(skips(b).tfOff), tfBuf, 0)
      ForBlock.decode(lenBytes, new Cursor(lenOffs(b)), lenBuf, 0)
      var acc = if (b == 0) 0 else skips(b - 1).lastDoc
      var i = 0
      while (i < ForBlock.BlockSize) { acc += docBuf(i); docBuf(i) = acc; i += 1 }
      blockLen = ForBlock.BlockSize
    } else {
      val (ds, ts, ls) = decodeTailArrays()
      System.arraycopy(ds, 0, docBuf, 0, tailLen)
      System.arraycopy(ts, 0, tfBuf, 0, tailLen)
      System.arraycopy(ls, 0, lenBuf, 0, tailLen)
      blockLen = tailLen
    }
    pos = 0
  }

  def advance(target: Int): Unit = {
    if (exhausted) return
    val b = findBlock(math.max(blockIdx, 0), target)
    if (b >= nFull && tailLen == 0) { exhausted = true; doc = Int.MaxValue; return }
    if (b != blockIdx) loadBlock(b)
    while (pos < blockLen && docBuf(pos) < target) pos += 1
    while (pos >= blockLen) {
      val nb2 = blockIdx + 1
      if (nb2 > nFull || (nb2 == nFull && tailLen == 0)) { exhausted = true; doc = Int.MaxValue; return }
      loadBlock(nb2)
      while (pos < blockLen && docBuf(pos) < target) pos += 1
    }
    doc = docBuf(pos)
  }

  def next(): Unit = advance(if (doc < 0) 0 else doc + 1)

  /** tf / exact field length of the current doc. */
  def tf: Int = tfBuf(pos)
  def len: Int = lenBuf(pos)

  // ------------------------------------------------------------- positions

  // byte offset of the tail's positions: scan the last full block's position
  // bytes once (vByte is not random-access; the skip entry gives the start)
  private lazy val tailPosOff: Int = {
    if (nFull == 0) 0
    else {
      val t = new Array[Int](ForBlock.BlockSize)
      ForBlock.decode(tfBytes, new Cursor(skips(nFull - 1).tfOff), t, 0)
      var count = 0
      var i = 0
      while (i < ForBlock.BlockSize) { count += t(i); i += 1 }
      val pc = new Cursor(skips(nFull - 1).posOff)
      i = 0
      while (i < count) { VByte.readInt(posBytes, pc); i += 1 }
      pc.pos
    }
  }

  private var posBlockIdx = -1
  private var posFlat: Array[Int] = null
  private var posStarts: Array[Int] = null

  private def decodeBlockPositions(): Unit = {
    val off = if (blockIdx < nFull) skips(blockIdx).posOff else tailPosOff
    posStarts = new Array[Int](blockLen + 1)
    var i = 0
    while (i < blockLen) { posStarts(i + 1) = posStarts(i) + tfBuf(i); i += 1 }
    posFlat = new Array[Int](posStarts(blockLen))
    val pc = new Cursor(off)
    i = 0
    while (i < blockLen) {
      var prev = 0
      var j = posStarts(i)
      while (j < posStarts(i + 1)) {
        prev += VByte.readInt(posBytes, pc)
        posFlat(j) = prev
        j += 1
      }
      i += 1
    }
    posBlockIdx = blockIdx
  }

  /** Ascending positions of the current doc — decodes the containing block's
    * position stream lazily (once per visited block). Requires posBytes.
    */
  def positions(): Array[Int] = {
    if (posBlockIdx != blockIdx) decodeBlockPositions()
    java.util.Arrays.copyOfRange(posFlat, posStarts(pos), posStarts(pos + 1))
  }
}

/** One Boolean/phrase clause over several underlying posting cursors: piece
  * rows of one term (disjoint docId ranges, MergeJob hot-term handling) or a
  * multi-phrase slot's alternative terms (overlapping ranges — a doc may
  * match several alternatives at once); the clause cursor unions them.
  */
final class ClauseCursor(pieces: Array[PostingCursor]) {
  var doc: Int = -1
  var exhausted: Boolean = pieces.forall(_.exhausted)
  private var cur: Int = -1

  /** Total df across pieces — the Cost() analog for leapfrog lead order. */
  val cost: Long = pieces.map(_.dfCount.toLong).sum

  def advance(target: Int): Unit = {
    var best = Int.MaxValue
    var bi = -1
    var i = 0
    while (i < pieces.length) {
      val p = pieces(i)
      if (!p.exhausted && p.doc < target) p.advance(target)
      if (!p.exhausted && p.doc < best) { best = p.doc; bi = i }
      i += 1
    }
    cur = bi
    if (bi < 0) { exhausted = true; doc = Int.MaxValue }
    else doc = best
  }

  def next(): Unit = advance(if (doc < 0) 0 else doc + 1)

  def tf: Int = pieces(cur).tf
  def len: Int = pieces(cur).len
  def positions(): Array[Int] = pieces(cur).positions()

  /** Ascending positions of the current doc merged across ALL pieces sitting
    * on it (MultiPhraseQuery slot semantics: several alternatives may occur
    * in one doc; their position lists concatenate, duplicates kept).
    */
  def positionsMerged(): Array[Int] = {
    val arrs = pieces.filter(p => !p.exhausted && p.doc == doc).map(_.positions())
    if (arrs.length == 1) arrs(0)
    else {
      val m = arrs.flatten
      java.util.Arrays.sort(m)
      m
    }
  }
}
