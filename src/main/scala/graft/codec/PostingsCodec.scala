package graft.codec

/** One decoded posting list: parallel arrays in docId order. */
final case class DecodedPostings(
    docIds: Array[Int],
    tfs: Array[Int],
    /** Flat positions; doc i's positions are posFlat[posStart(i) until posStart(i+1)). */
    posFlat: Array[Int],
    posStart: Array[Int],
    /** Exact field length per doc (same order as docIds) — denormalized so
      * scoring needs no join against the docs table. The Lucene-compatible
      * norm byte is derived on the fly (byte315(1/sqrt(len))); the exact
      * length also enables unquantized double-precision scoring. */
    lens: Array[Int])

/** Per-128-doc-block skip entry — the analog of the reference's multi-level
  * skip list (/root/reference/src/Lucene.Net.Core/Codecs/Lucene41/Lucene41SkipWriter.cs:25-68)
  * plus the block-max metadata (maxTf, minLen) that drives Block-Max WAND
  * pruning (our addition; Lucene 4.8 has skips only).
  */
final case class SkipEntry(lastDoc: Int, docOff: Int, tfOff: Int, posOff: Int,
                           cumDocs: Int, maxTf: Int, minLen: Int)

/** Encoded posting list payload for one (segment, term). */
final case class EncodedPostings(
    df: Int, ttf: Long,
    docDeltas: Array[Byte], tfs: Array[Byte], positions: Array[Byte],
    lens: Array[Byte], skips: Array[SkipEntry],
    /** Optional per-position payload stream (the .pay file analog,
      * Lucene41PostingsWriter.cs:497-566 payload variants): one
      * vByte(len)+bytes frame per position, in position-stream order;
      * null when the field carries no payloads. */
    payloads: Array[Byte] = null,
    /** Optional per-position character-offset stream — the
      * IndexOptions.DOCS_AND_FREQS_AND_POSITIONS_AND_OFFSETS variant
      * (Lucene41PostingsWriter.cs:497-566 offset branch; the reference
      * interleaves offsets with payloads in the .pay file): per position,
      * vByte(startOffset delta from the doc's previous startOffset) +
      * vByte(endOffset - startOffset). null when offsets are not indexed. */
    offsets: Array[Byte] = null)

/** Posting-list block codec, semantics-equivalent to the reference's
  * Lucene41PostingsWriter/Reader
  * (/root/reference/src/Lucene.Net.Core/Codecs/Lucene41/Lucene41PostingsWriter.cs:289-405:
  * 128-wide FOR blocks of doc-deltas and tfs, vByte tail; position-deltas per
  * doc). The exact byte format is our own — we match rank/semantics identity,
  * not Lucene's on-disk bytes. Field lengths ride along as a third FOR-blocked
  * stream (replacing Lucene's separate .nvd norms file).
  */
object PostingsCodec {
  import ForBlock.BlockSize

  /** Streaming encoder: feed docs in strictly increasing docId order. */
  final class Encoder {
    private val docBuf = new Array[Int](BlockSize)
    private val tfBuf = new Array[Int](BlockSize)
    private val lenBuf = new Array[Int](BlockSize)
    private var inBlock = 0
    private var lastDocId = 0
    private var df = 0
    private var ttf = 0L
    private val docOut = new ByteBuf(256)
    private val tfOut = new ByteBuf(128)
    private val posOut = new ByteBuf(256)
    private val lenOut = new ByteBuf(128)
    private val skips = scala.collection.mutable.ArrayBuffer.empty[SkipEntry]
    private var payOut: ByteBuf = null // created lazily on first payload
    private var offOut: ByteBuf = null // created on the first doc when offsets are indexed
    private var blockMaxTf = 0
    private var blockMinLen = Int.MaxValue
    private var blockDocOff = 0
    private var blockTfOff = 0
    private var blockPosOff = 0

    def add(docId: Int, tf: Int, positions: Array[Int], fieldLen: Int): Unit =
      add(docId, tf, positions, fieldLen, null, null)

    def add(docId: Int, tf: Int, positions: Array[Int], fieldLen: Int,
            payloads: Array[Array[Byte]]): Unit =
      add(docId, tf, positions, fieldLen, payloads, null)

    /** Payload/offset-carrying variant: `payloads(i)` aligns with
      * `positions(i)` (null entry = no payload at that position); `offsets`
      * is a flat [s0,e0,s1,e1,...] character-offset array of length 2*tf
      * (null = offsets not indexed). Once any doc of the list carries a
      * stream, every later position is framed so the stream stays aligned;
      * a list that MIXES offset-carrying and offset-less docs is rejected
      * (offsets are a per-field index option, not per-doc). */
    def add(docId: Int, tf: Int, positions: Array[Int], fieldLen: Int,
            payloads: Array[Array[Byte]], offsets: Array[Int]): Unit = {
      require(df == 0 || docId > lastDocId, s"docIds must be strictly increasing: $docId after $lastDocId")
      if (inBlock == 0) {
        blockDocOff = docOut.size; blockTfOff = tfOut.size; blockPosOff = posOut.size
        blockMaxTf = 0; blockMinLen = Int.MaxValue
      }
      docBuf(inBlock) = docId - lastDocId
      tfBuf(inBlock) = tf
      lenBuf(inBlock) = fieldLen
      lastDocId = docId
      inBlock += 1
      df += 1
      ttf += tf
      if (tf > blockMaxTf) blockMaxTf = tf
      if (fieldLen < blockMinLen) blockMinLen = fieldLen
      // positions: delta-encoded vbyte within the doc
      var prev = 0
      var i = 0
      while (i < positions.length) {
        VByte.writeInt(posOut, positions(i) - prev)
        prev = positions(i)
        i += 1
      }
      if (payloads != null && payOut == null && payloads.exists(_ != null)) {
        // first payload seen: back-fill empty frames for all prior positions
        payOut = new ByteBuf(256)
        var k = 0L
        while (k < ttf - tf) { VByte.writeInt(payOut, 0); k += 1 }
      }
      if (payOut != null) {
        var j = 0
        while (j < positions.length) {
          val pl = if (payloads == null) null else payloads(j)
          if (pl == null) VByte.writeInt(payOut, 0)
          else { VByte.writeInt(payOut, pl.length); payOut.write(pl) }
          j += 1
        }
      }
      if (offsets != null) {
        require(offOut != null || df == 1,
          "offset stream must start at the first doc (per-field index option)")
        if (offOut == null) offOut = new ByteBuf(256)
        var prevStart = 0
        var j = 0
        while (j < tf) {
          val s = offsets(2 * j)
          val e = offsets(2 * j + 1)
          VByte.writeInt(offOut, s - prevStart)
          VByte.writeInt(offOut, e - s)
          prevStart = s
          j += 1
        }
      } else require(offOut == null,
        "offset stream cannot stop mid-list (per-field index option)")
      if (inBlock == BlockSize) flushBlock()
    }

    private def flushBlock(): Unit = {
      ForBlock.encode(docBuf, 0, docOut)
      ForBlock.encode(tfBuf, 0, tfOut)
      ForBlock.encode(lenBuf, 0, lenOut)
      skips += SkipEntry(lastDocId, blockDocOff, blockTfOff, blockPosOff,
        df - BlockSize, blockMaxTf, blockMinLen)
      inBlock = 0
    }

    def finish(): EncodedPostings = {
      // vByte tail for the remainder (< 128 entries), Lucene41PostingsWriter.cs:454-479 analog
      var i = 0
      while (i < inBlock) {
        VByte.writeInt(docOut, docBuf(i))
        VByte.writeInt(tfOut, tfBuf(i))
        VByte.writeInt(lenOut, lenBuf(i))
        i += 1
      }
      EncodedPostings(df, ttf, docOut.toArray, tfOut.toArray, posOut.toArray,
        lenOut.toArray, skips.toArray,
        if (payOut == null) null else payOut.toArray,
        if (offOut == null) null else offOut.toArray)
    }
  }

  /** Positions-free decode for scoring-only paths (docIds, tfs, lens) —
    * lets the Parquet scan skip the positions column entirely. */
  def decodeDocs(df: Int, docDeltas: Array[Byte], tfBytes: Array[Byte],
                 lenBytes: Array[Byte]): (Array[Int], Array[Int], Array[Int]) = {
    val docIds = new Array[Int](df)
    val tfs = new Array[Int](df)
    val lens = new Array[Int](df)
    val fullBlocks = df / BlockSize
    val dc = new Cursor(0)
    val tc = new Cursor(0)
    val lc = new Cursor(0)
    var b = 0
    while (b < fullBlocks) {
      ForBlock.decode(docDeltas, dc, docIds, b * BlockSize)
      ForBlock.decode(tfBytes, tc, tfs, b * BlockSize)
      ForBlock.decode(lenBytes, lc, lens, b * BlockSize)
      b += 1
    }
    var i = fullBlocks * BlockSize
    while (i < df) {
      docIds(i) = VByte.readInt(docDeltas, dc)
      tfs(i) = VByte.readInt(tfBytes, tc)
      lens(i) = VByte.readInt(lenBytes, lc)
      i += 1
    }
    var acc = 0
    i = 0
    while (i < df) { acc += docIds(i); docIds(i) = acc; i += 1 }
    (docIds, tfs, lens)
  }

  def decode(df: Int, docDeltas: Array[Byte], tfBytes: Array[Byte],
             positions: Array[Byte], lenBytes: Array[Byte]): DecodedPostings = {
    val docIds = new Array[Int](df)
    val tfs = new Array[Int](df)
    val lens = new Array[Int](df)
    val fullBlocks = df / BlockSize
    val dc = new Cursor(0)
    val tc = new Cursor(0)
    val lc = new Cursor(0)
    var b = 0
    while (b < fullBlocks) {
      ForBlock.decode(docDeltas, dc, docIds, b * BlockSize)
      ForBlock.decode(tfBytes, tc, tfs, b * BlockSize)
      ForBlock.decode(lenBytes, lc, lens, b * BlockSize)
      b += 1
    }
    var i = fullBlocks * BlockSize
    while (i < df) {
      docIds(i) = VByte.readInt(docDeltas, dc)
      tfs(i) = VByte.readInt(tfBytes, tc)
      lens(i) = VByte.readInt(lenBytes, lc)
      i += 1
    }
    // prefix-sum deltas -> absolute docIds
    var acc = 0
    i = 0
    while (i < df) { acc += docIds(i); docIds(i) = acc; i += 1 }
    // positions
    val posStart = new Array[Int](df + 1)
    i = 0
    while (i < df) { posStart(i + 1) = posStart(i) + tfs(i); i += 1 }
    val posFlat = new Array[Int](posStart(df))
    val pc = new Cursor(0)
    i = 0
    while (i < df) {
      var prev = 0
      var j = posStart(i)
      while (j < posStart(i + 1)) {
        prev += VByte.readInt(positions, pc)
        posFlat(j) = prev
        j += 1
      }
      i += 1
    }
    DecodedPostings(docIds, tfs, posFlat, posStart, lens)
  }

  /** Decode a payload stream into per-position byte slices aligned with the
    * positions stream: returns (payStart, payLen, flatBytes) where position
    * k's payload is flatBytes[payStart(k) until payStart(k)+payLen(k))
    * (payLen 0 = none). `totalPositions` = sum of tfs = posStart(df).
    */
  def decodePayloads(totalPositions: Int, payloads: Array[Byte]): (Array[Int], Array[Int], Array[Byte]) = {
    val starts = new Array[Int](totalPositions)
    val lens = new Array[Int](totalPositions)
    val c = new Cursor(0)
    var k = 0
    while (k < totalPositions) {
      val len = VByte.readInt(payloads, c)
      starts(k) = c.pos
      lens(k) = len
      c.pos += len
      k += 1
    }
    (starts, lens, payloads)
  }

  /** Decode the offset stream into flat (starts, ends) arrays aligned with
    * the decoded positions stream (doc i's offsets are indices
    * posStart(i) until posStart(i+1)); per-doc start-delta encoding, so
    * decoding walks docs via `tfs`. */
  def decodeOffsets(tfs: Array[Int], offsets: Array[Byte]): (Array[Int], Array[Int]) = {
    var total = 0
    var i = 0
    while (i < tfs.length) { total += tfs(i); i += 1 }
    val starts = new Array[Int](total)
    val ends = new Array[Int](total)
    val c = new Cursor(0)
    var k = 0
    i = 0
    while (i < tfs.length) {
      var prevStart = 0
      var j = 0
      while (j < tfs(i)) {
        prevStart += VByte.readInt(offsets, c)
        starts(k) = prevStart
        ends(k) = prevStart + VByte.readInt(offsets, c)
        k += 1
        j += 1
      }
      i += 1
    }
    (starts, ends)
  }

  /** Per-doc byte ranges of the offset stream (walk by tf) — merge-time
    * purge/rebase slicing, the offsets twin of [[payloadDocRanges]]. */
  def offsetDocRanges(tfs: Array[Int], offsets: Array[Byte]): Array[Int] = {
    val ranges = new Array[Int](tfs.length + 1)
    val c = new Cursor(0)
    var i = 0
    while (i < tfs.length) {
      var j = 0
      while (j < tfs(i)) { VByte.readInt(offsets, c); VByte.readInt(offsets, c); j += 1 }
      i += 1
      ranges(i) = c.pos
    }
    ranges
  }

  /** Per-doc byte ranges of the payload stream (frame-walk by tf), for
    * merge-time purge/rebase: doc i's frames span bytes
    * [ranges(i), ranges(i+1)). */
  def payloadDocRanges(tfs: Array[Int], payloads: Array[Byte]): Array[Int] = {
    val ranges = new Array[Int](tfs.length + 1)
    val c = new Cursor(0)
    var i = 0
    while (i < tfs.length) {
      var j = 0
      while (j < tfs(i)) {
        val len = VByte.readInt(payloads, c)
        c.pos += len
        j += 1
      }
      i += 1
      ranges(i) = c.pos
    }
    ranges
  }
}
