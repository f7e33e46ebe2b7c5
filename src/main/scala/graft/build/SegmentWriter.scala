package graft.build

import graft.analysis.Analyzer
import graft.model.{PostingRow, SkipRow}

/** In-partition segment construction — the faithful DocumentsWriterPerThread /
  * TermsHashPerField analog (/root/reference/src/Lucene.Net.Core/Index/
  * TermsHashPerField.cs:31-313, FreqProxTermsWriterPerField.cs:154-230):
  * per (field, term) growable posting buffers (posting keys are (field, term)
  * pairs exactly like the reference's Term — Index/Term.cs; one inverter per
  * field — Index/DocInverterPerField.cs), flushed as encoded rows when the
  * RAM budget (token count) is reached — Lucene's FlushByRamOrCountsPolicy.
  * Each flush emits *piece rows* with disjoint ascending docId ranges; the
  * query path serves split rows transparently and MergeJob can consolidate
  * them later, exactly like Lucene's flush-then-merge lifecycle.
  *
  * No per-token Spark rows ever exist: tokens go straight from the analyzer
  * into primitive int buffers (the ByteBlockPool analog), which keeps the
  * build compute-bound instead of allocation-bound.
  */
final class SegmentWriter(fields: Seq[(String, Analyzer)], flushTokens: Int,
                          /** Store per-position character offsets as the
                            * fourth codec stream (IndexOptions
                            * ..._AND_OFFSETS) — PostingsHighlighter input. */
                          indexOffsets: Boolean = false) {

  /** Single-field convenience (the default "text" field). */
  def this(analyzer: Analyzer, flushTokens: Int) =
    this(Seq("text" -> analyzer), flushTokens, false)

  def this(analyzer: Analyzer) = this(analyzer, 8 * 1024 * 1024)

  /** Growable posting accumulation for one (field, term) (int-array slices). */
  private final class PostBuf {
    var docs = new Array[Int](4)
    var tfs = new Array[Int](4)
    var n = 0
    var positions = new Array[Int](8) // flat, per-doc runs
    var posN = 0
    /** Per-position payloads aligned with `positions`; allocated lazily on
      * the first payload-carrying token (PayloadAttribute analog). */
    var pays: Array[Array[Byte]] = null
    /** Flat per-position character offsets [s0,e0,s1,e1,...] aligned with
      * `positions`; allocated only when the writer indexes offsets
      * (OffsetAttribute analog). */
    var offs: Array[Int] = null
    var offN = 0

    def addDoc(docId: Int): Unit = {
      if (n == docs.length) {
        docs = java.util.Arrays.copyOf(docs, n * 2)
        tfs = java.util.Arrays.copyOf(tfs, n * 2)
      }
      docs(n) = docId; tfs(n) = 0
      n += 1
    }

    def addPos(p: Int): Unit = addPos(p, null, -1, -1)

    def addPos(p: Int, payload: Array[Byte], start: Int, end: Int): Unit = {
      if (posN == positions.length) {
        positions = java.util.Arrays.copyOf(positions, posN * 2)
        if (pays != null) pays = java.util.Arrays.copyOf(pays, posN * 2)
      }
      if (payload != null && pays == null) pays = new Array[Array[Byte]](positions.length)
      if (pays != null) pays(posN) = payload
      if (start >= 0) {
        if (offs == null) offs = new Array[Int](positions.length * 2)
        else if (offN == offs.length) offs = java.util.Arrays.copyOf(offs, offN * 2)
        offs(offN) = start; offs(offN + 1) = end
        offN += 2
      }
      positions(posN) = p
      posN += 1
      tfs(n - 1) += 1
    }
  }

  private val nFields = fields.size
  private val terms = Array.fill(nFields)(new java.util.HashMap[String, PostBuf]())
  private var bufferedTokens = 0L
  private val out = scala.collection.mutable.ArrayBuffer.empty[PostingRow]

  // per-field doc lengths, resolved at flush time (buffers store len
  // placeholders); avoids touching every term per doc
  private val docLens = Array.fill(nFields)(scala.collection.mutable.ArrayBuffer.empty[Int])
  private var firstDocId = 0
  private var bufferedDocs = 0

  /** Feed one document (docIds must arrive in increasing order); `values`
    * aligns with the field list. Returns the DEFAULT (first) field's length.
    */
  def addDoc(segmentId: Int, docId: Int, values: Seq[String]): Int = {
    if (bufferedDocs == 0) firstDocId = docId
    bufferedDocs += 1
    var defaultLen = 0
    var f = 0
    while (f < nFields) {
      var fieldLen = 0
      val it = fields(f)._2.tokenize(if (values(f) == null) "" else values(f))
      val fieldTerms = terms(f)
      while (it.hasNext) {
        val t = it.next()
        fieldLen += 1
        var buf = fieldTerms.get(t.term)
        if (buf == null) { buf = new PostBuf; fieldTerms.put(t.term, buf) }
        if (buf.n == 0 || buf.docs(buf.n - 1) != docId) buf.addDoc(docId)
        if (indexOffsets) buf.addPos(t.position, t.payload, t.startOffset, t.endOffset)
        else buf.addPos(t.position, t.payload, -1, -1)
        bufferedTokens += 1
      }
      docLens(f).append(fieldLen)
      if (f == 0) defaultLen = fieldLen
      f += 1
    }
    if (bufferedTokens >= flushTokens) flush(segmentId)
    defaultLen
  }

  /** Single-field convenience. */
  def addDoc(segmentId: Int, docId: Int, text: String): Int =
    addDoc(segmentId, docId, Seq(text))

  /** Encode and clear all buffered postings (piece flush). */
  def flush(segmentId: Int): Unit = {
    if (bufferedDocs == 0) return
    var f = 0
    while (f < nFields) {
      val fieldTerms = terms(f)
      if (!fieldTerms.isEmpty) {
        val lens = docLens(f)
        val sorted = new java.util.ArrayList(fieldTerms.keySet())
        java.util.Collections.sort(sorted)
        val it = sorted.iterator()
        while (it.hasNext) {
          val term = it.next()
          val buf = fieldTerms.get(term)
          val enc = new graft.codec.PostingsCodec.Encoder
          var i = 0
          var posOff = 0
          while (i < buf.n) {
            val tf = buf.tfs(i)
            val ps = java.util.Arrays.copyOfRange(buf.positions, posOff, posOff + tf)
            val pl = if (buf.pays == null) null
              else java.util.Arrays.copyOfRange(buf.pays, posOff, posOff + tf)
            val of = if (buf.offs == null) null
              else java.util.Arrays.copyOfRange(buf.offs, posOff * 2, (posOff + tf) * 2)
            enc.add(buf.docs(i), tf, ps, lens(buf.docs(i) - firstDocId), pl, of)
            posOff += tf
            i += 1
          }
          val e = enc.finish()
          out += PostingRow(segmentId, fields(f)._1, term, e.df, e.ttf,
            e.docDeltas, e.tfs, e.positions, e.lens,
            e.skips.map(s => SkipRow(s.lastDoc, s.docOff, s.tfOff, s.posOff, s.cumDocs, s.maxTf, s.minLen)),
            e.payloads, e.offsets)
        }
        fieldTerms.clear()
      }
      docLens(f).clear()
      f += 1
    }
    bufferedTokens = 0
    bufferedDocs = 0
  }

  /** Rows emitted so far (piece rows from intermediate flushes + the final
    * flush); caller drains after each doc batch / segment end.
    */
  def drain(): Seq[PostingRow] = {
    val r = out.toList
    out.clear()
    r
  }
}
