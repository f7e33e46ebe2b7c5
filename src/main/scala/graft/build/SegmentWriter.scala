package graft.build

import graft.analysis.Analyzer
import graft.codec.PostingsCodec
import graft.model.{PostingRow, SkipRow}

/** In-partition segment construction — the faithful DocumentsWriterPerThread /
  * TermsHashPerField analog (/root/reference/src/Lucene.Net.Core/Index/
  * TermsHashPerField.cs:31-313, FreqProxTermsWriterPerField.cs:154-230):
  * a per-segment hash of term -> growable posting buffers, flushed as encoded
  * rows when the RAM budget (token count) is reached — Lucene's
  * FlushByRamOrCountsPolicy. Each flush emits *piece rows* with disjoint
  * ascending docId ranges; the query path serves split rows transparently and
  * MergeJob can consolidate them later, exactly like Lucene's
  * flush-then-merge lifecycle.
  *
  * No per-token Spark rows ever exist: tokens go straight from the analyzer
  * into primitive int buffers (the ByteBlockPool analog), which keeps the
  * build compute-bound instead of allocation-bound.
  */
final class SegmentWriter(analyzer: Analyzer, flushTokens: Int = 8 * 1024 * 1024) {

  /** Growable posting accumulation for one term (int-array slices). */
  private final class PostBuf {
    var docs = new Array[Int](4)
    var tfs = new Array[Int](4)
    var n = 0
    var positions = new Array[Int](8) // flat, per-doc runs
    var posN = 0

    def addDoc(docId: Int): Unit = {
      if (n == docs.length) {
        docs = java.util.Arrays.copyOf(docs, n * 2)
        tfs = java.util.Arrays.copyOf(tfs, n * 2)
      }
      docs(n) = docId; tfs(n) = 0
      n += 1
    }

    def addPos(p: Int): Unit = {
      if (posN == positions.length) positions = java.util.Arrays.copyOf(positions, posN * 2)
      positions(posN) = p
      posN += 1
      tfs(n - 1) += 1
    }
  }

  private val terms = new java.util.HashMap[String, PostBuf]()
  private var bufferedTokens = 0L
  private val out = scala.collection.mutable.ArrayBuffer.empty[PostingRow]

  /** Feed one document (docIds must arrive in increasing order). Returns
    * (fieldLen, emitted rows if a flush happened).
    */
  def addDoc(segmentId: Int, docId: Int, text: String): Int = {
    var fieldLen = 0
    val it = analyzer.tokenize(if (text == null) "" else text)
    // first pass directly into the buffers: per doc, a term appears in
    // position order, so addPos accumulates tf in place
    while (it.hasNext) {
      val t = it.next()
      fieldLen += 1
      var buf = terms.get(t.term)
      if (buf == null) { buf = new PostBuf; terms.put(t.term, buf) }
      if (buf.n == 0 || buf.docs(buf.n - 1) != docId) buf.addDoc(docId)
      buf.addPos(t.position)
      bufferedTokens += 1
    }
    // field lengths are recorded per doc and resolved at flush time (buffers
    // store len=0 placeholders); avoids touching every term per doc
    docLens.append(fieldLen)
    if (docLens.size == 1) firstDocId = docId
    if (bufferedTokens >= flushTokens) flush(segmentId)
    fieldLen
  }

  private val docLens = scala.collection.mutable.ArrayBuffer.empty[Int]
  private var firstDocId = 0

  /** Encode and clear all buffered postings (piece flush). */
  def flush(segmentId: Int): Unit = {
    if (terms.isEmpty) return
    val sorted = new java.util.ArrayList(terms.keySet())
    java.util.Collections.sort(sorted)
    val it = sorted.iterator()
    while (it.hasNext) {
      val term = it.next()
      val buf = terms.get(term)
      val enc = new PostingsCodec.Encoder
      var i = 0
      var posOff = 0
      while (i < buf.n) {
        val tf = buf.tfs(i)
        val ps = java.util.Arrays.copyOfRange(buf.positions, posOff, posOff + tf)
        enc.add(buf.docs(i), tf, ps, docLens(buf.docs(i) - firstDocId))
        posOff += tf
        i += 1
      }
      val e = enc.finish()
      out += PostingRow(segmentId, term, e.df, e.ttf, e.docDeltas, e.tfs, e.positions, e.lens,
        e.skips.map(s => SkipRow(s.lastDoc, s.docOff, s.tfOff, s.posOff, s.cumDocs, s.maxTf, s.minLen)))
    }
    terms.clear()
    docLens.clear()
    bufferedTokens = 0
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
