package graft.search

/** Sloppy-phrase frequency — a faithful re-implementation of the reference's
  * min-advancing traversal (/root/reference/src/Lucene.Net.Core/Search/
  * SloppyPhraseScorer.cs:102-160, non-repeating-terms path): phrase positions
  * are offset-adjusted (pp.pos = tokenPos - queryOffset), kept in a min-queue;
  * the least position advances, and every time the minimum "hops over" the
  * next-least a match-length (end - min) is scored when <= slop with
  * sloppyFreq = 1/(distance+1) (BM25Similarity.cs:75-78), accumulated as
  * float in encounter order.
  *
  * Shared verbatim by the Spark executors and the in-JVM oracle, so both
  * sides agree bit-for-bit. Repeating phrase terms (the RptGroups machinery)
  * are not supported — callers must pass distinct terms per slot.
  */
object SloppyMatcher {

  /** posBySlot: ascending token positions per slot; offsets: query offsets.
    * Returns the sloppy frequency (0 when no window fits within slop).
    */
  def phraseFreq(posBySlot: Array[Array[Int]], offsets: Array[Int], slop: Int): Float = {
    val n = posBySlot.length
    require(n >= 2, "1-term phrases rewrite to TermQ before scoring")
    // adjusted cursors
    val idx = new Array[Int](n)
    @inline def pos(i: Int) = posBySlot(i)(idx(i)) - offsets(i)
    // ordering: (position, slot) — the PhraseQueue tie-break by offset/ord
    val pq = new java.util.PriorityQueue[Integer](n, (a: Integer, b: Integer) => {
      val pa = pos(a); val pb = pos(b)
      if (pa != pb) Integer.compare(pa, pb) else Integer.compare(a, b)
    })
    var end = Int.MinValue
    var i = 0
    while (i < n) {
      if (posBySlot(i).isEmpty) return 0f
      if (pos(i) > end) end = pos(i)
      i += 1
    }
    i = 0
    while (i < n) { pq.add(i); i += 1 }

    var freq = 0.0f
    var pp = pq.poll()
    var matchLength = end - pos(pp)
    var next = pos(pq.peek())
    var exhausted = false
    while (!exhausted) {
      // advancePP
      if (idx(pp) + 1 >= posBySlot(pp).length) exhausted = true
      else {
        idx(pp) += 1
        if (pos(pp) > end) end = pos(pp)
        if (pos(pp) > next) {
          if (matchLength <= slop) freq += 1.0f / (matchLength + 1)
          pq.add(pp)
          pp = pq.poll()
          next = pos(pq.peek())
          matchLength = end - pos(pp)
        } else {
          val matchLength2 = end - pos(pp)
          if (matchLength2 < matchLength) matchLength = matchLength2
        }
      }
    }
    if (matchLength <= slop) freq += 1.0f / (matchLength + 1)
    freq
  }
}
