package graft.search

import graft.codec.SmallFloat

/** Float-exact BM25, formula-for-formula with the reference
  * (/root/reference/src/Lucene.Net.Core/Search/Similarities/BM25Similarity.cs):
  *
  *   idf        = (float) ln(1 + (N - df + 0.5)/(df + 0.5))          (:66-71, N = maxDoc)
  *   avgdl      = (float)(sumTotalTermFreq / (double) maxDoc)        (:91-103)
  *   norm byte  = byte315(boost / sqrt(fieldLen))                    (:110-113)
  *   NORM_TABLE = 1 / f^2 over byte315ToFloat                        (:150-158)
  *   cache[i]   = k1 * ((1-b) + b * NORM_TABLE[i] / avgdl)           (:235)
  *   weight     = idf * boost * (k1 + 1)                             (:259 WeightValue)
  *   score      = weight * tf / (tf + cache[normByte])               (:264-269)
  *
  * All intermediates are Float exactly where the reference uses float, so
  * scores are bit-identical (IEEE-754 on both runtimes).
  */
final class Bm25(val k1d: Double = 1.2d, val bd: Double = 0.75d) extends Serializable {
  /** Float-space parameters (the reference stores k1/b as float). */
  val k1: Float = k1d.toFloat
  val b: Float = bd.toFloat

  val normTable: Array[Float] = {
    val t = new Array[Float](256)
    var i = 0
    while (i < 256) {
      val f = SmallFloat.byte315ToFloat(i.toByte)
      t(i) = 1.0f / (f * f)
      i += 1
    }
    t
  }

  def idf(docFreq: Long, maxDoc: Long): Float =
    math.log(1 + (maxDoc - docFreq + 0.5d) / (docFreq + 0.5d)).toFloat

  def avgFieldLength(sumTotalTermFreq: Long, maxDoc: Long): Float =
    if (sumTotalTermFreq <= 0) 1f else (sumTotalTermFreq / maxDoc.toDouble).toFloat

  def encodeNormValue(boost: Float, fieldLength: Int): Byte =
    SmallFloat.floatToByte315(boost / math.sqrt(fieldLength.toDouble).toFloat)

  /** Per-term query-time constants: weight + the 256-entry norm cache. */
  final case class TermWeight(weightValue: Float, cache: Array[Float]) extends Serializable {
    @inline def score(tf: Float, normByte: Byte): Float = {
      val norm = cache(normByte & 0xff)
      weightValue * tf / (tf + norm)
    }
    /** Upper bound for any doc with tf <= maxTf and length >= len(minNormByte). */
    @inline def maxScore(maxTf: Int, minNormByte: Byte): Float =
      score(maxTf.toFloat, minNormByte)
  }

  def termWeight(docFreq: Long, maxDoc: Long, sumTotalTermFreq: Long, boost: Float = 1f): TermWeight = {
    val i = idf(docFreq, maxDoc)
    val avgdl = avgFieldLength(sumTotalTermFreq, maxDoc)
    val cache = new Array[Float](256)
    var j = 0
    while (j < 256) {
      cache(j) = k1 * ((1 - b) + b * normTable(j) / avgdl)
      j += 1
    }
    TermWeight(i * boost * (k1 + 1), cache)
  }
}

object Bm25 {
  val default = new Bm25()
}
