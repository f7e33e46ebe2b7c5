package graft.codec

/** Per-segment term bloom filters — the BloomFilteringPostingsFormat /
  * FuzzySet analog (/root/reference/src/Lucene.Net.Codecs/Bloom/
  * BloomFilteringPostingsFormat.cs, FuzzySet.cs): an opt-in, advisory
  * bitset per (segment, field) answering "may this segment contain this
  * term?" with NO false negatives. The reference consults it before every
  * term-dictionary seek; the Spark re-expression consults it on the driver
  * before SCHEDULING a segment's postings scan, so a term present in 2 of
  * 500 segments launches 2 partition reads instead of 500 (Parquet row-group
  * stats already prune WITHIN a partition; the bloom prunes the partition
  * list itself).
  *
  * FuzzySet semantics kept: a SINGLE hash probe into a power-of-two bitset
  * (`hash & bloomMask`, FuzzySet.cs:233-256), build at a fixed upper size
  * then fold halves at flush until the target saturation is reached
  * (FuzzySet.Downsize, FuzzySet.cs:264; default max saturation 10% as in
  * BloomFilteringPostingsFormat's DefaultBloomFilterFactory). The hash is
  * MurmurHash3 over the term string rather than the reference's MurmurHash2
  * over UTF-8 bytes — on-disk formats differ everywhere in this engine; the
  * no-false-negative contract is what matters.
  */
/** One (segment, field) bloom row as stored in `<index>/blooms`. */
final case class BloomRow(segmentId: Int, field: String, bloomMask: Int, bits: Array[Byte])

object TermBloom {
  /** BloomFilteringPostingsFormat default: downsize while ≤10% bits set. */
  val DefaultMaxSaturation: Float = 0.10f

  /** Build-time bitset size (bits); folded down at flush. 4M bits = 512 KB
    * scratch per (segment, field) group — segments with more than ~400k
    * distinct terms keep the full size at a higher saturation (still
    * correct, just more false positives), like an undersized FuzzySet. */
  val BuildBits: Int = 1 << 22

  /** Smallest bitset a fold may produce. */
  val MinBits: Int = 1 << 10

  def hash(term: String): Int =
    scala.util.hashing.MurmurHash3.stringHash(term, 0x9747b28c) & 0x7fffffff

  /** Set bits at the build size, then fold upper-half-into-lower while the
    * folded saturation stays within `maxSaturation` (FuzzySet.Downsize).
    * Returns (bloomMask = bits-1, little-endian long-packed bitset). */
  def build(hashes: Iterator[Int],
            maxSaturation: Float = DefaultMaxSaturation): (Int, Array[Byte]) = {
    var words = new Array[Long](BuildBits / 64)
    while (hashes.hasNext) {
      val pos = hashes.next() & (BuildBits - 1)
      words(pos >> 6) |= 1L << (pos & 63)
    }
    var bits = BuildBits
    var done = false
    while (!done && bits > MinBits) {
      val half = words.length / 2
      val folded = new Array[Long](half)
      var i = 0
      var setBits = 0L
      while (i < half) {
        folded(i) = words(i) | words(i + half)
        setBits += java.lang.Long.bitCount(folded(i))
        i += 1
      }
      if (setBits.toFloat / (bits / 2) <= maxSaturation) { words = folded; bits /= 2 }
      else done = true
    }
    val bb = java.nio.ByteBuffer.allocate(words.length * 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    words.foreach(bb.putLong)
    (bits - 1, bb.array())
  }

  /** Single-probe membership: false means DEFINITELY absent. */
  def mayContain(hash: Int, bloomMask: Int, bits: Array[Byte]): Boolean = {
    val pos = hash & bloomMask
    (bits(pos >> 3) & (1 << (pos & 7))) != 0
  }
}
