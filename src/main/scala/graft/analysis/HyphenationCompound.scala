package graft.analysis

import scala.collection.mutable

/** Knuth-Liang pattern hyphenation + HyphenationCompoundWordTokenFilter
  * (/root/reference/src/Lucene.Net.Analysis.Common/Analysis/Compound/
  * HyphenationCompoundWordTokenFilter.cs + hyphenation/HyphenationTree.cs).
  *
  * The reference hyphenator is the FOP TernaryTree machinery loading TeX
  * pattern XML files (not shipped in the tree — only the parser is). This
  * is the same ALGORITHM on a plain hash table: patterns like "s1b" carry
  * inter-letter digit values; a word is scanned as ".word." and every
  * matching pattern max-merges its values into the boundary array; a
  * hyphen is legal where the final value is ODD, at least remainCharCount
  * letters from the start and pushCharCount from the end
  * (HyphenationTree.hyphenate, :353-460: break at i iff il[i+1] odd and
  * remainCharCount <= i <= len - pushCharCount). Points are returned as
  * [0, breaks..., len] (Hyphenation.cs synthetic end points); NO breaks =>
  * null in the reference = None here (the compound filter then leaves the
  * token alone). Exception ("stoplist") entries and non-letter cleanup are
  * out of scope — the filter feeds already-tokenized lowercase words. */
final class LiangHyphenator(patterns: Seq[String]) extends Serializable {

  /** letters -> boundary values (length = letters.length + 1); duplicate
    * letter sequences max-merge (TeX pattern sets never repeat one, but the
    * table must not silently drop it if an input does). */
  private val table: Map[String, Array[Int]] = patterns.iterator.map { p =>
    val letters = new StringBuilder
    val vals = mutable.ArrayBuffer[Int](0)
    p.foreach { c =>
      if (c.isDigit) vals(vals.length - 1) = c - '0'
      else { letters.append(c); vals += 0 }
    }
    letters.toString -> vals.toArray
  }.toSeq.groupBy(_._1).view.mapValues { vs =>
    vs.map(_._2).reduce((a, b) => a.zip(b).map { case (x, y) => math.max(x, y) })
  }.toMap
  private val maxLen: Int = if (table.isEmpty) 0 else table.keysIterator.map(_.length).max

  /** Hyphenation points incl. the synthetic 0 and len; None when no break
    * survives (the reference returns null). */
  def hyphenationPoints(word: String, remainCharCount: Int = 1,
                        pushCharCount: Int = 1): Option[Array[Int]] = {
    val len = word.length
    if (len < remainCharCount + pushCharCount) return None
    val w = "." + word.toLowerCase + "."
    // values(j) = inter-letter value at the boundary between w(j-1) and w(j)
    val values = new Array[Int](w.length + 1)
    var i = 0
    while (i < w.length) {
      var l = 1
      while (l <= maxLen && i + l <= w.length) {
        table.get(w.substring(i, i + l)).foreach { vs =>
          var k = 0
          while (k < vs.length) {
            if (vs(k) > values(i + k)) values(i + k) = vs(k)
            k += 1
          }
        }
        l += 1
      }
      i += 1
    }
    // split position p (word(p-1)|word(p)) sits at boundary j = p + 1
    val breaks = (remainCharCount to (len - pushCharCount))
      .filter(p => (values(p + 1) & 1) == 1)
    if (breaks.isEmpty) None
    else Some((0 +: breaks :+ len).toArray)
  }
}

object LiangHyphenator {
  /** Minimal reader for the FOP pattern XML the reference's PatternParser
    * consumes: collects `<pattern>` element texts (exceptions/classes
    * ignored — documented scope). */
  def fromXml(xml: String): LiangHyphenator =
    new LiangHyphenator(
      "<pattern>\\s*([^<\\s]+)\\s*</pattern>".r
        .findAllMatchIn(xml).map(_.group(1)).toSeq)
}

object HyphenationCompound {

  /** HyphenationCompoundWordTokenFilter.Decompose (:160-240): for every
    * pair of hyphenation points within [minSubwordSize, maxSubwordSize],
    * emit the slice when the dictionary holds it (or the slice minus one
    * trailing binding char; or always when dictionary == null), after the
    * original token at the SAME position with the ORIGINAL offsets
    * (CompoundWordTokenFilterBase 4.4 semantics, like dictionaryCompound).
    * onlyLongestMatch keeps the longest hit per start point. */
  def filter(in: Iterator[Token], hyph: LiangHyphenator,
             dict: Set[String] = null, minWordSize: Int = 5,
             minSubwordSize: Int = 2, maxSubwordSize: Int = 15,
             onlyLongestMatch: Boolean = false): Iterator[Token] =
    in.flatMap { t =>
      val term = t.term
      if (term.length < minWordSize) Iterator.single(t)
      else hyph.hyphenationPoints(term) match {
        case None => Iterator.single(t)
        case Some(hyp) =>
          val subs = mutable.ArrayBuffer.empty[String]
          var i = 0
          while (i < hyp.length) {
            val start = hyp(i)
            var longest: String = null
            var j = 1
            var done = false
            while (!done && j < hyp.length - i) {
              val partLength = hyp(i + j) - start
              if (partLength > maxSubwordSize) done = true
              else if (partLength >= minSubwordSize) {
                val part = term.substring(start, start + partLength)
                val hit =
                  if (dict == null || dict.contains(part)) part
                  else if (partLength - 1 >= minSubwordSize &&
                           dict.contains(part.substring(0, partLength - 1)))
                    part.substring(0, partLength - 1)
                  else null
                if (hit != null) {
                  if (onlyLongestMatch) {
                    if (longest == null || longest.length < hit.length) longest = hit
                  } else subs += hit
                }
              }
              j += 1
            }
            if (onlyLongestMatch && longest != null) subs += longest
            i += 1
          }
          Iterator.single(t) ++ subs.iterator.map(s => t.copy(term = s))
      }
    }
}

/** Gate fixture: German-style compounds over a mini pattern set that
  * breaks fussballspiel -> fuss|ball|spiel and regenwetter -> regen|wetter,
  * verified against the part dictionary. */
object HyphCompoundFixtureAnalyzer extends Analyzer {
  val Hyphenator: LiangHyphenator = LiangHyphenator.fromXml(
    """<hyphenation-info>
      |  <patterns>
      |    <pattern>s1b</pattern>
      |    <pattern>l1s</pattern>
      |    <pattern>n1w</pattern>
      |    <pattern>l1sp</pattern>
      |  </patterns>
      |</hyphenation-info>""".stripMargin)
  val Dict: Set[String] = CompoundFixtureAnalyzer.Dict

  override def tokenize(text: String): Iterator[Token] =
    HyphenationCompound.filter(SimpleAnalyzer.tokenize(text), Hyphenator, Dict)
}
