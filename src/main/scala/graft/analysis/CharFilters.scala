package graft.analysis

import scala.collection.mutable.ArrayBuffer

/** Char filters — text transforms applied BEFORE tokenization, with offset
  * correction back into the ORIGINAL text (so highlighting/term vectors
  * slice the raw field value, not the filtered one).
  *
  * Offset model is BaseCharFilter's
  * (/root/reference/src/Lucene.Net.Analysis.Common/Analysis/CharFilter/
  * BaseCharFilter.cs:46-84): a monotone list of (outputOffset,
  * cumulativeDiff) pairs; the corrected input offset of an output offset
  * is `off + diff` for the entry at the LARGEST recorded outputOffset <=
  * off (identity before the first entry).
  */
final class CharFiltered(val text: String, offsets: Array[Int], diffs: Array[Int],
                         clampZero: Boolean = false) {
  /** BaseCharFilter.Correct replica (same boundary handling);
    * `clampZero` is PatternReplaceCharFilter's correct() override. */
  def correct(off: Int): Int = {
    val c = correct0(off)
    if (clampZero) math.max(0, c) else c
  }

  private def correct0(off: Int): Int = {
    val size = offsets.length
    if (size == 0 || off < offsets(0)) return off
    if (off >= offsets(size - 1)) return off + diffs(size - 1)
    var lo = 0
    var hi = size - 1
    var mid = -1
    while (hi >= lo) {
      mid = (lo + hi) >>> 1
      if (off < offsets(mid)) hi = mid - 1
      else if (off > offsets(mid)) lo = mid + 1
      else return off + diffs(mid)
    }
    if (off < offsets(mid)) { if (mid == 0) off else off + diffs(mid - 1) }
    else off + diffs(mid)
  }
}

/** Builder mirroring BaseCharFilter.AddOffCorrectMap + the emit discipline
  * MappingCharFilter uses at each replacement (MappingCharFilter.cs:160-190).
  */
final class OffsetCorrector {
  private val offs = ArrayBuffer.empty[Int]
  private val dfs = ArrayBuffer.empty[Int]
  val out = new java.lang.StringBuilder
  private var inputOff = 0

  private def lastCumulativeDiff: Int = if (dfs.isEmpty) 0 else dfs.last

  private def add(off: Int, cumulativeDiff: Int): Unit = {
    // AddOffCorrectMap: replace the entry when the offset repeats
    if (offs.nonEmpty && offs.last == off) dfs(dfs.length - 1) = cumulativeDiff
    else { offs += off; dfs += cumulativeDiff }
  }

  /** Copy one input char through unchanged. */
  def keep(c: Char): Unit = { out.append(c); inputOff += 1 }

  /** Copy `s` through unchanged (length counts against the input). */
  def keepAll(s: CharSequence): Unit = { out.append(s); inputOff += s.length }

  /** Consume `matchLen` input chars, emit `repl` instead — records the
    * correction exactly as MappingCharFilter.read does. */
  def replace(matchLen: Int, repl: String): Unit = {
    inputOff += matchLen
    out.append(repl)
    val diff = matchLen - repl.length
    if (diff != 0) {
      val prevCumulativeDiff = lastCumulativeDiff
      if (diff > 0) add(inputOff - diff - prevCumulativeDiff, prevCumulativeDiff + diff)
      else {
        val outputStart = inputOff - prevCumulativeDiff
        var extra = 0
        while (extra < -diff) {
          add(outputStart + extra, prevCumulativeDiff - extra - 1)
          extra += 1
        }
      }
    }
  }

  def result(clampZero: Boolean = false): CharFiltered =
    new CharFiltered(out.toString, offs.toArray, dfs.toArray, clampZero)
}

trait CharFilterStage extends Serializable {
  def apply(text: String): CharFiltered
}

/** MappingCharFilter (CharFilter/MappingCharFilter.cs): greedy
  * longest-pattern-wins replacement from a string->string map; empty
  * replacements allowed. (The reference walks an FST; a length-descending
  * probe over a hash map is the same greedy longest-match.) */
final class MappingCharFilter(map: Map[String, String]) extends CharFilterStage {
  private val maxLen = if (map.isEmpty) 0 else map.keysIterator.map(_.length).max
  private val byFirst: Map[Char, Seq[String]] =
    map.keys.toSeq.groupBy(_.charAt(0)).map { case (c, ks) =>
      c -> ks.sortBy(-_.length)
    }

  def apply(text: String): CharFiltered = {
    val oc = new OffsetCorrector
    var i = 0
    while (i < text.length) {
      val cands = byFirst.getOrElse(text.charAt(i), Nil)
      val hit = cands.find(k => text.regionMatches(i, k, 0, k.length))
      hit match {
        case Some(k) => oc.replace(k.length, map(k)); i += k.length
        case None => oc.keep(text.charAt(i)); i += 1
      }
    }
    oc.result()
  }
}

/** PatternReplaceCharFilter (Pattern/PatternReplaceCharFilter.cs
  * processPattern): regex replace over the whole input; offsets inside a
  * shrunk replacement map per the reference's cumulative bookkeeping, and
  * Correct clamps at 0 (the subclass's correct() override). */
final class PatternReplaceCharFilter(pattern: String, replacement: String) extends CharFilterStage {
  @transient private lazy val compiled = java.util.regex.Pattern.compile(pattern)

  def apply(text: String): CharFiltered = {
    val m = compiled.matcher(text)
    val oc = new OffsetCorrector
    var last = 0
    val sb = new java.lang.StringBuffer
    while (m.find()) {
      oc.keepAll(text.subSequence(last, m.start()))
      // expand $n group references via appendReplacement on a scratch buffer
      sb.setLength(0)
      val pre = sb.length()
      m.appendReplacement(sb, replacement)
      val expanded = sb.substring(pre + (m.start() - last), sb.length())
      // appendReplacement also copies the gap text; slice only the repl
      oc.replace(m.end() - m.start(), expanded)
      last = m.end()
      sb.setLength(0)
    }
    oc.keepAll(text.subSequence(last, text.length))
    oc.result(clampZero = true)
  }
}

/** HTMLStripCharFilter analog. The reference ships only the factory
  * (CharFilter/HTMLStripCharFilterFactory.cs — the JFlex-generated filter
  * class is external), so this follows the published behavior: tags,
  * comments, processing instructions, DOCTYPE and the full content of
  * script/style elements are removed; `<br>` variants become a newline;
  * CDATA section CONTENT is kept (wrappers removed); character entities
  * (a core named set + decimal/hex numeric) decode to their characters.
  * `escapedTags` keeps the named tags verbatim. Offsets are corrected so
  * tokens point into the original markup. */
final class HtmlStripCharFilter(escapedTags: Set[String] = Set.empty) extends CharFilterStage {
  import HtmlStripCharFilter._
  private val escaped = escapedTags.map(_.toLowerCase)

  def apply(text: String): CharFiltered = {
    val oc = new OffsetCorrector
    val n = text.length
    var i = 0
    while (i < n) {
      val c = text.charAt(i)
      if (c == '<') {
        if (text.regionMatches(i, "<!--", 0, 4)) {
          val end = text.indexOf("-->", i + 4)
          val stop = if (end < 0) n else end + 3
          oc.replace(stop - i, ""); i = stop
        } else if (text.regionMatches(true, i, "<![CDATA[", 0, 9)) {
          val end = text.indexOf("]]>", i + 9)
          val stop = if (end < 0) n else end
          oc.replace(9, "")
          oc.keepAll(text.subSequence(i + 9, stop))
          if (end >= 0) oc.replace(3, "")
          i = if (end < 0) n else end + 3
        } else if (i + 1 < n && (text.charAt(i + 1) == '!' || text.charAt(i + 1) == '?')) {
          // DOCTYPE / processing instruction
          val end = text.indexOf('>', i + 1)
          val stop = if (end < 0) n else end + 1
          oc.replace(stop - i, ""); i = stop
        } else {
          val (name, closing, tagEnd) = tagAt(text, i)
          if (name.isEmpty) { oc.keep(c); i += 1 } // bare '<', not a tag
          else if (escaped.contains(name)) {
            oc.keepAll(text.subSequence(i, tagEnd)); i = tagEnd
          } else if (!closing && (name == "script" || name == "style")) {
            val close = findCloseTag(text, tagEnd, name)
            oc.replace(close - i, "\n"); i = close
          } else if (name == "br") {
            oc.replace(tagEnd - i, "\n"); i = tagEnd
          } else if (InlineElements.contains(name)) {
            // inline elements vanish without a separator (the jflex grammar's
            // InlineElment macro: "foo<b>bar</b>" -> "foobar")
            oc.replace(tagEnd - i, ""); i = tagEnd
          } else {
            // block-level tags become "\n" so text across them never joins
            oc.replace(tagEnd - i, "\n"); i = tagEnd
          }
        }
      } else if (c == '&') {
        val (repl, len) = entityAt(text, i)
        if (len > 0) { oc.replace(len, repl); i += len }
        else { oc.keep(c); i += 1 }
      } else { oc.keep(c); i += 1 }
    }
    oc.result()
  }

  /** Returns (lowercased tag name, isClosing, index just past '>');
    * name "" when this is not a well-formed tag start. */
  private def tagAt(text: String, start: Int): (String, Boolean, Int) = {
    var i = start + 1
    val n = text.length
    var closing = false
    if (i < n && text.charAt(i) == '/') { closing = true; i += 1 }
    val nameStart = i
    while (i < n && (text.charAt(i).isLetterOrDigit)) i += 1
    if (i == nameStart) return ("", false, start)
    val name = text.substring(nameStart, i).toLowerCase
    // scan to '>' skipping quoted attribute values
    var q: Char = 0
    while (i < n) {
      val ch = text.charAt(i)
      if (q != 0) { if (ch == q) q = 0 }
      else if (ch == '"' || ch == '\'') q = ch
      else if (ch == '>') return (name, closing, i + 1)
      i += 1
    }
    (name, closing, n) // unterminated tag: swallow to EOF
  }

  private def findCloseTag(text: String, from: Int, name: String): Int = {
    val pat = "</" + name
    val n = text.length
    var i = from
    while (i <= n - pat.length) {
      if (text.regionMatches(true, i, pat, 0, pat.length)) {
        val end = text.indexOf('>', i)
        return if (end < 0) n else end + 1
      }
      i += 1
    }
    n
  }

  /** Returns (replacement, matchedLen) for an entity at `i`, or ("",0). */
  private def entityAt(text: String, i: Int): (String, Int) = {
    val n = text.length
    if (i + 1 >= n) return ("", 0)
    if (text.charAt(i + 1) == '#') {
      var j = i + 2
      val hex = j < n && (text.charAt(j) == 'x' || text.charAt(j) == 'X')
      if (hex) j += 1
      val digStart = j
      while (j < n && j - digStart < 7 &&
        (if (hex) isHexDigit(text.charAt(j)) else text.charAt(j).isDigit)) j += 1
      if (j == digStart || j >= n || text.charAt(j) != ';') return ("", 0)
      val cp = try Integer.parseInt(text.substring(digStart, j), if (hex) 16 else 10)
      catch { case _: NumberFormatException => return ("", 0) }
      if (cp <= 0 || cp > 0x10FFFF) return ("", 0)
      (new String(Character.toChars(cp)), j + 1 - i)
    } else {
      var j = i + 1
      while (j < n && j - i <= 10 && text.charAt(j).isLetterOrDigit) j += 1
      if (j >= n || text.charAt(j) != ';') return ("", 0)
      Entities.get(text.substring(i + 1, j)) match {
        case Some(ch) => (ch, j + 1 - i)
        case None => ("", 0)
      }
    }
  }

  @inline private def isHexDigit(c: Char): Boolean =
    (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')
}

object HtmlStripCharFilter {
  /** Inline (phrase-level) HTML elements, per the external filter's jflex
    * `InlineElment` macro: these strip to NOTHING ("foo<b>bar</b>" ->
    * "foobar"); every other tag is block-level and becomes "\n". */
  val InlineElements: Set[String] = Set(
    "a", "abbr", "acronym", "b", "basefont", "bdo", "big", "cite", "code",
    "dfn", "em", "font", "i", "img", "input", "kbd", "label", "q", "s",
    "samp", "select", "small", "span", "strike", "strong", "sub", "sup",
    "textarea", "tt", "u", "var")

  /** Core named entities (HTML 4 subset + apos — DOCUMENTED SUBSET of the
    * generated table the external filter embeds). */
  val Entities: Map[String, String] = Map(
    "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"", "apos" -> "'",
    "nbsp" -> " ", "copy" -> "©", "reg" -> "®",
    "trade" -> "™", "hellip" -> "…", "mdash" -> "—",
    "ndash" -> "–", "lsquo" -> "‘", "rsquo" -> "’",
    "ldquo" -> "“", "rdquo" -> "”", "laquo" -> "«",
    "raquo" -> "»", "deg" -> "°", "plusmn" -> "±",
    "frac12" -> "½", "frac14" -> "¼", "times" -> "×",
    "divide" -> "÷", "cent" -> "¢", "pound" -> "£",
    "euro" -> "€", "yen" -> "¥", "sect" -> "§",
    "para" -> "¶", "middot" -> "·", "bull" -> "•",
    "dagger" -> "†", "Dagger" -> "‡", "permil" -> "‰",
    "prime" -> "′", "Prime" -> "″",
    "agrave" -> "à", "aacute" -> "á", "acirc" -> "â",
    "atilde" -> "ã", "auml" -> "ä", "aring" -> "å",
    "aelig" -> "æ", "ccedil" -> "ç", "egrave" -> "è",
    "eacute" -> "é", "ecirc" -> "ê", "euml" -> "ë",
    "igrave" -> "ì", "iacute" -> "í", "icirc" -> "î",
    "iuml" -> "ï", "ntilde" -> "ñ", "ograve" -> "ò",
    "oacute" -> "ó", "ocirc" -> "ô", "otilde" -> "õ",
    "ouml" -> "ö", "oslash" -> "ø", "ugrave" -> "ù",
    "uacute" -> "ú", "ucirc" -> "û", "uuml" -> "ü",
    "yacute" -> "ý", "yuml" -> "ÿ", "szlig" -> "ß",
    "Agrave" -> "À", "Aacute" -> "Á", "Auml" -> "Ä",
    "Aring" -> "Å", "AElig" -> "Æ", "Ccedil" -> "Ç",
    "Egrave" -> "È", "Eacute" -> "É", "Ntilde" -> "Ñ",
    "Ouml" -> "Ö", "Oslash" -> "Ø", "Uuml" -> "Ü")
}

/** Analyzer wrapper: run `stages` over the raw text left-to-right, tokenize
  * the filtered text with `inner`, then correct token offsets back through
  * every stage (rightmost first) so they index the ORIGINAL text. */
final class CharFilteredAnalyzer(stages: Seq[CharFilterStage], inner: Analyzer) extends Analyzer {
  override def tokenize(text: String): Iterator[Token] = {
    var cur = text
    val applied = stages.map { st => val cf = st(cur); cur = cf.text; cf }
    val back = applied.reverse
    inner.tokenize(cur).map { t =>
      var s = t.startOffset
      var e = t.endOffset
      back.foreach { cf => s = cf.correct(s); e = cf.correct(e) }
      t.copy(startOffset = s, endOffset = e)
    }
  }
}
