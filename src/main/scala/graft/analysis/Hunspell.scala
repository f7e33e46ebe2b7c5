package graft.analysis

import scala.collection.mutable
import java.util.regex.Pattern

/** Hunspell affix-dictionary stemming (/root/reference/src/
  * Lucene.Net.Analysis.Common/Analysis/Hunspell/ — Dictionary.cs parser,
  * Stemmer.cs affix-stripping recursion, HunspellStemFilter.cs emission).
  *
  * From-scratch re-expression with a DOCUMENTED SCOPE: the `.aff`/`.dic`
  * text formats with PFX/SFX rule groups (flag, cross-product marker,
  * strip, append, condition char-class), continuation classes on the
  * append (`ing/B` — Dictionary.cs twoStageAffix), single-char flags,
  * comments, the per-entry `word/FLAGS` form, ICONV/OCONV input/output
  * conversion tables (longest-match-at-position rewriting, applied to
  * input words AND dictionary entries / output stems — Dictionary.cs
  * cleanInput/applyMappings, Stemmer.cs newStem), and the CIRCUMFIX flag
  * (a circumfix-marked prefix yields stems only together with a
  * circumfix-marked suffix and vice versa — Stemmer.cs applyAffix
  * circumfix threading). Out of scope (noted, rarely used by the shipped
  * EN/DE/FR dictionaries this feature targets): COMPLEXPREFIXES,
  * numeric/long flag modes, compounding directives — the reference parses
  * them in Dictionary.cs:284-575; the recursion below matches Stemmer.cs
  * for the complexPrefixes=false configuration.
  *
  * Stemming contract (Stemmer.cs:66-99 + stem recursion):
  *   - a word present in the dictionary is its own stem (always included);
  *   - strip a suffix/prefix whose condition matches the RESTORED form
  *     (de-affixed part + strip), then the de-affixed word must be a
  *     dictionary entry carrying the rule's flag;
  *   - after a prefix at depth 0, a cross-product suffix may also strip
  *     (both rules must be cross-product and the entry must carry BOTH
  *     flags — prefixFlag is re-checked in applyAffix);
  *   - after a suffix at depth 0, a second suffix strips only through a
  *     continuation class on the first append (twoStageAffix);
  *   - the same rule never applies twice in a row (previous != affix).
  */
object Hunspell {

  /** One affix rule. `condition` is the compiled char-class pattern over
    * the restored word (suffix rules: anchored at the end; prefix rules:
    * at the start); null = zero condition ("." — always true). */
  final case class AffixRule(flag: Char, strip: String, append: String,
                             continuation: Set[Char], crossProduct: Boolean,
                             condition: Pattern, isPrefix: Boolean)

  final class Dictionary(val words: Map[String, Set[Char]],
                         val prefixes: Map[String, List[AffixRule]],
                         val suffixes: Map[String, List[AffixRule]],
                         val iconv: List[(String, String)] = Nil,
                         val oconv: List[(String, String)] = Nil,
                         val circumfix: Option[Char] = None) extends Serializable {
    val twoStageAffix: Boolean =
      (prefixes.valuesIterator ++ suffixes.valuesIterator).flatten.exists(_.continuation.nonEmpty)

    def hasWordFlag(word: String, flag: Char): Boolean =
      words.get(word).exists(_.contains(flag))
  }

  /** ICONV/OCONV table application (Dictionary.cs applyMappings): at each
    * position the LONGEST matching `from` rewrites to its `to`; otherwise
    * the character copies through. */
  def applyConv(table: List[(String, String)], s: String): String = {
    if (table.isEmpty) return s
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      var bestFrom: String = null
      var bestTo: String = null
      table.foreach { case (f, t) =>
        if (f.nonEmpty && s.startsWith(f, i) &&
            (bestFrom == null || f.length > bestFrom.length)) {
          bestFrom = f; bestTo = t
        }
      }
      if (bestFrom != null) { sb.append(bestTo); i += bestFrom.length }
      else { sb.append(s.charAt(i)); i += 1 }
    }
    sb.toString
  }

  /** Parse `.aff` + `.dic` content (Dictionary.cs readAffixFile/readDictionaryFiles).
    * Unknown directives are skipped, as the reference does. */
  def parse(aff: String, dic: String): Dictionary = {
    val prefixes = mutable.Map.empty[String, List[AffixRule]].withDefaultValue(Nil)
    val suffixes = mutable.Map.empty[String, List[AffixRule]].withDefaultValue(Nil)
    val iconv = mutable.ListBuffer.empty[(String, String)]
    val oconv = mutable.ListBuffer.empty[(String, String)]
    var circumfix: Option[Char] = None

    val lines = aff.linesIterator.map(stripComment).filter(_.nonEmpty).toArray
    var i = 0
    while (i < lines.length) {
      val parts = lines(i).split("\\s+")
      if ((parts(0) == "ICONV" || parts(0) == "OCONV") && parts.length == 2
          && parts(1).forall(_.isDigit)) {
        // table header: `ICONV n` then n `ICONV from to` lines
        // (Dictionary.cs parseConversions)
        val count = parts(1).toInt
        val table = if (parts(0) == "ICONV") iconv else oconv
        var k = 0
        while (k < count && i + 1 + k < lines.length) {
          val r = lines(i + 1 + k).split("\\s+")
          if (r.length >= 3) table += ((r(1), r(2)))
          k += 1
        }
        i += 1 + count
      } else if (parts(0) == "CIRCUMFIX" && parts.length >= 2) {
        circumfix = Some(parts(1).charAt(0))
        i += 1
      } else if ((parts(0) == "PFX" || parts(0) == "SFX") && parts.length >= 4) {
        val isPrefix = parts(0) == "PFX"
        val flag = parts(1).charAt(0)
        val crossProduct = parts(2) == "Y"
        val count = parts(3).toInt
        var k = 0
        while (k < count && i + 1 + k < lines.length) {
          // PFX flag stripping affix [condition] (Dictionary.cs:448-478)
          val r = lines(i + 1 + k).split("\\s+")
          val strip = if (r(2) == "0") "" else r(2)
          val (append, cont) = splitAppend(r(3))
          val condStr = if (r.length > 4) r(4) else "."
          val cond =
            if (condStr == ".") null
            else if (isPrefix) Pattern.compile("^(?:" + sanitize(condStr) + ").*", Pattern.DOTALL)
            else Pattern.compile(".*(?:" + sanitize(condStr) + ")$", Pattern.DOTALL)
          val rule = AffixRule(flag, strip, append, cont, crossProduct, cond, isPrefix)
          val m = if (isPrefix) prefixes else suffixes
          m(append) = rule :: m(append)
          k += 1
        }
        i += 1 + count
      } else i += 1
    }

    val iconvT = iconv.toList
    val words = mutable.Map.empty[String, Set[Char]]
    val dicLines = dic.linesIterator.map(stripComment).filter(_.nonEmpty).toArray
    // first line is the entry count (advisory; Dictionary.cs skips it)
    val start = if (dicLines.nonEmpty && dicLines(0).matches("\\d+")) 1 else 0
    var j = start
    while (j < dicLines.length) {
      val line = dicLines(j)
      val slash = line.indexOf('/')
      val (w0, flags) =
        if (slash < 0) (line, Set.empty[Char])
        else (line.substring(0, slash), line.substring(slash + 1).toSet)
      // dictionary entries are input-cleaned too (readDictionaryFiles)
      val w = applyConv(iconvT, w0)
      words(w) = words.getOrElse(w, Set.empty) ++ flags
      j += 1
    }
    new Dictionary(words.toMap, prefixes.toMap, suffixes.toMap,
      iconvT, oconv.toList, circumfix)
  }

  private def stripComment(s: String): String = {
    val h = s.indexOf('#')
    (if (h >= 0) s.substring(0, h) else s).trim
  }

  /** `ing/B` — append text + continuation flags (twoStageAffix source). */
  private def splitAppend(s: String): (String, Set[Char]) = {
    val slash = s.indexOf('/')
    if (slash < 0) (if (s == "0") "" else s, Set.empty)
    else (s.substring(0, slash), s.substring(slash + 1).toSet)
  }

  /** Escape regex metachars the .aff condition syntax does not use;
    * keep [], ^ inside classes (Dictionary.cs:480-505 keeps the class
    * syntax and escapes '-'). */
  private def sanitize(cond: String): String = {
    val fixed = if (cond.startsWith("[") && !cond.endsWith("]")) cond + "]" else cond
    fixed.replace("(", "\\(").replace(")", "\\)").replace("{", "\\{")
  }

  /** All stems of `word` (Stemmer.stem): input conversion, dictionary
    * identity + affix stripping, output conversion; empty when the word is
    * unknown AND nothing strips. */
  def stem(dict: Dictionary, word0: String): List[String] = {
    val word = applyConv(dict.iconv, word0) // cleanInput
    val out = mutable.ListBuffer.empty[String]
    if (dict.words.contains(word)) out += word
    out ++= stemRec(dict, word, previous = null, prefixFlag = -1, depth = 0,
      doPrefix = true, doSuffix = true, circumfix = false)
    val stems = out.toList.distinct
    if (dict.oconv.isEmpty) stems
    else stems.map(applyConv(dict.oconv, _)).distinct // newStem cleanOutput
  }

  private def stemRec(dict: Dictionary, word: String, previous: AffixRule,
                      prefixFlag: Int, depth: Int,
                      doPrefix: Boolean, doSuffix: Boolean,
                      circumfix: Boolean): List[String] = {
    val out = mutable.ListBuffer.empty[String]

    if (doPrefix) {
      // longest prefix first (Stemmer.cs iterates i = length-1 down to 0;
      // i == 0 serves zero-append rules)
      var i = word.length - 1
      while (i >= 0) {
        val pre = word.substring(0, i)
        dict.prefixes.getOrElse(pre, Nil).foreach { rule =>
          val compatible =
            if (rule eq previous) false
            else if (depth == 0) true
            else false // second prefix needs COMPLEXPREFIXES — out of scope
          if (compatible) {
            val restored = rule.strip + word.substring(i)
            if (rule.condition == null || rule.condition.matcher(restored).matches()) {
              out ++= applyAffix(dict, restored, rule, prefixFlag, depth, circumfix)
            }
          }
        }
        i -= 1
      }
    }

    if (doSuffix) {
      var i = 0
      while (i <= word.length - 1) {
        val suf = word.substring(i)
        dict.suffixes.getOrElse(suf, Nil).foreach { rule =>
          // depth>0: the INNER candidate's continuation class must license
          // the previously-stripped OUTER affix (Stemmer.cs:272-283
          // hasCrossCheckedFlag(prevFlag, candidate appendFlags,
          // matchEmpty=previousWasPrefix))
          val compatible =
            if (rule eq previous) false
            else if (depth == 0) true
            else rule.crossProduct && previous != null &&
              (rule.continuation.contains(previous.flag) ||
               (rule.continuation.isEmpty && previous.isPrefix))
          if (compatible) {
            val restored = word.substring(0, i) + rule.strip
            if (rule.condition == null || rule.condition.matcher(restored).matches()) {
              out ++= applyAffix(dict, restored, rule, prefixFlag, depth, circumfix)
            }
          }
        }
        i += 1
      }
    }
    out.toList
  }

  /** Stemmer.applyAffix: the de-affixed word is a stem when it is a
    * dictionary entry carrying the rule's flag (and the inner prefix's
    * flag, when one was stripped); with a CIRCUMFIX flag defined, the
    * circumfix state set by the stripped prefix must agree with the
    * current rule's circumfix continuation mark (Stemmer.cs:401-424);
    * cross-product rules recurse one level. */
  private def applyAffix(dict: Dictionary, restored: String, rule: AffixRule,
                         prefixFlag: Int, depth: Int,
                         circumfix: Boolean): List[String] = {
    val out = mutable.ListBuffer.empty[String]
    dict.words.get(restored).foreach { wordFlags =>
      val flagOk = wordFlags.contains(rule.flag)
      val prefixOk = prefixFlag < 0 || wordFlags.contains(prefixFlag.toChar) ||
        rule.continuation.contains(prefixFlag.toChar)
      // circumfix agreement: a circumfix-marked affix accepts only when the
      // other side of the pair was circumfix-marked too, and vice versa
      val circumOk = dict.circumfix.forall(cf =>
        circumfix == rule.continuation.contains(cf))
      if (flagOk && prefixOk && circumOk) out += restored
    }
    // a circumfix-marked prefix arms the state for the suffix recursion
    val circ2 =
      if (!circumfix && rule.isPrefix)
        dict.circumfix.exists(rule.continuation.contains)
      else circumfix
    if (rule.crossProduct && depth == 0) {
      if (rule.isPrefix) {
        // prefix stripped: a cross-product suffix may follow (prefixFlag
        // re-checked against the entry in the inner applyAffix)
        out ++= stemRec(dict, restored, rule, rule.flag.toInt, depth + 1,
          doPrefix = false, doSuffix = true, circumfix = circ2)
      } else if (dict.twoStageAffix) {
        // suffix stripped: second suffix only through a continuation class
        out ++= stemRec(dict, restored, rule, prefixFlag, depth + 1,
          doPrefix = false, doSuffix = true, circumfix = circ2)
      }
    }
    out.toList
  }

  /** HunspellStemFilter semantics (HunspellStemFilter.cs:88-135): unknown
    * words pass through unchanged; all (deduped) stems share the original
    * token's position (posIncr 0) and offsets; `longestOnly` keeps the
    * single longest stem (length desc, then text desc — lengthComparator). */
  def stemFilter(in: Iterator[Token], dict: Dictionary,
                 longestOnly: Boolean = false): Iterator[Token] =
    in.flatMap { t =>
      val stems = stem(dict, t.term)
      if (stems.isEmpty) Iterator.single(t)
      else {
        val picked =
          if (longestOnly) stems.sortWith((a, b) =>
            if (a.length != b.length) a.length > b.length else a > b).take(1)
          else stems
        picked.iterator.map(s => t.copy(term = s))
      }
    }
}

/** Gate fixture chain: classic tokenizer -> lowercase -> Hunspell stemming
  * over an embedded mini English-like dictionary (longestOnly so each word
  * keeps one term — phrase positions stay 1:1). */
object HunspellFixtureAnalyzer extends Analyzer {
  /** Mini dictionary exercising strip, condition classes, cross-product,
    * and a continuation class (ing/D licenses a following plural s):
    * walk (+re, +ed/+ing[+s]), try (y->ied), drink (no flags). */
  val dict: Hunspell.Dictionary = Hunspell.parse(
    aff = """SET UTF-8
            |PFX A Y 1
            |PFX A 0 re .
            |SFX B Y 2
            |SFX B 0 ed [^y]
            |SFX B y ied y
            |SFX C Y 1
            |SFX C 0 ing/D .
            |SFX D Y 1
            |SFX D 0 s .
            |""".stripMargin,
    dic = """3
            |walk/ABC
            |try/B
            |drink
            |""".stripMargin)

  override def tokenize(text: String): Iterator[Token] =
    Hunspell.stemFilter(
      LangAnalyzers.StandardNoStop.tokenize(text), dict, longestOnly = true)
}

/** Gate fixture for ICONV input conversion + CIRCUMFIX pairing (the de_DE /
  * pt_BR .aff machinery): ß→ss cleans both the input tokens and the
  * dictionary entries, and ge-…-t strips to the root only as a PAIR —
  * either half alone must NOT yield the stem (Stemmer.cs circumfix
  * threading). The suffix continuation carries the prefix flag too, as
  * Lucene's hasCrossCheckedFlag demands of non-empty continuation lists. */
object HunspellIconvAnalyzer extends Analyzer {
  val dict: Hunspell.Dictionary = Hunspell.parse(
    aff = """SET UTF-8
            |ICONV 1
            |ICONV ß ss
            |CIRCUMFIX X
            |PFX P Y 1
            |PFX P 0 ge/X .
            |SFX S Y 1
            |SFX S 0 t/XP .
            |SFX E Y 1
            |SFX E 0 en .
            |""".stripMargin,
    dic = """3
            |fußball/E
            |lauf/PS
            |wetter
            |""".stripMargin)

  override def tokenize(text: String): Iterator[Token] =
    Hunspell.stemFilter(
      LangAnalyzers.StandardNoStop.tokenize(text), dict, longestOnly = true)
}
