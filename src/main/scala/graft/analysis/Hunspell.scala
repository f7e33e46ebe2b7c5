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
  * comments, and the per-entry `word/FLAGS` form. Out of scope (noted,
  * rarely used by the shipped EN/DE/FR dictionaries this feature targets):
  * COMPLEXPREFIXES, CIRCUMFIX, ICONV/OCONV input/output conversion,
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
                         val suffixes: Map[String, List[AffixRule]]) extends Serializable {
    val twoStageAffix: Boolean =
      (prefixes.valuesIterator ++ suffixes.valuesIterator).flatten.exists(_.continuation.nonEmpty)

    def hasWordFlag(word: String, flag: Char): Boolean =
      words.get(word).exists(_.contains(flag))
  }

  /** Parse `.aff` + `.dic` content (Dictionary.cs readAffixFile/readDictionaryFiles).
    * Unknown directives are skipped, as the reference does. */
  def parse(aff: String, dic: String): Dictionary = {
    val prefixes = mutable.Map.empty[String, List[AffixRule]].withDefaultValue(Nil)
    val suffixes = mutable.Map.empty[String, List[AffixRule]].withDefaultValue(Nil)

    val lines = aff.linesIterator.map(stripComment).filter(_.nonEmpty).toArray
    var i = 0
    while (i < lines.length) {
      val parts = lines(i).split("\\s+")
      if ((parts(0) == "PFX" || parts(0) == "SFX") && parts.length >= 4) {
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

    val words = mutable.Map.empty[String, Set[Char]]
    val dicLines = dic.linesIterator.map(stripComment).filter(_.nonEmpty).toArray
    // first line is the entry count (advisory; Dictionary.cs skips it)
    val start = if (dicLines.nonEmpty && dicLines(0).matches("\\d+")) 1 else 0
    var j = start
    while (j < dicLines.length) {
      val line = dicLines(j)
      val slash = line.indexOf('/')
      val (w, flags) =
        if (slash < 0) (line, Set.empty[Char])
        else (line.substring(0, slash), line.substring(slash + 1).toSet)
      words(w) = words.getOrElse(w, Set.empty) ++ flags
      j += 1
    }
    new Dictionary(words.toMap, prefixes.toMap, suffixes.toMap)
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

  /** All stems of `word` (Stemmer.stem): dictionary identity + affix
    * stripping; empty when the word is unknown AND nothing strips. */
  def stem(dict: Dictionary, word: String): List[String] = {
    val out = mutable.ListBuffer.empty[String]
    if (dict.words.contains(word)) out += word
    out ++= stemRec(dict, word, previous = null, prefixFlag = -1, depth = 0,
      doPrefix = true, doSuffix = true)
    out.toList.distinct
  }

  private def stemRec(dict: Dictionary, word: String, previous: AffixRule,
                      prefixFlag: Int, depth: Int,
                      doPrefix: Boolean, doSuffix: Boolean): List[String] = {
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
              out ++= applyAffix(dict, restored, rule, prefixFlag, depth)
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
              out ++= applyAffix(dict, restored, rule, prefixFlag, depth)
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
    * flag, when one was stripped); cross-product rules recurse one level. */
  private def applyAffix(dict: Dictionary, restored: String, rule: AffixRule,
                         prefixFlag: Int, depth: Int): List[String] = {
    val out = mutable.ListBuffer.empty[String]
    dict.words.get(restored).foreach { wordFlags =>
      val flagOk = wordFlags.contains(rule.flag)
      val prefixOk = prefixFlag < 0 || wordFlags.contains(prefixFlag.toChar) ||
        rule.continuation.contains(prefixFlag.toChar)
      if (flagOk && prefixOk) out += restored
    }
    if (rule.crossProduct && depth == 0) {
      if (rule.isPrefix) {
        // prefix stripped: a cross-product suffix may follow (prefixFlag
        // re-checked against the entry in the inner applyAffix)
        out ++= stemRec(dict, restored, rule, rule.flag.toInt, depth + 1,
          doPrefix = false, doSuffix = true)
      } else if (dict.twoStageAffix) {
        // suffix stripped: second suffix only through a continuation class
        out ++= stemRec(dict, restored, rule, prefixFlag, depth + 1,
          doPrefix = false, doSuffix = true)
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
