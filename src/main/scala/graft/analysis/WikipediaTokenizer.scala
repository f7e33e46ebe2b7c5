package graft.analysis

import scala.collection.mutable.ArrayBuffer

/** WikipediaTokenizer: a StandardTokenizer variant aware of MediaWiki markup
  * (/root/reference/src/Lucene.Net.Analysis.Common/Analysis/Wikipedia/
  * WikipediaTokenizer.cs). The reference delegates scanning to a generated
  * JFlex DFA (`WikipediaTokenizerImpl`) whose source is NOT in the reference
  * tree — like HTMLStripCharFilter, this is a from-scratch scanner covering
  * the DOCUMENTED markup grammar, not a port of the DFA tables:
  *
  *   [[target]] / [[target|label]]    -> words typed "il" (INTERNAL_LINK)
  *   [[Category:a b]]                 -> words typed "c"  (CATEGORY)
  *   [http://url label]               -> url token typed "elu", label words "el"
  *   <ref>...</ref>                   -> words typed "ci" (CITATION)
  *   '''b''' / ''i'' / '''''bi'''''   -> words typed "b" / "i" / "bi"
  *   ==h== / ===sh=== (3+)            -> words typed "h" / "sh"
  *   {{template}}, other <tags>       -> skipped (separators)
  *   plain text                       -> classic grammar types (ClassicScanner)
  *
  * Output modes replicate WikipediaTokenizer.cs:81-95 + incrementToken:
  *   - TOKENS_ONLY: every token individually.
  *   - UNTOKENIZED_ONLY: for types in `untokenizedTypes`, all tokens of ONE
  *     wiki item collapse into a single token — texts joined by gap-width
  *     spaces then trimmed (collapseTokens, WikipediaTokenizer.cs:263-305);
  *     end offset = start + trimmed length.
  *   - BOTH: the collapsed token is emitted first, then the individual
  *     tokens, the FIRST of which has position increment 0 (setupSavedToken(0,…),
  *     WikipediaTokenizer.cs:225) so collapsed form and first word share a
  *     position. (The reference marks collapsed tokens with FlagsAttribute
  *     UNTOKENIZED_TOKEN_FLAG; this Token bundle has no flags slot — the
  *     collapsed token is recognizable by its wiki tokenType + multi-word term.)
  *
  * A new wiki item of the same type does NOT merge with the previous one
  * (the `NumWikiTokensSeen > numSeen` guard in the reference loop) — here
  * each markup region gets a distinct itemId and collapse groups by it.
  */
object WikipediaTokenizer {

  // Token type ids per WikipediaTokenizer.cs:55-72 (0-7 shared with the
  // classic grammar; 8+ are wiki-only and OVERLAP classic ACRONYM_DEP=8,
  // which the wiki grammar never emits).
  val InternalLink = 8
  val ExternalLink = 9
  val Citation = 10
  val Category = 11
  val Bold = 12
  val Italics = 13
  val BoldItalics = 14
  val Heading = 15
  val SubHeading = 16
  val ExternalLinkUrl = 17

  val TokensOnly = 0 // WikipediaTokenizer.cs:81 TOKENS_ONLY
  val UntokenizedOnly = 1 // :85 UNTOKENIZED_ONLY
  val Both = 2 // :89 BOTH

  /** Scanner token + the wiki item instance it belongs to (-1 = plain text). */
  private[analysis] final case class WikiRaw(text: String, start: Int, end: Int,
                                             tokenType: Int, itemId: Int)

  /** One pass over the markup; returns the typed raw-token stream. */
  private[analysis] def scan(s: String): ArrayBuffer[WikiRaw] = {
    val out = ArrayBuffer.empty[WikiRaw]
    var nextItem = 0
    var i = 0
    val n = s.length

    def classicInto(from: Int, until: Int, asType: Int, itemId: Int): Unit = {
      if (until <= from) return
      val slice = s.substring(from, until)
      ClassicScanner.scan(slice).foreach { t =>
        val tpe = if (asType >= 0) asType else t.tokenType
        out += WikiRaw(t.text, from + t.start, from + t.end, tpe, itemId)
      }
    }

    // count of consecutive occurrences of c at position j
    def runLen(j: Int, c: Char): Int = {
      var k = j
      while (k < n && s.charAt(k) == c) k += 1
      k - j
    }

    while (i < n) {
      val c = s.charAt(i)
      if (c == '[' && i + 1 < n && s.charAt(i + 1) == '[') {
        // internal link or category: [[content]]
        val close = s.indexOf("]]", i + 2)
        val end = if (close < 0) n else close
        var cs = i + 2
        while (cs < end && s.charAt(cs) == ':') cs += 1 // leading : (suppressed category link)
        val colon = s.indexOf(':', cs)
        val isCat = colon >= 0 && colon < end &&
          s.substring(cs, colon).equalsIgnoreCase("category")
        val tpe = if (isCat) Category else InternalLink
        val contentFrom = if (isCat) colon + 1 else cs
        classicInto(contentFrom, end, tpe, nextItem)
        nextItem += 1
        i = if (close < 0) n else close + 2
      } else if (c == '[') {
        // external link: [url label] — url = run to first whitespace
        val close = s.indexOf(']', i + 1)
        val end = if (close < 0) n else close
        var us = i + 1
        var ue = us
        while (ue < end && !Character.isWhitespace(s.charAt(ue))) ue += 1
        if (ue > us && s.indexOf("://", us) >= 0 && s.indexOf("://", us) < ue) {
          val item = nextItem; nextItem += 1
          out += WikiRaw(s.substring(us, ue), us, ue, ExternalLinkUrl, item)
          classicInto(ue, end, ExternalLink, item)
        } else {
          // not a URL bracket — treat interior as plain text
          classicInto(us, end, -1, -1)
        }
        i = if (close < 0) n else close + 1
      } else if (c == '<') {
        val refOpen = s.regionMatches(true, i, "<ref", 0, 4)
        if (refOpen) {
          val tagEnd = s.indexOf('>', i)
          if (tagEnd < 0) { i = n }
          else {
            // case-insensitive scan for </ref without copying the document
            var closeTag = -1
            var p = tagEnd
            while (closeTag < 0 && p <= n - 5) {
              if (s.regionMatches(true, p, "</ref", 0, 5)) closeTag = p
              p += 1
            }
            val end = if (closeTag < 0) n else closeTag
            classicInto(tagEnd + 1, end, Citation, nextItem)
            nextItem += 1
            i = if (closeTag < 0) n else math.max(end, s.indexOf('>', closeTag) + 1)
          }
        } else {
          // any other tag: skip to '>'
          val tagEnd = s.indexOf('>', i)
          i = if (tagEnd < 0) n else tagEnd + 1
        }
      } else if (c == '\'' && runLen(i, '\'') >= 2) {
        val q = math.min(runLen(i, '\''), 5) match {
          case 4 => 3 // ''''x'''' — closest documented form is bold
          case k => k
        }
        val tpe = q match {
          case 5 => BoldItalics
          case 3 => Bold
          case _ => Italics
        }
        val marker = "'" * q
        val close = s.indexOf(marker, i + q)
        val end = if (close < 0) n else close
        classicInto(i + q, end, tpe, nextItem)
        nextItem += 1
        i = if (close < 0) n else close + q
      } else if (c == '=' && runLen(i, '=') >= 2) {
        val q = runLen(i, '=')
        val tpe = if (q == 2) Heading else SubHeading
        val marker = "=" * q
        val close = s.indexOf(marker, i + q)
        val end = if (close < 0) n else close
        classicInto(i + q, end, tpe, nextItem)
        nextItem += 1
        i = if (close < 0) n else close + q
      } else if (c == '{' && i + 1 < n && s.charAt(i + 1) == '{') {
        val close = s.indexOf("}}", i + 2)
        i = if (close < 0) n else close + 2 // templates skipped wholesale
      } else {
        // plain text: up to the next markup trigger
        var j = i
        var stop = false
        while (j < n && !stop) {
          val ch = s.charAt(j)
          if (ch == '[' || ch == '<' ||
              (ch == '{' && j + 1 < n && s.charAt(j + 1) == '{') ||
              (ch == '\'' && runLen(j, '\'') >= 2) ||
              (ch == '=' && runLen(j, '=') >= 2)) stop = true
          else j += 1
        }
        classicInto(i, j, -1, -1)
        i = math.max(j, i + 1)
      }
    }
    out
  }

  /** Full tokenize with output-mode handling. `untokenizedTypes` uses the
    * int type ids above. */
  def tokenize(text: String, tokenOutput: Int = TokensOnly,
               untokenizedTypes: Set[Int] = Set.empty): Iterator[Token] = {
    val raw = scan(text)
    val out = ArrayBuffer.empty[Token]
    var pos = -1

    var k = 0
    while (k < raw.length) {
      val t = raw(k)
      val collapsible = t.itemId >= 0 && untokenizedTypes.contains(t.tokenType) &&
        tokenOutput != TokensOnly
      if (!collapsible) {
        pos += 1
        out += Token(t.text, pos, t.start, t.end, t.tokenType)
        k += 1
      } else {
        // gather the whole wiki item (same itemId AND same type, consecutive)
        var j = k
        while (j < raw.length && raw(j).itemId == t.itemId && raw(j).tokenType == t.tokenType) j += 1
        val group = raw.slice(k, j)
        // collapse: texts joined by gap-width spaces, trimmed (collapseTokens)
        val buf = new java.lang.StringBuilder(group.head.text)
        var lastPos = group.head.start + group.head.text.length
        group.tail.foreach { g =>
          var sp = g.start - lastPos
          while (sp > 0) { buf.append(' '); sp -= 1 }
          buf.append(g.text)
          lastPos = g.start + g.text.length
        }
        val collapsed = buf.toString.trim
        pos += 1
        out += Token(collapsed, pos, group.head.start,
          group.head.start + collapsed.length, t.tokenType)
        if (tokenOutput == Both) {
          // splits follow; first shares the collapsed token's position
          var first = true
          group.foreach { g =>
            if (!first) pos += 1
            out += Token(g.text, pos, g.start, g.end, g.tokenType)
            first = false
          }
        }
        k = j
      }
    }
    out.iterator
  }
}

/** Wiki chain for the gate: WikipediaTokenizer(TOKENS_ONLY) -> lowercase. */
object WikipediaAnalyzer extends Analyzer {
  override def tokenize(text: String): Iterator[Token] =
    WikipediaTokenizer.tokenize(text).map(t => t.copy(term = t.term.toLowerCase))
}

/** UNTOKENIZED_ONLY twin: internal links + categories collapse to single
  * multi-word terms (the "whole link as one token" retrieval mode). */
object WikipediaUntokenizedAnalyzer extends Analyzer {
  private val untok = Set(WikipediaTokenizer.InternalLink, WikipediaTokenizer.Category)
  override def tokenize(text: String): Iterator[Token] =
    WikipediaTokenizer.tokenize(text, WikipediaTokenizer.UntokenizedOnly, untok)
      .map(t => t.copy(term = t.term.toLowerCase))
}
