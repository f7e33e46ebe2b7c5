package graft.analysis

import scala.collection.mutable.ArrayBuffer

/** The remaining generic analysis components: Path/Pattern tokenizers, the
  * Miscellaneous filter directory, PositionFilter and the TeeSink family —
  * each a combinator over the shared `Iterator[Token]` shape. */
object MiscFilters {

  // ------------------------------------------------------------- Path
  // Path/PathHierarchyTokenizer.cs: "/a/b/c" => "/a", "/a/b", "/a/b/c",
  // ALL at the same position (posIncr 1 then 0s — incrementToken sets
  // PositionIncrement=0 whenever resultToken is non-empty); offsets grow
  // from 0; `skip` drops the first N path components (the skipped prefix
  // is replaced but still consumes offsets); delimiter may be rewritten
  // to `replacement`.

  def pathHierarchy(text: String, delimiter: Char = '/', replacement: Char = '/',
                    skip: Int = 0): Iterator[Token] = {
    if (text.isEmpty) return Iterator.empty
    // The reference's skip discipline (incrementToken's skipped counter):
    // the FIRST character consumes one skip slot, then each delimiter
    // consumes one while slots remain; the emitted region starts AT the
    // delimiter that overflows the skip count. skip=0 starts at 0.
    var start = 0
    if (skip > 0) {
      var seen = 0 // delimiters seen from index 1 on
      var j = 1
      start = -1
      while (j < text.length && start < 0) {
        if (text.charAt(j) == delimiter) { seen += 1; if (seen == skip) start = j }
        j += 1
      }
      if (start < 0) return Iterator.empty
    }
    // one token per delimiter strictly inside (start, len), plus the full
    // remainder (which keeps a trailing delimiter — the endDelimiter path)
    val cuts = ArrayBuffer.empty[Int]
    var d = start + 1
    while (d < text.length) { if (text.charAt(d) == delimiter) cuts += d; d += 1 }
    cuts += text.length
    cuts.iterator.map { cut =>
      Token(text.substring(start, cut).replace(delimiter, replacement), 0,
        start, cut, TokenType.ALPHANUM)
    }
  }

  /** Path/ReversePathHierarchyTokenizer.cs: suffix hierarchy — "/a/b/c"
    * => "/a/b/c", "a/b/c", "b/c", "c", all at one position; `skip` drops
    * the LAST N components. */
  def reversePathHierarchy(text: String, delimiter: Char = '/', replacement: Char = '/',
                           skip: Int = 0): Iterator[Token] = {
    if (text.isEmpty) return Iterator.empty
    // delimiterPositions discipline (ReversePathHierarchyTokenizer.cs):
    // 0, then (index+1) of every delimiter, then the length unless the
    // text ends with a delimiter; tokens run positions(k) .. end where
    // end = positions(count-1-skip) and k < count-skip-1.
    val positions = ArrayBuffer(0)
    var i = 0
    while (i < text.length) {
      if (text.charAt(i) == delimiter) positions += i + 1
      i += 1
    }
    if (positions.last < text.length) positions += text.length
    val count = positions.length
    if (count - 1 - skip < 0) return Iterator.empty
    val end = positions(count - 1 - skip)
    val mapped = text.replace(delimiter, replacement)
    (0 until (count - skip - 1)).iterator.map { k =>
      val s = positions(k)
      Token(mapped.substring(s, end), 0, s, end, TokenType.ALPHANUM)
    }
  }

  // ----------------------------------------------------------- Pattern
  // Pattern/PatternTokenizer.cs: group = -1 => the pattern SPLITS (tokens
  // are the text between matches, empties dropped); group >= 0 => each
  // match's capture group becomes a token (empties dropped).

  def patternTokenize(text: String, pattern: String, group: Int = -1): Iterator[Token] = {
    val m = java.util.regex.Pattern.compile(pattern).matcher(text)
    val out = ArrayBuffer.empty[(Int, Int)]
    if (group >= 0) {
      while (m.find()) {
        val s = m.start(group); val e = m.end(group)
        if (s != e) out += ((s, e))
      }
    } else {
      var index = 0
      while (m.find()) {
        if (m.start() - index > 0) out += ((index, m.start()))
        index = m.end()
      }
      if (text.length - index > 0) out += ((index, text.length))
    }
    out.iterator.zipWithIndex.map { case ((s, e), pos) =>
      Token(text.substring(s, e), pos, s, e, TokenType.ALPHANUM)
    }
  }

  /** Pattern/PatternReplaceFilter.cs: regex replace on each TERM (all
    * occurrences or first only); offsets/positions untouched. */
  def patternReplace(in: Iterator[Token], pattern: String, replacement: String,
                     all: Boolean = true): Iterator[Token] = {
    val p = java.util.regex.Pattern.compile(pattern)
    in.map { t =>
      val m = p.matcher(t.term)
      t.copy(term = if (all) m.replaceAll(replacement) else m.replaceFirst(replacement))
    }
  }

  /** Pattern/PatternCaptureGroupTokenFilter.cs (single-pattern form): for
    * each token emit the capture groups of every match as extra tokens at
    * the SAME position; `preserveOriginal` keeps the token itself first,
    * otherwise the first capture REPLACES the term; captures equal to the
    * whole term are not duplicated. */
  def captureGroups(in: Iterator[Token], pattern: String,
                    preserveOriginal: Boolean = true): Iterator[Token] = {
    val p = java.util.regex.Pattern.compile(pattern)
    in.flatMap { t =>
      val caps = ArrayBuffer.empty[String]
      val m = p.matcher(t.term)
      while (m.find()) {
        var g = 1
        while (g <= m.groupCount()) {
          val s = m.start(g); val e = m.end(g)
          if (s >= 0 && s != e && !(preserveOriginal && s == 0 && e == t.term.length))
            caps += t.term.substring(s, e)
          g += 1
        }
      }
      if (caps.isEmpty) Iterator.single(t)
      else if (preserveOriginal) Iterator.single(t) ++ caps.iterator.map(c => t.copy(term = c))
      else caps.iterator.map(c => t.copy(term = c))
    }
  }

  // ----------------------------------------------- Scandinavian filters
  // Miscellaneous/ScandinavianNormalizationFilter.cs: fold the Swedish
  // spellings ä/ö into æ/ø and collapse the digraph spellings aa/ao->å,
  // ae->æ, oe/oo->ø (exact rule order replicated).

  def scandinavianNormalize(term: String): String = {
    val b = new StringBuilder(term)
    var i = 0
    while (i < b.length) {
      val c = b.charAt(i)
      if (c == 'ä') b.setCharAt(i, 'æ')
      else if (c == 'Ä') b.setCharAt(i, 'Æ')
      else if (c == 'ö') b.setCharAt(i, 'ø')
      else if (c == 'Ö') b.setCharAt(i, 'Ø')
      else if (i < b.length - 1) {
        val d = b.charAt(i + 1)
        if (c == 'a' && (d == 'a' || d == 'o' || d == 'A' || d == 'O')) {
          b.deleteCharAt(i + 1); b.setCharAt(i, 'å')
        } else if (c == 'A' && (d == 'a' || d == 'A' || d == 'o' || d == 'O')) {
          b.deleteCharAt(i + 1); b.setCharAt(i, 'Å')
        } else if (c == 'a' && (d == 'e' || d == 'E')) {
          b.deleteCharAt(i + 1); b.setCharAt(i, 'æ')
        } else if (c == 'A' && (d == 'e' || d == 'E')) {
          b.deleteCharAt(i + 1); b.setCharAt(i, 'Æ')
        } else if (c == 'o' && (d == 'e' || d == 'E' || d == 'o' || d == 'O')) {
          b.deleteCharAt(i + 1); b.setCharAt(i, 'ø')
        } else if (c == 'O' && (d == 'e' || d == 'E' || d == 'o' || d == 'O')) {
          b.deleteCharAt(i + 1); b.setCharAt(i, 'Ø')
        }
      }
      i += 1
    }
    b.toString
  }

  /** Miscellaneous/ScandinavianFoldingFilter.cs: the aggressive variant —
    * å/ä/æ -> a, ö/ø -> o, and the digraphs aa/ae/ao, oe/oo collapse to
    * the single base letter. */
  def scandinavianFold(term: String): String = {
    val b = new StringBuilder(term)
    var i = 0
    while (i < b.length) {
      val c = b.charAt(i)
      if (c == 'å' || c == 'ä' || c == 'æ') b.setCharAt(i, 'a')
      else if (c == 'Å' || c == 'Ä' || c == 'Æ') b.setCharAt(i, 'A')
      else if (c == 'ø' || c == 'ö') b.setCharAt(i, 'o')
      else if (c == 'Ø' || c == 'Ö') b.setCharAt(i, 'O')
      else if (i < b.length - 1) {
        val d = b.charAt(i + 1)
        if ((c == 'a' || c == 'A') &&
          (d == 'a' || d == 'A' || d == 'e' || d == 'E' || d == 'o' || d == 'O'))
          b.deleteCharAt(i + 1)
        else if ((c == 'o' || c == 'O') && (d == 'e' || d == 'E' || d == 'o' || d == 'O'))
          b.deleteCharAt(i + 1)
      }
      i += 1
    }
    b.toString
  }

  // --------------------------------------------------- HyphenatedWords
  // Miscellaneous/HyphenatedWordsFilter.cs: a token ending in '-' buffers
  // (hyphen dropped) and joins with following tokens until one does not
  // end in '-'; the joined token keeps the FIRST part's start offset and
  // position and the LAST part's end offset. A dangling buffer at stream
  // end re-emits with the '-' restored.
  def hyphenatedWords(in: Iterator[Token]): Iterator[Token] = new Iterator[Token] {
    private val it = in
    private var pending: Token = null
    private var shift = 0 // consumed parts close position gaps downstream
    private def compute(): Unit = {
      if (pending != null || !it.hasNext) return
      val first = it.next()
      if (!first.term.endsWith("-")) {
        pending = first.copy(position = first.position - shift)
        return
      }
      val sb = new StringBuilder(first.term.dropRight(1))
      var last = first
      var open = true
      var consumed = 0
      while (open && it.hasNext) {
        val t = it.next()
        last = t
        consumed += 1
        if (t.term.endsWith("-")) sb.append(t.term.dropRight(1))
        else { sb.append(t.term); open = false }
      }
      if (open) sb.append('-') // exhausted with a dangling part
      pending = first.copy(term = sb.toString, position = first.position - shift,
        endOffset = last.endOffset)
      shift += consumed
    }
    override def hasNext: Boolean = { compute(); pending != null }
    override def next(): Token = { compute(); val t = pending; pending = null; t }
  }

  // ------------------------------------------------- keep/length/count
  /** Miscellaneous/KeepWordFilter.cs: keep only listed terms, position
    * gaps preserved (positions are already absolute in this model). */
  def keepWords(in: Iterator[Token], keep: Set[String]): Iterator[Token] =
    in.filter(t => keep.contains(t.term))

  /** Miscellaneous/CodepointCountFilter.cs: keep min <= codepoints <= max. */
  def codepointCount(in: Iterator[Token], min: Int, max: Int): Iterator[Token] =
    in.filter { t =>
      val n = t.term.codePointCount(0, t.term.length)
      n >= min && n <= max
    }

  /** Miscellaneous/TruncateTokenFilter.cs: truncate terms to `length`. */
  def truncate(in: Iterator[Token], length: Int): Iterator[Token] =
    in.map(t => if (t.term.length > length) t.copy(term = t.term.substring(0, length)) else t)

  /** Miscellaneous/LimitTokenCountFilter.cs: emit at most `maxCount`. */
  def limitTokenCount(in: Iterator[Token], maxCount: Int): Iterator[Token] =
    in.take(maxCount)

  /** Miscellaneous/LimitTokenPositionFilter.cs: drop tokens whose position
    * exceeds `maxPosition` (1-based in the reference: the first token is
    * position 1). */
  def limitTokenPosition(in: Iterator[Token], maxPosition: Int): Iterator[Token] =
    in.takeWhile(t => t.position + 1 <= maxPosition)

  /** Miscellaneous/RemoveDuplicatesTokenFilter.cs: drop a token when the
    * same TERM already appeared at the same position. */
  def removeDuplicates(in: Iterator[Token]): Iterator[Token] = new Iterator[Token] {
    private val it = in
    private var lastPos = -1
    private val seen = scala.collection.mutable.HashSet.empty[String]
    private var pending: Token = null
    private def compute(): Unit = {
      while (pending == null && it.hasNext) {
        val t = it.next()
        if (t.position != lastPos) { lastPos = t.position; seen.clear() }
        if (seen.add(t.term)) pending = t
      }
    }
    override def hasNext: Boolean = { compute(); pending != null }
    override def next(): Token = { compute(); val t = pending; pending = null; t }
  }

  // ------------------------------------------- keyword marking / stems
  /** KeywordMarker + stemmer in one combinator (KeywordAttribute analog:
    * SetKeywordMarkerFilter protects `protect`ed terms; a regex plays
    * PatternKeywordMarkerFilter): terms marked keyword bypass `stem`. */
  def guardedStem(in: Iterator[Token], stem: String => String,
                  protect: Set[String] = Set.empty,
                  protectPattern: Option[String] = None): Iterator[Token] = {
    val pat = protectPattern.map(java.util.regex.Pattern.compile)
    in.map { t =>
      val isKeyword = protect.contains(t.term) || pat.exists(_.matcher(t.term).matches())
      if (isKeyword) t else t.copy(term = stem(t.term))
    }
  }

  /** Miscellaneous/StemmerOverrideFilter.cs: dictionary lookup REPLACES
    * the term and marks it keyword (so the downstream stemmer skips it);
    * misses flow through to `stem`. */
  def stemmerOverride(in: Iterator[Token], overrides: Map[String, String],
                      stem: String => String): Iterator[Token] =
    in.map { t =>
      overrides.get(t.term) match {
        case Some(s) => t.copy(term = s)
        case None => t.copy(term = stem(t.term))
      }
    }

  /** Miscellaneous/KeywordRepeatFilter.cs + a stemmer + RemoveDuplicates:
    * every token is emitted twice — the ORIGINAL (keyword-marked, so it
    * skips the stemmer) then the stemmed form at the same position; the
    * duplicate collapses when the stem equals the original. */
  def keywordRepeatStem(in: Iterator[Token], stem: String => String): Iterator[Token] =
    removeDuplicates(in.flatMap { t =>
      Iterator(t, t.copy(term = stem(t.term)))
    })

  // ----------------------------------------------------- PositionFilter
  /** Position/PositionFilter.cs: the first token keeps its position, every
    * later one advances by `increment` (default 0 = all stack at the first
    * position) — used to flatten query-time shingle/synonym expansions. */
  def positionFilter(in: Iterator[Token], increment: Int = 0): Iterator[Token] = new Iterator[Token] {
    private var first = true
    private var pos = 0
    override def hasNext: Boolean = in.hasNext
    override def next(): Token = {
      val t = in.next()
      if (first) { pos = t.position; first = false }
      else pos += increment
      t.copy(position = pos)
    }
  }

  // ------------------------------------------------------------ TeeSink
  /** Sinks/TeeSinkTokenFilter.cs: pass the stream through unchanged while
    * routing copies of matching tokens into named sinks. Returns the main
    * stream (materialized) plus each sink's captured tokens. The sink
    * predicates replicate the three reference SinkFilters. */
  def teeSink(in: Iterator[Token],
              sinks: Seq[Token => Boolean]): (Seq[Token], Seq[Seq[Token]]) = {
    val all = in.toSeq
    (all, sinks.map(p => all.filter(p)))
  }

  /** Sinks/TokenTypeSinkFilter.cs. */
  def tokenTypeSink(tpe: Int): Token => Boolean = _.tokenType == tpe

  /** Sinks/TokenRangeSinkFilter.cs: accepts tokens [lower, upper) by
    * arrival index — stateful, build one per use. */
  def tokenRangeSink(lower: Int, upper: Int): Token => Boolean = {
    var count = -1
    _ => { count += 1; count >= lower && count < upper }
  }

  /** Sinks/DateRecognizerSinkFilter.cs: accepts tokens parseable as dates
    * (invariant culture DateTime.TryParse analog — ISO yyyy-MM-dd plus
    * M/d/yyyy accepted here). */
  def dateRecognizerSink: Token => Boolean = t => {
    val s = t.term
    s.matches("""\d{4}-\d{2}-\d{2}""") || s.matches("""\d{1,2}/\d{1,2}/\d{4}""")
  }
}

// ======================================================================
// Named chains over the new components (registered in Analyzers.byName).

/** HTMLStripCharFilter -> StandardAnalyzer: the webtext ingestion chain —
  * tags/scripts/styles/comments stripped, entities decoded, token offsets
  * corrected back into the raw markup. */
object HtmlStripAnalyzer extends Analyzer {
  private val chain = new CharFilteredAnalyzer(Seq(new HtmlStripCharFilter()), StandardAnalyzer)
  override def tokenize(text: String): Iterator[Token] = chain.tokenize(text)
}

/** MappingCharFilter fixture ("ph"->"f") -> classic chain. */
object MappingFixtureAnalyzer extends Analyzer {
  private val chain = new CharFilteredAnalyzer(
    Seq(new MappingCharFilter(Map("ph" -> "f", "Ph" -> "F"))), LangAnalyzers.StandardNoStop)
  override def tokenize(text: String): Iterator[Token] = chain.tokenize(text)
}

/** PatternReplaceCharFilter fixture (join digit groups) -> classic chain. */
object PatternReplaceFixtureAnalyzer extends Analyzer {
  private val chain = new CharFilteredAnalyzer(
    Seq(new PatternReplaceCharFilter("(\\d+)-(\\d+)", "$1$2")), LangAnalyzers.StandardNoStop)
  override def tokenize(text: String): Iterator[Token] = chain.tokenize(text)
}

/** PathHierarchyTokenizer as a whole-field analyzer. */
object PathHierarchyAnalyzer extends Analyzer {
  override def tokenize(text: String): Iterator[Token] = MiscFilters.pathHierarchy(text.trim)
}

/** ReversePathHierarchyTokenizer as a whole-field analyzer. */
object ReversePathHierarchyAnalyzer extends Analyzer {
  override def tokenize(text: String): Iterator[Token] = MiscFilters.reversePathHierarchy(text.trim)
}

/** PatternTokenizer splitting on commas (PatternTokenizerFactory shape). */
object PatternCsvAnalyzer extends Analyzer {
  override def tokenize(text: String): Iterator[Token] =
    MiscFilters.patternTokenize(text, ",\\s*")
}

/** Classic chain + ScandinavianFoldingFilter. */
object ScandinavianFoldAnalyzer extends Analyzer {
  override def tokenize(text: String): Iterator[Token] =
    LangAnalyzers.StandardNoStop.tokenize(text)
      .map(t => t.copy(term = MiscFilters.scandinavianFold(t.term)))
}

/** Classic chain + ScandinavianNormalizationFilter. */
object ScandinavianNormAnalyzer extends Analyzer {
  override def tokenize(text: String): Iterator[Token] =
    LangAnalyzers.StandardNoStop.tokenize(text)
      .map(t => t.copy(term = MiscFilters.scandinavianNormalize(t.term)))
}

/** WhitespaceTokenizer -> HyphenatedWordsFilter -> lowercase (the factory
  * docs' recommended chain: the whitespace front preserves the trailing
  * hyphen the filter keys on). */
object HyphenatedAnalyzer extends Analyzer {
  override def tokenize(text: String): Iterator[Token] =
    MiscFilters.hyphenatedWords(WhitespaceAnalyzer.tokenize(text))
      .map(t => t.copy(term = t.term.toLowerCase))
}

/** KeywordRepeatFilter + PorterStemFilter + RemoveDuplicates: original and
  * stem land at the SAME position (both searchable). */
object KeywordRepeatAnalyzer extends Analyzer {
  override def tokenize(text: String): Iterator[Token] =
    MiscFilters.keywordRepeatStem(LangAnalyzers.StandardNoStop.tokenize(text),
      TokenFilters.PorterStemmer.stem)
}

/** StemmerOverrideFilter fixture: "running"->"sprint" override, Porter
  * for the rest. */
object StemmerOverrideAnalyzer extends Analyzer {
  override def tokenize(text: String): Iterator[Token] =
    MiscFilters.stemmerOverride(LangAnalyzers.StandardNoStop.tokenize(text),
      Map("running" -> "sprint"), TokenFilters.PorterStemmer.stem)
}
