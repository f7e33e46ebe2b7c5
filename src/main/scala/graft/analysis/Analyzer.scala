package graft.analysis

/** Analyzers: deterministic `String => Iterator[Token]` functions, shared
  * verbatim between the index build and the query path (the reference requires
  * the same chain at both ends — QueryParserBase.GetFieldQuery runs the
  * analyzer on query text, /root/reference/src/Lucene.Net.QueryParser/Classic/QueryParserBase.cs).
  *
  * StandardAnalyzer chain per
  * /root/reference/src/Lucene.Net.Core/Analysis/Standard/StandardAnalyzer.cs:107-115:
  *   StandardTokenizer(maxTokenLength=255) -> StandardFilter -> LowerCaseFilter -> StopFilter.
  */
trait Analyzer extends Serializable {
  /** Full chain: text -> tokens with absolute positions. */
  def tokenize(text: String): Iterator[Token]
  /** Analyze a query string into bare terms (positions tracked for phrases). */
  final def terms(text: String): List[String] = tokenize(text).map(_.term).toList
  /** Count of emitted tokens (= BM25 field length). Overridden with
    * allocation-free implementations on the hot build path.
    */
  def tokenCount(text: String): Int = {
    var n = 0
    val it = tokenize(text)
    while (it.hasNext) { it.next(); n += 1 }
    n
  }
}

object StandardAnalyzer extends Analyzer {
  /** English stop set, case-sensitive, per
    * /root/reference/src/Lucene.Net.Core/Analysis/StopAnalyzer.cs:134-137.
    */
  val EnglishStopWords: Set[String] = Set(
    "a", "an", "and", "are", "as", "at", "be", "but", "by", "for", "if",
    "in", "into", "is", "it", "no", "not", "of", "on", "or", "such", "that",
    "the", "their", "then", "there", "these", "they", "this", "to", "was",
    "will", "with")

  val MaxTokenLength = 255 // StandardAnalyzer.cs:123 DEFAULT_MAX_TOKEN_LENGTH

  /** Strip trailing 's (or 'S) from APOSTROPHE tokens; remove dots from ACRONYM
    * tokens (/root/reference/src/Lucene.Net.Core/Analysis/Standard/StandardFilter.cs:51-80).
    * ACRONYM_DEP is converted to HOST with the trailing '.' removed
    * (StandardTokenizer.cs:182-192, replaceInvalidAcronym path).
    */
  private[analysis] def standardFilter(t: RawToken): RawToken = t.tokenType match {
    case TokenType.APOSTROPHE =>
      val s = t.text
      if (s.length >= 2 && s.charAt(s.length - 2) == '\'' &&
          (s.charAt(s.length - 1) == 's' || s.charAt(s.length - 1) == 'S'))
        t.copy(text = s.substring(0, s.length - 2))
      else t
    case TokenType.ACRONYM =>
      t.copy(text = t.text.replace(".", ""))
    case TokenType.ACRONYM_DEP =>
      // StandardTokenizer (replaceInvalidAcronym=true) re-types as HOST, drops trailing dot
      t.copy(text = t.text.substring(0, t.text.length - 1), tokenType = TokenType.HOST)
    case _ => t
  }

  private[analysis] def lowerCase(s: String): String = {
    // LowerCaseFilter.cs:34-47 — per-char lowering
    val arr = s.toCharArray
    var i = 0
    while (i < arr.length) { arr(i) = Character.toLowerCase(arr(i)); i += 1 }
    new String(arr)
  }

  /** Allocation-free field-length count: scans tokens, applies the 255-char
    * skip and the stopword filter by comparing the (dot-skipping, possessive-
    * stripping, lowercased) token region against the stop set without
    * building strings. Equals tokenize(text).length by construction
    * (property-tested in AnalysisSpec).
    */
  override def tokenCount(text: String): Int = {
    var n = 0
    val raw = ClassicScanner.scan(text)
    while (raw.hasNext) {
      val r = raw.next()
      if (r.end - r.start <= MaxTokenLength) {
        // region to stop-check: strip trailing 's / 'S for APOSTROPHE
        var end = r.end
        if (r.tokenType == TokenType.APOSTROPHE && end - r.start >= 2 &&
            text.charAt(end - 2) == '\'' &&
            (text.charAt(end - 1) == 's' || text.charAt(end - 1) == 'S')) end -= 2
        val skipDots = r.tokenType == TokenType.ACRONYM
        val dropLast = r.tokenType == TokenType.ACRONYM_DEP // trailing '.'
        if (!isStopRegion(text, r.start, if (dropLast) end - 1 else end, skipDots)) n += 1
      }
    }
    n
  }

  private def isStopRegion(s: CharSequence, start: Int, end: Int, skipDots: Boolean): Boolean = {
    // effective lowercase chars of the region (minus dots when skipDots)
    var len = 0
    var i = start
    while (i < end) { if (!(skipDots && s.charAt(i) == '.')) len += 1; i += 1 }
    if (len < 1 || len > 5) return false // longest stop word is 5 chars ("their"/"these"/"there")
    val buf = new Array[Char](len)
    var k = 0
    i = start
    while (i < end) {
      val c = s.charAt(i)
      if (!(skipDots && c == '.')) { buf(k) = Character.toLowerCase(c); k += 1 }
      i += 1
    }
    EnglishStopWords.contains(new String(buf))
  }

  override def tokenize(text: String): Iterator[Token] = new Iterator[Token] {
    private val raw = ClassicScanner.scan(text)
    private var pos = -1       // absolute position; DocInverterPerField accumulation
    private var pendingIncr = 0 // skipped positions from too-long tokens + stopwords
    private var nextTok: Token = null
    advance()

    private def advance(): Unit = {
      nextTok = null
      while (nextTok == null && raw.hasNext) {
        val r0 = raw.next()
        if (r0.end - r0.start > MaxTokenLength) {
          pendingIncr += 1 // StandardTokenizer.cs:200-204: skipped too-long token still bumps posIncr
        } else {
          val r = standardFilter(r0)
          val term = lowerCase(r.text)
          if (EnglishStopWords.contains(term)) {
            pendingIncr += 1 // StopFilter.cs:128-146 skippedPositions accumulation
          } else {
            pos += 1 + pendingIncr
            pendingIncr = 0
            nextTok = Token(term, pos, r.start, r.end, r.tokenType)
          }
        }
      }
    }

    override def hasNext: Boolean = nextTok != null
    override def next(): Token = { val t = nextTok; advance(); t }
  }
}

/** Lowercased alphanumeric-run tokenizer, chosen because it is expressible
  * identically in ANSI SQL as `regexp_extract_all(lower(text), '[a-z0-9]+')` —
  * used for the DuckDB-oracle-checked query set. Catalog analog: the reference's
  * Simple/Letter analyzers (/root/reference/src/Lucene.Net.Core/Analysis/SimpleAnalyzer.cs).
  */
object SimpleAnalyzer extends Analyzer {
  override def tokenCount(text: String): Int = {
    var n = 0
    var i = 0
    var in = false
    while (i < text.length) {
      val c = Character.toLowerCase(text.charAt(i))
      val tok = (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')
      if (tok && !in) n += 1
      in = tok
      i += 1
    }
    n
  }

  override def tokenize(text: String): Iterator[Token] = new Iterator[Token] {
    private val s = text
    private var i = 0
    private var pos = -1
    private var nextTok: Token = null
    advance()

    @inline private def isTok(c: Char): Boolean =
      (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')

    private def advance(): Unit = {
      nextTok = null
      while (nextTok == null && i < s.length) {
        val c0 = Character.toLowerCase(s.charAt(i))
        if (isTok(c0)) {
          val start = i
          val sb = new java.lang.StringBuilder
          var c = c0
          while (i < s.length && isTok(c)) {
            sb.append(c); i += 1
            if (i < s.length) c = Character.toLowerCase(s.charAt(i))
          }
          pos += 1
          nextTok = Token(sb.toString, pos, start, i, TokenType.ALPHANUM)
        } else i += 1
      }
    }

    override def hasNext: Boolean = nextTok != null
    override def next(): Token = { val t = nextTok; advance(); t }
  }
}

/** Whitespace-split tokenizer (reference: Analysis/WhitespaceAnalyzer.cs). */
object WhitespaceAnalyzer extends Analyzer {
  override def tokenize(text: String): Iterator[Token] = {
    var pos = -1
    var off = 0
    val out = scala.collection.mutable.ArrayBuffer.empty[Token]
    val n = text.length
    var i = 0
    while (i < n) {
      while (i < n && Character.isWhitespace(text.charAt(i))) i += 1
      off = i
      while (i < n && !Character.isWhitespace(text.charAt(i))) i += 1
      if (i > off) { pos += 1; out += Token(text.substring(off, i), pos, off, i, TokenType.ALPHANUM) }
    }
    out.iterator
  }
}

/** Whole-value-as-one-token analyzer (reference: Analysis/KeywordAnalyzer.cs)
  * — the StringField/not-tokenized indexing mode.
  */
object KeywordAnalyzer extends Analyzer {
  override def tokenize(text: String): Iterator[Token] =
    if (text == null || text.isEmpty) Iterator.empty
    else Iterator(Token(text, 0, 0, text.length, TokenType.ALPHANUM))
}

/** Letter-run lowercase + English stop set (reference: Analysis/StopAnalyzer.cs). */
object StopAnalyzer extends Analyzer {
  override def tokenize(text: String): Iterator[Token] = {
    var pos = -1
    var pending = 0
    SimpleAnalyzer.tokenize(text).flatMap { t =>
      if (StandardAnalyzer.EnglishStopWords.contains(t.term)) { pending += 1; Iterator.empty }
      else {
        pos += 1 + pending
        pending = 0
        Iterator(t.copy(position = pos))
      }
    }
  }
}

/** Whitespace tokens with a `term|N` payload suffix — the
  * DelimitedPayloadTokenFilter + IntegerEncoder chain
  * (/root/reference/src/Lucene.Net.Analysis.Common/Analysis/Payloads/
  * DelimitedPayloadTokenFilter.cs, IntegerEncoder.cs, PayloadHelper.cs
  * EncodeInt = 4-byte big-endian): "alpha|5" emits term "alpha" (lowercased,
  * LowerCaseFilter placement before the payload filter) carrying payload
  * bytes [0,0,0,5]; a token without the delimiter carries no payload.
  */
object DelimitedPayloadAnalyzer extends Analyzer {
  val Delimiter = '|'

  def encodeInt(v: Int): Array[Byte] =
    Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  def decodeInt(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

  override def tokenize(text: String): Iterator[Token] =
    WhitespaceAnalyzer.tokenize(text).map { t =>
      val di = t.term.indexOf(Delimiter)
      if (di < 0) t.copy(term = t.term.toLowerCase)
      else {
        val word = t.term.substring(0, di).toLowerCase
        val num = try t.term.substring(di + 1).toInt catch { case _: NumberFormatException => 0 }
        t.copy(term = word, payload = encodeInt(num))
      }
    }
}

object Analyzers {
  /** Stable names for config/serialization across executors. */
  def byName(name: String): Analyzer = name match {
    case "standard" => StandardAnalyzer
    case "simple" => SimpleAnalyzer
    case "whitespace" => WhitespaceAnalyzer
    case "keyword" => KeywordAnalyzer
    case "stop" => StopAnalyzer
    case "english" => EnglishAnalyzer // standard chain + Porter stemming
    case "english_snowball" => EnglishSnowballAnalyzer // Porter2 (Snowball English)
    case "english_kstem" => KStemAnalyzer // Krovetz dictionary-backed stemming (En/KStemFilter.cs)
    case "english_minimal" => EnglishMinimalAnalyzer // plural-only stemming (En/EnglishMinimalStemmer.cs)
    case "english_possessive" => EnglishPossessiveAnalyzer // 's strip incl. U+2019 (En/EnglishPossessiveFilter.cs)
    case "dutch" => DutchAnalyzer // classic -> Dutch stops -> Snowball Dutch
    case "swedish" => SwedishAnalyzer // classic -> Swedish stops -> Snowball Swedish
    case "russian" => RussianAnalyzer // classic -> Russian stops -> Snowball Russian
    case "danish" => DanishAnalyzer // classic -> Danish stops -> Snowball Danish
    case "norwegian" => NorwegianAnalyzer // classic -> Norwegian stops -> Snowball Norwegian
    case "cjk" => CjkAnalyzer // classic -> CJK bigrams -> stops (CJKAnalyzer.cs)
    case "finnish" => FinnishAnalyzer // classic -> Finnish stops -> SNOWBALL Finnish (Fi default)
    case "finnish_light" => FinnishLightAnalyzer // FinnishLightStemFilter variant (Fi)
    case "hungarian" => HungarianAnalyzer // classic -> Hungarian stops -> SNOWBALL Hungarian (Hu default)
    case "hungarian_light" => HungarianLightAnalyzer // HungarianLightStemFilter variant (Hu)
    case "czech" => CzechAnalyzer // classic -> Czech stops -> CzechStemmer (Cz)
    case "bulgarian" => BulgarianAnalyzer // classic -> Bulgarian stops -> BulgarianStemmer (Bg)
    case "hindi" => HindiAnalyzer // letter+mark -> normalize -> stops -> HindiStemmer (Hi)
    case "arabic" => ArabicAnalyzer // letter+mark -> stops -> normalize -> ArabicStemmer (Ar)
    case "persian" => PersianAnalyzer // letter+mark -> normalize -> stops (Fa)
    case "indonesian" => IndonesianAnalyzer // classic -> Indonesian stops -> IndonesianStemmer (Id)
    case "sorani" => SoraniAnalyzer // letter+mark -> normalize -> stops -> SoraniStemmer (Ckb)
    case "greek" => GreekAnalyzer // classic -> Greek lowercase/fold -> stops -> GreekStemmer (El)
    case "thai" => ThaiAnalyzer // classic -> BreakIterator word split -> Thai stops (Th)
    case "romanian" => RomanianAnalyzer // classic -> Romanian stops -> SNOWBALL Romanian (Ro)
    case "shingle" => ShingleAnalyzer // simple -> word bigrams + unigrams
    case "ngram3" => Ngram3Analyzer // simple -> char trigrams
    case "ascii" => AsciiFoldingAnalyzer // classic -> ASCII folding
    case "synonym_fixture" => SynonymFixtureAnalyzer // simple -> fixed synonym map
    case "soundex" => SoundexAnalyzer // simple -> Soundex injection (phonetic)
    case "refined_soundex" => RefinedSoundexAnalyzer // simple -> RefinedSoundex injection
    case "word_delimiter" => WordDelimiterAnalyzer // whitespace -> WDF defaults -> lowercase
    case "edge23" => Edge23Analyzer // simple -> edge ngrams (2,3)
    case "commongrams" => CommonGramsAnalyzer // simple -> common-word bigram overlays
    case "compound_fixture" => CompoundFixtureAnalyzer // simple -> dictionary decompounding
    case "german" => GermanAnalyzer // classic -> German stops -> normalize -> light stem
    case "german_snowball" => GermanSnowballAnalyzer // full Snowball German (contrib SnowballAnalyzer("German"))
    case "german2_snowball" => German2SnowballAnalyzer // Snowball German2 (ae/oe/ue folding)
    case "spanish_snowball" => SpanishSnowballAnalyzer // full Snowball Spanish
    case "italian_snowball" => ItalianSnowballAnalyzer // full Snowball Italian
    case "portuguese_snowball" => PortugueseSnowballAnalyzer // full Snowball Portuguese
    case "french_snowball" => FrenchSnowballAnalyzer // full Snowball French
    case "porter_snowball" => PorterSnowballAnalyzer // generated classic-1980 Porter program
    case "lovins_snowball" => LovinsSnowballAnalyzer // Lovins (1968) program
    case "kp_snowball" => KpSnowballAnalyzer // Kraaij-Pohlmann Dutch program
    case "french" => FrenchAnalyzer // classic -> elision -> French stops -> light stem
    case "french_minimal" => FrenchMinimalAnalyzer // FrenchMinimalStemFilter variant
    case "spanish" => SpanishAnalyzer // classic -> Spanish stops -> light stem
    case "italian" => ItalianAnalyzer // classic -> elision -> Italian stops -> light stem
    case "portuguese" => PortugueseAnalyzer // classic -> Portuguese stops -> light stem
    case "delimited_payload" => DelimitedPayloadAnalyzer
    case "latvian" => LatvianAnalyzer // classic -> Latvian stops -> LatvianStemmer (Lv)
    case "brazilian" => BrazilianAnalyzer // classic -> Brazilian stops -> BrazilianStemmer (Br)
    case "galician" => GalicianAnalyzer // classic -> Galician stops -> GalicianStemmer (Gl)
    case "galician_minimal" => GalicianMinimalAnalyzer // RSLP-S plural-only variant (Gl)
    case "irish" => IrishAnalyzer // hyphenation stops -> elision -> Irish lower -> stops -> SNOWBALL Irish (Ga)
    case "turkish" => TurkishAnalyzer // apostrophe -> Turkish lower -> stops -> SNOWBALL Turkish (Tr)
    case "catalan" => CatalanAnalyzer // elision -> stops -> SNOWBALL Catalan (Ca)
    case "basque" => BasqueAnalyzer // stops -> SNOWBALL Basque (Eu)
    case "armenian" => ArmenianAnalyzer // stops -> SNOWBALL Armenian (Hy)
    case "chinese" => ChineseAnalyzer // unigram CJK + ChineseFilter, NO stop gaps (Cn)
    case "html_strip" => HtmlStripAnalyzer // HTMLStripCharFilter -> standard (CharFilter dir)
    case "mapping_fixture" => MappingFixtureAnalyzer // MappingCharFilter ph->f
    case "patrep_fixture" => PatternReplaceFixtureAnalyzer // PatternReplaceCharFilter
    case "path_hier" => PathHierarchyAnalyzer // PathHierarchyTokenizer (Path dir)
    case "path_hier_rev" => ReversePathHierarchyAnalyzer // ReversePathHierarchyTokenizer
    case "pattern_csv" => PatternCsvAnalyzer // PatternTokenizer split on commas
    case "scandinavian_fold" => ScandinavianFoldAnalyzer // ScandinavianFoldingFilter
    case "scandinavian_norm" => ScandinavianNormAnalyzer // ScandinavianNormalizationFilter
    case "hyphenated" => HyphenatedAnalyzer // whitespace -> HyphenatedWordsFilter
    case "keyword_repeat" => KeywordRepeatAnalyzer // KeywordRepeat + Porter + RemoveDuplicates
    case "stemmer_override" => StemmerOverrideAnalyzer // StemmerOverrideFilter + Porter
    case "wikipedia" => WikipediaAnalyzer // WikipediaTokenizer TOKENS_ONLY (Wikipedia dir)
    case "wikipedia_untok" => WikipediaUntokenizedAnalyzer // UNTOKENIZED_ONLY il+c collapse
    case "uax_url_email" => UaxUrlEmailAnalyzer // UAX29URLEmailAnalyzer: URLs/emails single tokens
    case "hunspell_fixture" => HunspellFixtureAnalyzer // Hunspell affix-dictionary stemming
    case "hunspell_iconv" => HunspellIconvAnalyzer // ICONV + CIRCUMFIX machinery
    case "hyph_compound" => HyphCompoundFixtureAnalyzer // Liang hyphenation decompounding
    case other => throw new IllegalArgumentException(s"unknown analyzer: $other")
  }

  /** The contrib SnowballAnalyzer's reflection dispatch: program NAME ->
    * chain (contrib/Snowball/Lucene.Net.Snowball/SnowballAnalyzer.cs
    * instantiates `SF.Snowball.Ext.{name}Stemmer` by reflection). Every
    * generated program the reference ships resolves here; names are the
    * exact .cs class prefixes. */
  def snowball(program: String): Analyzer = program match {
    case "Danish" => DanishAnalyzer
    case "Dutch" => DutchAnalyzer
    case "English" => EnglishSnowballAnalyzer // Porter2
    case "Finnish" => FinnishAnalyzer
    case "French" => FrenchSnowballAnalyzer
    case "German" => GermanSnowballAnalyzer
    case "German2" => German2SnowballAnalyzer
    case "Hungarian" => HungarianAnalyzer
    case "Italian" => ItalianSnowballAnalyzer
    case "Kp" => KpSnowballAnalyzer
    case "Lovins" => LovinsSnowballAnalyzer
    case "Norwegian" => NorwegianAnalyzer
    case "Porter" => PorterSnowballAnalyzer
    case "Portuguese" => PortugueseSnowballAnalyzer
    case "Romanian" => RomanianAnalyzer
    case "Russian" => RussianAnalyzer
    case "Spanish" => SpanishSnowballAnalyzer
    case "Swedish" => SwedishAnalyzer
    case "Turkish" => TurkishAnalyzer
    case other => throw new IllegalArgumentException(s"unknown Snowball program: $other")
  }
}
