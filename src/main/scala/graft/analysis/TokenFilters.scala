package graft.analysis

/** Token-filter combinators over `Iterator[Token]` — the Analysis.Common
  * catalog analogs (SURVEY.md §2.1 "other analyzers" row). Each is a pure
  * `Iterator[Token] => Iterator[Token]` stage, so chains compose exactly like
  * the reference's TokenFilter stacks
  * (/root/reference/src/Lucene.Net.Analysis.Common/Analysis/):
  *
  *  - [[PorterStemFilter]] — En/PorterStemFilter.cs (Porter 1980 algorithm)
  *  - [[AsciiFoldingFilter]] — Miscellaneous/ASCIIFoldingFilter.cs (Latin-1 +
  *    Latin Extended-A subset)
  *  - [[ShingleFilter]] — Shingle/ShingleFilter.cs (word n-grams)
  *  - [[NGramFilter]] — Ngram/NGramTokenFilter.cs (char n-grams per token)
  *  - [[SynonymFilter]] — Synonym/SynonymFilter.cs (map-based injection at
  *    the same position, the posIncr=0 overlap semantics)
  */
object TokenFilters {

  // --------------------------------------------------------------- Porter

  /** The Porter stemming algorithm (M.F. Porter, "An algorithm for suffix
    * stripping", Program 14(3) 1980) — the same published algorithm the
    * reference's En/PorterStemmer.cs implements. Clean-room from the paper;
    * PorterSpec pins the paper's example vectors.
    */
  object PorterStemmer {

    private def isVowel(w: String, i: Int): Boolean = w.charAt(i) match {
      case 'a' | 'e' | 'i' | 'o' | 'u' => true
      case 'y' => i > 0 && !isVowel(w, i - 1)
      case _ => false
    }

    /** m() — the number of VC sequences in [C](VC)^m[V]. */
    private def measure(w: String): Int = {
      var m = 0
      var i = 0
      val n = w.length
      while (i < n && !isVowel(w, i)) i += 1 // optional initial C
      while (i < n) {
        while (i < n && isVowel(w, i)) i += 1 // V run
        if (i < n) { m += 1; while (i < n && !isVowel(w, i)) i += 1 } // C run
      }
      m
    }

    private def containsVowel(w: String): Boolean =
      (0 until w.length).exists(isVowel(w, _))

    private def endsDoubleC(w: String): Boolean =
      w.length >= 2 && w.charAt(w.length - 1) == w.charAt(w.length - 2) &&
        !isVowel(w, w.length - 1)

    /** *o — stem ends cvc where the final c is not w, x or y. */
    private def endsCvc(w: String): Boolean = {
      val n = w.length
      n >= 3 && !isVowel(w, n - 3) && isVowel(w, n - 2) && !isVowel(w, n - 1) &&
        "wxy".indexOf(w.charAt(n - 1)) < 0
    }

    def stem(word: String): String = {
      if (word.length <= 2) return word
      var w = word

      // step 1a
      if (w.endsWith("sses")) w = w.dropRight(2)
      else if (w.endsWith("ies")) w = w.dropRight(2)
      else if (w.endsWith("ss")) ()
      else if (w.endsWith("s")) w = w.dropRight(1)

      // step 1b
      var extraStep1b = false
      if (w.endsWith("eed")) {
        if (measure(w.dropRight(3)) > 0) w = w.dropRight(1)
      } else if (w.endsWith("ed") && containsVowel(w.dropRight(2))) {
        w = w.dropRight(2); extraStep1b = true
      } else if (w.endsWith("ing") && containsVowel(w.dropRight(3))) {
        w = w.dropRight(3); extraStep1b = true
      }
      if (extraStep1b) {
        if (w.endsWith("at") || w.endsWith("bl") || w.endsWith("iz")) w = w + "e"
        else if (endsDoubleC(w) && !(w.endsWith("l") || w.endsWith("s") || w.endsWith("z")))
          w = w.dropRight(1)
        else if (measure(w) == 1 && endsCvc(w)) w = w + "e"
      }

      // step 1c
      if (w.endsWith("y") && containsVowel(w.dropRight(1))) w = w.dropRight(1) + "i"

      // step 2 (m > 0 suffix mappings)
      val step2 = List(
        "ational" -> "ate", "tional" -> "tion", "enci" -> "ence", "anci" -> "ance",
        "izer" -> "ize", "abli" -> "able", "alli" -> "al", "entli" -> "ent",
        "eli" -> "e", "ousli" -> "ous", "ization" -> "ize", "ation" -> "ate",
        "ator" -> "ate", "alism" -> "al", "iveness" -> "ive", "fulness" -> "ful",
        "ousness" -> "ous", "aliti" -> "al", "iviti" -> "ive", "biliti" -> "ble")
      step2.find { case (s, _) => w.endsWith(s) }.foreach { case (s, r) =>
        val stem = w.substring(0, w.length - s.length)
        if (measure(stem) > 0) w = stem + r
      }

      // step 3 (m > 0)
      val step3 = List(
        "icate" -> "ic", "ative" -> "", "alize" -> "al", "iciti" -> "ic",
        "ical" -> "ic", "ful" -> "", "ness" -> "")
      step3.find { case (s, _) => w.endsWith(s) }.foreach { case (s, r) =>
        val stem = w.substring(0, w.length - s.length)
        if (measure(stem) > 0) w = stem + r
      }

      // step 4 (m > 1)
      val step4 = List("al", "ance", "ence", "er", "ic", "able", "ible", "ant",
        "ement", "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive", "ize")
      step4.find(w.endsWith).foreach { s =>
        val stem = w.substring(0, w.length - s.length)
        val ok = s != "ion" || (stem.nonEmpty && (stem.endsWith("s") || stem.endsWith("t")))
        if (ok && measure(stem) > 1) w = stem
      }

      // step 5a
      if (w.endsWith("e")) {
        val stem = w.dropRight(1)
        val m = measure(stem)
        if (m > 1 || (m == 1 && !endsCvc(stem))) w = stem
      }
      // step 5b
      if (measure(w) > 1 && endsDoubleC(w) && w.endsWith("l")) w = w.dropRight(1)
      w
    }
  }

  /** Stem each token in place (PorterStemFilter semantics: position/offsets
    * unchanged). */
  def porterStem(in: Iterator[Token]): Iterator[Token] =
    in.map(t => t.copy(term = PorterStemmer.stem(t.term)))

  // ------------------------------------------------- English (En/) extras

  /** EnglishPossessiveFilter (En/EnglishPossessiveFilter.cs:69-73): strip a
    * trailing 's / 'S where the apostrophe is ASCII ', U+2019 RIGHT SINGLE
    * QUOTATION MARK, or U+FF07 FULLWIDTH APOSTROPHE (the 3.6+ behavior).
    * Complements StandardFilter, which only handles ASCII ' on
    * APOSTROPHE-typed classic-grammar tokens. */
  def englishPossessive(in: Iterator[Token]): Iterator[Token] =
    in.map { t =>
      val s = t.term
      val n = s.length
      if (n >= 2 && (s.charAt(n - 1) == 's' || s.charAt(n - 1) == 'S') &&
          (s.charAt(n - 2) == '\'' || s.charAt(n - 2) == '’' || s.charAt(n - 2) == '＇'))
        t.copy(term = s.substring(0, n - 2))
      else t
    }

  /** EnglishMinimalStemmer (En/EnglishMinimalStemmer.cs:33-59): plural-only
    * stemming — drop a final 's' except after 'u'/'s'; '-ies' -> 'y' for
    * length > 3 unless preceded by a/e; keep '-Xes' where X in {i,a,o,e}. */
  def englishMinimalStemWord(s: String): String = {
    val len = s.length
    if (len < 3 || s.charAt(len - 1) != 's') return s
    s.charAt(len - 2) match {
      case 'u' | 's' => s
      case 'e' =>
        if (len > 3 && s.charAt(len - 3) == 'i' && s.charAt(len - 4) != 'a' && s.charAt(len - 4) != 'e')
          s.substring(0, len - 3) + "y"
        else if (s.charAt(len - 3) == 'i' || s.charAt(len - 3) == 'a' ||
                 s.charAt(len - 3) == 'o' || s.charAt(len - 3) == 'e') s
        else s.substring(0, len - 1)
      case _ => s.substring(0, len - 1)
    }
  }

  def englishMinimalStem(in: Iterator[Token]): Iterator[Token] =
    in.map(t => t.copy(term = englishMinimalStemWord(t.term)))

  /** KStemFilter (En/KStemFilter.cs): Krovetz dictionary-backed stemming;
    * one mutable [[KStemmer]] per stream, as the reference keeps one per
    * filter instance. Lowercase input required (KStemmer.cs isAlpha). */
  def kstem(in: Iterator[Token], dict: Map[String, KStem.DictEntry] = KStem.defaultDict): Iterator[Token] = {
    val st = new KStemmer(dict)
    in.map(t => t.copy(term = st.stem(t.term)))
  }

  // -------------------------------------------------------- ASCII folding

  /** Latin-1 Supplement + Latin Extended-A folding to ASCII (a documented
    * SUBSET of ASCIIFoldingFilter.cs's full table — covers the accented
    * Latin alphabets of European web text). */
  def foldAscii(s: String): String = {
    val sb = new StringBuilder(s.length)
    s.foreach { c =>
      val f: String = c match {
        case c if c < 0x80 => c.toString
        case 'à' | 'á' | 'â' | 'ã' | 'ä' | 'å' | 'ā' | 'ă' | 'ą' => "a"
        case 'À' | 'Á' | 'Â' | 'Ã' | 'Ä' | 'Å' | 'Ā' | 'Ă' | 'Ą' => "A"
        case 'ç' | 'ć' | 'ĉ' | 'ċ' | 'č' => "c"
        case 'Ç' | 'Ć' | 'Ĉ' | 'Ċ' | 'Č' => "C"
        case 'ď' | 'đ' => "d"
        case 'Ď' | 'Đ' => "D"
        case 'è' | 'é' | 'ê' | 'ë' | 'ē' | 'ĕ' | 'ė' | 'ę' | 'ě' => "e"
        case 'È' | 'É' | 'Ê' | 'Ë' | 'Ē' | 'Ĕ' | 'Ė' | 'Ę' | 'Ě' => "E"
        case 'ĝ' | 'ğ' | 'ġ' | 'ģ' => "g"
        case 'Ĝ' | 'Ğ' | 'Ġ' | 'Ģ' => "G"
        case 'ĥ' | 'ħ' => "h"
        case 'Ĥ' | 'Ħ' => "H"
        case 'ì' | 'í' | 'î' | 'ï' | 'ĩ' | 'ī' | 'ĭ' | 'į' | 'ı' => "i"
        case 'Ì' | 'Í' | 'Î' | 'Ï' | 'Ĩ' | 'Ī' | 'Ĭ' | 'Į' | 'İ' => "I"
        case 'ĵ' => "j"
        case 'Ĵ' => "J"
        case 'ķ' => "k"
        case 'Ķ' => "K"
        case 'ĺ' | 'ļ' | 'ľ' | 'ŀ' | 'ł' => "l"
        case 'Ĺ' | 'Ļ' | 'Ľ' | 'Ŀ' | 'Ł' => "L"
        case 'ñ' | 'ń' | 'ņ' | 'ň' => "n"
        case 'Ñ' | 'Ń' | 'Ņ' | 'Ň' => "N"
        case 'ò' | 'ó' | 'ô' | 'õ' | 'ö' | 'ø' | 'ō' | 'ŏ' | 'ő' => "o"
        case 'Ò' | 'Ó' | 'Ô' | 'Õ' | 'Ö' | 'Ø' | 'Ō' | 'Ŏ' | 'Ő' => "O"
        case 'ŕ' | 'ŗ' | 'ř' => "r"
        case 'Ŕ' | 'Ŗ' | 'Ř' => "R"
        case 'ś' | 'ŝ' | 'ş' | 'š' => "s"
        case 'Ś' | 'Ŝ' | 'Ş' | 'Š' => "S"
        case 'ţ' | 'ť' | 'ŧ' => "t"
        case 'Ţ' | 'Ť' | 'Ŧ' => "T"
        case 'ù' | 'ú' | 'û' | 'ü' | 'ũ' | 'ū' | 'ŭ' | 'ů' | 'ű' | 'ų' => "u"
        case 'Ù' | 'Ú' | 'Û' | 'Ü' | 'Ũ' | 'Ū' | 'Ŭ' | 'Ů' | 'Ű' | 'Ų' => "U"
        case 'ŵ' => "w"
        case 'Ŵ' => "W"
        case 'ý' | 'ÿ' | 'ŷ' => "y"
        case 'Ý' | 'Ÿ' | 'Ŷ' => "Y"
        case 'ź' | 'ż' | 'ž' => "z"
        case 'Ź' | 'Ż' | 'Ž' => "Z"
        case 'æ' => "ae"
        case 'Æ' => "AE"
        case 'œ' => "oe"
        case 'Œ' => "OE"
        case 'ß' => "ss"
        case 'þ' => "th"
        case 'Þ' => "TH"
        case 'ð' => "d"
        case 'Ð' => "D"
        case other => other.toString
      }
      sb.append(f)
    }
    sb.toString
  }

  def asciiFold(in: Iterator[Token]): Iterator[Token] =
    in.map(t => t.copy(term = foldAscii(t.term)))

  // -------------------------------------------------------------- shingles

  /** Word n-grams of sizes [2, maxSize], space-joined, optionally keeping the
    * unigrams (ShingleFilter defaults: maxShingleSize=2, outputUnigrams=true).
    * Shingle position = position of its first token.
    */
  def shingles(in: Iterator[Token], maxSize: Int = 2,
               outputUnigrams: Boolean = true): Iterator[Token] = {
    val toks = in.toVector
    toks.indices.iterator.flatMap { i =>
      val uni = if (outputUnigrams) Iterator.single(toks(i)) else Iterator.empty
      val grams = (2 to maxSize).iterator.flatMap { k =>
        if (i + k <= toks.length)
          Some(toks(i).copy(
            term = toks.slice(i, i + k).map(_.term).mkString(" "),
            endOffset = toks(i + k - 1).endOffset))
        else None
      }
      uni ++ grams
    }
  }

  // -------------------------------------------------------------- n-grams

  /** Character n-grams [minGram, maxGram] of each token, all at the token's
    * position (NGramTokenFilter semantics). */
  def ngrams(in: Iterator[Token], minGram: Int, maxGram: Int): Iterator[Token] =
    in.flatMap { t =>
      (minGram to maxGram).iterator.flatMap { g =>
        (0 to t.term.length - g).iterator.map(i => t.copy(term = t.term.substring(i, i + g)))
      }
    }

  // -------------------------------------------------------------- phonetic

  /** American Soundex (the US-census algorithm; Lucene ships it through
    * the companion analysis-phonetic module's PhoneticFilter + commons-
    * codec — that module is absent from this reference tree, so these
    * encoders are catalog surplus implementing the same published
    * algorithms): first
    * letter kept, consonants coded b f p v=1, c g j k q s x z=2, d t=3,
    * l=4, m n=5, r=6; vowels separate duplicate codes, h/w do NOT (the
    * census H/W rule); padded/truncated to letter + 3 digits. Empty/
    * non-alphabetic input returns the term unchanged. */
  def soundex(term: String): String = {
    val s = term.toUpperCase.filter(c => c >= 'A' && c <= 'Z')
    if (s.isEmpty) return term
    @inline def code(c: Char): Char = c match {
      case 'B' | 'F' | 'P' | 'V' => '1'
      case 'C' | 'G' | 'J' | 'K' | 'Q' | 'S' | 'X' | 'Z' => '2'
      case 'D' | 'T' => '3'
      case 'L' => '4'
      case 'M' | 'N' => '5'
      case 'R' => '6'
      case _ => '0' // vowels + H/W/Y
    }
    val sb = new StringBuilder
    sb.append(s.charAt(0))
    var lastCode = code(s.charAt(0))
    var i = 1
    while (i < s.length && sb.length < 4) {
      val c = s.charAt(i)
      val k = code(c)
      if (k != '0') {
        if (k != lastCode) sb.append(k)
        lastCode = k
      } else if (c != 'H' && c != 'W') {
        lastCode = '0' // a vowel separates equal codes; H/W do not
      }
      i += 1
    }
    while (sb.length < 4) sb.append('0')
    sb.toString
  }

  /** PhoneticFilter semantics (inject = true, the reference default): the
    * phonetic code is injected AT THE SAME POSITION as the source token,
    * which passes through unchanged. */
  def soundexInject(in: Iterator[Token]): Iterator[Token] =
    in.flatMap { t =>
      val c = soundex(t.term)
      if (c == t.term) Iterator.single(t)
      else Iterator(t, t.copy(term = c))
    }

  /** Refined Soundex (commons-codec RefinedSoundex, a PhoneticFilter
    * encoder option in Lucene's companion phonetic module — see the
    * Soundex note above): first letter + a digit for EVERY
    * char (vowels = 0), consecutive duplicate digits collapsed, no
    * truncation. */
  def refinedSoundex(term: String): String = {
    val s = term.toUpperCase.filter(c => c >= 'A' && c <= 'Z')
    if (s.isEmpty) return term
    val codes = "01360240043788015936020505" // A..Z
    val sb = new StringBuilder
    sb.append(s.charAt(0))
    var last = ' '
    var i = 0
    while (i < s.length) {
      val k = codes.charAt(s.charAt(i) - 'A')
      if (k != last) sb.append(k)
      last = k
      i += 1
    }
    sb.toString
  }

  def refinedSoundexInject(in: Iterator[Token]): Iterator[Token] =
    in.flatMap { t =>
      val c = refinedSoundex(t.term)
      if (c == t.term) Iterator.single(t)
      else Iterator(t, t.copy(term = c))
    }

  // -------------------------------------------------------- word delimiter

  /** WordDelimiterFilter with the factory defaults (Miscellaneous/
    * WordDelimiterFilter.cs: GENERATE_WORD_PARTS | GENERATE_NUMBER_PARTS |
    * SPLIT_ON_CASE_CHANGE | SPLIT_ON_NUMERICS | STEM_ENGLISH_POSSESSIVE;
    * catenation off): each token splits at non-alphanumeric delimiters,
    * lower-to-upper case changes and letter/digit boundaries; a trailing
    * 's is stripped; the first part keeps the source position and each
    * further part advances one position (the reference's posIncr=1 chain
    * for split parts). Runs BEFORE lowercasing, like the reference chain. */
  def wordDelimiter(in: Iterator[Token]): Iterator[Token] = {
    var shift = 0 // extra positions injected so far (parts consume slots)
    in.flatMap { t =>
      val parts = wordDelimiterParts(t.term)
      val basePos = t.position + shift
      if (parts.isEmpty) Iterator.empty // all-delimiter token dropped (gap kept)
      else {
        shift += parts.length - 1
        parts.iterator.zipWithIndex.map { case ((term, so, eo), i) =>
          Token(term, basePos + i, t.startOffset + so, t.startOffset + eo, t.tokenType)
        }
      }
    }
  }

  /** Sub-word parts of one term: (part, startOffsetDelta, endOffsetDelta). */
  private[analysis] def wordDelimiterParts(term0: String): Seq[(String, Int, Int)] = {
    // STEM_ENGLISH_POSSESSIVE: strip one trailing 's
    val term = if (term0.endsWith("'s") || term0.endsWith("’s"))
      term0.dropRight(2) else term0
    @inline def cls(c: Char): Int =
      if (Character.isDigit(c)) 2 else if (Character.isLetter(c)) 1 else 0
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, Int, Int)]
    var i = 0
    while (i < term.length) {
      if (cls(term.charAt(i)) == 0) i += 1
      else {
        val start = i
        val k = cls(term.charAt(i))
        i += 1
        // extend the run: same class, and for letters no lower->upper change
        while (i < term.length && cls(term.charAt(i)) == k &&
               !(k == 1 && Character.isUpperCase(term.charAt(i)) &&
                 Character.isLowerCase(term.charAt(i - 1)))) i += 1
        out += ((term.substring(start, i), start, i))
      }
    }
    out.toSeq
  }

  // ------------------------------------------------------------ edge ngram

  /** EdgeNGramTokenFilter (Ngram/EdgeNGramTokenFilter.cs, 4.4+ semantics):
    * front-anchored prefixes of length min..max per token, ALL at the
    * source token's position. */
  def edgeNgrams(in: Iterator[Token], min: Int, max: Int): Iterator[Token] =
    in.flatMap { t =>
      (min to math.min(max, t.term.length)).iterator.map(n =>
        t.copy(term = t.term.substring(0, n), endOffset = t.startOffset + n))
    }

  // ---------------------------------------------------------- common grams

  /** CommonGramsFilter (CommonGrams/CommonGramsFilter.cs): unigrams pass
    * through; whenever the previous or current token is a common word, the
    * joined bigram "prev_cur" is ALSO emitted at the previous token's
    * position (posIncr 0 overlap) — phrase-speed for stopword-adjacent
    * pairs without dropping the stopwords. */
  def commonGrams(in: Iterator[Token], common: Set[String]): Iterator[Token] = {
    var prev: Token = null
    in.flatMap { t =>
      val grams =
        if (prev != null && prev.position == t.position - 1 &&
            (common.contains(prev.term) || common.contains(t.term)))
          Iterator(prev.copy(term = prev.term + "_" + t.term, endOffset = t.endOffset), t)
        else Iterator.single(t)
      prev = t
      grams
    }
  }

  // ------------------------------------------------------- compound words

  /** DictionaryCompoundWordTokenFilter (Compound/
    * DictionaryCompoundWordTokenFilter.cs Decompose loop +
    * CompoundWordTokenFilterBase defaults minWordSize=5, minSubwordSize=2,
    * maxSubwordSize=15): a token of at least minWordSize emits, after
    * itself, every dictionary subword found at any offset — injected at
    * the SAME position (posIncr 0); 4.4+ semantics keep the ORIGINAL
    * token's offsets on the parts. onlyLongestMatch keeps only the longest
    * match per start offset. */
  def dictionaryCompound(in: Iterator[Token], dict: Set[String],
                         minWordSize: Int = 5, minSubwordSize: Int = 2,
                         maxSubwordSize: Int = 15,
                         onlyLongestMatch: Boolean = false): Iterator[Token] =
    in.flatMap { t =>
      val term = t.term
      if (term.length < minWordSize) Iterator.single(t)
      else {
        val subs = scala.collection.mutable.ArrayBuffer.empty[String]
        var i = 0
        while (i <= term.length - minSubwordSize) {
          var longest: String = null
          var j = minSubwordSize
          while (j <= maxSubwordSize && i + j <= term.length) {
            val cand = term.substring(i, i + j)
            if (dict.contains(cand)) {
              if (onlyLongestMatch) {
                if (longest == null || longest.length < j) longest = cand
              } else subs += cand
            }
            j += 1
          }
          if (onlyLongestMatch && longest != null) subs += longest
          i += 1
        }
        Iterator.single(t) ++ subs.iterator.map(s => t.copy(term = s))
      }
    }

  // ------------------------------------------------------- small catalogue

  /** TrimFilter (Miscellaneous/TrimFilter.cs). */
  def trim(in: Iterator[Token]): Iterator[Token] =
    in.map(t => t.copy(term = t.term.trim))

  /** LengthFilter (Miscellaneous/LengthFilter.cs): keep min <= len <= max;
    * like the reference (a FilteringTokenFilter), dropped tokens leave
    * position gaps. */
  def lengthFilter(in: Iterator[Token], min: Int, max: Int): Iterator[Token] =
    in.filter(t => t.term.length >= min && t.term.length <= max)

  /** CapitalizationFilter (Miscellaneous/CapitalizationFilter.cs default:
    * upcase the first letter, downcase the rest). */
  def capitalize(in: Iterator[Token]): Iterator[Token] =
    in.map { t =>
      if (t.term.isEmpty) t
      else t.copy(term = t.term.charAt(0).toUpper + t.term.substring(1).toLowerCase)
    }

  /** ReverseStringFilter (Reverse/ReverseStringFilter.cs, no marker). */
  def reverse(in: Iterator[Token]): Iterator[Token] =
    in.map(t => t.copy(term = t.term.reverse))

  // -------------------------------------------------------------- synonyms

  /** Inject synonyms at the SAME position as the source token (posIncr = 0
    * overlap, SynonymFilter's default keepOrig behavior). */
  def synonyms(in: Iterator[Token], map: Map[String, Seq[String]]): Iterator[Token] =
    in.flatMap { t =>
      map.get(t.term) match {
        case Some(syns) => Iterator.single(t) ++ syns.iterator.map(s => t.copy(term = s))
        case None => Iterator.single(t)
      }
    }
}

/** StandardAnalyzer chain + Porter stemming — the EnglishAnalyzer-shaped
  * catalog entry (stemming after stop-filtering, positions preserved). */
object EnglishAnalyzer extends Analyzer {
  override def tokenize(text: String): Iterator[Token] =
    TokenFilters.porterStem(StandardAnalyzer.tokenize(text))
  override def tokenCount(text: String): Int = StandardAnalyzer.tokenCount(text)
}

/** EnglishAnalyzer with KStemFilter in place of Porter — the reference's
  * other in-tree English stemmer (En/KStemFilter.cs). Chain mirrors
  * En/EnglishAnalyzer.cs:105-112: standard grammar -> possessive strip ->
  * lowercase -> stop -> stem. */
object KStemAnalyzer extends Analyzer {
  override def tokenize(text: String): Iterator[Token] =
    TokenFilters.kstem(TokenFilters.englishPossessive(StandardAnalyzer.tokenize(text)))
  override def tokenCount(text: String): Int = StandardAnalyzer.tokenCount(text)
}

/** Standard chain + EnglishMinimalStemFilter (plural-only stemming). */
object EnglishMinimalAnalyzer extends Analyzer {
  override def tokenize(text: String): Iterator[Token] =
    TokenFilters.englishMinimalStem(StandardAnalyzer.tokenize(text))
  override def tokenCount(text: String): Int = StandardAnalyzer.tokenCount(text)
}

/** Whitespace -> lowercase -> EnglishPossessiveFilter: exercises the 3.6+
  * curly-apostrophe (U+2019) strip, which the classic grammar never sees
  * (it splits words at U+2019; the UAX#29 tokenizer keeps them intact). */
object EnglishPossessiveAnalyzer extends Analyzer {
  override def tokenize(text: String): Iterator[Token] =
    TokenFilters.englishPossessive(
      WhitespaceAnalyzer.tokenize(text).map(t => t.copy(term = t.term.toLowerCase)))
}

/** Named chains exposing the generic filter catalog to the index config /
  * gate (each filter is otherwise a library combinator with free
  * parameters; these fix the reference defaults so a build can name them). */
object ShingleAnalyzer extends Analyzer { // ShingleFilter defaults: size 2 + unigrams
  override def tokenize(text: String): Iterator[Token] =
    TokenFilters.shingles(SimpleAnalyzer.tokenize(text))
}

object Ngram3Analyzer extends Analyzer { // NGramTokenFilter, min=max=3
  override def tokenize(text: String): Iterator[Token] =
    TokenFilters.ngrams(SimpleAnalyzer.tokenize(text), 3, 3)
}

object AsciiFoldingAnalyzer extends Analyzer { // classic grammar + ASCIIFoldingFilter
  override def tokenize(text: String): Iterator[Token] =
    TokenFilters.asciiFold(LangAnalyzers.StandardNoStop.tokenize(text))
}

/** SynonymFilter catalog chain with a FIXED fixture map (the reference's
  * SynonymMap is build-time-frozen state exactly like this): fast->quick,
  * car->automobile, injected at the source position (posIncr = 0). */
object SynonymFixtureAnalyzer extends Analyzer {
  val FixtureMap: Map[String, Seq[String]] =
    Map("fast" -> Seq("quick"), "car" -> Seq("automobile"))
  override def tokenize(text: String): Iterator[Token] =
    TokenFilters.synonyms(SimpleAnalyzer.tokenize(text), FixtureMap)
}

object SoundexAnalyzer extends Analyzer { // PhoneticFilter(Soundex, inject=true)
  override def tokenize(text: String): Iterator[Token] =
    TokenFilters.soundexInject(SimpleAnalyzer.tokenize(text))
}

object RefinedSoundexAnalyzer extends Analyzer { // PhoneticFilter(RefinedSoundex)
  override def tokenize(text: String): Iterator[Token] =
    TokenFilters.refinedSoundexInject(SimpleAnalyzer.tokenize(text))
}

/** WordDelimiterFilter chain: whitespace tokenize (case preserved — the
  * filter needs it for case-change splits) -> WordDelimiterFilter factory
  * defaults -> lowercase. */
object WordDelimiterAnalyzer extends Analyzer {
  override def tokenize(text: String): Iterator[Token] =
    TokenFilters.wordDelimiter(WhitespaceAnalyzer.tokenize(text))
      .map(t => t.copy(term = t.term.toLowerCase))
}

object Edge23Analyzer extends Analyzer { // EdgeNGramTokenFilter(2,3)
  override def tokenize(text: String): Iterator[Token] =
    TokenFilters.edgeNgrams(SimpleAnalyzer.tokenize(text), 2, 3)
}

/** CommonGramsFilter chain with the English stop set as common words
  * (the CommonGramsFilterFactory's usual configuration). */
object CommonGramsAnalyzer extends Analyzer {
  override def tokenize(text: String): Iterator[Token] =
    TokenFilters.commonGrams(SimpleAnalyzer.tokenize(text),
      StandardAnalyzer.EnglishStopWords)
}

/** DictionaryCompoundWordTokenFilter chain with a FIXED fixture dictionary
  * (the reference filter takes a runtime CharArraySet exactly like this). */
object CompoundFixtureAnalyzer extends Analyzer {
  val Dict: Set[String] = Set("fuss", "ball", "spiel", "wetter", "regen")
  override def tokenize(text: String): Iterator[Token] =
    TokenFilters.dictionaryCompound(SimpleAnalyzer.tokenize(text), Dict)
}
