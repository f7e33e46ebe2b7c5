package graft.analysis

/** A token emitted by the analysis chain.
  *
  * Mirrors the attribute bundle of the reference token stream
  * (/root/reference/src/Lucene.Net.Core/Analysis/TokenStream.cs:153 —
  * term, positionIncrement, offset, type), collapsed into one case class.
  *
  * `position` is the absolute position (cumulative sum of position
  * increments - 1, so the first token with posIncr=1 sits at position 0),
  * matching the accounting in Index/DocInverterPerField.cs:136-158.
  */
final case class Token(term: String, position: Int, startOffset: Int, endOffset: Int, tokenType: Int,
                       /** Per-position payload bytes (PayloadAttribute analog,
                         * /root/reference/src/Lucene.Net.Core/Analysis/Tokenattributes/
                         * PayloadAttribute.cs); null = none. Attached by payload
                         * token filters, stored in the postings payload stream. */
                       payload: Array[Byte] = null)

/** Token types of the classic grammar
  * (/root/reference/src/Lucene.Net.Core/Analysis/Standard/StandardTokenizerImpl.jflex).
  */
object TokenType {
  val ALPHANUM = 0
  val APOSTROPHE = 1
  val ACRONYM = 2
  val COMPANY = 3
  val EMAIL = 4
  val HOST = 5
  val NUM = 6
  val CJ = 7
  val ACRONYM_DEP = 8
}

/** Scanner-level token before filters: raw text slice + type. */
final case class RawToken(text: String, start: Int, end: Int, tokenType: Int)

/** Re-implementation (from scratch, longest-match scanner — not a port of the
  * generated DFA tables) of the classic Lucene grammar defined in
  * /root/reference/src/Lucene.Net.Core/Analysis/Standard/StandardTokenizerImpl.jflex:
  *
  *   ALPHANUM   = (LETTER|THAI|digit)+
  *   APOSTROPHE = ALPHA ("'" ALPHA)+
  *   ACRONYM    = LETTER "." (LETTER ".")+
  *   ACRONYM_DEP= ALPHANUM "." (ALPHANUM ".")+
  *   COMPANY    = ALPHA ("&"|"@") ALPHA
  *   EMAIL      = ALPHANUM (("."|"-"|"_") ALPHANUM)* "@" ALPHANUM (("."|"-") ALPHANUM)+
  *   HOST       = ALPHANUM ("." ALPHANUM)+
  *   NUM        = alternating (single P-char separated) runs where every
  *                other run contains a digit (6 alternatives in the grammar)
  *   P          = [_\-/.,]
  *   LETTER     = [:letter:] minus CJ;  CJ = CJK/kana ranges (1 char/token)
  *
  * JFlex semantics: longest match wins; on equal length the earlier rule wins
  * (rule order as listed). Unmatched chars are skipped.
  */
object ClassicScanner {

  @inline def isCj(c: Char): Boolean =
    (c >= '㄀' && c <= 'ㄯ') || (c >= '぀' && c <= 'ゟ') ||
    (c >= '゠' && c <= 'ヿ') || (c >= 'ㇰ' && c <= 'ㇿ') ||
    (c >= '㌀' && c <= '㍿') || (c >= '㐀' && c <= '䶿') ||
    (c >= '一' && c <= '鿿') || (c >= '豈' && c <= '﫿') ||
    (c >= '･' && c <= 'ﾟ')

  @inline def isLetter(c: Char): Boolean = Character.isLetter(c) && !isCj(c)
  @inline def isThai(c: Char): Boolean = c >= '฀' && c <= '๙'
  @inline def isDigit(c: Char): Boolean = Character.isDigit(c)
  @inline def isAlnum(c: Char): Boolean = isLetter(c) || isThai(c) || isDigit(c)
  @inline def isP(c: Char): Boolean = c == '_' || c == '-' || c == '/' || c == '.' || c == ','

  /** Length of the maximal (LETTER|THAI|digit)+ run at i, 0 if none. */
  private def alnumRun(s: CharSequence, i: Int): Int = {
    var j = i
    while (j < s.length && isAlnum(s.charAt(j))) j += 1
    j - i
  }

  private def alphaRun(s: CharSequence, i: Int): Int = {
    var j = i
    while (j < s.length && isLetter(s.charAt(j))) j += 1
    j - i
  }

  /** APOSTROPHE = ALPHA ("'" ALPHA)+ — greedy; returns match length or 0. */
  private def matchApostrophe(s: CharSequence, i: Int): Int = {
    val a0 = alphaRun(s, i)
    if (a0 == 0) return 0
    var j = i + a0
    var segments = 0
    var ok = true
    while (ok && j < s.length && s.charAt(j) == '\'') {
      val a = alphaRun(s, j + 1)
      if (a > 0) { j += 1 + a; segments += 1 } else ok = false
    }
    if (segments >= 1) j - i else 0
  }

  /** ACRONYM = LETTER "." (LETTER ".")+ — single letters separated by dots, ends with dot. */
  private def matchAcronym(s: CharSequence, i: Int): Int = {
    var j = i
    var pairs = 0
    var cont = true
    while (cont && j + 1 < s.length && isLetter(s.charAt(j)) && s.charAt(j + 1) == '.') {
      // each pair is one LETTER followed by '.'; the next pair must start right after
      j += 2; pairs += 1
      if (j < s.length && isLetter(s.charAt(j)) && j + 1 < s.length && s.charAt(j + 1) == '.') () else cont = false
    }
    if (pairs >= 2) j - i else 0
  }

  /** ACRONYM_DEP = ALPHANUM "." (ALPHANUM ".")+ — ends with dot, >=2 segments. */
  private def matchAcronymDep(s: CharSequence, i: Int): Int = {
    var j = i
    var segs = 0
    var cont = true
    while (cont) {
      val a = alnumRun(s, j)
      if (a > 0 && j + a < s.length && s.charAt(j + a) == '.') { j += a + 1; segs += 1 }
      else cont = false
    }
    if (segs >= 2) j - i else 0
  }

  /** COMPANY = ALPHA ("&"|"@") ALPHA. */
  private def matchCompany(s: CharSequence, i: Int): Int = {
    val a0 = alphaRun(s, i)
    if (a0 == 0) return 0
    val j = i + a0
    if (j < s.length && (s.charAt(j) == '&' || s.charAt(j) == '@')) {
      val a1 = alphaRun(s, j + 1)
      if (a1 > 0) a0 + 1 + a1 else 0
    } else 0
  }

  /** EMAIL = ALPHANUM (("."|"-"|"_") ALPHANUM)* "@" ALPHANUM (("."|"-") ALPHANUM)+. */
  private def matchEmail(s: CharSequence, i: Int): Int = {
    val a0 = alnumRun(s, i)
    if (a0 == 0) return 0
    var j = i + a0
    // local part extensions
    var cont = true
    while (cont && j < s.length && (s.charAt(j) == '.' || s.charAt(j) == '-' || s.charAt(j) == '_')) {
      val a = alnumRun(s, j + 1)
      if (a > 0) { j += 1 + a } else cont = false
    }
    if (j >= s.length || s.charAt(j) != '@') return 0
    j += 1
    val d0 = alnumRun(s, j)
    if (d0 == 0) return 0
    j += d0
    var domSegs = 0
    cont = true
    while (cont && j < s.length && (s.charAt(j) == '.' || s.charAt(j) == '-')) {
      val a = alnumRun(s, j + 1)
      if (a > 0) { j += 1 + a; domSegs += 1 } else cont = false
    }
    if (domSegs >= 1) j - i else 0
  }

  /** HOST = ALPHANUM ("." ALPHANUM)+. */
  private def matchHost(s: CharSequence, i: Int): Int = {
    val a0 = alnumRun(s, i)
    if (a0 == 0) return 0
    var j = i + a0
    var segs = 0
    var cont = true
    while (cont && j < s.length && s.charAt(j) == '.') {
      val a = alnumRun(s, j + 1)
      if (a > 0) { j += 1 + a; segs += 1 } else cont = false
    }
    if (segs >= 1) j - i else 0
  }

  /** NUM — alternating single-P-separated alnum runs; every other run has a digit.
    * Covers all six grammar alternatives: for parity p (p=1: odd-indexed runs must
    * have a digit; p=0: even-indexed runs must), the longest valid prefix with >=2
    * runs wins.
    */
  private def matchNum(s: CharSequence, i: Int): Int = {
    // fast reject: NUM needs at least run P run — skip buffer setup otherwise
    val r0 = alnumRun(s, i)
    if (r0 == 0 || i + r0 >= s.length || !isP(s.charAt(i + r0)) ||
        i + r0 + 1 >= s.length || !isAlnum(s.charAt(i + r0 + 1))) return 0
    // collect runs r0, r1, ... each separated by exactly one P char
    val starts = new scala.collection.mutable.ArrayBuffer[Int](8)
    val lens = new scala.collection.mutable.ArrayBuffer[Int](8)
    val hasDig = new scala.collection.mutable.ArrayBuffer[Boolean](8)
    var j = i
    var cont = true
    while (cont) {
      val a = alnumRun(s, j)
      if (a == 0) cont = false
      else {
        starts += j; lens += a
        var dig = false
        var t = j
        while (t < j + a && !dig) { if (isDigit(s.charAt(t))) dig = true; t += 1 }
        hasDig += dig
        j += a
        if (j < s.length && isP(s.charAt(j)) && j + 1 < s.length && isAlnum(s.charAt(j + 1))) j += 1
        else cont = false
      }
    }
    val n = starts.length
    if (n < 2) return 0
    var best = 0
    var parity = 0
    while (parity <= 1) {
      // runs at index k with (k % 2 == parity) must contain a digit
      var k = 0
      var lastOk = -1
      var broken = false
      while (k < n && !broken) {
        if (k % 2 == parity && !hasDig(k)) broken = true
        else { lastOk = k; k += 1 }
      }
      if (lastOk >= 1) {
        val len = starts(lastOk) + lens(lastOk) - i
        if (len > best) best = len
      }
      parity += 1
    }
    best
  }

  /** Scan `s`, returning raw typed tokens per the grammar (longest match,
    * rule-order priority on ties). Tokens longer than `maxTokenLength` chars are
    * handled by the caller (StandardTokenizer skip semantics).
    */
  def scan(s: CharSequence): Iterator[RawToken] = new Iterator[RawToken] {
    private var i = 0
    private var nextTok: RawToken = null
    advance()

    private def advance(): Unit = {
      nextTok = null
      while (nextTok == null && i < s.length) {
        val c = s.charAt(i)
        if (isCj(c)) {
          // CJ beats nothing longer only if no multi-char rule matches; but CJ chars
          // are excluded from LETTER/ALPHANUM so no other rule can start here.
          nextTok = RawToken(String.valueOf(c), i, i + 1, TokenType.CJ)
          i += 1
        } else if (isAlnum(c)) {
          // rule-order priority on equal lengths, no intermediate allocation
          var bestLen = alnumRun(s, i)
          var bestType = TokenType.ALPHANUM
          var l = matchApostrophe(s, i)
          if (l > bestLen) { bestLen = l; bestType = TokenType.APOSTROPHE }
          l = matchAcronym(s, i)
          if (l > bestLen) { bestLen = l; bestType = TokenType.ACRONYM }
          l = matchCompany(s, i)
          if (l > bestLen) { bestLen = l; bestType = TokenType.COMPANY }
          l = matchEmail(s, i)
          if (l > bestLen) { bestLen = l; bestType = TokenType.EMAIL }
          l = matchHost(s, i)
          if (l > bestLen) { bestLen = l; bestType = TokenType.HOST }
          l = matchNum(s, i)
          if (l > bestLen) { bestLen = l; bestType = TokenType.NUM }
          l = matchAcronymDep(s, i)
          if (l > bestLen) { bestLen = l; bestType = TokenType.ACRONYM_DEP }
          if (bestLen > 0) {
            nextTok = RawToken(s.subSequence(i, i + bestLen).toString, i, i + bestLen, bestType)
            i += bestLen
          } else i += 1
        } else i += 1
      }
    }

    override def hasNext: Boolean = nextTok != null
    override def next(): RawToken = { val t = nextTok; advance(); t }
  }
}
