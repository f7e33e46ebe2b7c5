package graft.analysis

/** Snowball stemmers — fresh implementations of Martin Porter's published
  * Snowball algorithms (snowballstem.org), the same specifications the
  * reference's generated stemmer classes implement
  * (/root/reference/src/Lucene.Net.Analysis.Common/Analysis/Snowball/
  * SnowballFilter.cs + Tartarus SnowballProgram ports). Each follows the
  * spec's longest-match discipline: the longest matching suffix in a rule
  * group is selected FIRST and its region condition checked after — a
  * failing condition means no action, never a retry with a shorter suffix.
  */
object SnowballStemmers {

  // ------------------------------------------------------------- English
  // Porter2 ("English") stemmer, snowballstem.org/algorithms/english/

  private val EnDoubles = Set("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")
  private val EnLiEnding = "cdeghkmnrt"
  private val EnExceptions: Map[String, String] = Map(
    "skis" -> "ski", "skies" -> "sky", "dying" -> "die", "lying" -> "lie",
    "tying" -> "tie", "idly" -> "idl", "gently" -> "gentl", "ugly" -> "ugli",
    "early" -> "earli", "only" -> "onli", "singly" -> "singl",
    "sky" -> "sky", "news" -> "news", "howe" -> "howe", "atlas" -> "atlas",
    "cosmos" -> "cosmos", "bias" -> "bias", "andes" -> "andes")
  private val EnExceptions1a = Set(
    "inning", "outing", "canning", "herring", "earring",
    "proceed", "exceed", "succeed")

  @inline private def enVowel(c: Char): Boolean =
    c == 'a' || c == 'e' || c == 'i' || c == 'o' || c == 'u' || c == 'y'

  /** Short syllable at position ending `end` (exclusive) of `w`. */
  private def enEndsShortSyllable(w: String): Boolean = {
    val n = w.length
    if (n == 2) enVowel(w.charAt(0)) && !enVowel(w.charAt(1))
    else if (n >= 3) {
      val c = w.charAt(n - 1)
      enVowel(w.charAt(n - 2)) && !enVowel(w.charAt(n - 3)) &&
        !enVowel(c) && c != 'w' && c != 'x' && c != 'Y'
    } else false
  }

  private def enR1(w: String): Int = {
    for (p <- Seq("gener", "commun", "arsen")) if (w.startsWith(p)) return p.length
    standardR(w, 0, enVowel)
  }

  /** Standard R-region: position after the first non-vowel following a
    * vowel, searching from `from`; w.length when absent. */
  private def standardR(w: String, from: Int, vowel: Char => Boolean): Int = {
    var i = from
    while (i < w.length && !vowel(w.charAt(i))) i += 1
    while (i < w.length && vowel(w.charAt(i))) i += 1
    if (i < w.length) i + 1 else w.length
  }

  def porter2(word0: String): String = {
    if (word0.length <= 2) return word0
    if (EnExceptions.contains(word0)) return EnExceptions(word0)
    var w = if (word0.startsWith("'")) word0.substring(1) else word0
    // mark consonant y as Y
    val sb = new StringBuilder(w)
    var i = 0
    while (i < sb.length) {
      if (sb.charAt(i) == 'y' && (i == 0 || enVowel(sb.charAt(i - 1)))) sb.setCharAt(i, 'Y')
      i += 1
    }
    w = sb.toString
    val r1 = enR1(w)
    val r2 = standardR(w, r1, enVowel)
    def inR1(s: String): Boolean = w.length - s.length >= r1
    def inR2(s: String): Boolean = w.length - s.length >= r2

    // step 0: remove the longest apostrophe suffix, then CONTINUE
    Seq("'s'", "'s", "'").find(w.endsWith).foreach(s => w = w.dropRight(s.length))
    def hasVowelBefore(endExcl: Int): Boolean = {
      var j = 0
      var found = false
      while (j < endExcl && !found) { if (enVowel(w.charAt(j))) found = true; j += 1 }
      found
    }

    // step 1a
    if (w.endsWith("sses")) w = w.dropRight(2)
    else if (w.endsWith("ied") || w.endsWith("ies")) {
      w = if (w.length - 3 > 1) w.dropRight(2) else w.dropRight(1)
    } else if (w.endsWith("us") || w.endsWith("ss")) ()
    else if (w.endsWith("s") && hasVowelBefore(w.length - 2)) w = w.dropRight(1)

    if (EnExceptions1a.contains(w)) return finishEn(w)

    // step 1b
    if (w.endsWith("eedly")) { if (inR1("eedly")) w = w.dropRight(3) }
    else if (w.endsWith("eed")) { if (inR1("eed")) w = w.dropRight(1) }
    else {
      val suf = Seq("ingly", "edly", "ing", "ed").find(w.endsWith)
      suf.foreach { s =>
        if (hasVowelBefore(w.length - s.length)) {
          w = w.dropRight(s.length)
          if (w.endsWith("at") || w.endsWith("bl") || w.endsWith("iz")) w += "e"
          else if (w.length >= 2 && EnDoubles.contains(w.takeRight(2))) w = w.dropRight(1)
          else if (enEndsShortSyllable(w) && r1 >= w.length) w += "e" // short word: R1 null
        }
      }
    }

    // step 1c
    if (w.length > 2 && (w.endsWith("y") || w.endsWith("Y")) &&
        !enVowel(w.charAt(w.length - 2)))
      w = w.dropRight(1) + "i"

    // step 2 (longest match, then R1 condition)
    val step2: Seq[(String, String)] = Seq(
      "ization" -> "ize", "ational" -> "ate", "ousness" -> "ous",
      "iveness" -> "ive", "fulness" -> "ful", "lessli" -> "less",
      "biliti" -> "ble", "entli" -> "ent", "ation" -> "ate",
      "alism" -> "al", "aliti" -> "al", "ousli" -> "ous",
      "iviti" -> "ive", "fulli" -> "ful", "enci" -> "ence",
      "anci" -> "ance", "abli" -> "able", "izer" -> "ize",
      "ator" -> "ate", "alli" -> "al", "bli" -> "ble",
      "ogi" -> "og", "li" -> "")
    step2.find { case (s, _) => w.endsWith(s) } match {
      case Some(("ogi", r)) => if (inR1("ogi") && w.length > 3 && w.charAt(w.length - 4) == 'l')
        w = w.dropRight(3) + r
      case Some(("li", _)) => if (inR1("li") && w.length > 2 &&
        EnLiEnding.indexOf(w.charAt(w.length - 3)) >= 0) w = w.dropRight(2)
      case Some((s, r)) => if (inR1(s)) w = w.dropRight(s.length) + r
      case None =>
    }

    // step 3
    val step3: Seq[(String, String)] = Seq(
      "ational" -> "ate", "tional" -> "tion", "alize" -> "al",
      "icate" -> "ic", "iciti" -> "ic", "ative" -> "",
      "ical" -> "ic", "ness" -> "", "ful" -> "")
    step3.find { case (s, _) => w.endsWith(s) } match {
      case Some(("ative", _)) => if (inR2("ative")) w = w.dropRight(5)
      case Some((s, r)) => if (inR1(s)) w = w.dropRight(s.length) + r
      case None =>
    }

    // step 4 (in R2)
    val step4 = Seq("ement", "ance", "ence", "able", "ible", "ment",
      "ant", "ent", "ism", "ate", "iti", "ous", "ive", "ize",
      "ion", "al", "er", "ic")
    step4.find(w.endsWith) match {
      case Some("ion") => if (inR2("ion") && w.length > 3 &&
        (w.charAt(w.length - 4) == 's' || w.charAt(w.length - 4) == 't')) w = w.dropRight(3)
      case Some(s) => if (inR2(s)) w = w.dropRight(s.length)
      case None =>
    }

    // step 5
    if (w.endsWith("e")) {
      if (inR2("e")) w = w.dropRight(1)
      else if (inR1("e") && !enEndsShortSyllable(w.dropRight(1))) w = w.dropRight(1)
    } else if (w.endsWith("l") && inR2("l") && w.length > 1 && w.charAt(w.length - 2) == 'l')
      w = w.dropRight(1)

    finishEn(w)
  }

  private def finishEn(w: String): String = w.replace('Y', 'y')

  // -------------------------------------------------------------- Dutch
  // snowballstem.org/algorithms/dutch/

  @inline private def nlVowel(c: Char): Boolean =
    c == 'a' || c == 'e' || c == 'i' || c == 'o' || c == 'u' || c == 'y' || c == 'è'

  private def nlUndouble(w: String): String =
    if (w.endsWith("kk") || w.endsWith("dd") || w.endsWith("tt")) w.dropRight(1) else w

  def dutchStem(word0: String): String = {
    if (word0.isEmpty) return word0
    // prelude: strip umlauts/acutes; mark consonant y/Y and intervocalic i
    var w = word0.map {
      case 'ä' | 'á' => 'a'; case 'ë' | 'é' => 'e'; case 'ï' | 'í' => 'i'
      case 'ö' | 'ó' => 'o'; case 'ü' | 'ú' => 'u'; case c => c
    }
    val sb = new StringBuilder(w)
    var i = 0
    while (i < sb.length) {
      val c = sb.charAt(i)
      if (c == 'y' && (i == 0 || nlVowel(sb.charAt(i - 1)))) sb.setCharAt(i, 'Y')
      else if (c == 'i' && i > 0 && i + 1 < sb.length &&
        nlVowel(sb.charAt(i - 1)) && nlVowel(sb.charAt(i + 1))) sb.setCharAt(i, 'I')
      i += 1
    }
    w = sb.toString
    var r1 = standardR(w, 0, nlVowel)
    if (r1 < 3) r1 = math.min(3, w.length)
    val r2 = standardR(w, r1, nlVowel)
    def inR1(s: String): Boolean = w.length - s.length >= r1
    def inR2(s: String): Boolean = w.length - s.length >= r2
    def validS: Boolean = w.length > 1 && {
      val c = w.charAt(w.length - 2)
      !nlVowel(c) && c != 'j'
    }
    def validEn(sufLen: Int): Boolean = {
      val stemEnd = w.length - sufLen
      stemEnd > 0 && !nlVowel(w.charAt(stemEnd - 1)) &&
        !(stemEnd >= 3 && w.substring(stemEnd - 3, stemEnd) == "gem")
    }

    // step 1
    if (w.endsWith("heden")) { if (inR1("heden")) w = w.dropRight(5) + "heid" }
    else if (w.endsWith("ene")) { if (inR1("ene") && validEn(3)) w = nlUndouble(w.dropRight(3)) }
    else if (w.endsWith("en")) { if (inR1("en") && validEn(2)) w = nlUndouble(w.dropRight(2)) }
    else if (w.endsWith("se")) { if (inR1("se") && w.length > 2 && !nlVowel(w.charAt(w.length - 3)) && w.charAt(w.length - 3) != 'j') w = w.dropRight(2) }
    else if (w.endsWith("s")) { if (inR1("s") && validS) w = w.dropRight(1) }

    // step 2
    var eFound = false
    if (w.endsWith("e") && inR1("e") && w.length > 1 && !nlVowel(w.charAt(w.length - 2))) {
      w = nlUndouble(w.dropRight(1))
      eFound = true
    }

    // step 3a
    if (w.endsWith("heid") && inR2("heid") &&
        (w.length == 4 || w.charAt(w.length - 5) != 'c')) {
      w = w.dropRight(4)
      if (w.endsWith("en") && inR1("en") && validEn(2)) w = nlUndouble(w.dropRight(2))
    }

    // step 3b (longest of end|ing|ig|lijk|baar|bar)
    if (w.endsWith("end") || w.endsWith("ing")) {
      val s = w.takeRight(3)
      if (inR2(s)) {
        w = w.dropRight(3)
        if (w.endsWith("ig") && inR2("ig") && (w.length == 2 || w.charAt(w.length - 3) != 'e'))
          w = w.dropRight(2)
        else w = nlUndouble(w)
      }
    } else if (w.endsWith("lijk")) {
      if (inR2("lijk")) {
        w = w.dropRight(4)
        // repeat step 2
        if (w.endsWith("e") && inR1("e") && w.length > 1 && !nlVowel(w.charAt(w.length - 2)))
          w = nlUndouble(w.dropRight(1))
      }
    } else if (w.endsWith("baar")) { if (inR2("baar")) w = w.dropRight(4) }
    else if (w.endsWith("bar")) { if (inR2("bar") && eFound) w = w.dropRight(3) }
    else if (w.endsWith("ig")) { if (inR2("ig") && (w.length == 2 || w.charAt(w.length - 3) != 'e')) w = w.dropRight(2) }

    // step 4: undouble vowel — C V V D with V in {aa, ee, oo, uu}, D != I
    if (w.length >= 4) {
      val n = w.length
      val d = w.charAt(n - 1); val v1 = w.charAt(n - 2); val v2 = w.charAt(n - 3); val c = w.charAt(n - 4)
      if (!nlVowel(c) && !nlVowel(d) && d != 'I' && v1 == v2 &&
          (v1 == 'a' || v1 == 'e' || v1 == 'o' || v1 == 'u'))
        w = w.substring(0, n - 2) + d
    }

    w.map { case 'I' => 'i'; case 'Y' => 'y'; case c => c }
  }

  // ------------------------------------------------------------- Swedish
  // snowballstem.org/algorithms/swedish/

  @inline private def svVowel(c: Char): Boolean =
    "aeiouyäåö".indexOf(c) >= 0

  private val SvStep1 = Seq(
    "heterna", "hetens", "heter", "heten", "anden", "arnas", "ernas",
    "ornas", "arens", "andes", "arna", "erna", "orna", "ande", "arne",
    "aste", "aren", "ades", "erns", "andet", "het", "ast", "ad", "en",
    "ar", "er", "or", "as", "es", "at", "ern", "ens", "ade", "are", "e",
    "a").sortBy(-_.length)

  def swedishStem(word: String): String = {
    var w = word
    var r1 = standardR(w, 0, svVowel)
    if (r1 < 3) r1 = math.min(3, w.length)
    def inR1(s: String): Boolean = w.length - s.length >= r1

    // step 1: longest suffix in the list, or s after a valid s-ending
    SvStep1.find(w.endsWith) match {
      case Some(s) if inR1(s) => w = w.dropRight(s.length)
      case Some(_) => // longest match found but outside R1: no action
      case None =>
        if (w.endsWith("s") && inR1("s") && w.length > 1 &&
            "bcdfghjklmnoprtvy".indexOf(w.charAt(w.length - 2)) >= 0)
          w = w.dropRight(1)
    }

    // step 2: shorten a double-consonant ending (then continue to step 3)
    if (Seq("dd", "gd", "nn", "dt", "gt", "kt", "tt")
        .exists(s => w.endsWith(s) && inR1(s)))
      w = w.dropRight(1)

    // step 3
    if (w.endsWith("fullt") && inR1("fullt")) w = w.dropRight(1)
    else if (w.endsWith("löst") && inR1("löst")) w = w.dropRight(1)
    else if (w.endsWith("lig") && inR1("lig")) w = w.dropRight(3)
    else if (w.endsWith("els") && inR1("els")) w = w.dropRight(3)
    else if (w.endsWith("ig") && inR1("ig")) w = w.dropRight(2)
    w
  }

  // -------------------------------------------------------------- Danish
  // snowballstem.org/algorithms/danish/

  @inline private def daVowel(c: Char): Boolean = "aeiouyæåø".indexOf(c) >= 0

  private val DaStep1 = Seq(
    "erendes", "erende", "hedens", "ethed", "erede", "heden", "heder",
    "endes", "ernes", "erens", "erets", "ered", "ende", "erne", "eren",
    "erer", "heds", "enes", "eres", "eret", "hed", "ene", "ere", "ens",
    "ers", "ets", "en", "er", "es", "et", "e").sortBy(-_.length)

  def danishStem(word: String): String = {
    var w = word
    var r1 = standardR(w, 0, daVowel)
    if (r1 < 3) r1 = math.min(3, w.length)
    def inR1(s: String): Boolean = w.length - s.length >= r1
    def undoubleConsonant(): Unit = {
      val n = w.length
      if (n >= 2 && w.charAt(n - 1) == w.charAt(n - 2) &&
          !daVowel(w.charAt(n - 1)) && inR1(w.substring(n - 1)))
        w = w.dropRight(1)
    }
    def step2(): Unit =
      if (Seq("gd", "dt", "gt", "kt").exists(s => w.endsWith(s) && inR1(s)))
        w = w.dropRight(1)

    // step 1
    DaStep1.find(w.endsWith) match {
      case Some(s) => if (inR1(s)) w = w.dropRight(s.length)
      case None =>
        if (w.endsWith("s") && inR1("s") && w.length > 1 &&
            "abcdfghjklmnoprtvyzå".indexOf(w.charAt(w.length - 2)) >= 0)
          w = w.dropRight(1)
    }
    step2()
    // step 3
    if (w.endsWith("igst")) w = w.dropRight(2)
    val s3 = Seq("elig", "lig", "els", "ig").find(w.endsWith)
    s3 match {
      case Some(s) if inR1(s) => w = w.dropRight(s.length); step2()
      case _ =>
        if (w.endsWith("løst") && inR1("løst")) w = w.dropRight(1)
    }
    // step 4: undouble
    undoubleConsonant()
    w
  }

  // ------------------------------------------------------------ Norwegian
  // snowballstem.org/algorithms/norwegian/

  @inline private def noVowel(c: Char): Boolean = "aeiouyæåø".indexOf(c) >= 0

  private val NoStep1 = Seq(
    "hetenes", "hetene", "hetens", "heten", "heter", "endes", "enes",
    "edes", "ande", "ende", "ane", "ene", "ets", "ede",
    "ers", "ens", "het", "ast", "en", "ar", "er", "as", "es", "et",
    "a", "e").sortBy(-_.length)

  def norwegianStem(word: String): String = {
    var w = word
    var r1 = standardR(w, 0, noVowel)
    if (r1 < 3) r1 = math.min(3, w.length)
    def inR1(s: String): Boolean = w.length - s.length >= r1

    // step 1: longest of the list / erte|ert -> er / s with valid s-ending
    if (w.endsWith("erte") && inR1("erte")) w = w.dropRight(2)
    else if (w.endsWith("ert") && inR1("ert")) w = w.dropRight(1)
    else NoStep1.find(w.endsWith) match {
      case Some(s) => if (inR1(s)) w = w.dropRight(s.length)
      case None =>
        if (w.endsWith("s") && inR1("s") && w.length > 1 && {
          val c = w.charAt(w.length - 2)
          "bcdfghjlmnoprtvyz".indexOf(c) >= 0 ||
            (c == 'k' && (w.length < 3 || !noVowel(w.charAt(w.length - 3))))
        }) w = w.dropRight(1)
    }
    // step 2
    if ((w.endsWith("dt") || w.endsWith("vt")) && inR1(w.takeRight(2)))
      w = w.dropRight(1)
    // step 3
    Seq("hetslov", "eleg", "elig", "elov", "slov", "leg", "lig", "els",
        "lov", "eig", "ig").sortBy(-_.length).find(w.endsWith) match {
      case Some(s) if inR1(s) => w = w.dropRight(s.length)
      case _ =>
    }
    w
  }

  // ------------------------------------------------------------- Finnish
  // snowballstem.org/algorithms/finnish/ — the FinnishAnalyzer DEFAULT
  // stemmer (SnowballFilter(FinnishStemmer); the generated Tartarus program
  // is contrib/Snowball/SF/Snowball/Ext/FinnishStemmer.cs). Backward-mode
  // rules over R1/R2 with the among condition/backtrack semantics
  // preserved: particle -> possessive -> case-ending -> other-endings ->
  // (i_plural if an ending was removed else t_plural) -> tidy.

  @inline private def fiV(c: Char): Boolean = "aeiouyäö".indexOf(c) >= 0
  @inline private def fiVnoY(c: Char): Boolean = "aeiouäö".indexOf(c) >= 0
  private val FiLong = Set("aa", "ee", "ii", "oo", "uu", "ää", "öö")

  def finnishStem(word: String): String = {
    val sb = new StringBuilder(word)
    // R1/R2: after the first non-vowel following the first vowel (twice)
    def mark(from: Int): Int = {
      var i = from
      while (i < sb.length && !fiV(sb.charAt(i))) i += 1
      while (i < sb.length && fiV(sb.charAt(i))) i += 1
      if (i >= sb.length) sb.length else i + 1
    }
    val p1 = mark(0)
    val p2 = mark(p1)

    def endsAt(s: String, endPos: Int): Boolean = {
      val off = endPos - s.length
      off >= 0 && {
        var k = 0
        while (k < s.length && sb.charAt(off + k) == s.charAt(k)) k += 1
        k == s.length
      }
    }
    def ends(s: String): Boolean = endsAt(s, sb.length)
    def del(n: Int): Unit = sb.setLength(sb.length - n)
    // longest suffix of `cands` starting inside the region [rp, len)
    def longestIn(rp: Int, cands: Seq[String]): Option[String] =
      cands.sortBy(-_.length).find(s => ends(s) && sb.length - s.length >= rp)

    var endingRemoved = false

    // ---- particle_etc (R1)
    locally {
      val m = longestIn(p1, Seq("kaan", "kään", "sti", "han", "kin", "hän",
        "pa", "ko", "pä", "kö"))
      m.foreach {
        case "sti" => if (sb.length - 3 >= p2) del(3)
        case s =>
          val b = sb.length - s.length - 1
          if (b >= 0 && (fiV(sb.charAt(b)) || sb.charAt(b) == 'n' || sb.charAt(b) == 't'))
            del(s.length)
      }
    }

    // ---- possessive (R1)
    locally {
      val m = longestIn(p1, Seq("nsa", "nsä", "mme", "nne", "ni", "si", "an", "en", "än"))
      m.foreach {
        case "si" => if (!endsAt("k", sb.length - 2)) del(2)
        case "ni" =>
          del(2)
          if (ends("kse")) { del(3); sb.append("ksi") }
        case "nsa" | "nsä" | "mme" | "nne" => del(3)
        case "an" =>
          val e = sb.length - 2
          if (Seq("lla", "na", "ssa", "ta", "lta", "sta").exists(endsAt(_, e))) del(2)
        case "än" =>
          val e = sb.length - 2
          if (Seq("llä", "nä", "ssä", "tä", "ltä", "stä").exists(endsAt(_, e))) del(2)
        case "en" =>
          val e = sb.length - 2
          if (Seq("lle", "ine").exists(endsAt(_, e))) del(2)
        case _ =>
      }
    }

    def longAt(endPos: Int): Boolean =
      endPos >= 2 && FiLong.contains(sb.substring(endPos - 2, endPos))
    // VI: 'i' preceded by a V-no-y vowel, checked at `endPos`
    def viAt(endPos: Int): Boolean =
      endPos >= 2 && sb.charAt(endPos - 1) == 'i' && fiVnoY(sb.charAt(endPos - 2))

    // ---- case ending (R1); among backtracks when a VI/LONG entry's
    // routine fails (falls to the shorter "n"), but positional conditions
    // of a selected entry fail the whole rule (Snowball switch semantics)
    locally {
      // (literal, routine-cond, switch-case)
      val entries: Seq[(String, Int => Boolean, Int)] = Seq(
        ("seen", (e: Int) => longAt(e), -1),
        ("tten", (e: Int) => viAt(e), -1),
        ("siin", (e: Int) => viAt(e), -1),
        ("den", (e: Int) => viAt(e), -1),
        ("han", (_: Int) => true, 1), ("hen", (_: Int) => true, 2),
        ("hin", (_: Int) => true, 3), ("hon", (_: Int) => true, 4),
        ("hän", (_: Int) => true, 5), ("hön", (_: Int) => true, 6),
        ("lla", (_: Int) => true, -1), ("ssa", (_: Int) => true, -1),
        ("lta", (_: Int) => true, -1), ("sta", (_: Int) => true, -1),
        ("tta", (_: Int) => true, 9), ("llä", (_: Int) => true, -1),
        ("ssä", (_: Int) => true, -1), ("ltä", (_: Int) => true, -1),
        ("stä", (_: Int) => true, -1), ("ttä", (_: Int) => true, 9),
        ("lle", (_: Int) => true, -1), ("ine", (_: Int) => true, -1),
        ("ksi", (_: Int) => true, -1),
        ("na", (_: Int) => true, -1), ("ta", (_: Int) => true, -1),
        ("nä", (_: Int) => true, -1), ("tä", (_: Int) => true, -1),
        ("a", (_: Int) => true, 8), ("ä", (_: Int) => true, 8),
        ("n", (_: Int) => true, 7))
      val selected = entries.sortBy(-_._1.length).find { case (s, cond, _) =>
        ends(s) && sb.length - s.length >= p1 && cond(sb.length - s.length)
      }
      selected.foreach { case (s, _, c) =>
        val start = sb.length - s.length
        val ok = c match {
          case 1 => endsAt("a", start)
          case 2 => endsAt("e", start)
          case 3 => endsAt("i", start)
          case 4 => endsAt("o", start)
          case 5 => endsAt("ä", start)
          case 6 => endsAt("ö", start)
          case 8 => start >= 2 && fiV(sb.charAt(start - 1)) && !fiV(sb.charAt(start - 2))
          case 9 => endsAt("e", start)
          case _ => true
        }
        if (ok) {
          var n = s.length
          if (c == 7 && (longAt(start) || endsAt("ie", start)))
            n += 1 // 'n' takes one extra preceding char after LONG/ie
          del(n)
          endingRemoved = true
        }
      }
    }

    // ---- other endings (R2): i-superlatives and eja/ejä delete
    // unconditionally; plain comparatives require not-"po" (rule fails,
    // no fallback, when "po" precedes)
    locally {
      val m = longestIn(p2, Seq("impi", "impa", "impä", "immi", "imma",
        "immä", "eja", "ejä", "mpi", "mpa", "mpä", "mmi", "mma", "mmä"))
      m.foreach { s =>
        val uncond = s.startsWith("i") || s.startsWith("e")
        if (uncond || !endsAt("po", sb.length - s.length)) del(s.length)
      }
    }

    if (endingRemoved) {
      // i_plural (R1)
      if (sb.nonEmpty && sb.length - 1 >= p1 &&
          (sb.charAt(sb.length - 1) == 'i' || sb.charAt(sb.length - 1) == 'j')) del(1)
    } else {
      // t_plural: 't' (R1) preceded by a vowel, then mma/imma in R2
      if (sb.nonEmpty && sb.length - 1 >= p1 && sb.charAt(sb.length - 1) == 't' &&
          sb.length >= 2 && fiV(sb.charAt(sb.length - 2))) {
        del(1)
        val m = longestIn(p2, Seq("imma", "mma"))
        m.foreach { s =>
          if (s == "imma" || !endsAt("po", sb.length - s.length)) del(s.length)
        }
      }
    }

    // ---- tidy (steps a-d region-limited INCLUDING their lookbacks)
    if (sb.length - 2 >= p1 && longAt(sb.length)) del(1) // shorten LONG
    if (sb.length - 1 >= p1 && "aeiä".indexOf(sb.charAt(sb.length - 1)) >= 0 &&
        sb.length - 2 >= p1 && !fiV(sb.charAt(sb.length - 2))) del(1)
    if (sb.length - 1 >= p1 && sb.charAt(sb.length - 1) == 'j' &&
        sb.length - 2 >= p1 &&
        (sb.charAt(sb.length - 2) == 'o' || sb.charAt(sb.length - 2) == 'u')) del(1)
    if (sb.length - 1 >= p1 && sb.charAt(sb.length - 1) == 'o' &&
        sb.length - 2 >= p1 && sb.charAt(sb.length - 2) == 'j') del(1)
    // undouble the LAST consonant of the word (no region limit)
    locally {
      var k = sb.length - 1
      while (k >= 0 && fiV(sb.charAt(k))) k -= 1
      if (k >= 1 && sb.charAt(k - 1) == sb.charAt(k)) sb.deleteCharAt(k)
    }

    sb.toString
  }

  // ------------------------------------------------------------ Hungarian
  // snowballstem.org/algorithms/hungarian/ — the HungarianAnalyzer DEFAULT
  // (SnowballFilter(HungarianStemmer); generated program at
  // contrib/Snowball/SF/Snowball/Ext/HungarianStemmer.cs). R1-only
  // backward rules: instrum -> case -> case_special -> case_other ->
  // factive -> owned -> sing_owner -> plur_owner -> plural, each an
  // independent longest-suffix among with delete / a / e actions. The
  // generated table spells long-umlaut vowels with Latin-1 õ/û; both those
  // and the modern ő/ű forms are accepted (documented superset).

  private val HuVowels = "aeiouáéíóõöúûüőű"
  @inline private def huV(c: Char): Boolean = HuVowels.indexOf(c) >= 0
  private val HuDigraphs = Seq("dzs", "cs", "gy", "ly", "ny", "sz", "ty", "zs")
  private val HuDoubles = Seq("ccs", "zzs", "ggy", "lly", "nny", "tty", "ssz",
    "bb", "cc", "dd", "ff", "gg", "jj", "kk", "ll", "mm", "nn", "pp", "rr",
    "ss", "tt", "vv", "zz")

  def hungarianStem(word: String): String = {
    val sb = new StringBuilder(word)
    // mark_regions: vowel-initial words mark after the first consonant
    // cluster (a digraph counts as one consonant); consonant-initial words
    // mark after the first vowel
    val p1: Int = {
      if (sb.nonEmpty && huV(sb.charAt(0))) {
        var i = 0
        while (i < sb.length && huV(sb.charAt(i))) i += 1
        if (i >= sb.length) sb.length
        else HuDigraphs.find(d => sb.indexOf(d, i) == i) match {
          case Some(d) => i + d.length
          case None => i + 1
        }
      } else {
        var i = 0
        while (i < sb.length && !huV(sb.charAt(i))) i += 1
        if (i >= sb.length) sb.length else i + 1
      }
    }

    def endsAt(s: String, endPos: Int): Boolean = {
      val off = endPos - s.length
      off >= 0 && {
        var k = 0
        while (k < s.length && sb.charAt(off + k) == s.charAt(k)) k += 1
        k == s.length
      }
    }
    def ends(s: String): Boolean = endsAt(s, sb.length)
    def inR1(s: String): Boolean = sb.length - s.length >= p1
    def doubleBefore(endPos: Int): Boolean = HuDoubles.exists(endsAt(_, endPos))
    def undouble(): Unit = // remove one char of the final double (the
      if (sb.length >= 2) sb.deleteCharAt(sb.length - 2) // middle of ggy etc.)
    def vEnding(): Unit =
      if (ends("á") && inR1("á")) sb.setCharAt(sb.length - 1, 'a')
      else if (ends("é") && inR1("é")) sb.setCharAt(sb.length - 1, 'e')

    /** Longest suffix in R1 from `table` (suffix -> replacement, "" =
      * delete); applies and returns true when found. */
    def among(table: Seq[(String, String)]): Boolean =
      table.sortBy(-_._1.length).find(e => ends(e._1) && inR1(e._1)) match {
        case Some((s, r)) =>
          sb.setLength(sb.length - s.length); sb.append(r); true
        case None => false
      }

    // instrum: -al/-el after a double consonant, then undouble
    locally {
      val m = Seq("al", "el").find(s => ends(s) && inR1(s) &&
        doubleBefore(sb.length - s.length))
      m.foreach { s => sb.setLength(sb.length - s.length); undouble() }
    }
    // case endings (both õ/û and ő/ű spellings accepted)
    if (among(Seq(
      "ba" -> "", "ra" -> "", "be" -> "", "re" -> "", "ig" -> "",
      "nak" -> "", "nek" -> "", "val" -> "", "vel" -> "", "ul" -> "",
      "nál" -> "", "nél" -> "", "ból" -> "", "ról" -> "", "tól" -> "",
      "bõl" -> "", "rõl" -> "", "tõl" -> "", "ből" -> "", "ről" -> "",
      "től" -> "", "ül" -> "", "n" -> "", "an" -> "", "ban" -> "",
      "en" -> "", "ben" -> "", "képpen" -> "", "on" -> "", "ön" -> "",
      "képp" -> "", "kor" -> "", "t" -> "", "at" -> "", "et" -> "",
      "ként" -> "", "anként" -> "", "enként" -> "", "onként" -> "",
      "ot" -> "", "ért" -> "", "öt" -> "", "hez" -> "", "hoz" -> "",
      "höz" -> "", "vá" -> "", "vé" -> ""))) vEnding()
    // case_special
    among(Seq("ánként" -> "a", "án" -> "a", "én" -> "e"))
    // case_other
    among(Seq("ástul" -> "a", "éstül" -> "e", "astul" -> "", "estül" -> "",
      "stul" -> "", "stül" -> ""))
    // factive: final á/é after a double consonant, then undouble
    locally {
      val m = Seq("á", "é").find(s => ends(s) && inR1(s) &&
        doubleBefore(sb.length - s.length))
      m.foreach { s => sb.setLength(sb.length - s.length); undouble() }
    }
    // owned
    among(Seq("áéi" -> "a", "ééi" -> "e", "aké" -> "", "eké" -> "",
      "oké" -> "", "áké" -> "a", "éké" -> "e", "öké" -> "", "éi" -> "",
      "éé" -> "e", "ké" -> "", "é" -> ""))
    // sing_owner
    among(Seq(
      "unk" -> "", "ünk" -> "", "ánk" -> "a", "énk" -> "e", "nk" -> "",
      "ájuk" -> "a", "éjük" -> "e", "juk" -> "", "jük" -> "", "uk" -> "",
      "ük" -> "", "am" -> "", "em" -> "", "om" -> "", "ám" -> "a",
      "ém" -> "e", "m" -> "", "ad" -> "", "ed" -> "", "od" -> "",
      "öd" -> "", "ád" -> "a", "éd" -> "e", "d" -> "", "ja" -> "",
      "je" -> "", "a" -> "", "e" -> "", "o" -> "", "á" -> "a", "é" -> "e"))
    // plur_owner
    among(Seq(
      "jaim" -> "", "jeim" -> "", "áim" -> "a", "éim" -> "e", "aim" -> "",
      "eim" -> "", "im" -> "", "jaid" -> "", "jeid" -> "", "áid" -> "a",
      "éid" -> "e", "aid" -> "", "eid" -> "", "id" -> "", "jai" -> "",
      "jei" -> "", "ái" -> "a", "éi" -> "e", "ai" -> "", "ei" -> "",
      "i" -> "", "jaink" -> "", "jeink" -> "", "aink" -> "", "eink" -> "",
      "áink" -> "a", "éink" -> "e", "ink" -> "", "jaitok" -> "",
      "jeitek" -> "", "aitok" -> "", "eitek" -> "", "áitok" -> "a",
      "éitek" -> "e", "itek" -> "", "jaik" -> "", "jeik" -> "",
      "aik" -> "", "eik" -> "", "áik" -> "a", "éik" -> "e", "ik" -> ""))
    // plural
    among(Seq("ák" -> "a", "ék" -> "e", "ök" -> "", "ak" -> "", "ok" -> "",
      "ek" -> "", "k" -> ""))

    sb.toString
  }

  // ------------------------------------------------------------- Romanian
  // snowballstem.org/algorithms/romanian/ — the RomanianAnalyzer's only
  // stemmer (SnowballFilter(RomanianStemmer); generated program at
  // contrib/Snowball/SF/Snowball/Ext/RomanianStemmer.cs). prelude marks
  // non-syllabic i/u between vowels as I/U; backward rules: step_0 (R1) ->
  // standard_suffix (combo repeat in R1 + residual in R2) -> verb_suffix
  // (RV, only when no standard suffix was removed) -> vowel_suffix (RV);
  // postlude restores i/u.

  @inline private def roV(c: Char): Boolean = "aeiouâîă".indexOf(c) >= 0

  def romanianStem(word0: String): String = {
    // the generated table spells s/t-comma as the cedilla forms ş/ţ
    // (U+015F/U+0163); modern comma-below ș/ț (U+0219/U+021B) normalize to
    // them so both spellings stem identically (documented superset)
    val sb = new StringBuilder(word0.map {
      case 'ș' => 'ş'; case 'ț' => 'ţ'; case c => c
    })
    // prelude
    var k = 1
    while (k < sb.length - 1) {
      val c = sb.charAt(k)
      if ((c == 'u' || c == 'i') && roV(sb.charAt(k - 1)) && roV(sb.charAt(k + 1)))
        sb.setCharAt(k, if (c == 'u') 'U' else 'I')
      k += 1
    }
    // RV
    val pV: Int = {
      def firstFrom(i0: Int, want: Char => Boolean): Int = {
        var i = i0
        while (i < sb.length && !want(sb.charAt(i))) i += 1
        if (i >= sb.length) sb.length else i + 1
      }
      if (sb.length < 2) sb.length
      else if (roV(sb.charAt(0))) {
        if (!roV(sb.charAt(1))) firstFrom(2, roV)       // v C ... gopast vowel
        else firstFrom(2, c => !roV(c))                  // v v ... gopast consonant
      } else {
        if (!roV(sb.charAt(1))) firstFrom(2, roV)        // C C ... gopast vowel
        else if (sb.length >= 3) 3 else sb.length        // C v x -> after 3rd char
      }
    }
    // R1/R2
    def mark(from: Int): Int = {
      var i = from
      while (i < sb.length && !roV(sb.charAt(i))) i += 1
      while (i < sb.length && roV(sb.charAt(i))) i += 1
      if (i >= sb.length) sb.length else i + 1
    }
    val p1 = { var i = 0
      while (i < sb.length && !roV(sb.charAt(i))) i += 1
      while (i < sb.length && roV(sb.charAt(i))) i += 1
      if (i >= sb.length) sb.length else i + 1 }
    val p2 = mark(p1)

    def endsAt(s: String, endPos: Int): Boolean = {
      val off = endPos - s.length
      off >= 0 && {
        var j = 0
        while (j < s.length && sb.charAt(off + j) == s.charAt(j)) j += 1
        j == s.length
      }
    }
    def ends(s: String): Boolean = endsAt(s, sb.length)
    def replace(sufLen: Int, r: String): Unit = {
      sb.setLength(sb.length - sufLen); sb.append(r)
    }
    /** Longest suffix from `table` starting at or after `rp`; applies the
      * replacement ("" = delete). Returns whether a rule fired. */
    def among(rp: Int, table: Seq[(String, String)]): Boolean =
      table.sortBy(-_._1.length).find(e => ends(e._1) && sb.length - e._1.length >= rp) match {
        case Some((s, r)) => replace(s.length, r); true
        case None => false
      }

    // step_0 (R1)
    locally {
      val cands: Seq[(String, Int)] = Seq("ului" -> 1, "ul" -> 1, "aua" -> 2,
        "elor" -> 3, "ele" -> 3, "ea" -> 3, "iilor" -> 4, "iile" -> 4,
        "ilor" -> 4, "iua" -> 4, "iei" -> 4, "ii" -> 4, "ile" -> 5,
        "atei" -> 6, "aţia" -> 7, "aţie" -> 7)
      cands.sortBy(-_._1.length).find(e => ends(e._1) && sb.length - e._1.length >= p1)
        .foreach { case (s, c) =>
          c match {
            case 1 => replace(s.length, "")
            case 2 => replace(s.length, "a")
            case 3 => replace(s.length, "e")
            case 4 => replace(s.length, "i")
            case 5 => if (!endsAt("ab", sb.length - s.length)) replace(s.length, "i")
            case 6 => replace(s.length, "at")
            case 7 => replace(s.length, "aţi")
          }
        }
    }

    // standard_suffix: repeat combo (R1), then residual (R2)
    var stdRemoved = false
    val Combo: Seq[(String, String)] = Seq(
      "abilitate" -> "abil", "abilitati" -> "abil", "abilităi" -> "abil",
      "abilităţi" -> "abil", "ibilitate" -> "ibil",
      "ivitate" -> "iv", "ivitati" -> "iv", "ivităi" -> "iv", "ivităţi" -> "iv",
      "icitate" -> "ic", "icitati" -> "ic", "icităi" -> "ic", "icităţi" -> "ic",
      "icatori" -> "ic", "icator" -> "ic",
      "icala" -> "ic", "icale" -> "ic", "icali" -> "ic", "ical" -> "ic", "icală" -> "ic",
      "iciva" -> "ic", "icive" -> "ic", "icivi" -> "ic", "iciv" -> "ic", "icivă" -> "ic",
      "ativa" -> "at", "ative" -> "at", "ativi" -> "at", "ativ" -> "at", "ativă" -> "at",
      "aţiune" -> "at", "atoare" -> "at", "ătoare" -> "at",
      "atori" -> "at", "ători" -> "at", "ator" -> "at", "ător" -> "at",
      "itiva" -> "it", "itive" -> "it", "itivi" -> "it", "itiv" -> "it", "itivă" -> "it",
      "iţiune" -> "it", "itoare" -> "it", "itori" -> "it", "itor" -> "it")
    var fired = true
    while (fired) {
      fired = among(p1, Combo)
      if (fired) stdRemoved = true
    }
    locally {
      val del: Seq[String] = Seq("ica", "abila", "ibila", "oasa", "ata",
        "ita", "anta", "uta", "iva", "ic", "ice", "abile", "ibile", "oase",
        "ate", "itate", "ite", "ante", "ute", "ive", "ici", "abili",
        "ibili", "atori", "osi", "ati", "itati", "iti", "anti", "uti",
        "ivi", "ităi", "oşi", "ităţi", "abil", "ibil", "ator", "os", "at",
        "it", "ant", "ut", "iv", "ică", "abilă", "ibilă", "oasă", "ată",
        "ită", "antă", "ută", "ivă")
      val ist: Seq[String] = Seq("ista", "isme", "iste", "isti", "işti",
        "ism", "ist", "istă")
      val iune: Seq[String] = Seq("iune", "iuni")
      val all: Seq[(String, Int)] = del.map(_ -> 1) ++ iune.map(_ -> 2) ++ ist.map(_ -> 3)
      all.sortBy(-_._1.length).find(e => ends(e._1) && sb.length - e._1.length >= p2)
        .foreach { case (s, c) =>
          c match {
            case 1 => replace(s.length, ""); stdRemoved = true
            case 2 => // ţiune/ţiuni -> t
              if (endsAt("ţ", sb.length - s.length)) {
                replace(s.length + 1, "t"); stdRemoved = true
              }
            case 3 => replace(s.length, "ist"); stdRemoved = true
          }
        }
    }

    // verb_suffix (RV) — only when no standard suffix was removed
    if (!stdRemoved) {
      val v1: Seq[String] = Seq("ea", "ia", "esc", "ăsc", "ind", "ând",
        "are", "ere", "ire", "âre", "ase", "ise", "use", "âse", "eşte",
        "ăşte", "eze", "ai", "eai", "iai", "eşti", "ăşti", "ui", "ezi",
        "âi", "aşi", "aseşi", "iseşi", "useşi", "âseşi", "işi", "uşi",
        "âşi", "eaţi", "iaţi", "arăţi", "aserăţi", "iserăţi", "userăţi",
        "âserăţi", "irăţi", "urăţi", "ârăţi", "am", "eam", "iam", "asem",
        "isem", "usem", "âsem", "arăm", "aserăm", "iserăm", "userăm",
        "âserăm", "irăm", "urăm", "ârăm", "au", "eau", "iau", "indu",
        "ându", "ez", "ească", "ară", "aseră", "iseră", "useră", "âseră",
        "iră", "ură", "âră", "ează")
      val v2: Seq[String] = Seq("se", "sese", "sei", "seşi", "seseşi",
        "aţi", "eţi", "iţi", "âţi", "serăţi", "seserăţi", "em", "sesem",
        "im", "âm", "ăm", "serăm", "seserăm", "seră", "seseră")
      // NOTE: v1/v2 overlap via among links; longest literal wins with its
      // own case, exactly like find_among_b
      val all: Seq[(String, Int)] = v1.map(_ -> 1) ++ v2.map(_ -> 2)
      all.sortBy(-_._1.length).find(e => ends(e._1) && sb.length - e._1.length >= pV)
        .foreach { case (s, c) =>
          val start = sb.length - s.length
          c match {
            case 1 =>
              // preceded (within RV) by a non-vowel or by 'u'
              if (start - 1 >= pV &&
                  (!roV(sb.charAt(start - 1)) || sb.charAt(start - 1) == 'u'))
                replace(s.length, "")
            case 2 => replace(s.length, "")
          }
        }
    }

    // vowel_suffix (RV)
    among(pV, Seq("ie" -> "", "a" -> "", "e" -> "", "i" -> "", "ă" -> ""))

    // postlude
    var m = 0
    while (m < sb.length) {
      val c = sb.charAt(m)
      if (c == 'I') sb.setCharAt(m, 'i') else if (c == 'U') sb.setCharAt(m, 'u')
      m += 1
    }
    sb.toString
  }

  // ------------------------------------------------------------- Russian
  // snowballstem.org/algorithms/russian/

  @inline private def ruVowel(c: Char): Boolean =
    "аеиоуыэюя".indexOf(c) >= 0

  private val RuPerfGerund1 = Seq("вшись", "вши", "в")
  private val RuPerfGerund2 = Seq("ившись", "ывшись", "ивши", "ывши", "ив", "ыв")
  private val RuAdjective = Seq(
    "ими", "ыми", "его", "ого", "ему", "ому", "ее", "ие", "ые", "ое",
    "ей", "ий", "ый", "ой", "ем", "им", "ым", "ом", "их", "ых", "ую",
    "юю", "ая", "яя", "ою", "ею").sortBy(-_.length)
  private val RuParticiple1 = Seq("ем", "нн", "вш", "ющ", "щ").sortBy(-_.length)
  private val RuParticiple2 = Seq("ивш", "ывш", "ующ").sortBy(-_.length)
  private val RuVerb1 = Seq(
    "ете", "йте", "ешь", "нно", "ла", "на", "ли", "ем", "ло", "но",
    "ет", "ют", "ны", "ть", "й", "л", "н").sortBy(-_.length)
  private val RuVerb2 = Seq(
    "ейте", "уйте", "ила", "ыла", "ена", "ите", "или", "ыли", "ило",
    "ыло", "ено", "ует", "уют", "ены", "ить", "ыть", "ишь", "ей", "уй",
    "ил", "ыл", "им", "ым", "ен", "ят", "ит", "ыт", "ую", "ю").sortBy(-_.length)
  private val RuNoun = Seq(
    "иями", "ями", "ами", "ией", "иям", "ием", "иях", "ев", "ов", "ие",
    "ье", "еи", "ии", "ей", "ой", "ий", "ям", "ем", "ам", "ом", "ах",
    "ях", "ию", "ью", "ия", "ья", "а", "е", "и", "й", "о", "у", "ы",
    "ь", "ю", "я").sortBy(-_.length)

  def russianStem(word: String): String = {
    var w = word
    // RV: after the first vowel
    var rv = 0
    while (rv < w.length && !ruVowel(w.charAt(rv))) rv += 1
    rv += 1
    if (rv > w.length) return w
    val r1 = standardR(w, 0, ruVowel)
    val r2 = standardR(w, r1, ruVowel)
    def inRv(s: String): Boolean = w.length - s.length >= rv
    def inR2(s: String): Boolean = w.length - s.length >= r2
    /** Remove the longest suffix of `sufs` lying in RV; group-1 suffixes
      * additionally require a preceding а/я (kept). Returns true if removed. */
    def drop(sufs: Seq[String], needAya: Boolean): Boolean = {
      sufs.find(s => w.endsWith(s) && inRv(s) &&
        (!needAya || {
          val p = w.length - s.length - 1
          p >= rv && (w.charAt(p) == 'а' || w.charAt(p) == 'я')
        })) match {
        case Some(s) => w = w.dropRight(s.length); true
        case None => false
      }
    }

    // step 1
    val gerund = drop(RuPerfGerund2, needAya = false) || drop(RuPerfGerund1, needAya = true)
    if (!gerund) {
      drop(Seq("ся", "сь"), needAya = false)
      val adjectival = drop(RuAdjective, needAya = false) && {
        drop(RuParticiple2, needAya = false) || drop(RuParticiple1, needAya = true)
        true
      }
      if (!adjectival) {
        val verb = drop(RuVerb2, needAya = false) || drop(RuVerb1, needAya = true)
        if (!verb) drop(RuNoun, needAya = false)
      }
    }

    // step 2
    if (w.endsWith("и") && inRv("и")) w = w.dropRight(1)

    // step 3 (derivational, in R2)
    if (w.endsWith("ость") && inR2("ость") && inRv("ость")) w = w.dropRight(4)
    else if (w.endsWith("ост") && inR2("ост") && inRv("ост")) w = w.dropRight(3)

    // step 4
    if (w.endsWith("нн") && inRv("нн")) w = w.dropRight(1)
    else if (w.endsWith("ейше") && inRv("ейше")) {
      w = w.dropRight(4)
      if (w.endsWith("нн") && inRv("нн")) w = w.dropRight(1)
    } else if (w.endsWith("ейш") && inRv("ейш")) {
      w = w.dropRight(3)
      if (w.endsWith("нн") && inRv("нн")) w = w.dropRight(1)
    } else if (w.endsWith("ь") && inRv("ь")) w = w.dropRight(1)

    w
  }
}
