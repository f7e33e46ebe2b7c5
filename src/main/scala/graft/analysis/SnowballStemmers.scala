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
