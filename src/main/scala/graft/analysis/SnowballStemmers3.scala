package graft.analysis

/** Third Snowball wave — the remaining full programs shipped inside the
  * reference's contrib Snowball directory
  * (/root/reference/src/contrib/Snowball/SF/Snowball/Ext), reachable
  * there by name through SnowballAnalyzer's reflection dispatch
  * (contrib/Snowball/Lucene.Net.Snowball/SnowballAnalyzer analog). Fresh
  * implementations of the published algorithms (snowballstem.org) at the
  * REVISION the in-tree generated programs carry — each among table and
  * region condition below was checked against the corresponding .cs
  * among/grouping data, not against the current upstream spec (the specs
  * drifted after 2006; the in-tree programs are the contract here).
  *
  * Longest-match discipline throughout: the longest matching suffix in a
  * rule group is selected FIRST and its condition checked after — a failing
  * condition means no action, never a retry with a shorter suffix.
  */
object SnowballStemmers3 {

  /** Standard R-region: position after the first non-vowel following a
    * vowel, searching from `from`; w.length when absent. */
  private def standardR(w: String, from: Int, vowel: Char => Boolean): Int = {
    var i = from
    while (i < w.length && !vowel(w.charAt(i))) i += 1
    while (i < w.length && vowel(w.charAt(i))) i += 1
    if (i < w.length) i + 1 else w.length
  }

  // ------------------------------------------------------------- German
  // GermanStemmer.cs (classic 2005 revision): prelude marks ß->ss and
  // u/y between vowels as consonants U/Y; R1 floored at 3; three suffix
  // steps; postlude unrounds umlauts.

  @inline private def deVowel(c: Char): Boolean =
    c == 'a' || c == 'e' || c == 'i' || c == 'o' || c == 'u' || c == 'y' ||
      c == 'ä' || c == 'ö' || c == 'ü'
  private val DeSEnding = "bdfghklmnrt"  // g_s_ending
  private val DeStEnding = "bdfghklmnt"  // g_st_ending (no r)

  /** u/y with a vowel on BOTH sides become consonant-marked U/Y
    * (sequential left-to-right, matching the generated repeat/goto). */
  private def deMarkUY(w: String): String = {
    if (w.length < 3) return w
    val sb = new StringBuilder(w)
    var i = 1
    while (i < sb.length - 1) {
      val c = sb.charAt(i)
      if ((c == 'u' || c == 'y') && deVowel(sb.charAt(i - 1)) && deVowel(sb.charAt(i + 1)))
        sb.setCharAt(i, if (c == 'u') 'U' else 'Y')
      i += 1
    }
    sb.toString
  }

  /** Snowball German (the SnowballAnalyzer("German") program). */
  def germanStem(word: String): String = deStem(word, german2 = false)

  /** Snowball German2 (German2Stemmer.cs): additionally folds ae/oe/ue to
    * umlauts in the prelude, protecting `qu`. */
  def german2Stem(word: String): String = deStem(word, german2 = true)

  private def deStem(word0: String, german2: Boolean): String = {
    var w = word0
    // prelude
    if (german2) {
      w = deMarkUY(w)
      val sb = new StringBuilder
      var i = 0
      while (i < w.length) {
        val c = w.charAt(i)
        val next = if (i + 1 < w.length) w.charAt(i + 1) else ' '
        if (c == 'ß') { sb.append("ss"); i += 1 }
        else if (c == 'q' && next == 'u') { sb.append("qu"); i += 2 }
        else if (c == 'a' && next == 'e') { sb.append('ä'); i += 2 }
        else if (c == 'o' && next == 'e') { sb.append('ö'); i += 2 }
        else if (c == 'u' && next == 'e') { sb.append('ü'); i += 2 }
        else { sb.append(c); i += 1 }
      }
      w = sb.toString
    } else {
      w = w.replace("ß", "ss")
      w = deMarkUY(w)
    }

    val r1raw = standardR(w, 0, deVowel)
    // German particularity: the region before R1 must hold >= 3 letters
    val r1 = if (r1raw < 3) math.min(3, w.length) else r1raw
    val r2 = standardR(w, r1raw, deVowel)
    def inR1(sufLen: Int): Boolean = w.length - sufLen >= r1
    def inR2(sufLen: Int): Boolean = w.length - sufLen >= r2

    // step 1: longest of {e em en ern er es | s}; delete if R1
    //         (s additionally needs a valid s-ending before it)
    locate(w, Seq("ern", "em", "en", "er", "es", "e", "s")) match {
      case Some(s @ ("ern" | "em" | "en" | "er" | "es" | "e")) =>
        if (inR1(s.length)) w = w.dropRight(s.length)
      case Some("s") =>
        if (inR1(1) && w.length >= 2 && DeSEnding.indexOf(w.charAt(w.length - 2)) >= 0)
          w = w.dropRight(1)
      case _ => ()
    }

    // step 2: longest of {en er est | st}; delete if R1
    //         (st needs a valid st-ending itself preceded by >= 3 letters)
    locate(w, Seq("est", "en", "er", "st")) match {
      case Some(s @ ("est" | "en" | "er")) =>
        if (inR1(s.length)) w = w.dropRight(s.length)
      case Some("st") =>
        if (inR1(2) && w.length >= 6 &&
            DeStEnding.indexOf(w.charAt(w.length - 3)) >= 0)
          w = w.dropRight(2)
      case _ => ()
    }

    // step 3: d-suffixes, all conditioned on R2 at the match
    locate(w, Seq("lich", "isch", "heit", "keit", "end", "ung", "ig", "ik")) match {
      case Some(s @ ("end" | "ung")) if inR2(s.length) =>
        w = w.dropRight(s.length)
        if (w.endsWith("ig") && !w.endsWith("eig") && inR2(2)) w = w.dropRight(2)
      case Some(s @ ("ig" | "ik" | "isch")) if inR2(s.length) =>
        // not preceded by e
        if (!(w.length > s.length && w.charAt(w.length - s.length - 1) == 'e'))
          w = w.dropRight(s.length)
      case Some(s @ ("lich" | "heit")) if inR2(s.length) =>
        w = w.dropRight(s.length)
        locate(w, Seq("er", "en")) match {
          case Some(p) if inR1(p.length) => w = w.dropRight(p.length)
          case _ => ()
        }
      case Some("keit") if inR2(4) =>
        w = w.dropRight(4)
        locate(w, Seq("lich", "ig")) match {
          case Some(p) if inR2(p.length) => w = w.dropRight(p.length)
          case _ => ()
        }
      case _ => ()
    }

    // postlude: unmark U/Y, unround umlauts
    val out = new StringBuilder(w.length)
    var i = 0
    while (i < w.length) {
      out.append(w.charAt(i) match {
        case 'U' => 'u'
        case 'Y' => 'y'
        case 'ä' => 'a'
        case 'ö' => 'o'
        case 'ü' => 'u'
        case c => c
      })
      i += 1
    }
    out.toString
  }

  /** Longest suffix of `w` among `sufs` (sufs need not be pre-sorted). */
  private def locate(w: String, sufs: Seq[String]): Option[String] = {
    var best: String = null
    sufs.foreach { s => if (w.endsWith(s) && (best == null || s.length > best.length)) best = s }
    Option(best)
  }

  /** Longest suffix whose match starts at or after `minStart` — the
    * `setlimit tomark pV` discipline: a longer suffix crossing the region
    * boundary does NOT shadow a shorter in-region one. */
  private def locateWithin(w: String, sufs: Seq[String], minStart: Int): Option[String] = {
    var best: String = null
    sufs.foreach { s =>
      if (w.endsWith(s) && w.length - s.length >= minStart &&
          (best == null || s.length > best.length)) best = s
    }
    Option(best)
  }

  /** Romance RV (shared by es/it/pt/fr mark_regions): after the 2nd char
    * when the word starts consonant+vowel; after the first vowel following
    * position 1 when it starts with two consonants or vowel+consonant...
    * precisely the generated or-structure: v C -> past next vowel from 2;
    * v v -> past next consonant from 2; C C -> past next vowel from 2;
    * C v -> position 3. w.length when absent. */
  private def romanceRV(w: String, vowel: Char => Boolean): Int = {
    val n = w.length
    if (n < 3) return n
    def past(from: Int, pred: Char => Boolean): Int = {
      var i = from
      while (i < n && !pred(w.charAt(i))) i += 1
      if (i < n) i + 1 else n
    }
    if (vowel(w.charAt(0))) {
      if (!vowel(w.charAt(1))) past(2, vowel)
      else past(2, c => !vowel(c))
    } else {
      if (!vowel(w.charAt(1))) past(2, vowel)
      else 3
    }
  }

  // ------------------------------------------------------------- Spanish
  // SpanishStemmer.cs: attached pronoun; standard OR y-verb OR verb
  // suffixes; residual; acute-accent postlude.

  @inline private def esVowel(c: Char): Boolean =
    "aeiouáéíóúü".indexOf(c) >= 0

  private val EsPronouns = Seq(
    "selas", "selos", "sela", "selo", "las", "les", "los", "nos",
    "la", "le", "lo", "me", "se")
  private val EsGerInf = Seq(
    "iéndo", "iendo", "yendo", "ándo", "ando", "ár", "ér", "ír", "ar", "er", "ir")
  private val EsStd1 = Set(
    "ica", "icas", "ico", "icos", "osa", "osas", "oso", "osos",
    "ista", "istas", "ismo", "ismos", "able", "ables", "ible", "ibles",
    "anza", "anzas", "amiento", "amientos", "imiento", "imientos")
  private val EsStd2 = Set("adora", "adoras", "ador", "adores", "ación", "aciones")
  private val EsStdAll: Seq[String] = (EsStd1 ++ EsStd2 ++ Set(
    "logía", "logías", "ución", "uciones", "encia", "encias",
    "amente", "mente", "idad", "idades", "iva", "ivas", "ivo", "ivos")).toSeq
  private val EsYVerb = Seq(
    "ya", "ye", "yan", "yen", "yeron", "yendo", "yo", "yó",
    "yas", "yes", "yais", "yamos")
  private val EsVerbEn = Set("en", "es", "éis", "emos")
  private val EsVerb: Seq[String] = Seq(
    "aba", "ada", "ida", "ara", "iera", "ía", "aría", "ería", "iría",
    "ad", "ed", "id", "ase", "iese", "aste", "iste", "an", "aban",
    "aran", "ieran", "ían", "arían", "erían", "irían", "en", "asen",
    "iesen", "aron", "ieron", "arán", "erán", "irán", "ado", "ido",
    "ando", "iendo", "ar", "er", "ir", "as", "abas", "adas", "idas",
    "aras", "ieras", "ías", "arías", "erías", "irías", "es", "ases",
    "ieses", "abais", "ierais", "íais", "aríais", "eríais", "iríais",
    "aseis", "ieseis", "asteis", "isteis", "áis", "éis", "aréis",
    "eréis", "iréis", "ados", "idos", "amos", "ábamos", "áramos",
    "iéramos", "íamos", "aríamos", "eríamos", "iríamos", "emos",
    "aremos", "eremos", "iremos", "ásemos", "iésemos", "imos", "arás",
    "erás", "irás", "ís", "ará", "erá", "irá", "aré", "eré", "iré", "ió")

  /** Snowball Spanish (the SnowballAnalyzer("Spanish") program). */
  def spanishStem(word: String): String = {
    var w = word
    val rv = romanceRV(w, esVowel)
    val r1 = standardR(w, 0, esVowel)
    val r2 = standardR(w, r1, esVowel)

    // step 0: attached pronoun after a gerund/infinitive ending in RV;
    // accented endings also lose the accent
    locate(w, EsPronouns).foreach { p =>
      val pre = w.substring(0, w.length - p.length)
      locate(pre, EsGerInf) match {
        case Some(s) if pre.length - s.length >= rv =>
          s match {
            case "iéndo" => w = pre.dropRight(5) + "iendo"
            case "ándo" => w = pre.dropRight(4) + "ando"
            case "ár" => w = pre.dropRight(2) + "ar"
            case "ér" => w = pre.dropRight(2) + "er"
            case "ír" => w = pre.dropRight(2) + "ir"
            case "yendo" =>
              if (pre.length - 5 >= 1 && pre.charAt(pre.length - 6) == 'u') w = pre
            case _ => w = pre // ando iendo ar er ir
          }
        case _ => ()
      }
    }

    def fits(sufLen: Int, region: Int): Boolean = w.length - sufLen >= region

    // step 1: standard suffixes — SUCCEEDS only if the matched suffix also
    // passes its region test (otherwise steps 2a/2b run on the intact word)
    val step1Done: Boolean = locate(w, EsStdAll) match {
      case Some(s) if EsStd1(s) && fits(s.length, r2) =>
        w = w.dropRight(s.length); true
      case Some(s) if EsStd2(s) && fits(s.length, r2) =>
        w = w.dropRight(s.length)
        if (w.endsWith("ic") && fits(2, r2)) w = w.dropRight(2)
        true
      case Some(s @ ("logía" | "logías")) if fits(s.length, r2) =>
        w = w.dropRight(s.length) + "log"; true
      case Some(s @ ("ución" | "uciones")) if fits(s.length, r2) =>
        w = w.dropRight(s.length) + "u"; true
      case Some(s @ ("encia" | "encias")) if fits(s.length, r2) =>
        w = w.dropRight(s.length) + "ente"; true
      case Some("amente") if fits(6, r1) =>
        w = w.dropRight(6)
        locate(w, Seq("ic", "ad", "os", "iv")) match {
          case Some(p) if fits(p.length, r2) =>
            val wasIv = p == "iv"
            w = w.dropRight(p.length)
            if (wasIv && w.endsWith("at") && fits(2, r2)) w = w.dropRight(2)
          case _ => ()
        }
        true
      case Some("mente") if fits(5, r2) =>
        w = w.dropRight(5)
        locate(w, Seq("able", "ible")) match {
          case Some(p) if fits(p.length, r2) => w = w.dropRight(p.length)
          case _ => ()
        }
        true
      case Some(s @ ("idad" | "idades")) if fits(s.length, r2) =>
        w = w.dropRight(s.length)
        locate(w, Seq("abil", "ic", "iv")) match {
          case Some(p) if fits(p.length, r2) => w = w.dropRight(p.length)
          case _ => ()
        }
        true
      case Some(s @ ("iva" | "ivas" | "ivo" | "ivos")) if fits(s.length, r2) =>
        w = w.dropRight(s.length)
        if (w.endsWith("at") && fits(2, r2)) w = w.dropRight(2)
        true
      case _ => false
    }

    // step 2a (only when step 1 did nothing): y-verb suffixes wholly in RV,
    // preceded by u (the u may lie before RV)
    var step2aDone = false
    if (!step1Done) {
      locateWithin(w, EsYVerb, rv) match {
        case Some(s) if w.length - s.length >= 1 &&
            w.charAt(w.length - s.length - 1) == 'u' =>
          w = w.dropRight(s.length); step2aDone = true
        case _ => ()
      }
    }

    // step 2b (only when 2a did nothing either): verb suffixes wholly in RV
    if (!step1Done && !step2aDone) {
      locateWithin(w, EsVerb, rv).foreach { s =>
        val start = w.length - s.length
        if (EsVerbEn(s) && start >= 2 && w.charAt(start - 1) == 'u' &&
            w.charAt(start - 2) == 'g')
          w = w.substring(0, start - 1) // gu + suffix: the u goes too
        else w = w.substring(0, start)
      }
    }

    // step 3: residual
    locate(w, Seq("os", "a", "o", "á", "í", "ó", "e", "é")) match {
      case Some(s @ ("os" | "a" | "o" | "á" | "í" | "ó")) if fits(s.length, rv) =>
        w = w.dropRight(s.length)
      case Some(s @ ("e" | "é")) if fits(s.length, rv) =>
        w = w.dropRight(s.length)
        if (w.endsWith("gu") && fits(1, rv)) w = w.dropRight(1)
      case _ => ()
    }

    // postlude: remove acute accents
    w.map {
      case 'á' => 'a'; case 'é' => 'e'; case 'í' => 'i'
      case 'ó' => 'o'; case 'ú' => 'u'; case c => c
    }
  }

  // ------------------------------------------------------------- Italian
  // ItalianStemmer.cs: prelude folds acute accents to grave, protects qu
  // as qU and marks intervocalic u/i as U/I; attached pronoun; standard OR
  // verb suffixes; vowel suffix; postlude unmarks U/I.

  @inline private def itVowel(c: Char): Boolean =
    "aeiouàèìòù".indexOf(c) >= 0

  private val ItPronouns = Seq(
    "gliela", "gliele", "glieli", "glielo", "gliene", "cela", "cele",
    "celi", "celo", "cene", "mela", "mele", "meli", "melo", "mene",
    "sene", "tela", "tele", "teli", "telo", "tene", "vela", "vele",
    "veli", "velo", "vene", "gli", "la", "le", "ne", "ci", "li", "mi",
    "si", "ti", "vi", "lo")
  private val ItStd1 = Set(
    "ica", "iche", "ici", "ico", "ichi", "osa", "ose", "osi", "oso",
    "ista", "iste", "isti", "istà", "istè", "istì", "ismi", "ismo",
    "anza", "anze", "ice", "atrice", "atrici", "abile", "abili",
    "ibile", "ibili", "mente")
  private val ItStd2 = Set("azione", "azioni", "atore", "atori")
  private val ItStdAll: Seq[String] = (ItStd1 ++ ItStd2 ++ Set(
    "logia", "logie", "usione", "usioni", "uzione", "uzioni",
    "enza", "enze", "amento", "amenti", "imento", "imenti",
    "amente", "ità", "iva", "ive", "ivi", "ivo")).toSeq
  private val ItVerb: Seq[String] = Seq(
    "isca", "enda", "ata", "ita", "uta", "ava", "eva", "iva", "erebbe",
    "irebbe", "isce", "ende", "are", "ere", "ire", "asse", "ate",
    "avate", "evate", "ivate", "ete", "erete", "irete", "ite",
    "ereste", "ireste", "ute", "erai", "irai", "isci", "endi", "erei",
    "irei", "assi", "ati", "iti", "eresti", "iresti", "uti", "avi",
    "evi", "ivi", "isco", "ando", "endo", "Yamo", "iamo", "avamo",
    "evamo", "ivamo", "eremo", "iremo", "assimo", "ammo", "eremmo",
    "iremmo", "immo", "ano", "iscano", "avano", "evano", "ivano",
    "eranno", "iranno", "ono", "iscono", "arono", "erono", "irono",
    "erebbero", "irebbero", "assero", "essero", "issero", "ato", "ito",
    "uto", "avo", "evo", "ivo", "ar", "ir", "erà", "irà", "erò", "irò")

  /** Snowball Italian (the SnowballAnalyzer("Italian") program). */
  def italianStem(word: String): String = {
    var w = word
    // prelude pass 1: acute -> grave, qu -> qU
    val sb = new StringBuilder
    var i = 0
    while (i < w.length) {
      w.charAt(i) match {
        case 'á' => sb.append('à'); i += 1
        case 'é' => sb.append('è'); i += 1
        case 'í' => sb.append('ì'); i += 1
        case 'ó' => sb.append('ò'); i += 1
        case 'ú' => sb.append('ù'); i += 1
        case 'q' if i + 1 < w.length && w.charAt(i + 1) == 'u' =>
          sb.append("qU"); i += 2
        case c => sb.append(c); i += 1
      }
    }
    w = sb.toString
    // prelude pass 2: intervocalic u/i -> U/I
    if (w.length >= 3) {
      val sb2 = new StringBuilder(w)
      var j = 1
      while (j < sb2.length - 1) {
        val c = sb2.charAt(j)
        if ((c == 'u' || c == 'i') && itVowel(sb2.charAt(j - 1)) && itVowel(sb2.charAt(j + 1)))
          sb2.setCharAt(j, if (c == 'u') 'U' else 'I')
        j += 1
      }
      w = sb2.toString
    }

    val rv = romanceRV(w, itVowel)
    val r1 = standardR(w, 0, itVowel)
    val r2 = standardR(w, r1, itVowel)
    def fits(sufLen: Int, region: Int): Boolean = w.length - sufLen >= region

    // attached pronoun: pronoun preceded by ando/endo (delete) or
    // ar/er/ir (pronoun becomes e), the participle/infinitive in RV
    locate(w, ItPronouns).foreach { p =>
      val pre = w.substring(0, w.length - p.length)
      locate(pre, Seq("ando", "endo", "ar", "er", "ir")) match {
        case Some(s) if pre.length - s.length >= rv =>
          if (s == "ando" || s == "endo") w = pre else w = pre + "e"
        case _ => ()
      }
    }

    // step 1: standard suffixes (succeeds only with its region test)
    val step1Done: Boolean = locate(w, ItStdAll) match {
      case Some(s) if ItStd1(s) && fits(s.length, r2) =>
        w = w.dropRight(s.length); true
      case Some(s) if ItStd2(s) && fits(s.length, r2) =>
        w = w.dropRight(s.length)
        if (w.endsWith("ic") && fits(2, r2)) w = w.dropRight(2)
        true
      case Some(s @ ("logia" | "logie")) if fits(s.length, r2) =>
        w = w.dropRight(s.length) + "log"; true
      case Some(s @ ("usione" | "usioni" | "uzione" | "uzioni")) if fits(s.length, r2) =>
        w = w.dropRight(s.length) + "u"; true
      case Some(s @ ("enza" | "enze")) if fits(s.length, r2) =>
        w = w.dropRight(s.length) + "ente"; true
      case Some(s @ ("amento" | "amenti" | "imento" | "imenti")) if fits(s.length, rv) =>
        w = w.dropRight(s.length); true
      case Some("amente") if fits(6, r1) =>
        w = w.dropRight(6)
        locate(w, Seq("ic", "abil", "os", "iv")) match {
          case Some(p) if fits(p.length, r2) =>
            val wasIv = p == "iv"
            w = w.dropRight(p.length)
            if (wasIv && w.endsWith("at") && fits(2, r2)) w = w.dropRight(2)
          case _ => ()
        }
        true
      case Some("ità") if fits(3, r2) =>
        w = w.dropRight(3)
        locate(w, Seq("ic", "abil", "iv")) match {
          case Some(p) if fits(p.length, r2) => w = w.dropRight(p.length)
          case _ => ()
        }
        true
      case Some(s @ ("iva" | "ive" | "ivi" | "ivo")) if fits(s.length, r2) =>
        w = w.dropRight(s.length)
        if (w.endsWith("at") && fits(2, r2)) {
          w = w.dropRight(2)
          if (w.endsWith("ic") && fits(2, r2)) w = w.dropRight(2)
        }
        true
      case _ => false
    }

    // step 2 (only when step 1 did nothing): verb suffixes wholly in RV
    if (!step1Done)
      locateWithin(w, ItVerb, rv).foreach(s => w = w.dropRight(s.length))

    // step 3: final vowel (a/e/i/o and graves) in RV, then a trailing i in
    // RV; then a final h after c/g in RV
    if (w.nonEmpty && "aeioàèìò".indexOf(w.last) >= 0 && fits(1, rv)) {
      w = w.dropRight(1)
      if (w.nonEmpty && w.last == 'i' && fits(1, rv)) w = w.dropRight(1)
    }
    if (w.length >= 2 && w.last == 'h' &&
        (w.charAt(w.length - 2) == 'c' || w.charAt(w.length - 2) == 'g') &&
        fits(1, rv))
      w = w.dropRight(1)

    // postlude: unmark I/U
    w.map { case 'I' => 'i'; case 'U' => 'u'; case c => c }
  }

  // ---------------------------------------------------------- Portuguese
  // PortugueseStemmer.cs: prelude marks nasal tildes (ã -> a~, õ -> o~) so
  // '~' reads as a consonant; standard OR verb suffixes (a trailing i after
  // c in RV drops when either fired); residual vowel; residual form
  // (final e/é/ê with gu/ci absorption, ç -> c); postlude restores tildes.

  @inline private def ptVowel(c: Char): Boolean =
    "aeiouáâéêíóôú".indexOf(c) >= 0

  private val PtStd1 = Set(
    "ica", "icas", "ico", "icos", "ância", "adora", "adoras", "ador",
    "adores", "osa", "osas", "oso", "osos", "ista", "istas", "eza",
    "ezas", "ismo", "ismos", "ante", "antes", "amento", "amentos",
    "imento", "imentos", "ável", "ível", "aça~o", "aço~es")
  private val PtStdAll: Seq[String] = (PtStd1 ++ Set(
    "logía", "logías", "ución", "uciones", "ência", "ências",
    "amente", "mente", "idade", "idades", "iva", "ivas", "ivo", "ivos",
    "ira", "iras")).toSeq
  private val PtVerb: Seq[String] = Seq(
    "ada", "ida", "ia", "aria", "eria", "iria", "ara", "era", "ira",
    "ava", "asse", "esse", "isse", "aste", "este", "iste", "ei", "arei",
    "erei", "irei", "am", "iam", "ariam", "eriam", "iriam", "aram",
    "eram", "iram", "avam", "em", "arem", "erem", "irem", "assem",
    "essem", "issem", "ado", "ido", "ando", "endo", "indo", "ara~o",
    "era~o", "ira~o", "ar", "er", "ir", "as", "adas", "idas", "ias",
    "arias", "erias", "irias", "aras", "eras", "iras", "avas", "es",
    "ardes", "erdes", "irdes", "ares", "eres", "ires", "asses",
    "esses", "isses", "astes", "estes", "istes", "is", "ais", "eis",
    "areis", "ereis", "ireis", "áreis", "éreis", "íreis", "ásseis",
    "ésseis", "ísseis", "áveis", "íeis", "aríeis", "eríeis", "iríeis",
    "ados", "idos", "amos", "áramos", "éramos", "íramos", "ávamos",
    "íamos", "aríamos", "eríamos", "iríamos", "emos", "aremos",
    "eremos", "iremos", "ássemos", "êssemos", "íssemos", "imos",
    "armos", "ermos", "irmos", "ámos", "arás", "erás", "irás", "eu",
    "iu", "ou", "ará", "erá", "irá")

  /** Snowball Portuguese (the SnowballAnalyzer("Portuguese") program). */
  def portugueseStem(word: String): String = {
    // prelude: nasal tilde marking
    var w = word.replace("ã", "a~").replace("õ", "o~")

    val rv = romanceRV(w, ptVowel)
    val r1 = standardR(w, 0, ptVowel)
    val r2 = standardR(w, r1, ptVowel)
    def fits(sufLen: Int, region: Int): Boolean = w.length - sufLen >= region

    // step 1: standard suffixes (succeeds only with its region test;
    // a longest match failing its condition means NO retry with shorter)
    val step1Done: Boolean = locate(w, PtStdAll) match {
      case Some(s) if PtStd1(s) && fits(s.length, r2) =>
        w = w.dropRight(s.length); true
      case Some(s @ ("logía" | "logías")) if fits(s.length, r2) =>
        w = w.dropRight(s.length) + "log"; true
      case Some(s @ ("ución" | "uciones")) if fits(s.length, r2) =>
        w = w.dropRight(s.length) + "u"; true
      case Some(s @ ("ência" | "ências")) if fits(s.length, r2) =>
        w = w.dropRight(s.length) + "ente"; true
      case Some("amente") if fits(6, r1) =>
        w = w.dropRight(6)
        locate(w, Seq("ic", "ad", "os", "iv")) match {
          case Some(p) if fits(p.length, r2) =>
            val wasIv = p == "iv"
            w = w.dropRight(p.length)
            if (wasIv && w.endsWith("at") && fits(2, r2)) w = w.dropRight(2)
          case _ => ()
        }
        true
      case Some("mente") if fits(5, r2) =>
        w = w.dropRight(5)
        locate(w, Seq("ante", "avel", "ível")) match {
          case Some(p) if fits(p.length, r2) => w = w.dropRight(p.length)
          case _ => ()
        }
        true
      case Some(s @ ("idade" | "idades")) if fits(s.length, r2) =>
        w = w.dropRight(s.length)
        locate(w, Seq("ic", "abil", "iv")) match {
          case Some(p) if fits(p.length, r2) => w = w.dropRight(p.length)
          case _ => ()
        }
        true
      case Some(s @ ("iva" | "ivas" | "ivo" | "ivos")) if fits(s.length, r2) =>
        w = w.dropRight(s.length)
        if (w.endsWith("at") && fits(2, r2)) w = w.dropRight(2)
        true
      case Some(s @ ("ira" | "iras")) if fits(s.length, rv) &&
          w.length - s.length >= 1 && w.charAt(w.length - s.length - 1) == 'e' =>
        w = w.dropRight(s.length) + "ir"; true
      case _ => false
    }

    // step 2 (only when step 1 did nothing): verb suffixes wholly in RV
    var step2Done = false
    if (!step1Done) {
      locateWithin(w, PtVerb, rv).foreach { s =>
        w = w.dropRight(s.length); step2Done = true
      }
    }

    // when either fired: a trailing i after c, the i in RV, drops
    if ((step1Done || step2Done) && w.endsWith("ci") && fits(1, rv))
      w = w.dropRight(1)

    // residual vowel (only when neither standard nor verb fired)
    if (!step1Done && !step2Done) {
      locate(w, Seq("os", "a", "i", "o", "á", "í", "ó")) match {
        case Some(s) if fits(s.length, rv) => w = w.dropRight(s.length)
        case _ => ()
      }
    }

    // residual form: final e/é/ê in RV, then gu/ci absorb u/i in RV; ç -> c
    if (w.nonEmpty && "eéê".indexOf(w.last) >= 0 && fits(1, rv)) {
      w = w.dropRight(1)
      if (w.endsWith("gu") && fits(1, rv)) w = w.dropRight(1)
      else if (w.endsWith("ci") && fits(1, rv)) w = w.dropRight(1)
    } else if (w.nonEmpty && w.last == 'ç') {
      w = w.dropRight(1) + "c"
    }

    // postlude: restore nasal tildes
    w.replace("a~", "ã").replace("o~", "õ")
  }

  // -------------------------------------------------------------- French
  // FrenchStemmer.cs: prelude marks intervocalic u/i, y beside a vowel and
  // u-after-q as U/I/Y consonants; RV = after char 3 when the word opens
  // with two vowels, else after the first vowel past position 0; standard
  // OR i-verb OR verb suffixes (then a final Y -> i / ç -> c); residual;
  // un_double; un_accent; postlude unmarks.

  @inline private def frVowel(c: Char): Boolean =
    "aeiouyàâèéêëîïôùû".indexOf(c) >= 0
  // g_keep_with_s (chars that protect a final s)
  @inline private def frKeepS(c: Char): Boolean = "aiouès".indexOf(c) >= 0

  private def frRV(w: String): Int = {
    if (w.length >= 3 && frVowel(w.charAt(0)) && frVowel(w.charAt(1))) return 3
    var i = 1
    while (i < w.length && !frVowel(w.charAt(i))) i += 1
    if (i < w.length) i + 1 else w.length
  }

  private val FrStd1 = Set(
    "iqUe", "iqUes", "ance", "ances", "able", "ables", "isme", "ismes",
    "iste", "istes", "eux")
  private val FrStd2 = Set(
    "atrice", "atrices", "ation", "ations", "ateur", "ateurs")
  private val FrStdAll: Seq[String] = (FrStd1 ++ FrStd2 ++ Set(
    "logie", "logies", "usion", "usions", "ution", "utions", "ence",
    "ences", "ement", "ements", "ité", "ités", "if", "ifs", "ive",
    "ives", "eaux", "aux", "euse", "euses", "issement", "issements",
    "amment", "emment", "ment", "ments")).toSeq
  private val FrIVerb = Seq(
    "îmes", "ît", "îtes", "i", "ie", "ies", "ir", "ira", "irai",
    "iraIent", "irais", "irait", "iras", "irent", "irez", "iriez",
    "irions", "irons", "iront", "is", "issaIent", "issais", "issait",
    "issant", "issante", "issantes", "issants", "isse", "issent",
    "isses", "issez", "issiez", "issions", "issons", "it")
  private val FrVerb2 = Set(
    "era", "ée", "erai", "er", "eras", "ées", "erais", "erions",
    "erons", "és", "erait", "eraIent", "èrent", "eront", "ez", "iez",
    "eriez", "erez", "é")
  private val FrVerb3 = Set(
    "a", "asse", "ante", "ai", "as", "âmes", "asses", "antes", "âtes",
    "ais", "assions", "ants", "ait", "ant", "aIent", "assent", "ât",
    "assiez")
  private val FrVerbAll: Seq[String] = (FrVerb2 ++ FrVerb3 + "ions").toSeq

  /** Snowball French (the SnowballAnalyzer("French") program). */
  def frenchStem(word: String): String = {
    // prelude: at a vowel, mark a following intervocalic u/i or a
    // following y; a y itself before a vowel; u after q
    val sb = new StringBuilder(word)
    var i = 0
    while (i < sb.length) {
      val c = sb.charAt(i)
      if (frVowel(c) && i + 1 < sb.length) {
        val n1 = sb.charAt(i + 1)
        if ((n1 == 'u' || n1 == 'i') && i + 2 < sb.length && frVowel(sb.charAt(i + 2)))
          sb.setCharAt(i + 1, if (n1 == 'u') 'U' else 'I')
        else if (n1 == 'y') sb.setCharAt(i + 1, 'Y')
        else if (c == 'y') sb.setCharAt(i, 'Y')
      } else if (c == 'q' && i + 1 < sb.length && sb.charAt(i + 1) == 'u')
        sb.setCharAt(i + 1, 'U')
      i += 1
    }
    var w = sb.toString

    val rv = frRV(w)
    val r1 = standardR(w, 0, frVowel)
    val r2 = standardR(w, r1, frVowel)
    def fits(sufLen: Int, region: Int): Boolean = w.length - sufLen >= region

    // step 1: standard suffixes (longest match; a failing condition means
    // the whole routine fails — no shorter retry)
    val step1Done: Boolean = locate(w, FrStdAll) match {
      case Some(s) if FrStd1(s) && fits(s.length, r2) =>
        w = w.dropRight(s.length); true
      case Some(s) if FrStd2(s) && fits(s.length, r2) =>
        w = w.dropRight(s.length)
        if (w.endsWith("ic")) {
          if (fits(2, r2)) w = w.dropRight(2) else w = w.dropRight(2) + "iqU"
        }
        true
      case Some(s @ ("logie" | "logies")) if fits(s.length, r2) =>
        w = w.dropRight(s.length) + "log"; true
      case Some(s @ ("usion" | "usions" | "ution" | "utions")) if fits(s.length, r2) =>
        w = w.dropRight(s.length) + "u"; true
      case Some(s @ ("ence" | "ences")) if fits(s.length, r2) =>
        w = w.dropRight(s.length) + "ent"; true
      case Some(s @ ("ement" | "ements")) if fits(s.length, rv) =>
        w = w.dropRight(s.length)
        locate(w, Seq("iqU", "abl", "Ièr", "ièr", "eus", "iv")) match {
          case Some("iv") if fits(2, r2) =>
            w = w.dropRight(2)
            if (w.endsWith("at") && fits(2, r2)) w = w.dropRight(2)
          case Some("eus") =>
            if (fits(3, r2)) w = w.dropRight(3)
            else if (fits(3, r1)) w = w.dropRight(3) + "eux"
          case Some(p @ ("iqU" | "abl")) if fits(p.length, r2) =>
            w = w.dropRight(p.length)
          case Some(p @ ("Ièr" | "ièr")) if fits(p.length, rv) =>
            w = w.dropRight(p.length) + "i"
          case _ => ()
        }
        true
      case Some(s @ ("ité" | "ités")) if fits(s.length, r2) =>
        w = w.dropRight(s.length)
        locate(w, Seq("ic", "abil", "iv")) match {
          case Some("abil") =>
            if (fits(4, r2)) w = w.dropRight(4) else w = w.dropRight(4) + "abl"
          case Some("ic") =>
            if (fits(2, r2)) w = w.dropRight(2) else w = w.dropRight(2) + "iqU"
          case Some("iv") if fits(2, r2) => w = w.dropRight(2)
          case _ => ()
        }
        true
      case Some(s @ ("if" | "ifs" | "ive" | "ives")) if fits(s.length, r2) =>
        w = w.dropRight(s.length)
        if (w.endsWith("at") && fits(2, r2)) {
          w = w.dropRight(2)
          if (w.endsWith("ic")) {
            if (fits(2, r2)) w = w.dropRight(2) else w = w.dropRight(2) + "iqU"
          }
        }
        true
      case Some("eaux") =>
        w = w.dropRight(4) + "eau"; true
      case Some("aux") if fits(3, r1) =>
        w = w.dropRight(3) + "al"; true
      case Some(s @ ("euse" | "euses")) if fits(s.length, r2) || fits(s.length, r1) =>
        if (fits(s.length, r2)) w = w.dropRight(s.length)
        else w = w.dropRight(s.length) + "eux"
        true
      case Some(s @ ("issement" | "issements")) if fits(s.length, r1) &&
          w.length - s.length >= 1 && !frVowel(w.charAt(w.length - s.length - 1)) =>
        w = w.dropRight(s.length); true
      // the ment family edits then FAILS the routine (`fail` in the
      // program), so the verb steps still run on the shortened word
      case Some("amment") if fits(6, rv) =>
        w = w.dropRight(6) + "ant"; false
      case Some("emment") if fits(6, rv) =>
        w = w.dropRight(6) + "ent"; false
      case Some(s @ ("ment" | "ments")) if w.length - s.length >= rv + 1 &&
          frVowel(w.charAt(w.length - s.length - 1)) =>
        w = w.dropRight(s.length); false
      case _ => false
    }

    // step 2a (only when step 1 failed): i-verb suffix wholly in RV,
    // preceded by a non-vowel also in RV
    var step2aDone = false
    if (!step1Done) {
      locateWithin(w, FrIVerb, rv) match {
        case Some(s) if w.length - s.length >= rv + 1 &&
            !frVowel(w.charAt(w.length - s.length - 1)) =>
          w = w.dropRight(s.length); step2aDone = true
        case _ => ()
      }
    }

    // step 2b (when 2a failed too): verb suffixes wholly in RV
    var step2bDone = false
    if (!step1Done && !step2aDone) {
      locateWithin(w, FrVerbAll, rv) match {
        case Some("ions") if fits(4, r2) =>
          w = w.dropRight(4); step2bDone = true
        case Some(s) if FrVerb2(s) =>
          w = w.dropRight(s.length); step2bDone = true
        case Some(s) if FrVerb3(s) =>
          w = w.dropRight(s.length)
          if (w.nonEmpty && w.last == 'e' && fits(1, rv)) w = w.dropRight(1)
          step2bDone = true
        case _ => ()
      }
    }

    if (step1Done || step2aDone || step2bDone) {
      // step 3: a final marked Y -> i, a final ç -> c
      if (w.nonEmpty && w.last == 'Y') w = w.dropRight(1) + "i"
      else if (w.nonEmpty && w.last == 'ç') w = w.dropRight(1) + "c"
    } else {
      // step 4 residual: final s drops unless kept by a/i/o/u/è/s; then
      // ion (R2, after s/t), ier-family -> i, e, guë — all inside RV
      if (w.length >= 2 && w.last == 's' && !frKeepS(w.charAt(w.length - 2)))
        w = w.dropRight(1)
      locateWithin(w, Seq("e", "Ière", "ière", "ion", "Ier", "ier", "ë"), rv) match {
        case Some("ion") if fits(3, r2) && w.length - 3 >= rv + 1 &&
            (w.charAt(w.length - 4) == 's' || w.charAt(w.length - 4) == 't') =>
          w = w.dropRight(3)
        case Some(s @ ("Ière" | "ière" | "Ier" | "ier")) =>
          w = w.dropRight(s.length) + "i"
        case Some("e") => w = w.dropRight(1)
        case Some("ë") if w.length - 1 >= rv + 2 && w.endsWith("guë") =>
          w = w.dropRight(1)
        case _ => ()
      }
    }

    // step 5 un_double: enn/onn/ett/ell/eill lose the last letter
    if (Seq("enn", "onn", "ett", "ell", "eill").exists(w.endsWith(_)))
      w = w.dropRight(1)

    // step 6 un_accent: é/è before a final run of one-plus non-vowels -> e
    var j = w.length - 1
    while (j >= 0 && !frVowel(w.charAt(j))) j -= 1
    if (j >= 0 && j < w.length - 1 && (w.charAt(j) == 'é' || w.charAt(j) == 'è'))
      w = w.substring(0, j) + "e" + w.substring(j + 1)

    // postlude: unmark I/U/Y
    w.map { case 'I' => 'i'; case 'U' => 'u'; case 'Y' => 'y'; case c => c }
  }

  // ------------------------------------------------------ Porter (1980)
  // PorterStemmer.cs — the generated Snowball rendering of the classic
  // 1980 algorithm (distinct from Porter2/"English" in
  // SnowballStemmers.porter2): y counts as a vowel unless marked Y by the
  // prelude (word-initial y, or y right after a vowel); m-counts become
  // R1/R2 positions; `atmark p1` + shortv reproduces the (m=1 and *o)
  // rule.

  @inline private def enVowel(c: Char): Boolean = "aeiouy".indexOf(c) >= 0

  /** The *o shape on the tail of `s`: non-vowel (nor w/x/Y) after vowel
    * after non-vowel. */
  private def enShortV(s: String): Boolean = {
    val n = s.length
    n >= 3 && "aeiouywxY".indexOf(s.charAt(n - 1)) < 0 &&
      enVowel(s.charAt(n - 2)) && !enVowel(s.charAt(n - 3))
  }

  private val PorterStep2: Seq[(String, String)] = Seq(
    "ational" -> "ate", "tional" -> "tion", "enci" -> "ence",
    "anci" -> "ance", "abli" -> "able", "entli" -> "ent", "eli" -> "e",
    "ization" -> "ize", "izer" -> "ize", "ation" -> "ate",
    "ator" -> "ate", "alli" -> "al", "alism" -> "al", "aliti" -> "al",
    "fulness" -> "ful", "ousli" -> "ous", "ousness" -> "ous",
    "iveness" -> "ive", "iviti" -> "ive", "biliti" -> "ble")
  private val PorterStep3: Seq[(String, String)] = Seq(
    "icate" -> "ic", "ative" -> "", "alize" -> "al", "iciti" -> "ic",
    "ical" -> "ic", "ful" -> "", "ness" -> "")
  private val PorterStep4 = Seq(
    "ement", "ance", "ence", "able", "ible", "ment", "ant", "ent",
    "ion", "ism", "ate", "iti", "ous", "ive", "ize", "al", "er", "ic",
    "ou")

  /** Snowball Porter (the SnowballAnalyzer("Porter") program). */
  def snowballPorter(word: String): String = {
    // prelude: word-initial y and y-after-vowel become consonant Y
    var yFound = false
    val sb = new StringBuilder(word)
    if (sb.nonEmpty && sb.charAt(0) == 'y') { sb.setCharAt(0, 'Y'); yFound = true }
    var i = 1
    while (i < sb.length) {
      if (sb.charAt(i) == 'y' && enVowel(sb.charAt(i - 1))) {
        sb.setCharAt(i, 'Y'); yFound = true
      }
      i += 1
    }
    var w = sb.toString
    val r1 = standardR(w, 0, enVowel)
    val r2 = standardR(w, r1, enVowel)
    def fits(sufLen: Int, region: Int): Boolean = w.length - sufLen >= region

    // step 1a: plural s
    locate(w, Seq("sses", "ies", "ss", "s")).foreach {
      case "sses" => w = w.dropRight(4) + "ss"
      case "ies" => w = w.dropRight(3) + "i"
      case "ss" => ()
      case _ => w = w.dropRight(1) // s
    }

    // step 1b: eed (R1) -> ee; ed/ing after a vowel -> delete, then mend
    locate(w, Seq("eed", "ed", "ing")) match {
      case Some("eed") =>
        if (fits(3, r1)) w = w.dropRight(3) + "ee"
      case Some(s @ ("ed" | "ing")) if w.substring(0, w.length - s.length).exists(enVowel) =>
        w = w.dropRight(s.length)
        locate(w, Seq("at", "bl", "iz", "bb", "dd", "ff", "gg", "mm",
          "nn", "pp", "rr", "tt")) match {
          case Some("at" | "bl" | "iz") => w = w + "e"
          case Some(_) => w = w.dropRight(1) // undouble
          case None => if (w.length == r1 && enShortV(w)) w = w + "e"
        }
      case _ => ()
    }

    // step 1c: final y/Y with a vowel somewhere before -> i
    if (w.nonEmpty && (w.last == 'y' || w.last == 'Y') &&
        w.substring(0, w.length - 1).exists(enVowel))
      w = w.dropRight(1) + "i"

    // step 2 (R1): -ance/-ence/-ize/... respellings
    locate(w, PorterStep2.map(_._1)).foreach { s =>
      if (fits(s.length, r1))
        w = w.dropRight(s.length) + PorterStep2.find(_._1 == s).get._2
    }

    // step 3 (R1)
    locate(w, PorterStep3.map(_._1)).foreach { s =>
      if (fits(s.length, r1))
        w = w.dropRight(s.length) + PorterStep3.find(_._1 == s).get._2
    }

    // step 4 (R2): bare suffix removal; ion only after s/t
    locate(w, PorterStep4).foreach { s =>
      if (fits(s.length, r2)) {
        if (s != "ion") w = w.dropRight(s.length)
        else if (w.length - 3 >= 1 &&
            (w.charAt(w.length - 4) == 's' || w.charAt(w.length - 4) == 't'))
          w = w.dropRight(3)
      }
    }

    // step 5a: final e in R2, or in R1 when the stem is not *o-shaped
    if (w.nonEmpty && w.last == 'e' &&
        (fits(1, r2) || (fits(1, r1) && !enShortV(w.dropRight(1)))))
      w = w.dropRight(1)

    // step 5b: ll in R2 -> l
    if (w.endsWith("ll") && fits(1, r2)) w = w.dropRight(1)

    // postlude
    if (yFound) w.map(c => if (c == 'Y') 'y' else c) else w
  }

  // -------------------------------------------------------------- Lovins
  // LovinsStemmer.cs — the generated Snowball rendering of Lovins (1968):
  // one pass removing the longest of 293 endings whose letter condition
  // holds on the remaining stem (a failing condition RETRIES shorter
  // endings, unlike the romance programs — among-with-routine semantics),
  // then an undouble pass and the 34 recode rules.

  /** (ending, condition) table, length-descending (a_1 in the program). */
  private val LovinsEndings: Seq[(String, String)] = Seq(
    ("alistically", "B"), ("arizability", "A"), ("izationally", "B"), ("antialness", "A"),
    ("arisations", "A"), ("arizations", "A"), ("entialness", "A"), ("allically", "C"),
    ("antaneous", "A"), ("antiality", "A"), ("arisation", "A"), ("arization", "A"),
    ("ationally", "B"), ("ativeness", "A"), ("eableness", "E"), ("entations", "A"),
    ("entiality", "A"), ("entialize", "A"), ("entiation", "A"), ("ionalness", "A"),
    ("istically", "A"), ("itousness", "A"), ("izability", "A"), ("izational", "A"),
    ("ableness", "A"), ("arizable", "A"), ("entation", "A"), ("entially", "A"),
    ("eousness", "A"), ("ibleness", "A"), ("icalness", "A"), ("ionalism", "A"),
    ("ionality", "A"), ("ionalize", "A"), ("iousness", "A"), ("izations", "A"),
    ("lessness", "A"), ("ability", "A"), ("aically", "A"), ("alistic", "B"),
    ("alities", "A"), ("ariness", "E"), ("aristic", "A"), ("arizing", "A"),
    ("ateness", "A"), ("atingly", "A"), ("ational", "B"), ("atively", "A"),
    ("ativism", "A"), ("elihood", "E"), ("encible", "A"), ("entally", "A"),
    ("entials", "A"), ("entiate", "A"), ("entness", "A"), ("fulness", "A"),
    ("ibility", "A"), ("icalism", "A"), ("icalist", "A"), ("icality", "A"),
    ("icalize", "A"), ("ication", "G"), ("icianry", "A"), ("ination", "A"),
    ("ingness", "A"), ("ionally", "A"), ("isation", "A"), ("ishness", "A"),
    ("istical", "A"), ("iteness", "A"), ("iveness", "A"), ("ivistic", "A"),
    ("ivities", "A"), ("ization", "F"), ("izement", "A"), ("oidally", "A"),
    ("ousness", "A"), ("aceous", "A"), ("acious", "B"), ("action", "G"),
    ("alness", "A"), ("ancial", "A"), ("ancies", "A"), ("ancing", "B"),
    ("ariser", "A"), ("arized", "A"), ("arizer", "A"), ("atable", "A"),
    ("ations", "B"), ("atives", "A"), ("eature", "Z"), ("efully", "A"),
    ("encies", "A"), ("encing", "A"), ("ential", "A"), ("enting", "C"),
    ("entist", "A"), ("eously", "A"), ("ialist", "A"), ("iality", "A"),
    ("ialize", "A"), ("ically", "A"), ("icance", "A"), ("icians", "A"),
    ("icists", "A"), ("ifully", "A"), ("ionals", "A"), ("ionate", "D"),
    ("ioning", "A"), ("ionist", "A"), ("iously", "A"), ("istics", "A"),
    ("izable", "E"), ("lessly", "A"), ("nesses", "A"), ("oidism", "A"),
    ("acies", "A"), ("acity", "A"), ("aging", "B"), ("aical", "A"),
    ("alism", "B"), ("alist", "A"), ("ality", "A"), ("alize", "A"),
    ("allic", "BB"), ("anced", "B"), ("ances", "B"), ("antic", "C"),
    ("arial", "A"), ("aries", "A"), ("arily", "A"), ("arity", "B"),
    ("arize", "A"), ("aroid", "A"), ("ately", "A"), ("ating", "I"),
    ("ation", "B"), ("ative", "A"), ("ators", "A"), ("atory", "A"),
    ("ature", "E"), ("early", "Y"), ("ehood", "A"), ("eless", "A"),
    ("elity", "A"), ("ement", "A"), ("enced", "A"), ("ences", "A"),
    ("eness", "E"), ("ening", "E"), ("ental", "A"), ("ented", "C"),
    ("ently", "A"), ("fully", "A"), ("ially", "A"), ("icant", "A"),
    ("ician", "A"), ("icide", "A"), ("icism", "A"), ("icist", "A"),
    ("icity", "A"), ("idine", "I"), ("iedly", "A"), ("ihood", "A"),
    ("inate", "A"), ("iness", "A"), ("ingly", "B"), ("inism", "J"),
    ("inity", "CC"), ("ional", "A"), ("ioned", "A"), ("ished", "A"),
    ("istic", "A"), ("ities", "A"), ("itous", "A"), ("ively", "A"),
    ("ivity", "A"), ("izers", "F"), ("izing", "F"), ("oidal", "A"),
    ("oides", "A"), ("otide", "A"), ("ously", "A"), ("able", "A"),
    ("ably", "A"), ("ages", "B"), ("ally", "B"), ("ance", "B"),
    ("ancy", "B"), ("ants", "B"), ("aric", "A"), ("arly", "K"),
    ("ated", "I"), ("ates", "A"), ("atic", "B"), ("ator", "A"),
    ("ealy", "Y"), ("edly", "E"), ("eful", "A"), ("eity", "A"),
    ("ence", "A"), ("ency", "A"), ("ened", "E"), ("enly", "E"),
    ("eous", "A"), ("hood", "A"), ("ials", "A"), ("ians", "A"),
    ("ible", "A"), ("ibly", "A"), ("ical", "A"), ("ides", "L"),
    ("iers", "A"), ("iful", "A"), ("ines", "M"), ("ings", "N"),
    ("ions", "B"), ("ious", "A"), ("isms", "B"), ("ists", "A"),
    ("itic", "H"), ("ized", "F"), ("izer", "F"), ("less", "A"),
    ("lily", "A"), ("ness", "A"), ("ogen", "A"), ("ward", "A"),
    ("wise", "A"), ("ying", "B"), ("yish", "A"), ("acy", "A"),
    ("age", "B"), ("aic", "A"), ("als", "BB"), ("ant", "B"),
    ("ars", "O"), ("ary", "F"), ("ata", "A"), ("ate", "A"),
    ("eal", "Y"), ("ear", "Y"), ("ely", "E"), ("ene", "E"),
    ("ent", "C"), ("ery", "E"), ("ese", "A"), ("ful", "A"),
    ("ial", "A"), ("ian", "A"), ("ics", "A"), ("ide", "L"),
    ("ied", "A"), ("ier", "A"), ("ies", "P"), ("ily", "A"),
    ("ine", "M"), ("ing", "N"), ("ion", "Q"), ("ish", "C"),
    ("ism", "B"), ("ist", "A"), ("ite", "AA"), ("ity", "A"),
    ("ium", "A"), ("ive", "A"), ("ize", "F"), ("oid", "A"),
    ("ous", "A"), ("'s", "A"), ("ae", "A"), ("al", "BB"),
    ("ar", "X"), ("as", "B"), ("ed", "E"), ("en", "F"),
    ("es", "E"), ("ia", "A"), ("ic", "A"), ("is", "A"),
    ("ly", "B"), ("on", "S"), ("or", "T"), ("s'", "A"),
    ("um", "U"), ("us", "V"), ("yl", "R"), ("a", "A"),
    ("e", "A"), ("i", "A"), ("o", "A"), ("s", "W"),
    ("y", "B"))

  /** Lovins letter conditions A..Z/AA/BB/CC over the candidate stem. */
  private def lovinsCond(cond: String, s: String): Boolean = {
    val L = s.length
    def last = s.charAt(L - 1)
    def at(k: Int) = s.charAt(L - k) // 1-based from the end
    cond match {
      case "A" => L >= 2
      case "B" => L >= 3
      case "C" => L >= 4
      case "D" => L >= 5
      case "E" => L >= 2 && last != 'e'
      case "F" => L >= 3 && last != 'e'
      case "G" => L >= 3 && last == 'f'
      case "H" => L >= 2 && (last == 't' || s.endsWith("ll"))
      case "I" => L >= 2 && last != 'o' && last != 'e'
      case "J" => L >= 2 && last != 'a' && last != 'e'
      case "K" => L >= 3 && (last == 'l' || last == 'i' || (last == 'e' && at(3) == 'u'))
      case "L" => L >= 2 && last != 'u' && last != 'x' && !(last == 's' && at(2) != 'o')
      case "M" => L >= 2 && last != 'a' && last != 'c' && last != 'e' && last != 'm'
      case "N" => L >= 3 && (at(3) != 's' || L >= 4)
      case "O" => L >= 2 && (last == 'l' || last == 'i')
      case "P" => L >= 2 && last != 'c'
      case "Q" => L >= 3 && last != 'l' && last != 'n'
      case "R" => L >= 2 && (last == 'n' || last == 'r')
      case "S" => L >= 2 && (s.endsWith("dr") || (last == 't' && at(2) != 't'))
      case "T" => L >= 2 && (last == 's' || (last == 't' && at(2) != 'o'))
      case "U" => L >= 2 && "lmnr".indexOf(last) >= 0
      case "V" => L >= 2 && last == 'c'
      case "W" => L >= 2 && last != 's' && last != 'u'
      case "X" => L >= 2 && (last == 'l' || last == 'i' || (L >= 3 && last == 'e' && at(3) == 'u'))
      case "Y" => L >= 2 && s.endsWith("in")
      case "Z" => L >= 2 && last != 'f'
      case "AA" => L >= 2 && (last == 'd' || last == 'f' || s.endsWith("ph") ||
        s.endsWith("th") || last == 'l' || s.endsWith("er") || s.endsWith("or") ||
        s.endsWith("es") || last == 't')
      case "BB" => L >= 3 && !s.endsWith("met") && !s.endsWith("ryst")
      case _ => L >= 2 && last == 'l' // CC
    }
  }

  /** The 34 recode rules (a_3): suffix -> replacement, with an optional
    * test on the char before the suffix (0-char when at the word start —
    * the program's eq_s_b fails there, so each `not` passes). */
  private val LovinsRespell: Seq[(String, String, Char => Boolean)] = {
    val always = (_: Char) => true
    Seq(
      ("istr", "ister", always), ("metr", "meter", always),
      ("erid", "eris", always), ("pand", "pans", always),
      ("umpt", "um", always),
      ("iev", "ief", always), ("uct", "uc", always), ("rpt", "rb", always),
      ("urs", "ur", always), ("olv", "olut", always), ("uad", "uas", always),
      ("vad", "vas", always), ("cid", "cis", always), ("lid", "lis", always),
      ("end", "ens", (p: Char) => p != 's'), ("ond", "ons", always),
      ("lud", "lus", always), ("rud", "rus", always),
      ("her", "hes", (p: Char) => p != 'p' && p != 't'),
      ("mit", "mis", always), ("ent", "ens", (p: Char) => p != 'm'),
      ("ert", "ers", always), ("bex", "bic", always), ("dex", "dic", always),
      ("pex", "pic", always), ("tex", "tic", always), ("lux", "luc", always),
      ("ul", "l", (p: Char) => p != 'a' && p != 'i' && p != 'o'),
      ("et", "es", (p: Char) => p != 'n'), ("yt", "ys", always),
      ("ax", "ac", always), ("ex", "ec", always), ("ix", "ic", always),
      ("yz", "ys", always)
    ).sortBy(-_._1.length)
  }

  /** Snowball Lovins (the SnowballAnalyzer("Lovins") program). */
  def lovinsStem(word: String): String = {
    var w = word

    // endings pass: longest ending whose condition accepts the stem
    val it = LovinsEndings.iterator
    var done = false
    while (it.hasNext && !done) {
      val (e, c) = it.next()
      if (w.endsWith(e) && lovinsCond(c, w.substring(0, w.length - e.length))) {
        w = w.dropRight(e.length); done = true
      }
    }

    // undouble: a final double b/d/g/l/m/n/p/r/s/t loses one letter
    if (w.length >= 2 && w.charAt(w.length - 1) == w.charAt(w.length - 2) &&
        "bdglmnprst".indexOf(w.charAt(w.length - 1)) >= 0)
      w = w.dropRight(1)

    // recode: longest rule suffix; a failing pre-char test recodes nothing
    val rit = LovinsRespell.iterator
    var recoded = false
    while (rit.hasNext && !recoded) {
      val (suf, rep, ok) = rit.next()
      if (w.endsWith(suf)) {
        val start = w.length - suf.length
        val pre = if (start > 0) w.charAt(start - 1) else '\u0000'
        if (ok(pre)) w = w.substring(0, start) + rep
        recoded = true // among committed: no shorter retry either way
      }
    }
    w
  }

  // ------------------------------------------------ Kraaij-Pohlmann (Kp)
  // KpStemmer.cs — the generated Snowball rendering of the Kraaij-Pohlmann
  // Dutch stemmer: y-marking prelude; a measure where "ij" counts as one
  // vowel unit; four suffix steps plus vowel re-lengthening (lop -> loop)
  // and re-attachment (le/ene); ge- prefix and infix removal with
  // re-measuring; final kt/ft/pt and undouble/v->f/z->s normalization.
  // One port quirk kept deliberately: Step_4's or-structure in the
  // generated code runs its big among as a try and then REQUIRES the
  // ig/iger/igst among for the step to count as "stemmed" — we reproduce
  // that, since the in-tree program is the contract.

  @inline private def kpVowel(c: Char): Boolean = "aeiouy".indexOf(c) >= 0

  /** measure: p1/p2 after (C* (ij|v)+ C) once resp. twice; limit when
    * absent. */
  private def kpMeasure(w: String): (Int, Int) = {
    val n = w.length
    var p1 = n; var p2 = n
    var i = 0
    def vowelUnits(): Int = {
      var count = 0
      var more = true
      while (more) {
        if (i + 1 < n && w.charAt(i) == 'i' && w.charAt(i + 1) == 'j') { i += 2; count += 1 }
        else if (i < n && kpVowel(w.charAt(i))) { i += 1; count += 1 }
        else more = false
      }
      count
    }
    while (i < n && !kpVowel(w.charAt(i))) i += 1
    if (vowelUnits() >= 1 && i < n && !kpVowel(w.charAt(i))) {
      i += 1; p1 = i
      while (i < n && !kpVowel(w.charAt(i))) i += 1
      if (vowelUnits() >= 1 && i < n && !kpVowel(w.charAt(i))) { i += 1; p2 = i }
    }
    (p1, p2)
  }

  /** lengthen_V at the end of `s`: double a short a/o/u/e before a final
    * consonant (not w/x) when the program's context conditions hold. */
  private def kpLengthenV(s: String): String = {
    val n = s.length
    if (n < 2) return s
    val fin = s.charAt(n - 1)
    if ("aeiouwxy".indexOf(fin) >= 0) return s // g_v_WX (marked Y passes)
    val v = s.charAt(n - 2)
    if (v == 'a' || v == 'o' || v == 'u') {
      if (n - 2 == 0 || !kpVowel(s.charAt(n - 3)))
        s.substring(0, n - 1) + v + fin
      else s
    } else if (v == 'e') {
      val atStart = n - 2 == 0
      if (!atStart && kpVowel(s.charAt(n - 3))) return s
      // not AIOU two back; not (skip one, AIOU, then non-vowel)
      if (!atStart) {
        if (n >= 4 && "aiou".indexOf(s.charAt(n - 4)) >= 0) return s
        if (n >= 6 && "aiou".indexOf(s.charAt(n - 5)) >= 0 && !kpVowel(s.charAt(n - 6))) return s
      }
      s.substring(0, n - 1) + "e" + fin
    } else s
  }

  /** Snowball Kp (the SnowballAnalyzer("Kp") program). */
  def kpStem(word: String): String = {
    var yFound = false; var stemmed = false; var geRemoved = false
    val sb = new StringBuilder(word)
    if (sb.nonEmpty && sb.charAt(0) == 'y') { sb.setCharAt(0, 'Y'); yFound = true }
    var k = 1
    while (k < sb.length) {
      if (sb.charAt(k) == 'y' && kpVowel(sb.charAt(k - 1))) { sb.setCharAt(k, 'Y'); yFound = true }
      k += 1
    }
    var w = sb.toString
    var p1 = 0; var p2 = 0
    def measure(): Unit = { val m = kpMeasure(w); p1 = m._1; p2 = m._2 }
    measure()

    // position-based conditions (pos = suffix start in the current w)
    def R1(pos: Int) = pos >= p1
    def R2(pos: Int) = pos >= p2
    def isIj(pos: Int) = pos >= 2 && w.charAt(pos - 2) == 'i' && w.charAt(pos - 1) == 'j'
    def V(pos: Int) = pos >= 1 && (kpVowel(w.charAt(pos - 1)) || isIj(pos))
    def VX(pos: Int) = pos >= 2 && (kpVowel(w.charAt(pos - 2)) ||
      (pos >= 3 && w.charAt(pos - 3) == 'i' && w.charAt(pos - 2) == 'j'))
    def C(pos: Int) = pos >= 1 && !isIj(pos) && !kpVowel(w.charAt(pos - 1))
    def drop(n: Int): String = w.substring(0, w.length - n)

    def step1(): Boolean = locate(w, Seq("'s", "s", "ies", "es", "aus", "en", "nde")) match {
      case Some("'s") => w = drop(2); true
      case Some("ies") if R1(w.length - 3) => w = drop(3) + "ie"; true
      case Some("aus") if R1(w.length - 3) && V(w.length - 3) => w = drop(3) + "au"; true
      case Some("es") =>
        val p = w.length - 2
        if (w.endsWith("ares") && R1(p - 2) && C(p - 2)) { w = kpLengthenV(drop(4)); true }
        else if (w.endsWith("eres") && R1(p - 2) && C(p - 2)) { w = drop(4); true }
        else if (R1(p) && C(p)) { w = drop(2) + "e"; true }
        else false
      case Some("s") =>
        val p = w.length - 1
        if (R1(p) && !(p >= 1 && w.charAt(p - 1) == 't' && R1(p - 1)) && C(p)) { w = drop(1); true }
        else false
      case Some("en") =>
        val p = w.length - 2
        if (w.endsWith("heden") && R1(p - 3)) { w = drop(5) + "heid"; true }
        else if (w.endsWith("nden")) { w = drop(2); true }
        else if (w.endsWith("den") && R1(p - 1) && C(p - 1)) { w = drop(3); true }
        else if ((w.endsWith("ien") || w.endsWith("jen")) && V(p - 1)) { w = drop(2); true }
        else if (R1(p) && C(p)) { w = kpLengthenV(drop(2)); true }
        else false
      case Some("nde") => w = drop(3) + "nd"; true
      case _ => false
    }

    def step2(): Boolean = locate(w, Seq("je", "de", "ge", "ische", "lijke",
        "le", "ene", "re", "se", "te", "ieve")) match {
      case Some("je") =>
        val p = w.length - 2
        if (w.endsWith("'tje")) { w = drop(4); true }
        else if (w.endsWith("etje") && R1(p - 2) && C(p - 2)) { w = drop(4); true }
        else if (w.endsWith("rntje")) { w = drop(5) + "rn"; true }
        else if (w.endsWith("tje") && R1(p - 1) && VX(p - 1)) { w = drop(3); true }
        else if (w.endsWith("inkje")) { w = drop(5) + "ing"; true }
        else if (w.endsWith("mpje")) { w = drop(4) + "m"; true }
        else if (w.endsWith("'je") && R1(p - 1)) { w = drop(3); true }
        else if (R1(p) && C(p)) { w = drop(2); true }
        else false
      case Some("de") if R1(w.length - 2) && C(w.length - 2) => w = drop(2); true
      case Some("ge") if R1(w.length - 2) => w = drop(2) + "g"; true
      case Some("lijke") if R1(w.length - 5) => w = drop(5) + "lijk"; true
      case Some("ische") if R1(w.length - 5) => w = drop(5) + "isch"; true
      case Some("te") if R1(w.length - 2) => w = drop(2) + "t"; true
      case Some("se") if R1(w.length - 2) => w = drop(2) + "s"; true
      case Some("re") if R1(w.length - 2) => w = drop(2) + "r"; true
      case Some("le") if R1(w.length - 2) => w = kpLengthenV(drop(2) + "l"); true
      case Some("ene") if R1(w.length - 3) && C(w.length - 3) =>
        w = kpLengthenV(drop(3) + "en"); true
      case Some("ieve") if R1(w.length - 4) && C(w.length - 4) => w = drop(4) + "ief"; true
      case _ => false
    }

    def step3(): Boolean = locate(w, Seq("heid", "fie", "gie", "atie", "isme",
        "ing", "arij", "erij", "sel", "rder", "ster", "iteit", "dst", "tst")) match {
      case Some("atie") if R1(w.length - 4) => w = drop(4) + "eer"; true
      case Some("iteit") if R1(w.length - 5) => w = kpLengthenV(drop(5)); true
      case Some(s @ ("heid" | "sel" | "ster")) if R1(w.length - s.length) =>
        w = drop(s.length); true
      case Some("rder") => w = drop(4) + "r"; true
      case Some(s @ ("isme" | "ing" | "erij")) if R1(w.length - s.length) =>
        w = kpLengthenV(drop(s.length)); true
      case Some("arij") if R1(w.length - 4) && C(w.length - 4) => w = drop(4) + "aar"; true
      case Some("fie") if R2(w.length - 3) => w = kpLengthenV(drop(3) + "f"); true
      case Some("gie") if R2(w.length - 3) => w = kpLengthenV(drop(3) + "g"); true
      case Some("tst") if R1(w.length - 3) && C(w.length - 3) => w = drop(3) + "t"; true
      case Some("dst") if R1(w.length - 3) && C(w.length - 3) => w = drop(3) + "d"; true
      case _ => false
    }

    def step4(): Boolean = {
      // part A runs as a try (the port collapses the or; see header note)
      locate(w, Seq("end", "atief", "erig", "achtig", "ioneel", "baar",
          "laar", "naar", "raar", "eriger", "achtiger", "lijker", "tant",
          "erigst", "achtigst", "lijkst")) match {
        case Some("ioneel") if R1(w.length - 6) => w = drop(6) + "ie"
        case Some("atief") if R1(w.length - 5) => w = drop(5) + "eer"
        case Some("baar") if R1(w.length - 4) => w = drop(4)
        case Some("naar") if R1(w.length - 4) && V(w.length - 4) => w = drop(4) + "n"
        case Some("laar") if R1(w.length - 4) && V(w.length - 4) => w = drop(4) + "l"
        case Some("raar") if R1(w.length - 4) && V(w.length - 4) => w = drop(4) + "r"
        case Some("tant") if R1(w.length - 4) => w = drop(4) + "teer"
        case Some(s @ ("lijker" | "lijkst")) if R1(w.length - s.length) =>
          w = drop(s.length) + "lijk"
        case Some(s @ ("achtig" | "achtiger" | "achtigst")) if R1(w.length - s.length) =>
          w = drop(s.length)
        case Some(s @ ("end" | "erig" | "eriger" | "erigst")) if
            R1(w.length - s.length) && C(w.length - s.length) =>
          w = kpLengthenV(drop(s.length))
        case _ => ()
      }
      // part B is what the routine's success reports
      locate(w, Seq("ig", "iger", "igst")) match {
        case Some(s) if R1(w.length - s.length) && C(w.length - s.length) =>
          w = kpLengthenV(drop(s.length)); true
        case _ => false
      }
    }

    def step1c(): Boolean = locate(w, Seq("d", "t")) match {
      case Some("d") if R1(w.length - 1) && C(w.length - 1) &&
          !(w.length >= 2 && w.charAt(w.length - 2) == 'n' && R1(w.length - 2)) =>
        w = drop(1); true
      case Some("t") if R1(w.length - 1) && C(w.length - 1) &&
          !(w.length >= 2 && w.charAt(w.length - 2) == 'h' && R1(w.length - 2)) =>
        w = drop(1); true
      case _ => false
    }

    def vowelThenCons(from: Int): Boolean = {
      var i = from
      while (i < w.length && !kpVowel(w.charAt(i))) i += 1
      if (i >= w.length) return false
      while (i < w.length && kpVowel(w.charAt(i))) i += 1
      i < w.length
    }

    if (step1()) stemmed = true
    if (step2()) stemmed = true
    if (step3()) stemmed = true
    if (step4()) stemmed = true

    geRemoved = false
    if (w.startsWith("ge") && w.length >= 5 && vowelThenCons(2)) {
      w = w.substring(2); geRemoved = true; measure()
    }
    if (geRemoved) step1c()

    geRemoved = false
    val gi = w.indexOf("ge", 1)
    if (gi >= 1 && gi + 5 <= w.length && vowelThenCons(gi + 2)) {
      w = w.substring(0, gi) + w.substring(gi + 2); geRemoved = true; measure()
    }
    if (geRemoved) step1c()

    locate(w, Seq("kt", "ft", "pt")) match {
      case Some("kt") => w = drop(2) + "k"; stemmed = true
      case Some("ft") => w = drop(2) + "f"; stemmed = true
      case Some("pt") => w = drop(2) + "p"; stemmed = true
      case _ => ()
    }
    if (stemmed || geRemoved) {
      locate(w, Seq("bb", "cc", "dd", "ff", "gg", "hh", "jj", "kk", "ll",
          "mm", "nn", "pp", "qq", "rr", "ss", "tt", "vv", "ww", "xx", "zz",
          "v", "z")) match {
        case Some(s) if s.length == 2 => w = drop(1)
        case Some("v") => w = drop(1) + "f"
        case Some("z") => w = drop(1) + "s"
        case _ => ()
      }
    }

    if (yFound) w.map(c => if (c == 'Y') 'y' else c) else w
  }
}
