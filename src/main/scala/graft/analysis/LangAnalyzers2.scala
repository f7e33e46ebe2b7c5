package graft.analysis

/** Second analyzer-catalog wave: Finnish, Hungarian, Czech, Bulgarian,
  * Hindi, Arabic, Persian, Indonesian — the next tier of the reference's
  * per-language directories (/root/reference/src/Lucene.Net.Analysis.Common/
  * Analysis/{Fi,Hu,Cz,Bg,Hi,Ar,Fa,Id}). Like LangAnalyzers, stemmer RULE
  * SETS replicate the published algorithms the reference implements (Savoy
  * UniNE light stemmers, Larkey's Arabic light10, Tala's Indonesian
  * stemmer, the Lucene normalizer tables) — rule-identical by necessity,
  * expressed as fresh immutable Scala. Stop sets: Arabic is the FULL
  * in-tree contrib list verbatim; Finnish/Hungarian/Czech/Romanian/
  * Indonesian ship the full published Snowball/Tala lists; the remaining
  * embedded `stopwords.txt` resources are absent from this source tree,
  * so Thai/Bulgarian/Hindi/Persian/Sorani are reconstructions of the
  * published lists (documented at each val).
  */
object LangAnalyzers2 {

  // ------------------------------------------------------------- tokenizer

  /** Letter-or-nonspacing-mark tokenizer — the ArabicLetterTokenizer
    * discipline (Analysis/Ar/ArabicLetterTokenizer.cs: LetterTokenizer
    * widened to keep NonspacingMark so diacritics/matras don't split
    * words); used by the Arabic/Persian/Hindi chains, lowercasing inline
    * like LowerCaseTokenizer. */
  def letterOrMarkTokenize(text: String): Iterator[Token] = {
    @inline def isTok(c: Char): Boolean = {
      val t = Character.getType(c)
      Character.isLetter(c) || t == Character.NON_SPACING_MARK ||
        t == Character.COMBINING_SPACING_MARK || // Devanagari matras are Mc
        t == Character.FORMAT // ZWNJ/ZWJ ride inside words (UAX#29 WB4);
                              // the normalizers consume or delete them
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[Token]
    var pos = -1
    var i = 0
    while (i < text.length) {
      if (isTok(text.charAt(i))) {
        val start = i
        val sb = new java.lang.StringBuilder
        while (i < text.length && isTok(text.charAt(i))) {
          sb.append(Character.toLowerCase(text.charAt(i))); i += 1
        }
        pos += 1
        out += Token(sb.toString, pos, start, i, TokenType.ALPHANUM)
      } else i += 1
    }
    out.iterator
  }

  // ------------------------------------------------------------- Finnish
  // FinnishLightStemmer.cs rules (Savoy, Report on CLEF-2003 Monolingual
  // Tracks). NOTE: FinnishAnalyzer.cs defaults to SnowballFilter(Finnish);
  // this chain ships the directory's FinnishLightStemFilter variant — the
  // Snowball Finnish algorithm remains uncovered (documented divergence).

  @inline private def fiVowel(c: Char): Boolean = "aeiouy".indexOf(c) >= 0

  def finnishLightStem(word: String): String = {
    if (word.length < 4) return word
    var w: String = word.map { case 'ä' | 'å' => 'a'; case 'ö' => 'o'; case c => c }
    w = fiStep1(w); w = fiStep2(w); w = fiStep3(w); w = fiNorm1(w); fiNorm2(w)
  }

  private def fiStep1(w: String): String = {
    if (w.length > 8) {
      if (w.endsWith("kin")) return fiStep1(w.dropRight(3))
      if (w.endsWith("ko")) return fiStep1(w.dropRight(2))
    }
    if (w.length > 11) {
      if (w.endsWith("dellinen")) return w.dropRight(8)
      if (w.endsWith("dellisuus")) return w.dropRight(9)
    }
    w
  }

  private def fiStep2(w: String): String =
    if (w.length > 5) {
      if (w.endsWith("lla") || w.endsWith("tse") || w.endsWith("sti")) w.dropRight(3)
      else if (w.endsWith("ni")) w.dropRight(2)
      else if (w.endsWith("aa")) w.dropRight(1)
      else w
    } else w

  private def fiStep3(w: String): String = {
    val len = w.length
    if (len > 8) {
      if (w.endsWith("nnen")) return w.dropRight(4) + "s"
      if (w.endsWith("ntena")) return w.dropRight(5) + "s"
      if (w.endsWith("tten")) return w.dropRight(4)
      if (w.endsWith("eiden")) return w.dropRight(5)
    }
    if (len > 6) {
      if (w.endsWith("neen") || w.endsWith("niin") || w.endsWith("seen") ||
          w.endsWith("teen") || w.endsWith("inen")) return w.dropRight(4)
      if (w.charAt(len - 3) == 'h' && fiVowel(w.charAt(len - 2)) && w.charAt(len - 1) == 'n')
        return w.dropRight(3)
      if (w.endsWith("den")) return w.dropRight(3) + "s"
      if (w.endsWith("ksen")) return w.dropRight(4) + "s"
      if (w.endsWith("ssa") || w.endsWith("sta") || w.endsWith("lla") ||
          w.endsWith("lta") || w.endsWith("tta") || w.endsWith("ksi") ||
          w.endsWith("lle")) return w.dropRight(3)
    }
    if (len > 5) {
      if (w.endsWith("na") || w.endsWith("ne")) return w.dropRight(2)
      if (w.endsWith("nei")) return w.dropRight(3)
    }
    if (len > 4) {
      if (w.endsWith("ja") || w.endsWith("ta")) return w.dropRight(2)
      if (w.charAt(len - 1) == 'a') return w.dropRight(1)
      if (w.charAt(len - 1) == 'n' && fiVowel(w.charAt(len - 2))) return w.dropRight(2)
      if (w.charAt(len - 1) == 'n') return w.dropRight(1)
    }
    w
  }

  private def fiNorm1(w0: String): String = {
    var w = w0
    if (w.length > 5 && w.endsWith("hde")) w = w.dropRight(3) + "ksi"
    if (w.length > 4 && (w.endsWith("ei") || w.endsWith("at"))) return w.dropRight(2)
    if (w.length > 3 && "tsjeai".indexOf(w.last) >= 0) return w.dropRight(1)
    w
  }

  private def fiNorm2(w0: String): String = {
    var w = w0
    if (w.length > 8 && "eou".indexOf(w.last) >= 0) w = w.dropRight(1)
    if (w.length > 4) {
      if (w.last == 'i') w = w.dropRight(1)
      if (w.length > 4) {
        // collapse repeated k/p/t (keep the first of each run)
        val sb = new StringBuilder
        sb.append(w.head)
        var ch = w.head
        var i = 1
        while (i < w.length) {
          val c = w.charAt(i)
          if (c == ch && (ch == 'k' || ch == 'p' || ch == 't')) ()
          else { sb.append(c); ch = c }
          i += 1
        }
        w = sb.toString
      }
    }
    w
  }

  // ------------------------------------------------------------ Hungarian
  // HungarianLightStemmer.cs rules (Savoy UniNE). HungarianAnalyzer.cs
  // defaults to Snowball Hungarian; this is the directory's
  // HungarianLightStemFilter variant (documented divergence).

  @inline private def huVowel(c: Char): Boolean = "aeiouy".indexOf(c) >= 0

  def hungarianLightStem(word: String): String = {
    var w: String = word.map {
      case 'á' => 'a'; case 'ë' | 'é' => 'e'; case 'í' => 'i'
      case 'ó' | 'ő' | 'õ' | 'ö' => 'o'
      case 'ú' | 'ű' | 'ũ' | 'û' | 'ü' => 'u'
      case c => c
    }
    w = huRemoveCase(w); w = huRemovePossessive(w); w = huRemovePlural(w)
    huNormalize(w)
  }

  private val HuCase3 = Seq("nak", "nek", "val", "vel", "ert", "rol", "ban",
    "ben", "bol", "nal", "nel", "hoz", "hez", "tol")
  private val HuCase2 = Seq("at", "et", "ot", "va", "ve", "ra", "re", "ba",
    "be", "ul", "ig")

  private def huRemoveCase(w: String): String = {
    val len = w.length
    if (len > 6 && w.endsWith("kent")) return w.dropRight(4)
    if (len > 5) {
      if (HuCase3.exists(w.endsWith)) return w.dropRight(3)
      if ((w.endsWith("al") || w.endsWith("el")) &&
          !huVowel(w.charAt(len - 3)) && w.charAt(len - 3) == w.charAt(len - 4))
        return w.dropRight(3)
    }
    if (len > 4) {
      if (HuCase2.exists(w.endsWith)) return w.dropRight(2)
      if ((w.endsWith("on") || w.endsWith("en")) && !huVowel(w.charAt(len - 3)))
        return w.dropRight(2)
      w.last match {
        case 't' | 'n' => return w.dropRight(1)
        case 'a' | 'e' if w.charAt(len - 2) == w.charAt(len - 3) && !huVowel(w.charAt(len - 2)) =>
          return w.dropRight(2)
        case _ =>
      }
    }
    w
  }

  private def huRemovePossessive(w: String): String = {
    val len = w.length
    if (len > 6) {
      if (!huVowel(w.charAt(len - 5)) &&
          (w.endsWith("atok") || w.endsWith("otok") || w.endsWith("etek")))
        return w.dropRight(4)
      if (w.endsWith("itek") || w.endsWith("itok")) return w.dropRight(4)
    }
    if (len > 5) {
      if (!huVowel(w.charAt(len - 4)) &&
          (w.endsWith("unk") || w.endsWith("tok") || w.endsWith("tek")))
        return w.dropRight(3)
      if (huVowel(w.charAt(len - 4)) && w.endsWith("juk")) return w.dropRight(3)
      if (w.endsWith("ink")) return w.dropRight(3)
    }
    if (len > 4) {
      if (!huVowel(w.charAt(len - 3)) &&
          (w.endsWith("am") || w.endsWith("em") || w.endsWith("om") ||
           w.endsWith("ad") || w.endsWith("ed") || w.endsWith("od") || w.endsWith("uk")))
        return w.dropRight(2)
      if (huVowel(w.charAt(len - 3)) &&
          (w.endsWith("nk") || w.endsWith("ja") || w.endsWith("je")))
        return w.dropRight(2)
      if (w.endsWith("im") || w.endsWith("id") || w.endsWith("ik")) return w.dropRight(2)
    }
    if (len > 3) w.last match {
      case 'a' | 'e' if !huVowel(w.charAt(len - 2)) => return w.dropRight(1)
      case 'm' | 'd' if huVowel(w.charAt(len - 2)) => return w.dropRight(1)
      case 'i' => return w.dropRight(1)
      case _ =>
    }
    w
  }

  private def huRemovePlural(w: String): String =
    if (w.length > 3 && w.last == 'k') {
      if ("aoe".indexOf(w.charAt(w.length - 2)) >= 0 && w.length > 4) w.dropRight(2)
      else w.dropRight(1)
    } else w

  private def huNormalize(w: String): String =
    if (w.length > 3 && "aeio".indexOf(w.last) >= 0) w.dropRight(1) else w

  // --------------------------------------------------------------- Czech
  // CzechStemmer.cs rules (Dolamic & Savoy light stemmer).

  private val CsCase3 = Seq("ech", "ich", "ích", "ého", "ěmi", "emi", "ému",
    "ěte", "ete", "ěti", "eti", "ího", "iho", "ími", "ímu", "imu", "ách",
    "ata", "aty", "ých", "ama", "ami", "ové", "ovi", "ými")
  private val CsCase2 = Seq("em", "es", "ém", "ím", "ům", "at", "ám", "os",
    "us", "ým", "mi", "ou")

  def czechStem(word: String): String = {
    var w = csRemoveCase(word)
    w = csRemovePossessives(w)
    if (w.nonEmpty) w = csNormalize(w)
    w
  }

  private def csRemoveCase(w: String): String = {
    val len = w.length
    if (len > 7 && w.endsWith("atech")) return w.dropRight(5)
    if (len > 6 && (w.endsWith("ětem") || w.endsWith("etem") || w.endsWith("atům")))
      return w.dropRight(4)
    if (len > 5 && CsCase3.exists(w.endsWith)) return w.dropRight(3)
    if (len > 4 && CsCase2.exists(w.endsWith)) return w.dropRight(2)
    if (len > 3 && "aeiouůyáéíýě".indexOf(w.last) >= 0) return w.dropRight(1)
    w
  }

  private def csRemovePossessives(w: String): String =
    if (w.length > 5 && (w.endsWith("ov") || w.endsWith("in") || w.endsWith("ův")))
      w.dropRight(2)
    else w

  private def csNormalize(w: String): String = {
    val len = w.length
    if (w.endsWith("čt")) return w.dropRight(2) + "ck"
    if (w.endsWith("št")) return w.dropRight(2) + "sk"
    w.last match {
      case 'c' | 'č' => return w.dropRight(1) + "k"
      case 'z' | 'ž' => return w.dropRight(1) + "h"
      case _ =>
    }
    if (len > 1 && w.charAt(len - 2) == 'e') return w.dropRight(2) + w.last // e* > *
    if (len > 2 && w.charAt(len - 2) == 'ů')
      return w.substring(0, len - 2) + 'o' + w.last // *ů* -> *o*
    w
  }

  // ------------------------------------------------------------ Bulgarian
  // BulgarianStemmer.cs rules (Nakov's BulStem / Savoy light variant).

  def bulgarianStem(word: String): String = {
    if (word.length < 4) return word
    if (word.length > 5 && word.endsWith("ища")) return word.dropRight(3)
    var w = bgRemoveArticle(word)
    w = bgRemovePlural(w)
    if (w.length > 3) {
      if (w.endsWith("я")) w = w.dropRight(1)
      if (w.endsWith("а") || w.endsWith("о") || w.endsWith("е")) w = w.dropRight(1)
    }
    if (w.length > 4 && w.endsWith("ен")) w = w.dropRight(2) + "н"
    if (w.length > 5 && w.charAt(w.length - 2) == 'ъ') w = w.dropRight(2) + w.last
    w
  }

  private def bgRemoveArticle(w: String): String = {
    val len = w.length
    if (len > 6 && w.endsWith("ият")) return w.dropRight(3)
    if (len > 5 && (w.endsWith("ът") || w.endsWith("то") || w.endsWith("те") ||
        w.endsWith("та") || w.endsWith("ия"))) return w.dropRight(2)
    if (len > 4 && w.endsWith("ят")) return w.dropRight(2)
    w
  }

  private def bgRemovePlural(w: String): String = {
    val len = w.length
    if (len > 6) {
      if (w.endsWith("овци")) return w.dropRight(3) // -> о
      if (w.endsWith("ове")) return w.dropRight(3)
      if (w.endsWith("еве")) return w.dropRight(3) + "й"
    }
    if (len > 5) {
      if (w.endsWith("ища")) return w.dropRight(3)
      if (w.endsWith("та")) return w.dropRight(2)
      if (w.endsWith("ци")) return w.dropRight(2) + "к"
      if (w.endsWith("зи")) return w.dropRight(2) + "г"
      if (w.charAt(len - 3) == 'е' && w.last == 'и')
        return w.substring(0, len - 3) + 'я' + w.charAt(len - 2) // е..и -> я..
    }
    if (len > 4) {
      if (w.endsWith("си")) return w.dropRight(2) + "х"
      if (w.endsWith("и")) return w.dropRight(1)
    }
    w
  }

  // --------------------------------------------------------------- Hindi
  // HindiNormalizer.cs + HindiStemmer.cs (light stemmer of Ramanathan &
  // Rao adapted per the Lucene tables). The IndicNormalizationFilter is
  // NOT replicated: its decomposition table is elided in this reference
  // tree (In/IndicNormalizer.cs declares `decompositions = {}` — a
  // converter artifact leaving no data to follow); the chain is
  // letter-or-mark tokenize -> hindiNormalize -> stop -> stem.

  def hindiNormalize(term: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < term.length) {
      val c = term.charAt(i)
      c match {
        case 'न' if i + 1 < term.length && term.charAt(i + 1) == '्' =>
          sb.append('ं'); i += 1 // dead n -> bindu (virama consumed)
        case 'ँ' => sb.append('ं') // candrabindu -> bindu
        case '़' | '‍' | '‌' | '्' => () // nukta/zwj/zwnj/virama deleted
        case 'ऩ' => sb.append('न')
        case 'ऱ' => sb.append('र')
        case 'ऴ' => sb.append('ळ')
        case 'क़' => sb.append('क')
        case 'ख़' => sb.append('ख')
        case 'ग़' => sb.append('ग')
        case 'ज़' => sb.append('ज')
        case 'ड़' => sb.append('ड')
        case 'ढ़' => sb.append('ढ')
        case 'फ़' => sb.append('फ')
        case 'य़' => sb.append('य')
        case 'ॅ' | 'ॆ' => sb.append('े') // chandra/short e
        case 'ॉ' | 'ॊ' => sb.append('ो')
        case 'ऍ' | 'ऎ' => sb.append('ए')
        case 'ऑ' | 'ऒ' => sb.append('ओ')
        case 'ॲ' | 'आ' => sb.append('अ') // long -> short vowels
        case 'ई' => sb.append('इ')
        case 'ऊ' => sb.append('उ')
        case 'ॠ' => sb.append('ऋ')
        case 'ॡ' => sb.append('ऌ')
        case 'ऐ' => sb.append('ए')
        case 'औ' => sb.append('ओ')
        case 'ी' => sb.append('ि')
        case 'ू' => sb.append('ु')
        case 'ॄ' => sb.append('ृ')
        case 'ॣ' => sb.append('ॢ')
        case 'ै' => sb.append('े')
        case 'ौ' => sb.append('ो')
        case other => sb.append(other)
      }
      i += 1
    }
    sb.toString
  }

  private val HiSuf5 = Seq("ाएंगी", "ाएंगे", "ाऊंगी", "ाऊंगा", "ाइयाँ", "ाइयों", "ाइयां")
  private val HiSuf4 = Seq("ाएगी", "ाएगा", "ाओगी", "ाओगे", "एंगी", "ेंगी", "एंगे",
    "ेंगे", "ूंगी", "ूंगा", "ातीं", "नाओं", "नाएं", "ताओं", "ताएं", "ियाँ", "ियों", "ियां")
  private val HiSuf3 = Seq("ाकर", "ाइए", "ाईं", "ाया", "ेगी", "ेगा", "ोगी", "ोगे",
    "ाने", "ाना", "ाते", "ाती", "ाता", "तीं", "ाओं", "ाएं", "ुओं", "ुएं", "ुआं")
  private val HiSuf2 = Seq("कर", "ाओ", "िए", "ाई", "ाए", "ने", "नी", "ना", "ते",
    "ीं", "ती", "ता", "ाँ", "ां", "ों", "ें")
  private val HiSuf1 = Seq("ो", "े", "ू", "ु", "ी", "ि", "ा")

  def hindiStem(w: String): String = {
    val len = w.length
    if (len > 6 && HiSuf5.exists(w.endsWith)) return w.dropRight(5)
    if (len > 5 && HiSuf4.exists(w.endsWith)) return w.dropRight(4)
    if (len > 4 && HiSuf3.exists(w.endsWith)) return w.dropRight(3)
    if (len > 3 && HiSuf2.exists(w.endsWith)) return w.dropRight(2)
    if (len > 2 && HiSuf1.exists(w.endsWith)) return w.dropRight(1)
    w
  }

  // -------------------------------------------------------------- Arabic
  // ArabicNormalizer.cs + ArabicStemmer.cs (Larkey/Ballesteros/Connell
  // light10): normalize hamza forms / strip harakat + tatweel, then one
  // prefix and every matching suffix with min-stem-length guards.

  def arabicNormalize(term: String): String = {
    val sb = new StringBuilder
    term.foreach {
      case 'آ' | 'أ' | 'إ' => sb.append('ا') // hamza alefs -> alef
      case 'ى' => sb.append('ي') // dotless yeh -> yeh
      case 'ة' => sb.append('ه') // teh marbuta -> heh
      case 'ـ' | 'ً' | 'ٌ' | 'ٍ' | 'َ' | 'ُ' |
           'ِ' | 'ّ' | 'ْ' => () // tatweel + harakat deleted
      case c => sb.append(c)
    }
    sb.toString
  }

  private val ArPrefixes = Seq("ال", "وال",
    "بال", "كال", "فال",
    "لل", "و")
  private val ArSuffixes = Seq("ها", "ان", "ات",
    "ون", "ين", "يه", "ية",
    "ه", "ة", "ي")

  def arabicStem(word: String): String = {
    var w = word
    // prefix: first match only; wa- (single char) needs >= 3 chars after,
    // the rest >= 2 (ArabicStemmer.cs startsWithCheckLength)
    ArPrefixes.find { p =>
      w.startsWith(p) && (if (p.length == 1) w.length >= 4 else w.length >= p.length + 2)
    }.foreach(p => w = w.substring(p.length))
    // suffixes: every match strips, each requiring >= 2 chars left
    ArSuffixes.foreach { s =>
      if (w.endsWith(s) && w.length >= s.length + 2) w = w.dropRight(s.length)
    }
    w
  }

  // ------------------------------------------------------------- Persian
  // PersianNormalizer.cs: farsi yeh/yeh barree -> yeh, keheh -> kaf,
  // heh+yeh/heh goal -> heh, hamza-above deleted. PersianAnalyzer.cs runs
  // Arabic normalization first, stops AFTER normalization, no stemmer.

  def persianNormalize(term: String): String = {
    val sb = new StringBuilder
    term.foreach {
      case 'ی' | 'ے' => sb.append('ي')
      case 'ک' => sb.append('ك')
      case 'ۀ' | 'ہ' => sb.append('ه')
      case 'ٔ' => ()
      case c => sb.append(c)
    }
    sb.toString
  }

  // ----------------------------------------------------------- Indonesian
  // IndonesianStemmer.cs (Tala 2003): particle/possessive strip, then
  // first-order prefix -> suffix -> second-order prefix with the
  // rule-interaction flags; every rule gated on > 2 remaining syllables.

  @inline private def idVowel(c: Char): Boolean = "aeiou".indexOf(c) >= 0

  def indonesianStem(word: String, stemDerivational: Boolean = true): String = {
    var w = word
    var syll = w.count(idVowel)
    var fKe = false; var fPeng = false; var fDi = false; var fMeng = false
    var fTer = false; var fBer = false; var fPe = false

    if (syll > 2 && (w.endsWith("kah") || w.endsWith("lah") || w.endsWith("pun"))) {
      syll -= 1; w = w.dropRight(3)
    }
    if (syll > 2) {
      if (w.endsWith("ku") || w.endsWith("mu")) { syll -= 1; w = w.dropRight(2) }
      else if (w.endsWith("nya")) { syll -= 1; w = w.dropRight(3) }
    }
    if (!stemDerivational) return w

    def firstOrderPrefix(): Boolean = {
      val before = w
      if (w.startsWith("meng")) { fMeng = true; syll -= 1; w = w.substring(4) }
      else if (w.startsWith("meny") && w.length > 4 && idVowel(w.charAt(4))) {
        fMeng = true; syll -= 1; w = "s" + w.substring(4)
      }
      else if (w.startsWith("men")) { fMeng = true; syll -= 1; w = w.substring(3) }
      else if (w.startsWith("mem")) { fMeng = true; syll -= 1; w = w.substring(3) }
      else if (w.startsWith("me")) { fMeng = true; syll -= 1; w = w.substring(2) }
      else if (w.startsWith("peng")) { fPeng = true; syll -= 1; w = w.substring(4) }
      else if (w.startsWith("peny") && w.length > 4 && idVowel(w.charAt(4))) {
        fPeng = true; syll -= 1; w = "s" + w.substring(4)
      }
      else if (w.startsWith("peny")) { fPeng = true; syll -= 1; w = w.substring(4) }
      else if (w.startsWith("pen") && w.length > 3 && idVowel(w.charAt(3))) {
        fPeng = true; syll -= 1; w = "t" + w.substring(3)
      }
      else if (w.startsWith("pen")) { fPeng = true; syll -= 1; w = w.substring(3) }
      else if (w.startsWith("pem")) { fPeng = true; syll -= 1; w = w.substring(3) }
      else if (w.startsWith("di")) { fDi = true; syll -= 1; w = w.substring(2) }
      else if (w.startsWith("ter")) { fTer = true; syll -= 1; w = w.substring(3) }
      else if (w.startsWith("ke")) { fKe = true; syll -= 1; w = w.substring(2) }
      w != before
    }

    def secondOrderPrefix(): Boolean = {
      val before = w
      if (w.startsWith("ber")) { fBer = true; syll -= 1; w = w.substring(3) }
      else if (w.length == 7 && w == "belajar") { fBer = true; syll -= 1; w = w.substring(3) }
      else if (w.startsWith("be") && w.length > 4 && !idVowel(w.charAt(2)) &&
               w.charAt(3) == 'e' && w.charAt(4) == 'r') {
        fBer = true; syll -= 1; w = w.substring(2)
      }
      else if (w.startsWith("per")) { syll -= 1; w = w.substring(3) }
      else if (w.length == 7 && w == "pelajar") { syll -= 1; w = w.substring(3) }
      else if (w.startsWith("pe")) { fPe = true; syll -= 1; w = w.substring(2) }
      w != before
    }

    def suffix(): Boolean = {
      val before = w
      if (w.endsWith("kan") && !fKe && !fPeng && !fPe) { syll -= 1; w = w.dropRight(3) }
      else if (w.endsWith("an") && !fDi && !fMeng && !fTer) { syll -= 1; w = w.dropRight(2) }
      else if (w.endsWith("i") && !w.endsWith("si") && !fBer && !fKe && !fPeng) {
        syll -= 1; w = w.dropRight(1)
      }
      w != before
    }

    val fired1 = syll > 2 && firstOrderPrefix()
    if (fired1) {
      val fired2 = syll > 2 && suffix()
      if (fired2 && syll > 2) secondOrderPrefix()
    } else {
      if (syll > 2) secondOrderPrefix()
      if (syll > 2) suffix()
    }
    w
  }

  // ------------------------------------------------------ Sorani (Kurdish)
  // SoraniNormalizer.cs + SoraniStemmer.cs (Analysis/Ckb): yeh forms ->
  // farsi yeh, kaf -> keheh, heh variants -> AE where final/marbuta,
  // initial reh -> rreh, harakat/tatweel/format chars deleted; the stemmer
  // strips postposition, possessive, ezafe/definite/indefinite endings.

  def soraniNormalize(term: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < term.length) {
      val c = term.charAt(i)
      c match {
        case 'ي' | 'ى' => sb.append('ی') // yeh/dotless -> farsi yeh
        case 'ك' => sb.append('ک') // kaf -> keheh
        case '‌' => // ZWNJ: heh before it becomes AE; ZWNJ deleted
          if (sb.nonEmpty && sb.last == 'ه') sb.setCharAt(sb.length - 1, 'ە')
        case 'ه' if i == term.length - 1 => sb.append('ە') // final heh -> AE
        case 'ة' => sb.append('ە') // teh marbuta -> AE
        case 'ھ' => sb.append('ه') // heh doachashmee -> heh
        case 'ر' if sb.isEmpty => sb.append('ڕ') // initial reh -> rreh
        case 'ڒ' => sb.append('ڕ') // rreh-above -> rreh
        case 'ـ' | 'ً' | 'ٌ' | 'ٍ' | 'َ' | 'ُ' |
             'ِ' | 'ّ' | 'ْ' => () // tatweel + harakat deleted
        case other =>
          if (Character.getType(other) == Character.FORMAT) () // deleted
          else sb.append(other)
      }
      i += 1
    }
    sb.toString
  }

  def soraniStem(word: String): String = {
    var w = word
    // postposition
    if (w.length > 5 && w.endsWith("دا")) w = w.dropRight(2)
    else if (w.length > 4 && w.endsWith("نا")) w = w.dropRight(1)
    else if (w.length > 6 && w.endsWith("ەوە")) w = w.dropRight(3)
    // possessive pronoun
    if (w.length > 6 && (w.endsWith("مان") || w.endsWith("یان") || w.endsWith("تان")))
      w = w.dropRight(3)
    // ezafe / definite / indefinite / demonstrative endings (first match)
    val len = w.length
    if (len > 6 && w.endsWith("ێکی")) w.dropRight(3)
    else if (len > 7 && w.endsWith("یەکی")) w.dropRight(4)
    else if (len > 5 && w.endsWith("ێک")) w.dropRight(2)
    else if (len > 6 && w.endsWith("یەک")) w.dropRight(3)
    else if (len > 6 && w.endsWith("ەکە")) w.dropRight(3)
    else if (len > 5 && w.endsWith("کە")) w.dropRight(2)
    else if (len > 7 && w.endsWith("ەکان")) w.dropRight(4)
    else if (len > 6 && w.endsWith("کان")) w.dropRight(3)
    else if (len > 7 && w.endsWith("یانی")) w.dropRight(4)
    else if (len > 6 && w.endsWith("انی")) w.dropRight(3)
    else if (len > 6 && w.endsWith("یان")) w.dropRight(3)
    else if (len > 5 && w.endsWith("ان")) w.dropRight(2)
    else if (len > 7 && w.endsWith("یانە")) w.dropRight(4)
    else if (len > 6 && w.endsWith("انە")) w.dropRight(3)
    else if (len > 5 && (w.endsWith("ایە") || w.endsWith("ەیە"))) w.dropRight(2)
    else if (len > 4 && w.endsWith("ە")) w.dropRight(1)
    else if (len > 4 && w.endsWith("ی")) w.dropRight(1)
    else w
  }

  // ---------------------------------------------------------------- Thai
  // ThaiWordFilter.cs / ThaiTokenizer (Analysis/Th): Thai script has no
  // inter-word spaces; the reference delegates segmentation to the
  // platform's dictionary-based BreakIterator (Java/ICU Thai word data) —
  // so do we. Sub-words take consecutive positions (the filter's
  // posIncr=1 re-emission), non-Thai tokens pass through.

  @inline private def isThaiChar(c: Char): Boolean = c >= '฀' && c <= '๿'

  def thaiWordSplit(in: Iterator[Token]): Iterator[Token] = {
    val bi = java.text.BreakIterator.getWordInstance(new java.util.Locale("th"))
    var shift = 0
    in.flatMap { t =>
      if (!t.term.exists(isThaiChar)) Iterator.single(t.copy(position = t.position + shift))
      else {
        bi.setText(t.term)
        val parts = scala.collection.mutable.ArrayBuffer.empty[(String, Int, Int)]
        var start = bi.first()
        var end = bi.next()
        while (end != java.text.BreakIterator.DONE) {
          val piece = t.term.substring(start, end)
          if (piece.exists(c => Character.isLetterOrDigit(c))) parts += ((piece, start, end))
          start = end
          end = bi.next()
        }
        val basePos = t.position + shift
        if (parts.isEmpty) Iterator.single(t.copy(position = basePos))
        else {
          shift += parts.length - 1
          parts.iterator.zipWithIndex.map { case ((term, so, eo), i) =>
            Token(term, basePos + i, t.startOffset + so, t.startOffset + eo, t.tokenType)
          }
        }
      }
    }
  }

  /** ThaiAnalyzer stop set — the published list reconstructed (the
    * embedded `Th/stopwords.txt` resource is absent from this source
    * tree); function/aspect/cohesion words over which the dictionary
    * word-break tokenizer emits positions. */
  val ThaiStopWords: Set[String] = Set(
    "และ", "ใน", "ของ", "ที่", "เป็น", "มี", "ไม่", "ให้", "ได้", "ว่า",
    "จะ", "ก็", "มา", "ไป", "กับ", "จาก", "โดย", "หรือ", "แต่", "เมื่อ",
    "ความ", "การ", "นี้", "นั้น", "ซึ่ง", "อยู่", "คือ", "ถ้า", "แล้ว",
    "ต้อง", "กว่า", "ถูก", "ทั้ง", "ด้วย", "เพราะ", "อย่าง", "ช่วง", "ตาม",
    "กล่าว", "กัน", "ก่อน", "ขณะ", "ขอ", "ขึ้น", "คง", "ครั้ง", "จัด",
    "จึง", "ดัง", "ด้าน", "ตั้ง", "ตั้งแต่", "ต่อ", "ต่าง", "ต่างๆ", "ถึง",
    "ทั้งนี้", "ทาง", "ทำ", "ทำให้", "ที่สุด", "ทุก", "นอกจาก", "นัก",
    "น่า", "นำ", "บาง", "ผล", "ผ่าน", "พบ", "พร้อม", "มาก", "ยัง", "รวม",
    "ระหว่าง", "รับ", "ราย", "ร่วม", "ลง", "วัน", "สุด", "ส่ง", "ส่วน",
    "สำหรับ", "หนึ่ง", "หลัง", "หลังจาก", "หลาย", "หาก", "อยาก", "ออก",
    "อะไร", "อาจ", "อีก", "เขา", "เข้า", "เคย", "เฉพาะ", "เช่น", "เดียว",
    "เดียวกัน", "เนื่องจาก", "เปิด", "เปิดเผย", "เพื่อ", "เรา", "เริ่ม",
    "เลย", "เห็น", "เอง", "แบบ", "แรก", "แห่ง")

  // ------------------------------------------------------------ stop sets
  // Finnish/Hungarian ship the FULL Snowball lists (cores below ∪ the
  // expanded vals after them); Arabic is the full in-tree contrib list
  // verbatim; Czech/Romanian/Indonesian are full published lists; the
  // Thai/Bulgarian/Hindi/Persian/Sorani embedded resources are absent
  // from the source tree — their sets reconstruct the published lists.

  private val FinnishStopWordsCore: Set[String] = Set(
    "ja", "on", "ei", "että", "oli", "hän", "se", "en", "ole", "mutta",
    "niin", "kuin", "minä", "sinä", "me", "te", "he", "tämä", "tuo",
    "joka", "mikä", "kun", "jos", "myös", "sen", "sitä", "siinä", "ovat",
    "olen", "olet", "mitä", "kanssa", "vain", "nyt", "jo", "hänen",
    "itse", "tai", "vaan", "koska", "kuten", "missä", "ne", "nämä",
    "näin", "siis", "sitten", "tässä", "yli", "ali")

  private val HungarianStopWordsCore: Set[String] = Set(
    "a", "az", "és", "hogy", "nem", "is", "egy", "de", "ez", "azt",
    "van", "volt", "már", "csak", "meg", "ha", "mint", "el", "még",
    "mert", "vagy", "így", "aki", "ami", "ők", "mi", "te", "én", "ő",
    "ki", "be", "fel", "le", "majd", "után", "által", "arra", "erre",
    "ezt", "abban", "ebben", "akkor", "amely", "azok", "ezek", "lesz",
    "lett", "olyan", "ilyen", "itt", "ott", "pedig", "hát", "két")

  /** Full Snowball finnish_stop.txt ∪ the core above (the 4.8
    * FinnishAnalyzer default loads finnish_stop.txt at build time; the
    * published snowballstem.org list is public domain). Dominated by the
    * olla/minä/tämä/se/joka/mikä inflection paradigms. */
  val FinnishStopWords: Set[String] = FinnishStopWordsCore ++ Set(
    "olla", "olemme", "olette", "olisi", "olisit", "olisin", "olisimme",
    "olisitte", "olisivat", "olit", "olin", "olimme", "olitte", "olivat",
    "ollut", "olleet", "et", "emme", "ette", "eivät", "minun", "minut",
    "minua", "minussa", "minusta", "minuun", "minulla", "minulta",
    "minulle", "sinun", "sinut", "sinua", "sinussa", "sinusta", "sinuun",
    "sinulla", "sinulta", "sinulle", "hänen", "hänet", "häntä",
    "hänessä", "hänestä", "häneen", "hänellä", "häneltä", "hänelle",
    "meidän", "meidät", "meitä", "meissä", "meistä", "meihin", "meillä",
    "meiltä", "meille", "teidän", "teidät", "teitä", "teissä", "teistä",
    "teihin", "teillä", "teiltä", "teille", "heidän", "heidät", "heitä",
    "heissä", "heistä", "heihin", "heillä", "heiltä", "heille", "tämän",
    "tätä", "tästä", "tähän", "tällä", "tältä", "tälle", "tänä",
    "täksi", "tuon", "tuota", "tuossa", "tuosta", "tuohon", "tuolla",
    "tuolta", "tuolle", "tuona", "tuoksi", "sitä", "siitä", "siihen",
    "sillä", "siltä", "sille", "sinä", "siksi", "näiden", "näitä",
    "näissä", "näistä", "näihin", "näillä", "näiltä", "näille", "näinä",
    "näiksi", "nuo", "noiden", "noita", "noissa", "noista", "noihin",
    "noilla", "noilta", "noille", "noina", "noiksi", "niiden", "niitä",
    "niissä", "niistä", "niihin", "niillä", "niiltä", "niille", "niinä",
    "niiksi", "kuka", "kenen", "kenet", "ketä", "kenessä", "kenestä",
    "keneen", "kenellä", "keneltä", "kenelle", "kenenä", "keneksi",
    "ketkä", "keiden", "keitä", "keissä", "keistä", "keihin", "keillä",
    "keiltä", "keille", "keinä", "keiksi", "minkä", "mitkä", "jonka",
    "jota", "jossa", "josta", "johon", "jolla", "jolta", "jolle",
    "jona", "joksi", "jotka", "joiden", "joita", "joissa", "joista",
    "joihin", "joilla", "joilta", "joille", "joina", "joiksi", "mihin",
    "millä", "miltä", "mille", "minä", "miksi", "sekä", "vai", "vaikka",
    "mukaan", "noin", "poikki")

  /** Full Snowball hungarian_stop.txt ∪ the core above. */
  val HungarianStopWords: Set[String] = HungarianStopWordsCore ++ Set(
    "ahogy", "ahol", "akik", "alatt", "általában", "amelyek",
    "amelyekben", "amelyeket", "amelyet", "amelynek", "amit", "amolyan",
    "amíg", "amikor", "át", "ahhoz", "annak", "arról", "azzal", "azért",
    "aztán", "azután", "azonban", "bár", "belül", "benne", "cikk",
    "cikkek", "cikkeket", "eddig", "egész", "egyes", "egyetlen",
    "egyéb", "egyik", "egyre", "ekkor", "elég", "ellen", "elő",
    "először", "előtt", "első", "éppen", "ehhez", "emilyen", "ennek",
    "ez", "ezen", "ezzel", "ezért", "hanem", "hiszen", "hogyan",
    "igen", "illetve", "ill", "ilyenkor", "ismét", "jó", "jól",
    "jobban", "kell", "kellett", "keresztül", "keressünk", "kívül",
    "között", "közül", "legalább", "lehet", "lehetett", "legyen",
    "lenne", "lenni", "maga", "magát", "más", "másik", "mellett",
    "mely", "melyek", "mit", "míg", "miért", "milyen", "mikor",
    "minden", "mindent", "mindenki", "mindig", "mintha", "mivel",
    "most", "nagy", "nagyobb", "nagyon", "ne", "néha", "nekem", "neki",
    "néhány", "nélkül", "nincs", "össze", "őket", "persze", "rá", "s",
    "saját", "sem", "semmi", "sok", "sokat", "sokkal", "számára",
    "szemben", "szerint", "szinte", "talán", "tehát", "teljes",
    "tovább", "továbbá", "több", "úgy", "ugyanis", "új", "újabb",
    "újra", "utána", "utolsó", "vagyis", "valaki", "valami", "valamint",
    "való", "vagyok", "vannak", "voltam", "voltak", "voltunk", "vissza",
    "vele", "viszont", "volna")

  val CzechStopWords: Set[String] = Set(
    "a", "v", "se", "na", "je", "že", "o", "s", "z", "do", "i", "to",
    "k", "ve", "pro", "za", "by", "ale", "si", "po", "jako", "podle",
    "od", "jeho", "bude", "nebo", "již", "jen", "byl", "byla", "bylo",
    "což", "být", "před", "také", "jsou", "jsme", "jsem", "při", "až",
    "co", "tak", "má", "když", "než", "který", "která", "které",
    "kteří", "ještě", "ani", "mezi", "tím", "tento", "pak", "u", "ke") ++ Set(
    "aby", "ale", "ani", "ano", "az", "bez",
    "bude", "budem", "budes", "by", "byli", "bylia",
    "byt", "ci", "clanek", "clanku", "clanky", "coz",
    "cz", "dalsi", "design", "dnes", "email", "ho",
    "jak", "jake", "jakmile", "jednim", "jej", "jeji",
    "jejich", "jehoz", "jen", "jenz", "jeste", "ji",
    "jine", "jiz", "jses", "jsi", "jste", "kam",
    "kde", "kdo", "kdyz", "ke", "ktera", "ktere",
    "kteri", "kterou", "ktery", "ku", "ma", "mate",
    "me", "mezi", "mit", "mne", "mnou", "muj",
    "muze", "my", "na", "nad", "nam", "napiste",
    "nas", "nasi", "ne", "nejsou", "nez", "nic",
    "nove", "novy", "o", "od", "ode", "pak",
    "pod", "podle", "pokud", "pouze", "prave", "pred",
    "pres", "pri", "pro", "proc", "proto", "protoze",
    "prvni", "pta", "re", "si", "strana", "sve",
    "svych", "svym", "svymi", "ta", "tak", "takze",
    "tato", "te", "tedy", "ten", "tento", "teto",
    "tim", "timto", "tipy", "to", "tohle", "toho",
    "tohoto", "tom", "tomto", "tomuto", "tu", "tuto",
    "ty", "tyto", "u", "uz", "vam", "vas",
    "vase", "vice", "vsak", "ze", "zda", "zde",
    "zpet", "zpravy", "jsem", "jsou", "jste", "aniž",
    "ať", "během", "bez", "beze", "blízko", "bohužel",
    "brzo", "což", "či", "článek", "článku", "články",
    "dál", "dále", "děkovat", "děkujeme", "děkuji", "dnes",
    "do", "ho", "hodně", "já", "jak", "jde",
    "je", "jedna", "jedno", "jen", "ještě", "jí",
    "jím", "jsme", "k", "každý", "kteří", "kvůli",
    "má", "mají", "málo", "mám", "máme", "máš",
    "mé", "mě", "mezi", "mí", "mít", "mně",
    "mnou", "moc", "mohl", "mohou", "moje", "moji",
    "možná", "můj", "musí", "my", "naše", "naši",
    "nechť", "nejsi", "není", "nestačí", "nevadí", "než",
    "nic", "nové", "nový", "nuže", "ok", "on",
    "ona", "oni", "ono", "ony", "pak", "po",
    "pouze", "práve", "pro", "proč", "prostě", "proti",
    "první", "před", "přes", "přese", "s", "se",
    "skoro", "smí", "smějí", "snad", "spolu", "strana",
    "své", "svých", "svým", "svými", "ta", "tady",
    "tak", "takhle", "taky", "tam", "tamhle", "tamhleto",
    "tamto", "tato", "tebe", "tebou", "ted'", "tedy",
    "ten", "ti", "to", "tobě", "tohle", "toto",
    "třeba", "tu", "tuto", "ty", "tyto", "vám",
    "vámi", "vás", "váš", "vaše", "vaši", "ve",
    "večer", "vedle", "vlastně", "však", "všechno", "vy",
    "vždy", "z", "za", "zač", "zatímco", "ze",
    "že")

  /** BulgarianAnalyzer stop set — the published BulTreeBank-derived list
    * reconstructed (the embedded `Bg/stopwords.txt` resource is absent
    * from this source tree). */
  val BulgarianStopWords: Set[String] = Set(
    "и", "в", "на", "с", "за", "да", "не", "се", "от", "е", "по", "че",
    "като", "но", "си", "той", "тя", "то", "те", "ние", "вие", "аз",
    "ти", "го", "я", "ме", "ни", "ви", "до", "ще", "са", "беше", "бе",
    "това", "тази", "този", "тези", "или", "ако", "само", "след",
    "при", "още", "много", "кой", "която", "което", "които", "им",
    "му", "около", "между", "без", "пред", "съм", "сме", "сте",
    "а", "ала", "би", "бил", "била", "били", "било", "близо", "бъдат",
    "бъде", "бяха", "вас", "ваш", "ваша", "вероятно", "вече", "взема",
    "винаги", "все", "всеки", "всички", "всичко", "всяка", "във",
    "въпреки", "върху", "ги", "главно", "дали", "докато", "докога",
    "дори", "досега", "доста", "едва", "един", "една", "едно", "ето",
    "зад", "заедно", "заради", "засега", "затова", "защо", "защото",
    "из", "има", "имат", "иска", "каза", "как", "каква", "какво",
    "както", "какъв", "кога", "когато", "колко", "къде", "където",
    "към", "ли", "мен", "ми", "мнозина", "мога", "могат", "може",
    "моля", "момента", "над", "назад", "най", "направи", "напред",
    "например", "нас", "него", "нея", "никой", "нито", "някои",
    "някой", "няма", "обаче", "освен", "особено", "отгоре", "отново",
    "пак", "повече", "повечето", "под", "поне", "поради", "после",
    "почти", "прави", "преди", "през", "пък", "първо", "сега",
    "скоро", "според", "сред", "срещу", "така", "такива", "такъв",
    "там", "твой", "тогава", "толкова", "точно", "трябва", "тук",
    "тъй", "тях", "у", "често", "чрез", "щом")

  /** HindiAnalyzer stop set — the published list reconstructed (the
    * embedded `Hi/stopwords.txt` resource is absent from this source
    * tree); matched post-normalization via
    * [[HindiStopWordsNormalized]]. */
  val HindiStopWords: Set[String] = Set(
    "के", "का", "की", "को", "में", "है", "हैं", "और", "से", "पर", "यह",
    "वह", "ने", "कि", "एक", "भी", "था", "थी", "थे", "हो", "गया", "कर",
    "लिए", "अपने", "इस", "उस", "तो", "ही", "कुछ", "जो", "अब", "जब",
    "तक", "साथ", "बाद", "या", "हम", "आप", "वे", "इन", "उन", "दो",
    "होता", "करने", "वाले", "सकता", "बहुत", "नहीं",
    "मे", "किया", "लिये", "अपना", "अपनी", "बनी", "एवं", "दिया",
    "इसका", "इसकी", "इसके", "इसमें", "इसी", "इसे", "द्वारा", "हुआ",
    "हुई", "हुए", "करना", "करता", "करते", "करें", "कहा", "कहते",
    "कई", "कोई", "किसी", "ये", "सबसे", "होने", "होती", "होते",
    "सकते", "वर्ग", "रहा", "रहे", "रखें", "जा", "ना", "न", "व",
    "अभी", "जैसे", "सभी", "उनके", "उनकी", "उनका", "तरह", "आदि",
    "कुल", "यदि", "जिस", "जिन", "तिन", "उसके", "उसकी", "उसी",
    "यहाँ", "वहाँ", "जहाँ", "कौन", "क्या", "क्यों", "मगर", "लेकिन",
    "फिर", "पहले", "भीतर", "बिना", "दूसरे", "इत्यादि", "संग", "ओर",
    "तथा", "अत", "इसलिए", "जिसे", "उसे", "इन्हें", "उन्हें", "इन्हीं",
    "उन्हीं", "मुझे", "हमें", "तुम", "मैं", "मेरा", "हमारा", "उनको",
    "इनका", "जीधर", "किधर", "इधर", "उधर")

  /** FULL in-tree Arabic stop list — all 162 entries of
    * contrib/Analyzers/AR/ArabicStopWords.txt verbatim (surface forms; the
    * chain stops BEFORE normalization, so entries match raw lowercased
    * tokens). */
  val ArabicStopWords: Set[String] = Set(
    "ب", "ا", "أ", "،", "عشر", "عدد", "عدة", "عشرة",
    "عدم", "عام", "عاما", "عن", "عند", "عندما", "على", "عليه",
    "عليها", "زيارة", "سنة", "سنوات", "تم", "ضد", "بعد", "بعض",
    "اعادة", "اعلنت", "بسبب", "حتى", "اذا", "احد", "اثر", "برس",
    "باسم", "غدا", "شخصا", "صباح", "اطار", "اربعة", "اخرى", "بان",
    "اجل", "غير", "بشكل", "حاليا", "بن", "به", "ثم", "اف",
    "ان", "او", "اي", "بها", "صفر", "حيث", "اكد", "الا",
    "اما", "امس", "السابق", "التى", "التي", "اكثر", "ايار", "ايضا",
    "ثلاثة", "الذاتي", "الاخيرة", "الثاني", "الثانية", "الذى", "الذي", "الان",
    "امام", "ايام", "خلال", "حوالى", "الذين", "الاول", "الاولى", "بين",
    "ذلك", "دون", "حول", "حين", "الف", "الى", "انه", "اول",
    "ضمن", "انها", "جميع", "الماضي", "الوقت", "المقبل", "اليوم", "ـ",
    "ف", "و", "و6", "قد", "لا", "ما", "مع", "مساء",
    "هذا", "واحد", "واضاف", "واضافت", "فان", "قبل", "قال", "كان",
    "لدى", "نحو", "هذه", "وان", "واكد", "كانت", "واوضح", "مايو",
    "فى", "في", "كل", "لم", "لن", "له", "من", "هو",
    "هي", "قوة", "كما", "لها", "منذ", "وقد", "ولا", "نفسه",
    "لقاء", "مقابل", "هناك", "وقال", "وكان", "نهاية", "وقالت", "وكانت",
    "للامم", "فيه", "كلم", "لكن", "وفي", "وقف", "ولم", "ومن",
    "وهو", "وهي", "يوم", "فيها", "منها", "مليار", "لوكالة", "يكون",
    "يمكن", "مليون")

  /** Persian stops are matched AFTER normalization (PersianAnalyzer.cs
    * chain order), so the set is stored pre-normalized. The published
    * Savoy CLEF list reconstructed (the embedded `Fa/stopwords.txt`
    * resource is absent from this source tree). */
  val PersianStopWords: Set[String] = Set(
    "و", "در", "به", "از",
    "كه", "اين", "را",
    "با", "است", "براي",
    "آن", "يك", "خود", "تا",
    "بر", "هم", "نيز",
    "اما", "يا", "شد",
    "شده", "هاي", "مي",
    "او", "ما", "شما",
    "آنها", "بود",
    "باشد", "كرد", "هر",
    "بي", "من", "چه", "اگر",
    "ولي", "بين", "پس",
    "نه", "آنچه", "همه", "هيچ", "ديگر", "چون", "چرا", "كجا", "كي",
    "چگونه", "بسيار", "فقط", "بايد", "شايد", "هنوز", "همين", "همان",
    "چند", "كم", "بيش", "بيشتر", "كمتر", "سپس", "سوي", "بدون",
    "درباره", "مانند", "ميان", "بعد", "قبل", "زير", "روي", "كنار",
    "برابر", "طبق", "مثل", "البته", "يعني", "حتي", "مگر", "آيا",
    "بله", "خير", "خويش", "دو", "سه", "چهار", "نيست", "هستند",
    "بودند", "باشند", "كنند", "كند", "كرده", "خواهد", "خواهند",
    "توان", "نمي", "ايم", "ايد", "اند", "وقتي", "زيرا", "چيزي",
    "كسي", "جاي", "داراي", "طور", "گفت", "گويد", "داد", "دارد",
    "داشت", "داشته", "دهد", "شود", "شوند", "گيرد", "رفت", "آمد"
  ).map(t => persianNormalize(arabicNormalize(t)))

  /** Hindi stops are matched AFTER normalization (HindiAnalyzer chain),
    * so the set is stored pre-normalized. */
  val HindiStopWordsNormalized: Set[String] = HindiStopWords.map(hindiNormalize)

  /** Sorani stops are matched after normalization + lowercase
    * (SoraniAnalyzer.cs chain order), stored pre-normalized. */
  val SoraniStopWords: Set[String] = Set(
    "و", "لە", "بە", "بۆ", "کە",
    "ئەم", "ئەو", "ئەوە", "هەر",
    "هەموو", "بەڵام", "وەک",
    "دوای", "پاش", "تا", "لەگەڵ",
    "لەسەر", "ناو", "بوو", "دەبێت",
    "ئەگەر", "چەند", "هیچ", "یان",
    "ئەوان", "ئێمە", "ئێوە", "من", "تۆ", "ئەمە", "چی", "کوا", "چۆن",
    "بۆچی", "کەی", "لێ", "پێ", "جا", "خۆ", "ئەی", "بێ", "بوون",
    "دەکات", "کرد", "کردن", "بکات", "ناب", "نەبوو", "هەبوو", "هەیە",
    "نییە", "دەبوو", "لەبەر", "لەژێر", "لەناو", "لەلایەن", "بەرەو",
    "بەبێ", "بەپێی", "دەگەڵ", "وا", "جار", "کاتێک", "چونکە", "بەڵکو",
    "یاخود", "نەک", "هەتا", "هێشتا", "تەنها", "زۆر", "کەم", "هەندێک",
    "چەندین", "ئیتر", "ئینجا", "دیسان", "هەروەها", "بەم", "بەو",
    "لەم", "لەو", "ئەمانە", "ئەوانە", "خۆی", "خۆیان", "ئێستا", "پێش",
    "دوا", "سەر", "ژێر", "پشت", "بەرامبەر", "نێوان", "دەرەوە",
    "ژوورەوە", "ناوەوە"
  ).map(soraniNormalize)

  /** RomanianAnalyzer stop set — the full published list (both comma-below
    * and cedilla spellings of s/t included — the stemmer normalizes, the
    * stop filter runs on surface forms). */
  val RomanianStopWords: Set[String] = Set(
    "și", "şi", "în", "de", "la", "cu", "pe", "un", "o", "din", "este",
    "sunt", "care", "ce", "se", "sa", "să", "nu", "mai", "dar", "pentru",
    "ca", "că", "au", "fost", "fi", "el", "ea", "lor", "le", "al", "ale",
    "a", "acest", "această", "după", "prin", "dacă", "sau", "când",
    "cînd", "unde", "iar", "până", "pînă", "fără", "asupra", "acelaşi",
    "același") ++ Set(
    "acea", "aceasta", "această", "aceea", "acei", "aceia",
    "acel", "acela", "acele", "acelea", "acest", "acesta",
    "aceste", "acestea", "acești", "aceștia", "acolo", "acum",
    "ai", "aia", "aibă", "aici", "al", "ăla",
    "ale", "alea", "ălea", "altceva", "altcineva", "am",
    "ar", "are", "așadar", "asemenea", "asta", "ăsta",
    "astăzi", "astea", "ăstea", "ăștia", "asupra", "aţi",
    "au", "avea", "avem", "aveţi", "azi", "bine",
    "bucur", "bună", "ca", "că", "căci", "când",
    "care", "cărei", "căror", "cărui", "cât", "câte",
    "câţi", "către", "câtva", "ce", "cel", "ceva",
    "chiar", "cînd", "cine", "cineva", "cît", "cîte",
    "cîţi", "cîtva", "contra", "cu", "cum", "cumva",
    "curând", "curînd", "da", "dă", "dacă", "dar",
    "datorită", "de", "deci", "deja", "deoarece", "departe",
    "deşi", "din", "dinaintea", "dintr", "dintre", "drept",
    "după", "ea", "ei", "el", "ele", "eram",
    "este", "eşti", "eu", "face", "fără", "fi",
    "fie", "fiecare", "fii", "fim", "fiţi", "iar",
    "ieri", "îi", "îl", "îmi", "împotriva", "în",
    "înainte", "înaintea", "încât", "încît", "încotro", "între",
    "întrucât", "întrucît", "îţi", "la", "lângă", "le",
    "li", "lîngă", "lor", "lui", "mă", "mâine",
    "mea", "mei", "mele", "mereu", "meu", "mi",
    "mine", "mult", "multă", "mulţi", "ne", "nicăieri",
    "nici", "nimeni", "nimic", "nişte", "noastră", "noastre",
    "noi", "noştri", "nostru", "nu", "ori", "oricând",
    "oricare", "oricât", "orice", "oricînd", "oricine", "oricît",
    "oricum", "oriunde", "până", "pe", "pentru", "peste",
    "pînă", "poate", "pot", "prea", "prima", "primul",
    "prin", "printr", "sa", "să", "săi", "sale",
    "sau", "său", "se", "şi", "sînt", "sîntem",
    "sînteţi", "spre", "sub", "sunt", "suntem", "sunteţi",
    "ta", "tăi", "tale", "tău", "te", "ţi",
    "ţie", "tine", "toată", "toate", "tot", "toţi",
    "totuşi", "tu", "un", "una", "unde", "undeva",
    "unei", "unele", "uneori", "unor", "vă", "vi",
    "voastră", "voastre", "voi", "voştri", "vostru", "vouă",
    "vreo", "vreun")

  val IndonesianStopWords: Set[String] = Set(
    "yang", "dan", "di", "dari", "ini", "itu", "dengan", "untuk", "pada",
    "ke", "tidak", "ada", "dalam", "akan", "adalah", "atau", "juga",
    "ia", "dia", "mereka", "kita", "kami", "saya", "kamu", "anda",
    "telah", "sudah", "bisa", "karena", "oleh", "saat", "jika",
    "seperti", "sebagai", "tersebut", "harus", "para", "tetapi",
    "namun", "serta", "yaitu", "bahwa", "lebih", "masih", "secara",
    "dapat", "hanya", "antara", "begitu") ++ Set(
    "ada", "adanya", "adalah", "adapun", "agak", "agaknya",
    "agar", "akan", "akankah", "akhirnya", "aku", "akulah",
    "amat", "amatlah", "anda", "andalah", "antar", "diantaranya",
    "antara", "antaranya", "diantara", "apa", "apaan", "mengapa",
    "apabila", "apakah", "apalagi", "apatah", "atau", "ataukah",
    "ataupun", "bagai", "bagaikan", "sebagai", "sebagainya", "bagaimana",
    "bagaimanapun", "sebagaimana", "bagaimanakah", "bagi", "bahkan", "bahwa",
    "bahwasanya", "sebaliknya", "banyak", "sebanyak", "beberapa", "seberapa",
    "begini", "beginian", "beginikah", "beginilah", "sebegini", "begitu",
    "begitukah", "begitulah", "begitupun", "sebegitu", "belum", "belumlah",
    "sebelum", "sebelumnya", "sebenarnya", "berapa", "berapakah", "berapalah",
    "berapapun", "betulkah", "sebetulnya", "biasa", "biasanya", "bila",
    "bilakah", "bisa", "bisakah", "sebisanya", "boleh", "bolehkah",
    "bolehlah", "buat", "bukan", "bukankah", "bukanlah", "bukannya",
    "cuma", "percuma", "dahulu", "dalam", "dan", "dapat",
    "dari", "daripada", "dekat", "demi", "demikian", "demikianlah",
    "sedemikian", "dengan", "depan", "di", "dia", "dialah",
    "dini", "diri", "dirinya", "terdiri", "dong", "dulu",
    "enggak", "enggaknya", "entah", "entahlah", "terhadap", "terhadapnya",
    "hal", "hampir", "hanya", "hanyalah", "harus", "haruslah",
    "harusnya", "seharusnya", "hendak", "hendaklah", "hendaknya", "hingga",
    "sehingga", "ia", "ialah", "ibarat", "ingin", "inginkah",
    "inginkan", "ini", "inikah", "inilah", "itu", "itukah",
    "itulah", "jangan", "jangankan", "janganlah", "jika", "jikalau",
    "juga", "justru", "kala", "kalau", "kalaulah", "kalaupun",
    "kalian", "kami", "kamilah", "kamu", "kamulah", "kan",
    "kapan", "kapankah", "kapanpun", "dikarenakan", "karena", "karenanya",
    "ke", "kecil", "kemudian", "kenapa", "kepada", "kepadanya",
    "ketika", "seketika", "khususnya", "kini", "kinilah", "kiranya",
    "sekiranya", "kita", "kitalah", "kok", "lagi", "lagian",
    "selagi", "lah", "lain", "lainnya", "melainkan", "selaku",
    "lalu", "melalui", "terlalu", "lama", "lamanya", "selama",
    "selamanya", "lebih", "terlebih", "bermacam", "macam", "semacam",
    "maka", "makanya", "makin", "malah", "malahan", "mampu",
    "mampukah", "mana", "manakala", "manalagi", "masih", "masihkah",
    "semasih", "masing", "mau", "maupun", "semaunya", "memang",
    "mereka", "merekalah", "meski", "meskipun", "semula", "mungkin",
    "mungkinkah", "nah", "namun", "nanti", "nantinya", "nyaris",
    "oleh", "olehnya", "seorang", "seseorang", "pada", "padanya",
    "padahal", "paling", "sepanjang", "pantas", "sepantasnya", "sepantasnyalah",
    "para", "pasti", "pastilah", "per", "pernah", "pula",
    "pun", "merupakan", "rupanya", "serupa", "saat", "saatnya",
    "sesaat", "saja", "sajalah", "saling", "bersama", "sama",
    "sesama", "sambil", "sampai", "sana", "sangat", "sangatlah",
    "saya", "sayalah", "se", "sebab", "sebabnya", "sebuah",
    "tersebut", "tersebutlah", "sedang", "sedangkan", "sedikit", "sedikitnya",
    "segala", "segalanya", "segera", "sesegera", "sejak", "sejenak",
    "sekali", "sekalian", "sekalipun", "sesekali", "sekaligus", "sekarang",
    "sekitar", "sekitarnya", "sela", "selain", "selalu", "seluruh",
    "seluruhnya", "semakin", "sementara", "sempat", "semua", "semuanya",
    "sendiri", "sendirinya", "seolah", "seperti", "sepertinya", "sering",
    "seringnya", "serta", "siapa", "siapakah", "siapapun", "disini",
    "disinilah", "sini", "sinilah", "sesuatu", "sesuatunya", "suatu",
    "sesudah", "sesudahnya", "sudah", "sudahkah", "sudahlah", "supaya",
    "tadi", "tadinya", "tak", "tanpa", "setelah", "telah",
    "tentang", "tentu", "tentulah", "tentunya", "tertentu", "seterusnya",
    "tapi", "tetapi", "setiap", "tiap", "setidaknya", "tidak",
    "tidakkah", "tidaklah", "toh", "waduh", "wah", "wahai",
    "sewaktu", "walau", "walaupun", "wong", "yaitu", "yakni",
    "yakin")
}

/** Finnish chain — the FinnishAnalyzer DEFAULT: classic grammar ->
  * lowercase -> Finnish stops -> SnowballFilter(FinnishStemmer)
  * (Analysis/Fi/FinnishAnalyzer.cs createComponents). */
object FinnishAnalyzer extends Analyzer {
  import LangAnalyzers2._
  override def tokenize(text: String): Iterator[Token] =
    LangAnalyzers.StandardNoStop.tokenize(text)
      .filterNot(t => FinnishStopWords.contains(t.term))
      .map(t => t.copy(term = SnowballStemmers.finnishStem(t.term)))
}

/** FinnishLightStemFilter variant (Savoy CLEF-2003) — the directory's
  * light-stemmer catalog member. */
object FinnishLightAnalyzer extends Analyzer {
  import LangAnalyzers2._
  override def tokenize(text: String): Iterator[Token] =
    LangAnalyzers.StandardNoStop.tokenize(text)
      .filterNot(t => FinnishStopWords.contains(t.term))
      .map(t => t.copy(term = finnishLightStem(t.term)))
}

/** Hungarian chain — the HungarianAnalyzer DEFAULT: classic grammar ->
  * lowercase -> Hungarian stops -> SnowballFilter(HungarianStemmer)
  * (Analysis/Hu/HungarianAnalyzer.cs createComponents). */
object HungarianAnalyzer extends Analyzer {
  import LangAnalyzers2._
  override def tokenize(text: String): Iterator[Token] =
    LangAnalyzers.StandardNoStop.tokenize(text)
      .filterNot(t => HungarianStopWords.contains(t.term))
      .map(t => t.copy(term = SnowballStemmers.hungarianStem(t.term)))
}

/** HungarianLightStemFilter variant (Savoy UniNE) — the directory's
  * light-stemmer catalog member. */
object HungarianLightAnalyzer extends Analyzer {
  import LangAnalyzers2._
  override def tokenize(text: String): Iterator[Token] =
    LangAnalyzers.StandardNoStop.tokenize(text)
      .filterNot(t => HungarianStopWords.contains(t.term))
      .map(t => t.copy(term = hungarianLightStem(t.term)))
}

/** Czech chain: classic grammar -> lowercase -> Czech stops ->
  * CzechStemFilter (Analysis/Cz/CzechAnalyzer.cs createComponents — the
  * reference default chain). */
object CzechAnalyzer extends Analyzer {
  import LangAnalyzers2._
  override def tokenize(text: String): Iterator[Token] =
    LangAnalyzers.StandardNoStop.tokenize(text)
      .filterNot(t => CzechStopWords.contains(t.term))
      .map(t => t.copy(term = czechStem(t.term)))
}

/** Bulgarian chain: classic grammar -> lowercase -> Bulgarian stops ->
  * BulgarianStemFilter (Analysis/Bg/BulgarianAnalyzer.cs default chain). */
object BulgarianAnalyzer extends Analyzer {
  import LangAnalyzers2._
  override def tokenize(text: String): Iterator[Token] =
    LangAnalyzers.StandardNoStop.tokenize(text)
      .filterNot(t => BulgarianStopWords.contains(t.term))
      .map(t => t.copy(term = bulgarianStem(t.term)))
}

/** Hindi chain: letter-or-mark tokenize -> lowercase -> Hindi
  * normalization -> stops -> HindiStemFilter (Analysis/Hi/HindiAnalyzer
  * chain; the IndicNormalizationFilter script-composition table is not
  * replicated — documented gap). */
object HindiAnalyzer extends Analyzer {
  import LangAnalyzers2._
  override def tokenize(text: String): Iterator[Token] =
    letterOrMarkTokenize(text)
      .map(t => t.copy(term = hindiNormalize(t.term)))
      .filterNot(t => HindiStopWordsNormalized.contains(t.term))
      .map(t => t.copy(term = hindiStem(t.term)))
}

/** Arabic chain: letter-or-mark tokenize (ArabicLetterTokenizer) ->
  * lowercase -> Arabic stops (surface forms) -> Arabic normalization ->
  * ArabicStemFilter (Analysis/Ar/ArabicAnalyzer.cs chain order: stop
  * BEFORE normalization). */
object ArabicAnalyzer extends Analyzer {
  import LangAnalyzers2._
  override def tokenize(text: String): Iterator[Token] =
    letterOrMarkTokenize(text)
      .filterNot(t => ArabicStopWords.contains(t.term))
      .map(t => t.copy(term = arabicStem(arabicNormalize(t.term))))
}

/** Persian chain: letter-or-mark tokenize -> lowercase -> Arabic
  * normalization -> Persian normalization -> stops (normalized forms;
  * Analysis/Fa/PersianAnalyzer.cs chain order: stop AFTER normalization;
  * no stemmer by design). */
object PersianAnalyzer extends Analyzer {
  import LangAnalyzers2._
  override def tokenize(text: String): Iterator[Token] =
    // PersianCharFilter.cs: ZWNJ becomes a space BEFORE tokenization
    // (same-length replace keeps offsets exact)
    letterOrMarkTokenize(text.replace('‌', ' '))
      .map(t => t.copy(term = persianNormalize(arabicNormalize(t.term))))
      .filterNot(t => PersianStopWords.contains(t.term))
}

/** Romanian chain — the RomanianAnalyzer default (its only stemmer):
  * classic grammar -> lowercase -> Romanian stops ->
  * SnowballFilter(RomanianStemmer) (Analysis/Ro/RomanianAnalyzer.cs). */
object RomanianAnalyzer extends Analyzer {
  import LangAnalyzers2._
  override def tokenize(text: String): Iterator[Token] =
    LangAnalyzers.StandardNoStop.tokenize(text)
      .filterNot(t => RomanianStopWords.contains(t.term))
      .map(t => t.copy(term = SnowballStemmers.romanianStem(t.term)))
}

/** Thai chain: classic grammar (Thai runs emit as single tokens) ->
  * lowercase -> BreakIterator word segmentation -> Thai stops
  * (Analysis/Th/ThaiAnalyzer.cs chain with ThaiWordFilter). */
object ThaiAnalyzer extends Analyzer {
  import LangAnalyzers2._
  override def tokenize(text: String): Iterator[Token] =
    thaiWordSplit(LangAnalyzers.StandardNoStop.tokenize(text))
      .filterNot(t => ThaiStopWords.contains(t.term))
}

/** Sorani Kurdish chain: letter-or-mark tokenize -> Sorani normalization
  * -> lowercase -> stops -> SoraniStemFilter (Analysis/Ckb/
  * SoraniAnalyzer.cs chain order: normalize BEFORE stop/stem). */
object SoraniAnalyzer extends Analyzer {
  import LangAnalyzers2._
  override def tokenize(text: String): Iterator[Token] =
    letterOrMarkTokenize(text)
      .map(t => t.copy(term = soraniNormalize(t.term)))
      .filterNot(t => SoraniStopWords.contains(t.term))
      .map(t => t.copy(term = soraniStem(t.term)))
}

/** Indonesian chain: classic grammar -> lowercase -> Indonesian stops ->
  * IndonesianStemFilter with derivational stemming (Analysis/Id/
  * IndonesianAnalyzer.cs default chain). */
object IndonesianAnalyzer extends Analyzer {
  import LangAnalyzers2._
  override def tokenize(text: String): Iterator[Token] =
    LangAnalyzers.StandardNoStop.tokenize(text)
      .filterNot(t => IndonesianStopWords.contains(t.term))
      .map(t => t.copy(term = indonesianStem(t.term)))
}
