package graft.analysis

/** Per-language analyzer catalog — the Lucene.Net.Analysis.Common language
  * packages re-expressed as token-iterator combinators over the classic
  * grammar. Implemented members (each stemmer is a fresh implementation of
  * Jacques Savoy's published UniNE light/minimal stemming algorithms, the
  * same sources the reference cites):
  *
  *  - GermanAnalyzer (Analysis/De/GermanAnalyzer.cs:165-181 chain):
  *    classic tokenizer -> lowercase -> German stop set ->
  *    GermanNormalizationFilter -> GermanLightStemmer.
  *  - FrenchAnalyzer, minimal-stem variant (Analysis/Fr/FrenchAnalyzer.cs
  *    chain with FrenchMinimalStemmer in place of the default light
  *    stemmer — documented subset): classic tokenizer -> elision ->
  *    lowercase -> French stop set -> FrenchMinimalStemmer.
  *
  * Tokens carry ABSOLUTE positions, so dropping a stopword intrinsically
  * preserves its position gap (the StopFilter skippedPositions contract).
  */
object LangAnalyzers {

  /** Classic grammar + StandardFilter + LowerCase with NO stop filter —
    * the shared front of every language chain. */
  private[analysis] object StandardNoStop extends Analyzer {
    override def tokenize(text: String): Iterator[Token] = new Iterator[Token] {
      private val raw = ClassicScanner.scan(text)
      private var pos = -1
      private var pendingIncr = 0
      private var nextTok: Token = null
      advance()
      private def advance(): Unit = {
        nextTok = null
        while (nextTok == null && raw.hasNext) {
          val r0 = raw.next()
          if (r0.end - r0.start > StandardAnalyzer.MaxTokenLength) pendingIncr += 1
          else {
            val r = StandardAnalyzer.standardFilter(r0)
            pos += 1 + pendingIncr
            pendingIncr = 0
            nextTok = Token(StandardAnalyzer.lowerCase(r.text), pos, r.start, r.end, r.tokenType)
          }
        }
      }
      override def hasNext: Boolean = nextTok != null
      override def next(): Token = { val t = nextTok; advance(); t }
    }
  }

  /** German stop words (Analysis/De/GermanAnalyzer.cs:69 GERMAN_STOP_WORDS —
    * replicated constants, required for match identity). */
  private val GermanStopWordsCore: Set[String] = Set(
    "einer", "eine", "eines", "einem", "einen", "der", "die", "das", "dass",
    "daß", "du", "er", "sie", "es", "was", "wer", "wie", "wir", "und",
    "oder", "ohne", "mit", "am", "im", "in", "aus", "auf", "ist", "sein",
    "war", "wird", "ihr", "ihre", "ihres", "als", "für", "von", "dich",
    "dir", "mich", "mir", "mein", "kein", "durch", "wegen")

  /** French stop words (Analysis/Fr/FrenchAnalyzer.cs:71 FRENCH_STOP_WORDS —
    * replicated constants). */
  val FrenchStopWords: Set[String] = Set(
    "a", "afin", "ai", "ainsi", "après", "attendu", "au", "aujourd",
    "auquel", "aussi", "autre", "autres", "aux", "auxquelles", "auxquels",
    "avait", "avant", "avec", "avoir", "c", "car", "ce", "ceci", "cela",
    "celle", "celles", "celui", "cependant", "certain", "certaine",
    "certaines", "certains", "ces", "cet", "cette", "ceux", "chez", "ci",
    "combien", "comme", "comment", "concernant", "contre", "d", "dans",
    "de", "debout", "dedans", "dehors", "delà", "depuis", "derrière",
    "des", "désormais", "desquelles", "desquels", "dessous", "dessus",
    "devant", "devers", "devra", "divers", "diverse", "diverses", "doit",
    "donc", "dont", "du", "duquel", "durant", "dès", "elle", "elles", "en",
    "entre", "environ", "est", "et", "etc", "etre", "eu", "eux", "excepté",
    "hormis", "hors", "hélas", "hui", "il", "ils", "j", "je", "jusqu",
    "jusque", "l", "la", "laquelle", "le", "lequel", "les", "lesquelles",
    "lesquels", "leur", "leurs", "lorsque", "lui", "là", "ma", "mais",
    "malgré", "me", "merci", "mes", "mien", "mienne", "miennes", "miens",
    "moi", "moins", "mon", "moyennant", "même", "mêmes", "n", "ne", "ni",
    "non", "nos", "notre", "nous", "néanmoins", "nôtre", "nôtres", "on",
    "ont", "ou", "outre", "où", "par", "parmi", "partant", "pas", "passé",
    "pendant", "plein", "plus", "plusieurs", "pour", "pourquoi", "proche",
    "près", "puisque", "qu", "quand", "que", "quel", "quelle", "quelles",
    "quels", "qui", "quoi", "quoique", "revoici", "revoilà", "s", "sa",
    "sans", "sauf", "se", "selon", "seront", "ses", "si", "sien", "sienne",
    "siennes", "siens", "sinon", "soi", "soit", "son", "sont", "sous",
    "suivant", "sur", "ta", "te", "tes", "tien", "tienne", "tiennes",
    "tiens", "toi", "ton", "tous", "tout", "toute", "toutes", "tu", "un",
    "une", "va", "vers", "voici", "voilà", "vos", "votre", "vous", "vu",
    "vôtre", "vôtres", "y", "à", "ça", "ès", "été", "être", "ô")

  /** Elision articles (FrenchAnalyzer.cs:79 DEFAULT_ARTICLES). */
  val FrenchArticles: Set[String] = Set(
    "l", "m", "t", "qu", "n", "s", "j", "d", "c",
    "jusqu", "quoiqu", "lorsqu", "puisqu")

  /** GermanNormalizationFilter (Analysis/De/GermanNormalizationFilter.cs:
    * 47-116): the German2 snowball normalization — fold umlauts to their
    * base vowel, ß -> ss, and delete 'e' of 'ue'/'ae'/'oe' digraphs when in
    * the umlaut state (a/o always arm it; 'u' arms it only from the
    * ordinary state; i/q/y and folded umlauts suppress it). */
  def germanNormalize(term: String): String = {
    val N = 0; val V = 1; val U = 2
    val sb = new StringBuilder
    var state = N
    var i = 0
    while (i < term.length) {
      val c = term.charAt(i)
      c match {
        case 'a' | 'o' => sb.append(c); state = U
        case 'u' => sb.append(c); state = if (state == N) U else V
        case 'e' =>
          if (state == U) () // delete the 'e' of the digraph
          else sb.append(c)
          state = V
        case 'i' | 'q' | 'y' => sb.append(c); state = V
        case 'ä' => sb.append('a'); state = V
        case 'ö' => sb.append('o'); state = V
        case 'ü' => sb.append('u'); state = V
        case 'ß' => sb.append('s').append('s'); state = N
        case other => sb.append(other); state = N
      }
      i += 1
    }
    sb.toString
  }

  /** GermanLightStemmer (Analysis/De/GermanLightStemmer.cs:66-175; Savoy's
    * UniNE light German algorithm): fold accented vowels, then two suffix
    * steps. */
  def germanLightStem(term0: String): String = {
    val folded = term0.map {
      case 'ä' | 'à' | 'á' | 'â' => 'a'
      case 'ö' | 'ò' | 'ó' | 'ô' => 'o'
      case 'ï' | 'ì' | 'í' | 'î' => 'i'
      case 'ü' | 'ù' | 'ú' | 'û' => 'u'
      case c => c
    }
    def stEnding(ch: Char): Boolean = "bdfghklmnt".indexOf(ch) >= 0
    def step1(s: String): String = {
      val len = s.length
      if (len > 5 && s.endsWith("ern")) s.dropRight(3)
      else if (len > 4 && len >= 2 && s.charAt(len - 2) == 'e' &&
               "mnrs".indexOf(s.charAt(len - 1)) >= 0) s.dropRight(2)
      else if (len > 3 && s.charAt(len - 1) == 'e') s.dropRight(1)
      else if (len > 3 && s.charAt(len - 1) == 's' && stEnding(s.charAt(len - 2)))
        s.dropRight(1)
      else s
    }
    def step2(s: String): String = {
      val len = s.length
      if (len > 5 && s.endsWith("est")) s.dropRight(3)
      else if (len > 4 && s.charAt(len - 2) == 'e' &&
               (s.charAt(len - 1) == 'r' || s.charAt(len - 1) == 'n')) s.dropRight(2)
      else if (len > 4 && s.endsWith("st") && stEnding(s.charAt(len - 3))) s.dropRight(2)
      else s
    }
    step2(step1(folded))
  }

  /** FrenchMinimalStemmer (Analysis/Fr/FrenchMinimalStemmer.cs:68-108;
    * Savoy's minimal French algorithm): aux -> al, then strip final
    * s / r / e / é and a doubled final letter, words of length >= 6 only. */
  def frenchMinimalStem(term: String): String = {
    if (term.length < 6) return term
    val buf = term.toCharArray
    var len = buf.length
    if (buf(len - 1) == 'x') {
      if (buf(len - 3) == 'a' && buf(len - 2) == 'u') buf(len - 2) = 'l'
      len -= 1
      return new String(buf, 0, len)
    }
    if (buf(len - 1) == 's') len -= 1
    if (buf(len - 1) == 'r') len -= 1
    if (buf(len - 1) == 'e') len -= 1
    if (buf(len - 1) == 'é') len -= 1
    if (len >= 2 && buf(len - 1) == buf(len - 2)) len -= 1
    new String(buf, 0, len)
  }

  /** FrenchLightStemmer (Analysis/Fr/FrenchLightStemmer.cs:66-300; Savoy's
    * UniNE light French algorithm, the FrenchAnalyzer default): plural /
    * derivational suffix rewrites (x, s, issement->ir, ateur->er,
    * trice->teur, ique, euse, ive->if, ...) followed by `norm` — accent
    * folding, adjacent-duplicate collapse, -ie strip and final r/e/e/dup
    * trimming, all gated on length > 4. */
  def frenchLightStem(term: String): String = {
    var s = term.toCharArray
    var len = s.length
    def endsWith(suf: String): Boolean =
      len >= suf.length && (0 until suf.length).forall(i => s(len - suf.length + i) == suf(i))
    def norm(): String = {
      if (len > 4) {
        var i = 0
        while (i < len) {
          s(i) match {
            case 'à' | 'á' | 'â' => s(i) = 'a'
            case 'ô' => s(i) = 'o'
            case 'è' | 'é' | 'ê' => s(i) = 'e'
            case 'ù' | 'û' => s(i) = 'u'
            case 'î' => s(i) = 'i'
            case 'ç' => s(i) = 'c'
            case _ =>
          }
          i += 1
        }
        // collapse runs of a repeated letter to one occurrence
        var ch = s(0)
        i = 1
        while (i < len) {
          if (s(i) == ch && Character.isLetter(ch)) {
            System.arraycopy(s, i + 1, s, i, len - i - 1)
            len -= 1
          } else { ch = s(i); i += 1 }
        }
      }
      if (len > 4 && endsWith("ie")) len -= 2
      if (len > 4) {
        if (s(len - 1) == 'r') len -= 1
        if (s(len - 1) == 'e') len -= 1
        if (s(len - 1) == 'e') len -= 1
        if (s(len - 1) == s(len - 2) && Character.isLetter(s(len - 1))) len -= 1
      }
      new String(s, 0, len)
    }

    if (len > 5 && s(len - 1) == 'x') {
      if (s(len - 3) == 'a' && s(len - 2) == 'u' && s(len - 4) != 'e') s(len - 2) = 'l'
      len -= 1
    }
    if (len > 3 && s(len - 1) == 'x') len -= 1
    if (len > 3 && s(len - 1) == 's') len -= 1
    if (len > 9 && endsWith("issement")) { len -= 6; s(len - 1) = 'r'; return norm() }
    if (len > 8 && endsWith("issant")) { len -= 4; s(len - 1) = 'r'; return norm() }
    if (len > 6 && endsWith("ement")) {
      len -= 4
      if (len > 3 && endsWith("ive")) { len -= 1; s(len - 1) = 'f' }
      return norm()
    }
    if (len > 11 && endsWith("ficatrice")) { len -= 5; s(len - 2) = 'e'; s(len - 1) = 'r'; return norm() }
    if (len > 10 && endsWith("ficateur")) { len -= 4; s(len - 2) = 'e'; s(len - 1) = 'r'; return norm() }
    if (len > 9 && endsWith("catrice")) { len -= 3; s(len - 4) = 'q'; s(len - 3) = 'u'; s(len - 2) = 'e'; return norm() }
    if (len > 8 && endsWith("cateur")) { len -= 2; s(len - 4) = 'q'; s(len - 3) = 'u'; s(len - 2) = 'e'; s(len - 1) = 'r'; return norm() }
    if (len > 8 && endsWith("atrice")) { len -= 4; s(len - 2) = 'e'; s(len - 1) = 'r'; return norm() }
    if (len > 7 && endsWith("ateur")) { len -= 3; s(len - 2) = 'e'; s(len - 1) = 'r'; return norm() }
    if (len > 6 && endsWith("trice")) { len -= 1; s(len - 3) = 'e'; s(len - 2) = 'u'; s(len - 1) = 'r' }
    if (len > 5 && endsWith("ième")) { len -= 4; return norm() }
    if (len > 7 && endsWith("teuse")) { len -= 2; s(len - 1) = 'r'; return norm() }
    if (len > 6 && endsWith("teur")) { len -= 1; s(len - 1) = 'r'; return norm() }
    if (len > 5 && endsWith("euse")) { len -= 2; return norm() }
    if (len > 8 && endsWith("ère")) { len -= 1; s(len - 2) = 'e'; return norm() }
    if (len > 7 && endsWith("ive")) { len -= 1; s(len - 1) = 'f'; return norm() }
    if (len > 4 && (endsWith("folle") || endsWith("molle"))) { len -= 2; s(len - 1) = 'u'; return norm() }
    if (len > 9 && endsWith("nnelle")) { len -= 5; return norm() }
    if (len > 9 && endsWith("nnel")) { len -= 3; return norm() }
    if (len > 4 && endsWith("ète")) { len -= 1; s(len - 2) = 'e' }
    if (len > 8 && endsWith("ique")) len -= 4
    if (len > 8 && endsWith("esse")) { len -= 3; return norm() }
    if (len > 7 && endsWith("inage")) { len -= 3; return norm() }
    if (len > 9 && endsWith("isation")) {
      len -= 7
      if (len > 5 && endsWith("ual")) s(len - 2) = 'e'
      return norm()
    }
    if (len > 9 && endsWith("isateur")) { len -= 7; return norm() }
    if (len > 8 && endsWith("ation")) { len -= 5; return norm() }
    if (len > 8 && endsWith("ition")) { len -= 5; return norm() }
    norm()
  }

  /** Spanish stop words: the function-word core (determiners, pronouns,
    * prepositions, conjunctions) of the Snowball spanish_stop.txt the
    * reference loads as an embedded resource
    * (Analysis/Es/SpanishAnalyzer.cs:55 DEFAULT_STOPWORD_FILE — the file is
    * absent from this source tree). DOCUMENTED SUBSET: the Snowball list's
    * long estar/haber/ser/tener conjugation tail is omitted. */
  private val SpanishStopWordsCore: Set[String] = Set(
    "de", "la", "que", "el", "en", "y", "a", "los", "del", "se", "las",
    "por", "un", "para", "con", "no", "una", "su", "al", "lo", "como",
    "más", "pero", "sus", "le", "ya", "o", "este", "sí", "porque", "esta",
    "entre", "cuando", "muy", "sin", "sobre", "también", "me", "hasta",
    "hay", "donde", "quien", "desde", "todo", "nos", "durante", "todos",
    "uno", "les", "ni", "contra", "otros", "ese", "eso", "ante", "ellos",
    "e", "esto", "mí", "antes", "algunos", "qué", "unos", "yo", "otro",
    "otras", "otra", "él", "tanto", "esa", "estos", "mucho", "quienes",
    "nada", "muchos", "cual", "poco", "ella", "estar", "estas", "algunas",
    "algo", "nosotros", "mi", "mis", "tú", "te", "ti", "tu", "tus",
    "ellas", "nosotras", "vosotros", "vosotras", "os", "mío", "mía",
    "míos", "mías", "tuyo", "tuya", "tuyos", "tuyas", "suyo", "suya",
    "suyos", "suyas", "nuestro", "nuestra", "nuestros", "nuestras",
    "vuestro", "vuestra", "vuestros", "vuestras", "esos", "esas")

  /** SpanishLightStemmer (Analysis/Es/SpanishLightStemmer.cs:57-135;
    * Savoy's UniNE light Spanish algorithm): words >= 5 chars fold accented
    * vowels, then strip a final o/a/e, or -s after a vowel (with the
    * -eses -> -es and -ces -> -z special cases). Words < 5 chars return
    * UNCHANGED (the reference's early return precedes the folding loop). */
  def spanishLightStem(term: String): String = {
    if (term.length < 5) return term
    val s = term.toCharArray
    var i = 0
    while (i < s.length) {
      s(i) match {
        case 'à' | 'á' | 'â' | 'ä' => s(i) = 'a'
        case 'ò' | 'ó' | 'ô' | 'ö' => s(i) = 'o'
        case 'è' | 'é' | 'ê' | 'ë' => s(i) = 'e'
        case 'ù' | 'ú' | 'û' | 'ü' => s(i) = 'u'
        case 'ì' | 'í' | 'î' | 'ï' => s(i) = 'i'
        case _ =>
      }
      i += 1
    }
    val len = s.length
    s(len - 1) match {
      case 'o' | 'a' | 'e' => new String(s, 0, len - 1)
      case 's' =>
        if (s(len - 2) == 'e' && s(len - 3) == 's' && s(len - 4) == 'e')
          new String(s, 0, len - 2)
        else if (s(len - 2) == 'e' && s(len - 3) == 'c') {
          s(len - 3) = 'z'
          new String(s, 0, len - 2)
        } else if (s(len - 2) == 'o' || s(len - 2) == 'a' || s(len - 2) == 'e')
          new String(s, 0, len - 2)
        else new String(s, 0, len)
      case _ => new String(s, 0, len)
    }
  }

  /** ElisionFilter (Analysis/Util/ElisionFilter.cs + FrenchAnalyzer
    * DEFAULT_ARTICLES): strip a leading article + apostrophe
    * (l'histoire -> histoire). */
  def elide(term: String): String = {
    val i = term.indexOf('\'')
    if (i > 0 && FrenchArticles.contains(term.substring(0, i)))
      term.substring(i + 1)
    else term
  }

  /** Italian stop words: function-word core of the Snowball
    * italian_stop.txt (ItalianAnalyzer.cs DEFAULT_STOPWORD_FILE — embedded
    * resource absent from this tree; the conjugation tail of
    * essere/avere/stare/fare is omitted, a DOCUMENTED SUBSET). */
  private val ItalianStopWordsCore: Set[String] = Set(
    "di", "a", "da", "in", "con", "su", "per", "tra", "fra", "il", "lo",
    "la", "i", "gli", "le", "un", "uno", "una", "e", "ed", "o", "ma", "se",
    "perché", "che", "chi", "cui", "non", "più", "quale", "quanto",
    "quanti", "quanta", "quante", "quello", "quelli", "quella", "quelle",
    "questo", "questi", "questa", "queste", "si", "tutto", "tutti",
    "anche", "come", "dove", "dal", "dallo", "dalla", "dai", "dagli",
    "dalle", "del", "dello", "della", "dei", "degli", "delle", "nel",
    "nello", "nella", "nei", "negli", "nelle", "sul", "sullo", "sulla",
    "sui", "sugli", "sulle", "al", "allo", "alla", "ai", "agli", "alle",
    "io", "tu", "lui", "lei", "noi", "voi", "loro", "mio", "mia", "miei",
    "mie", "tuo", "tua", "tuoi", "tue", "suo", "sua", "suoi", "sue",
    "nostro", "nostra", "nostri", "nostre", "vostro", "vostra", "vostri",
    "vostre", "ci", "vi", "ne", "già", "qui", "quindi", "sono", "è")

  /** Italian elision articles (ItalianAnalyzer.cs:60 DEFAULT_ARTICLES). */
  val ItalianArticles: Set[String] = Set(
    "c", "l", "all", "dall", "dell", "nell", "sull", "coll", "pell",
    "gl", "agl", "dagl", "degl", "negl", "sugl", "un", "m", "t", "s",
    "v", "d")

  /** Portuguese stop words: function-word core of the Snowball
    * portuguese_stop.txt (PortugueseAnalyzer DEFAULT_STOPWORD_FILE —
    * embedded resource absent; ser/estar/ter/haver conjugation tail
    * omitted, a DOCUMENTED SUBSET). */
  private val PortugueseStopWordsCore: Set[String] = Set(
    "de", "a", "o", "que", "e", "do", "da", "em", "um", "para", "é",
    "com", "não", "uma", "os", "no", "se", "na", "por", "mais", "as",
    "dos", "como", "mas", "foi", "ao", "ele", "das", "tem", "à", "seu",
    "sua", "ou", "ser", "quando", "muito", "há", "nos", "já", "está",
    "eu", "também", "só", "pelo", "pela", "até", "isso", "ela", "entre",
    "era", "depois", "sem", "mesmo", "aos", "ter", "seus", "quem", "nas",
    "me", "esse", "eles", "estão", "você", "essa", "num", "nem", "suas",
    "meu", "às", "minha", "numa", "pelos", "elas", "qual", "nós", "lhe",
    "deles", "essas", "esses", "pelas", "este", "dele", "tu", "te",
    "vocês", "vos", "lhes", "meus", "minhas", "teu", "tua", "teus",
    "tuas", "nosso", "nossa", "nossos", "nossas", "dela", "delas",
    "esta", "estes", "estas", "aquele", "aquela", "aqueles", "aquelas",
    "isto", "aquilo")

  /** ItalianLightStemmer (Analysis/It/ItalianLightStemmer.cs:57-152;
    * Savoy's UniNE light Italian algorithm): words >= 6 chars fold
    * accented vowels, then strip a final vowel — two chars when preceded
    * by i (or h for e/i endings). Shorter words return unchanged. */
  def italianLightStem(term: String): String = {
    if (term.length < 6) return term
    val s = term.toCharArray
    var i = 0
    while (i < s.length) {
      s(i) match {
        case 'à' | 'á' | 'â' | 'ä' => s(i) = 'a'
        case 'ò' | 'ó' | 'ô' | 'ö' => s(i) = 'o'
        case 'è' | 'é' | 'ê' | 'ë' => s(i) = 'e'
        case 'ù' | 'ú' | 'û' | 'ü' => s(i) = 'u'
        case 'ì' | 'í' | 'î' | 'ï' => s(i) = 'i'
        case _ =>
      }
      i += 1
    }
    val len = s.length
    s(len - 1) match {
      case 'e' =>
        if (s(len - 2) == 'i' || s(len - 2) == 'h') new String(s, 0, len - 2)
        else new String(s, 0, len - 1)
      case 'i' =>
        if (s(len - 2) == 'h' || s(len - 2) == 'i') new String(s, 0, len - 2)
        else new String(s, 0, len - 1)
      case 'a' | 'o' =>
        if (s(len - 2) == 'i') new String(s, 0, len - 2)
        else new String(s, 0, len - 1)
      case _ => new String(s, 0, len)
    }
  }

  /** PortugueseLightStemmer (Analysis/Pt/PortugueseLightStemmer.cs:57-250;
    * Savoy's UniNE light Portuguese algorithm): plural suffix removal
    * (-es after r/s/l/z, -ns -> -m, -eis/-ais/-óis -> -el/-al/-ol,
    * -is -> -il, -ões/-ães -> -ão, -mente, bare -s), feminine
    * normalization on a final 'a' (-inha/-osa/-ica/... -> masculine),
    * final-vowel strip, then accent folding (ç -> c included). Words < 4
    * chars return unchanged. */
  def portugueseLightStem(term: String): String = {
    if (term.length < 4) return term
    val s0 = term.toCharArray
    val s = java.util.Arrays.copyOf(s0, s0.length)
    var len = s.length
    def ends(suf: String): Boolean =
      len >= suf.length && (0 until suf.length).forall(i => s(len - suf.length + i) == suf(i))

    // removeSuffix (:141-196)
    if (len > 4 && ends("es") && "rslz".indexOf(s(len - 3)) >= 0) len -= 2
    else if (len > 3 && ends("ns")) { s(len - 2) = 'm'; len -= 1 }
    else if (len > 4 && (ends("eis") || ends("éis"))) { s(len - 3) = 'e'; s(len - 2) = 'l'; len -= 1 }
    else if (len > 4 && ends("ais")) { s(len - 2) = 'l'; len -= 1 }
    else if (len > 4 && ends("óis")) { s(len - 3) = 'o'; s(len - 2) = 'l'; len -= 1 }
    else if (len > 4 && ends("is")) s(len - 1) = 'l'
    else if (len > 3 && (ends("ões") || ends("ães"))) { len -= 1; s(len - 2) = 'ã'; s(len - 1) = 'o' }
    else if (len > 6 && ends("mente")) len -= 5
    else if (len > 3 && s(len - 1) == 's') len -= 1

    // normFeminine (:197-246), only on a final 'a'
    if (len > 3 && s(len - 1) == 'a') {
      if (len > 7 && (ends("inha") || ends("iaca") || ends("eira"))) s(len - 1) = 'o'
      else if (len > 6) {
        if (ends("osa") || ends("ica") || ends("ida") || ends("ada") ||
          ends("iva") || ends("ama")) s(len - 1) = 'o'
        else if (ends("ona")) { s(len - 3) = 'ã'; s(len - 2) = 'o'; len -= 1 }
        else if (ends("ora")) len -= 1
        else if (ends("esa")) { s(len - 3) = 'ê'; len -= 1 }
        else if (ends("na")) s(len - 1) = 'o'
      }
    }

    if (len > 4 && (s(len - 1) == 'e' || s(len - 1) == 'a' || s(len - 1) == 'o')) len -= 1

    var i = 0
    while (i < len) {
      s(i) match {
        case 'à' | 'á' | 'â' | 'ä' | 'ã' => s(i) = 'a'
        case 'ò' | 'ó' | 'ô' | 'ö' | 'õ' => s(i) = 'o'
        case 'è' | 'é' | 'ê' | 'ë' => s(i) = 'e'
        case 'ù' | 'ú' | 'û' | 'ü' => s(i) = 'u'
        case 'ì' | 'í' | 'î' | 'ï' => s(i) = 'i'
        case 'ç' => s(i) = 'c'
        case _ =>
      }
      i += 1
    }
    new String(s, 0, len)
  }

  /** Italian elision (ElisionFilter + ItalianAnalyzer.cs:60 articles):
    * dell'arte -> arte. */
  def elideItalian(term: String): String = {
    val i = term.indexOf('\'')
    if (i > 0 && ItalianArticles.contains(term.substring(0, i)))
      term.substring(i + 1)
    else term
  }

  /** Dutch stop words: function-word core of the Snowball dutch_stop.txt
    * (Analysis/Nl/DutchAnalyzer.cs DEFAULT_STOPWORD_FILE — embedded
    * resource absent from this tree; a DOCUMENTED SUBSET like the Spanish/
    * Italian sets). */
  val DutchStopWords: Set[String] = Set(
    "de", "en", "van", "ik", "te", "dat", "die", "in", "een", "hij",
    "het", "niet", "zijn", "is", "was", "op", "aan", "met", "als", "voor",
    "had", "er", "maar", "om", "hem", "dan", "zou", "of", "wat", "mijn",
    "men", "dit", "zo", "door", "over", "ze", "zich", "bij", "ook", "tot",
    "je", "mij", "uit", "der", "daar", "haar", "naar", "heb", "hoe",
    "heeft", "hebben", "deze", "u", "want", "nog", "zal", "me", "zij",
    "nu", "ge", "geen", "omdat", "iets", "worden", "toch", "al", "waren",
    "veel", "meer", "doen", "toen", "moet", "ben", "zonder", "kan", "hun",
    "dus", "alles", "onder", "ja", "eens", "hier", "wie", "werd",
    "altijd", "doch", "wordt", "wezen", "kunnen", "ons", "zelf", "tegen",
    "na", "reeds", "wil", "kon", "niets", "uw", "iemand", "geweest",
    "kunt")

  /** Swedish stop words: function-word core of the Snowball
    * swedish_stop.txt (Analysis/Sv/SwedishAnalyzer DEFAULT_STOPWORD_FILE —
    * embedded resource absent; DOCUMENTED SUBSET). */
  val SwedishStopWords: Set[String] = Set(
    "och", "det", "att", "i", "en", "jag", "hon", "som", "han", "på",
    "den", "med", "var", "sig", "för", "så", "till", "är", "men", "ett",
    "om", "hade", "de", "av", "icke", "mig", "du", "henne", "då", "sin",
    "nu", "har", "inte", "hans", "honom", "skulle", "hennes", "där",
    "min", "man", "ej", "vid", "kunde", "något", "från", "ut", "när",
    "efter", "upp", "vi", "dem", "vara", "vad", "över", "än", "dig",
    "kan", "sina", "här", "ha", "mot", "alla", "under", "någon", "eller",
    "allt", "mycket", "sedan", "ju", "denna", "själv", "detta", "åt",
    "utan", "varit", "hur", "ingen", "mitt", "ni", "bli", "blev", "oss",
    "din", "dessa", "några", "deras", "blir", "mina", "samma", "vilken",
    "er", "sådan", "vår", "blivit", "dess", "inom", "mellan", "sådant",
    "varför", "varje", "vilka", "ditt", "vem", "vilket", "sitta",
    "sådana", "vart", "dina", "vars", "vårt", "våra", "ert", "era",
    "vilkas")

  /** Danish stop words: function-word core of the Snowball danish_stop.txt
    * (Analysis/Da/DanishAnalyzer DEFAULT_STOPWORD_FILE — embedded resource
    * absent; DOCUMENTED SUBSET). */
  val DanishStopWords: Set[String] = Set(
    "og", "i", "jeg", "det", "at", "en", "den", "til", "er", "som", "på",
    "de", "med", "han", "af", "for", "ikke", "der", "var", "mig", "sig",
    "men", "et", "har", "om", "vi", "min", "havde", "ham", "hun", "nu",
    "over", "da", "fra", "du", "ud", "sin", "dem", "os", "op", "man",
    "hans", "hvor", "eller", "hvad", "skal", "selv", "her", "alle", "vil",
    "blev", "kunne", "ind", "når", "være", "dog", "noget", "ville", "jo",
    "deres", "efter", "ned", "skulle", "denne", "end", "dette", "mit",
    "også", "under", "have", "dig", "anden", "hende", "mine", "alt",
    "meget", "sit", "sine", "vor", "mod", "disse", "hvis", "din", "nogle",
    "hos", "blive", "mange", "ad", "bliver", "hendes", "været", "thi",
    "jer", "sådan")

  /** Norwegian stop words: function-word core of the Snowball
    * norwegian_stop.txt (Analysis/No/NorwegianAnalyzer; DOCUMENTED
    * SUBSET). */
  private val NorwegianStopWordsCore: Set[String] = Set(
    "og", "i", "jeg", "det", "at", "en", "et", "den", "til", "er", "som",
    "på", "de", "med", "han", "av", "ikke", "ikkje", "der", "så", "var",
    "meg", "seg", "men", "ett", "har", "om", "vi", "min", "mitt", "ha",
    "hadde", "hun", "nå", "over", "da", "ved", "fra", "du", "ut", "sin",
    "dem", "oss", "opp", "man", "kan", "hans", "hvor", "eller", "hva",
    "skal", "selv", "sjøl", "her", "alle", "vil", "bli", "ble", "blei",
    "blitt", "kunne", "inn", "når", "være", "kom", "noen", "noe", "ville",
    "dere", "deres", "kun", "ja", "etter", "ned", "skulle", "denne",
    "for", "deg", "si", "sine", "sitt", "mot", "å", "meget", "hvorfor",
    "dette", "disse", "uten", "hvordan", "ingen", "din", "ditt", "blir",
    "samme", "hvilken", "hvilke", "sånn", "inni", "mellom", "vår", "hver",
    "hvem", "vors", "hvis", "både", "bare", "enn", "fordi", "før", "mange",
    "også", "slik", "vært", "begge", "siden", "dykk", "dykkar", "dei",
    "deira", "deires", "deim", "di", "då", "eg", "ein", "eit", "eitt",
    "elles", "honom", "hjå", "ho", "hoe", "henne", "hennar", "hennes")

  /** Russian stop words: function-word core of the Snowball
    * russian_stop.txt (Analysis/Ru/RussianAnalyzer.cs stop set;
    * DOCUMENTED SUBSET). */
  private val RussianStopWordsCore: Set[String] = Set(
    "и", "в", "во", "не", "что", "он", "на", "я", "с", "со", "как", "а",
    "то", "все", "она", "так", "его", "но", "да", "ты", "к", "у", "же",
    "вы", "за", "бы", "по", "только", "ее", "мне", "было", "вот", "от",
    "меня", "еще", "нет", "о", "из", "ему", "теперь", "когда", "даже",
    "ну", "вдруг", "ли", "если", "уже", "или", "ни", "быть", "был",
    "него", "до", "вас", "нибудь", "опять", "уж", "вам", "ведь", "там",
    "потом", "себя", "ничего", "ей", "может", "они", "тут", "где",
    "есть", "надо", "ней", "для", "мы", "тебя", "их", "чем", "была",
    "сам", "чтоб", "без", "будто", "чего", "раз", "тоже", "себе", "под",
    "будет", "ж", "тогда", "кто", "этот")

  // ------------------------------------------------------ full stop sets
  // The 4.8 analyzers default to the Snowball project's <lang>_stop.txt
  // word lists (GermanAnalyzer.cs:73 DEFAULT_STOPWORD_FILE etc. — the .txt
  // resources are NOT in the reference tree; they load at build time).
  // These are the published snowballstem.org lists (public domain),
  // unioned with the 3.x contrib inline constants above so both shipped
  // variants' words stop.

  /** Full Snowball german_stop.txt ∪ contrib GERMAN_STOP_WORDS. */
  val GermanStopWords: Set[String] = GermanStopWordsCore ++ Set(
    "aber", "alle", "allem", "allen", "aller", "alles", "also", "an",
    "ander", "andere", "anderem", "anderen", "anderer", "anderes",
    "anderm", "andern", "anderr", "anders", "auch", "bei", "bin", "bis",
    "bist", "da", "damit", "dann", "den", "des", "dem", "derselbe",
    "derselben", "denselben", "desselben", "demselben", "dieselbe",
    "dieselben", "dasselbe", "dazu", "dein", "deine", "deinem", "deinen",
    "deiner", "deines", "denn", "derer", "dessen", "dies", "diese",
    "diesem", "diesen", "dieser", "dieses", "doch", "dort", "ein",
    "einig", "einige", "einigem", "einigen", "einiger", "einiges",
    "einmal", "ihn", "ihm", "etwas", "euer", "eure", "eurem", "euren",
    "eurer", "eures", "gegen", "gewesen", "hab", "habe", "haben", "hat",
    "hatte", "hatten", "hier", "hin", "hinter", "ich", "ihrem", "ihren",
    "euch", "indem", "ins", "jede", "jedem", "jeden", "jeder", "jedes",
    "jene", "jenem", "jenen", "jener", "jenes", "jetzt", "kann", "keine",
    "keinem", "keinen", "keiner", "keines", "können", "könnte", "machen",
    "man", "manche", "manchem", "manchen", "mancher", "manches", "meine",
    "meinem", "meinen", "meiner", "meines", "muss", "musste", "nach",
    "nicht", "nichts", "noch", "nun", "nur", "ob", "sehr", "seine",
    "seinem", "seinen", "seiner", "seines", "selbst", "sich", "ihnen",
    "sind", "so", "solche", "solchem", "solchen", "solcher", "solches",
    "soll", "sollte", "sondern", "sonst", "über", "um", "uns", "unse",
    "unsem", "unsen", "unser", "unses", "unter", "viel", "vom", "vor",
    "während", "waren", "warst", "weg", "weil", "weiter", "welche",
    "welchem", "welchen", "welcher", "welches", "wenn", "werde", "werden",
    "wieder", "will", "wirst", "wo", "wollen", "wollte", "würde",
    "würden", "zu", "zum", "zur", "zwar", "zwischen")

  /** Full Snowball spanish_stop.txt ∪ contrib constants. */
  val SpanishStopWords: Set[String] = SpanishStopWordsCore ++ Set(
    "de", "la", "que", "el", "en", "y", "a", "los", "del", "se", "las",
    "por", "un", "para", "con", "no", "una", "su", "al", "lo", "como",
    "más", "pero", "sus", "le", "ya", "o", "este", "sí", "porque",
    "esta", "entre", "cuando", "muy", "sin", "sobre", "también", "me",
    "hasta", "hay", "donde", "quien", "desde", "todo", "nos", "durante",
    "todos", "uno", "les", "ni", "contra", "otros", "ese", "eso", "ante",
    "ellos", "e", "esto", "mí", "antes", "algunos", "qué", "unos", "yo",
    "otro", "otras", "otra", "él", "tanto", "esa", "estos", "mucho",
    "quienes", "nada", "muchos", "cual", "poco", "ella", "estar",
    "estas", "algunas", "algo", "nosotros", "mi", "mis", "tú", "te",
    "ti", "tu", "tus", "ellas", "nosotras", "vosotros", "vosotras",
    "os", "mío", "mía", "míos", "mías", "tuyo", "tuya", "tuyos",
    "tuyas", "suyo", "suya", "suyos", "suyas", "nuestro", "nuestra",
    "nuestros", "nuestras", "vuestro", "vuestra", "vuestros",
    "vuestras", "esos", "esas", "estoy", "estás", "está", "estamos",
    "estáis", "están", "esté", "estés", "estemos", "estéis", "estén",
    "estaré", "estarás", "estará", "estaremos", "estaréis", "estarán",
    "estaría", "estarías", "estaríamos", "estaríais", "estarían",
    "estaba", "estabas", "estábamos", "estabais", "estaban", "estuve",
    "estuviste", "estuvo", "estuvimos", "estuvisteis", "estuvieron",
    "estuviera", "estuvieras", "estuviéramos", "estuvierais",
    "estuvieran", "estuviese", "estuvieses", "estuviésemos",
    "estuvieseis", "estuviesen", "estando", "estado", "estada",
    "estados", "estadas", "estad", "he", "has", "ha", "hemos", "habéis",
    "han", "haya", "hayas", "hayamos", "hayáis", "hayan", "habré",
    "habrás", "habrá", "habremos", "habréis", "habrán", "habría",
    "habrías", "habríamos", "habríais", "habrían", "había", "habías",
    "habíamos", "habíais", "habían", "hube", "hubiste", "hubo",
    "hubimos", "hubisteis", "hubieron", "hubiera", "hubieras",
    "hubiéramos", "hubierais", "hubieran", "hubiese", "hubieses",
    "hubiésemos", "hubieseis", "hubiesen", "habiendo", "habido",
    "habida", "habidos", "habidas", "soy", "eres", "es", "somos",
    "sois", "son", "sea", "seas", "seamos", "seáis", "sean", "seré",
    "serás", "será", "seremos", "seréis", "serán", "sería", "serías",
    "seríamos", "seríais", "serían", "era", "eras", "éramos", "erais",
    "eran", "fui", "fuiste", "fue", "fuimos", "fuisteis", "fueron",
    "fuera", "fueras", "fuéramos", "fuerais", "fueran", "fuese",
    "fueses", "fuésemos", "fueseis", "fuesen", "siendo", "sido",
    "tengo", "tienes", "tiene", "tenemos", "tenéis", "tienen", "tenga",
    "tengas", "tengamos", "tengáis", "tengan", "tendré", "tendrás",
    "tendrá", "tendremos", "tendréis", "tendrán", "tendría", "tendrías",
    "tendríamos", "tendríais", "tendrían", "tenía", "tenías",
    "teníamos", "teníais", "tenían", "tuve", "tuviste", "tuvo",
    "tuvimos", "tuvisteis", "tuvieron", "tuviera", "tuvieras",
    "tuviéramos", "tuvierais", "tuvieran", "tuviese", "tuvieses",
    "tuviésemos", "tuvieseis", "tuviesen", "teniendo", "tenido",
    "tenida", "tenidos", "tenidas", "tened")

  /** Full Snowball italian_stop.txt ∪ contrib constants. */
  val ItalianStopWords: Set[String] = ItalianStopWordsCore ++ Set(
    "ad", "al", "allo", "ai", "agli", "all", "agl", "alla", "alle",
    "con", "col", "coi", "da", "dal", "dallo", "dai", "dagli", "dall",
    "dagl", "dalla", "dalle", "di", "del", "dello", "dei", "degli",
    "dell", "degl", "della", "delle", "in", "nel", "nello", "nei",
    "negli", "nell", "negl", "nella", "nelle", "su", "sul", "sullo",
    "sui", "sugli", "sull", "sugl", "sulla", "sulle", "per", "tra",
    "contro", "io", "tu", "lui", "lei", "noi", "voi", "loro", "mio",
    "mia", "miei", "mie", "tuo", "tua", "tuoi", "tue", "suo", "sua",
    "suoi", "sue", "nostro", "nostra", "nostri", "nostre", "vostro",
    "vostra", "vostri", "vostre", "mi", "ti", "ci", "vi", "lo", "la",
    "li", "le", "gli", "ne", "il", "un", "uno", "una", "ma", "ed",
    "se", "perché", "anche", "come", "dov", "dove", "che", "chi",
    "cui", "non", "più", "quale", "quanto", "quanti", "quanta",
    "quante", "quello", "quelli", "quella", "quelle", "questo",
    "questi", "questa", "queste", "si", "tutto", "tutti", "a", "c",
    "e", "i", "l", "o", "ho", "hai", "ha", "abbiamo", "avete", "hanno",
    "abbia", "abbiate", "abbiano", "avrò", "avrai", "avrà", "avremo",
    "avrete", "avranno", "avrei", "avresti", "avrebbe", "avremmo",
    "avreste", "avrebbero", "avevo", "avevi", "aveva", "avevamo",
    "avevate", "avevano", "ebbi", "avesti", "ebbe", "avemmo", "aveste",
    "ebbero", "avessi", "avesse", "avessimo", "avessero", "avendo",
    "avuto", "avuta", "avuti", "avute", "sono", "sei", "è", "siamo",
    "siete", "sia", "siate", "siano", "sarò", "sarai", "sarà",
    "saremo", "sarete", "saranno", "sarei", "saresti", "sarebbe",
    "saremmo", "sareste", "sarebbero", "ero", "eri", "era", "eravamo",
    "eravate", "erano", "fui", "fosti", "fu", "fummo", "foste",
    "furono", "fossi", "fosse", "fossimo", "fossero", "essendo",
    "faccio", "fai", "facciamo", "fanno", "faccia", "facciate",
    "facciano", "farò", "farai", "farà", "faremo", "farete", "faranno",
    "farei", "faresti", "farebbe", "faremmo", "fareste", "farebbero",
    "facevo", "facevi", "faceva", "facevamo", "facevate", "facevano",
    "feci", "facesti", "fece", "facemmo", "faceste", "fecero",
    "facessi", "facesse", "facessimo", "facessero", "facendo", "sto",
    "stai", "sta", "stiamo", "stanno", "stia", "stiate", "stiano",
    "starò", "starai", "starà", "staremo", "starete", "staranno",
    "starei", "staresti", "starebbe", "staremmo", "stareste",
    "starebbero", "stavo", "stavi", "stava", "stavamo", "stavate",
    "stavano", "stetti", "stesti", "stette", "stemmo", "steste",
    "stettero", "stessi", "stesse", "stessimo", "stessero", "stando")

  /** Full Snowball portuguese_stop.txt ∪ contrib constants. */
  val PortugueseStopWords: Set[String] = PortugueseStopWordsCore ++ Set(
    "de", "a", "o", "que", "e", "do", "da", "em", "um", "para", "é",
    "com", "não", "uma", "os", "no", "se", "na", "por", "mais", "as",
    "dos", "como", "mas", "foi", "ao", "ele", "das", "tem", "à", "seu",
    "sua", "ou", "ser", "quando", "muito", "há", "nos", "já", "está",
    "eu", "também", "só", "pelo", "pela", "até", "isso", "ela",
    "entre", "era", "depois", "sem", "mesmo", "aos", "ter", "seus",
    "quem", "nas", "me", "esse", "eles", "estão", "você", "tinha",
    "foram", "essa", "num", "nem", "suas", "meu", "às", "minha",
    "têm", "numa", "pelos", "elas", "havia", "seja", "qual", "será",
    "nós", "tenho", "lhe", "deles", "essas", "esses", "pelas", "este",
    "fosse", "dele", "tu", "te", "vocês", "vos", "lhes", "meus",
    "minhas", "teu", "tua", "teus", "tuas", "nosso", "nossa",
    "nossos", "nossas", "dela", "delas", "esta", "estes", "estas",
    "aquele", "aquela", "aqueles", "aquelas", "isto", "aquilo",
    "estou", "estamos", "estive", "esteve", "estivemos", "estiveram",
    "estava", "estávamos", "estavam", "estivera", "estivéramos",
    "esteja", "estejamos", "estejam", "estivesse", "estivéssemos",
    "estivessem", "estiver", "estivermos", "estiverem", "hei",
    "havemos", "hão", "houve", "houvemos", "houveram", "houvera",
    "houvéramos", "haja", "hajamos", "hajam", "houvesse",
    "houvéssemos", "houvessem", "houver", "houvermos", "houverem",
    "houverei", "houverá", "houveremos", "houverão", "houveria",
    "houveríamos", "houveriam", "sou", "somos", "são", "éramos",
    "eram", "fui", "fomos", "fora", "fôramos", "sejamos", "sejam",
    "fôssemos", "fossem", "for", "formos", "forem", "serei",
    "seremos", "serão", "seria", "seríamos", "seriam", "temos",
    "tém", "tínhamos", "tinham", "tive", "teve", "tivemos",
    "tiveram", "tivera", "tivéramos", "tenha", "tenhamos", "tenham",
    "tivesse", "tivéssemos", "tivessem", "tiver", "tivermos",
    "tiverem", "terei", "terá", "teremos", "terão", "teria",
    "teríamos", "teriam")

  /** Full Snowball russian_stop.txt ∪ contrib constants. */
  val RussianStopWords: Set[String] = RussianStopWordsCore ++ Set(
    "того", "потому", "этого", "какой", "совсем", "ним", "здесь",
    "этом", "один", "почти", "мой", "тем", "чтобы", "нее", "сейчас",
    "были", "куда", "зачем", "всех", "никогда", "можно", "при",
    "наконец", "два", "об", "другой", "хоть", "после", "над",
    "больше", "тот", "через", "эти", "нас", "про", "всего", "них",
    "какая", "много", "разве", "три", "эту", "моя", "впрочем",
    "хорошо", "свою", "этой", "перед", "иногда", "лучше", "чуть",
    "том", "нельзя", "такой", "им", "более", "всегда", "конечно",
    "всю", "между")

  /** Full Snowball norwegian_stop.txt ∪ contrib constants (bokmål +
    * nynorsk forms). */
  val NorwegianStopWords: Set[String] = NorwegianStopWordsCore ++ Set(
    "og", "i", "jeg", "det", "at", "en", "et", "den", "til", "er",
    "som", "på", "de", "med", "han", "av", "ikke", "ikkje", "der",
    "så", "var", "meg", "seg", "men", "ett", "har", "om", "vi",
    "min", "mitt", "ha", "hadde", "hun", "nå", "over", "da", "ved",
    "fra", "du", "ut", "sin", "dem", "oss", "opp", "man", "kan",
    "hans", "hvor", "eller", "hva", "skal", "selv", "sjøl", "her",
    "alle", "vil", "bli", "ble", "blei", "blitt", "kunne", "inn",
    "når", "være", "kom", "noen", "noe", "ville", "dere", "deres",
    "kun", "ja", "etter", "ned", "skulle", "denne", "for", "deg",
    "si", "sine", "sitt", "mot", "å", "meget", "hvorfor", "dette",
    "disse", "uten", "hvordan", "ingen", "din", "ditt", "blir",
    "samme", "hvilken", "hvilke", "sånn", "inni", "mellom", "vår",
    "hver", "hvem", "vors", "hvis", "både", "bare", "enn", "fordi",
    "før", "mange", "også", "slik", "vært", "båe", "begge", "siden",
    "dykk", "dykkar", "dei", "deira", "deires", "deim", "di", "då",
    "eg", "ein", "eit", "eitt", "elles", "honom", "hjå", "ho", "hoe",
    "henne", "hennar", "hennes", "hoss", "hossen", "ingi", "inkje",
    "korleis", "korso", "kva", "kvar", "kvarhelst", "kven", "kvi",
    "kvifor", "me", "medan", "mi", "mine", "mykje", "no", "nokon",
    "noka", "nokor", "noko", "nokre", "sia", "sidan", "so", "somt",
    "somme", "um", "upp", "vere", "vore", "verte", "vort", "varte",
    "vart")
}

/** German chain: classic grammar -> lowercase -> German stops ->
  * normalization -> light stem (GermanAnalyzer.cs:165-181). */
object GermanAnalyzer extends Analyzer {
  import LangAnalyzers._
  override def tokenize(text: String): Iterator[Token] =
    StandardNoStop.tokenize(text)
      .filterNot(t => GermanStopWords.contains(t.term))
      .map(t => t.copy(term = germanLightStem(germanNormalize(t.term))))
}

/** SnowballAnalyzer("German") chain: classic grammar -> lowercase ->
  * German stops -> full Snowball GermanStemmer (contrib/Snowball/
  * SnowballAnalyzer + SF/Snowball/Ext/GermanStemmer.cs). Distinct from
  * [[GermanAnalyzer]], which keeps the De analyzer default (normalize +
  * Savoy light stem). */
object GermanSnowballAnalyzer extends Analyzer {
  import LangAnalyzers._
  override def tokenize(text: String): Iterator[Token] =
    StandardNoStop.tokenize(text)
      .filterNot(t => GermanStopWords.contains(t.term))
      .map(t => t.copy(term = SnowballStemmers3.germanStem(t.term)))
}

/** SnowballAnalyzer("German2") chain — the ae/oe/ue-folding Snowball
  * variant (SF/Snowball/Ext/German2Stemmer.cs). */
object German2SnowballAnalyzer extends Analyzer {
  import LangAnalyzers._
  override def tokenize(text: String): Iterator[Token] =
    StandardNoStop.tokenize(text)
      .filterNot(t => GermanStopWords.contains(t.term))
      .map(t => t.copy(term = SnowballStemmers3.german2Stem(t.term)))
}

/** French chain: classic grammar -> elision -> lowercase -> French stops ->
  * LIGHT stem (FrenchAnalyzer.cs default chain with FrenchLightStemFilter). */
object FrenchAnalyzer extends Analyzer {
  import LangAnalyzers._
  override def tokenize(text: String): Iterator[Token] =
    StandardNoStop.tokenize(text)
      .map(t => t.copy(term = elide(t.term)))
      .filterNot(t => FrenchStopWords.contains(t.term))
      .map(t => t.copy(term = frenchLightStem(t.term)))
}

/** French minimal-stem variant (FrenchMinimalStemFilter catalog entry). */
object FrenchMinimalAnalyzer extends Analyzer {
  import LangAnalyzers._
  override def tokenize(text: String): Iterator[Token] =
    StandardNoStop.tokenize(text)
      .map(t => t.copy(term = elide(t.term)))
      .filterNot(t => FrenchStopWords.contains(t.term))
      .map(t => t.copy(term = frenchMinimalStem(t.term)))
}

/** Spanish chain: classic grammar -> lowercase -> Spanish stops ->
  * light stem (Analysis/Es/SpanishAnalyzer.cs:131-146 chain with the
  * default SpanishLightStemFilter). */
object SpanishAnalyzer extends Analyzer {
  import LangAnalyzers._
  override def tokenize(text: String): Iterator[Token] =
    StandardNoStop.tokenize(text)
      .filterNot(t => SpanishStopWords.contains(t.term))
      .map(t => t.copy(term = spanishLightStem(t.term)))
}

/** SnowballAnalyzer("Spanish") chain — the full Snowball program
  * (SF/Snowball/Ext/SpanishStemmer.cs), distinct from [[SpanishAnalyzer]]'s
  * Savoy light stem default. */
object SpanishSnowballAnalyzer extends Analyzer {
  import LangAnalyzers._
  override def tokenize(text: String): Iterator[Token] =
    StandardNoStop.tokenize(text)
      .filterNot(t => SpanishStopWords.contains(t.term))
      .map(t => t.copy(term = SnowballStemmers3.spanishStem(t.term)))
}

/** Italian chain: classic grammar -> elision (Italian articles) ->
  * lowercase -> Italian stops -> light stem (Analysis/It/
  * ItalianAnalyzer.cs createComponents chain). */
object ItalianAnalyzer extends Analyzer {
  import LangAnalyzers._
  override def tokenize(text: String): Iterator[Token] =
    StandardNoStop.tokenize(text)
      .map(t => t.copy(term = elideItalian(t.term)))
      .filterNot(t => ItalianStopWords.contains(t.term))
      .map(t => t.copy(term = italianLightStem(t.term)))
}

/** SnowballAnalyzer("Italian") chain — the full Snowball program
  * (SF/Snowball/Ext/ItalianStemmer.cs); no elision, per the contrib
  * SnowballAnalyzer's plain classic->lowercase->stop->stem pipeline. */
object ItalianSnowballAnalyzer extends Analyzer {
  import LangAnalyzers._
  override def tokenize(text: String): Iterator[Token] =
    StandardNoStop.tokenize(text)
      .filterNot(t => ItalianStopWords.contains(t.term))
      .map(t => t.copy(term = SnowballStemmers3.italianStem(t.term)))
}

/** Portuguese chain: classic grammar -> lowercase -> Portuguese stops ->
  * light stem (Analysis/Pt/PortugueseAnalyzer createComponents chain with
  * the default PortugueseLightStemFilter). */
object PortugueseAnalyzer extends Analyzer {
  import LangAnalyzers._
  override def tokenize(text: String): Iterator[Token] =
    StandardNoStop.tokenize(text)
      .filterNot(t => PortugueseStopWords.contains(t.term))
      .map(t => t.copy(term = portugueseLightStem(t.term)))
}

/** SnowballAnalyzer("Portuguese") chain — the full Snowball program
  * (SF/Snowball/Ext/PortugueseStemmer.cs), distinct from
  * [[PortugueseAnalyzer]]'s Savoy light stem default. */
object PortugueseSnowballAnalyzer extends Analyzer {
  import LangAnalyzers._
  override def tokenize(text: String): Iterator[Token] =
    StandardNoStop.tokenize(text)
      .filterNot(t => PortugueseStopWords.contains(t.term))
      .map(t => t.copy(term = SnowballStemmers3.portugueseStem(t.term)))
}

/** SnowballAnalyzer("French") chain — the full Snowball program
  * (SF/Snowball/Ext/FrenchStemmer.cs); no elision, per the contrib
  * SnowballAnalyzer's plain classic->lowercase->stop->stem pipeline
  * (distinct from [[FrenchAnalyzer]]'s elision + Savoy light default). */
object FrenchSnowballAnalyzer extends Analyzer {
  import LangAnalyzers._
  override def tokenize(text: String): Iterator[Token] =
    StandardNoStop.tokenize(text)
      .filterNot(t => FrenchStopWords.contains(t.term))
      .map(t => t.copy(term = SnowballStemmers3.frenchStem(t.term)))
}

/** SnowballAnalyzer("Porter") chain — the generated classic-1980 Porter
  * program (SF/Snowball/Ext/PorterStemmer.cs), distinct from Porter2 in
  * [[EnglishSnowballAnalyzer]] and from the core En/PorterStemmer default
  * of [[EnglishAnalyzer]] (same algorithm, Snowball Y-marking rendering). */
object PorterSnowballAnalyzer extends Analyzer {
  override def tokenize(text: String): Iterator[Token] =
    LangAnalyzers.StandardNoStop.tokenize(text)
      .filterNot(t => StandardAnalyzer.EnglishStopWords.contains(t.term))
      .map(t => t.copy(term = SnowballStemmers3.snowballPorter(t.term)))
}

/** SnowballAnalyzer("Lovins") chain — the Lovins (1968) program
  * (SF/Snowball/Ext/LovinsStemmer.cs). */
object LovinsSnowballAnalyzer extends Analyzer {
  override def tokenize(text: String): Iterator[Token] =
    LangAnalyzers.StandardNoStop.tokenize(text)
      .filterNot(t => StandardAnalyzer.EnglishStopWords.contains(t.term))
      .map(t => t.copy(term = SnowballStemmers3.lovinsStem(t.term)))
}

/** SnowballAnalyzer("Kp") chain — the Kraaij-Pohlmann Dutch program
  * (SF/Snowball/Ext/KpStemmer.cs); Dutch stop set, per the contrib
  * SnowballAnalyzer's user-supplied-stops convention. */
object KpSnowballAnalyzer extends Analyzer {
  import LangAnalyzers._
  override def tokenize(text: String): Iterator[Token] =
    StandardNoStop.tokenize(text)
      .filterNot(t => DutchStopWords.contains(t.term))
      .map(t => t.copy(term = SnowballStemmers3.kpStem(t.term)))
}

/** SNOWBALL English (Porter2) chain: classic grammar -> possessive strip
  * (StandardFilter) -> lowercase -> English stops -> EnglishStemmer — the
  * SnowballAnalyzer("English") / SnowballFilter(EnglishStemmer) chain
  * (Analysis/Snowball/SnowballAnalyzer.cs + SnowballFilter.cs; the
  * generated Tartarus EnglishStemmer implements the same published Porter2
  * algorithm). Distinct from [[EnglishAnalyzer]], which keeps the
  * reference's EnglishAnalyzer default of classic Porter (1980). */
object EnglishSnowballAnalyzer extends Analyzer {
  override def tokenize(text: String): Iterator[Token] =
    LangAnalyzers.StandardNoStop.tokenize(text)
      .filterNot(t => StandardAnalyzer.EnglishStopWords.contains(t.term))
      .map(t => t.copy(term = SnowballStemmers.porter2(t.term)))
}

/** Dutch chain: classic grammar -> lowercase -> Dutch stops -> Snowball
  * DutchStemmer (Analysis/Nl/DutchAnalyzer.cs createComponents:
  * StandardTokenizer -> LowerCase -> Stop -> StemOverride(empty here) ->
  * SnowballFilter(DutchStemmer)). */
object DutchAnalyzer extends Analyzer {
  import LangAnalyzers._
  override def tokenize(text: String): Iterator[Token] =
    StandardNoStop.tokenize(text)
      .filterNot(t => DutchStopWords.contains(t.term))
      .map(t => t.copy(term = SnowballStemmers.dutchStem(t.term)))
}

/** Swedish chain: classic grammar -> lowercase -> Swedish stops -> Snowball
  * SwedishStemmer (Analysis/Sv/SwedishAnalyzer createComponents; the
  * analyzer default SwedishLightStemFilter is Savoy's light variant — we
  * ship the full Snowball algorithm, the SnowballFilter catalog member). */
object SwedishAnalyzer extends Analyzer {
  import LangAnalyzers._
  override def tokenize(text: String): Iterator[Token] =
    StandardNoStop.tokenize(text)
      .filterNot(t => SwedishStopWords.contains(t.term))
      .map(t => t.copy(term = SnowballStemmers.swedishStem(t.term)))
}

/** Russian chain: classic grammar -> lowercase -> Russian stops -> Snowball
  * RussianStemmer (Analysis/Ru/RussianAnalyzer.cs createComponents:
  * StandardTokenizer -> LowerCase -> Stop -> SnowballFilter(RussianStemmer)). */
object RussianAnalyzer extends Analyzer {
  import LangAnalyzers._
  override def tokenize(text: String): Iterator[Token] =
    StandardNoStop.tokenize(text)
      .filterNot(t => RussianStopWords.contains(t.term))
      .map(t => t.copy(term = SnowballStemmers.russianStem(t.term)))
}

/** Danish chain: classic grammar -> lowercase -> Danish stops -> Snowball
  * DanishStemmer (Analysis/Da/DanishAnalyzer createComponents). */
object DanishAnalyzer extends Analyzer {
  import LangAnalyzers._
  override def tokenize(text: String): Iterator[Token] =
    StandardNoStop.tokenize(text)
      .filterNot(t => DanishStopWords.contains(t.term))
      .map(t => t.copy(term = SnowballStemmers.danishStem(t.term)))
}

/** Norwegian chain: classic grammar -> lowercase -> Norwegian stops ->
  * Snowball NorwegianStemmer (Analysis/No/NorwegianAnalyzer
  * createComponents). */
object NorwegianAnalyzer extends Analyzer {
  import LangAnalyzers._
  override def tokenize(text: String): Iterator[Token] =
    StandardNoStop.tokenize(text)
      .filterNot(t => NorwegianStopWords.contains(t.term))
      .map(t => t.copy(term = SnowballStemmers.norwegianStem(t.term)))
}

/** CJK chain — the CJKAnalyzer (Analysis/Cjk/CJKAnalyzer.cs:
  * StandardTokenizer -> CJKWidthFilter -> LowerCase -> CJKBigramFilter ->
  * StopFilter): runs of adjacent CJK characters (the classic grammar emits
  * them as single-char CJ tokens) combine into overlapping BIGRAMS —
  * "数据系统" indexes as 数据/据系/系统 — while non-CJK tokens pass through
  * lowercased; a lone CJK char between non-CJK text stays a unigram
  * (CJKBigramFilter outputUnigrams-for-singletons behavior). Positions are
  * renumbered over the bigram stream (each run of n chars occupies n-1
  * positions), then English stopwords drop WITH their position gaps
  * (the reference's StopFilter runs after the bigrammer too). */
object CjkAnalyzer extends Analyzer {
  override def tokenize(text: String): Iterator[Token] = {
    val base = LangAnalyzers.StandardNoStop.tokenize(text).toArray
    val out = scala.collection.mutable.ArrayBuffer.empty[Token]
    var pos = -1
    var i = 0
    while (i < base.length) {
      val t = base(i)
      if (t.tokenType == TokenType.CJ) {
        var j = i
        while (j + 1 < base.length && base(j + 1).tokenType == TokenType.CJ &&
          base(j + 1).position == base(j).position + 1 &&
          base(j + 1).startOffset == base(j).endOffset) j += 1
        if (j == i) { pos += 1; out += t.copy(position = pos) }
        else {
          var k = i
          while (k < j) {
            pos += 1
            out += Token(base(k).term + base(k + 1).term, pos,
              base(k).startOffset, base(k + 1).endOffset, TokenType.CJ)
            k += 1
          }
        }
        i = j + 1
      } else {
        pos += 1
        out += t.copy(position = pos)
        i += 1
      }
    }
    out.iterator.filterNot(t => StandardAnalyzer.EnglishStopWords.contains(t.term))
  }
}
