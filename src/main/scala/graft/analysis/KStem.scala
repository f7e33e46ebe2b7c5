package graft.analysis

/** KStem — Krovetz's dictionary-backed morphological stemmer, the reference's
  * En/KStemmer.cs (a conversion of Bob Krovetz' kstem, "Viewing Morphology as
  * an Inference Process", SIGIR'93). Unlike Porter, every suffix rule PROPOSES
  * a transformation and a dictionary lookup decides whether to accept it, so
  * the output is (mostly) a real word.
  *
  * Faithfulness notes (vs /root/reference/src/Lucene.Net.Analysis.Common/
  * Analysis/En/KStemmer.cs):
  *  - The rule set, rule ORDER, and the in-file tables (exception words,
  *    direct conflations, country/nationality map, supplement words, proper
  *    nouns — KStemmer.cs:79-240) are replicated exactly; the buffer model
  *    reproduces OpenStringBuilder's "setLength exposes stale chars"
  *    semantics that several restore paths rely on (e.g. erAndOrEndings'
  *    `word.Length = j + 2` re-exposing the -er/-or vowel).
  *  - The reference's general-English head-word list (KStemData1-8.cs,
  *    ~30k CIIR entries) is a DATA RESOURCE, not algorithm: like the
  *    Hunspell .aff/.dic files it is pluggable here ([[KStemmer]] takes the
  *    lexicon as a constructor argument) and the built-in
  *    [[KStem.defaultLexicon]] is a documented ~300-head-word SUBSET.
  *    Rules whose dictionary probes miss fall back to the same defaults the
  *    reference uses on out-of-vocabulary words.
  */
object KStem {
  final val MaxWordLen = 50 // KStemmer.cs:77

  /** Dictionary entry: root == null means "word is its own stem". */
  final case class DictEntry(root: String, exception: Boolean)

  /** KStemmer.cs:79 — words the -e-restoring rules must NOT touch. */
  private val exceptionWords: Array[String] = Array(
    "aide", "bathe", "caste", "cute", "dame", "dime", "doge", "done", "dune",
    "envelope", "gage", "grille", "grippe", "lobe", "mane", "mare", "nape",
    "node", "pane", "pate", "plane", "pope", "programme", "quite", "ripe",
    "rote", "rune", "sage", "severe", "shoppe", "sine", "slime", "snipe",
    "steppe", "suite", "swinge", "tare", "tine", "tope", "tripe", "twine")

  /** KStemmer.cs:81-123 — irregular form -> root, applied before any rule. */
  private val directConflations: Array[(String, String)] = Array(
    "aging" -> "age", "going" -> "go", "goes" -> "go", "lying" -> "lie",
    "using" -> "use", "owing" -> "owe", "suing" -> "sue", "dying" -> "die",
    "tying" -> "tie", "vying" -> "vie", "aged" -> "age", "used" -> "use",
    "vied" -> "vie", "cued" -> "cue", "died" -> "die", "eyed" -> "eye",
    "hued" -> "hue", "iced" -> "ice", "lied" -> "lie", "owed" -> "owe",
    "sued" -> "sue", "toed" -> "toe", "tied" -> "tie", "does" -> "do",
    "doing" -> "do", "aeronautical" -> "aeronautics",
    "mathematical" -> "mathematics", "political" -> "politics",
    "metaphysical" -> "metaphysics", "cylindrical" -> "cylinder",
    "nazism" -> "nazi", "ambiguity" -> "ambiguous", "barbarity" -> "barbarous",
    "credulity" -> "credulous", "generosity" -> "generous",
    "spontaneity" -> "spontaneous", "unanimity" -> "unanimous",
    "voracity" -> "voracious", "fled" -> "flee", "miscarriage" -> "miscarry")

  /** KStemmer.cs:125-240 — nationality -> country conflations. */
  private val countryNationality: Array[(String, String)] = Array(
    "afghan" -> "afghanistan", "african" -> "africa", "albanian" -> "albania",
    "algerian" -> "algeria", "american" -> "america", "andorran" -> "andorra",
    "angolan" -> "angola", "arabian" -> "arabia", "argentine" -> "argentina",
    "armenian" -> "armenia", "asian" -> "asia", "australian" -> "australia",
    "austrian" -> "austria", "azerbaijani" -> "azerbaijan",
    "azeri" -> "azerbaijan", "bangladeshi" -> "bangladesh",
    "belgian" -> "belgium", "bermudan" -> "bermuda", "bolivian" -> "bolivia",
    "bosnian" -> "bosnia", "botswanan" -> "botswana", "brazilian" -> "brazil",
    "british" -> "britain", "bulgarian" -> "bulgaria", "burmese" -> "burma",
    "californian" -> "california", "cambodian" -> "cambodia",
    "canadian" -> "canada", "chadian" -> "chad", "chilean" -> "chile",
    "chinese" -> "china", "colombian" -> "colombia", "croat" -> "croatia",
    "croatian" -> "croatia", "cuban" -> "cuba", "cypriot" -> "cyprus",
    "czechoslovakian" -> "czechoslovakia", "danish" -> "denmark",
    "egyptian" -> "egypt", "equadorian" -> "equador", "eritrean" -> "eritrea",
    "estonian" -> "estonia", "ethiopian" -> "ethiopia",
    "european" -> "europe", "fijian" -> "fiji", "filipino" -> "philippines",
    "finnish" -> "finland", "french" -> "france", "gambian" -> "gambia",
    "georgian" -> "georgia", "german" -> "germany", "ghanian" -> "ghana",
    "greek" -> "greece", "grenadan" -> "grenada", "guamian" -> "guam",
    "guatemalan" -> "guatemala", "guinean" -> "guinea", "guyanan" -> "guyana",
    "haitian" -> "haiti", "hawaiian" -> "hawaii", "holland" -> "dutch",
    "honduran" -> "honduras", "hungarian" -> "hungary",
    "icelandic" -> "iceland", "indonesian" -> "indonesia",
    "iranian" -> "iran", "iraqi" -> "iraq", "iraqui" -> "iraq",
    "irish" -> "ireland", "israeli" -> "israel", "italian" -> "italy",
    "jamaican" -> "jamaica", "japanese" -> "japan", "jordanian" -> "jordan",
    "kampuchean" -> "cambodia", "kenyan" -> "kenya", "korean" -> "korea",
    "kuwaiti" -> "kuwait", "lankan" -> "lanka", "laotian" -> "laos",
    "latvian" -> "latvia", "lebanese" -> "lebanon", "liberian" -> "liberia",
    "libyan" -> "libya", "lithuanian" -> "lithuania",
    "macedonian" -> "macedonia", "madagascan" -> "madagascar",
    "malaysian" -> "malaysia", "maltese" -> "malta",
    "mauritanian" -> "mauritania", "mexican" -> "mexico",
    "micronesian" -> "micronesia", "moldovan" -> "moldova",
    "monacan" -> "monaco", "mongolian" -> "mongolia",
    "montenegran" -> "montenegro", "moroccan" -> "morocco",
    "myanmar" -> "burma", "namibian" -> "namibia", "nepalese" -> "nepal",
    "nicaraguan" -> "nicaragua", "nigerian" -> "nigeria",
    "norwegian" -> "norway", "omani" -> "oman", "pakistani" -> "pakistan",
    "panamanian" -> "panama", "papuan" -> "papua",
    "paraguayan" -> "paraguay", "peruvian" -> "peru",
    "portuguese" -> "portugal", "romanian" -> "romania",
    "rumania" -> "romania", "rumanian" -> "romania", "russian" -> "russia",
    "rwandan" -> "rwanda", "samoan" -> "samoa", "scottish" -> "scotland",
    "serb" -> "serbia", "serbian" -> "serbia", "siam" -> "thailand",
    "siamese" -> "thailand", "slovakia" -> "slovak", "slovakian" -> "slovak",
    "slovenian" -> "slovenia", "somali" -> "somalia",
    "somalian" -> "somalia", "spanish" -> "spain", "swedish" -> "sweden",
    "swiss" -> "switzerland", "syrian" -> "syria", "taiwanese" -> "taiwan",
    "tanzanian" -> "tanzania", "texan" -> "texas", "thai" -> "thailand",
    "tunisian" -> "tunisia", "turkish" -> "turkey", "ugandan" -> "uganda",
    "ukrainian" -> "ukraine", "uruguayan" -> "uruguay",
    "uzbek" -> "uzbekistan", "venezuelan" -> "venezuela",
    "vietnamese" -> "viet", "virginian" -> "virginia", "yemeni" -> "yemen",
    "yugoslav" -> "yugoslavia", "yugoslavian" -> "yugoslavia",
    "zambian" -> "zambia", "zealander" -> "zealand",
    "zimbabwean" -> "zimbabwe")

  /** KStemmer.cs:278 supplementDict — head words missing from the CIIR list. */
  private val supplementDict: Array[String] = Array(
    "aids", "applicator", "capacitor", "digitize", "electromagnet",
    "ellipsoid", "exosphere", "extensible", "ferromagnet", "graphics",
    "hydromagnet", "polygraph", "toroid", "superconduct", "backscatter",
    "connectionism")

  /** KStemmer.cs:280 properNouns — names that end in 's' and must not be
    * de-pluralized. Replicated in full (same class of small constant as the
    * stop sets). */
  private val properNouns: Array[String] = Array(
    "abrams", "achilles", "acropolis", "adams", "agnes", "aires",
    "alexander", "alexis", "alfred", "algiers", "alps", "amadeus", "ames",
    "amos", "andes", "angeles", "annapolis", "antilles", "aquarius",
    "archimedes", "arkansas", "asher", "ashly", "athens", "atkins",
    "atlantis", "avis", "bahamas", "bangor", "barbados", "barger", "bering",
    "brahms", "brandeis", "brussels", "bruxelles", "cairns", "camoros",
    "camus", "carlos", "celts", "chalker", "charles", "cheops", "ching",
    "christmas", "cocos", "collins", "columbus", "confucius", "conners",
    "connolly", "copernicus", "cramer", "cyclops", "cygnus", "cyprus",
    "dallas", "damascus", "daniels", "davies", "davis", "decker", "denning",
    "dennis", "descartes", "dickens", "doris", "douglas", "downs", "dreyfus",
    "dukakis", "dulles", "dumfries", "ecclesiastes", "edwards", "emily",
    "erasmus", "euphrates", "evans", "everglades", "fairbanks", "federales",
    "fisher", "fitzsimmons", "fleming", "forbes", "fowler", "france",
    "francis", "goering", "goodling", "goths", "grenadines", "guiness",
    "hades", "harding", "harris", "hastings", "hawkes", "hawking", "hayes",
    "heights", "hercules", "himalayas", "hippocrates", "hobbs", "holmes",
    "honduras", "hopkins", "hughes", "humphreys", "illinois", "indianapolis",
    "inverness", "iris", "iroquois", "irving", "isaacs", "italy", "james",
    "jarvis", "jeffreys", "jesus", "jones", "josephus", "judas", "julius",
    "kansas", "keynes", "kipling", "kiwanis", "lansing", "laos", "leeds",
    "levis", "leviticus", "lewis", "louis", "maccabees", "madras",
    "maimonides", "maldive", "massachusetts", "matthews", "mauritius",
    "memphis", "mercedes", "midas", "mingus", "minneapolis", "mohammed",
    "moines", "morris", "moses", "myers", "myknos", "nablus", "nanjing",
    "nantes", "naples", "neal", "netherlands", "nevis", "nostradamus",
    "oedipus", "olympus", "orleans", "orly", "papas", "paris", "parker",
    "pauling", "peking", "pershing", "peter", "peters", "philippines",
    "phineas", "pisces", "pryor", "pythagoras", "queens", "rabelais",
    "ramses", "reynolds", "rhesus", "rhodes", "richards", "robins",
    "rodgers", "rogers", "rubens", "sagittarius", "seychelles", "socrates",
    "texas", "thames", "thomas", "tiberias", "tunis", "venus", "vilnius",
    "wales", "warner", "wilkins", "williams", "wyoming", "xmas", "yonkers",
    "zeus", "frances", "aarhus", "adonis", "andrews", "angus", "antares",
    "aquinas", "arcturus", "ares", "artemis", "augustus", "ayers",
    "barnabas", "barnes", "becker", "bejing", "biggs", "billings", "boeing",
    "boris", "borroughs", "briggs", "buenos", "calais", "caracas",
    "cassius", "cerberus", "ceres", "cervantes", "chantilly", "chartres",
    "chester", "connally", "conner", "coors", "cummings", "curtis",
    "daedalus", "dionysus", "dobbs", "dolores", "edmonds")

  /** Documented SUBSET of the reference's 30k-word CIIR head-word list
    * (KStemData1-8.cs). Chosen to cover the common inflection families the
    * rules probe for; a production deployment supplies the full list via
    * [[KStemmer]]'s constructor exactly as Hunspell deployments supply .dic
    * files. Out-of-vocabulary words take the reference's own OOV defaults.
    */
  val defaultLexicon: Set[String] = Set(
    // verbs and their roots commonly reached by the -ed/-ing/-s rules
    "run", "walk", "try", "tag", "hiss", "plan", "stop", "swim", "sit",
    "aid", "carry", "capacity", "quick", "corpus",
    "begin", "win", "drop", "ship", "grab", "slip", "trip", "wrap", "chat",
    "scan", "spin", "skip", "jump", "talk", "look", "work", "call", "move",
    "live", "love", "hope", "care", "dance", "smile", "serve", "store",
    "code", "microcode", "compute", "create", "make", "take", "give",
    "write", "read", "play", "stay", "say", "see", "seem", "need", "want",
    "help", "turn", "start", "show", "hear", "close", "open", "follow",
    "change", "lead", "stand", "watch", "define", "oppose", "eliminate",
    "resign", "amplify", "comply", "complicate", "determine", "immune",
    "define", "combine", "examine", "imagine", "arrive", "derive", "drive",
    "injunction", "suggest", "connect", "direct", "select", "expect",
    "adhere", "disappear", "appear", "agree", "flee", "free", "engineer",
    "pioneer", "volunteer", "deliver", "remember", "consider", "offer",
    "differ", "suffer", "cover", "discover", "govern", "fasten", "listen",
    "happen", "develop", "envelop", "fix", "mix", "box", "wish", "pass",
    "press", "address", "express", "miss", "cross", "dress", "guess",
    "base", "case", "cause", "choose", "lose", "use", "fuse", "muse",
    // nouns (incl. -y roots reached via -ies / -ily / -ical rules)
    "fly", "city", "baby", "lady", "army", "body", "copy", "duty", "party",
    "story", "study", "family", "company", "country", "history", "memory",
    "theory", "victory", "calorie", "movie", "suite", "cat", "dog", "fox",
    "bus", "gas", "glass", "class", "mass", "grass", "boss", "loss",
    "horse", "house", "mouse", "nurse", "purse", "sense", "verse", "pulse",
    "engine", "machine", "medicine", "magazine", "structure", "culture",
    "future", "nature", "picture", "feature", "figure", "measure",
    "pleasure", "pressure", "treasure", "moment", "element", "department",
    "environment", "government", "argument", "document", "instrument",
    "system", "problem", "program", "item", "poem", "military", "history",
    // adjectives / stems reached by -ity, -ness, -ly, -al, -ic, -ive, -ble
    "able", "active", "basic", "civic", "classic", "comic", "critic",
    "cubic", "domestic", "electric", "economic", "epic", "ethic", "exotic",
    "fabric", "graphic", "logic", "magic", "magnetic", "metric", "music",
    "optic", "organic", "panic", "plastic", "public", "static", "topic",
    "toxic", "traffic", "tragic", "happy", "heavy", "busy", "easy", "early",
    "likely", "lonely", "friendly", "deadly", "silly", "tiny", "angry",
    "hungry", "empty", "dirty", "pretty", "ready", "steady", "study",
    "equal", "final", "fiscal", "formal", "global", "legal", "local",
    "loyal", "moral", "naval", "normal", "oral", "oval", "regal", "rival",
    "royal", "rural", "social", "total", "usual", "vital", "optimum",
    "maximum", "minimum", "medium", "museum", "real", "ideal", "material",
    "serial", "trial", "dual", "grave", "brave", "naive", "massive",
    "native", "motive", "festive", "costly", "deep", "simple", "single",
    "stable", "noble", "humble", "gentle", "subtle", "ample", "possible",
    "feasible", "visible", "flexible", "capable", "portable", "notable",
    "suitable", "valuable", "available", "compensate", "good", "bad",
    "large", "small", "great", "high", "low", "long", "short", "strong",
    "young", "old", "new", "true", "wide", "deep", "dark", "light", "hard",
    "soft", "warm", "cool", "cold", "hot", "quick", "slow", "sharp",
    "smooth", "rough", "clean", "clear", "common", "modern", "certain",
    "main", "major", "minor", "senior", "junior", "proper", "bitter",
    "better", "clever", "eager", "tender", "slender", "agent")

  /** The default dictionary: tables + rule-pinned core lexicon ∪ the
    * general-English head-word list ([[KStemLexicon]], the KStemData1-8
    * data-resource role) so dictionary-gated rules resolve against real
    * vocabulary instead of the OOV defaults. */
  lazy val defaultDict: Map[String, DictEntry] =
    buildDict(defaultLexicon ++ KStemLexicon.words)

  /** Assemble the dictionary hash exactly as KStemmer.cs initializeDictHash
    * (exceptions first, then conflations, nationality, head words,
    * supplement, proper nouns; first writer wins). */
  def buildDict(lexicon: Set[String]): Map[String, DictEntry] = {
    val b = scala.collection.mutable.HashMap.empty[String, DictEntry]
    for (w <- exceptionWords) if (!b.contains(w)) b(w) = DictEntry(w, exception = true)
    for ((w, r) <- directConflations) if (!b.contains(w)) b(w) = DictEntry(r, exception = false)
    for ((w, r) <- countryNationality) if (!b.contains(w)) b(w) = DictEntry(r, exception = false)
    val default = DictEntry(null, exception = false)
    for (w <- lexicon) if (!b.contains(w)) b(w) = default
    for (w <- supplementDict) if (!b.contains(w)) b(w) = default
    for (w <- properNouns) if (!b.contains(w)) b(w) = default
    b.toMap
  }
}

/** One KStemmer instance is single-threaded mutable state (like the
  * reference's); instantiate per tokenize call / per partition. */
final class KStemmer(dict: Map[String, KStem.DictEntry]) {
  import KStem.DictEntry

  def this() = this(KStem.defaultDict)

  /** OpenStringBuilder analog: setLength NEVER clears, so growing the length
    * back re-exposes previously written chars — restore paths depend on it. */
  private val buf = new Array[Char](KStem.MaxWordLen + 12)
  private var len = 0
  private def setLength(n: Int): Unit = len = n
  private def append(c: Char): Unit = { buf(len) = c; len += 1 }
  private def appendStr(s: String): Unit = { var i = 0; while (i < s.length) { append(s.charAt(i)); i += 1 } }
  private def charAt(i: Int): Char = buf(i)
  private def setCharAt(i: Int, c: Char): Unit = buf(i) = c
  private def wordStr: String = new String(buf, 0, len)

  private var j = 0 // index of final letter of the stem (before the suffix)
  private var k = 0 // index of final letter of the word
  private var matchedEntry: DictEntry = null

  private def finalChar: Char = charAt(k)
  private def penultChar: Char = charAt(k - 1)

  private def isCons(i: Int): Boolean = charAt(i) match {
    case 'a' | 'e' | 'i' | 'o' | 'u' => false
    case 'y' if i > 0 => !isCons(i - 1) // y is a consonant after a vowel
    case _ => true
  }
  private def isVowel(i: Int): Boolean = !isCons(i)

  private def vowelInStem: Boolean = {
    var i = 0
    while (i <= j) { if (isVowel(i)) return true; i += 1 }
    false
  }

  private def doubleC(i: Int): Boolean =
    i >= 1 && charAt(i) == charAt(i - 1) && isCons(i)

  private def endsIn(a: Char, b: Char): Boolean = {
    if (2 > k) return false
    if (charAt(k - 1) == a && charAt(k) == b) { j = k - 2; true } else false
  }
  private def endsIn(a: Char, b: Char, c: Char): Boolean = {
    if (3 > k) return false
    if (charAt(k - 2) == a && charAt(k - 1) == b && charAt(k) == c) { j = k - 3; true } else false
  }
  private def endsIn(a: Char, b: Char, c: Char, d: Char): Boolean = {
    if (4 > k) return false
    if (charAt(k - 3) == a && charAt(k - 2) == b && charAt(k - 1) == c && charAt(k) == d) {
      j = k - 4; true
    } else false
  }
  /** char[]-suffix variant: NOTE j = k on failure (KStemmer.cs endsIn). */
  private def endsInStr(s: String): Boolean = {
    if (s.length > k) return false
    val r = len - s.length
    j = k
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) != charAt(r + i)) return false
      i += 1
    }
    j = r - 1
    true
  }

  private def lookup(): Boolean = {
    matchedEntry = dict.getOrElse(wordStr, null)
    matchedEntry != null
  }
  private def matched: Boolean = matchedEntry != null
  private def wordInDict(): DictEntry = {
    if (matchedEntry != null) return matchedEntry
    val e = dict.getOrElse(wordStr, null)
    if (e != null && !e.exception) matchedEntry = e
    e
  }
  private def setSuffix(s: String): Unit = {
    setLength(j + 1)
    appendStr(s)
    k = j + s.length
  }

  /* Convert plurals to singular form, and '-ies' to 'y'. */
  private def plural(): Unit = {
    if (charAt(k) != 's') return
    if (endsIn('i', 'e', 's')) {
      setLength(j + 3); k -= 1
      if (lookup()) return // calories -> calorie
      k += 1
      append('s')
      setSuffix("y")
      lookup(); ()
    } else if (endsIn('e', 's')) {
      setLength(j + 2); k -= 1
      // aides -> aide, but the double-s guard keeps bases from becoming bas
      val tryE = j > 0 && !(charAt(j) == 's' && charAt(j - 1) == 's')
      if (tryE && lookup()) return
      setLength(j + 1); k -= 1
      if (lookup()) return
      append('e'); k += 1 // default: retain the "e"
      if (!tryE) lookup()
      ()
    } else if (len > 3 && penultChar != 's' && !endsIn('o', 'u', 's')) {
      setLength(k); k -= 1 // plain plural: drop the final "s"
      lookup(); ()
    }
  }

  /* Convert past tense (-ed) to present, and -ied to y. */
  private def pastTense(): Unit = {
    if (len <= 4) return // direct mapping handles short words (fled -> flee)
    if (endsIn('i', 'e', 'd')) {
      setLength(j + 3); k -= 1
      if (lookup()) return // short words: died -> die
      k += 1
      append('d')
      setSuffix("y")
      lookup()
      return
    }
    if (endsIn('e', 'd') && vowelInStem) { // vowelInStem guards acronyms
      setLength(j + 2); k = j + 1 // root ends in 'e'?
      val entry = wordInDict()
      if (entry != null && !entry.exception) return
      setLength(j + 1); k = j // try removing the "ed"
      if (lookup()) return
      if (doubleC(k)) { // tagged -> tag, hissed -> hiss
        setLength(k); k -= 1
        if (lookup()) return
        append(charAt(k)); k += 1 // default: leave it doubled
        lookup()
        return
      }
      if (charAt(0) == 'u' && charAt(1) == 'n') { // un- prefix: leave alone
        append('e'); append('d'); k += 2
        return
      }
      setLength(j + 1); append('e'); k = j + 1 // default: end with 'e'
    }
  }

  /* Handle -ing endings. */
  private def aspect(): Unit = {
    if (len <= 5) return
    if (endsIn('i', 'n', 'g') && vowelInStem) {
      setCharAt(j + 1, 'e') // try the stem + 'e' against the dictionary
      setLength(j + 2)
      k = j + 1
      val entry = wordInDict()
      if (entry != null && !entry.exception) return
      setLength(k); k -= 1 // remove the 'e' too
      if (lookup()) return
      if (doubleC(k)) { // tagging -> tag
        k -= 1; setLength(k + 1)
        if (lookup()) return
        append(charAt(k)); k += 1 // default: leave doubled (fingerspelling)
        lookup()
        return
      }
      if (j > 0 && isCons(j) && isCons(j - 1)) { // two consonants: no 'e'
        k = j; setLength(k + 1)
        return
      }
      setLength(j + 1); append('e'); k = j + 1 // default: add 'e' (microcoding)
    }
  }

  /* -ity endings; -ability/-ibility -> -ble, -ivity -> -ive, -ality removed. */
  private def ityEndings(): Unit = {
    val oldK = k
    if (endsIn('i', 't', 'y')) {
      setLength(j + 1); k = j // try just removing -ity
      if (lookup()) return
      append('e'); k = j + 1 // try -ity -> -e
      if (lookup()) return
      setCharAt(j + 1, 'i'); appendStr("ty"); k = oldK // restore
      if (j > 0 && charAt(j - 1) == 'i' && charAt(j) == 'l') { // -ability/-ibility
        setLength(j - 1); appendStr("le"); k = j
        lookup(); return
      }
      if (j > 0 && charAt(j - 1) == 'i' && charAt(j) == 'v') { // -ivity -> -ive
        setLength(j + 1); append('e'); k = j + 1
        lookup(); return
      }
      if (j > 0 && charAt(j - 1) == 'a' && charAt(j) == 'l') { // -ality
        setLength(j + 1); k = j
        lookup(); return
      }
      if (lookup()) return // keep -ity if the full form is a word (capacity)
      setLength(j + 1); k = j // default: remove -ity
    }
  }

  private def nessEndings(): Unit = {
    if (endsIn('n', 'e', 's', 's')) { // very productive: just accept it
      setLength(j + 1); k = j
      if (charAt(j) == 'i') setCharAt(j, 'y')
      lookup(); ()
    }
  }

  private def ismEndings(): Unit = {
    if (endsIn('i', 's', 'm')) { // very productive: just accept it
      setLength(j + 1); k = j
      lookup(); ()
    }
  }

  private def mentEndings(): Unit = {
    val oldK = k
    if (endsIn('m', 'e', 'n', 't')) {
      setLength(j + 1); k = j
      if (lookup()) return
      appendStr("ment"); k = oldK
    }
  }

  private def izeEndings(): Unit = {
    val oldK = k
    if (endsIn('i', 'z', 'e')) {
      setLength(j + 1); k = j // try removing -ize entirely
      if (lookup()) return
      append('i')
      if (doubleC(j)) { // allow a doubled consonant
        setLength(j); k = j - 1
        if (lookup()) return
        append(charAt(j - 1))
      }
      setLength(j + 1); append('e'); k = j + 1 // try -ize -> -e
      if (lookup()) return
      setLength(j + 1); appendStr("ize"); k = oldK // restore
    }
  }

  /* Handle -ency/-ancy: -ncy -> -nt, else -nce. */
  private def ncyEndings(): Unit = {
    if (endsIn('n', 'c', 'y')) {
      if (!(charAt(j) == 'e' || charAt(j) == 'a')) return
      setCharAt(j + 2, 't'); setLength(j + 3); k = j + 2 // -ncy -> -nt
      if (lookup()) return
      setCharAt(j + 2, 'c'); append('e'); k = j + 3 // default: -nce
      lookup(); ()
    }
  }

  /* Handle -ence/-ance. */
  private def nceEndings(): Unit = {
    val oldK = k
    if (endsIn('n', 'c', 'e')) {
      val wc = charAt(j)
      if (!(wc == 'e' || wc == 'a')) return
      setLength(j); append('e'); k = j // adherance -> adhere
      if (lookup()) return
      setLength(j); k = j - 1 // disappearance -> disappear
      if (lookup()) return
      append(wc); appendStr("nce"); k = oldK // restore
    }
  }

  /* Handle -able/-ible. */
  private def bleEndings(): Unit = {
    val oldK = k
    if (endsIn('b', 'l', 'e')) {
      if (!(charAt(j) == 'a' || charAt(j) == 'i')) return
      val wc = charAt(j)
      setLength(j); k = j - 1 // try just removing the ending
      if (lookup()) return
      if (doubleC(k)) {
        setLength(k); k -= 1
        if (lookup()) return
        k += 1
        append(charAt(k - 1))
      }
      setLength(j); append('e'); k = j // try -a/ible -> -e
      if (lookup()) return
      setLength(j); appendStr("ate"); k = j + 2 // compensable -> compensate
      if (lookup()) return
      setLength(j); append(wc); appendStr("ble"); k = oldK // restore
    }
  }

  /* Handle -ic; the only EXPANDING rule (-ic -> -ical, canonic -> canonical). */
  private def icEndings(): Unit = {
    if (endsIn('i', 'c')) {
      setLength(j + 3); appendStr("al"); k = j + 4 // -ic -> -ical
      if (lookup()) return
      setCharAt(j + 1, 'y'); setLength(j + 2); k = j + 1 // -ic -> -y
      if (lookup()) return
      setCharAt(j + 1, 'e') // -ic -> -e
      if (lookup()) return
      setLength(j + 1); k = j // remove -ic altogether
      if (lookup()) return
      appendStr("ic"); k = j + 2 // restore
    }
  }

  /* -ion family: -ization -> -ize always; -ition/-ation/-ication probed. */
  private def ionEndings(): Unit = {
    val oldK = k
    if (!endsIn('i', 'o', 'n')) return
    if (endsInStr("ization")) { // -ize is very productive
      setLength(j + 3); append('e'); k = j + 3
      lookup(); return
    }
    if (endsInStr("ition")) {
      setLength(j + 1); append('e'); k = j + 1 // definition -> define
      if (lookup()) return
      setLength(j + 1); appendStr("ition"); k = oldK // restore
    } else if (endsInStr("ation")) {
      setLength(j + 3); append('e'); k = j + 3 // elimination -> eliminate
      if (lookup()) return
      setLength(j + 1); append('e'); k = j + 1 // -ation -> -e
      if (lookup()) return
      setLength(j + 1); k = j // resignation -> resign
      if (lookup()) return
      setLength(j + 1); appendStr("ation"); k = oldK // restore
    }
    // -ication AFTER -ation (complication -> complicate, not comply)
    if (endsInStr("ication")) {
      setLength(j + 1); append('y'); k = j + 1 // amplification -> amplify
      if (lookup()) return
      setLength(j + 1); appendStr("ication"); k = oldK // restore
    }
    j = k - 3 // generic -ion (checked on entry)
    setLength(j + 1); append('e'); k = j + 1 // -ion -> -e
    if (lookup()) return
    setLength(j + 1); k = j // remove -ion
    if (lookup()) return
    setLength(j + 1); appendStr("ion"); k = oldK // restore
  }

  /* -er, -or, -ier, -eer; -izer -> -ize always. */
  private def erAndOrEndings(): Unit = {
    val oldK = k
    if (charAt(k) != 'r') return
    if (endsIn('i', 'z', 'e', 'r')) { // -ize is very productive
      setLength(j + 4); k = j + 3
      lookup(); return
    }
    if (endsIn('e', 'r') || endsIn('o', 'r')) {
      val wc = charAt(j + 1) // remember -er vs -or
      if (doubleC(j)) {
        setLength(j); k = j - 1
        if (lookup()) return
        append(charAt(j - 1)) // restore the doubled consonant
      }
      if (charAt(j) == 'i') { // -ier -> -y
        setCharAt(j, 'y'); setLength(j + 1); k = j
        if (lookup()) return
        setCharAt(j, 'i'); append('e') // restore
      }
      if (charAt(j) == 'e') { // -eer
        setLength(j); k = j - 1
        if (lookup()) return
        append('e')
      }
      setLength(j + 2); k = j + 1 // remove the -r
      if (lookup()) return
      setLength(j + 1); k = j // remove -er/-or
      if (lookup()) return
      append('e'); k = j + 1 // -or -> -e
      if (lookup()) return
      setLength(j + 1); append(wc); append('r'); k = oldK // restore
    }
  }

  /* -ly endings: -ally -> -al always, -ably -> -able always. */
  private def lyEndings(): Unit = {
    val oldK = k
    if (endsIn('l', 'y')) {
      setCharAt(j + 2, 'e') // try -ly -> -le
      if (lookup()) return
      setCharAt(j + 2, 'y')
      setLength(j + 1); k = j // try just removing the -ly
      if (lookup()) return
      if (j > 0 && charAt(j - 1) == 'a' && charAt(j) == 'l') return // -ally -> -al
      appendStr("ly"); k = oldK // restore
      if (j > 0 && charAt(j - 1) == 'a' && charAt(j) == 'b') { // -ably -> -able
        setCharAt(j + 2, 'e'); k = j + 2
        return
      }
      if (charAt(j) == 'i') { // militarily -> military
        setLength(j); append('y'); k = j
        if (lookup()) return
        setLength(j); appendStr("ily"); k = oldK // restore
      }
      setLength(j + 1); k = j // default: remove -ly
    }
  }

  /* -al endings (finishes some -ly conversions). */
  private def alEndings(): Unit = {
    val oldK = k
    if (len < 4) return
    if (endsIn('a', 'l')) {
      setLength(j + 1); k = j // try just removing -al
      if (lookup()) return
      if (doubleC(j)) {
        setLength(j); k = j - 1
        if (lookup()) return
        append(charAt(j - 1))
      }
      setLength(j + 1); append('e'); k = j + 1 // try -al -> -e
      if (lookup()) return
      setLength(j + 1); appendStr("um"); k = j + 2 // optimal -> optimum
      if (lookup()) return
      setLength(j + 1); appendStr("al"); k = oldK // restore
      if (j > 0 && charAt(j - 1) == 'i' && charAt(j) == 'c') { // -ical
        setLength(j - 1); k = j - 2 // remove -ical
        if (lookup()) return
        setLength(j - 1); append('y'); k = j - 1 // bibliographical -> -y
        if (lookup()) return
        setLength(j - 1); appendStr("ic"); k = j // default: -ical -> -ic
        lookup(); return
      }
      if (charAt(j) == 'i') { // -ial removed sometimes
        setLength(j); k = j - 1
        if (lookup()) return
        appendStr("ial"); k = oldK
        lookup(); ()
      }
    }
  }

  /* -ive endings: -ative normalized, -ive -> -ion mapped. */
  private def iveEndings(): Unit = {
    val oldK = k
    if (endsIn('i', 'v', 'e')) {
      setLength(j + 1); k = j // try removing -ive entirely
      if (lookup()) return
      append('e'); k = j + 1 // try -ive -> -e
      if (lookup()) return
      setLength(j + 1); appendStr("ive") // restore
      if (j > 0 && charAt(j - 1) == 'a' && charAt(j) == 't') {
        setCharAt(j - 1, 'e') // determinative -> determine
        setLength(j)
        k = j - 1
        if (lookup()) return
        setLength(j - 1) // just remove -ative (k intentionally stale, as upstream)
        if (lookup()) return
        appendStr("ative"); k = oldK // restore
      }
      setCharAt(j + 2, 'o'); setCharAt(j + 3, 'n') // injunctive -> injunction
      if (lookup()) return
      setCharAt(j + 2, 'v'); setCharAt(j + 3, 'e'); k = oldK // restore
    }
  }

  /** Stem one lowercased term. Returns the term itself when untouched (same
    * contract as KStemmer.stem returning changed=false). */
  def stem(term: String): String = {
    k = term.length - 1
    if (k <= 1 || k >= KStem.MaxWordLen - 1) return term
    dict.get(term) match {
      case Some(e) => return if (e.root != null) e.root else term
      case None =>
    }
    var i = 0
    while (i < term.length) { // non a-z: don't stem (lowercase required upstream)
      val c = term.charAt(i)
      if (c < 'a' || c > 'z') return term
      i += 1
    }
    len = 0
    appendStr(term)
    matchedEntry = null

    // the reference's single-pass rule cascade; first dictionary hit wins
    plural()
    if (!matched) pastTense()
    if (!matched) aspect()
    if (!matched) ityEndings()
    if (!matched) nessEndings()
    if (!matched) ionEndings()
    if (!matched) erAndOrEndings()
    if (!matched) lyEndings()
    if (!matched) alEndings()
    if (!matched) {
      wordInDict() // side effect: a modified-but-unprobed word can match here
      iveEndings()
    }
    if (!matched) izeEndings()
    if (!matched) mentEndings()
    if (!matched) bleEndings()
    if (!matched) ismEndings()
    if (!matched) icEndings()
    if (!matched) ncyEndings()
    if (!matched) nceEndings()

    if (matchedEntry != null && matchedEntry.root != null) matchedEntry.root
    else wordStr
  }
}
