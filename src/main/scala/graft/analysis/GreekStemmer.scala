package graft.analysis

/** Greek analysis (reference: /root/reference/src/Lucene.Net.Analysis.Common/
  * Analysis/El/): [[greekLowerCase]] replicates GreekLowerCaseFilter.cs
  * (final sigma -> sigma, tonos/dialytika diacritics folded during
  * lowercasing) and [[GreekStemmer]] the 22-rule stemmer of
  * GreekStemmer.cs (Ntais' algorithm with the Lucene exception lists —
  * rule-identical by necessity, like the other LangAnalyzers stemmers;
  * where the C# conversion dropped parentheses the upstream Lucene
  * grouping is followed). The stemmer expects lowercase, sigma-normalized
  * input, i.e. the output of [[greekLowerCase]].
  */
object GreekStemmer {

  /** GreekLowerCaseFilter.cs lowerCase: diacritic-folding per char. */
  def greekLowerCase(term: String): String = term.map {
    case 'ς' => 'σ'
    case 'Ά' | 'ά' => 'α'
    case 'Έ' | 'έ' => 'ε'
    case 'Ή' | 'ή' => 'η'
    case 'Ί' | 'Ϊ' | 'ί' | 'ϊ' | 'ΐ' => 'ι'
    case 'Ύ' | 'Ϋ' | 'ύ' | 'ϋ' | 'ΰ' => 'υ'
    case 'Ό' | 'ό' => 'ο'
    case 'Ώ' | 'ώ' => 'ω'
    case c => Character.toLowerCase(c)
  }

  def stem(word: String): String = {
    if (word.length < 4) return word
    val s = (word + "      ").toCharArray // slack for add-back writes
    var len = word.length
    val orig = len
    len = rule0(s, len); len = rule1(s, len); len = rule2(s, len)
    len = rule3(s, len); len = rule4(s, len); len = rule5(s, len)
    len = rule6(s, len); len = rule7(s, len); len = rule8(s, len)
    len = rule9(s, len); len = rule10(s, len); len = rule11(s, len)
    len = rule12(s, len); len = rule13(s, len); len = rule14(s, len)
    len = rule15(s, len); len = rule16(s, len); len = rule17(s, len)
    len = rule18(s, len); len = rule19(s, len); len = rule20(s, len)
    if (len == orig) len = rule21(s, len)
    len = rule22(s, len)
    new String(s, 0, len)
  }

  @inline private def ew(s: Array[Char], len: Int, suf: String): Boolean = {
    val n = suf.length
    if (n > len) return false
    var i = 0
    while (i < n) { if (s(len - n + i) != suf.charAt(i)) return false; i += 1 }
    true
  }
  @inline private def pre(s: Array[Char], len: Int): String = new String(s, 0, len)
  @inline private def vowel(s: Array[Char], len: Int): Boolean =
    len > 0 && "αεηιουω".indexOf(s(len - 1)) >= 0
  @inline private def vowelNoY(s: Array[Char], len: Int): Boolean =
    len > 0 && "αεηιοω".indexOf(s(len - 1)) >= 0

  private def rule0(s: Array[Char], len: Int): Int = {
    if (len > 9 && (ew(s, len, "καθεστωτοσ") || ew(s, len, "καθεστωτων"))) return len - 4
    if (len > 8 && (ew(s, len, "γεγονοτοσ") || ew(s, len, "γεγονοτων"))) return len - 4
    if (len > 8 && ew(s, len, "καθεστωτα")) return len - 3
    if (len > 7 && (ew(s, len, "τατογιου") || ew(s, len, "τατογιων"))) return len - 4
    if (len > 7 && ew(s, len, "γεγονοτα")) return len - 3
    if (len > 7 && ew(s, len, "καθεστωσ")) return len - 2
    if (len > 6 && (ew(s, len, "σκαγιου") || ew(s, len, "σκαγιων") ||
        ew(s, len, "ολογιου") || ew(s, len, "ολογιων") || ew(s, len, "κρεατοσ") ||
        ew(s, len, "κρεατων") || ew(s, len, "περατοσ") || ew(s, len, "περατων") ||
        ew(s, len, "τερατοσ") || ew(s, len, "τερατων"))) return len - 4
    if (len > 6 && ew(s, len, "τατογια")) return len - 3
    if (len > 6 && ew(s, len, "γεγονοσ")) return len - 2
    if (len > 5 && (ew(s, len, "φαγιου") || ew(s, len, "φαγιων") ||
        ew(s, len, "σογιου") || ew(s, len, "σογιων"))) return len - 4
    if (len > 5 && (ew(s, len, "σκαγια") || ew(s, len, "ολογια") ||
        ew(s, len, "κρεατα") || ew(s, len, "περατα") || ew(s, len, "τερατα"))) return len - 3
    if (len > 4 && (ew(s, len, "φαγια") || ew(s, len, "σογια") ||
        ew(s, len, "φωτοσ") || ew(s, len, "φωτων"))) return len - 3
    if (len > 4 && (ew(s, len, "κρεασ") || ew(s, len, "περασ") || ew(s, len, "τερασ"))) return len - 2
    if (len > 3 && ew(s, len, "φωτα")) return len - 2
    if (len > 2 && ew(s, len, "φωσ")) return len - 1
    len
  }

  private def rule1(s: Array[Char], len0: Int): Int = {
    var len = len0
    if (len > 4 && (ew(s, len, "αδεσ") || ew(s, len, "αδων"))) {
      len -= 4
      if (!(ew(s, len, "οκ") || ew(s, len, "μαμ") || ew(s, len, "μαν") ||
            ew(s, len, "μπαμπ") || ew(s, len, "πατερ") || ew(s, len, "γιαγι") ||
            ew(s, len, "νταντ") || ew(s, len, "κυρ") || ew(s, len, "θει") ||
            ew(s, len, "πεθερ"))) len += 2 // add back -αδ
    }
    len
  }

  private def rule2(s: Array[Char], len0: Int): Int = {
    var len = len0
    if (len > 4 && (ew(s, len, "εδεσ") || ew(s, len, "εδων"))) {
      len -= 4
      if (ew(s, len, "οπ") || ew(s, len, "ιπ") || ew(s, len, "εμπ") ||
          ew(s, len, "υπ") || ew(s, len, "γηπ") || ew(s, len, "δαπ") ||
          ew(s, len, "κρασπ") || ew(s, len, "μιλ")) len += 2 // add back -εδ
    }
    len
  }

  private def rule3(s: Array[Char], len0: Int): Int = {
    var len = len0
    if (len > 5 && (ew(s, len, "ουδεσ") || ew(s, len, "ουδων"))) {
      len -= 5
      if (ew(s, len, "αρκ") || ew(s, len, "καλιακ") || ew(s, len, "πεταλ") ||
          ew(s, len, "λιχ") || ew(s, len, "πλεξ") || ew(s, len, "σκ") ||
          ew(s, len, "σ") || ew(s, len, "φλ") || ew(s, len, "φρ") ||
          ew(s, len, "βελ") || ew(s, len, "λουλ") || ew(s, len, "χν") ||
          ew(s, len, "σπ") || ew(s, len, "τραγ") || ew(s, len, "φε"))
        len += 3 // add back -ουδ
    }
    len
  }

  private val Exc4 = Set("θ", "δ", "ελ", "γαλ", "ν", "π", "ιδ", "παρ")
  private def rule4(s: Array[Char], len0: Int): Int = {
    var len = len0
    if (len > 3 && (ew(s, len, "εωσ") || ew(s, len, "εων"))) {
      len -= 3
      if (Exc4.contains(pre(s, len))) len += 1 // add back -ε
    }
    len
  }

  private def rule5(s: Array[Char], len0: Int): Int = {
    var len = len0
    if (len > 2 && ew(s, len, "ια")) {
      len -= 2
      if (vowel(s, len)) len += 1 // add back -ι
    } else if (len > 3 && (ew(s, len, "ιου") || ew(s, len, "ιων"))) {
      len -= 3
      if (vowel(s, len)) len += 1
    }
    len
  }

  private val Exc6 = Set("αλ", "αδ", "ενδ", "αμαν", "αμμοχαλ", "ηθ", "ανηθ",
    "αντιδ", "φυσ", "βρωμ", "γερ", "εξωδ", "καλπ", "καλλιν", "καταδ", "μουλ",
    "μπαν", "μπαγιατ", "μπολ", "μποσ", "νιτ", "ξικ", "συνομηλ", "πετσ",
    "πιτσ", "πικαντ", "πλιατσ", "ποστελν", "πρωτοδ", "σερτ", "συναδ", "τσαμ",
    "υποδ", "φιλον", "φυλοδ", "χασ")
  private def rule6(s: Array[Char], len0: Int): Int = {
    var len = len0
    var removed = false
    if (len > 3 && (ew(s, len, "ικα") || ew(s, len, "ικο"))) { len -= 3; removed = true }
    else if (len > 4 && (ew(s, len, "ικου") || ew(s, len, "ικων"))) { len -= 4; removed = true }
    if (removed && (vowel(s, len) || Exc6.contains(pre(s, len)))) len += 2 // add back -ικ
    len
  }

  private val Exc7 = Set("αναπ", "αποθ", "αποκ", "αποστ", "βουβ", "ξεθ",
    "ουλ", "πεθ", "πικρ", "ποτ", "σιχ", "χ")
  private def rule7(s: Array[Char], len0: Int): Int = {
    var len = len0
    if (len == 5 && ew(s, len, "αγαμε")) return len - 1
    if (len > 7 && ew(s, len, "ηθηκαμε")) len -= 7
    else if (len > 6 && ew(s, len, "ουσαμε")) len -= 6
    else if (len > 5 && (ew(s, len, "αγαμε") || ew(s, len, "ησαμε") || ew(s, len, "ηκαμε"))) len -= 5
    if (len > 3 && ew(s, len, "αμε")) {
      len -= 3
      if (Exc7.contains(pre(s, len))) len += 2 // add back -αμ
    }
    len
  }

  private val Exc8a = Set("τρ", "τσ")
  private val Exc8b = Set("βετερ", "βουλκ", "βραχμ", "γ", "δραδουμ", "θ",
    "καλπουζ", "καστελ", "κορμορ", "λαοπλ", "μωαμεθ", "μ", "μουσουλμ", "ν",
    "ουλ", "π", "πελεκ", "πλ", "πολισ", "πορτολ", "σαρακατσ", "σουλτ",
    "τσαρλατ", "ορφ", "τσιγγ", "τσοπ", "φωτοστεφ", "χ", "ψυχοπλ", "αγ",
    "γαλ", "γερ", "δεκ", "διπλ", "αμερικαν", "ουρ", "πιθ", "πουριτ", "σ",
    "ζωντ", "ικ", "καστ", "κοπ", "λιχ", "λουθηρ", "μαιντ", "μελ", "σιγ",
    "σπ", "στεγ", "τραγ", "τσαγ", "φ", "ερ", "αδαπ", "αθιγγ", "αμηχ",
    "ανικ", "ανοργ", "απηγ", "απιθ", "ατσιγγ", "βασ", "βασκ", "βαθυγαλ",
    "βιομηχ", "βραχυκ", "διατ", "διαφ", "ενοργ", "θυσ", "καπνοβιομηχ",
    "καταγαλ", "κλιβ", "κοιλαρφ", "λιβ", "μεγλοβιομηχ", "μικροβιομηχ",
    "νταβ", "ξηροκλιβ", "ολιγοδαμ", "ολογαλ", "πενταρφ", "περηφ", "περιτρ",
    "πλατ", "πολυδαπ", "πολυμηχ", "στεφ", "ταβ", "τετ", "υπερηφ", "υποκοπ",
    "χαμηλοδαπ", "ψηλοταβ")
  private def rule8(s: Array[Char], len0: Int): Int = {
    var len = len0
    var removed = false
    if (len > 8 && ew(s, len, "ιουντανε")) { len -= 8; removed = true }
    else if (len > 7 && (ew(s, len, "ιοντανε") || ew(s, len, "ουντανε") ||
        ew(s, len, "ηθηκανε"))) { len -= 7; removed = true }
    else if (len > 6 && (ew(s, len, "ιοτανε") || ew(s, len, "οντανε") ||
        ew(s, len, "ουσανε"))) { len -= 6; removed = true }
    else if (len > 5 && (ew(s, len, "αγανε") || ew(s, len, "ησανε") ||
        ew(s, len, "οτανε") || ew(s, len, "ηκανε"))) { len -= 5; removed = true }
    if (removed && Exc8a.contains(pre(s, len))) {
      // add -αγαν (we removed > 4 chars so it's safe)
      len += 4
      s(len - 4) = 'α'; s(len - 3) = 'γ'; s(len - 2) = 'α'; s(len - 1) = 'ν'
    }
    if (len > 3 && ew(s, len, "ανε")) {
      len -= 3
      if (vowelNoY(s, len) || Exc8b.contains(pre(s, len))) len += 2 // add back -αν
    }
    len
  }

  private val Exc9 = Set("αβαρ", "βεν", "εναρ", "αβρ", "αδ", "αθ", "αν",
    "απλ", "βαρον", "ντρ", "σκ", "κοπ", "μπορ", "νιφ", "παγ", "παρακαλ",
    "σερπ", "σκελ", "συρφ", "τοκ", "υ", "δ", "εμ", "θαρρ", "θ")
  private def rule9(s: Array[Char], len0: Int): Int = {
    var len = len0
    if (len > 5 && ew(s, len, "ησετε")) len -= 5
    if (len > 3 && ew(s, len, "ετε")) {
      len -= 3
      if (Exc9.contains(pre(s, len)) || vowelNoY(s, len) ||
          ew(s, len, "οδ") || ew(s, len, "αιρ") || ew(s, len, "φορ") ||
          ew(s, len, "ταθ") || ew(s, len, "διαθ") || ew(s, len, "σχ") ||
          ew(s, len, "ενδ") || ew(s, len, "ευρ") || ew(s, len, "τιθ") ||
          ew(s, len, "υπερθ") || ew(s, len, "ραθ") || ew(s, len, "ενθ") ||
          ew(s, len, "ροθ") || ew(s, len, "σθ") || ew(s, len, "πυρ") ||
          ew(s, len, "αιν") || ew(s, len, "συνδ") || ew(s, len, "συν") ||
          ew(s, len, "συνθ") || ew(s, len, "χωρ") || ew(s, len, "πον") ||
          ew(s, len, "βρ") || ew(s, len, "καθ") || ew(s, len, "ευθ") ||
          ew(s, len, "εκθ") || ew(s, len, "νετ") || ew(s, len, "ρον") ||
          ew(s, len, "αρκ") || ew(s, len, "βαρ") || ew(s, len, "βολ") ||
          ew(s, len, "ωφελ")) len += 2 // add back -ετ
    }
    len
  }

  private def rule10(s: Array[Char], len0: Int): Int = {
    var len = len0
    if (len > 5 && (ew(s, len, "οντασ") || ew(s, len, "ωντασ"))) {
      len -= 5
      if (len == 3 && ew(s, len, "αρχ")) { len += 3; s(len - 3) = 'ο' } // αρχοντ
      if (ew(s, len, "κρε")) { len += 3; s(len - 3) = 'ω' } // κρεωντ
    }
    len
  }

  private def rule11(s: Array[Char], len0: Int): Int = {
    var len = len0
    if (len > 6 && ew(s, len, "ομαστε")) {
      len -= 6
      if (len == 2 && ew(s, len, "ον")) len += 5 // ονομαστ
    } else if (len > 7 && ew(s, len, "ιομαστε")) {
      len -= 7
      if (len == 2 && ew(s, len, "ον")) {
        len += 5
        s(len - 5) = 'ο'; s(len - 4) = 'μ'; s(len - 3) = 'α'
        s(len - 2) = 'σ'; s(len - 1) = 'τ'
      }
    }
    len
  }

  private val Exc12a = Set("π", "απ", "συμπ", "ασυμπ", "ακαταπ", "αμεταμφ")
  private val Exc12b = Set("αλ", "αρ", "εκτελ", "ζ", "μ", "ξ", "παρακαλ", "προ", "νισ")
  private def rule12(s: Array[Char], len0: Int): Int = {
    var len = len0
    if (len > 5 && ew(s, len, "ιεστε")) {
      len -= 5
      if (Exc12a.contains(pre(s, len))) len += 4 // add back -ιεστ
    }
    if (len > 4 && ew(s, len, "εστε")) {
      len -= 4
      if (Exc12b.contains(pre(s, len))) len += 3 // add back -εστ
    }
    len
  }

  private val Exc13 = Set("διαθ", "θ", "παρακαταθ", "προσθ", "συνθ")
  private def rule13(s: Array[Char], len0: Int): Int = {
    var len = len0
    if (len > 6 && ew(s, len, "ηθηκεσ")) len -= 6
    else if (len > 5 && (ew(s, len, "ηθηκα") || ew(s, len, "ηθηκε"))) len -= 5
    var removed = false
    if (len > 4 && ew(s, len, "ηκεσ")) { len -= 4; removed = true }
    else if (len > 3 && (ew(s, len, "ηκα") || ew(s, len, "ηκε"))) { len -= 3; removed = true }
    if (removed && (Exc13.contains(pre(s, len)) || ew(s, len, "σκωλ") ||
        ew(s, len, "σκουλ") || ew(s, len, "ναρθ") || ew(s, len, "σφ") ||
        ew(s, len, "οθ") || ew(s, len, "πιθ"))) len += 2 // add back -ηκ
    len
  }

  private val Exc14 = Set("φαρμακ", "χαδ", "αγκ", "αναρρ", "βρομ", "εκλιπ",
    "λαμπιδ", "λεχ", "μ", "πατ", "ρ", "λ", "μεδ", "μεσαζ", "υποτειν", "αμ",
    "αιθ", "ανηκ", "δεσποζ", "ενδιαφερ", "δε", "δευτερευ", "καθαρευ", "πλε",
    "τσα")
  private def rule14(s: Array[Char], len0: Int): Int = {
    var len = len0
    var removed = false
    if (len > 5 && ew(s, len, "ουσεσ")) { len -= 5; removed = true }
    else if (len > 4 && (ew(s, len, "ουσα") || ew(s, len, "ουσε"))) { len -= 4; removed = true }
    if (removed && (Exc14.contains(pre(s, len)) || vowel(s, len) ||
        ew(s, len, "ποδαρ") || ew(s, len, "βλεπ") || ew(s, len, "πανταχ") ||
        ew(s, len, "φρυδ") || ew(s, len, "μαντιλ") || ew(s, len, "μαλλ") ||
        ew(s, len, "κυματ") || ew(s, len, "λαχ") || ew(s, len, "ληγ") ||
        ew(s, len, "φαγ") || ew(s, len, "ομ") || ew(s, len, "πρωτ")))
      len += 3 // add back -ουσ
    len
  }

  private val Exc15a = Set("αβαστ", "πολυφ", "αδηφ", "παμφ", "ρ", "ασπ",
    "αφ", "αμαλ", "αμαλλι", "ανυστ", "απερ", "ασπαρ", "αχαρ", "δερβεν",
    "δροσοπ", "ξεφ", "νεοπ", "νομοτ", "ολοπ", "ομοτ", "προστ", "προσωποπ",
    "συμπ", "συντ", "τ", "υποτ", "χαρ", "αειπ", "αιμοστ", "ανυπ", "αποτ",
    "αρτιπ", "διατ", "εν", "επιτ", "κροκαλοπ", "σιδηροπ", "λ", "ναυ",
    "ουλαμ", "ουρ", "π", "τρ", "μ")
  private val Exc15b = Set("ψοφ", "ναυλοχ")
  private def rule15(s: Array[Char], len0: Int): Int = {
    var len = len0
    var removed = false
    if (len > 4 && ew(s, len, "αγεσ")) { len -= 4; removed = true }
    else if (len > 3 && (ew(s, len, "αγα") || ew(s, len, "αγε"))) { len -= 3; removed = true }
    if (removed) {
      val cond1 = Exc15a.contains(pre(s, len)) || ew(s, len, "οφ") ||
        ew(s, len, "πελ") || ew(s, len, "χορτ") || ew(s, len, "λλ") ||
        ew(s, len, "σφ") || ew(s, len, "ρπ") || ew(s, len, "φρ") ||
        ew(s, len, "πρ") || ew(s, len, "λοχ") || ew(s, len, "σμην")
      val cond2 = Exc15b.contains(pre(s, len)) || ew(s, len, "κολλ")
      if (cond1 && !cond2) len += 2 // add back -αγ
    }
    len
  }

  private val Exc16 = Set("ν", "χερσον", "δωδεκαν", "ερημον", "μεγαλον", "επταν")
  private def rule16(s: Array[Char], len0: Int): Int = {
    var len = len0
    var removed = false
    if (len > 4 && ew(s, len, "ησου")) { len -= 4; removed = true }
    else if (len > 3 && (ew(s, len, "ησε") || ew(s, len, "ησα"))) { len -= 3; removed = true }
    if (removed && Exc16.contains(pre(s, len))) len += 2 // add back -ησ
    len
  }

  private val Exc17 = Set("ασβ", "σβ", "αχρ", "χρ", "απλ", "αειμν", "δυσχρ",
    "ευχρ", "κοινοχρ", "παλιμψ")
  private def rule17(s: Array[Char], len0: Int): Int = {
    var len = len0
    if (len > 4 && ew(s, len, "ηστε")) {
      len -= 4
      if (Exc17.contains(pre(s, len))) len += 3 // add back -ηστ
    }
    len
  }

  private val Exc18 = Set("ν", "ρ", "σπι", "στραβομουτσ", "κακομουτσ", "εξων")
  private def rule18(s: Array[Char], len0: Int): Int = {
    var len = len0
    var removed = false
    if (len > 6 && (ew(s, len, "ησουνε") || ew(s, len, "ηθουνε"))) { len -= 6; removed = true }
    else if (len > 4 && ew(s, len, "ουνε")) { len -= 4; removed = true }
    if (removed && Exc18.contains(pre(s, len))) {
      len += 3
      s(len - 3) = 'ο'; s(len - 2) = 'υ'; s(len - 1) = 'ν'
    }
    len
  }

  private val Exc19 = Set("παρασουσ", "φ", "χ", "ωριοπλ", "αζ", "αλλοσουσ", "ασουσ")
  private def rule19(s: Array[Char], len0: Int): Int = {
    var len = len0
    var removed = false
    if (len > 6 && (ew(s, len, "ησουμε") || ew(s, len, "ηθουμε"))) { len -= 6; removed = true }
    else if (len > 4 && ew(s, len, "ουμε")) { len -= 4; removed = true }
    if (removed && Exc19.contains(pre(s, len))) {
      len += 3
      s(len - 3) = 'ο'; s(len - 2) = 'υ'; s(len - 1) = 'μ'
    }
    len
  }

  private def rule20(s: Array[Char], len0: Int): Int = {
    var len = len0
    if (len > 5 && (ew(s, len, "ματων") || ew(s, len, "ματοσ"))) len -= 3
    else if (len > 4 && ew(s, len, "ματα")) len -= 2
    len
  }

  private def rule21(s: Array[Char], len: Int): Int = {
    if (len > 9 && ew(s, len, "ιοντουσαν")) return len - 9
    if (len > 8 && (ew(s, len, "ιομασταν") || ew(s, len, "ιοσασταν") ||
        ew(s, len, "ιουμαστε") || ew(s, len, "οντουσαν"))) return len - 8
    if (len > 7 && (ew(s, len, "ιεμαστε") || ew(s, len, "ιεσαστε") ||
        ew(s, len, "ιομουνα") || ew(s, len, "ιοσαστε") || ew(s, len, "ιοσουνα") ||
        ew(s, len, "ιουνται") || ew(s, len, "ιουνταν") || ew(s, len, "ηθηκατε") ||
        ew(s, len, "ομασταν") || ew(s, len, "οσασταν") || ew(s, len, "ουμαστε"))) return len - 7
    if (len > 6 && (ew(s, len, "ιομουν") || ew(s, len, "ιονταν") ||
        ew(s, len, "ιοσουν") || ew(s, len, "ηθειτε") || ew(s, len, "ηθηκαν") ||
        ew(s, len, "ομουνα") || ew(s, len, "οσαστε") || ew(s, len, "οσουνα") ||
        ew(s, len, "ουνται") || ew(s, len, "ουνταν") || ew(s, len, "ουσατε"))) return len - 6
    if (len > 5 && (ew(s, len, "αγατε") || ew(s, len, "ιεμαι") || ew(s, len, "ιεται") ||
        ew(s, len, "ιεσαι") || ew(s, len, "ιοταν") || ew(s, len, "ιουμα") ||
        ew(s, len, "ηθεισ") || ew(s, len, "ηθουν") || ew(s, len, "ηκατε") ||
        ew(s, len, "ησατε") || ew(s, len, "ησουν") || ew(s, len, "ομουν") ||
        ew(s, len, "ονται") || ew(s, len, "ονταν") || ew(s, len, "οσουν") ||
        ew(s, len, "ουμαι") || ew(s, len, "ουσαν"))) return len - 5
    if (len > 4 && (ew(s, len, "αγαν") || ew(s, len, "αμαι") || ew(s, len, "ασαι") ||
        ew(s, len, "αται") || ew(s, len, "ειτε") || ew(s, len, "εσαι") ||
        ew(s, len, "εται") || ew(s, len, "ηδεσ") || ew(s, len, "ηδων") ||
        ew(s, len, "ηθει") || ew(s, len, "ηκαν") || ew(s, len, "ησαν") ||
        ew(s, len, "ησει") || ew(s, len, "ησεσ") || ew(s, len, "ομαι") ||
        ew(s, len, "οταν"))) return len - 4
    if (len > 3 && (ew(s, len, "αει") || ew(s, len, "εισ") || ew(s, len, "ηθω") ||
        ew(s, len, "ησω") || ew(s, len, "ουν") || ew(s, len, "ουσ"))) return len - 3
    if (len > 2 && (ew(s, len, "αν") || ew(s, len, "ασ") || ew(s, len, "αω") ||
        ew(s, len, "ει") || ew(s, len, "εσ") || ew(s, len, "ησ") || ew(s, len, "οι") ||
        ew(s, len, "οσ") || ew(s, len, "ου") || ew(s, len, "υσ") || ew(s, len, "ων"))) return len - 2
    if (len > 1 && vowel(s, len)) return len - 1
    len
  }

  private def rule22(s: Array[Char], len: Int): Int = {
    if (ew(s, len, "εστερ") || ew(s, len, "εστατ")) return len - 5
    if (ew(s, len, "οτερ") || ew(s, len, "οτατ") || ew(s, len, "υτερ") ||
        ew(s, len, "υτατ") || ew(s, len, "ωτερ") || ew(s, len, "ωτατ")) return len - 4
    len
  }
}

/** Greek chain: classic grammar -> GreekLowerCaseFilter (diacritic fold +
  * final sigma) -> Greek stops -> GreekStemFilter
  * (Analysis/El/GreekAnalyzer.cs createComponents order: lowercase runs
  * FIRST, stem last). */
object GreekAnalyzer extends Analyzer {
  /** FULL GreekAnalyzer stop set — all 75 entries of the in-tree
    * GREEK_STOP_WORDS array (contrib/Analyzers/El/GreekAnalyzer.cs:48)
    * verbatim (already in the post-lowercase sigma-folded form the filter
    * sees). */
  val GreekStopWords: Set[String] = Set(
    "ο", "η", "το", "οι", "τα", "του", "τησ", "των", "τον", "την", "και",
    "κι", "κ", "ειμαι", "εισαι", "ειναι", "ειμαστε", "ειστε", "στο",
    "στον", "στη", "στην", "μα", "αλλα", "απο", "για", "προσ", "με", "σε",
    "ωσ", "παρα", "αντι", "κατα", "μετα", "θα", "να", "δε", "δεν", "μη",
    "μην", "επι", "ενω", "εαν", "αν", "τοτε", "που", "πωσ", "ποιοσ",
    "ποια", "ποιο", "ποιοι", "ποιεσ", "ποιων", "ποιουσ", "αυτοσ",
    "αυτη", "αυτο", "αυτοι", "αυτων", "αυτουσ", "αυτεσ", "αυτα",
    "εκεινοσ", "εκεινη", "εκεινο", "εκεινοι", "εκεινεσ", "εκεινα",
    "εκεινων", "εκεινουσ", "οπωσ", "ομωσ", "ισωσ", "οσο", "οτι")
  override def tokenize(text: String): Iterator[Token] =
    LangAnalyzers.StandardNoStop.tokenize(text)
      .map(t => t.copy(term = GreekStemmer.greekLowerCase(t.term)))
      .filterNot(t => GreekStopWords.contains(t.term))
      .map(t => t.copy(term = GreekStemmer.stem(t.term)))
}
