package graft.analysis

/** Second Snowball wave — the stemmers behind the remaining reference
  * analyzers (Tr/Ga/Ca/Eu/Hy).
  *
  * Fidelity notes:
  *  - TURKISH is decoded routine-by-routine from the generated Snowball
  *    program that IS in the reference tree
  *    (/root/reference/src/contrib/Snowball/SF/Snowball/Ext/
  *    TurkishStemmer.cs) — vowel-harmony groupings, optional buffer
  *    consonant/vowel markers, the nominal-verb / noun-suffix / chained-ki
  *    control flow, and the postlude (reserved words, d|g vowel append,
  *    final-consonant devoicing) are all replicated exactly, including the
  *    SnowballFilter contract of taking the buffer as-is regardless of the
  *    program's boolean result (Analysis/Snowball/SnowballFilter.cs:103-110).
  *  - IRISH/CATALAN/BASQUE/ARMENIAN: the reference analyzers
  *    (Analysis/{Ga,Ca,Eu,Hy}) reference Tartarus stemmer classes that
  *    are NOT part of this reference tree (external dependency — there is
  *    no rule data in-tree to follow). These are fresh implementations
  *    structured after the published snowballstem.org algorithms with the
  *    core suffix groups; entries marked DOCUMENTED SUBSET where the
  *    published among-lists are larger.
  */
object SnowballStemmers2 {

  // ============================================================== Turkish

  private val TrVowels = "aeıioöuü"
  @inline private def trV(c: Char): Boolean = TrVowels.indexOf(c.toInt) >= 0
  @inline private def trU(c: Char): Boolean =
    c == 'ı' || c == 'i' || c == 'u' || c == 'ü'

  /** check_vowel_harmony (TurkishStemmer.cs:308): the last vowel of
    * w[0,p) must have a compatible vowel somewhere to its left (the
    * generated `goto` skips incompatible characters — replicated). */
  private def trHarmony(w: String, p: Int): Boolean = {
    var li = p - 1
    while (li >= 0 && !trV(w.charAt(li))) li -= 1
    if (li < 0) return false
    val set = w.charAt(li) match {
      case 'a' => "aıou"
      case 'e' => "eiöü"
      case 'ı' => "aı"
      case 'i' => "ei"
      case 'o' | 'u' => "ou"
      case 'ö' | 'ü' => "öü"
      case _ => return false
    }
    var j = li - 1
    while (j >= 0 && set.indexOf(w.charAt(j).toInt) < 0) j -= 1
    j >= 0
  }

  /** mark_suffix_with_optional_X_consonant (TurkishStemmer.cs:574-810):
    * either the char before p is `c` with a vowel before it (consume it),
    * or it is NOT `c` and the char two back is a vowel (consume nothing);
    * anything else fails the whole suffix. */
  private def trOptCons(w: String, p: Int, c: Char): Option[Int] =
    if (p >= 1 && w.charAt(p - 1) == c) {
      if (p >= 2 && trV(w.charAt(p - 2))) Some(p - 1) else None
    } else if (p >= 2 && trV(w.charAt(p - 2))) Some(p)
    else None

  /** mark_suffix_with_optional_U_vowel (TurkishStemmer.cs:811): the dual —
    * U vowel preceded by a NON-vowel. */
  private def trOptU(w: String, p: Int): Option[Int] =
    if (p >= 1 && trU(w.charAt(p - 1))) {
      if (p >= 2 && !trV(w.charAt(p - 2))) Some(p - 1) else None
    } else if (p >= 2 && !trV(w.charAt(p - 2))) Some(p)
    else None

  private def amongB(w: String, p: Int, sfxs: Seq[String]): Option[Int] =
    sfxs.find(s => p >= s.length && w.regionMatches(p - s.length, s, 0, s.length))
      .map(s => p - s.length)

  // among tables (TurkishStemmer.cs a_0..a_22), longest-first
  private val TrPoss = Seq("miz", "niz", "muz", "nuz", "müz", "nüz", "mız", "nız", "m", "n")
  private val TrLArI = Seq("leri", "ları")
  private val TrNU = Seq("ni", "nu", "nü", "nı")
  private val TrNUn = Seq("in", "un", "ün", "ın")
  private val TrYA = Seq("a", "e")
  private val TrNA = Seq("na", "ne")
  private val TrDA = Seq("da", "ta", "de", "te")
  private val TrNdA = Seq("nda", "nde")
  private val TrDAn = Seq("dan", "tan", "den", "ten")
  private val TrNdAn = Seq("ndan", "nden")
  private val TrYlA = Seq("la", "le")
  private val TrNcA = Seq("ca", "ce")
  private val TrYUm = Seq("im", "um", "üm", "ım")
  private val TrSUn = Seq("sin", "sun", "sün", "sın")
  private val TrYUz = Seq("iz", "uz", "üz", "ız")
  private val TrSUnUz = Seq("siniz", "sunuz", "sünüz", "sınız")
  private val TrLAr = Seq("lar", "ler")
  private val TrNUz = Seq("niz", "nuz", "nüz", "nız")
  private val TrDUr = Seq("dir", "tir", "dur", "tur", "dür", "tür", "dır", "tır")
  private val TrCAsInA = Seq("casına", "cesine")
  private val TrYDU = Seq(
    "dik", "tik", "duk", "tuk", "dük", "tük", "dık", "tık",
    "dim", "tim", "dum", "tum", "düm", "tüm", "dım", "tım",
    "din", "tin", "dun", "tun", "dün", "tün", "dın", "tın",
    "di", "ti", "du", "tu", "dü", "tü", "dı", "tı")
  private val TrYsA = Seq("sak", "sek", "sam", "sem", "san", "sen", "sa", "se")
  private val TrYmUs = Seq("miş", "muş", "müş", "mış")

  // mark_* : (w, p) => Option[newP] — extend the match leftward
  private def mPoss(w: String, p: Int) = amongB(w, p, TrPoss).flatMap(trOptU(w, _))
  private def mSU(w: String, p: Int) =
    if (trHarmony(w, p) && p >= 1 && trU(w.charAt(p - 1))) trOptCons(w, p - 1, 's') else None
  private def mLArI(w: String, p: Int) = amongB(w, p, TrLArI)
  private def mYU(w: String, p: Int) =
    if (trHarmony(w, p) && p >= 1 && trU(w.charAt(p - 1))) trOptCons(w, p - 1, 'y') else None
  private def mNU(w: String, p: Int) =
    if (trHarmony(w, p)) amongB(w, p, TrNU) else None
  private def mNUn(w: String, p: Int) =
    if (trHarmony(w, p)) amongB(w, p, TrNUn).flatMap(trOptCons(w, _, 'n')) else None
  private def mYA(w: String, p: Int) =
    if (trHarmony(w, p)) amongB(w, p, TrYA).flatMap(trOptCons(w, _, 'y')) else None
  private def mNA(w: String, p: Int) =
    if (trHarmony(w, p)) amongB(w, p, TrNA) else None
  private def mDA(w: String, p: Int) =
    if (trHarmony(w, p)) amongB(w, p, TrDA) else None
  private def mNdA(w: String, p: Int) =
    if (trHarmony(w, p)) amongB(w, p, TrNdA) else None
  private def mDAn(w: String, p: Int) =
    if (trHarmony(w, p)) amongB(w, p, TrDAn) else None
  private def mNdAn(w: String, p: Int) =
    if (trHarmony(w, p)) amongB(w, p, TrNdAn) else None
  private def mYlA(w: String, p: Int) =
    if (trHarmony(w, p)) amongB(w, p, TrYlA).flatMap(trOptCons(w, _, 'y')) else None
  private def mKi(w: String, p: Int) = amongB(w, p, Seq("ki"))
  private def mNcA(w: String, p: Int) =
    if (trHarmony(w, p)) amongB(w, p, TrNcA).flatMap(trOptCons(w, _, 'n')) else None
  private def mYUm(w: String, p: Int) =
    if (trHarmony(w, p)) amongB(w, p, TrYUm).flatMap(trOptCons(w, _, 'y')) else None
  private def mSUn(w: String, p: Int) =
    if (trHarmony(w, p)) amongB(w, p, TrSUn) else None
  private def mYUz(w: String, p: Int) =
    if (trHarmony(w, p)) amongB(w, p, TrYUz).flatMap(trOptCons(w, _, 'y')) else None
  private def mSUnUz(w: String, p: Int) = amongB(w, p, TrSUnUz)
  private def mLAr(w: String, p: Int) =
    if (trHarmony(w, p)) amongB(w, p, TrLAr) else None
  private def mNUz(w: String, p: Int) =
    if (trHarmony(w, p)) amongB(w, p, TrNUz) else None
  private def mDUr(w: String, p: Int) =
    if (trHarmony(w, p)) amongB(w, p, TrDUr) else None
  private def mCAsInA(w: String, p: Int) = amongB(w, p, TrCAsInA)
  private def mYDU(w: String, p: Int) =
    if (trHarmony(w, p)) amongB(w, p, TrYDU).flatMap(trOptCons(w, _, 'y')) else None
  private def mYsA(w: String, p: Int) = amongB(w, p, TrYsA).flatMap(trOptCons(w, _, 'y'))
  private def mYmUs(w: String, p: Int) =
    if (trHarmony(w, p)) amongB(w, p, TrYmUs).flatMap(trOptCons(w, _, 'y')) else None
  private def mYken(w: String, p: Int) = amongB(w, p, Seq("ken")).flatMap(trOptCons(w, _, 'y'))

  /** Backwards-mode slice state: ket tracks the right bracket; slices may
    * be mid-string inside the recursive ki chain. */
  private final class TrSt(var w: String) {
    var cur: Int = w.length
    var ket: Int = w.length
    def mark(): Unit = { ket = cur }
    def del(): Unit = { w = w.substring(0, cur) + w.substring(ket); ket = cur }
  }

  /** stem_nominal_verb_suffixes (TurkishStemmer.cs:1361) — returns the
    * continue_stemming_noun_suffixes flag. */
  private def trNominalVerb(st: TrSt): Boolean = {
    st.mark()
    val w = st.w; val c0 = st.cur
    def fin(p: Int): Unit = { st.cur = p; st.del() }
    // A: -(y)mUş / -(y)DU / -(y)sA / -(y)ken
    (mYmUs(w, c0) orElse mYDU(w, c0) orElse mYsA(w, c0) orElse mYken(w, c0)) match {
      case Some(p) => fin(p); return true
      case None =>
    }
    // B: -cAsInA [person] -(y)mUş
    mCAsInA(w, c0).flatMap { p1 =>
      val pm = (mSUnUz(w, p1) orElse mLAr(w, p1) orElse mYUm(w, p1)
        orElse mSUn(w, p1) orElse mYUz(w, p1)).getOrElse(p1)
      mYmUs(w, pm)
    } match {
      case Some(p) => fin(p); return true
      case None =>
    }
    // C: -lAr [+ copula] — stops further noun stemming
    mLAr(w, c0) match {
      case Some(p1) =>
        st.cur = p1; st.del()
        st.mark()
        val w2 = st.w; val c2 = st.cur
        (mDUr(w2, c2) orElse mYDU(w2, c2) orElse mYsA(w2, c2) orElse mYmUs(w2, c2)) match {
          case Some(p2) => st.cur = p2
          case None => st.cur = c2
        }
        st.del()
        return false
      case None =>
    }
    // D: -nUz + (-(y)DU | -(y)sA)
    mNUz(w, c0).flatMap(p => mYDU(w, p) orElse mYsA(w, p)) match {
      case Some(p) => fin(p); return true
      case None =>
    }
    // E: person suffix [+ -(y)mUş]
    (mSUnUz(w, c0) orElse mYUz(w, c0) orElse mSUn(w, c0) orElse mYUm(w, c0)) match {
      case Some(p) =>
        st.cur = p; st.del()
        st.mark()
        val w2 = st.w
        mYmUs(w2, w2.length) match {
          case Some(p2) => st.cur = p2
          case None => st.cur = w2.length
        }
        st.del()
        return true
      case None =>
    }
    // F: -DUr [+ person + -(y)mUş]
    mDUr(w, c0) match {
      case Some(p) =>
        st.cur = p; st.del()
        st.mark()
        val w2 = st.w; val c2 = st.cur
        val pa = (mSUnUz(w2, c2) orElse mLAr(w2, c2) orElse mYUm(w2, c2)
          orElse mSUn(w2, c2) orElse mYUz(w2, c2)).getOrElse(c2)
        mYmUs(w2, pa) match {
          case Some(p2) => st.cur = p2
          case None => st.cur = c2
        }
        st.del()
        true
      case None => true // routine failed — no change, flag stays true
    }
  }

  /** stem_suffix_chain_before_ki (TurkishStemmer.cs:1682) — recursive. */
  private def trChainKi(st: TrSt): Boolean = {
    st.mark()
    val w = st.w; val c0 = st.cur
    val pk = mKi(w, c0) match {
      case None => return false
      case Some(p) => p
    }
    // alt1: -DA+ki
    mDA(w, pk) match {
      case Some(p1) =>
        st.cur = p1; st.del()
        // try( ([lAr] del try(chain)) or ([poss] del try([lAr] del chain)) )
        st.mark()
        val w1 = st.w; val c1 = st.cur
        mLAr(w1, c1) match {
          case Some(p2) =>
            st.cur = p2; st.del()
            val saved = st.cur
            if (!trChainKi(st)) st.cur = saved
          case None =>
            mPoss(w1, c1) match {
              case Some(p3) =>
                st.cur = p3; st.del()
                st.mark()
                val w2 = st.w; val c2 = st.cur
                mLAr(w2, c2) match {
                  case Some(p4) =>
                    st.cur = p4; st.del()
                    val saved = st.cur
                    if (!trChainKi(st)) st.cur = saved
                  case None => st.cur = c2
                }
              case None => st.cur = c1
            }
        }
        return true
      case None =>
    }
    // alt2: -nUn+ki
    mNUn(w, pk) match {
      case Some(p1) =>
        st.cur = p1; st.del()
        st.mark()
        val w1 = st.w; val c1 = st.cur
        mLArI(w1, c1) match {
          case Some(p2) => st.cur = p2; st.del()
          case None =>
            (mPoss(w1, c1) orElse mSU(w1, c1)) match {
              case Some(p3) =>
                st.cur = p3; st.del()
                st.mark()
                val w2 = st.w; val c2 = st.cur
                mLAr(w2, c2) match {
                  case Some(p4) =>
                    st.cur = p4; st.del()
                    val saved = st.cur
                    if (!trChainKi(st)) st.cur = saved
                  case None => st.cur = c2
                }
              case None =>
                st.cur = c1
                val saved = st.cur
                if (!trChainKi(st)) st.cur = saved
            }
        }
        return true
      case None =>
    }
    // alt3: -ndA+ki (the ndA+ki material itself is only deleted on the
    // lArI/sU sub-branches — exact decoded behavior)
    mNdA(w, pk) match {
      case Some(p1) =>
        mLArI(w, p1) match {
          case Some(p2) => st.cur = p2; st.del(); true
          case None =>
            mSU(w, p1) match {
              case Some(p3) =>
                st.cur = p3; st.del()
                st.mark()
                val w2 = st.w; val c2 = st.cur
                mLAr(w2, c2) match {
                  case Some(p4) =>
                    st.cur = p4; st.del()
                    val saved = st.cur
                    if (!trChainKi(st)) st.cur = saved
                  case None => st.cur = c2
                }
                true
              case None =>
                st.cur = p1
                trChainKi(st)
            }
        }
      case None => false
    }
  }

  /** [lAr] delete (chain required) — shared tail used by several
    * noun-suffix branches: try([mark_lAr] delete stem_chain_before_ki). */
  private def trTryLArChain(st: TrSt): Unit = {
    st.mark()
    val w = st.w; val c = st.cur
    mLAr(w, c) match {
      case Some(p) =>
        st.cur = p; st.del()
        val saved = st.cur
        if (!trChainKi(st)) st.cur = saved
      case None => st.cur = c
    }
  }

  /** stem_noun_suffixes (TurkishStemmer.cs:1943) — ten ordered
    * alternatives, decoded exactly. */
  private def trNounSuffixes(st: TrSt): Boolean = {
    val w = st.w; val c0 = st.cur

    // 1: [lAr] del try(chain)
    mLAr(w, c0) match {
      case Some(p) =>
        st.mark(); st.cur = p; st.del()
        val saved = st.cur
        if (!trChainKi(st)) st.cur = saved
        return true
      case None =>
    }
    // 2: [ncA] del try( ([lArI] del) or ([poss|sU] del try([lAr] del chain))
    //                   or ([lAr] del chain) )
    mNcA(w, c0) match {
      case Some(p) =>
        st.mark(); st.cur = p; st.del()
        val w1 = st.w; val c1 = st.cur
        mLArI(w1, c1) match {
          case Some(p2) => st.mark(); st.cur = p2; st.del()
          case None =>
            (mPoss(w1, c1) orElse mSU(w1, c1)) match {
              case Some(p3) =>
                st.mark(); st.cur = p3; st.del()
                trTryLArChain(st)
              case None =>
                mLAr(w1, c1) match {
                  case Some(p4) =>
                    st.mark(); st.cur = p4; st.del()
                    val saved = st.cur
                    if (!trChainKi(st)) st.cur = saved
                  case None => st.cur = c1
                }
            }
        }
        return true
      case None =>
    }
    // 3: [(ndA|nA)] ( (lArI] del) or (sU] del try([lAr] del chain)) or chain )
    (mNdA(w, c0) orElse mNA(w, c0)) match {
      case Some(p1) =>
        var matched = true
        mLArI(w, p1) match {
          case Some(p2) => st.cur = p2; st.del()
          case None =>
            mSU(w, p1) match {
              case Some(p3) =>
                st.cur = p3; st.del()
                trTryLArChain(st)
              case None =>
                st.cur = p1
                if (!trChainKi(st)) { st.cur = c0; matched = false }
            }
        }
        if (matched) return true
      case None =>
    }
    // 4: [(ndAn|nU)] ( (sU] del try([lAr] del chain)) or lArI (no slice) )
    (mNdAn(w, c0) orElse mNU(w, c0)) match {
      case Some(p1) =>
        mSU(w, p1) match {
          case Some(p2) =>
            st.cur = p2; st.del()
            trTryLArChain(st)
            return true
          case None =>
            if (mLArI(w, p1).isDefined) return true // decoded: no deletion
        }
      case None =>
    }
    // 5: [DAn] del try([ (poss] del try([lAr] del chain))
    //                    or (lAr] del try(chain)) or chain ])
    mDAn(w, c0) match {
      case Some(p) =>
        st.mark(); st.cur = p; st.del()
        st.mark()
        val w1 = st.w; val c1 = st.cur
        mPoss(w1, c1) match {
          case Some(p2) =>
            st.cur = p2; st.del()
            trTryLArChain(st)
          case None =>
            mLAr(w1, c1) match {
              case Some(p3) =>
                st.cur = p3; st.del()
                val saved = st.cur
                if (!trChainKi(st)) st.cur = saved
              case None =>
                st.cur = c1
                val saved = st.cur
                if (!trChainKi(st)) st.cur = saved
            }
        }
        return true
      case None =>
    }
    // 6: [(nUn|ylA)] del try( ([lAr] del chain) or
    //                         ([poss|sU] del try([lAr] del chain)) or chain )
    (mNUn(w, c0) orElse mYlA(w, c0)) match {
      case Some(p) =>
        st.mark(); st.cur = p; st.del()
        val w1 = st.w; val c1 = st.cur
        var done = false
        mLAr(w1, c1) match {
          case Some(p2) =>
            st.mark(); st.cur = p2; st.del()
            if (trChainKi(st)) done = true
            else st.cur = st.w.length // lAr already sliced; chain failed
          case None =>
        }
        if (!done) {
          val w2 = st.w; val c2 = w2.length min c1
          (mPoss(w2, c2) orElse mSU(w2, c2)) match {
            case Some(p3) =>
              st.mark(); st.cur = p3; st.del()
              trTryLArChain(st)
            case None =>
              st.cur = c2
              val saved = st.cur
              if (!trChainKi(st)) st.cur = saved
          }
        }
        return true
      case None =>
    }
    // 7: [lArI] del
    mLArI(w, c0) match {
      case Some(p) => st.mark(); st.cur = p; st.del(); return true
      case None =>
    }
    // 8: chain
    st.cur = c0
    if (trChainKi(st)) return true
    st.cur = c0
    // 9: [(DA|yU|yA)] del try([ ((poss] del try([lAr)) or lAr) ] del
    //                           [ chain (required) )
    (mDA(w, c0) orElse mYU(w, c0) orElse mYA(w, c0)) match {
      case Some(p) =>
        st.mark(); st.cur = p; st.del()
        st.mark()
        val w1 = st.w; val c1 = st.cur
        var ok = true
        mPoss(w1, c1) match {
          case Some(p2) =>
            st.cur = p2; st.del()
            st.mark()
            val w2 = st.w; val c2 = st.cur
            mLAr(w2, c2) match {
              case Some(p3) => st.cur = p3
              case None => st.cur = c2
            }
          case None =>
            mLAr(w1, c1) match {
              case Some(p3) => st.cur = p3
              case None => ok = false
            }
        }
        if (ok) {
          st.del()
          val saved = st.cur
          if (!trChainKi(st)) st.cur = saved
        }
        return true
      case None =>
    }
    // 10: [(poss|sU)] del try([lAr] del chain)
    (mPoss(w, c0) orElse mSU(w, c0)) match {
      case Some(p) =>
        st.mark(); st.cur = p; st.del()
        trTryLArChain(st)
        true
      case None => false
    }
  }

  /** post_process_last_consonants: b->p c->ç d->t ğ->k. */
  private def trDevoice(w: String): String =
    if (w.isEmpty) w
    else w.last match {
      case 'b' => w.dropRight(1) + "p"
      case 'c' => w.dropRight(1) + "ç"
      case 'd' => w.dropRight(1) + "t"
      case 'ğ' => w.dropRight(1) + "k"
      case _ => w
    }

  /** append_U_to_stems_ending_with_d_or_g: harmonizing U vowel appended. */
  private def trAppendU(w: String): String = {
    if (w.isEmpty || (w.last != 'd' && w.last != 'g')) return w
    var li = w.length - 1
    while (li >= 0 && !trV(w.charAt(li))) li -= 1
    if (li < 0) return w
    w.charAt(li) match {
      case 'a' | 'ı' => w + "ı"
      case 'e' | 'i' => w + "i"
      case 'o' | 'u' => w + "u"
      case 'ö' | 'ü' => w + "ü"
      case _ => w
    }
  }

  /** Snowball Turkish stemmer (nominal suffix stripper). Input is expected
    * lowercased by TurkishLowerCaseFilter. */
  def turkishStem(word: String): String = {
    if (word.count(trV) < 2) return word // more_than_one_syllable_word
    val st = new TrSt(word)
    val cont = trNominalVerb(st)
    if (!cont) return st.w // continue_stemming_noun_suffixes unset
    st.cur = st.w.length; st.ket = st.w.length
    trNounSuffixes(st)
    val stemmed = st.w
    if (stemmed == "ad" || stemmed == "soyad") return stemmed // is_reserved_word
    trDevoice(trAppendU(stemmed))
  }

  // ================================================================ Irish
  // snowballstem.org/algorithms/irish — initial mutation undo + R1/R2/RV
  // suffix strips. initial_morph and noun_sfx are the published lists;
  // deriv keeps the acht/eacht core; verb_sfx keeps the published person/
  // tense core (DOCUMENTED SUBSET).

  private val GaVowels = "aeiouáéíóú"
  @inline private def gaV(c: Char): Boolean = GaVowels.indexOf(c.toInt) >= 0

  private def standardR(w: String, from: Int, vowel: Char => Boolean): Int = {
    var i = from
    while (i < w.length && !vowel(w.charAt(i))) i += 1
    while (i < w.length && vowel(w.charAt(i))) i += 1
    if (i < w.length) i + 1 else w.length
  }

  /** initial_morph: strip h-/n-/t- prefix markers and undo eclipsis. */
  private[analysis] def irishInitial(w: String): String = {
    if (w.startsWith("n-") || w.startsWith("h-") || w.startsWith("t-")) return w.substring(2)
    if (w.startsWith("bhf")) return w.substring(2) // bhf -> f
    if (w.startsWith("mb")) return w.substring(1)
    if (w.startsWith("gc")) return w.substring(1)
    if (w.startsWith("nd")) return w.substring(1)
    if (w.startsWith("ng")) return w.substring(1)
    if (w.startsWith("bp")) return w.substring(1)
    if (w.startsWith("ts")) return w.substring(1)
    if (w.startsWith("dt")) return w.substring(1)
    w
  }

  private val GaNoun = Seq( // R1 delete
    "aíochta", "íochta", "aíocht", "íocht", "eamh", "eabh", "aibh",
    "aimh", "amh", "abh", "ibh", "imh")
  private val GaDeriv = Seq("eacht", "acht") // R2 delete
  private val GaVerb = Seq( // RV delete — published person/tense core
    "aimid", "aímid", "imid", "ímid", "faidh", "fidh",
    "tear", "tar", "eadh", "adh", "áil")

  def irishStem(word0: String): String = {
    var w = irishInitial(word0)
    val pV = { var i = 0; while (i < w.length && !gaV(w.charAt(i))) i += 1
      if (i < w.length) i + 1 else w.length }
    val r1 = standardR(w, 0, gaV)
    val r2 = standardR(w, r1, gaV)
    def fits(s: String, bound: Int) = w.endsWith(s) && w.length - s.length >= bound
    GaNoun.find(fits(_, r1)) match {
      case Some(s) => w = w.dropRight(s.length)
      case None =>
        GaDeriv.find(fits(_, r2)) match {
          case Some(s) => w = w.dropRight(s.length)
          case None => GaVerb.find(fits(_, pV)).foreach(s => w = w.dropRight(s.length))
        }
    }
    w
  }


  /** Longest-first ordering for subset suffix lists (snowball among
    * longest-match discipline). */
  private def sortedByLen(xs: Seq[String]): Seq[String] = xs.distinct.sortBy(x => (-x.length, x))

  // ============================================================== Catalan
  // snowballstem.org/algorithms/catalan — attached pronouns, standard
  // suffixes (R2), verb suffixes (R1), residual vowels, accent cleaning.
  // Rule lists are the high-frequency core (DOCUMENTED SUBSET).

  private val CaVowels = "aeiouáàéèíïóòúü"
  @inline private def caV(c: Char): Boolean = CaVowels.indexOf(c.toInt) >= 0

  private val CaPronoun: Seq[String] = sortedByLen(Seq(
    "-los", "-les", "-nos", "-vos", "'ns", "-me", "-te", "-se", "-ne",
    "-ho", "-hi", "-la", "-li", "-lo", "-ns", "'hi", "'ho", "'ls",
    "'s", "'l", "'m", "'n", "'t", "-n", "-m", "-t", "-us"))
  private val CaStd: Seq[String] = sortedByLen(Seq( // R2 delete
    "adores", "ancies", "ències", "adora", "àncies", "encies",
    "atges", "ments", "ables", "ibles", "istes", "ismes", "adors",
    "ància", "ència", "itats", "osos", "oses", "ives", "atge", "ment",
    "able", "ible", "ista", "isme", "ador", "itat", "ives", "osa",
    "iva", "ius", "iu", "ós"))
  private val CaStdRepl = Seq( // R2 replace
    "logies" -> "log", "logia" -> "log", "iques" -> "ic", "ica" -> "ic",
    "ics" -> "ic", "qües" -> "c", "íssims" -> "", "íssima" -> "",
    "íssimes" -> "", "íssim" -> "")
  private val CaVerb: Seq[String] = sortedByLen(Seq( // R1 delete
    "aríem", "aríeu", "arien", "essin", "éssim", "éssiu", "essis",
    "àssim", "àssiu", "assis", "aries", "àvem", "àveu", "aven", "aran",
    "arem", "areu", "aria", "ades", "ants", "aves", "íem", "íeu", "ava",
    "ant", "ada", "ats", "int", "its", "ida", "ides", "ien", "ies",
    "eix", "arà", "aré", "és", "às", "ís", "ia", "at", "it", "in",
    "is", "ir", "ar", "er", "re", "és"))
  private val CaResidual: Seq[String] = sortedByLen(Seq("os", "es", "és", "ès", "eu", "iu",
    "is", "a", "o", "á", "à", "í", "ó", "e", "é", "s"))

  def catalanStem(word0: String): String = {
    var w = word0
    val r1 = standardR(w, 0, caV)
    val r2 = standardR(w, r1, caV)
    def fits(s: String, bound: Int) = w.endsWith(s) && w.length - s.length >= bound
    // step 0: attached pronouns (R1)
    CaPronoun.find(fits(_, r1)).foreach(s => w = w.dropRight(s.length))
    // step 1: standard suffixes (R2); else step 2: verb suffixes (R1)
    var removed = false
    CaStdRepl.find { case (s, _) => fits(s, r2) } match {
      case Some((s, to)) => w = w.dropRight(s.length) + to; removed = true
      case None =>
        CaStd.find(fits(_, r2)) match {
          case Some(s) => w = w.dropRight(s.length); removed = true
          case None =>
        }
    }
    if (!removed) CaVerb.find(fits(_, r1)).foreach(s => w = w.dropRight(s.length))
    // step 3: residual suffix (R1)
    CaResidual.find(fits(_, r1)).foreach(s => w = w.dropRight(s.length))
    if (w.endsWith("iqu")) w = w.dropRight(3) + "ic"
    // cleaning: fold accents/diaeresis
    w.map {
      case 'á' | 'à' => 'a'
      case 'é' | 'è' => 'e'
      case 'í' | 'ï' => 'i'
      case 'ó' | 'ò' => 'o'
      case 'ú' | 'ü' => 'u'
      case c => c
    }
  }

  // =============================================================== Basque
  // snowballstem.org/algorithms/basque — aditzak (verb), izenak (noun)
  // case endings in RV/R2. Core declension/verb lists (DOCUMENTED SUBSET).

  private val EuVowels = "aeiou"
  @inline private def euV(c: Char): Boolean = EuVowels.indexOf(c.toInt) >= 0

  private val EuNoun: Seq[String] = sortedByLen(Seq( // RV delete, longest-first: case endings
    "arentzat", "arekin", "entzat", "etako", "etatik", "etara", "aren",
    "ekin", "etan", "ari", "ean", "eko", "era", "ari", "rat", "tik",
    "dik", "ak", "ek", "en", "ei", "an", "az", "ez", "ko", "ra", "a",
    "e", "o"))
  private val EuVerb: Seq[String] = sortedByLen(Seq( // RV delete: nominalized verb endings
    "tzeko", "tzera", "tzea", "tzen", "ten", "tu", "du"))
  private val EuAdj: Seq[String] = sortedByLen(Seq("ago", "egi", "ena")) // R2 delete

  def basqueStem(word0: String): String = {
    var w = word0
    val pV = { var i = 0; while (i < w.length && !euV(w.charAt(i))) i += 1
      if (i < w.length) i + 1 else w.length }
    val r1 = standardR(w, 0, euV)
    val r2 = standardR(w, r1, euV)
    def fits(s: String, bound: Int) = w.endsWith(s) && w.length - s.length >= (bound max 2)
    EuAdj.find(fits(_, r2)).foreach(s => w = w.dropRight(s.length))
    EuVerb.find(fits(_, pV)) match {
      case Some(s) => w = w.dropRight(s.length)
      case None => EuNoun.find(fits(_, pV)).foreach(s => w = w.dropRight(s.length))
    }
    w
  }

  // ============================================================= Armenian
  // snowballstem.org/algorithms/armenian — ending (article), verb,
  // adjective, noun strips inside the vowel-bounded region. Core lists
  // (DOCUMENTED SUBSET).

  private val HyVowels = "աեէըիուօ"
  @inline private def hyV(c: Char): Boolean = HyVowels.indexOf(c.toInt) >= 0

  private val HyEnding: Seq[String] = sortedByLen(Seq("ները", "ների", "ն", "ը", "ս")) // article/determiner
  private val HyVerb: Seq[String] = sortedByLen(Seq(
    "ացել", "եցել", "ացավ", "եցավ", "վում", "ելու", "ալու", "վել",
    "ում", "ել", "ալ", "եց", "աց"))
  private val HyAdj: Seq[String] = sortedByLen(Seq("որեն", "ովին", "բար", "պես"))
  private val HyNoun: Seq[String] = sortedByLen(Seq(
    "ություններում", "ությունների", "ությունները", "ություններ",
    "ությունից", "ությամբ", "ության", "ությունը", "ություն",
    "ներում", "ներին", "ներից", "ներով", "ները", "ների", "ներ",
    "երում", "երին", "երից", "երով", "երը", "երի", "եր",
    "ում", "ով", "ից", "ին", "ան", "ոջ", "վա", "ի"))

  def armenianStem(word0: String): String = {
    var w = word0
    val pV = { var i = 0; while (i < w.length && !hyV(w.charAt(i))) i += 1
      if (i < w.length) i + 1 else w.length }
    def fits(s: String, min: Int) =
      w.endsWith(s) && w.length - s.length >= (pV max min)
    HyEnding.find(fits(_, 3)).foreach(s => w = w.dropRight(s.length))
    HyVerb.find(fits(_, 3)).foreach(s => w = w.dropRight(s.length))
    HyAdj.find(fits(_, 3)).foreach(s => w = w.dropRight(s.length))
    HyNoun.find(fits(_, 3)).foreach(s => w = w.dropRight(s.length))
    w
  }
}
