package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.analysis._
import graft.analysis.LangAnalyzers3._
import graft.analysis.SnowballStemmers2._

/** Rule pins for the third analyzer-catalog wave (Lv/Br/Gl/Ga/Tr/Ca/Eu/Hy
  * — LangAnalyzers3.scala, SnowballStemmers2.scala). Expected values
  * hand-derived from the reference stemmer bodies (Br, Lv unpalatalize,
  * Tr generated Snowball program) and the published snowballstem.org
  * algorithms for the chains whose rule data is absent from the tree. */
class LangAnalyzers3Spec extends AnyFunSuite {

  test("Latvian light stemmer + unpalatalization") {
    assert(latvianStem("galdiem") == "gald")  // plural dative -iem
    assert(latvianStem("ceļiem") == "cel")    // -iem palatalizes: ļ -> l
    assert(latvianStem("mājām") == "māj")
    assert(latvianStem("mājas") == "māj")
    assert(latvianStem("zivis") == "ziv")
    assert(latvianStem("skolās") == "skol")
    assert(latvianStem("lāči") == "lāc")      // -i palatalizes: č -> c
    assert(latvianStem("uz") == "uz")         // 3-char stem minimum
    assert(latvianStem("iela") == "iel")      // -a palatalizing affix, no rule fires
  }

  test("Latvian keeps a vowel in the stem") {
    // numVowels(word) > numVowels(affix) guard: "tās" minus "ās" would
    // leave vowel-less "t" — affix must not fire (also < 3 chars)
    assert(latvianStem("tās") == "tās")
  }

  test("Brazilian stemmer (reference body semantics)") {
    assert(brazilianStem("meninas") == "menin")
    assert(brazilianStem("casas") == "cas")
    assert(brazilianStem("trabalhador") == "trabalh")  // -ador R2
    assert(brazilianStem("falando") == "fal")          // -ando verb
    assert(brazilianStem("chegou") == "cheg")          // -ou verb
    assert(brazilianStem("lealdade") == "lealdad")
    assert(brazilianStem("quilométricas") == "quilometr") // fold + -icas
    assert(brazilianStem("nacionalidade") == "nacional")  // -idade R2
    assert(brazilianStem("aa") == "aa")                // < 3 not indexable
  }

  test("Galician plural (RSLP-S) and full chain") {
    assert(galicianPluralStem("camións") == "camión")
    assert(galicianPluralStem("animais") == "animal")
    assert(galicianPluralStem("luces") == "luz")
    assert(galicianPluralStem("mulleres") == "muller")
    assert(galicianPluralStem("casas") == "casa")
    assert(galicianPluralStem("papeis") == "papel")
    assert(galicianStem("traballadores") == "traballador")
    assert(galicianStem("rapidamente") == "rapid")   // adverb -mente
    assert(galicianStem("cancións") == "canci")      // plural + -ón + fold
  }

  test("Irish initial mutation, lowercase and stemmer") {
    assert(irishStem("bhfuil") == "fuil")   // eclipsis bhf -> f
    assert(irishStem("gcarr") == "carr")
    assert(irishStem("n-athair") == "athair")
    assert(LangAnalyzers3b.irishLowerCase("nAthair") == "n-athair") // n+upper vowel
    assert(LangAnalyzers3b.irishLowerCase("tUISCE") == "t-uisce")
    assert(LangAnalyzers3b.irishLowerCase("Éire") == "éire")
    assert(irishStem("filíocht") == "fil")            // -íocht R1
    assert(irishStem("bainisteoireacht") == "bainisteoir") // -eacht R2
  }

  test("Turkish lowercase (dotless I) and apostrophe") {
    import LangAnalyzers3b._
    assert(turkishLowerCase("Istanbul") == "ıstanbul") // bare I -> dotless
    assert(turkishLowerCase("İstanbul") == "istanbul") // İ -> i
    assert(turkishLowerCase("DİYARBAKIR") == "diyarbakır")
    assert(turkishLowerCase("İstanbul") == "istanbul") // I + combining dot
    assert(apostropheStrip("Zonguldak'a") == "Zonguldak")
    assert(apostropheStrip("Türkiye’nin") == "Türkiye")
  }

  test("Turkish Snowball stemmer (generated-program semantics)") {
    assert(turkishStem("kitaplar") == "kitap")       // -lAr
    assert(turkishStem("kitabı") == "kitap")         // -sU/-yU strip + devoice b->p
    assert(turkishStem("kitapları") == "kitap")      // -lArI
    assert(turkishStem("kitaplarında") == "kitap")   // -ndA + lArI chain
    assert(turkishStem("evleri") == "ev")
    assert(turkishStem("gözlerimin") == "göz")       // -nUn + poss + lAr
    assert(turkishStem("çocuklar") == "çocuk")
    assert(turkishStem("okuldaki") == "okul")        // -DA+ki chain
    assert(turkishStem("aldım") == "al")             // -(y)DU nominal verb
    assert(turkishStem("geldi") == "gel")
    assert(turkishStem("ev") == "ev")                // < 2 syllables untouched
    assert(turkishStem("güzellik") == "güzellik")    // derivational -lik kept
  }

  test("Catalan stemmer and elision") {
    assert(catalanStem("catalanes") == "catalan")
    assert(catalanStem("cases") == "cas")
    assert(catalanStem("portàvem") == "port")        // verb -àvem
    assert(catalanStem("cantaria") == "cant")        // verb -aria
    assert(catalanStem("nacions") == "nacion")
    assert(catalanStem("aigua") == "aigu")           // residual vowel
    assert(LangAnalyzers3b.elide("l'aigua", LangAnalyzers3b.CatalanArticles) == "aigua")
    assert(LangAnalyzers3b.elide("d'estiu", LangAnalyzers3b.CatalanArticles) == "estiu")
    assert(LangAnalyzers3b.elide("x'abc", LangAnalyzers3b.CatalanArticles) == "x'abc")
  }

  test("Basque stemmer") {
    assert(basqueStem("etxea") == "etxe")         // absolutive -a
    assert(basqueStem("etxeak") == "etxe")        // plural -ak
    assert(basqueStem("mendietan") == "mendi")    // inessive plural -etan
    assert(basqueStem("liburuarekin") == "liburu") // comitative -arekin
    assert(basqueStem("ikasteko") == "ikast")     // case -eko inside the verb form
  }

  test("Armenian stemmer") {
    assert(armenianStem("գրքերը") == "գրքեր")       // article -ը
    assert(armenianStem("տներում") == "տներ")        // locative -ում
    assert(armenianStem("քաղաքից") == "քաղաք")      // ablative -ից
    assert(armenianStem("ուսանողները") == "ուսանող") // -ները article+plural
  }

  test("full chains: positions survive stops and elision") {
    val ga = Analyzers.byName("irish").tokenize("nAthair agus filíocht")
      .map(t => s"${t.term}@${t.position}").toList
    assert(ga == List("athair@0", "fil@2")) // agus stopped at 1
    val tr = Analyzers.byName("turkish").tokenize("İstanbul'da ve kitapları")
      .map(t => s"${t.term}@${t.position}").toList
    assert(tr == List("istanbul@0", "kitap@2")) // ve stopped at 1
    val ca = Analyzers.byName("catalan").tokenize("catalanes i l'aigua")
      .map(t => s"${t.term}@${t.position}").toList
    assert(ca == List("catalan@0", "aigu@2")) // i stopped at 1
    val br = Analyzers.byName("brazilian").tokenize("meninas de trabalhador")
      .map(t => s"${t.term}@${t.position}").toList
    assert(br == List("menin@0", "trabalh@2")) // de stopped at 1
  }

  test("Chinese unigram chain: no position gap at dropped tokens") {
    val toks = Analyzers.byName("chinese").tokenize("数据 the 模型 x 42 word")
      .map(t => s"${t.term}@${t.position}").toList
    // "the" stopped, "x" 1-letter English dropped, "42" numeric dropped —
    // all WITHOUT gaps (pre-posIncr ChineseFilter semantics)
    assert(toks == List("数@0", "据@1", "模@2", "型@3", "word@4"))
  }

  test("chains registered by name") {
    for (n <- Seq("latvian", "brazilian", "galician", "galician_minimal",
                  "irish", "turkish", "catalan", "basque", "armenian", "chinese"))
      assert(Analyzers.byName(n).tokenize("abc def").nonEmpty)
  }
}
