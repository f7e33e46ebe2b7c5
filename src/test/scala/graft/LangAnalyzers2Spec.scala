package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.analysis._
import graft.analysis.LangAnalyzers2._

/** Rule pins for the second analyzer-catalog wave (Fi/Hu/Cz/Bg/Hi/Ar/Fa/Id
  * — LangAnalyzers2.scala). Expected values hand-derived from the published
  * rule sets the reference implements. */
class LangAnalyzers2Spec extends AnyFunSuite {

  test("Finnish light stemmer") {
    assert(finnishLightStem("talossa") == "talo")   // -ssa case
    assert(finnishLightStem("taloissa") == "talo")  // plural conflates
    assert(finnishLightStem("kirjassa") == "kirj")  // final -a dropped
    assert(finnishLightStem("autossa") == "auto")
    assert(finnishLightStem("vesi") == "ves")       // norm1 final i
    assert(finnishLightStem("tä") == "tä")          // < 4 untouched
    assert(finnishLightStem("väestöstä") == "vaesto") // ä/ö fold + -sta
  }

  test("Hungarian light stemmer") {
    assert(hungarianLightStem("házakban") == "haz") // á fold, -ban, plural -k
    assert(hungarianLightStem("kertekben") == "ker")
    assert(hungarianLightStem("alma") == "alm")
  }

  test("Czech stemmer") {
    assert(czechStem("studentech") == "student")
    assert(czechStem("městech") == "měst")
    assert(czechStem("škola") == "škol")
    assert(czechStem("matčin") == "matk")  // -in possessive, then č -> k
  }

  test("Bulgarian stemmer") {
    assert(bulgarianStem("градовете") == "град") // article -те, plural -ове
    assert(bulgarianStem("книгите") == "книг")
    assert(bulgarianStem("страна") == "стран")
  }

  test("Hindi normalizer and stemmer") {
    assert(hindiNormalize("और") == "ओर")        // औ -> ओ
    assert(hindiNormalize("नीली") == "निलि")     // ी -> ि
    assert(hindiStem(hindiNormalize("किताबें")) == "किताब")
    assert(hindiStem(hindiNormalize("कमरे")) == "कमर")
  }

  test("Arabic normalizer and stemmer") {
    assert(arabicStem(arabicNormalize("الكتاب")) == "كتاب") // al- prefix
    assert(arabicStem(arabicNormalize("والقلم")) == "قلم")  // wal- prefix
    assert(arabicStem(arabicNormalize("مكتبة")) == "مكتب")  // teh marbuta -> heh, -ه suffix
    assert(arabicNormalize("أحمد") == "احمد")               // hamza alef -> alef
  }

  test("Persian normalizer") {
    assert(persianNormalize(arabicNormalize("کتابی")) == "كتابي") // keheh + farsi yeh
    assert(persianNormalize(arabicNormalize("قلمها")) == "قلمها")
  }

  test("Indonesian stemmer") {
    assert(indonesianStem("membaca") == "baca")     // mem- first-order
    assert(indonesianStem("berjalan") == "jalan")   // ber- second-order
    assert(indonesianStem("bukunya") == "buku")     // -nya possessive
    assert(indonesianStem("kemenangan") == "menang") // ke- + -an interaction
    assert(indonesianStem("buku") == "buku")        // 2 syllables untouched
  }

  test("Greek lowercase fold and stemmer") {
    import graft.analysis.GreekStemmer
    assert(GreekStemmer.greekLowerCase("Υπολογιστές") == "υπολογιστεσ")
    assert(GreekStemmer.greekLowerCase("ΘΆΛΑΣΣΑ") == "θαλασσα")
    assert(GreekStemmer.stem("υπολογιστεσ") == "υπολογιστ") // rule21 -εσ
    assert(GreekStemmer.stem("υπολογιστησ") == "υπολογιστ") // rule21 -ησ: same stem
    assert(GreekStemmer.stem("θαλασσα") == "θαλασσ")        // rule21 final vowel
    assert(GreekStemmer.stem("γεγονοτα") == "γεγον")        // rule0 irregular
    assert(GreekStemmer.stem("παιδια") == "παιδ")           // rule5 -ια (consonant stem)
    assert(GreekStemmer.stem("πλατεια") == "πλατει")        // rule5 adds -ι back after vowel
    assert(GreekStemmer.stem("φωσ") == "φωσ")               // len < 4 untouched
    assert(GreekStemmer.stem("ομορφοτερη") == "ομορφ")      // rule21 vowel + rule22 -οτερ
  }

  test("Sorani normalizer and stemmer") {
    assert(soraniNormalize("كتاب") == "کتاب")   // kaf -> keheh
    assert(soraniNormalize("ياد") == "یاد")      // yeh -> farsi yeh
    assert(soraniNormalize("ره") == "ڕە")        // initial reh -> rreh, final heh -> AE
    assert(soraniStem(soraniNormalize("پیاوەکان")) == "پیاو") // definite plural
    assert(soraniStem(soraniNormalize("کتێبەکە")) == "کتێب")  // definite singular
    assert(soraniStem(soraniNormalize("پیاوێک")) == "پیاو")   // indefinite singular
    assert(soraniStem(soraniNormalize("شارێک")) == "شارێک")   // too short to strip (len > 5 guard)
  }

  test("Thai BreakIterator word segmentation") {
    val toks = Analyzers.byName("thai").tokenize("ภาษาไทย hello")
      .map(t => (t.term, t.position)).toList
    assert(toks.last._1 == "hello")
    val thai = toks.init
    assert(thai.nonEmpty)
    assert(thai.map(_._1).mkString == "ภาษาไทย") // segments tile the run exactly
    assert(thai.map(_._2) == thai.indices.toList) // consecutive positions
    assert(toks.last._2 == thai.length) // trailing token shifted past the parts
  }

  test("letter-or-mark tokenizer keeps matras and positions") {
    val toks = Analyzers.byName("hindi").tokenize("किताबें और कलम")
      .map(t => s"${t.term}@${t.position}").toList
    assert(toks == List("किताब@0", "कलम@2")) // और stopped at position 1
  }

  test("chains registered by name") {
    for (n <- Seq("finnish", "hungarian", "czech", "bulgarian", "hindi",
                  "arabic", "persian", "indonesian"))
      assert(Analyzers.byName(n).tokenize("abc def").nonEmpty)
  }
}
