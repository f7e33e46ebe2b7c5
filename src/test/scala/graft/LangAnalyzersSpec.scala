package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.analysis._

/** Per-language analyzer chains (Analysis/De, Analysis/Fr): hand-computed
  * goldens for the Savoy light/minimal stemmers, the German2 normalization
  * state machine, elision, language stop sets, and position-gap accounting.
  */
class LangAnalyzersSpec extends AnyFunSuite {

  private def toks(a: Analyzer, text: String): List[(String, Int)] =
    a.tokenize(text).map(t => (t.term, t.position)).toList

  test("German chain: stops drop with gaps, umlauts fold, suffixes strip") {
    assert(toks(GermanAnalyzer, "Die Häuser und Gärten zeigen Bildern") ==
      List("haus" -> 1, "gart" -> 3, "zeig" -> 4, "bild" -> 5))
  }

  test("German normalization: ue-digraph e-deletion, ss for eszett") {
    assert(LangAnalyzers.germanNormalize("mueller") == "muller")
    assert(LangAnalyzers.germanNormalize("grösse") == "grosse")
    assert(LangAnalyzers.germanNormalize("häuser") == "hauser")
    // 'u' after a consonant arms the umlaut state; after a vowel it does not
    assert(LangAnalyzers.germanNormalize("baue") == "baue")
    assert(LangAnalyzers.germanNormalize("größe") == "grosse")
  }

  test("German light stemmer goldens") {
    assert(LangAnalyzers.germanLightStem(LangAnalyzers.germanNormalize("müller")) == "mull")
    assert(LangAnalyzers.germanLightStem("bildern") == "bild")
    assert(LangAnalyzers.germanLightStem("zeigen") == "zeig")
    assert(LangAnalyzers.germanLightStem("felder") == "feld")
    assert(LangAnalyzers.germanLightStem("schönste") == "schon") // -e then -st after stEnding
    assert(LangAnalyzers.germanLightStem("haus") == "haus") // -s only after stEnding; 'u' is not
  }

  test("French chain: elision, stops, light stemming, aux -> al") {
    // light stem: "donnent" collapses its nn run in norm()
    assert(toks(FrenchAnalyzer, "Les auteurs de l'histoire donnent des chevaux") ==
      List("auteu" -> 1, "histoir" -> 3, "donent" -> 4, "cheval" -> 6))
    assert(LangAnalyzers.frenchMinimalStem("journaux") == "journal")
    assert(LangAnalyzers.frenchMinimalStem("belles") == "bel") // -s, -e, then doubled l
    assert(LangAnalyzers.frenchMinimalStem("cinq") == "cinq") // < 6 chars untouched
  }

  test("French light stemmer goldens (suffix rewrites + norm)") {
    assert(LangAnalyzers.frenchLightStem("chevaux") == "cheval")
    assert(LangAnalyzers.frenchLightStem("actrice") == "acteu") // trice->teur, then norm -r
    assert(LangAnalyzers.frenchLightStem("acteurs") == "acteu") // convergent with actrice
    assert(LangAnalyzers.frenchLightStem("heureusement") == "heureus") // -ement, norm -e
    assert(LangAnalyzers.frenchLightStem("nationalisation") == "national")
  }

  test("analyzer catalog registers the language chains") {
    assert(Analyzers.byName("german") eq GermanAnalyzer)
    assert(Analyzers.byName("french") eq FrenchAnalyzer)
  }
}
