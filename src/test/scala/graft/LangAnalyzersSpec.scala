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

  test("Spanish chain: stops, light stemming, accent folding, position gaps") {
    assert(toks(SpanishAnalyzer, "Las casas y jardines económicos muestran campos") ==
      List("cas" -> 1, "jardin" -> 3, "economic" -> 4, "muestran" -> 5, "camp" -> 6))
  }

  test("Spanish light stemmer goldens (SpanishLightStemmer.cs rules)") {
    assert(LangAnalyzers.spanishLightStem("campos") == "camp") // vowel+s strips both
    assert(LangAnalyzers.spanishLightStem("casas") == "cas") // -as
    assert(LangAnalyzers.spanishLightStem("veces") == "vez") // -ces -> -z
    assert(LangAnalyzers.spanishLightStem("franceses") == "frances") // -eses -> -es
    assert(LangAnalyzers.spanishLightStem("económico") == "economic") // fold + -o
    assert(LangAnalyzers.spanishLightStem("jardines") == "jardin") // -es
    assert(LangAnalyzers.spanishLightStem("azul") == "azul") // < 5 chars untouched
    assert(LangAnalyzers.spanishLightStem("más") == "más") // < 5: no folding either
    assert(LangAnalyzers.spanishLightStem("muestran") == "muestran") // consonant end
  }

  test("Italian chain: elision, stops, light stemming") {
    assert(toks(ItalianAnalyzer, "Le case e i giardini dell'arte mostrano fioriture") ==
      List("case" -> 1, "giardin" -> 4, "arte" -> 5, "mostran" -> 6, "fioritur" -> 7))
  }

  test("Italian light stemmer goldens (ItalianLightStemmer.cs rules)") {
    assert(LangAnalyzers.italianLightStem("ragazzi") == "ragazz")
    assert(LangAnalyzers.italianLightStem("ragazza") == "ragazz") // conflates
    assert(LangAnalyzers.italianLightStem("pensieri") == "pensier")
    assert(LangAnalyzers.italianLightStem("grandi") == "grand")
    assert(LangAnalyzers.italianLightStem("vecchie") == "vecch") // -ie double strip
    assert(LangAnalyzers.italianLightStem("specchi") == "specc") // -hi double strip
    assert(LangAnalyzers.italianLightStem("occhi") == "occhi") // < 6 untouched
    assert(LangAnalyzers.italianLightStem("città") == "città") // < 6 untouched
  }

  test("Portuguese chain: stops, light stemming, ns -> m") {
    assert(toks(PortugueseAnalyzer, "As casas e os jardins mostram flores") ==
      List("casa" -> 1, "jardim" -> 4, "mostram" -> 5, "flor" -> 6))
  }

  test("Portuguese light stemmer goldens (PortugueseLightStemmer.cs rules)") {
    assert(LangAnalyzers.portugueseLightStem("flores") == "flor") // -es after r
    assert(LangAnalyzers.portugueseLightStem("jardins") == "jardim") // -ns -> -m
    assert(LangAnalyzers.portugueseLightStem("meninas") == "menin") // -s then -a
    assert(LangAnalyzers.portugueseLightStem("corações") == "coraca") // -ões -> -ão, fold
    assert(LangAnalyzers.portugueseLightStem("chapéus") == "chapeu") // bare -s, fold
    assert(LangAnalyzers.portugueseLightStem("formosa") == "formos") // -osa -> -oso, then -o
    assert(LangAnalyzers.portugueseLightStem("formoso") == "formos") // conflates
    assert(LangAnalyzers.portugueseLightStem("rapidamente") == "rapid") // -mente, then -a
    assert(LangAnalyzers.portugueseLightStem("mar") == "mar") // < 4 untouched
  }

  test("analyzer catalog registers the language chains") {
    assert(Analyzers.byName("german") eq GermanAnalyzer)
    assert(Analyzers.byName("french") eq FrenchAnalyzer)
    assert(Analyzers.byName("spanish") eq SpanishAnalyzer)
    assert(Analyzers.byName("italian") eq ItalianAnalyzer)
    assert(Analyzers.byName("portuguese") eq PortugueseAnalyzer)
  }
}
