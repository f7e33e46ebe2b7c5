package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.analysis._
import graft.analysis.TokenFilters._
import graft.build.IndexBuilder
import graft.search._
import java.nio.file.Files

/** Analysis-chain filter catalog: Porter stemming (pinned to the published
  * algorithm's examples — Porter 1980, the same algorithm as the reference's
  * En/PorterStemmer.cs), ASCII folding, shingles, character n-grams, synonym
  * injection, and the `english` analyzer end-to-end through the index.
  */
class TokenFilterSpec extends AnyFunSuite {

  test("Porter stemmer matches the published algorithm's examples") {
    val vectors = Map(
      // step 1a/1b/1c examples
      "caresses" -> "caress", "ponies" -> "poni", "ties" -> "ti", "cats" -> "cat",
      "feed" -> "feed", "agreed" -> "agre", "plastered" -> "plaster",
      "motoring" -> "motor", "sing" -> "sing", "happy" -> "happi", "sky" -> "sky",
      "hopping" -> "hop", "tanned" -> "tan", "falling" -> "fall",
      "hissing" -> "hiss", "failing" -> "fail", "filing" -> "file",
      // steps 2-5 full-word outcomes
      "relational" -> "relat", "conditional" -> "condit", "rational" -> "ration",
      "electricity" -> "electr", "hopefulness" -> "hope",
      "generalization" -> "gener", "oscillators" -> "oscil",
      "controlling" -> "control", "roll" -> "roll", "sensibility" -> "sensibl",
      "argument" -> "argument", "adjustment" -> "adjust", "dependent" -> "depend",
      "adoption" -> "adopt", "communism" -> "commun", "effective" -> "effect",
      "probate" -> "probat", "rate" -> "rate", "cease" -> "ceas",
      "element" -> "element")
    vectors.foreach { case (in, expected) =>
      assert(PorterStemmer.stem(in) == expected, s"stem($in)")
    }
  }

  test("Porter stemmer conflates inflections to one term") {
    val forms = Seq("connect", "connected", "connecting", "connection", "connections")
    assert(forms.map(PorterStemmer.stem).distinct == Seq("connect"))
  }

  test("ASCII folding maps accented Latin to ASCII") {
    assert(foldAscii("café") == "cafe")
    assert(foldAscii("Łódź") == "Lodz")
    assert(foldAscii("straße") == "strasse")
    assert(foldAscii("œuvre") == "oeuvre")
    assert(foldAscii("plain") == "plain")
  }

  private def toks(s: String) = SimpleAnalyzer.tokenize(s)

  test("shingle filter emits word n-grams at the first token's position") {
    val out = shingles(toks("a b c"), maxSize = 2).toList
    assert(out.map(_.term) == List("a", "a b", "b", "b c", "c"))
    assert(out.filter(_.term == "a b").head.position == 0)
    val noUni = shingles(toks("a b c"), maxSize = 3, outputUnigrams = false).toList
    assert(noUni.map(_.term) == List("a b", "a b c", "b c"))
  }

  test("ngram filter emits char n-grams per token at the same position") {
    val out = ngrams(toks("abcd"), 2, 3).toList
    assert(out.map(_.term) == List("ab", "bc", "cd", "abc", "bcd"))
    assert(out.forall(_.position == 0))
  }

  test("synonym filter injects at the same position (overlap semantics)") {
    val out = synonyms(toks("fast car"), Map("fast" -> Seq("quick", "rapid"))).toList
    assert(out.map(_.term) == List("fast", "quick", "rapid", "car"))
    assert(out.take(3).map(_.position).distinct == List(0))
    assert(out.last.position == 1)
    // position-0 overlaps count as one phrase slot: "quick car" matches
    val pos = out.groupBy(_.term).map { case (t, ts) => t -> ts.map(_.position).toArray }
    assert(SpanMatcher.matches(
      SpanNearS(List(SpanTermS("quick"), SpanTermS("car")), 0, inOrder = true), pos))
  }

  test("english analyzer end-to-end: stemmed index matches inflected variants") {
    val spark = SparkTestSession.spark
    val pages = Seq(
      ("u1", "the connection was established"),
      ("u2", "connecting nodes quickly"),
      ("u3", "they connected the wires"),
      ("u4", "an unrelated document about fish"))
    val base = Files.createTempDirectory("graftenglish").toString
    IndexBuilder.build(spark, spark.createDataFrame(pages).toDF("url", "text"), base,
      IndexBuilder.BuildConfig(2, "english"))
    val s = new Searcher(spark, base)
    // query text runs through the SAME analyzer: any inflection matches all
    val hits = s.searchText("connects", 10).collect().map(_.getString(0)).toSet
    assert(hits == Set("u1", "u2", "u3"))
    // oracle identity holds under the english chain too
    val oracle = new graft.oracle.OracleIndex(pages, 2, EnglishAnalyzer)
    val q = TermQ(TokenFilters.PorterStemmer.stem("connection"))
    val o = oracle.search(q, 10).map(h => (h.key, h.score)).toList
    val g = s.search(q, 10).collect().map(r => (r.getString(0), r.getDouble(1).toFloat)).toList
    assert(g == o)
  }

  test("soundex codes the census algorithm incl. the H/W rule") {
    import graft.analysis.TokenFilters.soundex
    assert(soundex("robert") == "R163")
    assert(soundex("rupert") == "R163")
    assert(soundex("smith") == "S530")
    assert(soundex("jones") == "J520")
    assert(soundex("ashcraft") == "A261") // s-c separated by h: coded once
    assert(soundex("tymczak") == "T522")  // vowel separates equal codes
    assert(soundex("pfister") == "P236")  // p-f adjacent equal codes collapse
    assert(soundex("honeyman") == "H555")
    assert(soundex("123") == "123")       // non-alphabetic passes through
  }

  test("soundex filter injects the code at the source position") {
    import graft.analysis.Analyzers
    val toks = Analyzers.byName("soundex").tokenize("robert jones")
      .map(t => s"${t.term}@${t.position}").toList
    assert(toks == List("robert@0", "R163@0", "jones@1", "J520@1"))
  }

  test("refined soundex codes every char without truncation") {
    import graft.analysis.TokenFilters.refinedSoundex
    assert(refinedSoundex("testing") == "T6036084")
    assert(refinedSoundex("robert") == "R901096")
    assert(refinedSoundex("42") == "42") // non-alphabetic passes through
  }

  test("word delimiter splits on case change, numerics and delimiters") {
    import graft.analysis.Analyzers
    val toks = Analyzers.byName("word_delimiter")
      .tokenize("PowerShot-500's zoom WiFi")
      .map(t => s"${t.term}@${t.position}").toList
    assert(toks == List("power@0", "shot@1", "500@2", "zoom@3", "wi@4", "fi@5"))
  }

  test("edge ngrams sit at the source position") {
    import graft.analysis.Analyzers
    val toks = Analyzers.byName("edge23").tokenize("dataset x beam")
      .map(t => s"${t.term}@${t.position}").toList
    // "x" shorter than min=2 emits nothing but keeps its position slot
    assert(toks == List("da@0", "dat@0", "be@2", "bea@2"))
  }

  test("dictionary compound decomposition injects parts at the source position") {
    import graft.analysis.Analyzers
    val toks = Analyzers.byName("compound_fixture").tokenize("fussballspiel heute")
      .map(t => s"${t.term}@${t.position}").toList
    assert(toks == List("fussballspiel@0", "fuss@0", "ball@0", "spiel@0", "heute@1"))
    // onlyLongestMatch keeps one match per start offset
    import graft.analysis.{TokenFilters, SimpleAnalyzer}
    val long = TokenFilters.dictionaryCompound(SimpleAnalyzer.tokenize("fussball"),
      Set("fu", "fuss", "ball"), onlyLongestMatch = true)
      .map(_.term).toList
    assert(long == List("fussball", "fuss", "ball"))
  }

  test("common grams overlay stopword-adjacent bigrams") {
    import graft.analysis.Analyzers
    val toks = Analyzers.byName("commongrams").tokenize("the quick fox")
      .map(t => s"${t.term}@${t.position}").toList
    assert(toks == List("the@0", "the_quick@0", "quick@1", "fox@2"))
  }
}
