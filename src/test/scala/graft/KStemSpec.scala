package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.analysis._

/** KStemmer vectors — each pinned against the rule trace of
  * /root/reference/src/Lucene.Net.Analysis.Common/Analysis/En/KStemmer.cs
  * with the documented-subset lexicon (KStem.defaultLexicon). */
class KStemSpec extends AnyFunSuite {

  private def st(w: String): String = new KStemmer().stem(w)

  test("direct conflations apply before any rule") {
    assert(st("dying") === "die")
    assert(st("aging") === "age")
    assert(st("does") === "do")
    assert(st("fled") === "flee")
    assert(st("political") === "politics")
  }

  test("nationality conflations, including via de-pluralization") {
    assert(st("italian") === "italy")
    assert(st("italians") === "italy") // plural() -> lookup hits the mapping
    assert(st("chinese") === "china")
  }

  test("exception words block the -e restoring rules") {
    assert(st("aide") === "aide")
    assert(st("aides") === "aide") // plural -es does NOT check exceptions
    assert(st("aided") === "aid") // pastTense DOES: skips 'aide', finds 'aid'
  }

  test("plural rules") {
    assert(st("flies") === "fly") // -ies -> y
    assert(st("calories") === "calorie") // -ies kept as -ie via dict
    assert(st("cats") === "cat")
    assert(st("bases") === "base") // -es retains the e via dict
    assert(st("bosses") === "boss") // removes -es after a double s
    assert(st("famous") === "famous") // -ous is not a plural
    assert(st("corpus") === "corpus") // -us untouched (penult 'u')
  }

  test("past tense rules") {
    assert(st("tried") === "try") // -ied -> y
    assert(st("tagged") === "tag") // doubled consonant undone via dict
    assert(st("walked") === "walk")
    assert(st("microcoded") === "microcode") // OOV default: restore the e
    assert(st("unfixed") === "unfixed") // un- prefix left alone
  }

  test("aspect (-ing) rules") {
    assert(st("running") === "run") // doubled consonant undone
    assert(st("hissing") === "hiss")
    assert(st("walking") === "walk")
    assert(st("dancing") === "dance") // stem+e found in dictionary
  }

  test("derivational endings resolve through the dictionary") {
    assert(st("government") === "government") // head word: initial dict hit wins
    assert(st("development") === "develop") // -ment removed via dict
    assert(st("resignation") === "resign") // -ation removed
    assert(st("amplification") === "amplify") // -ication -> y
    assert(st("definition") === "define") // -ition -> e
    assert(st("digitization") === "digitize") // -ization -> -ize (supplement dict)
    assert(st("formality") === "formal") // -ality
    assert(st("capacity") === "capacity") // -ity kept: full form is a word
    assert(st("happiness") === "happy") // -ness with i -> y
    assert(st("quickly") === "quick") // -ly removed
    assert(st("electrical") === "electric") // -ical -> -ic
    assert(st("governor") === "govern") // -or removed
    assert(st("runner") === "run") // -er with doubled consonant
    assert(st("agency") === "agent") // -ncy -> -nt
  }

  test("proper nouns ending in s are not de-pluralized") {
    assert(st("dallas") === "dallas")
    assert(st("charles") === "charles")
  }

  test("non-alpha and short terms pass through") {
    assert(st("at&t") === "at&t")
    assert(st("r2d2") === "r2d2")
    assert(st("ab") === "ab")
  }

  test("KStemAnalyzer chain: standard grammar + possessive + kstem") {
    val terms = KStemAnalyzer.terms("The runner's flies tagged")
    assert(terms === List("run", "fly", "tag"))
  }

  test("EnglishMinimalStemmer vectors (EnglishMinimalStemmer.cs)") {
    import TokenFilters.englishMinimalStemWord
    assert(englishMinimalStemWord("cats") === "cat")
    assert(englishMinimalStemWord("flies") === "fly")
    assert(englishMinimalStemWord("foxes") === "foxe") // faithful: only the s drops
    assert(englishMinimalStemWord("corpus") === "corpus") // -us kept
    assert(englishMinimalStemWord("glass") === "glass") // -ss kept
    assert(englishMinimalStemWord("dies") === "dy") // -ies -> y fires at len 4
    assert(englishMinimalStemWord("goes") === "goes") // o before -es kept
    assert(englishMinimalStemWord("is") === "is") // too short
  }

  test("EnglishPossessiveFilter strips ASCII and U+2019 apostrophes") {
    val toks = EnglishPossessiveAnalyzer.terms("Bob’s dog's bowl")
    assert(toks === List("bob", "dog", "bowl"))
  }
}
