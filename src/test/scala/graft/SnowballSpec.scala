package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.analysis._
import graft.analysis.SnowballStemmers._

/** Snowball stemmer conformance — expected values from the published sample
  * vocabularies at snowballstem.org (the same algorithms behind the
  * reference's generated Tartarus stemmers,
  * /root/reference/src/Lucene.Net.Analysis.Common/Analysis/Snowball/).
  */
class SnowballSpec extends AnyFunSuite {

  test("Porter2 (Snowball English) sample vocabulary") {
    val pairs = Seq(
      "caresses" -> "caress", "flies" -> "fli", "dies" -> "die",
      "mules" -> "mule", "denied" -> "deni", "died" -> "die",
      "agreed" -> "agre", "owned" -> "own", "humbled" -> "humbl",
      "sized" -> "size", "meeting" -> "meet", "stating" -> "state",
      "itemization" -> "item", "sensational" -> "sensat",
      "traditional" -> "tradit", "reference" -> "refer",
      "colonizer" -> "colon", "plotted" -> "plot", "running" -> "run",
      "hopping" -> "hop", "national" -> "nation", "rational" -> "ration",
      "valenci" -> "valenc", "hesitanci" -> "hesit",
      "digitizer" -> "digit", "conformabli" -> "conform",
      "radicalli" -> "radic", "differentli" -> "differ",
      "vileli" -> "vile", "analogousli" -> "analog",
      "operator" -> "oper", "feudalism" -> "feudal",
      "decisiveness" -> "decis", "hopefulness" -> "hope",
      "callousness" -> "callous", "formaliti" -> "formal",
      "sensitiviti" -> "sensit", "sensibiliti" -> "sensibl",
      // exceptional forms
      "skis" -> "ski", "skies" -> "sky", "dying" -> "die",
      "lying" -> "lie", "news" -> "news", "sky" -> "sky",
      "inning" -> "inning", "proceed" -> "proceed",
      // short-word e-restoration and y handling
      "hoping" -> "hope", "cry" -> "cri", "by" -> "by", "say" -> "say")
    pairs.foreach { case (w, want) =>
      assert(porter2(w) == want, s"porter2($w)")
    }
  }

  test("Snowball Dutch sample vocabulary") {
    val pairs = Seq(
      "katten" -> "kat", "boeken" -> "boek", "lopen" -> "lop",
      "huizen" -> "huiz", "straten" -> "strat",
      "lichamelijk" -> "licham", "lichamelijkheden" -> "licham",
      "opheffen" -> "opheff", "opheffende" -> "opheff")
    pairs.foreach { case (w, want) => assert(dutchStem(w) == want, s"dutch($w)") }
  }

  test("Snowball Swedish sample vocabulary") {
    val pairs = Seq(
      "katterna" -> "katt", "bilarna" -> "bil", "flickorna" -> "flick",
      "hundarna" -> "hund", "husen" -> "hus", "jaktkarlarne" -> "jaktkarl",
      "klokhet" -> "klok", "klokheten" -> "klok", "vackrast" -> "vackr",
      "vackraste" -> "vackr")
    pairs.foreach { case (w, want) => assert(swedishStem(w) == want, s"swedish($w)") }
  }

  test("Snowball Russian sample vocabulary") {
    val pairs = Seq(
      "книги" -> "книг", "домах" -> "дом", "столов" -> "стол",
      "красивая" -> "красив", "важная" -> "важн",
      "важность" -> "важност",
      // perfective gerund: прочитав ends the group-2 'в'? no — group-1 'в'
      // preceded by 'а' (kept): прочитав -> прочита
      "прочитав" -> "прочита")
    pairs.foreach { case (w, want) => assert(russianStem(w) == want, s"russian($w)") }
  }

  test("Snowball Danish sample vocabulary") {
    val pairs = Seq(
      "bogen" -> "bog", "husene" -> "hus", "kattene" -> "kat",
      "bilerne" -> "bil", "dagene" -> "dag", "venligst" -> "ven",
      "afstemning" -> "afstemning")
    pairs.foreach { case (w, want) => assert(danishStem(w) == want, s"danish($w)") }
  }

  test("Snowball Norwegian sample vocabulary") {
    val pairs = Seq(
      "huset" -> "hus", "bøkene" -> "bøk", "jentene" -> "jent",
      "guttane" -> "gutt", "billett" -> "billett", "billetter" -> "billett")
    pairs.foreach { case (w, want) => assert(norwegianStem(w) == want, s"norwegian($w)") }
  }

  test("Snowball Finnish sample vocabulary") {
    import graft.analysis.SnowballStemmers.finnishStem
    assert(finnishStem("talossa") == "talo")       // -ssa case ending
    assert(finnishStem("taloissa") == "talo")      // plural: -ssa then i_plural
    assert(finnishStem("autossa") == "auto")
    assert(finnishStem("kirjassa") == "kirj")      // tidy drops AEI after consonant
    assert(finnishStem("käsissä") == "käs")        // -ssä + i_plural
    assert(finnishStem("järjestelmän") == "järjestelm") // -n + tidy ä
    assert(finnishStem("taloko") == "talo")        // -ko particle after vowel
    assert(finnishStem("vesi") == "vesi")          // no case ending inside R1
    assert(finnishStem("takkien") == "tak")        // 'n'+ie, i_plural, undouble
  }

  test("Snowball Hungarian sample vocabulary") {
    import graft.analysis.SnowballStemmers.hungarianStem
    assert(hungarianStem("házakban") == "ház")   // -ban case + -ak plural
    assert(hungarianStem("kertekben") == "kert") // -ben case + -ek plural
    assert(hungarianStem("alma") == "alm")       // sing_owner final -a
    assert(hungarianStem("almák") == "alma")     // plural -ák -> a
    assert(hungarianStem("házak") == "ház")      // plural -ak
    assert(hungarianStem("gépekkel") == "gép")   // instrum -el + undouble, then plural -ek
  }

  test("Snowball Romanian sample vocabulary") {
    import graft.analysis.SnowballStemmers.romanianStem
    assert(romanianStem("studenţilor") == "studenţ") // step_0 -ilor -> i, vowel drop
    assert(romanianStem("oraşelor") == "oraş")       // -elor -> e, vowel drop
    assert(romanianStem("lucrează") == "lucr")       // verb -ează after consonant
    assert(romanianStem("frumoasă") == "frumoas")    // final ă in RV
    assert(romanianStem("studenții") == "studenţ")   // comma-below normalizes; -ii -> i
    assert(romanianStem("abilitate") == "abil")      // combo suffix
  }

  test("CJK bigram chain: runs bigram, singletons stay, gaps preserved") {
    val a = Analyzers.byName("cjk")
    assert(a.tokenize("数据系统 the engine").map(t => s"${t.term}@${t.position}").toList ==
      List("数据@0", "据系@1", "系统@2", "engine@4"))
    // a lone CJK char between non-CJK words stays a unigram
    assert(a.tokenize("alpha 数 beta").map(t => s"${t.term}@${t.position}").toList ==
      List("alpha@0", "数@1", "beta@2"))
    // two separate runs do not bridge across intervening latin text
    assert(a.tokenize("数据 x 系统").map(_.term).toList ==
      List("数据", "x", "系统"))
  }

  test("language chains: stops drop with position gaps, stems apply") {
    val en = Analyzers.byName("english_snowball")
      .tokenize("The data of running systems joined quickly")
      .map(t => s"${t.term}@${t.position}").toList
    assert(en == List("data@1", "run@3", "system@4", "join@5", "quick@6"))

    val nl = Analyzers.byName("dutch")
      .tokenize("De katten en boeken lopen straten")
      .map(t => s"${t.term}@${t.position}").toList
    assert(nl == List("kat@1", "boek@3", "lop@4", "strat@5"))

    val sv = Analyzers.byName("swedish")
      .tokenize("Det är bilarna och katterna i husen flickorna")
      .map(t => s"${t.term}@${t.position}").toList
    assert(sv == List("bil@2", "katt@4", "hus@6", "flick@7"))

    val ru = Analyzers.byName("russian")
      .tokenize("и книги в домах столов красивая")
      .map(t => s"${t.term}@${t.position}").toList
    assert(ru == List("книг@1", "дом@3", "стол@4", "красив@5"))
  }
}
