package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.analysis._
import graft.analysis.SnowballStemmers3._

/** Vectors for the third Snowball wave (contrib SnowballAnalyzer programs).
  * Each expected value is derived by hand-executing the in-tree generated
  * program's rules (see SnowballStemmers3.scala header). */
class SnowballStemmers3Spec extends AnyFunSuite {

  test("Snowball German: suffix steps and regions") {
    assert(germanStem("häuser") == "haus")       // step1 er in R1, postlude ä->a
    assert(germanStem("bücher") == "buch")       // step1 er, ü->u
    assert(germanStem("katzen") == "katz")       // step1 en
    assert(germanStem("glaubst") == "glaub")     // step2 st after valid st-ending b
    assert(germanStem("kleinste") == "klein")    // step1 e, then step2 st (n-ending)
    assert(germanStem("bedeutung") == "bedeut")  // step3 ung in R2
    assert(germanStem("schönheit") == "schonheit") // heit starts before R2: kept
    assert(germanStem("daß") == "dass")          // prelude ß->ss; s-ending s invalid
  }

  test("Snowball German: R1 floor of 3") {
    // "äße" -> prelude "ässe": first nonvowel-after-vowel region would start
    // at 2; the 3-letter floor moves R1 to 3, so only "e" (pos 3) deletes
    assert(germanStem("äße") == "ass")
  }

  test("Snowball German2: ae/oe/ue folding with qu protection") {
    assert(german2Stem("mueller") == "mull")     // ue->ü then er, postlude ü->u
    assert(germanStem("mueller") == "muell")     // plain German keeps ue
    assert(german2Stem("quelle") == "quell")     // qu protected from ue folding
    assert(german2Stem("haeuser") == "haus")     // ae->ä: same result as häuser
    assert(german2Stem("häuser") == "haus")
  }

  test("Snowball Spanish: pronoun, standard, verb and residual steps") {
    assert(spanishStem("niños") == "niñ")          // residual os in RV
    assert(spanishStem("canciones") == "cancion")  // verb es (no gu)
    assert(spanishStem("corriendo") == "corr")     // verb iendo in RV
    assert(spanishStem("llegue") == "lleg")        // residual e + gu drops u
    assert(spanishStem("atacados") == "atac")      // verb ados
    assert(spanishStem("pudiéramos") == "pud")     // verb iéramos, accent in suffix
    assert(spanishStem("felizmente") == "feliz")   // mente in R2
    assert(spanishStem("rápidamente") == "rapid")  // amente in R1, postlude á->a
    assert(spanishStem("generosidad") == "gener")  // idad in R2, then residual os
    assert(spanishStem("curativas") == "curat")    // ivas; at NOT in R2: kept
    assert(spanishStem("cantándolo") == "cant")    // pronoun lo after ándo->ando, then verb
    assert(spanishStem("paciencia") == "pacienci") // encia starts before R2: residual a only
    assert(spanishStem("tecnologías") == "tecnolog") // logías fails R2 -> verb ías in RV
  }

  test("Snowball Italian: pronoun, standard, verb and vowel steps") {
    assert(italianStem("abbandonata") == "abbandon")  // verb ata in RV
    assert(italianStem("caratteristiche") == "caratterist") // iche in R2
    assert(italianStem("velocemente") == "veloc")     // mente R2, then final e
    assert(italianStem("mangiarlo") == "mang")        // pronoun lo: ar->e, verb are, final i
    assert(italianStem("quando") == "quand")          // qU protection, final o
    assert(italianStem("felicità") == "felic")        // ità in R2
    assert(italianStem("luoghi") == "luog")           // final i, then h after g
  }

  test("Snowball Portuguese: standard, verb, residual and nasal steps") {
    assert(portugueseStem("gato") == "gat")          // residual o in RV
    assert(portugueseStem("gatos") == "gat")         // residual os
    assert(portugueseStem("felizmente") == "feliz")  // mente in R2
    assert(portugueseStem("grandeza") == "grandez")  // eza fails R2 -> residual a
    assert(portugueseStem("vivacidade") == "vivac")  // idade in R2
    assert(portugueseStem("quilométricas") == "quilométr") // icas in R2
    assert(portugueseStem("falaremos") == "fal")     // verb aremos in RV
    assert(portugueseStem("cantando") == "cant")     // verb ando
    assert(portugueseStem("falou") == "fal")         // verb ou
    assert(portugueseStem("primeira") == "primeir")  // eira -> eir (case 9)
    assert(portugueseStem("anunciava") == "anunc")   // verb ava, then ci drops i
    assert(portugueseStem("grande") == "grand")      // residual-form e in RV
    assert(portugueseStem("chegue") == "cheg")       // residual e, gu absorbs u
    assert(portugueseStem("criança") == "crianc")    // residual a, then ç -> c
    assert(portugueseStem("emergência") == "emergent") // ência -> ente, then e
    assert(portugueseStem("ações") == "açõ")         // nasal prelude + verb es + postlude
  }

  test("Snowball French: standard, verb, residual, undouble, unaccent") {
    assert(frenchStem("majestueux") == "majestu")      // eux in R2
    assert(frenchStem("volontairement") == "volontair") // ement in RV
    assert(frenchStem("possibilité") == "possibil")    // ité in R2
    assert(frenchStem("information") == "inform")      // ation in R2
    assert(frenchStem("fabrication") == "fabriqu")     // ation, ic -> iqU outside R2
    assert(frenchStem("heureuse") == "heureux")        // euse -> eux via R1
    assert(frenchStem("voudriez") == "voudr")          // verb iez in RV
    assert(frenchStem("donnerait") == "don")           // verb erait, then onn undoubles
    assert(frenchStem("mangea") == "mang")             // verb a + soft-g e absorbed
    assert(frenchStem("essayait") == "essai")          // Y marking, verb ait, Y -> i
    assert(frenchStem("commença") == "commenc")        // verb a, then ç -> c
    assert(frenchStem("chienne") == "chien")           // residual e, enn undoubles
    assert(frenchStem("perfection") == "perfect")      // residual ion after t in R2
    assert(frenchStem("complètement") == "complet")    // ement, then è unaccents
    assert(frenchStem("finissait") == "fin")           // i-verb issait after non-vowel
  }

  test("Snowball Porter (1980): all steps") {
    assert(snowballPorter("caresses") == "caress")   // 1a sses -> ss
    assert(snowballPorter("ponies") == "poni")       // 1a ies -> i
    assert(snowballPorter("cats") == "cat")          // 1a s
    assert(snowballPorter("feed") == "feed")         // 1b eed outside R1
    assert(snowballPorter("agreed") == "agre")       // 1b eed in R1, 5a drops e
    assert(snowballPorter("bled") == "bled")         // 1b ed without prior vowel
    assert(snowballPorter("conflated") == "conflat") // 1b at -> ate, 5a drops e
    assert(snowballPorter("troubling") == "troubl")  // 1b bl -> ble, 5a drops e
    assert(snowballPorter("hopping") == "hop")       // 1b undouble pp
    assert(snowballPorter("filing") == "file")       // 1b atmark-p1 + shortv adds e
    assert(snowballPorter("falling") == "fall")      // ll never undoubles in 1b
    assert(snowballPorter("sized") == "size")        // 5a keeps e after shortv stem
    assert(snowballPorter("happy") == "happi")       // 1c y after consonant
    assert(snowballPorter("sky") == "sky")           // 1c needs an earlier vowel
    assert(snowballPorter("relational") == "relat")  // 2 ational->ate, 5a e
    assert(snowballPorter("electriciti") == "electr") // 3 iciti->ic, 4 ic
    assert(snowballPorter("feudalism") == "feudal")  // 2 alism->al, 4 al outside R2
    assert(snowballPorter("adoption") == "adopt")    // 4 ion after t in R2
    assert(snowballPorter("controlling") == "control") // 1b ing, 5b ll
    assert(snowballPorter("operator") == "oper")     // 2 ator->ate, 4 ate
  }

  test("Snowball Lovins: endings with retry, undouble, recode") {
    assert(lovinsStem("nationally") == "nat")   // ationally fails B, ionally passes A
    assert(lovinsStem("sitting") == "sit")      // ing (N), undouble tt
    assert(lovinsStem("believes") == "belief")  // es (E), recode iev -> ief
    assert(lovinsStem("analyzed") == "analys")  // ed (E), recode yz -> ys
    assert(lovinsStem("matrix") == "matric")    // recode ix -> ic
    assert(lovinsStem("induction") == "induc")  // ion (Q), recode uct -> uc
    assert(lovinsStem("assumption") == "assum") // ion (Q), recode umpt -> um
  }

  test("Snowball Kp: suffix steps, lengthening, ge-removal, normalize") {
    assert(kpStem("lopen") == "loop")        // en, o lengthens
    assert(kpStem("spelen") == "speel")      // en, e lengthens
    assert(kpStem("legen") == "leeg")        // en, e lengthens at word head
    assert(kpStem("wandelingen") == "wandel") // en then ing; e-lengthen vetoed
    assert(kpStem("maten") == "maat")        // en, a lengthens
    assert(kpStem("huizen") == "huis")       // en, then final z -> s
    assert(kpStem("geven") == "geef")        // en, e lengthens, v -> f
    assert(kpStem("gelukkig") == "luk")      // ig, ge- prefix, kk undoubles
    assert(kpStem("boompje") == "boom")      // diminutive mpje -> m
    assert(kpStem("koninkje") == "koon")     // inkje -> ing, then step-3 ing
    assert(kpStem("koning") == "koon")       // same stem as its diminutive
    assert(kpStem("fotografie") == "fotograaf") // fie -> f attach + lengthen
  }

  test("German chains registered") {
    val de = Analyzers.byName("german_snowball").tokenize("die Häuser und Bücher").map(_.term).toList
    assert(de == List("haus", "buch")) // die/und stopped
    val de2 = Analyzers.byName("german2_snowball").tokenize("die Haeuser").map(_.term).toList
    assert(de2 == List("haus"))
  }

  test("SnowballAnalyzer program-name dispatch resolves all 19 programs") {
    val programs = Seq("Danish", "Dutch", "English", "Finnish", "French",
      "German", "German2", "Hungarian", "Italian", "Kp", "Lovins",
      "Norwegian", "Porter", "Portuguese", "Romanian", "Russian",
      "Spanish", "Swedish", "Turkish")
    programs.foreach { p =>
      assert(Analyzers.snowball(p).tokenize("wasser bücher").nonEmpty, p)
    }
    assert(Analyzers.snowball("French").tokenize("heureuse").map(_.term).toList == List("heureux"))
    assert(Analyzers.snowball("Kp").tokenize("lopen").map(_.term).toList == List("loop"))
    assertThrows[IllegalArgumentException](Analyzers.snowball("Klingon"))
  }

  test("Porter, Lovins and Kp snowball chains registered") {
    val po = Analyzers.byName("porter_snowball").tokenize("the hopping troubling").map(_.term).toList
    assert(po == List("hop", "troubl"))
    val lo = Analyzers.byName("lovins_snowball").tokenize("the believes nationally").map(_.term).toList
    assert(lo == List("belief", "nat"))
    val kp = Analyzers.byName("kp_snowball").tokenize("de lopen en huizen").map(_.term).toList
    assert(kp == List("loop", "huis")) // de/en stopped
  }

  test("Portuguese and French snowball chains registered") {
    val pt = Analyzers.byName("portuguese_snowball").tokenize("a primeira e grandeza").map(_.term).toList
    assert(pt == List("primeir", "grandez")) // a/e stopped
    val fr = Analyzers.byName("french_snowball").tokenize("le donnerait et heureuse").map(_.term).toList
    assert(fr == List("don", "heureux")) // le/et stopped
  }
}
