package graft

/** Scratch probe for new stemmers (run manually; not a test). */
object StemProbeMain {
  def main(args: Array[String]): Unit = {
    import graft.analysis.SnowballStemmers2._
    import graft.analysis.LangAnalyzers3._
    println("TR: " + Seq("kitaplar", "kitabı", "kitapları", "kitaplarında",
      "arabası", "evleri", "gözlerimin", "çocuklar", "okuldaki", "evdekiler",
      "ağaçlar", "aldım", "geldi", "güzellik", "türkçe").map(w => w + "->" + turkishStem(w)).mkString(" "))
    println("LV: " + Seq("galdiem", "galdus", "mājas", "mājām", "lāči",
      "zivis", "skolās", "vīriem", "ceļiem").map(w => w + "->" + latvianStem(w)).mkString(" "))
    println("BR: " + Seq("meninas", "casas", "bonito", "trabalhador",
      "nacional", "nacionalidade", "falando", "correndo", "propaganda",
      "lealdade", "chegou", "principais", "quilométricas").map(w => w + "->" + brazilianStem(w)).mkString(" "))
    println("GL: " + Seq("camións", "animais", "luces", "mulleres", "casas",
      "papeis").map(w => w + "->" + galicianPluralStem(w)).mkString(" "))
    println("GLF: " + Seq("cancións", "traballadores", "rapidamente").map(w => w + "->" + galicianStem(w)).mkString(" "))
    println("GA: " + Seq("n-athair", "bhfuil", "gcarr", "scoileanna",
      "filíocht", "bainisteoireacht", "imreoimid").map(w => w + "->" + irishStem(w)).mkString(" "))
    println("CA: " + Seq("catalanes", "cases", "portàvem", "cantaria",
      "nacions", "alegria", "l'any", "d'aigua").map(w => w + "->" + catalanStem(w)).mkString(" "))
    println("EU: " + Seq("etxea", "etxeak", "mendietan", "liburuarekin",
      "ikasteko").map(w => w + "->" + basqueStem(w)).mkString(" "))
    println("HY: " + Seq("գրքերը", "տներում", "աշխատանքների", "քաղաքից").map(w => w + "->" + armenianStem(w)).mkString(" "))
    println("TRLOW: " + Seq("Istanbul", "DİYARBAKIR", "İstanbul").map(w => w + "->" + graft.analysis.LangAnalyzers3b.turkishLowerCase(w)).mkString(" "))
    println("GALOW: " + Seq("nAthair", "tUISCE", "Éire").map(w => w + "->" + graft.analysis.LangAnalyzers3b.irishLowerCase(w)).mkString(" "))
  }
}
