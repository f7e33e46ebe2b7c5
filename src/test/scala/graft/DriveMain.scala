package graft.drive
import graft.analysis._
import graft.codec._
import graft.oracle._
import graft.search._
object Drive {
  def main(args: Array[String]): Unit = {
    val text = "The U.S.A.-based AT&T unit visits wiki.apache.org — O'Reilly's 3,14 guide to 日本語"
    println("TOKENS: " + StandardAnalyzer.tokenize(text).map(t => s"${t.term}@${t.position}").mkString(" "))
    val pages = Seq(
      "url://a" -> "the quick brown fox jumps over the lazy dog",
      "url://b" -> "quick quick quick fox",
      "url://c" -> "brown dogs and brown cats sleep",
      "url://d" -> "nothing relevant here at all",
      "url://e" -> "fox news covers the quick election")
    val idx = new OracleIndex(pages, 2, StandardAnalyzer)
    val hits = idx.search(BoolQ(List(Occur.Should -> TermQ("quick"), Occur.Should -> TermQ("brown"))), 3)
    println("TOP3: " + hits.map(h => f"${h.key}:${h.score}%.4f").mkString(" "))
    println("PHRASE: " + idx.search(PhraseQ(List("quick" -> 0, "brown" -> 1)), 5).map(_.key).mkString(","))
    println("NOTFOX: " + idx.search(BoolQ(List(Occur.Must -> TermQ("brown"), Occur.MustNot -> TermQ("fox"))), 5).map(_.key).mkString(","))
    val enc = new PostingsCodec.Encoder
    (0 until 300).foreach(i => enc.add(i * 7, 1 + i % 4, Array.tabulate(1 + i % 4)(_ * 2), i % 100 + 10))
    val e = enc.finish()
    val dec = PostingsCodec.decode(e.df, e.docDeltas, e.tfs, e.positions, e.lens)
    println(s"CODEC: df=${e.df} skips=${e.skips.length} lastDoc=${dec.docIds.last} docBytes=${e.docDeltas.length}")
    println("EMPTY: [" + StandardAnalyzer.tokenize("").mkString(",") + "]")
    println("STOPONLY: [" + StandardAnalyzer.tokenize("the and of to").mkString(",") + "]")
    println("LONG: [" + StandardAnalyzer.tokenize("x " + "b"*257 + " y").map(t => s"${t.term}@${t.position}").mkString(",") + "]")
    println("ABSENT: " + idx.search(TermQ("zzznope"), 5).size)
    println("STOPQUERY: " + idx.search(TermQ("the"), 5).size)
    println("EMPTYDOC_NORM: " + idx.docs.map(d => d.fieldLen).mkString(","))
  }
}
