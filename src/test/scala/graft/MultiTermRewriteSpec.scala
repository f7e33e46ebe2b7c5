package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.build.{IndexBuilder, PagesGen}
import graft.search._
import java.nio.file.Files

/** MultiTermQuery rewrites: the FuzzyQuery default top-terms scoring rewrite
  * (boost = 1 - ed/min(len), maxExpansions PQ by (boost desc, term asc),
  * term-ordered clause assembly — FuzzyQuery.cs:106, FuzzyTermsEnum.cs:
  * 440-460, TopTermsRewrite.cs:72-87) and the dictionary-first constant-score
  * expansion with the auto-cutover budget.
  */
class MultiTermRewriteSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val N = 800
  private lazy val idxPath = {
    val base = Files.createTempDirectory("graftmtq").toString
    val df = spark.createDataFrame(PagesGen.local(N)).toDF("url", "text")
    IndexBuilder.build(spark, df, base, IndexBuilder.BuildConfig(4, "standard", groupSize = 4))
    base
  }
  private lazy val searcher = new Searcher(spark, idxPath)

  private def hits(q: Query): Map[(Int, Int), Double] =
    searcher.compile(q).collect().map(h => (h.segmentId, h.docId) -> h.score).toMap

  /** Manual reference expansion from the collected dictionary. */
  private def manualExpansion(term: String, maxEdits: Int, maxExp: Int): Seq[(String, Float)] = {
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val dict = searcher.dictionary().select("term").collect().map(_.getString(0))
    dict.flatMap { t =>
      val ed = lev(t, term)
      if (ed > maxEdits) None
      else if (ed == 0) Some((t, 1f))
      else {
        val sim = 1f - ed.toFloat / math.min(t.length, term.length).toFloat
        if (sim > 0f) Some((t, sim)) else None
      }
    }.sortBy { case (t, b) => (-b, t) }.take(maxExp).sortBy(_._1).toSeq
  }

  test("fuzzy top-terms rewrite equals manually-boosted term-ordered disjunction") {
    val term = PagesGen.word(40)
    val exp = manualExpansion(term, 2, 50)
    assert(exp.size > 1, s"fixture needs several expansions, got $exp")
    val manual = BoolQ(exp.map { case (t, b) => Occur.Should -> (TermQ(t, b): Query) }.toList)
    assert(hits(FuzzyTopQ(term, 2, 50)) == hits(manual))
  }

  test("maxExpansions keeps only the most competitive terms") {
    val term = PagesGen.word(40)
    val exp1 = manualExpansion(term, 2, 1)
    assert(exp1.size == 1)
    val manual = BoolQ(exp1.map { case (t, b) => Occur.Should -> (TermQ(t, b): Query) }.toList)
    assert(hits(FuzzyTopQ(term, 2, 1)) == hits(manual))
    // the retained term is the exact match when present (boost 1.0 wins)
    assert(exp1.head._1 == term)
  }

  test("parser `term~N` produces the SCORED fuzzy (reference default) and matches the oracle") {
    import graft.analysis.StandardAnalyzer
    val term = PagesGen.word(40)
    val parsed = QueryParser.parse(s"$term~1", StandardAnalyzer)
    assert(parsed == FuzzyTopQ(term, 1))
    // rank+score identity against the oracle's TopTermsRewrite twin
    val oracle = new graft.oracle.OracleIndex(PagesGen.local(N), 4, StandardAnalyzer)
    val o = oracle.search(parsed, 10).map(h => (h.key, h.score)).toList
    val g = searcher.search(parsed, 10).collect()
      .map(r => (r.getString(0), r.getDouble(1).toFloat)).toList
    assert(g == o)
  }

  test("regexp query equals the equivalent wildcard doc set") {
    val a = hits(RegexpQ("qui.*")).keySet
    val b = hits(PrefixQ("qui")).keySet
    assert(a == b && a.nonEmpty)
  }

  test("dictionary-first constant-score equals the postings-scan fallback") {
    // fresh searcher with the dict marker removed -> fallback path
    val p = new org.apache.hadoop.fs.Path(s"$idxPath/dict_marker.txt")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val marker = graft.build.DictTable.readMarker(spark, idxPath).get
    fs.delete(p, false)
    try {
      val noDict = new Searcher(spark, idxPath)
      assert(noDict.dictTable.isEmpty)
      val viaScan = noDict.compile(PrefixQ("qu")).collect().map(h => (h.segmentId, h.docId)).toSet
      val viaDict = hits(PrefixQ("qu")).keySet
      assert(searcher.dictTable.nonEmpty)
      assert(viaDict == viaScan && viaDict.nonEmpty)
    } finally graft.build.DictTable.writeMarker(spark, idxPath, marker)
  }

  test("NGramPhraseQuery rewrite keeps every n-th gram plus the last") {
    import Query.ngramPhrase
    val full = PhraseQ(List("ab" -> 0, "bc" -> 1, "cd" -> 2, "de" -> 3, "ef" -> 4), 2f)
    assert(ngramPhrase(2, full) == PhraseQ(List("ab" -> 0, "cd" -> 2, "ef" -> 4), 2f))
    // last term always kept even off the stride
    val four = PhraseQ(List("abc" -> 0, "bcd" -> 1, "cde" -> 2, "def" -> 3))
    assert(ngramPhrase(3, four).terms == List("abc" -> 0, "def" -> 3))
    // non-optimizable shapes return the phrase unchanged
    assert(ngramPhrase(3, full.copy(slop = 1)) == full.copy(slop = 1)) // slop != 0
    assert(ngramPhrase(1, full) == full)                       // n < 2
    assert(ngramPhrase(2, PhraseQ(List("ab" -> 0, "bc" -> 1))) ==
      PhraseQ(List("ab" -> 0, "bc" -> 1)))                     // too short
    val gapped = PhraseQ(List("ab" -> 0, "cd" -> 2, "ef" -> 4))
    assert(ngramPhrase(2, gapped) == gapped)                   // positions not consecutive
  }
}
