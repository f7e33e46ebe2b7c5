package graft.search

import graft.analysis.Analyzer

/** contrib/WordNet analog (/root/reference/src/contrib/WordNet/): parse the
  * WordNet prolog synonym table (wn_s.pl), look up synonyms, and expand a
  * query with boosted synonym clauses.
  *
  * Parse fidelity (Syns2Index.cs:135-176): a line is
  * `s(synsetNum,wordNum,'word',pos,sense,tag).`; the synset num is the text
  * before the first comma, the word sits between the first quote pair,
  * lowercased (the parse truncates at the next quote, so escaped-quote
  * entries store their head segment — reference behavior); words failing IsDecent (any
  * non-letter char — multiword entries carry `_`) are dropped. Both maps
  * are kept: word -> synset nums and synset num -> words.
  *
  * Lookup (SynLookup.cs): synonyms of w = union of words across w's
  * synsets, minus w, first-seen order.
  *
  * Expansion (SynExpand.cs:Expand): analyze the query; each distinct token
  * becomes a SHOULD TermQuery; every synonym not already emitted (dedup is
  * GLOBAL across tokens — the reference's `already` list holds both) adds a
  * SHOULD TermQuery with the given boost (0 -> unboosted).
  */
object WordNet {

  final case class SynonymDb(word2Nums: Map[String, List[String]],
                             num2Words: Map[String, List[String]]) {
    /** SynLookup: all words sharing a synset with `word`, minus it. */
    def synonyms(word: String): List[String] = {
      val seen = scala.collection.mutable.LinkedHashSet.empty[String]
      word2Nums.getOrElse(word, Nil)
        .foreach(n => num2Words.getOrElse(n, Nil).foreach(seen.add))
      seen.toList.filterNot(_ == word)
    }
  }

  private def isDecent(s: String): Boolean = s.nonEmpty && s.forall(_.isLetter)

  /** Parse wn_s.pl lines (Syns2Index.cs ParsePrologFile). Non-`s(` lines
    * are rejected like the reference (it exits; we throw). */
  def parsePrologLines(lines: Iterator[String]): SynonymDb = {
    val w2n = scala.collection.mutable.LinkedHashMap.empty[String, List[String]]
    val n2w = scala.collection.mutable.LinkedHashMap.empty[String, List[String]]
    lines.filter(_.nonEmpty).foreach { line0 =>
      require(line0.startsWith("s("), s"OUCH: $line0")
      val line1 = line0.substring(2)
      val num = line1.substring(0, line1.indexOf(','))
      val afterQ1 = line1.substring(line1.indexOf('\'') + 1)
      val word = afterQ1.substring(0, afterQ1.indexOf('\''))
        .toLowerCase.replace("''", "'")
      if (isDecent(word)) {
        w2n.updateWith(word) { v => Some(v.getOrElse(Nil) :+ num) }
        n2w.updateWith(num) { v => Some(v.getOrElse(Nil) :+ word) }
      }
    }
    SynonymDb(w2n.toMap, n2w.toMap)
  }

  /** SynExpand.Expand: the analyzed query terms plus their (globally
    * deduped) synonyms as one flat SHOULD disjunction; synonyms carry
    * `boost` (when > 0). */
  def expand(query: String, db: SynonymDb, analyzer: Analyzer,
             boost: Float): Query = {
    val already = scala.collection.mutable.LinkedHashSet.empty[String]
    val top = scala.collection.mutable.ArrayBuffer.empty[String]
    analyzer.terms(query).foreach { w =>
      if (already.add(w)) top += w
    }
    val clauses = scala.collection.mutable.ListBuffer.empty[(Occur.Value, Query)]
    top.foreach { w => clauses += Occur.Should -> TermQ(w) }
    top.foreach { w =>
      db.synonyms(w).foreach { syn =>
        if (already.add(syn)) {
          val tq = if (boost > 0f) TermQ(syn, boost) else TermQ(syn)
          clauses += Occur.Should -> tq
        }
      }
    }
    BoolQ(clauses.toList)
  }
}
