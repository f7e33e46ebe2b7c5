package graft.search

/** Score decomposition node — the Explanation analog
  * (/root/reference/src/Lucene.Net.Core/Search/Explanation.cs, produced by
  * IndexSearcher.Explain, Search/IndexSearcher.cs:692). The invariant the
  * reference pins in CheckHits.VerifyExplanation (TestFramework/Search/
  * CheckHits.cs:173): a matching doc's explanation value equals its score
  * EXACTLY in our case (same scorer closures evaluate both).
  */
final case class Explanation(value: Double, description: String,
                             details: Seq[Explanation] = Nil,
                             matched: Boolean = true) {
  override def toString: String = {
    val sb = new StringBuilder
    def rec(e: Explanation, depth: Int): Unit = {
      sb.append("  " * depth).append(f"${e.value}%.6f = ").append(e.description)
      if (!e.matched) sb.append(" (NON-MATCH)")
      sb.append('\n')
      e.details.foreach(rec(_, depth + 1))
    }
    rec(this, 0)
    sb.toString
  }
}

object Explanation {
  def noMatch(description: String, details: Seq[Explanation] = Nil): Explanation =
    Explanation(0d, description, details, matched = false)
}
