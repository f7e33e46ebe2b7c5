package graft.search

import graft.analysis.Analyzer
import graft.oracle.OracleIndex

/** Single-document in-RAM index — the MemoryIndex analog
  * (/root/reference/src/Lucene.Net.Memory/MemoryIndex.cs:162: "high-
  * performance single-document main memory index", typically used to match
  * many queries against a stream of documents — percolation). One document
  * is analyzed once into positions maps; any engine Query then matches or
  * scores against it with the standard semantics. Collection stats (idf,
  * avgdl) are those of the one-doc collection, exactly as in the reference.
  *
  * Built on the engine's single-JVM reference implementation (OracleIndex)
  * so match/score semantics are the ones every Spark path is pinned to.
  */
final class MemoryIndex(text: String, analyzer: Analyzer) {
  private val idx = new OracleIndex(Seq(("doc", text)), 1, analyzer)

  /** The document's distinct terms (the in-RAM dictionary). */
  def terms: Set[String] =
    idx.docs.headOption.map(_.positions.keySet).getOrElse(Set.empty)

  /** MemoryIndex.Search > 0.0f in the reference's percolation example. */
  def matches(q: Query): Boolean = idx.count(q) > 0

  /** BM25 score of the query against the one-doc collection, None on no
    * match (MemoryIndex.Search returns 0.0f for no match). */
  def score(q: Query): Option[Float] = idx.search(q, 1).headOption.map(_.score)
}
