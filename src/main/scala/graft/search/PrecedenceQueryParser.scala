package graft.search

import graft.analysis.Analyzer

/** PrecedenceQueryParser analog (reference: /root/reference/src/
  * Lucene.Net.QueryParser/Flexible/Precedence/PrecedenceQueryParser.cs +
  * Processors/BooleanModifiersQueryNodeProcessor.cs): the classic grammar,
  * but boolean AND binds TIGHTER than OR/juxtaposition — `a AND b OR c
  * AND d` parses to `(+a +b) (+c +d)` instead of the classic flat
  * `+a +b +c +d`. The flexible Standard grammar's ConjQuery/DisjQuery
  * nesting provides the grouping; BooleanModifiersQueryNodeProcessor then
  * promotes each AndQueryNode child without an explicit modifier to
  * MOD_REQ (explicit `+`/`-`/NOT are kept). Everything else — fields,
  * phrases, ranges, wildcards, fuzzy, boosts, per-field analyzers — is the
  * shared classic clause parse.
  */
object PrecedenceQueryParser {

  def parse(query: String, analyzer: Analyzer): Query =
    parse(query, analyzer, Map.empty)

  def parse(query: String, analyzer: Analyzer, perField: Map[String, Analyzer]): Query =
    QueryParser.combinePrecedence(
      QueryParser.parseUnitsTop(query, analyzer, perField,
        lowerMultiTerm = true, precedence = true))
}

/** ExtendableQueryParser analog (reference: /root/reference/src/
  * Lucene.Net.QueryParser/Ext/ExtendableQueryParser.cs + Extensions.cs):
  * the classic parser plus a registry of named parser extensions. A field
  * of the form `field:key:term` (or `:key:term` for the default field) is
  * split at the extension delimiter (Extensions.SplitExtensionField); if
  * `key` is registered, the extension builds the leaf query from
  * (indexField, termText) — the ExtensionQuery contract — bypassing the
  * classic term analysis for that clause. Unregistered keys fall through
  * to the classic parse unchanged.
  *
  * Mechanically: extension operands are swapped for collision-proof marker
  * terms before the classic parse (the ComplexPhraseParser marker
  * discipline), then the parsed tree's marker leaves are rewritten to the
  * extension-built queries, preserving occur/boost/field structure.
  */
object ExtendableQueryParser {

  /** An extension builds a Query from (indexField — empty = default/
    * unscoped — and the raw term text); ParserExtension.Parse analog. */
  type ParserExtension = (String, String) => Query

  private val MarkerPrefix = "graftextmarker"

  def parse(query: String, analyzer: Analyzer,
            extensions: Map[String, ParserExtension],
            perField: Map[String, Analyzer] = Map.empty): Query = {
    // pass 1: find `field:key:term` words (outside quotes) with registered
    // keys; replace with marker words, remembering the extension call
    val subs = scala.collection.mutable.ArrayBuffer.empty[(String, Query)]
    val out = new StringBuilder
    var inQuote = false
    val words = new scala.collection.mutable.StringBuilder
    def flushWord(): Unit = {
      val whole = words.result(); words.clear()
      if (whole.isEmpty) { return }
      // leading +/-/! modifiers stay outside the extension-field match
      val mods = whole.takeWhile(c => c == '+' || c == '-' || c == '!')
      val w = whole.substring(mods.length)
      out.append(mods)
      val rewritten =
        if (inQuote || w.isEmpty) w
        else {
          // field:key:term | :key:term — first ':' splits field, second
          // splits the extension key (Extensions.SplitExtensionField)
          val m = "^([A-Za-z_][A-Za-z0-9_]*)?:([A-Za-z_][A-Za-z0-9_]*):(.+)$".r
          w match {
            case m(fieldOrNull, key, term) if extensions.contains(key) =>
              val field = Option(fieldOrNull).getOrElse("")
              val q = extensions(key)(field, term)
              // letter-only marker: survives letter tokenizers verbatim
              val marker = MarkerPrefix + ('a' + subs.length % 26).toChar.toString * (subs.length / 26 + 1)
              subs += ((marker, if (field.isEmpty) q else FieldQ(field, q)))
              marker
            case _ => w
          }
        }
      out.append(rewritten)
    }
    query.foreach { c =>
      if (c == '"') { flushWord(); inQuote = !inQuote; out.append(c) }
      else if (Character.isWhitespace(c) || "()^".indexOf(c) >= 0) {
        flushWord(); out.append(c)
      } else words.append(c)
    }
    flushWord()

    val parsed = QueryParser.parse(out.result(), analyzer, perField)
    if (subs.isEmpty) parsed else rewrite(parsed, subs.toMap)
  }

  /** Replace marker TermQ leaves by their extension queries. Markers only
    * occur as plain terms (never inside phrases/ranges), so the rewrite
    * recurses just the wrappers the classic parse can put around a term.
    */
  private def rewrite(q: Query, subs: Map[String, Query]): Query = q match {
    case TermQ(t, boost) if subs.contains(t) =>
      if (boost == 1f) subs(t) else Query.withBoost(subs(t), boost)
    case BoolQ(clauses, msm) =>
      BoolQ(clauses.map { case (o, c) => (o, rewrite(c, subs)) }, msm)
    case FieldQ(f, inner) => FieldQ(f, rewrite(inner, subs))
    case ConstantScoreQ(inner, b) => ConstantScoreQ(rewrite(inner, subs), b)
    case DisMaxQ(cs, tie) => DisMaxQ(cs.map(rewrite(_, subs)), tie)
    case other => other
  }
}
