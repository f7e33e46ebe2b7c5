package graft.search

import graft.analysis.Analyzer

/** Classic query syntax parser — hand-rolled recursive descent covering the
  * v1 grammar of SURVEY.md §2.7 (reference: JavaCC grammar in
  * /root/reference/src/Lucene.Net.QueryParser/Classic/QueryParser.cs, clause
  * logic QueryParserBase.cs:497-515): terms, "phrases", AND/OR/NOT, +/-,
  * parentheses, prefix*, wild?card*, fuzzy~N, ranges [a TO b] / {a TO b},
  * `^boost` on terms/phrases/groups, and field scoping in all three classic
  * forms — `field:term`, `field:"phrase"`, `field:(a b)`.
  *
  * Query text is run through the SAME analyzer as indexing
  * (QueryParserBase.GetFieldQuery analog) — critical for rank identity.
  * A field binding selects that field's analyzer for everything in its
  * scope (PerFieldAnalyzerWrapper semantics). Default operator is OR; AND
  * promotes its adjacent clauses to MUST.
  */
object QueryParser {

  private[search] sealed trait Tok
  private case object LParen extends Tok
  private case object RParen extends Tok
  private case object AndOp extends Tok
  private case object OrOp extends Tok
  private case object NotOp extends Tok
  private case object Plus extends Tok
  private case object Minus extends Tok
  /** `^N` boost suffix — applies to the clause just parsed (QueryParser.cs
    * Clause() reads the optional <CARAT> <NUMBER> after every clause). */
  private final case class Caret(boost: Float) extends Tok
  /** A bare `field:` binding whose operand follows as its own token
    * (`field:"phrase"`, `field:(...)`, `field: term`). */
  private final case class FieldBind(field: String) extends Tok
  private final case class Phrase(s: String, slop: Int) extends Tok
  private final case class Range(lo: String, hi: String, incLo: Boolean, incHi: Boolean) extends Tok
  private final case class Word(s: String, fuzzy: Option[Int], field: Option[String]) extends Tok

  private def lex(s: String): List[Tok] = {
    val out = scala.collection.mutable.ListBuffer.empty[Tok]
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (Character.isWhitespace(c)) i += 1
      else if (c == '(') { out += LParen; i += 1 }
      else if (c == ')') { out += RParen; i += 1 }
      else if (c == '+') { out += Plus; i += 1 }
      else if (c == '-') { out += Minus; i += 1 }
      else if (c == '^') {
        var j = i + 1
        while (j < n && (Character.isDigit(s.charAt(j)) || s.charAt(j) == '.')) j += 1
        if (j > i + 1) out += Caret(s.substring(i + 1, j).toFloat)
        i = j.max(i + 1)
      } else if (c == '"') {
        val end = s.indexOf('"', i + 1)
        val stop = if (end < 0) n else end
        val body = s.substring(i + 1, stop)
        i = stop + 1
        // "phrase"~N slop suffix (the ^boost, if any, lexes as its own token)
        var slop = 0
        if (i < n && s.charAt(i) == '~') {
          var j = i + 1
          while (j < n && Character.isDigit(s.charAt(j))) j += 1
          if (j > i + 1) { slop = s.substring(i + 1, j).toInt; i = j }
          else i += 1
        }
        out += Phrase(body, slop)
      } else if (c == '/') {
        // REGEXPTERM: "/" (~["/"] | "\\/")* "/" — regex metachars do not
        // break the token; emitted WITH slashes, unwrapped by the parser
        var j = i + 1
        while (j < n && !(s.charAt(j) == '/' && s.charAt(j - 1) != '\\')) j += 1
        out += Word(s.substring(i, math.min(j + 1, n)), None, None)
        i = j + 1
      } else if (c == '[' || c == '{') {
        val close = s.indexWhere(ch => ch == ']' || ch == '}', i)
        val stop = if (close < 0) n else close
        val body = s.substring(i + 1, stop)
        val parts = body.split("(?i)\\s+TO\\s+")
        if (parts.length == 2) {
          val lo = if (parts(0).trim == "*") null else parts(0).trim
          val hi = if (parts(1).trim == "*") null else parts(1).trim
          out += Range(lo, hi, c == '[', close >= 0 && s.charAt(close) == ']')
        }
        i = stop + 1
      } else {
        var j = i
        while (j < n && !Character.isWhitespace(s.charAt(j)) &&
               "()\"[]{}^".indexOf(s.charAt(j)) < 0 &&
               // `field:` stops before a '/' so the regexp lexes whole
               !(s.charAt(j) == '/' && j > i && s.charAt(j - 1) == ':')) j += 1
        val raw = s.substring(i, j)
        i = j
        raw match {
          case "AND" | "&&" => out += AndOp
          case "OR" | "||" => out += OrOp
          case "NOT" | "!" => out += NotOp
          case w0 =>
            // a "field:" prefix (classic grammar) binds the clause to that
            // field (FieldQ). URLs are exempt (":" followed by "//").
            val (fieldOpt, w) = {
              val ci = w0.indexOf(':')
              if (ci > 0 && !w0.startsWith("//", ci + 1) &&
                  w0.substring(0, ci).matches("[A-Za-z_][A-Za-z0-9_]*"))
                (Some(w0.substring(0, ci)), w0.substring(ci + 1))
              else (None, w0)
            }
            if (w.isEmpty && fieldOpt.isDefined) {
              // bare `field:` — the operand follows (`"phrase"`, `(...)` or
              // a spaced term); round 2 dropped the binding silently here
              out += FieldBind(fieldOpt.get)
            } else if (w.startsWith("/")) {
              // /regexp/ term (REGEXPTERM) — no fuzzy-~ splitting inside;
              // the parser unwraps the slashes and builds a LuceneRegexpQ
              out += Word(w, None, fieldOpt)
            } else {
              val ti = w.indexOf('~')
              if (ti > 0) {
                val base = w.substring(0, ti)
                val editsStr = w.substring(ti + 1)
                val edits = if (editsStr.isEmpty) 2 else editsStr.toFloat.toInt.min(2)
                out += Word(base, Some(edits), fieldOpt)
              } else if (w.nonEmpty) out += Word(w, None, fieldOpt)
            }
        }
      }
    }
    out.toList
  }

  def parse(query: String, analyzer: Analyzer): Query =
    parse(query, analyzer, Map.empty)

  /** Parse with per-field analyzers — the PerFieldAnalyzerWrapper analog
    * (/root/reference/src/Lucene.Net.Analysis.Common/Analysis/Miscellaneous/
    * PerFieldAnalyzerWrapper.cs): a `field:`-bound clause (including every
    * term inside a `field:(...)` group) is analyzed with that field's
    * analyzer (e.g. keyword StringFields keep the value verbatim),
    * everything else with the default.
    */
  def parse(query: String, analyzer: Analyzer, perField: Map[String, Analyzer]): Query =
    parse(query, analyzer, perField, lowerMultiTerm = true)

  /** `lowerMultiTerm = false` keeps wildcard/prefix/fuzzy operands in their
    * ORIGINAL case (for AnalyzingQueryParser, whose chunk analysis must see
    * the raw text so case-preserving per-field analyzers work). */
  def parse(query: String, analyzer: Analyzer, perField: Map[String, Analyzer],
            lowerMultiTerm: Boolean): Query = {
    val (q, rest) = parseGroup(lex(query), analyzer, perField, None, lowerMultiTerm)
    require(rest.isEmpty || rest == List(RParen), s"dangling tokens in query: $query")
    q
  }

  /** One parsed clause with its leading context: the conjunction token that
    * joined it to the previous clause (AND/OR, if any) and an explicit
    * occur modifier (`+`/`-`/NOT, if any). The combiner — classic flat
    * clause list vs precedence AND-grouping — runs over this list.
    */
  private[search] final case class ClauseUnit(joiner: Option[Tok],
                                              explicit: Option[Occur.Value],
                                              q: Query)

  /** Parse a clause sequence up to EOF or an unmatched ')'. `ctxField` is
    * the enclosing `field:(...)` binding: it selects the analyzer for
    * unqualified words inside the group (the FieldQ wrap itself happens at
    * the binding site). `precedence` selects the combiner used for NESTED
    * parenthesized groups (the outer combine happens at the caller).
    */
  private def parseGroup(toks0: List[Tok], analyzer: Analyzer,
                         perField: Map[String, Analyzer],
                         ctxField: Option[String],
                         lowerMultiTerm: Boolean = true): (Query, List[Tok]) = {
    val (units, rest) = parseUnits(toks0, analyzer, perField, ctxField,
      lowerMultiTerm, precedence = false)
    (combineClassic(units), rest)
  }

  /** Lex + unit parse + dangling-token check — the entry point shared with
    * PrecedenceQueryParser (which applies its own combiner). */
  private[search] def parseUnitsTop(query: String, analyzer: Analyzer,
                                    perField: Map[String, Analyzer],
                                    lowerMultiTerm: Boolean,
                                    precedence: Boolean): List[ClauseUnit] = {
    val (units, rest) = parseUnits(lex(query), analyzer, perField, None,
      lowerMultiTerm, precedence)
    require(rest.isEmpty || rest == List(RParen), s"dangling tokens in query: $query")
    units
  }

  /** The token→clause loop shared by the classic and precedence parsers. */
  private[search] def parseUnits(toks0: List[Tok], analyzer: Analyzer,
                                 perField: Map[String, Analyzer],
                                 ctxField: Option[String],
                                 lowerMultiTerm: Boolean,
                                 precedence: Boolean): (List[ClauseUnit], List[Tok]) = {
    def lowerRaw(s: String): String = if (lowerMultiTerm) s.toLowerCase else s
    var toks = toks0
    val clauses = scala.collection.mutable.ListBuffer.empty[ClauseUnit]
    var pendingConj: Option[Tok] = None
    var pendingOccur: Option[Occur.Value] = None
    var pendingField: Option[String] = None

    def analyzerFor(fieldOpt: Option[String]): Analyzer =
      fieldOpt.orElse(ctxField).flatMap(perField.get).getOrElse(analyzer)

    // a clause that analyzed to zero tokens (pure stopwords) was DROPPED:
    // a following ^boost must not leak onto the previous, unrelated clause
    var lastClauseDropped = false

    def addClause(q: Query): Unit = {
      clauses += ClauseUnit(pendingConj, pendingOccur, q)
      pendingConj = None
      pendingOccur = None
      pendingField = None
      lastClauseDropped = false
    }

    def dropPending(): Unit = {
      pendingConj = None; pendingOccur = None; pendingField = None
      lastClauseDropped = true
    }

    while (toks.nonEmpty && toks.head != RParen) {
      toks.head match {
        case AndOp | OrOp => pendingConj = Some(toks.head); toks = toks.tail
        case NotOp | Minus => pendingOccur = Some(Occur.MustNot); toks = toks.tail
        case Plus => pendingOccur = Some(Occur.Must); toks = toks.tail
        case FieldBind(f) => pendingField = Some(f); toks = toks.tail
        case Caret(b) =>
          // boost the clause just parsed; after a DROPPED clause (stopword
          // analyzed away) the boost vanishes with it, like the reference
          if (clauses.nonEmpty && !lastClauseDropped) {
            val u = clauses.remove(clauses.length - 1)
            clauses += u.copy(q = Query.withBoost(u.q, b))
          }
          toks = toks.tail
        case LParen =>
          val bind = pendingField
          val (innerUnits, rest) = parseUnits(toks.tail, analyzer, perField,
            bind.orElse(ctxField), lowerMultiTerm, precedence)
          val inner =
            if (precedence) combinePrecedence(innerUnits) else combineClassic(innerUnits)
          toks = rest match {
            case RParen :: t => t
            case t => t
          }
          addClause(bind.fold(inner)(f => FieldQ(f, inner)))
        case Phrase(body, slop) =>
          val bind = pendingField
          val ts = analyzerFor(bind).tokenize(body).map(t => (t.term, t.position)).toList
          if (ts.nonEmpty) {
            val q = if (ts.size == 1) TermQ(ts.head._1) else PhraseQ(ts, slop = slop)
            addClause(bind.fold(q: Query)(f => FieldQ(f, q)))
          } else dropPending()
          toks = toks.tail
        case Range(lo, hi, il, ih) =>
          val bind = pendingField
          addClause(bind.fold(RangeQ(lo, hi, il, ih): Query)(f => FieldQ(f, RangeQ(lo, hi, il, ih))))
          toks = toks.tail
        case Word(w, fuzzy, fieldOpt) =>
          val eff = fieldOpt.orElse(pendingField)
          val fieldAnalyzer = analyzerFor(eff)
          val q: Option[Query] =
            // `term~N` = the reference's SCORED FuzzyQuery default (top-terms
            // rewrite), not the constant-score filter (FuzzyQuery.cs:106)
            if (w.length > 1 && w.startsWith("/") && w.endsWith("/"))
              // Lucene RegExp dialect term (QueryParserBase.NewRegexpQuery;
              // lowercased per lowercaseExpandedTerms default)
              Some(LuceneRegexpQ(lowerRaw(w.substring(1, w.length - 1).replace("\\/", "/"))))
            else if (fuzzy.isDefined) Some(FuzzyTopQ(lowerRaw(w), fuzzy.get))
            else if (w.endsWith("*") && w.count(ch => ch == '*' || ch == '?') == 1 && w.length > 1)
              Some(PrefixQ(lowerRaw(w.dropRight(1))))
            else if (w.exists(ch => ch == '*' || ch == '?')) Some(WildcardQ(lowerRaw(w)))
            else {
              val ts = fieldAnalyzer.tokenize(w).map(t => (t.term, t.position)).toList
              if (ts.isEmpty) None
              else if (ts.size == 1) Some(TermQ(ts.head._1))
              else Some(PhraseQ(ts)) // analyzer split one word into several tokens
            }
          q match {
            case Some(qq) => addClause(eff.fold(qq)(f => FieldQ(f, qq)))
            case None => dropPending() // stopword clause dropped
          }
          toks = toks.tail
        case RParen => // handled by loop guard
      }
    }
    (clauses.toList, toks)
  }

  /** QueryParserBase.AddClause analog — flat clause list, AND promotes its
    * adjacent clauses (including the PREVIOUS clause if it was SHOULD) to
    * MUST; explicit `+`/`-`/NOT modifiers win over the conjunction.
    */
  private[search] def combineClassic(units: List[ClauseUnit]): Query = {
    val clauses = scala.collection.mutable.ListBuffer.empty[(Occur.Value, Query)]
    units.foreach { u =>
      if (u.joiner.contains(AndOp) && clauses.nonEmpty && clauses.last._1 == Occur.Should) {
        val (_, prev) = clauses.remove(clauses.length - 1)
        clauses += ((Occur.Must, prev))
      }
      val occ = u.explicit.getOrElse(
        if (u.joiner.contains(AndOp)) Occur.Must else Occur.Should)
      clauses += ((occ, u.q))
    }
    clauses.toList match {
      case (Occur.Should, single) :: Nil => single
      case (Occur.Must, single) :: Nil => single
      case cs => BoolQ(cs)
    }
  }

  /** PrecedenceQueryParser combiner (reference: Flexible/Precedence/
    * Processors/BooleanModifiersQueryNodeProcessor.cs over the Standard
    * grammar's ConjQuery/DisjQuery nesting): AND binds TIGHTER than OR /
    * juxtaposition, so `a AND b OR c AND d` parses to `(+a +b) (+c +d)`
    * instead of the classic flat `+a +b +c +d`. Within an AND run every
    * child without an explicit modifier becomes MUST; the runs themselves
    * join as SHOULD (default operator OR, as in StandardQueryParser).
    */
  private[search] def combinePrecedence(units: List[ClauseUnit]): Query = {
    // split the clause sequence into maximal AND-joined runs (ConjQuery)
    val runs = scala.collection.mutable.ListBuffer.empty[List[ClauseUnit]]
    units.foreach { u =>
      if (u.joiner.contains(AndOp) && runs.nonEmpty) runs += (runs.remove(runs.length - 1) :+ u)
      else runs += List(u)
    }
    val clauses: List[(Occur.Value, Query)] = runs.toList.map {
      case single :: Nil =>
        (single.explicit.getOrElse(Occur.Should), single.q)
      case run =>
        // AndQueryNode: MOD_NONE children become MOD_REQ; explicit +/- kept
        val inner = BoolQ(run.map(u => (u.explicit.getOrElse(Occur.Must), u.q)))
        (Occur.Should, inner: Query)
    }
    clauses match {
      case (Occur.Should, single) :: Nil => single
      case (Occur.Must, single) :: Nil => single
      case cs => BoolQ(cs)
    }
  }

  // Wildcard/prefix/fuzzy terms are lowercased (not analyzed) by default —
  // the reference's classic behavior; see parseGroup's local lowerRaw and
  // the lowerMultiTerm=false escape hatch used by AnalyzingQueryParser.
}

/** MultiFieldQueryParser analog (/root/reference/src/Lucene.Net.QueryParser/
  * Classic/MultiFieldQueryParser.cs:75-160): every clause WITHOUT an
  * explicit `field:` prefix searches ALL the configured fields as a SHOULD
  * disjunction, each field's copy analyzed with that field's analyzer
  * (GetFieldQuery is invoked once per field in the reference); explicitly
  * scoped clauses pass through untouched.
  *
  * Mechanically: the query is parsed once per field with that field's
  * analyzer, producing structurally identical trees (same grammar, same
  * token boundaries); unscoped leaves then zip across the per-field trees
  * into `BoolQ(SHOULD FieldQ(f1, leaf1), SHOULD FieldQ(f2, leaf2), ...)`.
  */
object MultiFieldQueryParser {

  def parse(query: String, fields: Seq[(String, graft.analysis.Analyzer)],
            perField: Map[String, graft.analysis.Analyzer] = Map.empty): Query = {
    require(fields.nonEmpty, "MultiFieldQueryParser needs at least one field")
    // field-scoped clauses analyze with their own field's analyzer in EVERY
    // per-field tree (so the trees agree on pass-through clauses)
    val pf = perField ++ fields.toMap
    val trees = fields.map { case (f, a) =>
      f -> QueryParser.parse(query, a, pf)
    }
    // analyzers can disagree structurally (a stopword clause dropped for one
    // field but kept for another): fall back to a per-field whole-tree
    // disjunction — each field still searched with its own analysis
    try combine(trees.map { case (f, t) => (f, t) })
    catch {
      case _: ClassCastException | _: IllegalArgumentException =>
        BoolQ(trees.toList.map { case (f, t) => Occur.Should -> (FieldQ(f, t): Query) })
    }
  }

  private def combine(trees: Seq[(String, Query)]): Query = {
    val shapes = trees.map(_._2)
    shapes.head match {
      case FieldQ(f, inner) => FieldQ(f, inner) // explicitly scoped: pass through
      case BoolQ(clauses, msm) =>
        val all = trees.map { case (f, q) => f -> q.asInstanceOf[BoolQ].clauses }
        require(all.forall(_._2.length == clauses.length),
          "per-field parses diverged structurally")
        BoolQ(clauses.indices.toList.map { i =>
          val occ = clauses(i)._1
          occ -> combine(trees.map { case (f, q) =>
            f -> q.asInstanceOf[BoolQ].clauses(i)._2
          })
        }, msm)
      case DisMaxQ(cs, tie) =>
        DisMaxQ(cs.indices.toList.map(i => combine(trees.map { case (f, q) =>
          f -> q.asInstanceOf[DisMaxQ].clauses(i)
        })), tie)
      case ConstantScoreQ(_, b) =>
        ConstantScoreQ(combine(trees.map { case (f, q) =>
          f -> q.asInstanceOf[ConstantScoreQ].inner
        }), b)
      case _ => // unscoped leaf: expand across the fields
        BoolQ(trees.toList.map { case (f, leaf) => Occur.Should -> (FieldQ(f, leaf): Query) })
    }
  }
}
