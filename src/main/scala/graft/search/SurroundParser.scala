package graft.search

/** Surround query language — span-oriented proximity syntax
  * (/root/reference/src/Lucene.Net.QueryParser/Surround/Parser/
  * QueryParser.cs: FieldsQuery:192, OrQuery:242, AndQuery:285,
  * NotQuery:~340, NQuery:371, WQuery:412, PrimaryQuery:453,
  * PrefixOperatorQuery:503, GetOpDistance:115; distance semantics
  * Surround/Query/DistanceQuery.cs — SpanNear with slop = distance - 1,
  * W ordered / N unordered).
  *
  * Grammar (binding tightens downward): `or` > `and` > `not` > `N` > `W`;
  * infix `a W b` (distance 1) or prefix `3W(a, b, c)`; parentheses;
  * `field:` prefixes scope the whole subquery (multiple fields OR);
  * `^weight` suffix; `trunc*` / `wild?card` truncated terms (minimum 3
  * literal chars, minimumPrefixLength/minimumCharsInTrunc:41-43); terms are
  * NOT analyzed (surround is analysis-free; we lowercase to match the
  * index's lowercased dictionary).
  *
  * Truncated terms inside a distance/OR-span context expand through the
  * searcher's dictionary (SrndTruncQuery's term visitor analog); outside
  * span context they map to PrefixQ/WildcardQ. Distance queries compile to
  * `SpanScoreQ` (SpanNearQuery scoring); `not` to MUST/MUST_NOT boolean.
  */
object SurroundParser {

  final case class SurroundParseException(msg: String) extends IllegalArgumentException(msg)

  // -------- intermediate surround tree
  private sealed trait Node
  private final case class TermN(text: String, quoted: Boolean) extends Node
  private final case class TruncN(pattern: String) extends Node // contains * or ?
  private final case class OrN(cs: List[Node]) extends Node
  private final case class AndN(cs: List[Node]) extends Node
  private final case class NotN(cs: List[Node]) extends Node
  private final case class DistN(cs: List[Node], distance: Int, ordered: Boolean) extends Node
  private final case class FieldsN(fields: List[String], inner: Node) extends Node
  private final case class WeightN(inner: Node, w: Float) extends Node

  // -------- lexer
  private sealed trait Tok
  private case object LP extends Tok
  private case object RP extends Tok
  private case object Comma extends Tok
  private case object Colon extends Tok
  private final case class Carat(w: Float) extends Tok
  private final case class WordT(s: String, quoted: Boolean, trunc: Boolean) extends Tok

  private def lex(s: String): List[Tok] = {
    val out = scala.collection.mutable.ListBuffer.empty[Tok]
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (Character.isWhitespace(c)) i += 1
      else if (c == '(') { out += LP; i += 1 }
      else if (c == ')') { out += RP; i += 1 }
      else if (c == ',') { out += Comma; i += 1 }
      else if (c == ':') { out += Colon; i += 1 }
      else if (c == '^') {
        var j = i + 1
        while (j < n && (Character.isDigit(s.charAt(j)) || s.charAt(j) == '.')) j += 1
        if (j == i + 1) throw SurroundParseException(s"missing weight after ^ at $i")
        out += Carat(s.substring(i + 1, j).toFloat)
        i = j
      } else if (c == '"') {
        val end = s.indexOf('"', i + 1)
        if (end < 0) throw SurroundParseException("unterminated quote")
        val body = s.substring(i + 1, end)
        i = end + 1
        // TRUNCQUOTED: "...."* (QueryParserTokenManager TRUNCQUOTED token)
        if (i < n && s.charAt(i) == '*') { out += WordT(body + "*", quoted = true, trunc = true); i += 1 }
        else out += WordT(body, quoted = true, trunc = false)
      } else {
        var j = i
        while (j < n && !Character.isWhitespace(s.charAt(j)) &&
          "(),:^\"".indexOf(s.charAt(j)) < 0) j += 1
        val w = s.substring(i, j)
        i = j
        out += WordT(w, quoted = false, trunc = w.exists(ch => ch == '*' || ch == '?'))
      }
    }
    out.toList
  }

  // -------- recursive descent (one token of lookahead, JavaCC-style)
  private final class P(var toks: List[Tok]) {
    def peek: Option[Tok] = toks.headOption
    def next(): Tok = { val t = toks.head; toks = toks.tail; t }
    def expect(t: Tok): Unit =
      if (peek.contains(t)) { next(); () }
      else throw SurroundParseException(s"expected $t, got $peek")

    private def isOp(w: WordT, names: String*): Boolean =
      !w.quoted && names.contains(w.s.toLowerCase)
    private def distOf(w: WordT): Option[(Int, Boolean)] =
      if (w.quoted) None
      else {
        val lower = w.s.toLowerCase
        if (lower.matches("[0-9]*w")) Some((if (lower.length == 1) 1 else lower.dropRight(1).toInt, true))
        else if (lower.matches("[0-9]*n")) Some((if (lower.length == 1) 1 else lower.dropRight(1).toInt, false))
        else None
      }

    def fieldsQuery(): Node = {
      // OptionalFields: (TERM ':')* with 2-token lookahead (:208-239)
      val fields = scala.collection.mutable.ListBuffer.empty[String]
      var cont = true
      while (cont) {
        toks match {
          case WordT(f, false, false) :: Colon :: rest
            if distOf(WordT(f, false, false)).isEmpty && !Seq("and", "or", "not").contains(f.toLowerCase) =>
            fields += f; toks = rest
          case _ => cont = false
        }
      }
      val q = orQuery()
      if (fields.isEmpty) q else FieldsN(fields.toList, q)
    }

    def orQuery(): Node = {
      var cs = List(andQuery())
      while (peek.exists { case w: WordT => isOp(w, "or"); case _ => false }) {
        next(); cs = cs :+ andQuery()
      }
      if (cs.size == 1) cs.head else OrN(cs)
    }

    def andQuery(): Node = {
      var cs = List(notQuery())
      while (peek.exists { case w: WordT => isOp(w, "and"); case _ => false }) {
        next(); cs = cs :+ notQuery()
      }
      if (cs.size == 1) cs.head else AndN(cs)
    }

    def notQuery(): Node = {
      var cs = List(nQuery())
      while (peek.exists { case w: WordT => isOp(w, "not"); case _ => false }) {
        next(); cs = cs :+ nQuery()
      }
      if (cs.size == 1) cs.head else NotN(cs)
    }

    def nQuery(): Node = {
      var q = wQuery()
      var cont = true
      while (cont) {
        peek match {
          case Some(w: WordT) if distOf(w).exists(!_._2) =>
            val (d, _) = distOf(w).get
            next()
            q = DistN(List(q, wQuery()), d, ordered = false)
          case _ => cont = false
        }
      }
      q
    }

    def wQuery(): Node = {
      var q = primary()
      var cont = true
      while (cont) {
        peek match {
          case Some(w: WordT) if distOf(w).exists(_._2) =>
            val (d, _) = distOf(w).get
            next()
            q = DistN(List(q, primary()), d, ordered = true)
          case _ => cont = false
        }
      }
      q
    }

    def primary(): Node = {
      val base = peek match {
        case Some(LP) =>
          next(); val q = fieldsQuery(); expect(RP); q
        case Some(w: WordT) if (isOp(w, "and", "or") || distOf(w).isDefined) &&
          toks.drop(1).headOption.contains(LP) =>
          prefixOperator()
        case Some(w: WordT) =>
          next()
          if (w.trunc) {
            val literal = w.s.count(ch => ch != '*' && ch != '?')
            if (literal < 3) // minimumPrefixLength / minimumCharsInTrunc = 3
              throw SurroundParseException(s"Too unrestrictive truncation: ${w.s}")
            TruncN(w.s.toLowerCase)
          } else TermN(w.s.toLowerCase, w.quoted)
        case other => throw SurroundParseException(s"unexpected token $other")
      }
      peek match {
        case Some(Carat(wt)) => next(); WeightN(base, wt)
        case _ => base
      }
    }

    /** `OR(a, b)` / `AND(a, b)` / `3W(a, b, c)` / `N(a, b)` (:503). */
    def prefixOperator(): Node = {
      val op = next().asInstanceOf[WordT]
      expect(LP)
      val cs = scala.collection.mutable.ListBuffer(fieldsQuery())
      while (peek.contains(Comma)) { next(); cs += fieldsQuery() }
      expect(RP)
      distOf(op) match {
        case Some((d, ordered)) => DistN(cs.toList, d, ordered)
        case None if op.s.equalsIgnoreCase("or") => OrN(cs.toList)
        case None if op.s.equalsIgnoreCase("and") => AndN(cs.toList)
        case _ => throw SurroundParseException(s"bad prefix operator ${op.s}")
      }
    }
  }

  /** Parse to the engine Query ADT. `searcher` enables dictionary expansion
    * of truncated terms inside span contexts (required there). */
  def parse(query: String, searcher: Searcher = null): Query = {
    val p = new P(lex(query))
    val node = p.fieldsQuery()
    if (p.toks.nonEmpty)
      throw SurroundParseException(s"dangling tokens: ${p.toks}")
    toQuery(node, None, searcher)
  }

  private def toQuery(node: Node, field: Option[String], searcher: Searcher): Query = node match {
    case TermN(t, _) => TermQ(t)
    case TruncN(pat) =>
      if (pat.indexOf('?') < 0 && pat.endsWith("*") && pat.indexOf('*') == pat.length - 1)
        PrefixQ(pat.dropRight(1))
      else WildcardQ(pat)
    case OrN(cs) => BoolQ(cs.map(c => Occur.Should -> toQuery(c, field, searcher)))
    case AndN(cs) => BoolQ(cs.map(c => Occur.Must -> toQuery(c, field, searcher)))
    case NotN(cs) =>
      // NotQuery: first AND NOT rest (Surround/Query/NotQuery.cs)
      BoolQ((Occur.Must -> toQuery(cs.head, field, searcher)) ::
        cs.tail.map(c => Occur.MustNot -> toQuery(c, field, searcher)))
    case d: DistN => SpanScoreQ(toSpan(d, field, searcher))
    case FieldsN(fs, inner) =>
      val qs = fs.map(f => FieldQ(f, toQuery(inner, Some(f), searcher)): Query)
      if (qs.size == 1) qs.head else BoolQ(qs.map(Occur.Should -> _))
    // weight multiplies the subquery's real score (OptionalWeights):
    // Query.withBoost distributes into the scoring leaves
    case WeightN(inner, w) => Query.withBoost(toQuery(inner, field, searcher), w)
  }

  /** Distance-context conversion (DistanceQuery.cs: subqueries must be
    * terms, OR groups of such, or nested distance queries —
    * DistanceSubQueryNotAllowed). */
  private def toSpan(node: Node, field: Option[String], searcher: Searcher): SpanQ = node match {
    case TermN(t, _) => SpanTermS(t)
    case TruncN(pat) =>
      require(searcher != null,
        "truncated terms inside a distance operator need a Searcher for dictionary expansion")
      val q = if (pat.indexOf('?') < 0 && pat.endsWith("*") && pat.indexOf('*') == pat.length - 1)
        PrefixQ(pat.dropRight(1))
      else WildcardQ(pat)
      val terms = searcher.expandMultiTerm(field.getOrElse(searcher.defaultField), q)
      if (terms.isEmpty) SpanTermS(SpanMatcher.NoMatchTerm)
      else if (terms.size == 1) SpanTermS(terms.head)
      else SpanOrS(terms.map(t => SpanTermS(t): SpanQ).toList)
    case OrN(cs) => SpanOrS(cs.map(toSpan(_, field, searcher)))
    case DistN(cs, d, ordered) =>
      SpanNearS(cs.map(toSpan(_, field, searcher)), d - 1, ordered)
    case WeightN(inner, _) => toSpan(inner, field, searcher) // weight applies at the top
    case other =>
      throw SurroundParseException(s"operator not allowed inside a distance query: $other")
  }
}
