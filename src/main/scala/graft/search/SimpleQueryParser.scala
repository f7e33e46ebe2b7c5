package graft.search

import graft.analysis.Analyzer

/** SimpleQueryParser — the end-user "never throws" dialect
  * (/root/reference/src/Lucene.Net.QueryParser/Simple/SimpleQueryParser.cs,
  * ParseSubQuery:286, ConsumeSubQuery:379, ConsumePhrase:454,
  * ConsumeToken:540, BuildQueryTree:631, ParseFuzziness:679,
  * TokenFinished:722, factory methods :741-805).
  *
  * Grammar: `+` AND, `|` OR, `-` NOT (doubling cancels), `"..."` phrase
  * (with `~N` slop), trailing `*` prefix, `~N` fuzzy (capped at edit
  * distance 2, LevenshteinAutomata.MAXIMUM_SUPPORTED_DISTANCE), `( )`
  * precedence, `\` escape, whitespace separates. Malformed input NEVER
  * errors: unmatched `(` / `"` are ignored, `()` resets the pending
  * operator, `~garbage` reads as 0.
  *
  * The query tree builds left-to-right exactly like the reference: an
  * operator change wraps the current top in a fresh boolean with the NEW
  * operator, then every same-operator clause appends (BuildQueryTree:653-
  * 671). `-x` compiles to `(NOT x) OR *:*` (:640-642). Multi-field weights
  * produce a per-field SHOULD disjunction with the weight folded into leaf
  * boosts (NewDefaultQuery:741).
  */
object SimpleQueryParser {

  // feature flags (SimpleQueryParser.cs consts): enabled-by-default ALL
  val AndOperator = 1 << 0
  val NotOperator = 1 << 1
  val OrOperator = 1 << 2
  val PrefixOperator = 1 << 3
  val PhraseOperator = 1 << 4
  val PrecedenceOperators = 1 << 5
  val EscapeOperator = 1 << 6
  val WhitespaceOperator = 1 << 7
  val FuzzyOperator = 1 << 8
  val NearOperator = 1 << 9
  val AllOperators: Int = -1

  private final class State(val data: Array[Char], var index: Int, val length: Int) {
    var top: Query = null
    var currentOperation: Option[Occur.Value] = None
    var previousOperation: Option[Occur.Value] = None
    var not: Int = 0
  }

  def parse(query: String, analyzer: Analyzer): Query =
    parse(query, analyzer, Seq.empty)

  /** `fields`: (name, weight) pairs; empty = unscoped default field at
    * weight 1. `defaultOperator` joins bare whitespace-separated clauses
    * (reference default SHOULD). */
  def parse(query: String, analyzer: Analyzer,
            fields: Seq[(String, Float)],
            defaultOperator: Occur.Value = Occur.Should,
            flags: Int = AllOperators,
            perField: Map[String, Analyzer] = Map.empty): Query = {
    val data = query.toCharArray
    val st = new State(data, 0, data.length)
    parseSubQuery(st, analyzer, fields, defaultOperator, flags, perField)
    if (st.top == null) BoolQ(Nil) else st.top
  }

  private def has(flags: Int, f: Int): Boolean = (flags & f) != 0

  private def parseSubQuery(state: State, analyzer: Analyzer, fields: Seq[(String, Float)],
                            defaultOp: Occur.Value, flags: Int,
                            perField: Map[String, Analyzer]): Unit = {
    while (state.index < state.length) {
      val c = state.data(state.index)
      var skipNotReset = false
      if (c == '(' && has(flags, PrecedenceOperators)) {
        consumeSubQuery(state, analyzer, fields, defaultOp, flags, perField)
      } else if (c == ')' && has(flags, PrecedenceOperators)) {
        state.index += 1 // extraneous, ignored
      } else if (c == '"' && has(flags, PhraseOperator)) {
        consumePhrase(state, analyzer, fields, defaultOp, flags, perField)
      } else if (c == '+' && has(flags, AndOperator)) {
        if (state.currentOperation.isEmpty && state.top != null)
          state.currentOperation = Some(Occur.Must)
        state.index += 1
      } else if (c == '|' && has(flags, OrOperator)) {
        if (state.currentOperation.isEmpty && state.top != null)
          state.currentOperation = Some(Occur.Should)
        state.index += 1
      } else if (c == '-' && has(flags, NotOperator)) {
        state.not += 1
        state.index += 1
        skipNotReset = true // reference `continue`: not-count survives to the operand
      } else if ((c == ' ' || c == '\t' || c == '\n' || c == '\r') && has(flags, WhitespaceOperator)) {
        state.index += 1
      } else {
        consumeToken(state, analyzer, fields, defaultOp, flags, perField)
      }
      if (!skipNotReset) state.not = 0
    }
  }

  private def consumeSubQuery(state: State, analyzer: Analyzer, fields: Seq[(String, Float)],
                              defaultOp: Occur.Value, flags: Int,
                              perField: Map[String, Analyzer]): Unit = {
    state.index += 1
    val start = state.index
    var precedence = 1
    var escaped = false
    var break = false
    while (!break && state.index < state.length) {
      if (!escaped) {
        val c = state.data(state.index)
        if (c == '\\' && has(flags, EscapeOperator)) {
          escaped = true
          state.index += 1
        } else {
          if (c == '(') precedence += 1
          else if (c == ')') {
            precedence -= 1
            if (precedence == 0) break = true
          }
          if (!break) { escaped = false; state.index += 1 }
        }
      } else { escaped = false; state.index += 1 }
    }
    if (state.index == state.length) {
      state.index = start // no closing paren: the '(' was extraneous
    } else if (state.index == start) {
      state.currentOperation = None // "()" resets the pending operator
      state.index += 1
    } else {
      val sub = new State(state.data, start, state.index)
      parseSubQuery(sub, analyzer, fields, defaultOp, flags, perField)
      buildQueryTree(state, sub.top, defaultOp)
      state.index += 1
    }
  }

  private def consumePhrase(state: State, analyzer: Analyzer, fields: Seq[(String, Float)],
                            defaultOp: Occur.Value, flags: Int,
                            perField: Map[String, Analyzer]): Unit = {
    state.index += 1
    val start = state.index
    val buf = new StringBuilder
    var escaped = false
    var hasSlop = false
    var break = false
    while (!break && state.index < state.length) {
      val c = state.data(state.index)
      if (!escaped && c == '\\' && has(flags, EscapeOperator)) {
        escaped = true
        state.index += 1
      } else if (!escaped && c == '"') {
        if (state.length > state.index + 1 && state.data(state.index + 1) == '~'
          && has(flags, NearOperator)) {
          state.index += 1
          if (state.length > state.index + 1) hasSlop = true
        }
        break = true
      } else {
        escaped = false
        buf += c
        state.index += 1
      }
    }
    if (state.index == state.length) {
      state.index = start // no closing quote: the '"' was extraneous
    } else if (state.index == start) {
      state.currentOperation = None // "" resets the pending operator
      state.index += 1
    } else {
      val slop = if (hasSlop) parseFuzziness(state, flags) else 0
      buildQueryTree(state, newPhraseQuery(buf.toString, slop, analyzer, fields, perField), defaultOp)
      state.index += 1
    }
  }

  private def consumeToken(state: State, analyzer: Analyzer, fields: Seq[(String, Float)],
                           defaultOp: Occur.Value, flags: Int,
                           perField: Map[String, Analyzer]): Unit = {
    val buf = new StringBuilder
    var escaped = false
    var prefix = false
    var fuzzy = false
    var break = false
    while (!break && state.index < state.length) {
      val c = state.data(state.index)
      if (!escaped) {
        if (c == '\\' && has(flags, EscapeOperator)) {
          escaped = true
          prefix = false
          state.index += 1
        } else if (tokenFinished(state, flags)) {
          break = true
        } else if (buf.nonEmpty && c == '~' && has(flags, FuzzyOperator)) {
          fuzzy = true
          break = true
        } else {
          prefix = buf.nonEmpty && c == '*' && has(flags, PrefixOperator)
          buf += c
          state.index += 1
        }
      } else {
        escaped = false
        buf += c
        state.index += 1
      }
    }
    if (buf.nonEmpty) {
      val branch: Query =
        if (fuzzy) {
          val token = buf.toString
          val fz = math.min(parseFuzziness(state, flags), 2)
          if (fz == 0) newDefaultQuery(token, analyzer, fields, defaultOp, perField)
          else newFuzzyQuery(token, fz, fields)
        } else if (prefix) {
          newPrefixQuery(buf.toString.dropRight(1), fields)
        } else {
          newDefaultQuery(buf.toString, analyzer, fields, defaultOp, perField)
        }
      buildQueryTree(state, branch, defaultOp)
    }
  }

  private def parseFuzziness(state: State, flags: Int): Int = {
    if (state.index >= state.length || state.data(state.index) != '~') return 0
    val buf = new StringBuilder
    var break = false
    while (!break && state.index < state.length) {
      state.index += 1
      if (state.index < state.length) {
        if (tokenFinished(state, flags)) break = true
        else buf += state.data(state.index)
      }
    }
    val f = try buf.toString.toInt catch { case _: NumberFormatException => 0 }
    math.max(f, 0)
  }

  private def tokenFinished(state: State, flags: Int): Boolean = {
    val c = state.data(state.index)
    (c == '"' && has(flags, PhraseOperator)) ||
      (c == '|' && has(flags, OrOperator)) ||
      (c == '+' && has(flags, AndOperator)) ||
      (c == '(' && has(flags, PrecedenceOperators)) ||
      (c == ')' && has(flags, PrecedenceOperators)) ||
      ((c == ' ' || c == '\t' || c == '\n' || c == '\r') && has(flags, WhitespaceOperator))
  }

  private def buildQueryTree(state: State, branch0: Query, defaultOp: Occur.Value): Unit = {
    var branch = branch0
    if (branch != null) {
      if (state.not % 2 == 1)
        branch = BoolQ(List(Occur.MustNot -> branch, Occur.Should -> MatchAllQ))
      if (state.top == null) {
        state.top = branch
      } else {
        if (state.currentOperation.isEmpty) state.currentOperation = Some(defaultOp)
        val op = state.currentOperation.get
        if (!state.previousOperation.contains(op))
          state.top = BoolQ(List(op -> state.top))
        state.top = state.top match {
          case BoolQ(cs, msm) => BoolQ(cs :+ (op -> branch), msm)
          case other => BoolQ(List(op -> other, op -> branch))
        }
        state.previousOperation = Some(op)
      }
      state.currentOperation = None
    }
  }

  // ------------------------------------------------- factory methods
  // (SimpleQueryParser.cs:741-805; zero-token analyses return null and the
  // branch is silently skipped, Simplify analog)

  private def perFieldWrap(fields: Seq[(String, Float)], mk: String => Query): Query = {
    val eff = if (fields.isEmpty) Seq((null: String, 1f)) else fields
    val qs = eff.flatMap { case (f, w) =>
      Option(mk(f)).map { q =>
        val boosted = Query.withBoost(q, w)
        if (f == null) boosted else FieldQ(f, boosted)
      }
    }
    qs match {
      case Seq() => null
      case Seq(one) => one
      case many => BoolQ(many.toList.map(Occur.Should -> _))
    }
  }

  private def analyzerFor(field: String, default: Analyzer,
                          perField: Map[String, Analyzer]): Analyzer =
    if (field == null) default else perField.getOrElse(field, default)

  private def newDefaultQuery(text: String, analyzer: Analyzer, fields: Seq[(String, Float)],
                              defaultOp: Occur.Value, perField: Map[String, Analyzer]): Query =
    perFieldWrap(fields, f => {
      val ts = analyzerFor(f, analyzer, perField).tokenize(text).map(t => (t.term, t.position)).toList
      if (ts.isEmpty) null
      else if (ts.size == 1) TermQ(ts.head._1)
      else BoolQ(ts.map(t => defaultOp -> (TermQ(t._1): Query)))
    })

  private def newFuzzyQuery(text: String, fuzziness: Int, fields: Seq[(String, Float)]): Query =
    perFieldWrap(fields, _ => FuzzyTopQ(text.toLowerCase, fuzziness))

  private def newPhraseQuery(text: String, slop: Int, analyzer: Analyzer,
                             fields: Seq[(String, Float)],
                             perField: Map[String, Analyzer]): Query =
    perFieldWrap(fields, f => {
      val ts = analyzerFor(f, analyzer, perField).tokenize(text).map(t => (t.term, t.position)).toList
      if (ts.isEmpty) null
      else if (ts.size == 1) TermQ(ts.head._1)
      else PhraseQ(ts, slop = slop)
    })

  private def newPrefixQuery(text: String, fields: Seq[(String, Float)]): Query =
    perFieldWrap(fields, _ => PrefixQ(text.toLowerCase))
}
