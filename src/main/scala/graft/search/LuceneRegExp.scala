package graft.search

import scala.collection.mutable

/** Lucene's RegExp dialect (/root/reference/src/Lucene.Net.Core/Util/
  * Automaton/RegExp.cs, flags = ALL minus AUTOMATON-providers): the full
  * grammar — union `|`, intersection `&`, complement `~`, concatenation,
  * `? * + {n} {n,} {n,m}` repetition, char classes `[a-z^...]`, `.` any
  * char, `#` empty language, `@` any string, `"..."` quoted literals,
  * `()` the empty string, `\c` escapes, and `<n-m>` numeric intervals
  * (equal-width bounds fix the digit count, unequal-width bounds allow
  * lengths up to the max bound's width — BasicAutomata.MakeInterval).
  *
  * Where the reference compiles to a Brics automaton and intersects it
  * with the term dictionary FST, this implementation keeps the parsed AST
  * and decides membership per TERM with a memoized span matcher —
  * complement and intersection become span-level boolean ops, so no
  * determinization is needed and the semantics follow the automaton
  * construction 1:1. Terms are short; the matcher is O(nodes · len²)
  * with memoization. Candidate PRUNING reuses the engine's existing
  * machinery through [[relaxedJavaRegex]]: a Java-regex OVER-approximation
  * of the language (complements relax to any-string, intersections to one
  * operand) that is sargable by the dict/gram index; the span matcher
  * then verifies candidates exactly.
  */
object LuceneRegExp {

  sealed trait Node extends Serializable
  final case class RChar(c: Int) extends Node
  final case class RRange(from: Int, to: Int) extends Node
  case object RAnyChar extends Node
  case object RAnyString extends Node
  case object REmptyLang extends Node // '#'
  final case class RString(s: String) extends Node // "..." or ()
  final case class RConcat(a: Node, b: Node) extends Node
  final case class RUnion(a: Node, b: Node) extends Node
  final case class RInter(a: Node, b: Node) extends Node
  final case class RCompl(a: Node) extends Node
  final case class RRepeat(a: Node, min: Int, max: Int) extends Node // max = -1: unbounded
  final case class RInterval(min: Int, max: Int, digits: Int) extends Node

  // ---------------------------------------------------------------- parser

  /** Recursive-descent parse per RegExp.cs (union > inter > concat >
    * repeat > compl > charclass > simple). */
  def parse(pattern: String): Node = new Parser(pattern).parseAll()

  private final class Parser(b: String) {
    private var pos = 0
    private def more: Boolean = pos < b.length
    private def peekIn(s: String): Boolean = more && s.indexOf(b.codePointAt(pos)) >= 0
    private def matchCp(c: Int): Boolean =
      if (more && b.codePointAt(pos) == c) { pos += Character.charCount(c); true } else false
    private def next(): Int = {
      if (!more) throw new IllegalArgumentException("unexpected end-of-string")
      val c = b.codePointAt(pos); pos += Character.charCount(c); c
    }

    def parseAll(): Node = {
      val e = parseUnion()
      if (more) throw new IllegalArgumentException(s"end-of-string expected at position $pos")
      e
    }

    private def parseUnion(): Node = {
      val e = parseInter()
      if (matchCp('|')) RUnion(e, parseUnion()) else e
    }

    private def parseInter(): Node = {
      val e = parseConcat()
      if (matchCp('&')) RInter(e, parseInter()) else e
    }

    private def parseConcat(): Node = {
      val e = parseRepeat()
      if (more && !peekIn(")|&")) RConcat(e, parseConcat()) else e
    }

    private def parseRepeat(): Node = {
      var e = parseCompl()
      while (peekIn("?*+{")) {
        if (matchCp('?')) e = RRepeat(e, 0, 1)
        else if (matchCp('*')) e = RRepeat(e, 0, -1)
        else if (matchCp('+')) e = RRepeat(e, 1, -1)
        else if (matchCp('{')) {
          val start = pos
          while (peekIn("0123456789")) next()
          if (start == pos) throw new IllegalArgumentException(s"integer expected at position $pos")
          val n = b.substring(start, pos).toInt
          var m = -1
          if (matchCp(',')) {
            val s2 = pos
            while (peekIn("0123456789")) next()
            if (s2 != pos) m = b.substring(s2, pos).toInt
          } else m = n
          if (!matchCp('}')) throw new IllegalArgumentException(s"expected '}' at position $pos")
          e = RRepeat(e, n, m)
        }
      }
      e
    }

    private def parseCompl(): Node =
      if (matchCp('~')) RCompl(parseCompl()) else parseCharClassExp()

    private def parseCharClassExp(): Node =
      if (matchCp('[')) {
        val negate = matchCp('^')
        var e = parseCharClass()
        while (more && !peekIn("]")) e = RUnion(e, parseCharClass())
        if (!matchCp(']')) throw new IllegalArgumentException(s"expected ']' at position $pos")
        if (negate) RInter(RAnyChar, RCompl(e)) else e
      } else parseSimple()

    private def parseCharClass(): Node = {
      val c = parseCharExp()
      if (matchCp('-')) RRange(c, parseCharExp()) else RChar(c)
    }

    private def parseCharExp(): Int = { matchCp('\\'); next() }

    private def parseSimple(): Node = {
      if (matchCp('.')) RAnyChar
      else if (matchCp('#')) REmptyLang
      else if (matchCp('@')) RAnyString
      else if (matchCp('"')) {
        val start = pos
        while (more && !peekIn("\"")) next()
        if (!matchCp('"')) throw new IllegalArgumentException(s"expected '\"' at position $pos")
        RString(b.substring(start, pos - 1))
      } else if (matchCp('(')) {
        if (matchCp(')')) RString("")
        else {
          val e = parseUnion()
          if (!matchCp(')')) throw new IllegalArgumentException(s"expected ')' at position $pos")
          e
        }
      } else if (matchCp('<')) {
        val start = pos
        while (more && !peekIn(">")) next()
        if (!matchCp('>')) throw new IllegalArgumentException(s"expected '>' at position $pos")
        val s = b.substring(start, pos - 1)
        val i = s.indexOf('-')
        if (i == -1 || i == 0 || i == s.length - 1 || i != s.lastIndexOf('-'))
          throw new IllegalArgumentException(s"interval syntax error at position ${pos - 1}")
        val smin = s.substring(0, i)
        val smax = s.substring(i + 1)
        var imin = smin.toInt
        var imax = smax.toInt
        val digits = if (smin.length == smax.length) smin.length else 0
        if (imin > imax) { val t = imin; imin = imax; imax = t }
        RInterval(imin, imax, digits)
      } else RChar(parseCharExp())
    }
  }

  // --------------------------------------------------------------- matcher

  /** Full-string membership: does `term` belong to the pattern's language?
    * Memoized span evaluation over code points. */
  def matches(node: Node, term: String): Boolean = {
    val cps = term.codePoints().toArray
    val memo = mutable.HashMap.empty[(Node, Int, Int), Boolean]

    def m(n: Node, i: Int, j: Int): Boolean = memo.getOrElseUpdate((n, i, j), n match {
      case RChar(c) => j == i + 1 && cps(i) == c
      case RRange(a, b2) => j == i + 1 && cps(i) >= a && cps(i) <= b2
      case RAnyChar => j == i + 1
      case RAnyString => true
      case REmptyLang => false
      case RString(s) =>
        val sc = s.codePoints().toArray
        j - i == sc.length && (0 until sc.length).forall(k => cps(i + k) == sc(k))
      case RConcat(a, b2) => (i to j).exists(k => m(a, i, k) && m(b2, k, j))
      case RUnion(a, b2) => m(a, i, j) || m(b2, i, j)
      case RInter(a, b2) => m(a, i, j) && m(b2, i, j)
      case RCompl(a) => !m(a, i, j)
      case RRepeat(a, min, max) =>
        if (min == 0 && i == j) true
        else if (max == 0) i == j
        else {
          // consume one non-empty `a` block and recurse with decremented
          // bounds; when min > 0 an ε-matching `a` may also satisfy a copy
          // zero-width (a{2} accepts "x" when ε ∈ a) — min strictly
          // decreases there, so the same-span recursion terminates
          val rest = RRepeat(a, math.max(0, min - 1), if (max < 0) -1 else max - 1)
          ((i + 1) to j).exists(k => m(a, i, k) && m(rest, k, j)) ||
            (min > 0 && m(a, i, i) && m(rest, i, j))
        }
      case RInterval(min, max, digits) =>
        val len = j - i
        val maxLen = if (digits > 0) digits else max.toString.length
        val minLen = if (digits > 0) digits else 1
        len >= minLen && len <= maxLen &&
          (i until j).forall(k => cps(k) >= '0' && cps(k) <= '9') && {
            // numeric compare on the (short, digit-only) slice
            val v = new java.math.BigInteger(new String(cps, i, len))
            v.compareTo(java.math.BigInteger.valueOf(min)) >= 0 &&
              v.compareTo(java.math.BigInteger.valueOf(max)) <= 0
          }
    })

    m(node, 0, cps.length)
  }

  // ------------------------------------------- sargable over-approximation

  /** Java-regex SUPERSET of the language, for in-plan candidate pruning:
    * complement relaxes to any-string, intersection to its left operand,
    * numeric intervals to digit runs of the right width — everything else
    * translates exactly. The span matcher stays the decider. */
  def relaxedJavaRegex(node: Node): String = node match {
    case RChar(c) => java.util.regex.Pattern.quote(new String(Character.toChars(c)))
    case RRange(a, b) => "[" + cls(a) + "-" + cls(b) + "]"
    case RAnyChar => "."
    case RAnyString => "(?s:.*)"
    case REmptyLang => "(?!)" // matches nothing
    case RString(s) => java.util.regex.Pattern.quote(s)
    case RConcat(a, b) => relaxedJavaRegex(a) + relaxedJavaRegex(b)
    case RUnion(a, b) => "(?:" + relaxedJavaRegex(a) + "|" + relaxedJavaRegex(b) + ")"
    case RInter(a, _) => "(?:" + relaxedJavaRegex(a) + ")" // superset: one side
    case RCompl(_) => "(?s:.*)" // superset: anything
    case RRepeat(a, min, max) =>
      val inner = "(?:" + relaxedJavaRegex(a) + ")"
      if (max < 0) inner + s"{$min,}" else inner + s"{$min,$max}"
    case RInterval(min, max, digits) =>
      val maxLen = if (digits > 0) digits else max.toString.length
      val minLen = if (digits > 0) digits else 1
      s"[0-9]{$minLen,$maxLen}"
  }

  private def cls(c: Int): String = {
    val s = new String(Character.toChars(c))
    if ("\\^]-[&".contains(s)) "\\" + s else s
  }
}
