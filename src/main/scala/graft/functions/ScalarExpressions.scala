package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native scalar expressions for the build/serve hot paths — these replace
  * the last per-row Scala UDFs, which block whole-stage-codegen fusion and
  * pay boxing + safe/unsafe row conversion on every input row (at 10^12
  * docs that overhead is a real term in build throughput).
  */

/** Deterministic segment id of a doc key: floorMod(murmur3(key), n) —
  * exactly [[graft.model.Addressing.segmentOf]] (the codegen calls that very
  * method via its static forwarder, so the hash can never drift from the
  * driver-side assignments used by merges and deletes).
  */
case class SegmentOf(child: Expression, numSegments: Int) extends UnaryExpression {
  override def dataType: DataType = IntegerType

  override protected def nullSafeEval(input: Any): Any =
    graft.model.Addressing.segmentOf(input.asInstanceOf[UTF8String].toString, numSegments)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.model.Addressing.segmentOf($c.toString(), $numSegments);")

  override protected def withNewChildInternal(newChild: Expression): SegmentOf =
    copy(child = newChild)
}

/** byte315 norm roundtrip of a field length:
  * decode(encode((1/sqrt(len)).toFloat)) as double — the SmallFloat tables
  * the scorer uses, fused into codegen (was a per-row UDF in ValueSources).
  */
case class Byte315Norm(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(input: Any): Any = {
    val len = input.asInstanceOf[Int]
    graft.codec.SmallFloat.byte315ToFloat(
      graft.codec.SmallFloat.floatToByte315(
        (1.0 / math.sqrt(len.toDouble)).toFloat)).toDouble
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = (double) graft.codec.SmallFloat.byte315ToFloat(
         |  graft.codec.SmallFloat.floatToByte315(
         |    (float) (1.0 / java.lang.Math.sqrt((double) $c))));""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Byte315Norm =
    copy(child = newChild)
}

/** FuzzyTermsEnum boost: 1f - ed / min(termCodePoints, qLen) in FLOAT
  * division (Spark's Divide promotes float operands to double; the
  * reference computes this in float, and one-ulp double-rounding drift
  * would reorder the top-maxExpansions cut). Was a per-row UDF.
  */
case class FuzzyBoost(term: Expression, ed: Expression, qLen: Int)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def left: Expression = term
  override def right: Expression = ed
  override def dataType: DataType = FloatType

  override protected def nullSafeEval(t: Any, e: Any): Any = {
    val edits = e.asInstanceOf[Int]
    if (edits == 0) 1f
    else {
      val s = t.asInstanceOf[UTF8String]
      val cLen = s.numChars() // code points — matches String.codePointCount
      1f - edits.toFloat / math.min(cLen, qLen).toFloat
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, e) =>
      s"""if ($e == 0) { ${ev.value} = 1.0f; }
         |else {
         |  ${ev.value} = 1.0f - (float) $e /
         |    (float) java.lang.Math.min($t.numChars(), $qLen);
         |}""".stripMargin)

  override protected def withNewChildrenInternal(l: Expression, r: Expression): FuzzyBoost =
    copy(term = l, ed = r)
}

/** DirectSpellChecker distance of a candidate term against the fixed query
  * string — the last remaining per-row UDF family, now a native expression:
  * the query ships as a codegen reference object and each row is one static
  * call, keeping the (budget-capped) candidate scan inside whole-stage
  * codegen with no boxing or safe/unsafe conversion.
  */
case class SpellDistance(kind: String, query: String, child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = DoubleType

  private val fn: (String, String) => Double = kind match {
    case "jarowinkler" => SpellDistanceOps.jaroWinkler
    case "ngram" => SpellDistanceOps.nGram
    case "lucenelevenshtein" => SpellDistanceOps.luceneLevenshtein
    case other => throw new IllegalArgumentException(s"unknown distance: $other")
  }

  private val methodName: String = kind match {
    case "jarowinkler" => "jaroWinkler"
    case "ngram" => "nGram"
    case "lucenelevenshtein" => "luceneLevenshtein"
  }

  override protected def nullSafeEval(input: Any): Any =
    fn(query, input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val q = ctx.addReferenceObj("spellQuery", query, "java.lang.String")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SpellDistanceOps.$methodName($q, $c.toString());")
  }

  override protected def withNewChildInternal(newChild: Expression): SpellDistance =
    copy(child = newChild)
}

/** Static-forwarder surface for [[SpellDistance]] codegen (no default-arg
  * forwarders to fight in generated Java).
  */
object SpellDistanceOps {
  def jaroWinkler(a: String, b: String): Double =
    graft.search.StringDistances.jaroWinkler(a, b)
  def nGram(a: String, b: String): Double =
    graft.search.StringDistances.nGram(a, b)
  def luceneLevenshtein(a: String, b: String): Double =
    graft.search.StringDistances.luceneLevenshtein(a, b)
}

/** Decontamination probe counter: number of DISTINCT probe strings that
  * occur as a k-token shingle of the token-array child — the narrow-path
  * replacement for shingle-explode + broadcast join (Dedup.contamination).
  * One expression evaluates the token array ONCE per row (a composed-
  * expression formulation re-derives the tokenization per probe when the
  * optimizer inlines it into a pushed-down filter); the probe set rides into
  * tasks as a closure reference, never as codegen literals. CodegenFallback:
  * window hashing dominates either way (the MinHashSig adjudication).
  */
case class ProbeHits(child: Expression, k: Int, probes: Array[String])
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def dataType: DataType = LongType

  @transient private lazy val probeSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](probes.length * 2)
    probes.foreach(s.add)
    s
  }

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val n = arr.numElements()
    if (n < k) return 0L
    val toks = new Array[String](n)
    var i = 0
    while (i < n) { toks(i) = arr.getUTF8String(i).toString; i += 1 }
    val matched = new java.util.HashSet[String]()
    val sb = new java.lang.StringBuilder(64)
    i = 0
    while (i + k <= n) {
      sb.setLength(0)
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      val w = sb.toString
      if (probeSet.contains(w)) matched.add(w)
      i += 1
    }
    matched.size.toLong
  }

  override protected def withNewChildInternal(newChild: Expression): ProbeHits =
    copy(child = newChild)
}

object ScalarExpressions {
  /** segmentOf(key, n) as a codegen'd Column. */
  def segmentOf(key: Column, numSegments: Int): Column =
    GraftColumnBridge.column(SegmentOf(
      GraftColumnBridge.expression(key.cast("string")), numSegments))

  /** byte315 norm roundtrip of an INT length column. */
  def byte315Norm(len: Column): Column =
    GraftColumnBridge.column(Byte315Norm(
      GraftColumnBridge.expression(len.cast("int"))))

  /** Float-exact FuzzyTermsEnum boost over (term, editDistance) columns. */
  def fuzzyBoost(term: Column, ed: Column, qLen: Int): Column =
    GraftColumnBridge.column(FuzzyBoost(
      GraftColumnBridge.expression(term.cast("string")),
      GraftColumnBridge.expression(ed.cast("int")), qLen))

  /** Spell distance ("jarowinkler" | "ngram" | "lucenelevenshtein") of a
    * term column against a fixed query string, codegen-fused. */
  def spellDistance(kind: String, query: String, term: Column): Column =
    GraftColumnBridge.column(SpellDistance(kind, query,
      GraftColumnBridge.expression(term.cast("string"))))

  /** Distinct-probe k-shingle hit count over a token-array column. */
  def probeHits(tokens: Column, k: Int, probes: Array[String]): Column =
    GraftColumnBridge.column(ProbeHits(
      GraftColumnBridge.expression(tokens), k, probes))
}
