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
}
