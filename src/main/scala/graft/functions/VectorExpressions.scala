package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression for the ANN hot loop: cosine similarity of an
  * ARRAY<FLOAT> column against a broadcast-literal query vector in ONE
  * whole-stage-codegen pass. Replaces the `zip_with` + `aggregate`
  * higher-order-function pair, whose lambda bodies evaluate interpreted per
  * ELEMENT (CodegenFallback) — at dim 64 that is 128 boxed lambda calls per
  * row versus one fused loop here.
  *
  * Bit-for-bit identical to the HOF formulation: the same left-fold
  * summation order, the same float->double cast points, and the same final
  * dot / (sqrt(n2) * qNorm) association — the ANN gates' hashes must not
  * move when this swaps in.
  */
case class CosineToQuery(child: Expression, q: Array[Float], qNorm: Double)
    extends UnaryExpression {

  // the builder below casts the input to ARRAY<FLOAT>, so no
  // ExpectsInputTypes coercion is needed (that trait is private[sql]-typed)
  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val len = math.min(a.numElements(), q.length)
    var dot = 0.0
    var n2 = 0.0
    var i = 0
    while (i < len) {
      val v = a.getFloat(i).toDouble
      dot += v * q(i).toDouble
      n2 += v * v
      i += 1
    }
    dot / (math.sqrt(n2) * qNorm)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val qRef = ctx.addReferenceObj("qvec", q, "float[]")
    // exact double literal via raw bits (string round-trips could drift)
    val qNormLit =
      s"java.lang.Double.longBitsToDouble(${java.lang.Double.doubleToLongBits(qNorm)}L)"
    nullSafeCodeGen(ctx, ev, c => {
      val dot = ctx.freshName("dot")
      val n2 = ctx.freshName("n2")
      val len = ctx.freshName("len")
      val i = ctx.freshName("i")
      val v = ctx.freshName("v")
      s"""
         |double $dot = 0.0;
         |double $n2 = 0.0;
         |int $len = java.lang.Math.min($c.numElements(), $qRef.length);
         |for (int $i = 0; $i < $len; $i++) {
         |  double $v = (double) $c.getFloat($i);
         |  $dot += $v * (double) $qRef[$i];
         |  $n2 += $v * $v;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($n2) * $qNormLit);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): CosineToQuery =
    copy(child = newChild)
}

/** Squared L2 distance of two ARRAY<FLOAT> columns in one codegen pass —
  * replaces zip_with((x-y)*(x-y)) + aggregate. Same left-fold order and
  * cast points as the HOF form; shorter array bounds the loop (zip_with
  * would null-pad, but every caller zips same-dim vectors). */
case class L2SqPair(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
    val len = math.min(a.numElements(), b.numElements())
    var s = 0.0; var i = 0
    while (i < len) {
      val d = a.getFloat(i).toDouble - b.getFloat(i).toDouble
      s += d * d; i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val s = ctx.freshName("s"); val i = ctx.freshName("i")
      val len = ctx.freshName("len"); val d = ctx.freshName("d")
      s"""
         |double $s = 0.0;
         |int $len = java.lang.Math.min($a.numElements(), $b.numElements());
         |for (int $i = 0; $i < $len; $i++) {
         |  double $d = (double) $a.getFloat($i) - (double) $b.getFloat($i);
         |  $s += $d * $d;
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): L2SqPair =
    copy(left = l, right = r)
}

/** Cosine of two ARRAY<FLOAT> columns: dot, |a|², |b|² gathered in ONE loop,
  * combined as dot / (sqrt(na) * sqrt(nb)) — the exact association of the
  * HOF form dot / (norm(a) * norm(b)). */
case class CosinePair(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
    val len = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < len) {
      val x = a.getFloat(i).toDouble; val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na")
      val nb = ctx.freshName("nb"); val i = ctx.freshName("i")
      val len = ctx.freshName("len"); val x = ctx.freshName("x"); val y = ctx.freshName("y")
      s"""
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |int $len = java.lang.Math.min($a.numElements(), $b.numElements());
         |for (int $i = 0; $i < $len; $i++) {
         |  double $x = (double) $a.getFloat($i);
         |  double $y = (double) $b.getFloat($i);
         |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosinePair =
    copy(left = l, right = r)
}

/** Hyperplane-LSH bucket id in one pass: bit j = 1 iff dot(v, plane_j) > 0,
  * bucket = Σ bit_j * 2^j — replaces nBits separate zip_with + aggregate
  * folds (each interpreted per element). Dot order per plane matches the
  * HOF left fold. */
case class LshBucket(child: Expression, planes: Array[Array[Double]])
    extends UnaryExpression {
  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    var bucket = 0L
    var j = 0
    while (j < planes.length) {
      val p = planes(j)
      val len = math.min(a.numElements(), p.length)
      var dot = 0.0; var i = 0
      while (i < len) { dot += a.getFloat(i).toDouble * p(i); i += 1 }
      if (dot > 0) bucket |= (1L << j)
      j += 1
    }
    bucket
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val pRef = ctx.addReferenceObj("planes", planes, "double[][]")
    nullSafeCodeGen(ctx, ev, c => {
      val bkt = ctx.freshName("bkt"); val j = ctx.freshName("j")
      val p = ctx.freshName("p"); val dot = ctx.freshName("dot")
      val i = ctx.freshName("i"); val len = ctx.freshName("len")
      s"""
         |long $bkt = 0L;
         |for (int $j = 0; $j < $pRef.length; $j++) {
         |  double[] $p = $pRef[$j];
         |  int $len = java.lang.Math.min($c.numElements(), $p.length);
         |  double $dot = 0.0;
         |  for (int $i = 0; $i < $len; $i++) {
         |    $dot += (double) $c.getFloat($i) * $p[$i];
         |  }
         |  if ($dot > 0) $bkt |= (1L << $j);
         |}
         |${ev.value} = $bkt;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): LshBucket =
    copy(child = newChild)
}

/** IVF cell assignment in ONE narrow pass: the id of the nearest centroid
  * by (squared L2 asc, cid asc) over a broadcast centroid matrix carried as
  * a reference object — replaces the crossJoin(broadcast(centroids)) ×
  * groupBy(id).agg(min(struct(d2, cid))) formulation, which exploded each
  * vector × numCentroids rows AND shuffled the whole corpus through a hash
  * aggregate just to take an argmin. Per-centroid distance math is
  * bit-identical to [[L2SqPair]] (same min-length bound, same float->double
  * cast points, same fold order); `cids` must be sorted ascending so a
  * strict `<` improvement keeps the smallest cid on exact d2 ties — the
  * lexicographic min(struct(d2, cid)) rule.
  */
case class ArgMinCentroid(child: Expression, cids: Array[Long], cents: Array[Array[Float]])
    extends UnaryExpression {
  require(cids.length == cents.length && cids.nonEmpty)
  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    var best = 0
    var bestD2 = Double.MaxValue
    var c = 0
    while (c < cents.length) {
      val ce = cents(c)
      val len = math.min(a.numElements(), ce.length)
      var s = 0.0; var i = 0
      while (i < len) {
        val d = a.getFloat(i).toDouble - ce(i).toDouble
        s += d * d; i += 1
      }
      if (s < bestD2) { bestD2 = s; best = c }
      c += 1
    }
    cids(best)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cidRef = ctx.addReferenceObj("cids", cids, "long[]")
    val ceRef = ctx.addReferenceObj("cents", cents, "float[][]")
    nullSafeCodeGen(ctx, ev, a => {
      val best = ctx.freshName("best"); val bestD2 = ctx.freshName("bestD2")
      val c = ctx.freshName("c"); val ce = ctx.freshName("ce")
      val s = ctx.freshName("s"); val i = ctx.freshName("i")
      val len = ctx.freshName("len"); val d = ctx.freshName("d")
      s"""
         |int $best = 0;
         |double $bestD2 = Double.MAX_VALUE;
         |for (int $c = 0; $c < $ceRef.length; $c++) {
         |  float[] $ce = $ceRef[$c];
         |  int $len = java.lang.Math.min($a.numElements(), $ce.length);
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $len; $i++) {
         |    double $d = (double) $a.getFloat($i) - (double) $ce[$i];
         |    $s += $d * $d;
         |  }
         |  if ($s < $bestD2) { $bestD2 = $s; $best = $c; }
         |}
         |${ev.value} = $cidRef[$best];
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): ArgMinCentroid =
    copy(child = newChild)
}

/** MinHash signature of a TOKEN array in ONE narrow pass: for each of the
  * `as.length` hash functions, the minimum of ((h(shingle) * a_i + b_i) % p)
  * over every k-token shingle window — h(shingle) replicates
  * Dedup.shingleHash exactly (unsigned first 4 md5 bytes of the
  * space-joined UTF-8 shingle, mod p). Min over the window MULTISET equals
  * min over the distinct-shingle SET, so this matches the exploded
  * shingles -> distinct -> groupBy(id) signature value-for-value while
  * eliminating both shuffles (the signature becomes a map-side column; only
  * the Jaccard VERIFY still needs materialized shingles, and only for
  * candidate docs). CodegenFallback: one virtual eval per ROW — the md5
  * work per shingle dominates either way. */
case class MinHashSig(child: Expression, k: Int, as: Array[Long], bs: Array[Long], p: Long)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  @transient private lazy val md5 =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val nh = as.length
    val mins = Array.fill(nh)(Long.MaxValue)
    val digest = md5.get()
    var i = 0
    while (i + k <= n) {
      // space-joined UTF-8 bytes of the k-token window (array_join(_, ' '))
      digest.reset()
      var j = 0
      while (j < k) {
        if (j > 0) digest.update(' '.toByte)
        digest.update(arr.getUTF8String(i + j).getBytes)
        j += 1
      }
      val d = digest.digest()
      // conv(substr(hex, 1, 8), 16, 10): unsigned first 4 bytes
      val h = (((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)) % p
      var t = 0
      while (t < nh) {
        val v = (h * as(t) + bs(t)) % p
        if (v < mins(t)) mins(t) = v
        t += 1
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(mins)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** 48-bit SimHash of a TOKEN array in one narrow pass: per-doc tf map, then
  * per distinct term the md5-derived bit vector (bits j<24 from the first 4
  * digest bytes, j>=24 from the next 4 — substr(hex,1,8)/substr(hex,9,8))
  * weighted by tf with sign(2*bit - 1); fingerprint bit j = 1 iff the
  * weight sum is > 0. Pure integer arithmetic — value-identical to the
  * exploded tf -> termBits-join -> double-groupBy formulation while
  * removing BOTH token-cardinality shuffles and the x48 bit-row blowup. */
case class SimHash48(child: Expression)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType = LongType

  @transient private lazy val md5 =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val tf = new java.util.HashMap[org.apache.spark.unsafe.types.UTF8String, Array[Long]]()
    var i = 0
    while (i < n) {
      val t = arr.getUTF8String(i)
      val c = tf.get(t)
      if (c == null) tf.put(t.clone(), Array(1L)) else c(0) += 1L
      i += 1
    }
    val w = new Array[Long](48)
    val digest = md5.get()
    val it = tf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      digest.reset()
      val d = digest.digest(e.getKey.getBytes)
      val h1 = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) | ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      val h2 = ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) | ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
      val c = e.getValue()(0)
      var j = 0
      while (j < 48) {
        val bit = if (j < 24) (h1 >> j) & 1L else (h2 >> (j - 24)) & 1L
        w(j) += c * (bit * 2L - 1L)
        j += 1
      }
    }
    var fp = 0L
    var j = 0
    while (j < 48) { if (w(j) > 0) fp |= (1L << j); j += 1 }
    fp
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash48 =
    copy(child = newChild)
}

object VectorExpressions {
  /** cosine(embCol, q) as a codegen'd Column; `qNorm` precomputed once. */
  def cosineToQuery(emb: Column, q: Array[Float], qNorm: Double): Column =
    GraftColumnBridge.column(CosineToQuery(
      GraftColumnBridge.expression(emb.cast("array<float>")), q, qNorm))

  def l2sq(a: Column, b: Column): Column =
    GraftColumnBridge.column(L2SqPair(
      GraftColumnBridge.expression(a.cast("array<float>")),
      GraftColumnBridge.expression(b.cast("array<float>"))))

  def cosinePair(a: Column, b: Column): Column =
    GraftColumnBridge.column(CosinePair(
      GraftColumnBridge.expression(a.cast("array<float>")),
      GraftColumnBridge.expression(b.cast("array<float>"))))

  def lshBucket(emb: Column, planes: Array[Array[Double]]): Column =
    GraftColumnBridge.column(LshBucket(
      GraftColumnBridge.expression(emb.cast("array<float>")), planes))

  /** Nearest-centroid id over a broadcast centroid matrix, one fused pass;
    * (cids, cents) must be parallel arrays sorted by cid ascending. */
  def argMinCentroid(emb: Column, cids: Array[Long], cents: Array[Array[Float]]): Column =
    GraftColumnBridge.column(ArgMinCentroid(
      GraftColumnBridge.expression(emb.cast("array<float>")), cids, cents))

  /** MinHash signature array over a token-array column. */
  def minHashSig(tokens: Column, k: Int, coeffs: Seq[(Long, Long)], p: Long): Column =
    GraftColumnBridge.column(MinHashSig(
      GraftColumnBridge.expression(tokens),
      k, coeffs.map(_._1).toArray, coeffs.map(_._2).toArray, p))

  /** 48-bit SimHash over a token-array column. */
  def simHash48(tokens: Column): Column =
    GraftColumnBridge.column(SimHash48(GraftColumnBridge.expression(tokens)))
}
