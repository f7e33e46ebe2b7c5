package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.pipeline.Ann
import graft.functions.VectorExpressions

/** Native vector expressions (graft.functions.VectorExpressions) must be
  * BIT-identical to the higher-order-function folds they replaced — the ANN
  * and embedding-dedup gate hashes may not move. */
class VectorExpressionsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val dim = 64
  private lazy val emb = {
    import spark.implicits._
    spark.range(2000L).select(col("id"),
      expr(s"transform(sequence(0, ${dim - 1}), " +
        "j -> cast((id * 31 + j * 7) % 101 - 50 as float))").as("e"))
      .cache()
  }

  private val q = Array.tabulate(dim)(i => (((i * 37 + 11) % 97) - 48).toFloat)
  private val qNorm = math.sqrt(q.map(v => v.toDouble * v.toDouble).sum)

  test("CosineToQuery == dotCol / (normCol * qNorm), bit for bit") {
    val both = emb.select(
      VectorExpressions.cosineToQuery(col("e"), q, qNorm).as("nat"),
      (Ann.dotCol("e", q) / (Ann.normCol(col("e")) * lit(qNorm))).as("hof"))
      .collect()
    both.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("L2SqPair == the HOF fold, bit for bit") {
    val qArr = array(q.toIndexedSeq.map(v => lit(v)): _*)
    val both = emb.select(
      VectorExpressions.l2sq(col("e"), qArr).as("nat"),
      Ann.l2sqColHof(col("e"), qArr.cast("array<float>")).as("hof")).collect()
    both.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("CosinePair == dot / (norm * norm), bit for bit") {
    val shifted = emb.select(col("id"),
      expr(s"transform(sequence(0, ${dim - 1}), " +
        "j -> cast((id * 13 + j * 3) % 89 - 44 as float))").as("e2"), col("e"))
    val dot = aggregate(
      zip_with(col("e"), col("e2"), (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0d), (acc, x) => acc + x)
    val both = shifted.select(
      VectorExpressions.cosinePair(col("e"), col("e2")).as("nat"),
      (dot / (Ann.normCol(col("e")) * Ann.normCol(col("e2")))).as("hof")).collect()
    both.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("LshBucket == the per-plane HOF fold bits") {
    val nBits = 12
    val ps = Ann.planes(dim, nBits)
    val hofBucket = (0 until nBits).map { j =>
      val pArr = array(ps(j).toIndexedSeq.map(v => lit(v)): _*)
      val dot = aggregate(
        zip_with(col("e"), pArr, (x, y) => x.cast("double") * y),
        lit(0.0d), (acc, x) => acc + x)
      when(dot > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _).cast("long")
    val both = emb.select(
      VectorExpressions.lshBucket(col("e"), ps).as("nat"),
      hofBucket.as("hof")).collect()
    both.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("interpreted eval (codegen off) equals codegen output") {
    val prev = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    val on = emb.select(VectorExpressions.cosineToQuery(col("e"), q, qNorm)).collect()
    try {
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      val off = emb.select(VectorExpressions.cosineToQuery(col("e"), q, qNorm)).collect()
      on.zip(off).foreach { case (a, b) =>
        assert(java.lang.Double.doubleToLongBits(a.getDouble(0)) ==
          java.lang.Double.doubleToLongBits(b.getDouble(0)))
      }
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", prev)
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }
}
