package graft.search

/** Composable DFR / IB similarity components — the full SimilarityBase
  * framework catalog, float-cast-faithful to the reference:
  *
  *  - basic models (/root/reference/src/Lucene.Net.Core/Search/Similarities/
  *    BasicModelBE.cs:40-45, BasicModelD.cs:42-53, BasicModelG.cs:34-42,
  *    BasicModelIF.cs:32-37, BasicModelIn.cs:32-37, BasicModelIne.cs:35-41,
  *    BasicModelP.cs:42-46)
  *  - after effects (AfterEffectL.cs:32-35, AfterEffectB.cs:32-37,
  *    AfterEffect.cs:57-60 NoAfterEffect)
  *  - normalizations (NormalizationH1.cs:51-54, NormalizationH2.cs:51-54,
  *    NormalizationH3.cs:44-47, NormalizationZ.cs:47-50,
  *    Normalization.cs:69-72 NoNormalization)
  *  - IB distributions/lambdas (DistributionLL.cs:37-40,
  *    DistributionSPL.cs:38-45, LambdaDF.cs:32-35, LambdaTTF.cs:32-35)
  *
  * Scores compose as DFRSimilarity.cs:107-111
  * (boost * basicModel(tfn) * afterEffect(tfn)) and IBSimilarity.cs:97-100
  * (boost * distribution(tfn, lambda)). Every `*F` function replicates the
  * C# float/double cast points exactly (Log2 = double ln/ln2 per
  * SimilarityBase.cs:278); every `*D` function is the unquantized double
  * twin used by the ExactDouble oracle mode.
  *
  * Stats vocabulary: N = NumberOfDocuments (maxDoc), df = DocFreq,
  * ttf = TotalTermFreq(F), sttf = NumberOfFieldTokens, avg = AvgFieldLength.
  */
object DfrIb {
  val Ln2: Double = math.log(2d)
  def log2(x: Double): Double = math.log(x) / Ln2

  val BasicModels: Set[String] = Set("be", "d", "g", "if", "in", "ine", "p")
  val AfterEffects: Set[String] = Set("none", "b", "l")
  val Normalizations: Set[String] = Set("none", "h1", "h2", "h3", "z")
  val Distributions: Set[String] = Set("ll", "spl")
  val Lambdas: Set[String] = Set("df", "ttf")

  // -------------------------------------------------- float chains
  // Normalization.Tfn(stats, tf, len) — (tf, docLen) => tfn, all-float
  // except where the reference widens to double
  def tfnF(norm: String, c: Float, avg: Float, ttf: Long, sttf: Long): (Float, Float) => Float =
    norm match {
      case "none" => (tf, _) => tf
      case "h1" => (tf, dl) => tf * avg / dl
      case "h2" => (tf, dl) => (tf.toDouble * log2((1f + c * avg / dl).toDouble)).toFloat
      case "h3" => (tf, dl) => (tf + c * ((ttf + 1f) / (sttf + 1f))) / (dl + c) * c
      case "z" => (tf, dl) => (tf.toDouble * math.pow((avg / dl).toDouble, c.toDouble)).toFloat
      case other => throw new IllegalArgumentException(s"unknown normalization: $other")
    }

  // BasicModel.Score(stats, tfn)
  def basicF(model: String, n: Long, df: Long, ttf: Long): Float => Float = model match {
    case "in" =>
      val w = log2((n + 1) / (df + 0.5)).toFloat
      tfn => tfn * w
    case "if" =>
      val w = log2(1 + (n + 1) / (ttf + 0.5)).toFloat
      tfn => tfn * w
    case "ine" =>
      val ne = n * (1 - math.pow((n - 1) / n.toDouble, ttf.toDouble))
      val w = log2((n + 1) / (ne + 0.5)).toFloat
      tfn => tfn * w
    case "g" =>
      val bigF = ttf + 1d
      val lambda = bigF / (n + bigF)
      tfn => (log2(lambda + 1) + tfn.toDouble * log2((1 + lambda) / lambda)).toFloat
    case "be" =>
      tfn => {
        val bigF = ttf + 1 + tfn.toDouble
        val bigN = bigF + n
        def f(a: Double, m: Double) = (m + 0.5) * log2(a / m) + (a - m) * log2(a)
        (-log2((bigN - 1) * math.E) +
          f(bigN + bigF - 1, bigN + bigF - tfn - 2) - f(bigF, bigF - tfn)).toFloat
      }
    case "d" =>
      tfn => {
        val bigF = ttf + 1 + tfn.toDouble
        val phi = tfn.toDouble / bigF
        val nphi = 1 - phi
        val p = 1.0 / (n + 1)
        val bigD = phi * log2(phi / p) + nphi * log2(nphi / (1 - p))
        (bigD * bigF + 0.5 * log2(1 + 2 * math.Pi * tfn * nphi)).toFloat
      }
    case "p" =>
      val lambda = (ttf + 1).toFloat / (n + 1).toFloat
      val log2e = log2(math.E)
      tfn => (tfn.toDouble * log2((tfn / lambda).toDouble) +
        (lambda + 1f / (12f * tfn) - tfn).toDouble * log2e +
        0.5 * log2(2 * math.Pi * tfn)).toFloat
    case other => throw new IllegalArgumentException(s"unknown basic model: $other")
  }

  // AfterEffect.Score(stats, tfn)
  def afterF(ae: String, df: Long, ttf: Long): Float => Float = ae match {
    case "none" => _ => 1f
    case "l" => tfn => 1f / (tfn + 1f)
    // AfterEffectB.cs:32-37: F = ttf+1, n = df+1, score = (F+1)/(n*(tfn+1))
    case "b" => tfn => (ttf + 2).toFloat / ((df + 1).toFloat * (tfn + 1f))
    case other => throw new IllegalArgumentException(s"unknown after effect: $other")
  }

  // Lambda.CalculateLambda(stats)
  def lambdaF(kind: String, n: Long, df: Long, ttf: Long): Float = kind match {
    case "df" => (df + 1f) / (n + 1f)
    case "ttf" => (ttf + 1f) / (n + 1f)
    case other => throw new IllegalArgumentException(s"unknown lambda: $other")
  }

  // Distribution.Score(stats, tfn, lambda)
  def distF(dist: String): (Float, Float) => Float = dist match {
    case "ll" => (tfn, lambda) => (-math.log((lambda / (tfn + lambda)).toDouble)).toFloat
    case "spl" => (tfn, lambda0) => {
      val lambda = if (lambda0 == 1f) 0.99f else lambda0
      (-math.log((math.pow(lambda.toDouble, (tfn / (tfn + 1f)).toDouble) - lambda) /
        (1f - lambda))).toFloat
    }
    case other => throw new IllegalArgumentException(s"unknown distribution: $other")
  }

  // -------------------------------------------------- double twins
  // (unquantized docLen, all arithmetic in double — the ExactDouble /
  // SQL-oracle mode; formulas identical, casts dropped)
  def tfnD(norm: String, c: Double, avg: Double, ttf: Long, sttf: Long): (Double, Double) => Double =
    norm match {
      case "none" => (tf, _) => tf
      case "h1" => (tf, dl) => tf * avg / dl
      case "h2" => (tf, dl) => tf * log2(1 + c * avg / dl)
      case "h3" => (tf, dl) => (tf + c * ((ttf + 1d) / (sttf + 1d))) / (dl + c) * c
      case "z" => (tf, dl) => tf * math.pow(avg / dl, c)
      case other => throw new IllegalArgumentException(s"unknown normalization: $other")
    }

  def basicD(model: String, n: Long, df: Long, ttf: Long): Double => Double = model match {
    case "in" =>
      val w = log2((n + 1) / (df + 0.5))
      tfn => tfn * w
    case "if" =>
      val w = log2(1 + (n + 1) / (ttf + 0.5))
      tfn => tfn * w
    case "ine" =>
      val ne = n * (1 - math.pow((n - 1) / n.toDouble, ttf.toDouble))
      val w = log2((n + 1) / (ne + 0.5))
      tfn => tfn * w
    case "g" =>
      val bigF = ttf + 1d
      val lambda = bigF / (n + bigF)
      tfn => log2(lambda + 1) + tfn * log2((1 + lambda) / lambda)
    case "be" =>
      tfn => {
        val bigF = ttf + 1 + tfn
        val bigN = bigF + n
        def f(a: Double, m: Double) = (m + 0.5) * log2(a / m) + (a - m) * log2(a)
        -log2((bigN - 1) * math.E) +
          f(bigN + bigF - 1, bigN + bigF - tfn - 2) - f(bigF, bigF - tfn)
      }
    case "d" =>
      tfn => {
        val bigF = ttf + 1 + tfn
        val phi = tfn / bigF
        val nphi = 1 - phi
        val p = 1.0 / (n + 1)
        val bigD = phi * log2(phi / p) + nphi * log2(nphi / (1 - p))
        bigD * bigF + 0.5 * log2(1 + 2 * math.Pi * tfn * nphi)
      }
    case "p" =>
      val lambda = (ttf + 1d) / (n + 1d)
      val log2e = log2(math.E)
      tfn => tfn * log2(tfn / lambda) +
        (lambda + 1d / (12d * tfn) - tfn) * log2e +
        0.5 * log2(2 * math.Pi * tfn)
    case other => throw new IllegalArgumentException(s"unknown basic model: $other")
  }

  def afterD(ae: String, df: Long, ttf: Long): Double => Double = ae match {
    case "none" => _ => 1d
    case "l" => tfn => 1d / (tfn + 1d)
    // AfterEffectB.cs:32-37: F = ttf+1, n = df+1, score = (F+1)/(n*(tfn+1))
    case "b" => tfn => (ttf + 2d) / ((df + 1d) * (tfn + 1d))
    case other => throw new IllegalArgumentException(s"unknown after effect: $other")
  }

  def lambdaD(kind: String, n: Long, df: Long, ttf: Long): Double = kind match {
    case "df" => (df + 1d) / (n + 1d)
    case "ttf" => (ttf + 1d) / (n + 1d)
    case other => throw new IllegalArgumentException(s"unknown lambda: $other")
  }

  def distD(dist: String): (Double, Double) => Double = dist match {
    case "ll" => (tfn, lambda) => -math.log(lambda / (tfn + lambda))
    case "spl" => (tfn, lambda0) => {
      val lambda = if (lambda0 == 1d) 0.99 else lambda0
      -math.log((math.pow(lambda, tfn / (tfn + 1)) - lambda) / (1 - lambda))
    }
    case other => throw new IllegalArgumentException(s"unknown distribution: $other")
  }
}
