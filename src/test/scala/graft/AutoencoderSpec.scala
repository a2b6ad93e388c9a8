package graft

import graft.ml.{AeConfig, Autoencoder}

/** From-scratch autoencoder (the reference's actual M2 model family):
  * exact-gradient pin, the reference's 784-250-10-250-784 config, and the
  * anomaly contract — manifold data reconstructs well, off-manifold
  * outliers score high.
  */
class AutoencoderSpec extends SparkSpec {

  import SharedSpark.spark.implicits._

  private val tiny = AeConfig(Seq(6, 4, 2, 4, 6))

  test("M2: autoencoder gradients match central differences on every layer") {
    val rnd = new scala.util.Random(31)
    val x = Array.fill(6)(rnd.nextDouble())
    val p = Autoencoder.init(tiny, seed = 7)
    val grad = p.zeroed
    Autoencoder.lossAndGrad(tiny, p, x, grad)

    val eps = 1e-6
    var checked = 0
    for ((arr, gArr) <- p.arrays.zip(grad.arrays)) {
      val idxs = (Seq(0, arr.length - 1) ++ Seq.fill(5)(rnd.nextInt(arr.length))).distinct
      for (i <- idxs) {
        val orig = arr(i)
        arr(i) = orig + eps
        val up = Autoencoder.lossAndGrad(tiny, p, x, p.zeroed)
        arr(i) = orig - eps
        val dn = Autoencoder.lossAndGrad(tiny, p, x, p.zeroed)
        arr(i) = orig
        val numeric = (up - dn) / (2 * eps)
        val denom = math.max(1e-8, math.abs(numeric) + math.abs(gArr(i)))
        assert(math.abs(numeric - gArr(i)) / denom < 1e-5,
          s"gradient mismatch len=${arr.length} idx=$i: numeric=$numeric analytic=${gArr(i)}")
        checked += 1
      }
    }
    assert(checked >= 25)
  }

  /** The reference's builder sets RELU at the NeuralNetConfiguration
    * level and the OutputLayer inherits it (MNISTAnomalyDetector.java:96,
    * :105-106) — reluOutput = true is that exact head. The gradient must
    * stay exact through the extra output gate, and the reconstruction is
    * non-negative by construction. Fixed seeds (the identity test's 31/7,
    * under which the bottleneck stays active — a DEAD bottleneck makes the
    * next layer's pre-activation exactly its zero-init bias, parking the
    * probe on the ReLU kink) keep every probed pre-activation away from
    * the kink, so the central-difference check stays exact and
    * deterministic.
    */
  test("M2: reluOutput head (the reference's exact config) gradient-checks") {
    val cfg = AeConfig(Seq(6, 4, 2, 4, 6), reluOutput = true)
    val rnd = new scala.util.Random(31)
    val x = Array.fill(6)(rnd.nextDouble())
    val p = Autoencoder.init(cfg, seed = 7)
    assert(Autoencoder.reconstruct(cfg, p, x).forall(_ >= 0.0))
    val grad = p.zeroed
    Autoencoder.lossAndGrad(cfg, p, x, grad)
    val eps = 1e-6
    var checked = 0
    for ((arr, gArr) <- p.arrays.zip(grad.arrays)) {
      val idxs = (Seq(0, arr.length - 1) ++ Seq.fill(5)(rnd.nextInt(arr.length))).distinct
      for (i <- idxs) {
        val orig = arr(i)
        arr(i) = orig + eps
        val up = Autoencoder.lossAndGrad(cfg, p, x, p.zeroed)
        arr(i) = orig - eps
        val dn = Autoencoder.lossAndGrad(cfg, p, x, p.zeroed)
        arr(i) = orig
        val numeric = (up - dn) / (2 * eps)
        val denom = math.max(1e-8, math.abs(numeric) + math.abs(gArr(i)))
        assert(math.abs(numeric - gArr(i)) / denom < 1e-5,
          s"gradient mismatch len=${arr.length} idx=$i: numeric=$numeric analytic=${gArr(i)}")
        checked += 1
      }
    }
    assert(checked >= 25)
  }

  test("M2: the reference 784-250-10-250-784 config runs a real step") {
    val cfg = AeConfig() // the reference's exact layer stack
    val rnd = new scala.util.Random(11)
    val p = Autoencoder.init(cfg, seed = 12345) // the reference's seed
    val x = Array.fill(784)(rnd.nextDouble())
    assert(Autoencoder.reconstruct(cfg, p, x).length == 784)
    assert(Autoencoder.lossAndGrad(cfg, p, x, p.zeroed) > 0)
  }

  /** Normal data lives on a 3-dim linear manifold (x = A·z + small noise);
    * outliers are full-dimensional uniform noise. A 2-unit bottleneck
    * cannot pass 16 independent dims, so training on normals must separate
    * the score distributions — the anomaly contract of the reference's
    * chapter 3 detector.
    */
  test("M2: trained AE scores off-manifold outliers above on-manifold data") {
    val dim = 16
    val cfg = AeConfig(Seq(dim, 8, 3, 8, dim))
    val rnd = new scala.util.Random(17)
    val basis = Array.fill(3, dim)(rnd.nextDouble() - 0.5)
    def normal(): Array[Double] = {
      val z = Array.fill(3)(rnd.nextDouble() * 2 - 1)
      Array.tabulate(dim)(d =>
        z(0) * basis(0)(d) + z(1) * basis(1)(d) + z(2) * basis(2)(d) +
          (rnd.nextDouble() - 0.5) * 0.02)
    }
    def outlier(): Array[Double] = Array.fill(dim)(rnd.nextDouble() * 2 - 1)

    val sc = spark.sparkContext
    val train = spark.createDataset(sc.parallelize(Seq.fill(400)(normal()), 4))
    val p = Autoencoder.fitParameterAveraging(train, cfg, epochs = 20, lr = 0.05,
      batchSize = 16, seed = 12345)

    val normalScores = Seq.fill(60)(normal()).map(Autoencoder.score(cfg, p, _))
    val outlierScores = Seq.fill(60)(outlier()).map(Autoencoder.score(cfg, p, _))
    val cut = normalScores.max
    val caught = outlierScores.count(_ > cut)
    assert(caught >= 54, // >= 90% of outliers above EVERY normal holdout score
      s"outliers not separated: caught=$caught/60, maxNormal=$cut, " +
        s"medianOutlier=${outlierScores.sorted.apply(30)}")

    // deterministic under fixed seed + partitioning (shared NetOps loop)
    val p2 = Autoencoder.fitParameterAveraging(train, cfg, epochs = 20, lr = 0.05,
      batchSize = 16, seed = 12345)
    assert(p.ws.head.sameElements(p2.ws.head))
  }

  /** Review-r9 pins: shape errors name the config instead of surfacing as
    * raw array crashes (or silently training a constant model).
    */
  test("M2: config and input validation fail loudly") {
    import graft.ml.{AeConfig, Autoencoder}
    val e1 = intercept[IllegalArgumentException] { AeConfig(Seq(64, 0, 64)) }
    assert(e1.getMessage.contains("positive"), e1.getMessage)
    intercept[IllegalArgumentException] { AeConfig(Seq(64, -4, 64)) }
    val cfg = AeConfig(Seq(6, 4, 2, 4, 6))
    val w = Autoencoder.init(cfg, seed = 1)
    val e2 = intercept[IllegalArgumentException] {
      Autoencoder.score(cfg, w, new Array[Double](8)) // longer than layers.head
    }
    assert(e2.getMessage.contains("8") && e2.getMessage.contains("6"), e2.getMessage)
    intercept[IllegalArgumentException] {
      Autoencoder.lossAndGrad(cfg, w, new Array[Double](3), w.zeroed)
    }
  }
}
