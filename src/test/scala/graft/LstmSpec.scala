package graft

import graft.ml.{Lstm, LstmConfig}

/** From-scratch LSTM (M1 fidelity gap): exact BPTT pinned by central
  * differences, the reference's sentiment config, and the capability the
  * doc-averaging substitute provably lacks — sensitivity to token ORDER.
  */
class LstmSpec extends SparkSpec {

  import SharedSpark.spark.implicits._

  private val tiny = LstmConfig(inDim = 4, hidden = 5, classes = 3)

  test("M1: BPTT gradients match central differences on every array") {
    val rnd = new scala.util.Random(13)
    val xs = Seq.fill(4)(Array.fill(tiny.inDim)(rnd.nextDouble() * 2 - 1))
    val y = 2
    val p = Lstm.init(tiny, seed = 17)
    val grad = p.zeroed
    Lstm.lossAndGrad(tiny, p, xs, y, grad)

    val eps = 1e-6
    var checked = 0
    for ((arr, gArr) <- p.arrays.zip(grad.arrays)) {
      val idxs = (Seq(0, arr.length - 1) ++ Seq.fill(6)(rnd.nextInt(arr.length))).distinct
      for (i <- idxs) {
        val orig = arr(i)
        arr(i) = orig + eps
        val up = Lstm.lossAndGrad(tiny, p, xs, y, p.zeroed)
        arr(i) = orig - eps
        val dn = Lstm.lossAndGrad(tiny, p, xs, y, p.zeroed)
        arr(i) = orig
        val numeric = (up - dn) / (2 * eps)
        val analytic = gArr(i)
        val denom = math.max(1e-8, math.abs(numeric) + math.abs(analytic))
        assert(math.abs(numeric - analytic) / denom < 1e-5,
          s"BPTT mismatch len=${arr.length} idx=$i: numeric=$numeric analytic=$analytic")
        checked += 1
      }
    }
    assert(checked >= 25)
  }

  test("M1: reference sentiment config (300 -> LSTM 256 -> softmax 2) runs a real step") {
    val cfg = LstmConfig() // the reference's exact dims
    val rnd = new scala.util.Random(5)
    val p = Lstm.init(cfg, seed = 2)
    val xs = Seq.fill(6)(Array.fill(300)(rnd.nextDouble() * 0.1))
    val probs = Lstm.predictProbs(cfg, p, xs)
    assert(probs.length == 2 && math.abs(probs.sum - 1.0) < 1e-9)
    val loss = Lstm.lossAndGrad(cfg, p, xs, 1, p.zeroed)
    assert(loss > 0 && loss < 5, s"fresh-init NLL should be ~ln(2): $loss")
  }

  /** The A-before-B task: every sequence contains marker word A and marker
    * word B exactly once at random positions among noise words; the class is
    * which comes FIRST. Both classes share the identical bag of words, so
    * any mean/sum-pooled representation of the two classes is distributed
    * identically by construction — the averaging-MLP substitute the engine
    * used for M1 until now cannot beat chance here, and that is precisely
    * the documented gap this model closes.
    */
  private def orderData(n: Int, seed: Long): Seq[(Int, Seq[Array[Double]])] = {
    val rnd = new scala.util.Random(seed)
    val dim = 6
    def noise() = Array.fill(dim)(rnd.nextDouble() * 0.2)
    def marker(j: Int) = {
      val a = Array.fill(dim)(rnd.nextDouble() * 0.1)
      a(j) = 1.0
      a
    }
    (0 until n).map { i =>
      val t = 8
      val Seq(pa, pb) = rnd.shuffle((0 until t).toList).take(2).sorted.toSeq
      val aFirst = i % 2 == 0
      val xs = (0 until t).map { pos =>
        if (pos == pa) marker(if (aFirst) 0 else 1)
        else if (pos == pb) marker(if (aFirst) 1 else 0)
        else noise()
      }
      (if (aFirst) 0 else 1, xs)
    }
  }

  test("M1: learns token ORDER (A-before-B), the capability doc-averaging lacks") {
    val cfg = LstmConfig(inDim = 6, hidden = 12, classes = 2)
    val sc = spark.sparkContext
    val train = spark.createDataset(sc.parallelize(orderData(300, seed = 3), 4))
    val test = spark.createDataset(sc.parallelize(orderData(100, seed = 77), 4))

    // construction check: the mean-pooled features carry NO class signal —
    // the two classes' pooled means coincide (identical bags of words)
    val pooled = orderData(600, seed = 123).map { case (y, xs) =>
      (y, xs.transpose.map(_.sum / xs.length))
    }
    val mean0 = pooled.filter(_._1 == 0).map(_._2).transpose.map(v => v.sum / v.size)
    val mean1 = pooled.filter(_._1 == 1).map(_._2).transpose.map(v => v.sum / v.size)
    val gap = mean0.zip(mean1).map { case (a, b) => math.abs(a - b) }.max
    assert(gap < 0.05, s"pooled class means should coincide by construction: $gap")

    val p = Lstm.fitParameterAveraging(train, cfg, epochs = 12, lr = 5e-3,
      batchSize = 16, seed = 42)
    val acc = Lstm.accuracy(test, cfg, p)
    assert(acc >= 0.9, s"LSTM should learn A-before-B order: acc=$acc")

    // deterministic under fixed seed + partitioning
    val p2 = Lstm.fitParameterAveraging(train, cfg, epochs = 12, lr = 5e-3,
      batchSize = 16, seed = 42)
    assert(p.wo.sameElements(p2.wo) && p.wx.sameElements(p2.wx))
  }

  /** Review-r9 pin: a step row off the config's width fails with the
    * shape, not an out-of-bounds crash (short) or silent truncation (long).
    */
  test("M1: sequence-step dimension validation fails loudly") {
    import graft.ml.{Lstm, LstmConfig}
    val cfg = LstmConfig(inDim = 4, hidden = 3, classes = 2)
    val w = Lstm.init(cfg, seed = 1)
    val e = intercept[IllegalArgumentException] {
      Lstm.predictProbs(cfg, w, Seq(new Array[Double](4), new Array[Double](7)))
    }
    assert(e.getMessage.contains("inDim=4") && e.getMessage.contains("7"), e.getMessage)
    intercept[IllegalArgumentException] {
      Lstm.lossAndGrad(cfg, w, Seq(new Array[Double](3)), 0, w.zeroed)
    }
  }
}
