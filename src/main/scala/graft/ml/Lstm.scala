package graft.ml

import org.apache.spark.sql.Dataset

/** LSTM sequence classifier, from scratch on the JVM — closes the documented
  * M1 fidelity gap (MLlib has no recurrent layers, so rounds 1-7 substituted
  * Word2Vec doc-averaging + MLP, which is order-blind by construction). The
  * architecture mirrors the reference exactly
  * (13486_Code/src/main/scala/chapter2/PredictCommentsUsingRNNAndWord2Vec.java:94-107):
  * word-vector inputs -> one LSTM layer (tanh) -> softmax output with
  * multiclass cross-entropy, Xavier init, L2 1e-5, element-wise gradient
  * clipping at 1.0, Adam 5e-3. The class decision reads the LAST hidden
  * state (the standard sentiment head for DL4J's RnnOutputLayer setup).
  *
  * Distribution: [[Lstm.fitParameterAveraging]] — per-partition local Adam
  * from broadcast weights, driver-side averaging in partition order (bit-
  * deterministic; see [[ConvNet.fitParameterAveraging]] for the rationale).
  *
  * Gradients are exact BPTT, pinned by LstmSpec's central-difference check;
  * what the averaging-MLP provably cannot express — sensitivity to token
  * ORDER — is demonstrated by LstmSpec's A-before-B task, whose two classes
  * have identical mean-pooled features by construction.
  */
case class LstmConfig(inDim: Int = 300, hidden: Int = 256, classes: Int = 2)

/** Gate order inside the stacked arrays: input, forget, candidate, output. */
case class LstmParams(
    wx: Array[Double], // (4*hidden) x inDim
    wh: Array[Double], // (4*hidden) x hidden
    b: Array[Double],  // 4*hidden
    wo: Array[Double], // classes x hidden
    bo: Array[Double]) extends FlatParams[LstmParams] {

  def arrays: Seq[Array[Double]] = Seq(wx, wh, b, wo, bo)

  def rebuild(a: Seq[Array[Double]]): LstmParams =
    LstmParams(a(0), a(1), a(2), a(3), a(4))
}

object Lstm {

  def init(cfg: LstmConfig, seed: Long): LstmParams = {
    val rnd = new scala.util.Random(seed)
    import cfg._
    val p = LstmParams(
      NetOps.xavier(rnd, 4 * hidden * inDim, inDim, hidden),
      NetOps.xavier(rnd, 4 * hidden * hidden, hidden, hidden),
      new Array(4 * hidden),
      NetOps.xavier(rnd, classes * hidden, hidden, classes),
      new Array(classes))
    // forget-gate bias init to 1.0 (standard practice: remember by default)
    var i = hidden
    while (i < 2 * hidden) { p.b(i) = 1.0; i += 1 }
    p
  }

  @inline private def sigmoid(x: Double): Double = 1.0 / (1.0 + math.exp(-x))

  /** One LSTM cell step from (x, h, c). Returns every intermediate BPTT
    * needs — (i, f, g, o, cNew, tanh(cNew), hNew) — so training and
    * inference share ONE copy of the gate recurrence: a fix to gate order
    * or numerics cannot make them silently disagree (review r9).
    */
  private def cellStep(cfg: LstmConfig, p: LstmParams, x: Array[Double],
                       h: Array[Double], c: Array[Double]): CellState = {
    import cfg._
    val z = preActivations(cfg, p, x, h)
    val i2 = new Array[Double](hidden); val f2 = new Array[Double](hidden)
    val g2 = new Array[Double](hidden); val o2 = new Array[Double](hidden)
    val cN = new Array[Double](hidden); val tN = new Array[Double](hidden)
    val hN = new Array[Double](hidden)
    var u = 0
    while (u < hidden) {
      i2(u) = sigmoid(z(u))
      f2(u) = sigmoid(z(hidden + u))
      g2(u) = math.tanh(z(2 * hidden + u))
      o2(u) = sigmoid(z(3 * hidden + u))
      cN(u) = f2(u) * c(u) + i2(u) * g2(u)
      tN(u) = math.tanh(cN(u))
      hN(u) = o2(u) * tN(u)
      u += 1
    }
    CellState(i2, f2, g2, o2, cN, tN, hN)
  }

  private final case class CellState(i: Array[Double], f: Array[Double],
      g: Array[Double], o: Array[Double], c: Array[Double],
      tc: Array[Double], h: Array[Double])

  /** Output-head logits from the last hidden state — shared by training
    * and inference for the same no-divergence reason as [[cellStep]].
    */
  private def outputLogits(cfg: LstmConfig, p: LstmParams,
                           h: Array[Double]): Array[Double] = {
    import cfg._
    val logits = new Array[Double](classes)
    var o = 0
    while (o < classes) {
      var s = p.bo(o)
      var u = 0
      while (u < hidden) { s += p.wo(o * hidden + u) * h(u); u += 1 }
      logits(o) = s
      o += 1
    }
    logits
  }

  /** A step row off the config's width would crash (short) or silently
    * truncate (long) inside the preActivation loops — fail with the shape.
    */
  private def requireInputDim(cfg: LstmConfig, xs: Seq[Array[Double]]): Unit =
    require(xs.forall(_.length == cfg.inDim),
      s"every sequence step must have inDim=${cfg.inDim} components, " +
        s"got lengths ${xs.map(_.length).distinct.mkString(",")}")

  /** Forward over one sequence; returns class probabilities. */
  def predictProbs(cfg: LstmConfig, p: LstmParams, xs: Seq[Array[Double]]): Array[Double] = {
    import cfg._
    require(xs.nonEmpty, "empty sequence")
    requireInputDim(cfg, xs)
    var h = new Array[Double](hidden)
    var c = new Array[Double](hidden)
    for (x <- xs) {
      val st = cellStep(cfg, p, x, h, c)
      h = st.h; c = st.c
    }
    NetOps.softmax(outputLogits(cfg, p, h))
  }

  def predict(cfg: LstmConfig, p: LstmParams, xs: Seq[Array[Double]]): Int = {
    val probs = predictProbs(cfg, p, xs)
    var best = 0
    var i = 1
    while (i < probs.length) { if (probs(i) > probs(best)) best = i; i += 1 }
    best
  }

  /** z = Wx·x + Wh·h + b for all four gates stacked (length 4*hidden). */
  private def preActivations(cfg: LstmConfig, p: LstmParams,
                             x: Array[Double], h: Array[Double]): Array[Double] = {
    import cfg._
    val z = new Array[Double](4 * hidden)
    var r = 0
    while (r < 4 * hidden) {
      var s = p.b(r)
      var i = 0
      while (i < inDim) { s += p.wx(r * inDim + i) * x(i); i += 1 }
      var u = 0
      while (u < hidden) { s += p.wh(r * hidden + u) * h(u); u += 1 }
      z(r) = s
      r += 1
    }
    z
  }

  /** NLL loss of one sequence, exact BPTT gradient ACCUMULATED into `grad`
    * (no clipping here — clipping is an update-time policy, applied in
    * [[adamPass]], so the gradient check can verify calculus, not policy).
    */
  def lossAndGrad(cfg: LstmConfig, p: LstmParams, xs: Seq[Array[Double]], y: Int,
                  grad: LstmParams): Double = {
    import cfg._
    val t = xs.length
    require(t > 0, "empty sequence")
    requireInputDim(cfg, xs)
    // forward, keeping per-step state (ONE gate recurrence: cellStep)
    val hs = Array.ofDim[Array[Double]](t + 1) // hs(0) = h_0 = 0
    val cs = Array.ofDim[Array[Double]](t + 1)
    val ig = Array.ofDim[Array[Double]](t)
    val fg = Array.ofDim[Array[Double]](t)
    val gg = Array.ofDim[Array[Double]](t)
    val og = Array.ofDim[Array[Double]](t)
    val tc = Array.ofDim[Array[Double]](t) // tanh(c_t)
    hs(0) = new Array(hidden); cs(0) = new Array(hidden)
    var step = 0
    while (step < t) {
      val st = cellStep(cfg, p, xs(step), hs(step), cs(step))
      ig(step) = st.i; fg(step) = st.f; gg(step) = st.g; og(step) = st.o
      cs(step + 1) = st.c; hs(step + 1) = st.h; tc(step) = st.tc
      step += 1
    }
    // output head on the last hidden state
    val hT = hs(t)
    val probs = NetOps.softmax(outputLogits(cfg, p, hT))
    val loss = -math.log(math.max(probs(y), 1e-300))

    // backward: output layer
    var dh = new Array[Double](hidden)
    var dc = new Array[Double](hidden)
    var o = 0
    while (o < classes) {
      val g = probs(o) - (if (o == y) 1.0 else 0.0)
      grad.bo(o) += g
      var u = 0
      while (u < hidden) {
        grad.wo(o * hidden + u) += g * hT(u)
        dh(u) += g * p.wo(o * hidden + u)
        u += 1
      }
      o += 1
    }
    // BPTT
    step = t - 1
    while (step >= 0) {
      val da = new Array[Double](4 * hidden)
      val dhPrev = new Array[Double](hidden)
      val dcPrev = new Array[Double](hidden)
      var u = 0
      while (u < hidden) {
        val doGate = dh(u) * tc(step)(u)
        val dcT = dc(u) + dh(u) * og(step)(u) * (1 - tc(step)(u) * tc(step)(u))
        val diGate = dcT * gg(step)(u)
        val dfGate = dcT * cs(step)(u)
        val dgGate = dcT * ig(step)(u)
        da(u) = diGate * ig(step)(u) * (1 - ig(step)(u))
        da(hidden + u) = dfGate * fg(step)(u) * (1 - fg(step)(u))
        da(2 * hidden + u) = dgGate * (1 - gg(step)(u) * gg(step)(u))
        da(3 * hidden + u) = doGate * og(step)(u) * (1 - og(step)(u))
        dcPrev(u) = dcT * fg(step)(u)
        u += 1
      }
      val x = xs(step)
      val hPrev = hs(step)
      var r = 0
      while (r < 4 * hidden) {
        val g = da(r)
        if (g != 0.0) {
          grad.b(r) += g
          var i = 0
          while (i < inDim) { grad.wx(r * inDim + i) += g * x(i); i += 1 }
          var uu = 0
          while (uu < hidden) {
            grad.wh(r * hidden + uu) += g * hPrev(uu)
            dhPrev(uu) += g * p.wh(r * hidden + uu)
            uu += 1
          }
        }
        r += 1
      }
      dh = dhPrev; dc = dcPrev
      step -= 1
    }
    loss
  }

  /** Adam state (one pair of moment arrays per param array). */
  final class AdamState(p: LstmParams) {
    val m: Seq[Array[Double]] = p.arrays.map(a => new Array[Double](a.length))
    val v: Seq[Array[Double]] = p.arrays.map(a => new Array[Double](a.length))
    var t: Int = 0
  }

  /** One local pass of Adam minibatch training (mutates `p`). The reference's
    * policies apply here: element-wise gradient clip at `clip`, L2 `l2` on
    * weights (not biases).
    */
  def adamPass(cfg: LstmConfig, p: LstmParams, state: AdamState,
               data: Seq[(Int, Seq[Array[Double]])], lr: Double, batchSize: Int,
               l2: Double = 1e-5, clip: Double = 1.0,
               beta1: Double = 0.9, beta2: Double = 0.999, eps: Double = 1e-8): Double = {
    var totalLoss = 0.0
    val weightArrays = Set(0, 1, 3) // wx, wh, wo
    for (batch <- data.grouped(batchSize)) {
      val grad = p.zeroed
      for ((y, xs) <- batch) totalLoss += lossAndGrad(cfg, p, xs, y, grad)
      val scale = 1.0 / batch.size
      state.t += 1
      val bc1 = 1 - math.pow(beta1, state.t)
      val bc2 = 1 - math.pow(beta2, state.t)
      for (pos <- grad.arrays.indices) {
        val g = grad.arrays(pos); val w = p.arrays(pos)
        val m = state.m(pos); val v = state.v(pos)
        val decay = if (weightArrays(pos)) l2 else 0.0
        var i = 0
        while (i < g.length) {
          var gi = g(i) * scale + decay * w(i)
          if (gi > clip) gi = clip else if (gi < -clip) gi = -clip
          m(i) = beta1 * m(i) + (1 - beta1) * gi
          v(i) = beta2 * v(i) + (1 - beta2) * gi * gi
          w(i) -= lr * (m(i) / bc1) / (math.sqrt(v(i) / bc2) + eps)
          i += 1
        }
      }
    }
    totalLoss / math.max(1, data.size)
  }

  /** Distributed fit by per-epoch parameter averaging — the shared
    * [[NetOps.averageEpochs]] driver loop (bit-deterministic under a fixed
    * seed + partitioning; empty input returns the seeded init unchanged).
    * Adam moments restart each epoch (local state, like DL4J's default).
    */
  def fitParameterAveraging(data: Dataset[(Int, Seq[Array[Double]])], cfg: LstmConfig,
                            epochs: Int, lr: Double, batchSize: Int, seed: Long,
                            l2: Double = 1e-5, clip: Double = 1.0): LstmParams =
    NetOps.averageEpochs(data, epochs, seed)(init(cfg, seed))(_.copyOf)(
      (local, rows) => adamPass(cfg, local, new AdamState(local), rows, lr, batchSize, l2, clip))

  /** Distributed accuracy over a labeled sequence dataset (NaN when empty). */
  def accuracy(data: Dataset[(Int, Seq[Array[Double]])], cfg: LstmConfig,
               p: LstmParams): Double =
    NetOps.accuracyOf(data, p) { case (w, (y, xs)) => predict(cfg, w, xs) == y }
}
