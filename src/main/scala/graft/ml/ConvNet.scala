package graft.ml

import org.apache.spark.sql.Dataset

/** LeNet-style convolutional network, from scratch on the JVM — closes the
  * documented M3 fidelity gap (MLlib has no conv layers). The architecture
  * mirrors the reference exactly
  * (13486_Code/src/main/scala/chapter_4/MnistClassification.java:99-131):
  * conv 5x5 -> 20 maps (identity activation), max-pool 2x2, conv 5x5 -> 50
  * maps (identity), max-pool 2x2, dense 500 ReLU, softmax output with
  * negative-log-likelihood loss, Xavier init, L2 weight decay, Nesterov
  * momentum SGD. All sizes are constructor parameters so tests can train a
  * small instance fast; the defaults are the reference's MNIST configuration.
  *
  * Distribution model: [[ConvNet.fitParameterAveraging]] runs local
  * minibatch SGD inside each partition and averages the resulting weights
  * once per epoch — the reference's own scale-out pattern
  * (chapter_4's DL4J ParameterAveragingTrainingMaster; SparkNet,
  * Moritz et al. 2015). Executors never exchange activations, only one
  * weight vector per partition per epoch, so the shuffle volume is
  * O(|params| * partitions), independent of corpus size — the property
  * that makes the pattern viable at 100 TB of training data.
  *
  * Everything is Double-precision Array math: no MLlib, no native deps,
  * fully serializable, exact gradients (pinned by a central-difference
  * gradient check in ConvNetSpec).
  */
case class ConvNetConfig(
    inSize: Int = 28,
    k: Int = 5,
    conv1Maps: Int = 20,
    conv2Maps: Int = 50,
    hidden: Int = 500,
    classes: Int = 10,
    pool: Int = 2) {
  // positivity first: the derived-size vals below DIVIDE by pool, so a
  // require after them never runs for pool=0 (bare ArithmeticException
  // from the constructor instead of a message naming the bad parameter)
  require(inSize > 0 && k > 0 && conv1Maps > 0 && conv2Maps > 0 &&
    hidden > 0 && classes > 0 && pool > 0,
    s"all ConvNetConfig dimensions must be positive: " +
      s"inSize=$inSize k=$k conv1Maps=$conv1Maps conv2Maps=$conv2Maps " +
      s"hidden=$hidden classes=$classes pool=$pool")
  val c1Size: Int = inSize - k + 1        // conv1 output (valid, stride 1)
  val p1Size: Int = c1Size / pool         // pool1 output
  val c2Size: Int = p1Size - k + 1        // conv2 output
  val p2Size: Int = c2Size / pool         // pool2 output
  val flat: Int = conv2Maps * p2Size * p2Size
  require(c1Size > 0 && c2Size > 0, s"kernel $k too large for input $inSize")
  require(c1Size % pool == 0 && c2Size % pool == 0,
    s"conv outputs ($c1Size, $c2Size) must be divisible by pool=$pool")
}

/** Flat weight arrays; a case class of arrays is Java-serializable, so the
  * per-epoch broadcast + averaging reduce ship it without custom codecs.
  */
case class ConvNetParams(
    w1: Array[Double], b1: Array[Double],
    w2: Array[Double], b2: Array[Double],
    wh: Array[Double], bh: Array[Double],
    wo: Array[Double], bo: Array[Double]) extends FlatParams[ConvNetParams] {

  def arrays: Seq[Array[Double]] = Seq(w1, b1, w2, b2, wh, bh, wo, bo)

  def rebuild(a: Seq[Array[Double]]): ConvNetParams =
    ConvNetParams(a(0), a(1), a(2), a(3), a(4), a(5), a(6), a(7))
}

object ConvNet {

  /** Xavier-uniform init, deterministic under `seed`. */
  def init(cfg: ConvNetConfig, seed: Long): ConvNetParams = {
    val rnd = new scala.util.Random(seed)
    import cfg._
    ConvNetParams(
      NetOps.xavier(rnd, conv1Maps * k * k, k * k, conv1Maps * k * k),
      new Array(conv1Maps),
      NetOps.xavier(rnd, conv2Maps * conv1Maps * k * k, conv1Maps * k * k, conv2Maps * k * k),
      new Array(conv2Maps),
      NetOps.xavier(rnd, hidden * flat, flat, hidden),
      new Array(hidden),
      NetOps.xavier(rnd, classes * hidden, hidden, classes),
      new Array(classes))
  }

  // ---- primitive layers (row-major: image [c][i][j] -> (c*S+i)*S+j;
  //      conv W [oc][ic][a][b] -> ((oc*IC+ic)*K+a)*K+b; dense W [o][i]) ----

  private def conv(in: Array[Double], inCh: Int, inSize: Int,
                   w: Array[Double], b: Array[Double], outCh: Int, k: Int): Array[Double] = {
    val outSize = inSize - k + 1
    val out = new Array[Double](outCh * outSize * outSize)
    var oc = 0
    while (oc < outCh) {
      var i = 0
      while (i < outSize) {
        var j = 0
        while (j < outSize) {
          var s = b(oc)
          var ic = 0
          while (ic < inCh) {
            var a = 0
            while (a < k) {
              var bb = 0
              while (bb < k) {
                s += in((ic * inSize + i + a) * inSize + j + bb) *
                  w(((oc * inCh + ic) * k + a) * k + bb)
                bb += 1
              }
              a += 1
            }
            ic += 1
          }
          out((oc * outSize + i) * outSize + j) = s
          j += 1
        }
        i += 1
      }
      oc += 1
    }
    out
  }

  /** dIn returned; dW/dB accumulated into the given gradient arrays. */
  private def convBackward(in: Array[Double], inCh: Int, inSize: Int,
                           w: Array[Double], outCh: Int, k: Int,
                           dOut: Array[Double],
                           dW: Array[Double], dB: Array[Double]): Array[Double] = {
    val outSize = inSize - k + 1
    val dIn = new Array[Double](in.length)
    var oc = 0
    while (oc < outCh) {
      var i = 0
      while (i < outSize) {
        var j = 0
        while (j < outSize) {
          val g = dOut((oc * outSize + i) * outSize + j)
          if (g != 0.0) {
            dB(oc) += g
            var ic = 0
            while (ic < inCh) {
              var a = 0
              while (a < k) {
                var bb = 0
                while (bb < k) {
                  val inIdx = (ic * inSize + i + a) * inSize + j + bb
                  val wIdx = ((oc * inCh + ic) * k + a) * k + bb
                  dW(wIdx) += g * in(inIdx)
                  dIn(inIdx) += g * w(wIdx)
                  bb += 1
                }
                a += 1
              }
              ic += 1
            }
          }
          j += 1
        }
        i += 1
      }
      oc += 1
    }
    dIn
  }

  private def maxPool(in: Array[Double], ch: Int, size: Int, pool: Int):
      (Array[Double], Array[Int]) = {
    val outSize = size / pool
    val out = new Array[Double](ch * outSize * outSize)
    val arg = new Array[Int](out.length)
    var c = 0
    while (c < ch) {
      var i = 0
      while (i < outSize) {
        var j = 0
        while (j < outSize) {
          // seed with the window's first element, not (-Inf, -1): an
          // all-NaN window (corrupt upstream row) compares false against
          // any best, and a -1 argmax would crash poolBackward — NaN
          // propagates instead, surfacing as a bad SCORE, not a bad index
          var bestIdx = (c * size + i * pool) * size + j * pool
          var best = in(bestIdx)
          var a = 0
          while (a < pool) {
            var b = 0
            while (b < pool) {
              val idx = (c * size + i * pool + a) * size + j * pool + b
              if (in(idx) > best) { best = in(idx); bestIdx = idx }
              b += 1
            }
            a += 1
          }
          val o = (c * outSize + i) * outSize + j
          out(o) = best
          arg(o) = bestIdx
          j += 1
        }
        i += 1
      }
      c += 1
    }
    (out, arg)
  }

  private def poolBackward(dOut: Array[Double], arg: Array[Int], inLen: Int): Array[Double] = {
    val dIn = new Array[Double](inLen)
    var o = 0
    while (o < dOut.length) { dIn(arg(o)) += dOut(o); o += 1 }
    dIn
  }

  private def dense(in: Array[Double], w: Array[Double], b: Array[Double],
                    out: Int): Array[Double] = {
    val n = in.length
    val y = new Array[Double](out)
    var o = 0
    while (o < out) {
      var s = b(o)
      var i = 0
      while (i < n) { s += w(o * n + i) * in(i); i += 1 }
      y(o) = s
      o += 1
    }
    y
  }

  private def denseBackward(in: Array[Double], w: Array[Double], out: Int,
                            dOut: Array[Double],
                            dW: Array[Double], dB: Array[Double]): Array[Double] = {
    val n = in.length
    val dIn = new Array[Double](n)
    var o = 0
    while (o < out) {
      val g = dOut(o)
      dB(o) += g
      var i = 0
      while (i < n) {
        dW(o * n + i) += g * in(i)
        dIn(i) += g * w(o * n + i)
        i += 1
      }
      o += 1
    }
    dIn
  }

  /** Forward pass; returns class probabilities. */
  def predictProbs(cfg: ConvNetConfig, p: ConvNetParams, x: Array[Double]): Array[Double] = {
    import cfg._
    require(x.length == inSize * inSize,
      s"input has ${x.length} pixels, config expects $inSize x $inSize")
    val c1 = conv(x, 1, inSize, p.w1, p.b1, conv1Maps, k)
    val (p1, _) = maxPool(c1, conv1Maps, c1Size, pool)
    val c2 = conv(p1, conv1Maps, p1Size, p.w2, p.b2, conv2Maps, k)
    val (p2, _) = maxPool(c2, conv2Maps, c2Size, pool)
    val h = dense(p2, p.wh, p.bh, hidden).map(v => math.max(0.0, v))
    NetOps.softmax(dense(h, p.wo, p.bo, classes))
  }

  def predict(cfg: ConvNetConfig, p: ConvNetParams, x: Array[Double]): Int = {
    val probs = predictProbs(cfg, p, x)
    var best = 0
    var i = 1
    while (i < probs.length) { if (probs(i) > probs(best)) best = i; i += 1 }
    best
  }

  /** NLL loss of one example plus gradient ACCUMULATED into `grad`.
    * Exactness is pinned by ConvNetSpec's central-difference check.
    */
  def lossAndGrad(cfg: ConvNetConfig, p: ConvNetParams, x: Array[Double], y: Int,
                  grad: ConvNetParams): Double = {
    import cfg._
    require(x.length == inSize * inSize,
      s"input has ${x.length} pixels, config expects $inSize x $inSize")
    // forward, keeping intermediates
    val c1 = conv(x, 1, inSize, p.w1, p.b1, conv1Maps, k)
    val (p1, arg1) = maxPool(c1, conv1Maps, c1Size, pool)
    val c2 = conv(p1, conv1Maps, p1Size, p.w2, p.b2, conv2Maps, k)
    val (p2, arg2) = maxPool(c2, conv2Maps, c2Size, pool)
    val hPre = dense(p2, p.wh, p.bh, hidden)
    val h = hPre.map(v => math.max(0.0, v))
    val logits = dense(h, p.wo, p.bo, classes)
    val probs = NetOps.softmax(logits)
    val loss = -math.log(math.max(probs(y), 1e-300))

    // backward
    val dLogits = probs.clone()
    dLogits(y) -= 1.0
    val dH = denseBackward(h, p.wo, classes, dLogits, grad.wo, grad.bo)
    var i = 0
    while (i < dH.length) { if (hPre(i) <= 0.0) dH(i) = 0.0; i += 1 }
    val dP2 = denseBackward(p2, p.wh, hidden, dH, grad.wh, grad.bh)
    val dC2 = poolBackward(dP2, arg2, c2.length)
    val dP1 = convBackward(p1, conv1Maps, p1Size, p.w2, conv2Maps, k, dC2, grad.w2, grad.b2)
    val dC1 = poolBackward(dP1, arg1, c1.length)
    convBackward(x, 1, inSize, p.w1, conv1Maps, k, dC1, grad.w1, grad.b1)
    loss
  }

  /** One local pass of Nesterov-momentum minibatch SGD over `data`
    * (mutates `p` in place; `velocity` carries momentum across calls).
    * L2 decay matches the reference's 0.0005 on weights (not biases).
    */
  def sgdPass(cfg: ConvNetConfig, p: ConvNetParams, velocity: ConvNetParams,
              data: Seq[(Int, Array[Double])], lr: Double, batchSize: Int,
              momentum: Double = 0.9, l2: Double = 5e-4): Double = {
    var totalLoss = 0.0
    val weightArrays = Set(0, 2, 4, 6) // w1, w2, wh, wo positions in `arrays`
    for (batch <- data.grouped(batchSize)) {
      val grad = p.zeroed
      for ((y, x) <- batch) totalLoss += lossAndGrad(cfg, p, x, y, grad)
      val scale = 1.0 / batch.size
      for ((((g, v), w), pos) <- grad.arrays.zip(velocity.arrays).zip(p.arrays).zipWithIndex) {
        val decay = if (weightArrays(pos)) l2 else 0.0
        var i = 0
        while (i < g.length) {
          val gi = g(i) * scale + decay * w(i)
          val vPrev = v(i)
          v(i) = momentum * v(i) - lr * gi
          // Nesterov update: w += -momentum*vPrev + (1+momentum)*vNew
          w(i) += -momentum * vPrev + (1 + momentum) * v(i)
          i += 1
        }
      }
    }
    totalLoss / math.max(1, data.size)
  }

  /** Distributed fit by per-epoch parameter averaging — the shared
    * [[NetOps.averageEpochs]] driver loop (row-count-weighted average,
    * bit-deterministic under a fixed seed + partitioning; empty input
    * returns the seeded init unchanged). Momentum restarts each epoch
    * (local state, like DL4J's default).
    */
  def fitParameterAveraging(data: Dataset[(Int, Array[Double])], cfg: ConvNetConfig,
                            epochs: Int, lr: Double, batchSize: Int, seed: Long,
                            momentum: Double = 0.9, l2: Double = 5e-4): ConvNetParams =
    NetOps.averageEpochs(data, epochs, seed)(init(cfg, seed))(_.copyOf)(
      (local, rows) => sgdPass(cfg, local, local.zeroed, rows, lr, batchSize, momentum, l2))

  /** Distributed accuracy of `p` over a labeled dataset (NaN when empty). */
  def accuracy(data: Dataset[(Int, Array[Double])], cfg: ConvNetConfig,
               p: ConvNetParams): Double =
    NetOps.accuracyOf(data, p) { case (w, (y, x)) => predict(cfg, w, x) == y }
}
