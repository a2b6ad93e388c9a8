package graft

import graft.ml.{ConvNet, ConvNetConfig}

/** From-scratch CNN (M3 fidelity gap): exact-gradient pin via central
  * differences, then the reference's MNIST shapes — a conv net learning a
  * spatial task an order-free model can't express as cheaply — through the
  * distributed parameter-averaging fit.
  */
class ConvNetSpec extends SparkSpec {

  import SharedSpark.spark.implicits._

  private val tiny = ConvNetConfig(inSize = 10, k = 3, conv1Maps = 2,
    conv2Maps = 3, hidden = 5, classes = 3, pool = 2)

  test("M3: analytic gradients match central differences on every layer") {
    val rnd = new scala.util.Random(7)
    val x = Array.fill(tiny.inSize * tiny.inSize)(rnd.nextDouble())
    val y = 1
    val p = ConvNet.init(tiny, seed = 11)
    val grad = p.zeroed
    ConvNet.lossAndGrad(tiny, p, x, y, grad)

    val eps = 1e-6
    var checked = 0
    for ((arr, gArr) <- p.arrays.zip(grad.arrays)) {
      // a spread of indices per array, ends included
      val idxs = (Seq(0, arr.length - 1) ++ Seq.fill(6)(rnd.nextInt(arr.length))).distinct
      for (i <- idxs) {
        val orig = arr(i)
        arr(i) = orig + eps
        val up = ConvNet.lossAndGrad(tiny, p, x, y, p.zeroed)
        arr(i) = orig - eps
        val dn = ConvNet.lossAndGrad(tiny, p, x, y, p.zeroed)
        arr(i) = orig
        val numeric = (up - dn) / (2 * eps)
        val analytic = gArr(i)
        val denom = math.max(1e-8, math.abs(numeric) + math.abs(analytic))
        assert(math.abs(numeric - analytic) / denom < 1e-5,
          s"gradient mismatch at array len=${arr.length} idx=$i: " +
            s"numeric=$numeric analytic=$analytic")
        checked += 1
      }
    }
    assert(checked >= 30)
  }

  test("M3: reference MNIST config wires up and runs one exact step") {
    val cfg = ConvNetConfig() // 28x28, conv5x5x20, conv5x5x50, dense 500, 10 classes
    assert(cfg.flat == 50 * 4 * 4) // 28->24->12->8->4, exactly LeNet's plumbing
    val rnd = new scala.util.Random(3)
    val p = ConvNet.init(cfg, seed = 1)
    val x = Array.fill(28 * 28)(rnd.nextDouble())
    val probs = ConvNet.predictProbs(cfg, p, x)
    assert(probs.length == 10 && math.abs(probs.sum - 1.0) < 1e-9)
    val loss = ConvNet.lossAndGrad(cfg, p, x, 4, p.zeroed)
    assert(loss > 0 && loss < 10, s"fresh-init NLL should be ~ln(10): $loss")
  }

  /** 14x14 images, three spatial classes: horizontal bar, vertical bar,
    * diagonal — position varies, pixels carry noise, so the task needs
    * translation-tolerant local features (what convolution buys).
    */
  private def spatialData(n: Int, seed: Long): Seq[(Int, Array[Double])] = {
    val rnd = new scala.util.Random(seed)
    val size = 14
    (0 until n).map { i =>
      val cls = i % 3
      val img = Array.fill(size * size)(rnd.nextDouble() * 0.2)
      val pos = 2 + rnd.nextInt(size - 4)
      cls match {
        case 0 => for (j <- 0 until size) img(pos * size + j) = 0.8 + rnd.nextDouble() * 0.2
        case 1 => for (j <- 0 until size) img(j * size + pos) = 0.8 + rnd.nextDouble() * 0.2
        case 2 => for (j <- 0 until size) img(j * size + j) = 0.8 + rnd.nextDouble() * 0.2
      }
      (cls, img)
    }
  }

  test("M3: the reference's full pipeline — IDX binary -> IdxSource -> native LeNet") {
    // the chapter-4 shape end-to-end: an MNIST-format ubyte file pair on
    // disk, the distributed IDX reader (S7, pixels scaled to [0,1] like
    // F10's ImagePreProcessingScaler), the real conv net on top
    import java.io.{DataOutputStream, FileOutputStream}
    val rnd = new scala.util.Random(23)
    val size = 10
    val n = 180
    val imgs = new Array[Array[Byte]](n)
    val lbls = new Array[Byte](n)
    for (i <- 0 until n) {
      val cls = i % 3
      val img = Array.fill(size * size)((rnd.nextInt(40)).toByte)
      val pos = 2 + rnd.nextInt(size - 4)
      def hot() = (200 + rnd.nextInt(56)).toByte
      cls match {
        case 0 => for (j <- 0 until size) img(pos * size + j) = hot()
        case 1 => for (j <- 0 until size) img(j * size + pos) = hot()
        case 2 => for (j <- 0 until size) img(j * size + j) = hot()
      }
      imgs(i) = img; lbls(i) = cls.toByte
    }
    val dir = java.nio.file.Files.createTempDirectory("graft-idx-cnn").toFile
    val imgFile = new java.io.File(dir, "train-images-idx3-ubyte")
    val io = new DataOutputStream(new FileOutputStream(imgFile))
    io.writeInt(0x00000803); io.writeInt(n); io.writeInt(size); io.writeInt(size)
    imgs.foreach(io.write); io.close()
    val lblFile = new java.io.File(dir, "train-labels-idx1-ubyte")
    val lo = new DataOutputStream(new FileOutputStream(lblFile))
    lo.writeInt(0x00000801); lo.writeInt(n); lo.write(lbls); lo.close()

    val data = graft.sources.IdxSource
      .readDataset(spark, imgFile.toString, lblFile.toString)
      .select("label", "pixels")
      .map(r => (r.getInt(0), r.getSeq[Float](1).map(_.toDouble).toArray))
      .repartition(4)

    val cfg = ConvNetConfig(inSize = size, k = 3, conv1Maps = 4, conv2Maps = 6,
      hidden = 16, classes = 3, pool = 2)
    val p = ConvNet.fitParameterAveraging(data, cfg, epochs = 10, lr = 0.05,
      batchSize = 16, seed = 42)
    val acc = ConvNet.accuracy(data, cfg, p)
    assert(acc >= 0.9, s"IDX -> LeNet pipeline should learn the patterns: acc=$acc")
  }

  /** The training loop materializes each partition on the task heap for
    * its seeded shuffle (O(partition bytes) — local-SGD's standard trade);
    * at 100 TB scale that bound must be ENFORCED, not assumed: a partition
    * over `spark.graft.ml.maxRowsPerPartition` rows fails fast with an
    * error naming `repartition`, instead of OOM-killing an executor
    * mid-epoch (VERDICT r7 task 3).
    */
  test("M3: a partition larger than maxRowsPerPartition fails fast, naming repartition") {
    val cfg = ConvNetConfig(inSize = 14, k = 3, conv1Maps = 4, conv2Maps = 6,
      hidden = 16, classes = 3, pool = 2)
    val train = spark.createDataset(
      spark.sparkContext.parallelize(spatialData(60, seed = 5), 1))
    spark.conf.set("spark.graft.ml.maxRowsPerPartition", "40")
    try {
      val e = intercept[Exception] {
        ConvNet.fitParameterAveraging(train, cfg, epochs = 1, lr = 0.05,
          batchSize = 16, seed = 42)
      }
      def messages(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
      val all = messages(e).mkString(" | ")
      assert(all.contains("maxRowsPerPartition") && all.contains("repartition"),
        s"error must name the knob and the fix: $all")
    } finally spark.conf.unset("spark.graft.ml.maxRowsPerPartition")

    // under the same bound, a repartitioned dataset trains fine
    spark.conf.set("spark.graft.ml.maxRowsPerPartition", "40")
    try {
      val p = ConvNet.fitParameterAveraging(train.repartition(4), cfg, epochs = 1,
        lr = 0.05, batchSize = 16, seed = 42)
      assert(p.wo.nonEmpty)
    } finally spark.conf.unset("spark.graft.ml.maxRowsPerPartition")
  }

  test("M3: parameter-averaging fit learns the spatial task, deterministically") {
    val cfg = ConvNetConfig(inSize = 14, k = 3, conv1Maps = 4, conv2Maps = 6,
      hidden = 16, classes = 3, pool = 2)
    val sc = spark.sparkContext
    val train = spark.createDataset(sc.parallelize(spatialData(240, seed = 5), 4))
    val test = spark.createDataset(sc.parallelize(spatialData(90, seed = 99), 4))

    val p = ConvNet.fitParameterAveraging(train, cfg, epochs = 8, lr = 0.05,
      batchSize = 16, seed = 42)
    val acc = ConvNet.accuracy(test, cfg, p)
    assert(acc >= 0.85, s"conv net should learn bars vs diagonal: acc=$acc")

    // deterministic: same seed, same partitioning -> bit-identical weights
    val p2 = ConvNet.fitParameterAveraging(train, cfg, epochs = 8, lr = 0.05,
      batchSize = 16, seed = 42)
    assert(p.wo.sameElements(p2.wo) && p.w1.sameElements(p2.w1),
      "parameter-averaging fit must be deterministic under a fixed seed + partitioning")
  }

  /** Review-r9 pins: misconfiguration and malformed rows fail with the
    * shape, never a bare ArithmeticException/ArrayIndexOutOfBounds deep in
    * the math — and an all-NaN pool window propagates NaN instead of
    * crashing poolBackward with argmax -1.
    */
  test("M3: config and input validation fail loudly; NaN windows don't crash") {
    val e1 = intercept[IllegalArgumentException] { ConvNetConfig(pool = 0) }
    assert(e1.getMessage.contains("pool=0"), e1.getMessage)
    val cfg = ConvNetConfig(inSize = 8, k = 3, conv1Maps = 2, conv2Maps = 3,
      hidden = 5, classes = 2, pool = 1)
    val p = ConvNet.init(cfg, seed = 1)
    val e2 = intercept[IllegalArgumentException] {
      ConvNet.predictProbs(cfg, p, new Array[Double](63))
    }
    assert(e2.getMessage.contains("63"), e2.getMessage)
    // an all-NaN row (corrupt upstream decode) scores NaN, never throws
    val nanRow = Array.fill(64)(Double.NaN)
    val probs = ConvNet.predictProbs(cfg, p, nanRow)
    assert(probs.forall(_.isNaN))
    val loss = ConvNet.lossAndGrad(cfg, p, nanRow, 0, p.zeroed)
    assert(loss.isNaN, s"NaN input must surface as NaN loss, got $loss")
  }

  /** Review-r9 pin: the epoch average is weighted by partition ROW COUNT
    * (local-SGD/FedAvg): with a 100-row and a 3-row partition, the
    * unweighted mean would hand the 3-row model half the say and drag the
    * fit toward noise. Verified mechanically through a probe FlatParams
    * whose 'training' just records its partition's row count.
    */
  test("M7: partition averaging weights by row count, not partition count") {
    val sc = spark.sparkContext
    // two partitions: 100 rows and 3 rows (union preserves partitioning)
    val skewed = spark.createDataset(
      sc.parallelize((0 until 100).map(_.toLong), 1)
        .union(sc.parallelize(Seq(1000L, 1001L, 1002L), 1)))
    assert(skewed.rdd.getNumPartitions == 2)
    val fitted = graft.ml.NetOps.averageEpochs(skewed, epochs = 1, seed = 7)(
      MlSpec.PairParams(new Array[Double](1), Array.empty))(_.copyOf)(
      (local, rows) => local.a(0) = rows.size.toDouble)
    // weighted: (100*100 + 3*3)/103 = 97.17...; unweighted would be 51.5
    assert(math.abs(fitted.a(0) - (100.0 * 100 + 3.0 * 3) / 103) < 1e-9,
      s"average must weight by row count, got ${fitted.a(0)}")
  }
}
