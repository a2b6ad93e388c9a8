package graft

import org.apache.spark.ml.evaluation.MulticlassClassificationEvaluator
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.ml.regression.{LinearRegression, LinearRegressionModel}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** ML acceptance tests (SURVEY §2.9). M4 carries the reference's own
  * acceptance criterion: a regressor trained on (a, b) -> a+b must fit
  * near-perfectly (chapter_5/NetworkTrainedToSumNumbersUsingRegression.java:45-53
  * demos 0.111 + 0.333).
  */
class MlSpec extends SparkSpec {

  import SharedSpark.spark.implicits._

  private def sumData(n: Int) = (0 until n).map { i =>
    val a = (i % 97) / 97.0 * 3.0
    val b = (i % 89) / 89.0 * 3.0
    (a, b, a + b)
  }.toDF("a", "b", "y")
    .select(array_to_vector(array(col("a"), col("b"))).as("features"), col("y").as("label"))

  test("M4: LinearRegression learns a+b with R2 > 0.99 and predicts 0.111+0.333") {
    val model = new LinearRegression().setMaxIter(20).fit(sumData(2000))
    assert(model.summary.r2 > 0.99, s"r2 = ${model.summary.r2}")
    val pred = model.transform(
      Seq((0.111, 0.333)).toDF("a", "b")
        .select(array_to_vector(array(col("a"), col("b"))).as("features")))
      .select("prediction").as[Double].head()
    assert(math.abs(pred - 0.444) < 0.01, s"predicted $pred for 0.111+0.333")
  }

  test("M7/X3: training distributes over partitions and epochs (maxIter) converge") {
    val data = sumData(2000).repartition(4).cache()
    val loose = new LinearRegression().setMaxIter(1).setSolver("l-bfgs")
      .setRegParam(0.5).fit(data)
    val tight = new LinearRegression().setMaxIter(50).setSolver("l-bfgs")
      .setRegParam(0.0).fit(data)
    assert(tight.summary.r2 >= loose.summary.r2)
    assert(tight.summary.r2 > 0.99)
  }

  test("S9: model sink/source round-trips through persistence") {
    val model = new LinearRegression().setMaxIter(20).fit(sumData(500))
    val dir = java.nio.file.Files.createTempDirectory("graft-model").toString
    model.write.overwrite().save(dir)
    val loaded = LinearRegressionModel.load(dir)
    assert(loaded.coefficients.toArray.toSeq == model.coefficients.toArray.toSeq)
  }

  /** S9 for the NATIVE family (r8): the from-scratch nets persist through
    * NetIo's parquet weight table — bit-exact round-trip for all three
    * FlatParams implementors, score parity after reload, and fail-fast on
    * a config/file shape mismatch (silently mis-assigned weights would be
    * the worst possible failure mode for a model store).
    */
  test("S9: native nets save/load through the parquet weight table, bit-exact") {
    import graft.ml._
    val dir = java.nio.file.Files.createTempDirectory("graft-netio").toString

    val cnCfg = ConvNetConfig(inSize = 8, k = 3, conv1Maps = 2, conv2Maps = 3,
      hidden = 5, classes = 2, pool = 1)
    val cn = ConvNet.init(cnCfg, seed = 7)
    NetIo.save(spark, cn, s"$dir/cnn")
    val cn2 = NetIo.load(spark, ConvNet.init(cnCfg, seed = 99), s"$dir/cnn")
    assert(cn.arrays.zip(cn2.arrays).forall { case (a, b) => a.sameElements(b) })

    val lsCfg = LstmConfig(inDim = 4, hidden = 6, classes = 2)
    val ls = Lstm.init(lsCfg, seed = 11)
    NetIo.save(spark, ls, s"$dir/lstm")
    val ls2 = NetIo.load(spark, Lstm.init(lsCfg, seed = 99), s"$dir/lstm")
    assert(ls.arrays.zip(ls2.arrays).forall { case (a, b) => a.sameElements(b) })

    val aeCfg = AeConfig(Seq(6, 4, 2, 4, 6))
    val ae = Autoencoder.init(aeCfg, seed = 5)
    NetIo.save(spark, ae, s"$dir/ae")
    val ae2 = NetIo.load(spark, Autoencoder.init(aeCfg, seed = 99), s"$dir/ae")
    val x = Array.fill(6)(new scala.util.Random(3).nextDouble())
    assert(Autoencoder.score(aeCfg, ae, x) == Autoencoder.score(aeCfg, ae2, x),
      "reloaded model must score bit-identically")

    // shape mismatch refuses loudly
    val bigger = AeConfig(Seq(8, 4, 2, 4, 8))
    val e = intercept[IllegalArgumentException] {
      NetIo.load(spark, Autoencoder.init(bigger, seed = 1), s"$dir/ae")
    }
    assert(e.getMessage.contains("template expects"), e.getMessage)

    // duplicate position + hole: the row COUNT matches the shape, but
    // loading would silently mis-assign — must refuse (review r8)
    val corrupt = spark.read.parquet(s"$dir/ae")
      .withColumn("pos", when(col("array_idx") === 0 && col("pos") === 1, lit(0))
        .otherwise(col("pos")))
    corrupt.write.mode("overwrite").parquet(s"$dir/ae_dup")
    val e2 = intercept[IllegalArgumentException] {
      NetIo.load(spark, Autoencoder.init(aeCfg, seed = 1), s"$dir/ae_dup")
    }
    assert(e2.getMessage.contains("duplicate weight"), e2.getMessage)

    // review-r9 pin: a zero-length parameter array writes zero rows, so it
    // is legitimately absent from the table — the loader must round-trip
    // it as empty instead of refusing the key-set mismatch forever
    val withEmpty = MlSpec.PairParams(Array(1.5, -2.5, 3.5), Array.empty)
    NetIo.save(spark, withEmpty, s"$dir/empty")
    val back = NetIo.load(spark,
      MlSpec.PairParams(new Array[Double](3), Array.empty), s"$dir/empty")
    assert(back.a.toSeq == Seq(1.5, -2.5, 3.5) && back.b.isEmpty)
    // but a table genuinely missing a NON-empty array still refuses
    val e3 = intercept[IllegalArgumentException] {
      NetIo.load(spark,
        MlSpec.PairParams(new Array[Double](3), new Array[Double](2)), s"$dir/empty")
    }
    assert(e3.getMessage.contains("template expects"), e3.getMessage)
  }

  test("M6: evaluator accuracy equals the A7 confusion-matrix accuracy") {
    val preds = Tables.embeddings(spark, sfDir)
      .select(col("label").cast("double").as("label"),
        pmod(col("vec_id"), lit(10)).cast("double").as("prediction")).cache()
    val evalAcc = new MulticlassClassificationEvaluator()
      .setMetricName("accuracy").evaluate(preds)
    val sqlAcc = preds.agg(
      (sum(when(col("label") === col("prediction"), 1).otherwise(0)).cast("double") /
        count(lit(1))).as("acc")).as[Double].head()
    assert(math.abs(evalAcc - sqlAcc) < 1e-12)
  }

  test("M1: classification pipeline beats majority-class baseline on separable labels") {
    // deterministic separable target: label = sign of first embedding element
    val data = Tables.embeddings(spark, sfDir)
      .select(when(element_at(col("embedding"), 1) > 0, 1.0).otherwise(0.0).as("label"),
        array_to_vector(col("embedding")).as("features")).cache()
    val model = new org.apache.spark.ml.classification.LogisticRegression()
      .setMaxIter(20).fit(data)
    val acc = new MulticlassClassificationEvaluator().setMetricName("accuracy")
      .evaluate(model.transform(data))
    val majority = data.groupBy("label").count().agg(max("count")).as[Long].head().toDouble /
      data.count()
    assert(acc > math.max(majority, 0.9), s"acc=$acc majority=$majority")
  }

  test("M1: full ml.Pipeline (tokenize -> Word2Vec -> LogisticRegression) separates vocabularies") {
    import org.apache.spark.ml.Pipeline
    import org.apache.spark.ml.classification.LogisticRegression
    import org.apache.spark.ml.feature.{RegexTokenizer, Word2Vec}
    val rnd = new scala.util.Random(7)
    val vocabA = (0 until 30).map(i => s"alpha$i")
    val vocabB = (0 until 30).map(i => s"beta$i")
    val docs = (0 until 200).map { i =>
      val v = if (i % 2 == 0) vocabA else vocabB
      val text = Seq.fill(20)(v(rnd.nextInt(v.size))).mkString(" ")
      (text, (i % 2).toDouble)
    }.toDF("text", "label")
    val pipeline = new Pipeline().setStages(Array(
      new RegexTokenizer().setInputCol("text").setOutputCol("tokens").setPattern("\\s+"),
      new Word2Vec().setInputCol("tokens").setOutputCol("features")
        .setVectorSize(8).setMinCount(1).setSeed(42).setMaxIter(2),
      new LogisticRegression().setMaxIter(20)))
    val model = pipeline.fit(docs)
    val acc = new MulticlassClassificationEvaluator().setMetricName("accuracy")
      .evaluate(model.transform(docs))
    assert(acc > 0.9, s"pipeline accuracy $acc")
  }

  test("M2: PCA anomaly scores are non-negative and ranking is stable") {
    val a = queries.MLQueries.pcaAnomalyTopK(spark, sfDir)
      .select("vec_id").as[Long].collect().toSeq
    val b = queries.MLQueries.pcaAnomalyTopK(spark, sfDir)
      .select("vec_id").as[Long].collect().toSeq
    assert(a == b, "PCA top-k ranking not stable across runs")
    assert(a.nonEmpty)
    // the catalog entry distills exactly these laws into its oracle row
    val row = queries.Catalog.byName("m2_pca_anomaly").run(spark, sfDir)
      .as[(Long, Long, Boolean, Boolean)].head()
    assert(row == ((a.size.toLong, 10L, true, true)), s"invariant row: $row")
    graft.operators.Pinned.release()
  }

  test("X4/M6: CrossValidator sweeps a param grid and picks the best model") {
    import org.apache.spark.ml.tuning.{CrossValidator, ParamGridBuilder}
    import org.apache.spark.ml.evaluation.RegressionEvaluator
    val lr = new LinearRegression()
    val grid = new ParamGridBuilder()
      .addGrid(lr.regParam, Array(0.0, 0.5))
      .addGrid(lr.maxIter, Array(5, 20))
      .build()
    val cv = new CrossValidator().setEstimator(lr)
      .setEvaluator(new RegressionEvaluator().setMetricName("rmse"))
      .setEstimatorParamMaps(grid).setNumFolds(3).setSeed(42)
    val model = cv.fit(sumData(1000))
    assert(model.avgMetrics.length == 4)
    val best = model.bestModel.asInstanceOf[LinearRegressionModel]
    assert(best.getRegParam == 0.0, "unregularized fit must win on an exact linear target")
  }

  /** The distributed (hogwild) Word2Vec path — `spark.graft.w2v.numPartitions`
    * — is the documented 100 TB opt-out from the catalog entry's
    * single-partition determinism (VERDICT r7 task 5). Setting the flag
    * forfeits the golden hash BY CONTRACT (gradient mixing follows task
    * completion order), so this pins what survives partitioned fitting:
    * the vocabulary (derived from token counts, fit-order-invariant), the
    * query word (corpus-frequency argmax, fit-independent), and the
    * synonym table's shape/quality invariants.
    */
  test("M5: the hogwild flag path (numPartitions=4) keeps vocab + synonym invariants") {
    val entry = SparkEntry.queries("m5_word2vec_table")
    val single = entry(spark, sfDir).collect()
    spark.conf.set("spark.graft.w2v.numPartitions", "4")
    try {
      val rows = entry(spark, sfDir).collect()
      assert(rows.length == 5, s"findSynonyms(top, 5) must still return 5 rows: ${rows.length}")
      // vocabulary and its size come from minCount over token counts —
      // partition-invariant even under hogwild mixing
      assert(rows.head.getAs[Long]("vocab_rows") == single.head.getAs[Long]("vocab_rows"),
        "vocab size must not depend on fit partitioning")
      assert(rows.head.getAs[String]("query") == single.head.getAs[String]("query"),
        "the query word is a corpus-frequency argmax, independent of the fit")
      val sims = rows.map(_.getAs[Double]("sim")).toSeq
      assert(sims == sims.sorted.reverse, s"synonyms must come ranked: $sims")
      assert(sims.forall(s => s >= -1.0 && s <= 1.0), s"cosine out of range: $sims")
      assert(rows.map(_.getAs[String]("word")).distinct.length == 5, "duplicate synonyms")
    } finally spark.conf.unset("spark.graft.w2v.numPartitions")
  }

  test("M5: Word2Vec trains on fixture tokens and exposes a vector table") {
    import graft.functions.TextFunctions.tokenize
    val docs = Tables.documents(spark, sfDir).limit(200)
      .select(tokenize(col("text")).as("tokens"))
    val model = new org.apache.spark.ml.feature.Word2Vec()
      .setInputCol("tokens").setOutputCol("vec").setVectorSize(16)
      .setMinCount(5).setSeed(42).setMaxIter(1).fit(docs)
    val vectors = model.getVectors // (word, vector) join table — J1's dimension side
    assert(vectors.count() > 10)
    assert(vectors.columns.toSeq == Seq("word", "vector"))
  }
}

object MlSpec {
  /** Minimal FlatParams implementor for NetIo edge-case tests (one empty
    * parameter array — a shape no shipped net has, but the trait allows).
    */
  final case class PairParams(a: Array[Double], b: Array[Double])
      extends graft.ml.FlatParams[PairParams] {
    def arrays: Seq[Array[Double]] = Seq(a, b)
    def rebuild(arrs: Seq[Array[Double]]): PairParams = PairParams(arrs(0), arrs(1))
  }
}
