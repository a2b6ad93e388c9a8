package graft.queries

import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.evaluation.MulticlassClassificationEvaluator
import org.apache.spark.ml.feature.PCA
import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
import org.apache.spark.ml.regression.LinearRegression
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions.mse
import graft.sources.Tables

/** MLlib-backed pipelines (SURVEY §2.9 M1-M7) + execution-control loops
  * (X3/X4). Training-based queries are rows-only (float nondeterminism);
  * the exact acceptance criteria (M4 R² > 0.99 etc.) live in MlSpec.
  * Vectors ride as ArrayType(FloatType) and convert at the MLlib boundary
  * via array_to_vector — no custom UDT.
  */
object MLQueries {

  /** Corpus-scaled ANN knobs for the PQ-based catalog entries, derived
    * from |corpus| so the recall@5 >= 0.8 gate holds at every fixture SF
    * with ONE rule (RecallTune measurements: sf0.01 n=500 -> (16,12,50)
    * = today's hand-tuned values, recall 0.94-0.98; sf0.1 n=2000 ->
    * (32,24,200), recall 0.98-1.00 where the fixed knobs fell to
    * 0.72-0.80). The near-uniform random fixture is PQ's WORST case (no
    * cluster structure), so recall is bought with rerank width ~ n/10 in
    * this regime; production corpora with real cluster structure instead
    * scale nCells ~ sqrt(N) at rerank O(k) — the AnnSweep nCells=128
    * crossover demonstrates that posture. rerank is capped at 100k so
    * the rule stays overflow-safe and bounded on an arbitrary corpus
    * (k * rerank feeds an Int rank filter); past the cap a caller is
    * out of this fixture-difficulty regime and should be scaling
    * quantization instead. private[graft] so RecallTune/AnnSweep
    * measure EXACTLY the catalog's rule.
    */
  private[graft] def annScaled(n: Long): (Int, Int, Int) = {
    val nCells = math.max(16L, math.round(math.sqrt(n / 2.0))).toInt
    val nProbe = math.max(12, nCells * 3 / 4)
    val rerank = math.max(48L, math.min(n / 10, 100000L)).toInt
    (nCells, nProbe, rerank)
  }

  /** The M2 detail frame: per-label top-5 vectors by PCA reconstruction
    * error (residual variance = |x|^2 - |proj|^2). Consumed by the
    * m2_pca_anomaly catalog entry (which distills it to a hash-checked
    * invariant row) and by MlSpec's ranking-stability gate.
    */
  private[graft] def pcaAnomalyTopK(s: org.apache.spark.sql.SparkSession,
                                    d: String): org.apache.spark.sql.DataFrame = {
    val emb = Tables.embeddings(s, d)
      .select(col("vec_id"), col("label"), array_to_vector(col("embedding")).as("features"))
    val pca = new PCA().setK(8).setInputCol("features").setOutputCol("pc").fit(emb)
    val scored = pca.transform(emb)
      .select(col("vec_id"), col("label"),
        (aggregate(vector_to_array(col("features")), lit(0.0), (a, x) => a + x * x) -
          aggregate(vector_to_array(col("pc")), lit(0.0), (a, x) => a + x * x)).as("score"))
    val w = Window.partitionBy("label").orderBy(col("score").desc, col("vec_id"))
    scored.withColumn("rnk", row_number().over(w)).where(col("rnk") <= 5)
      .orderBy("label", "rnk")
  }

  /** Shared learns-the-target floor row for the m1/m3 capability entries:
    * a binary target derived from the features (sign of the first
    * embedding component — learnable by construction), train with the
    * given estimator, emit (n_train, acc_above_floor) where the floor is
    * max(majority-class baseline, 0.9). The raw accuracy float stays
    * un-pinned (solver float order); the wide-margin boolean is what the
    * oracle hashes.
    */
  private def learnsTargetFloor(s: org.apache.spark.sql.SparkSession, d: String)
      (fitPredict: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val data = Tables.embeddings(s, d)
      .select(when(element_at(col("embedding"), 1) > 0, 1.0).otherwise(0.0).as("label"),
        array_to_vector(col("embedding")).as("features")).cache()
    try {
      val acc = new MulticlassClassificationEvaluator().setMetricName("accuracy")
        .evaluate(fitPredict(data))
      val n = data.count()
      val majority = data.groupBy("label").count()
        .agg(max("count")).head().getLong(0).toDouble / n
      val spark = s
      import spark.implicits._
      Seq((n, acc > math.max(majority, 0.9))).toDF("n_train", "acc_above_floor")
    } finally data.unpersist()
  }

  val defs: Seq[QueryDef] = Seq(

    // M6/A7: evaluation metrics — accuracy via MulticlassClassificationEvaluator
    // over a deterministic prediction rule; exact-division oracle.
    QueryDef.sql(
      "m6_eval_accuracy",
      """SELECT round(CAST(SUM(CASE WHEN label = CAST(vec_id % 10 AS INT) THEN 1 ELSE 0 END) AS DOUBLE)
        |             / count(*), 6) AS accuracy
        |FROM embeddings""".stripMargin) { (s, d) =>
      val preds = Tables.embeddings(s, d)
        .select(col("label").cast("double").as("label"),
          pmod(col("vec_id"), lit(10)).cast("double").as("prediction"))
      val acc = new MulticlassClassificationEvaluator()
        .setMetricName("accuracy").evaluate(preds)
      val spark = s
      import spark.implicits._
      Seq(acc).toDF("accuracy").select(round(col("accuracy"), 6).as("accuracy"))
    },

    // X3: epoch loop — driver-side re-iteration over a cached frame
    // (chapter_5/NetworkTrainedToSumNumbersUsingRegression.java:56-60).
    QueryDef.sql(
      "x3_epoch_loop",
      """SELECT 1 AS epoch, count(*) AS n FROM lineitem WHERE l_quantity <= 10
        |UNION ALL SELECT 2 AS epoch, count(*) AS n FROM lineitem WHERE l_quantity <= 20
        |UNION ALL SELECT 3 AS epoch, count(*) AS n FROM lineitem WHERE l_quantity <= 30
        |ORDER BY epoch""".stripMargin) { (s, d) =>
      // Pinned, not raw .cache(): the documented operator-lifecycle release
      // must reach this block too (review r9 — a long-lived session running
      // the catalog through Pinned.release alone leaked these)
      val li = graft.operators.Pinned.pin(Tables.lineitem(s, d).select("l_quantity"))
      (1 to 3).map { epoch =>
        li.where(col("l_quantity") <= epoch * 10)
          .agg(count(lit(1)).as("n")).select(lit(epoch).as("epoch"), col("n"))
      }.reduce(_ union _).orderBy("epoch")
    },

    // X4: hyperparameter sweep — grid loop producing one metric row per
    // parameter (chapter_6/SumNumberOfIterations.java:34-48).
    QueryDef.sql(
      "x4_param_sweep",
      """SELECT 5 AS param, count(*) AS n FROM orders WHERE o_totalprice > 50000
        |UNION ALL SELECT 10 AS param, count(*) AS n FROM orders WHERE o_totalprice > 100000
        |UNION ALL SELECT 20 AS param, count(*) AS n FROM orders WHERE o_totalprice > 200000
        |ORDER BY param""".stripMargin) { (s, d) =>
      val o = graft.operators.Pinned.pin(Tables.orders(s, d).select("o_totalprice"))
      Seq(5, 10, 20).map { p =>
        o.where(col("o_totalprice") > p * 10000)
          .agg(count(lit(1)).as("n")).select(lit(p).as("param"), col("n"))
      }.reduce(_ union _).orderBy("param")
    },

    // M6b/A7: per-class precision/recall/F1 from the confusion matrix —
    // exact integer ratios, fully oracle-checked (complements the
    // evaluator-based m6_eval_accuracy).
    QueryDef.sql(
      "m6_per_class_metrics",
      """WITH preds AS (
        |  SELECT label, CAST(vec_id % 10 AS INT) AS pred FROM embeddings
        |), tp AS (
        |  SELECT label AS cls, count(*) AS tp FROM preds WHERE label = pred GROUP BY label
        |), per_label AS (SELECT label AS cls, count(*) AS n_true FROM preds GROUP BY label),
        |per_pred AS (SELECT pred AS cls, count(*) AS n_pred FROM preds GROUP BY pred)
        |SELECT l.cls,
        |       round(CAST(coalesce(t.tp, 0) AS DOUBLE) / p.n_pred, 6) AS precision,
        |       round(CAST(coalesce(t.tp, 0) AS DOUBLE) / l.n_true, 6) AS recall
        |FROM per_label l JOIN per_pred p USING (cls) LEFT JOIN tp t USING (cls)
        |ORDER BY cls""".stripMargin) { (s, d) =>
      val preds = Tables.embeddings(s, d)
        .select(col("label"), pmod(col("vec_id"), lit(10)).cast("int").as("pred"))
      val tp = preds.where(col("label") === col("pred"))
        .groupBy(col("label").as("cls")).agg(count(lit(1)).as("tp"))
      val perLabel = preds.groupBy(col("label").as("cls")).agg(count(lit(1)).as("n_true"))
      val perPred = preds.groupBy(col("pred").as("cls")).agg(count(lit(1)).as("n_pred"))
      perLabel.join(perPred, "cls").join(tp, Seq("cls"), "left")
        .select(col("cls"),
          round(coalesce(col("tp"), lit(0)).cast("double") / col("n_pred"), 6).as("precision"),
          round(coalesce(col("tp"), lit(0)).cast("double") / col("n_true"), 6).as("recall"))
        .orderBy("cls")
    },

    // M4: regression learns a+b (LinearRegression — exact for the additive
    // target; chapter_5/NetworkTrainedToSumNumbersUsingRegression.java:87-101).
    // Oracle-checked: the training data is noise-free y = a + b, so the OLS
    // optimum is analytically coef=[1,1], intercept=0, R^2=1; the normal-
    // equation solver recovers it to machine precision and the 4-decimal
    // rounding absorbs that. pred_111_333 is the reference's own acceptance
    // probe (0.111 + 0.333 -> 0.444, java:45-53).
    QueryDef.sql(
      "m4_regression_sum",
      """SELECT CAST(1.0 AS DOUBLE) AS coef_a, CAST(1.0 AS DOUBLE) AS coef_b,
        |       CAST(0.0 AS DOUBLE) AS intercept, CAST(1.0 AS DOUBLE) AS r2,
        |       CAST(0.444 AS DOUBLE) AS pred_111_333""".stripMargin) { (s, d) =>
      val spark = s
      import spark.implicits._
      val data = (0 until 2000).map { i =>
        val a = (i % 97) / 97.0 * 3.0
        val b = (i % 89) / 89.0 * 3.0
        (a, b, a + b)
      }.toDF("a", "b", "y")
      val feat = data.select(array_to_vector(array(col("a"), col("b"))).as("features"),
        col("y").as("label"))
      val model = new LinearRegression().setMaxIter(20).fit(feat)
      val pred = model.coefficients(0) * 0.111 + model.coefficients(1) * 0.333 +
        model.intercept
      Seq((model.coefficients(0), model.coefficients(1), model.intercept,
        model.summary.r2, pred)).toDF("coef_a", "coef_b", "intercept", "r2", "pred_111_333")
        .select(round(col("coef_a"), 4).as("coef_a"), round(col("coef_b"), 4).as("coef_b"),
          round(col("intercept"), 4).as("intercept"), round(col("r2"), 4).as("r2"),
          round(col("pred_111_333"), 4).as("pred_111_333"))
    },

    // M5: Word2Vec embedding lookup table (the reference's word->vector map,
    // chapter2/PredictCommentsUsingRNNAndWord2Vec.java:55) trained on the
    // fixture corpus. Fit runs on ONE partition by default (VERDICT r5 #5:
    // the multi-partition hogwild fit mixes parameters in task-completion
    // order, making this the lone partition-variant catalog entry); the
    // distributed hogwild path — the 100 TB posture, where gradient mixing
    // noise is dwarfed by corpus size — stays available under
    // spark.graft.w2v.numPartitions. Setting that flag is an explicit
    // opt-OUT of bit-reproducibility, so it also forfeits the golden
    // oracle below: expect (and ignore) a hash mismatch for this entry
    // when running the correctness gate with the flag set.
    // No SQL oracle can replay SGD, but
    // the default fit is deterministic for a fixed fixture (seeded
    // single-partition fit + sim rounded to 3dp + (sim, word)
    // sort-stabilized synonym rows — re-run equality pinned in
    // CatalogSpec), so the oracle pins a committed golden
    // (graft.GoldenGen), same contract as e5_compression_ratio.
    QueryDef.pinnedSql(
      "m5_word2vec_table",
      Golden.sql("m5_word2vec_table", "query, word, sim, vocab_rows, dim",
        "sim DESC, word")) { (s, d) =>
      val spark = s
      import spark.implicits._
      val w2vParts = s.conf.getOption("spark.graft.w2v.numPartitions")
        .map(_.trim.toInt).getOrElse(1)
      // ONE pinned tokenize pass feeds both the fit and the top-token
      // probe (review r9: the corpus used to tokenize twice — this is the
      // catalog's slowest-growing entry, so the second scan was real)
      val toks = graft.operators.Pinned.pin(Tables.documents(s, d)
        .select(graft.functions.TextFunctions.tokenize(col("text")).as("tokens")))
      val model = new org.apache.spark.ml.feature.Word2Vec()
        .setInputCol("tokens").setOutputCol("vec")
        .setVectorSize(16).setMinCount(5).setSeed(42).setMaxIter(1)
        .setNumPartitions(w2vParts)
        .fit(toks)
      val top = toks
        .select(explode(col("tokens")).as("t"))
        .groupBy("t").count().orderBy(col("count").desc, col("t")).limit(1)
        .as[(String, Long)].head()._1
      model.findSynonyms(top, 5)
        .select(lit(top).as("query"), col("word"), round(col("similarity"), 3).as("sim"))
        .withColumn("vocab_rows", lit(model.getVectors.count()))
        .withColumn("dim", lit(16L))
        .orderBy(col("sim").desc, col("word"))
    },

    // M2: anomaly scoring — PCA reconstruction error feeding the W1
    // top-k ranking (chapter3/MNISTAnomalyDetector.java:91-109,184-217).
    // The ranked rows themselves are PCA floats (correctly not pinned —
    // near-tie order could flip across MLlib versions); the oracle pins
    // the partition-invariant INVARIANTS as one hash-checked row (the
    // VERDICT r6 #7 pattern, same as e2_semdedup): exactly min(5, |label|)
    // rows per label, every label present, every residual non-negative.
    // MlSpec keeps the ranking-stability gate on the detailed frame
    // ([[pcaAnomalyTopK]]).
    QueryDef.sql(
      "m2_pca_anomaly",
      """WITH per AS (SELECT label, count(*) AS n FROM embeddings GROUP BY label)
        |SELECT CAST(sum(least(n, 5)) AS BIGINT) AS n_rows,
        |       CAST(count(*) AS BIGINT) AS n_labels,
        |       true AS five_per_label, true AS scores_nonneg
        |FROM per""".stripMargin) { (s, d) =>
      val top = graft.operators.Pinned.pin(pcaAnomalyTopK(s, d))
      val perLabel = Tables.embeddings(s, d)
        .groupBy("label").agg(count(lit(1)).as("n_all"))
      val flags = top.groupBy("label").agg(count(lit(1)).as("n_top"))
        .join(perLabel, "label")
        .agg(sum("n_top").as("n_rows"), count(lit(1)).as("n_labels"),
          bool_and(col("n_top") === least(lit(5L), col("n_all"))).as("five_per_label"))
      // float tolerance: |x|^2 - |proj|^2 >= 0 mathematically; summation
      // order can leave -1e-12-ish residue on a genuinely-zero score
      val nonneg = top.agg(bool_and(col("score") >= -1e-6).as("scores_nonneg"))
      flags.crossJoin(nonneg)
        .select(col("n_rows"), col("n_labels"),
          col("five_per_label"), col("scores_nonneg"))
    },

    // M1: sequence/sentiment-style classification — embedding features →
    // LogisticRegression (capability match for the LSTM sentiment pipeline,
    // chapter2/PredictCommentsUsingRNNAndWord2Vec.java:94-107). The target
    // is binary and learnable by construction (sign of the first embedding
    // component — derived from the features, like MlSpec's M1 gate), so
    // "the pipeline learns it" is a partition-invariant fact the oracle
    // can pin: train accuracy above BOTH the majority-class baseline and
    // a 0.9 floor, with a wide margin (LR separates it at ~1.0). The raw
    // accuracy float stays un-pinned (solver float order).
    QueryDef.sql(
      "m1_classification_pipeline",
      """SELECT CAST(count(*) AS BIGINT) AS n_train, true AS acc_above_floor
        |FROM embeddings""".stripMargin) { (s, d) =>
      learnsTargetFloor(s, d) { data =>
        new LogisticRegression().setMaxIter(20).fit(data).transform(data)
      }
    },

    // M3: multiclass classification on pixel-style vectors via MLP
    // (capability match for the CNN of chapter_4/MnistClassification.java:90-137;
    // no conv layers in MLlib — documented fidelity gap in SURVEY §2.9).
    // Same hash-checked learns-the-target floor as m1 (the MLP reaches
    // ~1.0 on the separable target; raw float stays un-pinned).
    QueryDef.sql(
      "m3_mlp_classifier",
      """SELECT CAST(count(*) AS BIGINT) AS n_train, true AS acc_above_floor
        |FROM embeddings""".stripMargin) { (s, d) =>
      import org.apache.spark.ml.classification.MultilayerPerceptronClassifier
      learnsTargetFloor(s, d) { data =>
        new MultilayerPerceptronClassifier()
          .setLayers(Array(64, 16, 2)).setSeed(42).setMaxIter(30).fit(data)
          .transform(data)
      }
    },

    // M3 (native): the from-scratch conv net (graft.ml.ConvNet) — the
    // architecture of chapter_4/MnistClassification.java:99-131 itself, not
    // the MLP capability substitute — trained on the 64-dim embeddings read
    // as 8x8 single-channel images against the same learnable target as
    // m1/m3. Single-partition seeded fit (the m5_word2vec precedent) keeps
    // the entry partition-invariant; the distributed parameter-averaging
    // path is exercised in ConvNetSpec. Fixed vec_id slice (500 rows)
    // keeps the training cost constant across SF.
    QueryDef.sql(
      "m3_convnet",
      """SELECT CAST(count(*) AS BIGINT) AS n_train, true AS acc_above_floor
        |FROM embeddings WHERE vec_id < 500""".stripMargin) { (s, d) =>
      import graft.ml.{ConvNet, ConvNetConfig}
      val spark = s
      import spark.implicits._
      val cfg = ConvNetConfig(inSize = 8, k = 3, conv1Maps = 4, conv2Maps = 6,
        hidden = 16, classes = 2, pool = 1)
      val data = Tables.embeddings(s, d).where(col("vec_id") < 500)
        .select(col("vec_id"),
          when(element_at(col("embedding"), 1) > 0, 1).otherwise(0).as("y"),
          col("embedding").cast("array<double>").as("e"))
        .repartition(1).sortWithinPartitions("vec_id")
        .map(r => (r.getInt(1), r.getSeq[Double](2).toArray))
        .cache()
      try {
        val n = data.count()
        // empty-input posture (m2_autoencoder precedent): an empty slice
        // must emit the oracle's vacuous (0, true) row, not crash in the
        // majority-baseline reduce / divide below
        if (n == 0) Seq((0L, true)).toDF("n_train", "acc_above_floor")
        else {
          val majority = data.map(_._1).groupByKey(identity).count()
            .map(_._2).reduce(math.max).toDouble / n
          val p = ConvNet.fitParameterAveraging(data, cfg, epochs = 25, lr = 0.05,
            batchSize = 32, seed = 42)
          val acc = ConvNet.accuracy(data, cfg, p)
          Seq((n, acc > math.max(majority, 0.9))).toDF("n_train", "acc_above_floor")
        }
      } finally data.unpersist()
    },

    // M1 (native): the from-scratch LSTM (graft.ml.Lstm) — the recurrent
    // layer of chapter2/PredictCommentsUsingRNNAndWord2Vec.java:94-107
    // itself, not the doc-averaging substitute. Each embedding row becomes
    // an 8-step sequence of 8-dim chunks; the target reads the FINAL
    // chunk, so the signal must flow through the recurrent path to the
    // last hidden state. Same single-partition seeded fit; true
    // order-sensitivity (A-before-B, identical bags) is pinned in LstmSpec.
    QueryDef.sql(
      "m1_lstm",
      """SELECT CAST(count(*) AS BIGINT) AS n_train, true AS acc_above_floor
        |FROM embeddings WHERE vec_id < 500""".stripMargin) { (s, d) =>
      import graft.ml.{Lstm, LstmConfig}
      val spark = s
      import spark.implicits._
      val cfg = LstmConfig(inDim = 8, hidden = 16, classes = 2)
      val data = Tables.embeddings(s, d).where(col("vec_id") < 500)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
        .repartition(1).sortWithinPartitions("vec_id")
        .map { r =>
          val chunks = r.getSeq[Double](1).grouped(8).map(_.toArray).toSeq
          val y = if (chunks.last.head > 0) 1 else 0
          (y, chunks)
        }
        .cache()
      try {
        val n = data.count()
        // empty-input posture (m2_autoencoder precedent): vacuous (0, true)
        // on an empty slice instead of an empty-reduce crash
        if (n == 0) Seq((0L, true)).toDF("n_train", "acc_above_floor")
        else {
          val majority = data.map(_._1).groupByKey(identity).count()
            .map(_._2).reduce(math.max).toDouble / n
          val p = Lstm.fitParameterAveraging(data, cfg, epochs = 10, lr = 2e-2,
            batchSize = 32, seed = 42)
          val acc = Lstm.accuracy(data, cfg, p)
          Seq((n, acc > math.max(majority, 0.9))).toDF("n_train", "acc_above_floor")
        }
      } finally data.unpersist()
    },

    // M2 (native): the from-scratch autoencoder (graft.ml.Autoencoder) —
    // the reference's ACTUAL M2 model family
    // (chapter3/MNISTAnomalyDetector.java:91-110), complementing the PCA
    // capability twin. The fixture embeddings are near-uniform
    // (incompressible — the honest worst case), so the hash-checked gate
    // pins the two partition-invariant facts that hold regardless:
    // training strictly reduces train reconstruction error vs the seeded
    // init (measured 5-9% on this data), and the anomaly CONTRACT holds —
    // every planted off-distribution input (4x-scaled copies) scores above
    // every in-distribution row. Real manifold learning (90%+ outlier
    // capture on structured data) is pinned in AutoencoderSpec. The
    // 500-row slice is bounded and fixed, so the driver-side score loop
    // is constant work at any SF.
    QueryDef.sql(
      "m2_autoencoder",
      """SELECT CAST(count(*) AS BIGINT) AS n_train, true AS anomaly_contract
        |FROM embeddings WHERE vec_id < 500""".stripMargin) { (s, d) =>
      import graft.ml.{AeConfig, Autoencoder}
      val spark = s
      import spark.implicits._
      val cfg = AeConfig(Seq(64, 16, 4, 16, 64))
      val data = Tables.embeddings(s, d).where(col("vec_id") < 500)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
        .repartition(1).sortWithinPartitions("vec_id")
        .map(_.getSeq[Double](1).toArray)
        .cache()
      try {
        // the slice is bounded (<= 500 rows), so one collect feeds every
        // driver-side comparison — no extra Spark jobs for before/after
        val rows = data.collect()
        val n = rows.length.toLong
        val contract = if (rows.isEmpty) true // vacuous, matching the oracle
        else {
          val init = Autoencoder.init(cfg, 12345)
          val before = rows.map(Autoencoder.score(cfg, init, _)).sum / n
          val p = Autoencoder.fitParameterAveraging(data, cfg, epochs = 10,
            lr = 0.05, batchSize = 32, seed = 12345)
          val scores = rows.map(Autoencoder.score(cfg, p, _))
          val after = scores.sum / n
          // planted outliers must carry real energy: a 4x-scaled all-zero
          // vector is the same vector, so only rows above a norm floor
          // qualify (vacuously true if the fixture had none)
          val outliers = rows.take(30)
            .filter(x => math.sqrt(x.map(v => v * v).sum) > 1e-3)
            .map(x => Autoencoder.score(cfg, p, x.map(_ * 4)))
          after < before &&
            (outliers.isEmpty || outliers.min > scores.max)
        }
        Seq((n, contract)).toDF("n_train", "anomaly_contract")
      } finally data.unpersist()
    },

    // E3 (IVF scale path): KMeans-cell inverted-file ANN. Output is the
    // recall@5-vs-exact summary row (VERDICT r5 #3): the oracle pins
    // (|Q|, recall_ok=true), so the ANN quality number is hash-checked
    // every round instead of living only in OperatorsSpec. nProbe=12 of 16
    // cells measures 0.90 mean recall at sf0.01 vs the 0.8 floor — the
    // fixture embeddings are near-uniform (worst case for IVF), so the
    // probe fraction is high here; at production nCells (thousands) the
    // same recall comes at a far smaller fraction.
    QueryDef.sql(
      "e3_ann_ivf",
      """SELECT CAST(count(*) AS BIGINT) AS n_queries, true AS recall_ok
        |FROM embeddings WHERE vec_id < 10""".stripMargin) { (s, d) =>
      import graft.operators.Similarity
      val emb = Tables.embeddings(s, d)
      val q = emb.where(col("vec_id") < 10)
      val ann = Similarity.ivfTopK(emb, q, k = 5, nProbe = 12)
      Similarity.recallSummary(ann, Similarity.exactTopK(emb, q, k = 5), 0.8)
    },

    // E3 (PQ memory path) — BUILD entry: fit codebooks (25% deterministic
    // sample — the 100 TB posture; at scale pass ~0.001), persist
    // codebooks + code table to the IndexStore (the one-time ingest cost a
    // production pipeline pays once), then answer the query from the
    // written index. Output is the recall@5-vs-exact summary row (oracle
    // pins (|Q|, true) — VERDICT r5 #3); rerank comes from annScaled so
    // the 0.8 floor holds at every fixture SF (0.98 at sf0.01, 1.00 at
    // sf0.1 — near-uniform fixture vectors make ADC ranking noisy, so
    // recall is bought with rerank width in this regime; the scan itself
    // still reads only m-byte codes). e3_ann_pq_probe below times the
    // per-query half alone.
    QueryDef.sql(
      "e3_ann_pq",
      """SELECT CAST(count(*) AS BIGINT) AS n_queries, true AS recall_ok
        |FROM embeddings WHERE vec_id < 10""".stripMargin) { (s, d) =>
      import graft.operators.{ProductQuantization, Similarity}
      val emb = Tables.embeddings(s, d)
      val q = emb.where(col("vec_id") < 10)
      val dir = s"${graft.sources.IndexStore.root(d)}/pq"
      val (_, _, rerank) = annScaled(emb.count())
      val books = ProductQuantization.writeIndex(emb, dir, fitSampleFraction = 0.25)
      val ann = ProductQuantization.pqTopKPrebuilt(s.read.parquet(s"$dir/codes"), emb,
        q, books, k = 5, rerank = rerank)
      Similarity.recallSummary(ann, Similarity.exactTopK(emb, q, k = 5), 0.8)
    },

    // E3 PQ — PROBE entry: read the pre-built codebooks + code table and
    // run only the ADC scan + exact re-rank. This is the recurring
    // per-query production cost (the _build entry above is the one-time
    // ingest cost); identical output to e3_ann_pq by construction since
    // encode() is deterministic. Builds-if-absent so it runs standalone.
    QueryDef.sql(
      "e3_ann_pq_probe",
      """SELECT CAST(count(*) AS BIGINT) AS n_queries, true AS recall_ok
        |FROM embeddings WHERE vec_id < 10""".stripMargin) { (s, d) =>
      import graft.operators.{ProductQuantization, Similarity}
      import graft.sources.IndexStore
      val emb = Tables.embeddings(s, d)
      val q = emb.where(col("vec_id") < 10)
      val dir = s"${IndexStore.root(d)}/pq"
      // knob derivation costs ONE parquet metadata count (~ms) — hoisted
      // so the coverage gate below reuses it (review r9: two identical
      // count jobs per probe added scheduling noise to the recorded base)
      val nEmb = emb.count()
      val (_, _, rerank) = annScaled(nEmb)
      // params-manifest gate (ADVICE r5) + row-count coverage (r7): an
      // index left behind by a run with different build parameters OR a
      // regenerated fixture rebuilds instead of being probed stale
      val books =
        if (ProductQuantization.pqIndexMatches(s, dir, fitSampleFraction = 0.25) &&
            ProductQuantization.indexCovers(s, dir, nEmb))
          ProductQuantization.readCodebooks(s, dir)
        else ProductQuantization.writeIndex(emb, dir, fitSampleFraction = 0.25)
      val ann = ProductQuantization.pqTopKPrebuilt(s.read.parquet(s"$dir/codes"), emb,
        q, books, k = 5, rerank = rerank)
      Similarity.recallSummary(ann, Similarity.exactTopK(emb, q, k = 5), 0.8)
    },

    // E3 (IVF-PQ composition, the classic IVFADC) — BUILD entry: fit the
    // coarse quantizer + residual codebooks, persist cells/codebooks/codes
    // (the code table partitioned BY cell so probes directory-prune), then
    // answer from the written index. Coarse cells prune COMPUTE (nProbe of
    // nCells cells per query), residual-PQ codes prune BYTES; exact
    // re-rank on the survivors. Output is the recall@5-vs-exact summary
    // row (oracle pins (|Q|, true) — VERDICT r5 #3); all three knobs come
    // from annScaled, holding the 0.8 floor at every fixture SF (0.94 at
    // sf0.01, 0.98 at sf0.1 — see the e3_ann_ivf note on why the
    // near-uniform fixture needs a high probe fraction).
    // e3_ann_ivfpq_probe below times the per-query half alone.
    QueryDef.sql(
      "e3_ann_ivfpq",
      """SELECT CAST(count(*) AS BIGINT) AS n_queries, true AS recall_ok
        |FROM embeddings WHERE vec_id < 10""".stripMargin) { (s, d) =>
      import graft.operators.{ProductQuantization, Similarity}
      val emb = Tables.embeddings(s, d)
      val q = emb.where(col("vec_id") < 10)
      val dir = s"${graft.sources.IndexStore.root(d)}/ivfpq"
      val (nCells, nProbe, rerank) = annScaled(emb.count())
      ProductQuantization.writeIvfPqIndex(emb, dir, nCells = nCells,
        fitSampleFraction = 0.25)
      val ann = ProductQuantization.ivfPqProbe(s, dir, emb, q, k = 5,
        nProbe = nProbe, rerank = rerank)
      Similarity.recallSummary(ann, Similarity.exactTopK(emb, q, k = 5), 0.8)
    },

    // E3 IVF-PQ — PROBE entry: read the pre-built index and run only the
    // cell probe + partition-pruned ADC scan + exact re-rank (the
    // recurring per-query production cost; the _build entry above is the
    // one-time ingest cost). Builds-if-absent so it runs standalone.
    QueryDef.sql(
      "e3_ann_ivfpq_probe",
      """SELECT CAST(count(*) AS BIGINT) AS n_queries, true AS recall_ok
        |FROM embeddings WHERE vec_id < 10""".stripMargin) { (s, d) =>
      import graft.operators.{ProductQuantization, Similarity}
      import graft.sources.IndexStore
      val emb = Tables.embeddings(s, d)
      val q = emb.where(col("vec_id") < 10)
      val dir = s"${IndexStore.root(d)}/ivfpq"
      // knob derivation costs ONE parquet metadata count (~ms), hoisted
      // for the coverage gate (review r9)
      val nEmb = emb.count()
      val (nCells, nProbe, rerank) = annScaled(nEmb)
      // params-manifest gate (ADVICE r5) + row-count coverage (r7):
      // mismatched params or a regenerated fixture rebuilds
      if (!ProductQuantization.ivfPqIndexMatches(s, dir, nCells = nCells,
          fitSampleFraction = 0.25) ||
          !ProductQuantization.indexCovers(s, dir, nEmb))
        ProductQuantization.writeIvfPqIndex(emb, dir, nCells = nCells,
          fitSampleFraction = 0.25)
      val ann = ProductQuantization.ivfPqProbe(s, dir, emb, q, k = 5,
        nProbe = nProbe, rerank = rerank)
      Similarity.recallSummary(ann, Similarity.exactTopK(emb, q, k = 5), 0.8)
    },

    // E3 IVF-PQ — APPEND entry (continual ingest): build the index on 90%
    // of the corpus, appendToIvfPqIndex the remaining 10% against the
    // STORED cells/codebooks (no refit — the batch-sized encode pass a
    // production pipeline pays per ingest instead of a rebuild), then
    // probe the full corpus from the appended index. Output is the same
    // recall@5-vs-exact summary row as the other e3 entries, so the oracle
    // hash-checks that vectors ingested via append are exactly as findable
    // as built-in ones. The 90% build uses Overwrite, so re-runs never
    // double-append. Parity law (appended codes ≡ encoding the union
    // against the same artifacts) is pinned in OperatorsSpec.
    QueryDef.sql(
      "e3_ann_ivfpq_append",
      """SELECT CAST(count(*) AS BIGINT) AS n_queries, true AS recall_ok
        |FROM embeddings WHERE vec_id < 10""".stripMargin) { (s, d) =>
      import graft.operators.{ProductQuantization, Similarity}
      val emb = Tables.embeddings(s, d)
      val q = emb.where(col("vec_id") < 10)
      val dir = s"${graft.sources.IndexStore.root(d)}/ivfpq_append"
      val (nCells, nProbe, rerank) = annScaled(emb.count())
      val seed = emb.where(col("vec_id") % 10 =!= 0)
      val batch = emb.where(col("vec_id") % 10 === 0)
      ProductQuantization.writeIvfPqIndex(seed, dir, nCells = nCells,
        fitSampleFraction = 0.25)
      ProductQuantization.appendToIvfPqIndex(batch, dir, nCells = nCells,
        fitSampleFraction = 0.25)
      val ann = ProductQuantization.ivfPqProbe(s, dir, emb, q, k = 5,
        nProbe = nProbe, rerank = rerank)
      Similarity.recallSummary(ann, Similarity.exactTopK(emb, q, k = 5), 0.8)
    },

    // A8/M2 hybrid: per-example MSE between each vector and its label's
    // mean vector (reconstruction against the class centroid) — exact
    // relational computation, oracle-checked.
    QueryDef.sql(
      "a8_centroid_mse",
      """WITH mean_vec AS (
        |  SELECT label, pos, avg(CAST(v AS DOUBLE)) AS mv
        |  FROM (SELECT label, generate_subscripts(embedding, 1) AS pos, unnest(embedding) AS v
        |        FROM embeddings)
        |  GROUP BY label, pos
        |), per_elem AS (
        |  SELECT e.vec_id, e.label, m.pos,
        |         (CAST(e.embedding[m.pos] AS DOUBLE) - m.mv) AS diff
        |  FROM embeddings e JOIN mean_vec m ON m.label = e.label
        |)
        |SELECT vec_id, round(sum(diff * diff) / count(*), 6) AS centroid_mse
        |FROM per_elem GROUP BY vec_id ORDER BY vec_id""".stripMargin) { (s, d) =>
      val exploded = Tables.embeddings(s, d)
        .select(col("label"), posexplode(col("embedding")).as(Seq("pos0", "v")))
        .select(col("label"), (col("pos0") + 1).cast("long").as("pos"),
          col("v").cast("double").as("v"))
      val means = exploded.groupBy("label", "pos").agg(avg("v").as("mv"))
      Tables.embeddings(s, d)
        .select(col("vec_id"), col("label"), posexplode(col("embedding")).as(Seq("pos0", "v")))
        .select(col("vec_id"), col("label"), (col("pos0") + 1).cast("long").as("pos"),
          col("v").cast("double").as("v"))
        .join(broadcast(means), Seq("label", "pos"))
        .withColumn("diff", col("v") - col("mv"))
        .groupBy("vec_id")
        .agg(round(sum(col("diff") * col("diff")) / count(lit(1)), 6).as("centroid_mse"))
        .orderBy("vec_id")
    }
  )
}
