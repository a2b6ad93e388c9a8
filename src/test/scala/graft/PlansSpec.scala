package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions
import graft.sources.Tables

/** Native expression layer (graft.plans): the codegen'd cosine must agree
  * bit-for-bit with the composed higher-order-function form and be
  * registered through SparkSessionExtensions.
  */
class PlansSpec extends SparkSpec {

  import SharedSpark.spark.implicits._

  test("graft_cosine is registered via SparkSessionExtensions and callable from SQL") {
    val r = spark.sql("SELECT graft_cosine(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), " +
      "array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)))").as[Double].head()
    assert(math.abs(r - 1.0) < 1e-12)
  }

  test("native cosine equals the composed form bit-for-bit on fixtures") {
    val emb = Tables.embeddings(spark, sfDir).limit(200)
    val q = emb.select(col("vec_id").as("q_id"), col("embedding").as("q_emb")).limit(5)
    val both = emb.join(broadcast(q), col("vec_id") =!= col("q_id"))
      .select(
        VectorFunctions.cosine(col("q_emb"), col("embedding")).as("composed"),
        call_function("graft_cosine", col("q_emb"), col("embedding")).as("native"))
      .as[(Double, Double)].collect()
    assert(both.nonEmpty)
    for ((c, n) <- both) assert(c == n, s"composed=$c native=$n")
  }

  test("native cosine null semantics: zero vector and length mismatch") {
    val r = spark.sql(
      """SELECT graft_cosine(array(CAST(0.0 AS FLOAT)), array(CAST(1.0 AS FLOAT))) AS z,
        |       graft_cosine(array(CAST(1.0 AS FLOAT)), array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT))) AS m,
        |       graft_cosine(CAST(NULL AS ARRAY<FLOAT>), array(CAST(1.0 AS FLOAT))) AS nl""".stripMargin)
      .head()
    assert(r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2))
  }

  test("native cosine stays inside whole-stage codegen") {
    val emb = Tables.embeddings(spark, sfDir)
    val plan = emb.select(call_function("graft_cosine", col("embedding"), col("embedding")))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*("), s"no codegen span:\n$plan")
  }

  test("SelfCosineRewrite: cosine(x,x) optimizes to a norm form, exact semantics") {
    val emb = Tables.embeddings(spark, sfDir).limit(50)
    val df = emb.select(call_function("graft_cosine", col("embedding"), col("embedding")).as("c"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("graft_cosine"), s"self-cosine not rewritten:\n$optimized")
    // the single-pass SelfCosine expression (r8: the earlier If/Sqrt tree
    // over graft_norm_sq referenced the norm four times — four array scans
    // where the unrewritten fused loop did one)
    assert(optimized.contains("graft_self_cosine"), s"norm form missing:\n$optimized")
    val vals = df.as[Double].collect()
    assert(vals.nonEmpty && vals.forall(v => math.abs(v - 1.0) < 1e-12))
    // zero vector keeps its null, via SQL to exercise the same path
    val z = spark.sql(
      "SELECT graft_cosine(array(CAST(0.0 AS FLOAT)), array(CAST(0.0 AS FLOAT)))").head()
    assert(z.isNullAt(0))
    // NaN elements null the result in BOTH forms (review r9: a NaN
    // similarity sorts above every double under desc and would rank #1 in
    // every top-k window; the rewrite must preserve the null posture)
    val nan = spark.sql(
      "SELECT graft_cosine(array(CAST('NaN' AS FLOAT)), array(CAST('NaN' AS FLOAT)))")
      .head()
    assert(nan.isNullAt(0), s"NaN must null, not rank: $nan")
    // Inf elements too: the norm is +Inf (NOT NaN), but the quotient
    // Inf/Inf is NaN — the SELF-COSINE rewrite path must null it exactly
    // like the two-sided expression (review r9, second pass: the rewrite
    // briefly reintroduced the rank-#1 divergence here)
    val inf = spark.sql(
      "SELECT graft_cosine(array(CAST('Infinity' AS FLOAT)), array(CAST('Infinity' AS FLOAT)))")
      .head()
    assert(inf.isNullAt(0), s"Inf/Inf must null in the rewrite path: $inf")
    // distinct arguments are untouched by the rule
    val two = emb.select(call_function("graft_cosine",
      col("embedding"), reverse(col("embedding"))).as("c"))
    assert(two.queryExecution.optimizedPlan.toString.contains("graft_cosine"))
  }

  /** Review-r8 pin: a null ELEMENT nulls the native cosine — the composed
    * form propagates element nulls to a null result, and reading the null
    * slot as 0.0 returned a confidently wrong similarity. Covers the
    * two-sided path and the SelfCosine rewrite path.
    */
  test("graft_cosine: null array elements yield null, matching the composed form") {
    val r = spark.sql(
      """SELECT
        |  graft_cosine(array(CAST(NULL AS FLOAT), CAST(1.0 AS FLOAT)),
        |               array(CAST(1.0 AS FLOAT), CAST(1.0 AS FLOAT))) AS two_sided,
        |  graft_cosine(array(CAST(NULL AS FLOAT), CAST(1.0 AS FLOAT)),
        |               array(CAST(NULL AS FLOAT), CAST(1.0 AS FLOAT))) AS self_side
        |""".stripMargin).head()
    assert(r.isNullAt(0), "two-sided null element must be null")
    assert(r.isNullAt(1), "self-cosine null element must be null")
    // the composed form agrees (the parity contract)
    val composed = Seq((Seq[java.lang.Float](null, 1.0f), Seq[java.lang.Float](1.0f, 1.0f)))
      .toDF("a", "b")
      .select(graft.functions.VectorFunctions.cosine(col("a"), col("b")))
      .head()
    assert(composed.isNullAt(0), "composed form must also be null — parity")
  }

  test("graft_tokenize / graft_token_count agree, and size(tokenize) rewrites") {
    import graft.functions.{TextFunctions => TF}
    // SQL registration
    val n = spark.sql("SELECT graft_token_count('Hello, wor-ld 42')").as[Int].head()
    assert(n == 3) // [hello, world, 42]
    // rewrite fires: size(graft_tokenize(x)) -> graft_token_count(x)
    val df = Tables.documents(spark, sfDir)
      .select(size(TF.tokenize(col("text"))).as("n_tokens"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("graft_token_count"), s"rewrite did not fire:\n$optimized")
    assert(!optimized.contains("graft_tokenize"), s"tokenize array survived:\n$optimized")
    // equality against the un-rewritten composed form over the corpus
    val viaCount = df.as[Int].collect().toSeq
    val viaArray = Tables.documents(spark, sfDir)
      .select(size(TF.tokenizeComposed(col("text")))).as[Int].collect().toSeq
    assert(viaCount == viaArray)
    // null input stays null (non-legacy size semantics)
    val nul = spark.sql("SELECT size(graft_tokenize(CAST(NULL AS STRING)))").head()
    assert(nul.isNullAt(0))
  }

  test("native expressions work without the function registry (NativeColumns)") {
    import graft.plans.NativeColumns
    // bypasses call_function entirely — the path extension-less sessions use
    val toks = Seq("Hello, World 42").toDF("t")
      .select(NativeColumns.tokenize(col("t"))).as[Seq[String]].head()
    assert(toks == Seq("hello", "world", "42"))
    val n = Seq("a b c").toDF("t")
      .select(NativeColumns.tokenCount(col("t"))).as[Int].head()
    assert(n == 3)
    val c = Seq((Seq(1.0f, 0.0f), Seq(1.0f, 0.0f))).toDF("a", "b")
      .select(NativeColumns.cosine(col("a"), col("b"))).as[Double].head()
    assert(math.abs(c - 1.0) < 1e-12)
  }

  test("native ADC distance equals the composed form bit-for-bit; null semantics; codegen") {
    import graft.operators.ProductQuantization
    // random (codes, table) rows at the real shape: m=8 subspaces,
    // kCodes=16 centroids, plus the edge rows the null contract covers
    val rnd = new scala.util.Random(7)
    val rows = (1 to 200).map { _ =>
      val codes = Seq.fill(8)(rnd.nextInt(16))
      val table = Seq.fill(8)(Seq.fill(16)(rnd.nextDouble() * 4 - 2))
      (codes, table)
    }
    val df = rows.toDF("codes", "table").cache()
    val native = df.select(
      ProductQuantization.adcDistance(col("codes"), col("table")).as("d"))
      .as[Double].collect().toSeq
    val composed = df.select(
      ProductQuantization.adcDistanceComposed(col("codes"), col("table")).as("d"))
      .as[Double].collect().toSeq
    assert(native == composed) // bitwise: same doubles, same order of adds
    df.unpersist()
    // null contract: length mismatches -> null in BOTH forms
    val edge = Seq(
      (Seq(0, 1), Seq(Seq(1.0, 2.0))),          // codes longer than table
      (Seq(0), Seq(Seq(1.0, 2.0), Seq(3.0)))    // table longer than codes
    ).toDF("codes", "table")
    val nativeEdge = edge.select(
      ProductQuantization.adcDistance(col("codes"), col("table"))).collect().map(_.isNullAt(0))
    val composedEdge = edge.select(
      ProductQuantization.adcDistanceComposed(col("codes"), col("table"))).collect().map(_.isNullAt(0))
    assert(nativeEdge.toSeq == Seq(true, true))
    assert(composedEdge.toSeq == nativeEdge.toSeq)
    // deliberate divergence on CORRUPT codes (unreachable from encode):
    // the native form yields a row-local null; the composed form's ANSI
    // element_at throws and would fail the whole scan
    val corrupt = Seq((Seq(5), Seq(Seq(1.0, 2.0)))).toDF("codes", "table")
    assert(corrupt.select(
      ProductQuantization.adcDistance(col("codes"), col("table"))).head().isNullAt(0))
    intercept[Exception] {
      corrupt.select(
        ProductQuantization.adcDistanceComposed(col("codes"), col("table"))).collect()
    }
    // SQL surface
    val viaSql = Seq((Seq(1, 0), Seq(Seq(0.5, 1.5), Seq(2.5, 3.5))))
      .toDF("codes", "table")
      .selectExpr("graft_adc_distance(codes, table) AS d")
    assert(viaSql.as[Double].head() == 1.5 + 2.5)
    // whole-stage codegen: a literal frame constant-folds to
    // LocalTableScan, so check over a parquet-backed source (same
    // approach as the cosine codegen pin)
    val emb = Tables.embeddings(spark, sfDir).limit(50)
    val books = Array.fill(8)(Array.fill(16)(Array.fill(8)(0.1f)))
    val planned = emb.select(
      ProductQuantization.adcDistance(
        ProductQuantization.encode(col("embedding"), books),
        ProductQuantization.adcTable(col("embedding"), books)).as("d"))
    val plan = planned.queryExecution.executedPlan.toString
    assert(plan.contains("*("), s"ADC fell out of codegen:\n$plan")
  }

  test("native cosine is at least as fast as the composed form (informational)") {
    val emb = Tables.embeddings(spark, sfDir).cache()
    emb.count()
    def time(f: => Long): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val composed = time(emb.select(VectorFunctions.cosine(col("embedding"), col("embedding"))).count())
    val native = time(emb.select(call_function("graft_cosine", col("embedding"), col("embedding"))).count())
    info(f"composed=$composed%.3f s native=$native%.3f s")
    emb.unpersist()
  }
}
