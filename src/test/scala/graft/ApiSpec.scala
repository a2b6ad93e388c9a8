package graft

import org.apache.spark.sql.functions._
import graft.api._
import graft.sources.Tables

/** The fluent façade (`import graft.api._`) must forward to the tested
  * operators unchanged — each verb is checked against the operator it wraps
  * or an independent formulation.
  */
class ApiSpec extends SparkSpec {

  import SharedSpark.spark.implicits._

  test("text verbs: tokenized + qualityScored + dedupExact chain") {
    val docs = Seq((1L, "Hello, World! the of and a to in one"),
      (2L, "Hello, World! the of and a to in one"), (3L, "short")).toDF("doc_id", "text")
    val out = docs.dedupExact(Seq("text"), "doc_id").tokenized().qualityScored()
    val rows = out.orderBy("doc_id").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 3L)) // dup 2 dropped, min id kept
    assert(rows(0).getAs[scala.collection.Seq[String]]("tokens").take(2).toSeq == Seq("hello", "world"))
    val q = rows(0).getAs[Double]("quality")
    assert(q > 0 && q <= 1.0)
  }

  test("packed matches the catalogued e8 chunk assignment") {
    val viaApi = Tables.documents(spark, sfDir)
      .packed(budget = 2000)
      .select(col("doc_id"), col("chunk"))
    val viaCatalog = queries.Catalog.byName("e8_pack_chunks").run(spark, sfDir)
      .select(col("doc_id"), col("chunk").as("chunk_cat"))
    assert(viaApi.join(viaCatalog, "doc_id")
      .where(col("chunk") =!= col("chunk_cat")).count() == 0)
  }

  test("packed: chunks respect the budget under concat-and-cut semantics") {
    // a chunk's preceding cumulative count stays < budget + the straddling
    // doc's tokens: no chunk starts past the budget boundary, and every doc
    // lands in exactly one chunk (docs are never split)
    val budget = 500
    val packed = Tables.documents(spark, sfDir).packed(budget = budget)
      .select("lang", "chunk", "n_tokens", "doc_id").collect()
      .groupBy(r => (r.getString(0), r.getLong(1)))
    for (((lang, chunk), rows) <- packed) {
      val total = rows.map(_.getLong(2)).sum
      val maxDoc = rows.map(_.getLong(2)).max
      // concat-and-cut: a chunk only exceeds the budget by less than its
      // last straddling document
      assert(total < budget + maxDoc, s"chunk ($lang,$chunk) total=$total")
    }
    val perDoc = packed.values.flatten.groupBy(_.getLong(3)).values.map(_.size)
    assert(perDoc.forall(_ == 1), "a doc appeared in two chunks")
  }

  test("embedding verbs forward to Similarity (same top-1 as exactTopK)") {
    val emb = Tables.embeddings(spark, sfDir)
    val q = emb.where(col("vec_id") < 3)
    val viaApi = emb.topKExact(q, 1).select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val direct = operators.Similarity.exactTopK(emb, q, 1)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    assert(viaApi == direct && viaApi.size == 3)
  }

  test("asofBackward + topNPerGroup verbs") {
    val left = Seq((1L, 10L), (1L, 30L)).toDF("k", "ts")
    val right = Seq((1L, 5L, "v5"), (1L, 20L, "v20")).toDF("k", "ts", "v")
    val asof = left.asofBackward(right, "k", "ts", "v")
      .orderBy("ts").select("v").as[String].collect().toSeq
    assert(asof == Seq("v5", "v20"))

    val scored = Seq(("a", 1.0, 1L), ("a", 3.0, 2L), ("a", 2.0, 3L), ("b", 9.0, 4L))
      .toDF("g", "score", "id")
    val top = scored.topNPerGroup("g", "score", 1, "id")
      .select("g", "id").as[(String, Long)].collect().toSet
    assert(top == Set(("a", 2L), ("b", 4L)))
  }

  test("sampling + repetition + incremental-dedup verbs forward to their operators") {
    val c = graft.sources.Tables.customer(spark, sfDir)
    val s1 = c.hashSampled("c_custkey", "s", 10).select("c_custkey").as[Long].collect().sorted.toSeq
    assert(s1 == graft.operators.Sampling.hashSample(c, col("c_custkey"), "s", 10)
      .select("c_custkey").as[Long].collect().sorted.toSeq)
    val sh = c.hashShuffled("c_custkey", "s")
    assert(sh.where(col("pos") === 1).count() == 1)
    val sp = c.splitLabeled("c_custkey", "s")
      .groupBy("split").count().as[(String, Long)].collect().toMap
    assert(sp.keySet == Set("train", "test") && sp("train") > sp("test"))

    val rep = Seq((1L, "a b a b a")).toDF("doc_id", "text")
      .repetitionScored().select("rep_ratio").as[Double].head()
    assert(rep == 0.5)

    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 4
    val existing = Seq((1L, base)).toDF("doc_id", "text")
    val kept = Seq((10L, base), (11L, "totally new words"))
      .toDF("doc_id", "text")
      .dedupIncrementalAgainst(existing, "doc_id")
      .select("doc_id").as[Long].collect().toSeq
    assert(kept == Seq(11L))
  }

  test("decontamination + token-budget verbs forward to their operators") {
    val evalSet = Seq((100L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val clean = Seq(
      (1L, "we saw a quick brown fox jumps right past us"),
      (2L, "completely unrelated words fill this document body"))
      .toDF("doc_id", "text")
      .decontaminatedAgainst(evalSet, "doc_id")
      .select("doc_id").as[Long].collect().toSeq
    assert(clean == Seq(2L))

    val docs = graft.sources.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"),
        size(graft.functions.TextFunctions.tokenize(col("text"))).cast("long").as("n_toks"))
    val viaVerb = docs.tokenBudgeted("source", "doc_id", "n_toks", "apiTb", 700L)
      .select("doc_id").as[Long].collect().sorted.toSeq
    val viaOp = graft.operators.Sampling.tokenBudget(docs, "source", col("doc_id"),
      col("n_toks"), "apiTb", 700L)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(viaVerb == viaOp && viaVerb.nonEmpty)
  }

  test("BPE verbs: tokenize -> train merges -> encode chains fluently") {
    val docs = graft.sources.Tables.documents(spark, sfDir).tokenized()
    val merges = docs.select(explode(col("tokens")).as("token"))
      .bpeMerges(numMerges = 16, maxVocab = 512)
    assert(merges.size == 16)
    val pieces = docs.bpeEncoded(merges).select("doc_id", "pieces")
    // every document segments; concatenated pieces reproduce the words
    val row = pieces.orderBy("doc_id").limit(1).collect()(0)
    assert(row.getSeq[String](1).nonEmpty)
    assert(merges == graft.operators.Bpe.trainOn(
      docs.select(explode(col("tokens")).as("token")), "token", 16, 512))
  }
}
