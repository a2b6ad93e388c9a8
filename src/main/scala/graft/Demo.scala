package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._
import graft.operators.Dedup
import graft.sources.Tables

/** End-to-end demo: the full training-data cleaning pipeline over the
  * fixture corpus, start to finish — what a user of the reference's
  * capabilities runs after switching to this library.
  *
  *   tools/run.sh graft.Demo [sfDir]
  */
object Demo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = GraftSession.getOrCreate(8)

    // 1. ingest + text analysis
    val docs = Tables.documents(spark, sfDir)
    val toks = tokenize(col("text"))
    val analyzed = docs.select(
      col("doc_id"), col("text"),
      size(toks).as("n_tokens"),
      round(qualityScore(col("text"), toks), 4).as("quality"),
      langIdNgram(col("text")).as("lang_pred"),
      fingerprint(col("text")).as("fp"))
    println(s"corpus: ${analyzed.count()} docs")

    // 2. dedup: exact (fingerprint-keyed) then near-dup (MinHash-LSH),
    //    via the fluent api (graft.api._) — each verb forwards to operators
    import graft.api._
    val exact = Dedup.exactDedupByFingerprint(analyzed, "text", "doc_id")
    val cleaned = exact.dedupNear("doc_id", threshold = 0.8)
    println(s"after dedup: ${cleaned.count()} docs")

    // 3. quality + repetition gates, per-language stats, token-budget packing
    val kept = cleaned.where(col("quality") >= 0.3 && col("n_tokens") >= 10)
      .repetitionScored().where(col("rep_ratio") < 0.5) // Gopher-style boilerplate cut
    kept.groupBy("lang_pred")
      .agg(count(lit(1)).as("n_docs"), round(avg("quality"), 4).as("avg_quality"))
      .orderBy("lang_pred").show()
    val packed = kept.withColumn("lang", col("lang_pred"))
      .packed(budget = 2048, nTokensCol = Some("n_tokens")) // reuse step-1 counts
    println(s"packed into ${packed.agg(countDistinct("lang", "chunk")).head().getLong(0)} chunks")

    // 3b. deterministic train/test split (md5 draw — same rows on any
    //     partitioning, replayable in any engine)
    kept.splitLabeled("doc_id", "demo", trainPct = 90)
      .groupBy("split").count().orderBy("split").show()

    // 3c. continual ingest: vet tomorrow's batch against today's corpus —
    //     one exact dup and one genuinely new doc
    import spark.implicits._
    val corpus = cleaned.select("doc_id", "text")
    val batch = corpus.limit(1).select((col("doc_id") + 900000).as("doc_id"), col("text"))
      .union(Seq((900001L, "a genuinely new document about nothing seen before"))
        .toDF("doc_id", "text"))
    val vetted = batch.dedupIncrementalAgainst(corpus, "doc_id")
    println(s"incremental vetting kept ${vetted.count()} of 2 batch docs")
    graft.operators.Pinned.release() // reclaim dedup intermediates

    // 4. similarity search over embeddings (exact + IVF ANN)
    val emb = Tables.embeddings(spark, sfDir)
    val queries = emb.where(col("vec_id") < 3)
    println("exact top-3 cosine neighbors:")
    emb.topKExact(queries, 3)
      .select("q_id", "n_id", "cos_sim").orderBy("q_id", "cos_sim").show()
    println("IVF ANN top-3 (scale path):")
    emb.topKIvf(queries, 3)
      .select("q_id", "n_id", "cos_sim").orderBy("q_id", "cos_sim").show()
    println("IVF-PQ ANN (cells prune compute, codes prune bytes) + recall gate:")
    emb.topKIvfPq(queries, 3, nProbe = 8, rerank = 32)
      .recallAgainst(emb.topKExact(queries, 3), minMeanRecall = 0.5).show()
    graft.operators.Pinned.release() // topKIvfPq pins its cell assignment

    // 5. flagship analytics: per-label best/worst by anomaly score
    println("per-label top/bottom anomalies (flagship W1):")
    SparkEntry.entry(spark).show(10)

    spark.stop()
  }
}
