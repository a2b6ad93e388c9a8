package graft

import org.apache.spark.sql.functions._
import graft.operators.{Pinned, ProductQuantization, Similarity}
import graft.sources.Tables

/** Dev probe for the PQ/IVF-PQ recall knobs across corpus sizes: prints
  * mean recall@5 vs exact for a grid of (kCodes, rerank[, nProbe]) so the
  * catalog entries' corpus-scaled parameter rules can be chosen from
  * measurements instead of guesses.
  */
object RecallTune {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.getOrCreate(16)
    import spark.implicits._
    val emb = Tables.embeddings(spark, d)
    val n = emb.count()
    val q = emb.where(col("vec_id") < 10)
    val exact = Similarity.exactTopK(emb, q, 5)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    def recallOf(ann: org.apache.spark.sql.DataFrame): Double = {
      val got = ann.select("q_id", "n_id").as[(Long, Long)].collect().toSet
      (exact & got).size.toDouble / exact.size
    }
    for (kCodes <- Seq(16, 32); rerank <- Seq(48, 100, 200)) {
      val ann = ProductQuantization.pqTopK(emb, q, 5, kCodes = kCodes,
        rerank = rerank, fitSampleFraction = 0.25)
      println(f"RECALL pq      n=$n kCodes=$kCodes rerank=$rerank%4d -> ${recallOf(ann)}%.3f")
      Pinned.release(); spark.catalog.clearCache()
    }
    for (rerank <- Seq(48, 100, 200); nProbe <- Seq(12, 16)) {
      val ann = ProductQuantization.ivfPqTopK(emb, q, 5, nCells = 16,
        nProbe = nProbe, rerank = rerank, fitSampleFraction = 0.25)
      println(f"RECALL ivfpq   n=$n nProbe=$nProbe rerank=$rerank%4d -> ${recallOf(ann)}%.3f")
      Pinned.release(); spark.catalog.clearCache()
    }
    // the catalog's corpus-scaled rule — SHARED with the entries, so the
    // printed rows measure exactly what the catalog runs
    val (cells, probe, rr) = graft.queries.MLQueries.annScaled(n)
    val scaled = ProductQuantization.ivfPqTopK(emb, q, 5, nCells = cells,
      nProbe = probe, rerank = rr, fitSampleFraction = 0.25)
    println(f"RECALL ivfpq-scaled n=$n nCells=$cells nProbe=$probe rerank=$rr -> ${recallOf(scaled)}%.3f")
    Pinned.release(); spark.catalog.clearCache()
    val scaledPq = ProductQuantization.pqTopK(emb, q, 5, rerank = rr,
      fitSampleFraction = 0.25)
    println(f"RECALL pq-scaled    n=$n rerank=$rr -> ${recallOf(scaledPq)}%.3f")
    spark.stop()
  }
}
