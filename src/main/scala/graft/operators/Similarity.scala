package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions.hash32
import graft.functions.VectorFunctions._

/** Similarity search over embedding columns (SURVEY E3).
  *
  * Two paths, selected by scale:
  *  - exactTopK: brute-force cosine of a (small, broadcast) query set
  *    against the corpus — the corpus side streams through one scan, never
  *    shuffles; per-query top-k via window. Right answer for |Q| small.
  *  - lshTopK: random-hyperplane LSH — corpus and queries are bucketed by
  *    the sign-bit signature of K deterministic hyperplanes; candidates
  *    meet in a bucket equi-join (shuffle on the signature, per-bucket
  *    work only), then exact cosine re-ranks. This is the 100 TB path:
  *    cost ~ corpus_size + bucket_collisions, not |Q| x corpus.
  *    Hyperplanes are derived from md5 (portable, seed-free determinism).
  */
object Similarity {

  /** Exact top-k cosine neighbors for each query vector. */
  def exactTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val scored = corpus.join(broadcast(q), col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("n_id"),
        cosine(col("q_emb"), col("embedding")).as("cos_sim"))
    val w = Window.partitionBy("q_id").orderBy(col("cos_sim").desc, col("n_id"))
    scored.withColumn("rnk", row_number().over(w)).where(col("rnk") <= k)
  }

  /** Deterministic pseudo-random hyperplane component in [-1, 1):
    * plane `p`, dimension `i`, derived from md5 — no RNG, no seed drift.
    */
  private def planeComponent(p: Int, i: Int) =
    hash32(concat_ws("_", lit("plane"), lit(p), lit(i))).cast("double") / 2147483648.0 - 1.0

  /** Sign-bit LSH signature of an embedding under `numPlanes` hyperplanes. */
  def lshSignature(emb: org.apache.spark.sql.Column, dim: Int, numPlanes: Int) = {
    val bits = (0 until numPlanes).map { p =>
      val dot = (0 until dim).map(i =>
        element_at(emb, i + 1).cast("double") * planeComponent(p, i)).reduce(_ + _)
      when(dot >= 0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** ANN via LSH buckets + exact re-rank. Falls back to fewer than k results
    * for queries whose bucket has too few collisions (standard LSH recall
    * trade-off; raise numPlanes' band count or multi-probe to trade cost
    * for recall).
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              dim: Int = 64, numPlanes: Int = 8): DataFrame = {
    val sig = lshSignature(col("embedding"), dim, numPlanes)
    val c = corpus.select(col("vec_id").as("n_id"), col("embedding").as("n_emb"),
      sig.as("bucket"))
    val q = queries.select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
      sig.as("bucket"))
    val cand = c.join(q, "bucket").where(col("n_id") =!= col("q_id"))
      .select(col("q_id"), col("n_id"),
        cosine(col("q_emb"), col("n_emb")).as("cos_sim"))
    val w = Window.partitionBy("q_id").orderBy(col("cos_sim").desc, col("n_id"))
    cand.withColumn("rnk", row_number().over(w)).where(col("rnk") <= k)
  }
}
