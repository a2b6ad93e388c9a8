package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.{ProductQuantization, Similarity}
import graft.sources.Tables

/** Dev probe (Test/runMain graft.AnnRecallProbe [sfDir]): prints the actual
  * mean recall@5 of each catalogued ANN path with the catalog entries'
  * parameters, so the recall_ok floors pinned in the e3_ann_* oracles carry
  * a measured margin instead of a guess (VERDICT r5 #3).
  */
object AnnRecallProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = GraftSession.getOrCreate(16)
    val emb = Tables.embeddings(spark, sfDir)
    val q = emb.where(col("vec_id") < 10)
    val exact = Similarity.exactTopK(emb, q, 5).select("q_id", "n_id").cache()
    val tot = exact.count()
    def recall(name: String, ann: DataFrame): Unit = {
      val hits = ann.select("q_id", "n_id")
        .join(exact, Seq("q_id", "n_id"), "left_semi").count()
      println(f"RECALL $sfDir $name ${hits.toDouble / tot}%.3f")
    }
    recall("lsh_t16", Similarity.lshTopK(emb, q, 5, numTables = 16))
    recall("ivf_p12", Similarity.ivfTopK(emb, q, 5, nProbe = 12))
    val books = ProductQuantization.fitCodebooks(emb, 64, 8, 16, 0.25)
    val codes = emb.select(col("vec_id").as("n_id"),
      ProductQuantization.encode(col("embedding"), books).as("codes"))
    recall("pq_r48", ProductQuantization.pqTopKPrebuilt(codes, emb, q, books, 5, rerank = 48))
    recall("ivfpq_p12_r48", ProductQuantization.ivfPqTopK(emb, q, 5,
      nProbe = 12, rerank = 48, fitSampleFraction = 0.25))
    spark.stop()
  }
}
