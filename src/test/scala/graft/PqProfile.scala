package graft

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

/** Dev profiler for the e3_ann_pq adjudication (VERDICT r14 task #3):
  * splits the BUILD entry into its phases — codebook fit, codes
  * encode+write, probe — and times each over 3 in-JVM reps so JIT /
  * first-read effects separate from steady-state cost.
  * Usage: tools/run.sh graft.PqProfile /root/testdata/sf0.1
  */
object PqProfile {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.getOrCreate(32)
    import graft.operators.{ProductQuantization => PQ, Similarity}
    val emb = graft.sources.Tables.embeddings(spark, d)
    val q = emb.where(col("vec_id") < 10)
    val dir = s"${graft.sources.IndexStore.root(d)}/pq_profile"
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[pq] $label%-14s ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    (1 to 3).foreach { rep =>
      println(s"--- rep $rep ---")
      val books = t("fit")(PQ.fitCodebooks(emb, dim = 64, m = 8, kCodes = 16,
        fitSampleFraction = 0.25))
      t("codes-write") {
        emb.select(col("vec_id").as("n_id"),
            PQ.encode(col("embedding"), books).as("codes"))
          .write.mode(SaveMode.Overwrite).parquet(s"$dir/codes")
      }
      t("probe") {
        val rerank = math.max(48L, math.min(emb.count() / 10, 100000L)).toInt
        val ann = PQ.pqTopKPrebuilt(spark.read.parquet(s"$dir/codes"), emb, q,
          books, k = 5, rerank = rerank)
        Similarity.recallSummary(ann, Similarity.exactTopK(emb, q, k = 5), 0.8)
          .collect()
      }
    }
    spark.stop()
  }
}
