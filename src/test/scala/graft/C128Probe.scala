package graft

import org.apache.spark.sql.functions._
import graft.operators.{Pinned, ProductQuantization, Similarity}
import graft.sources.Tables

/** One-off dev probe: recall@5 of the nCells=128 production-posture index
  * across an (nProbe, rerank) grid, to re-margin the AnnSweep claim.
  */
object C128Probe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.getOrCreate(32)
    import spark.implicits._
    val emb = Tables.embeddings(spark, d)
    // shared guard — the probe must grid-measure the SAME index the
    // sweep gates on (params + row-count staleness in one place)
    val dir128 = AnnSweep.ensureC128Index(spark, d, emb)
    val q = emb.where(col("vec_id") < 800)
    val exact = Similarity.exactTopK(emb, q, 5)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    for (nProbe <- Seq(32, 40, 48, 64); rerank <- Seq(48, 100)) {
      val got = ProductQuantization.ivfPqProbe(spark, dir128, emb, q, k = 5,
        nProbe = nProbe, rerank = rerank)
        .select("q_id", "n_id").as[(Long, Long)].collect().toSet
      println(f"C128 nProbe=$nProbe%2d rerank=$rerank%3d recall=${(exact & got).size.toDouble / exact.size}%.3f")
      Pinned.release(); spark.catalog.clearCache()
    }
    spark.stop()
  }
}
