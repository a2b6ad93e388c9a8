package graft

import org.apache.spark.sql.functions._
import graft.operators.{Pinned, ProductQuantization, Similarity}
import graft.sources.{IndexStore, Tables}

/** Query-count amortization sweep for the ANN paths: the catalog probes
  * use |Q|=10, so this main checks the posture at |Q| = 8 / 800 / 8000
  * against a stored IVF-PQ index — exact top-k (the |Q| x corpus
  * baseline) vs the cell-pruned ADC probe. Both are linear in |Q| by
  * design; the claim under test is that (a) the probe's per-query cost
  * stays well under exact's as |Q| grows (the pruning constant survives
  * the broadcast-side growth — 8k queries x 64 floats is ~2 MB, far
  * under any broadcast limit), and (b) nothing cliffs.
  *
  * Run like ProbeAmortize: classes + test-classes + the Spark jars dir
  * on the classpath, main graft.AnnSweep, arg = fixture dir.
  */
object AnnSweep {

  /** Build-if-stale guard for the nCells=128 demo index — ONE definition
    * shared with [[C128Probe]] so the two tools can never measure
    * differently-parameterized indexes. Staleness = params mismatch OR
    * row-count mismatch (a regenerated fixture leaves the tmpdir index
    * params-valid but wrong — the r7 incident).
    */
  private[graft] def ensureC128Index(spark: org.apache.spark.sql.SparkSession,
                                     d: String,
                                     emb: org.apache.spark.sql.DataFrame): String = {
    val dir128 = s"${IndexStore.root(d)}/ivfpq_c128"
    if (!ProductQuantization.ivfPqIndexMatches(spark, dir128, nCells = 128,
        fitSampleFraction = 0.25) ||
        !ProductQuantization.indexCovers(spark, dir128, emb.count()))
      ProductQuantization.writeIvfPqIndex(emb, dir128, nCells = 128,
        fitSampleFraction = 0.25)
    dir128
  }

  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.getOrCreate(32)
    spark.read.parquet(s"$d/region.parquet").count()
    val emb = Tables.embeddings(spark, d)
    val corpusN = emb.count()
    val dir = s"${IndexStore.root(d)}/ivfpq"
    // the catalog's corpus-scaled knobs (shared rule — the sweep's
    // "catalog config" rows must measure what the entries actually run,
    // and the manifest gate must agree with the catalog's build)
    val (nCells, nProbe, rerank) = graft.queries.MLQueries.annScaled(corpusN)
    if (!ProductQuantization.ivfPqIndexMatches(spark, dir, nCells = nCells,
        fitSampleFraction = 0.25) ||
        !ProductQuantization.indexCovers(spark, dir, corpusN))
      ProductQuantization.writeIvfPqIndex(emb, dir, nCells = nCells,
        fitSampleFraction = 0.25)
    // corpus-scaled variant: nCells=128 with nProbe=48 puts the probe
    // fraction at 37.5% instead of the catalog's 75% — as far as cell
    // pruning can go on the NEAR-UNIFORM fixture while holding the 0.8
    // recall floor (r7 re-measure after a fixture regeneration: the
    // original hand-fixed nProbe=8 — 6% — read 0.44 recall on the new
    // generation; the C128-style grid gives 0.86 at 48/100 and 0.90 at
    // 64/100). Uniform random vectors are IVF's worst case — no cluster
    // structure means neighbors scatter across cells — so production
    // corpora reach far smaller fractions at the same floor; the honest
    // fixture-scale demonstration is bounded pruning WITH the floor
    // held, knobs measured not guessed (the same lesson as the r6
    // corpus-scaled catalog rule)
    val dir128 = ensureC128Index(spark, d, emb)
    for (nq <- Seq(8L, 800L, 8000L).map(math.min(_, corpusN)).distinct) {
      val q = emb.where(col("vec_id") < nq)
      def time(what: String)(f: => Long): Unit = {
        val t0 = System.nanoTime()
        val rows = f
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"ANNSWEEP nq=$nq%5d corpus=$corpusN $what rows=$rows sec=$sec%.2f ms_per_q=${sec * 1000 / nq}%.2f")
        Pinned.release(); spark.catalog.clearCache()
      }
      time("ivfpq_probe     ") {
        ProductQuantization.ivfPqProbe(spark, dir, emb, q, k = 5,
          nProbe = nProbe, rerank = rerank).count()
      }
      time("ivfpq_probe_c128") {
        ProductQuantization.ivfPqProbe(spark, dir128, emb, q, k = 5,
          nProbe = 48, rerank = 100).count()
      }
      time("exact           ") {
        Similarity.exactTopK(emb, q, 5).count()
      }
    }
    // recall check for the scaled-cells config (one |Q|, the catalog gate
    // shape): cell pruning must not silently trash quality
    val q800 = emb.where(col("vec_id") < 800)
    val rec = Similarity.recallSummary(
      ProductQuantization.ivfPqProbe(spark, dir128, emb, q800, k = 5,
        nProbe = 48, rerank = 100),
      Similarity.exactTopK(emb, q800, 5), 0.8).collect()(0)
    println(s"ANNSWEEP recall_c128 n=${rec.getLong(0)} ok=${rec.getBoolean(1)}")
    Pinned.release()
    spark.stop()
  }
}
