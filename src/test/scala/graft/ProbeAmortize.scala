package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.sources.IndexStore

/** Batch-size amortization sweep for the incremental-dedup probe: the
  * catalog's `e2_incremental_probe` floor (~3-4 s at a 28-doc batch) is
  * attributed to fixed scheduling/orchestration, with the claim that it
  * AMORTIZES at production batch sizes. This main measures that claim:
  * vet batches of n = 28 / 2,800 / 28,000 NEAR-DUP docs (90%-prefix
  * truncations — the expensive path: band probe + exact-Jaccard verify,
  * no fingerprint short-circuit) against the stored sf index and print
  * wall seconds + ms/doc. Expected shape: total grows far slower than n;
  * per-doc cost falls ~1000x across the sweep.
  *
  * Run: tools/run.sh graft.ProbeAmortize /root/testdata/sf0.1
  */
object ProbeAmortize {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.getOrCreate(32)
    val NumHashes = 16; val RowsPerBand = 4
    spark.read.parquet(s"$d/region.parquet").count() // reader warmup
    val docs = graft.sources.Tables.documents(spark, d)
    val existing = docs.select(col("doc_id"), col("text"))
    val sigPath = s"${IndexStore.root(d)}/dedup_sig"
    val bandTable = s"graft_band_index_${IndexStore.tableTag(d)}"
    if (!IndexStore.exists(spark, sigPath))
      Dedup.signatureIndex(existing, "doc_id", "text", NumHashes)
        .write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(sigPath)
    val sig = spark.read.parquet(sigPath)
    if (!spark.catalog.tableExists(bandTable)) {
      spark.sql(s"DROP TABLE IF EXISTS $bandTable")
      val wh = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir") + "/" + bandTable)
      wh.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(wh, true)
      Dedup.writeBandIndex(sig, bandTable, buckets = 16, NumHashes, RowsPerBand)
    }
    val band = spark.table(bandTable)
    val corpusN = existing.count()
    for (n <- Seq(28L, 2800L, 28000L).map(math.min(_, corpusN)).distinct) {
      // 90%-prefix near-dups of the first n corpus docs (ids shifted so
      // nothing collides): every one must survive the fingerprint
      // anti-join and take the band-probe + Jaccard-verify path
      val batch = existing.where(col("doc_id") < n)
        .select((col("doc_id") + 9000000L).as("doc_id"),
          expr("substring(text, 1, CAST(floor(length(text) * 0.9) AS INT))").as("text"))
      val t0 = System.nanoTime()
      val kept = Dedup.dedupIncremental(existing, batch, "doc_id", "text",
        threshold = 0.5, existingIndex = Some(sig),
        numHashes = NumHashes, rowsPerBand = RowsPerBand,
        bandIndex = Some(band)).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"AMORTIZE n=$n%6d corpus=$corpusN kept=$kept sec=$sec%.2f ms_per_doc=${sec * 1000 / n}%.2f")
      graft.operators.Pinned.release()
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
