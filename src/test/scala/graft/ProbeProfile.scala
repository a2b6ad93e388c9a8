package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.sources.IndexStore

/** Dev profiler for the e2_incremental_probe floor (VERDICT r5 #4): times
  * each phase of a stored-index probe separately so the fixed cost can be
  * attributed (plan compilation vs eager collects vs execution).
  */
object ProbeProfile {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.getOrCreate(32)
    val NumHashes = 16; val RowsPerBand = 4
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PHASE $name ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    // warmup parquet reader
    spark.read.parquet(s"$d/region.parquet").count()
    // the EXACT workload of the catalog entries — shared, not copied, so
    // a fixture change cannot silently decouple the profiler from what
    // e2_incremental_probe actually runs
    val (existing, batch) = graft.queries.DedupQueries.incrementalFixture(spark, d)
    val sigPath = s"${IndexStore.root(d)}/dedup_sig"
    val bandTable = s"graft_band_index_${IndexStore.tableTag(d)}"
    val sig = t("read_sig")(spark.read.parquet(sigPath))
    if (!spark.catalog.tableExists(bandTable)) t("rebuild_band_table") {
      spark.sql(s"DROP TABLE IF EXISTS $bandTable")
      val wh = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir") + "/" + bandTable)
      wh.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(wh, true)
      Dedup.writeBandIndex(sig, bandTable, buckets = 16, NumHashes, RowsPerBand)
    }
    val band = t("read_band")(spark.table(bandTable))
    val vetted = t("call_dedupIncremental") {
      Dedup.dedupIncremental(existing, batch, "doc_id", "text", threshold = 0.5,
        existingIndex = Some(sig), numHashes = NumHashes, rowsPerBand = RowsPerBand,
        bandIndex = Some(band))
        .select(col("doc_id"), length(col("text")).cast("long").as("text_len"))
        .orderBy("doc_id")
    }
    t("plan_compile")(vetted.queryExecution.executedPlan)
    t("execute_count")(vetted.count())
    t("execute_count_again")(vetted.count())
    graft.operators.Pinned.release()
    spark.stop()
  }
}
