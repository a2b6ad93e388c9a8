package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryListener
import scala.collection.mutable

/** Streaming throughput SLO measurement (VERDICT r6 #6): crash-recovery of
  * the `foreachBatch` curate sink is proven in StreamingSpec; this measures
  * its SUSTAINED rate. Drives [[graft.streaming.EventStreams.incrementalDedupSink]]
  * (decontaminating curate + token-count quality gate + incremental dedup
  * against the growing stored index) from a file stream over the sf0.1
  * documents table, one file per micro-batch, and records docs/sec plus
  * per-batch latency percentiles from the StreamingQueryListener's own
  * trigger timings. `Test/runMain graft.StreamSlo [srcDir] [nBatches]`.
  */
object StreamSlo {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nBatches = args.lift(1).map(_.toInt).getOrElse(20)
    val spark = GraftSession.getOrCreate(32)

    val work = java.nio.file.Files.createTempDirectory("graft-slo").toString
    val staging = s"$work/staging"
    new java.io.File(staging).mkdirs()
    val docs = spark.read.parquet(s"$src/documents.parquet").select("doc_id", "text")
    val total = docs.count()
    // one single-file parquet per micro-batch (hash-split so batch sizes
    // are even), moved into the watched dir under a stable name
    val fs = new org.apache.hadoop.fs.Path(staging)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    (0 until nBatches).foreach { i =>
      val tmp = s"$work/tmp$i"
      docs.where(pmod(col("doc_id"), lit(nBatches)) === i)
        .coalesce(1).write.parquet(tmp)
      val part = fs.listStatus(new org.apache.hadoop.fs.Path(tmp))
        .map(_.getPath).find(_.getName.endsWith(".parquet")).get
      fs.rename(part, new org.apache.hadoop.fs.Path(f"$staging/b$i%03d.parquet"))
    }

    val progress = mutable.ArrayBuffer.empty[(Long, Long, Double)]
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit =
        synchronized {
          val p = e.progress
          if (p.numInputRows > 0)
            progress += ((p.batchId, p.numInputRows,
              p.durationMs.getOrDefault("triggerExecution", 0L).toDouble))
        }
    })

    // the full curate composition: benchmark decontamination (broadcast
    // eval shingles) then the e7 absolute quality gate (>= 20 tokens)
    val evalDocs = docs.where(col("doc_id") % 97 === 0)
      .select(col("doc_id"), col("text"))
    val curate: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame =
      b => graft.streaming.EventStreams
        .decontaminatingCurate(evalDocs, "doc_id", "text")(b)
        .where(size(graft.functions.TextFunctions.tokenize(col("text"))) >= 20)

    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1").parquet(staging)
    val t0 = System.nanoTime()
    val q = graft.streaming.EventStreams.incrementalDedupSink(
      stream, "doc_id", "text", s"$work/out", s"$work/ck", curate = curate)
    q.processAllAvailable()
    q.stop()
    val wall = (System.nanoTime() - t0) / 1e9

    val lats = progress.map(_._3).sorted
    def pct(p: Double): Double =
      if (lats.isEmpty) 0 else lats(math.min(lats.size - 1, (p * lats.size).toInt))
    // throughput counts ACTUAL docs ingested (= the split corpus), not the
    // listener's numInputRows: foreachBatch consumes the batch frame in
    // several actions, so the file source reports each re-read and
    // numInputRows over-counts by that recomputation factor
    val busy = lats.sum / 1000.0
    val kept = spark.read.parquet(s"$work/out/docs").count()
    println(f"STREAMSLO batches=${progress.size} docs_in=$total kept=$kept " +
      f"wall=$wall%.1fs busy=$busy%.1fs " +
      f"docs_per_sec_busy=${total / busy}%.1f docs_per_sec_wall=${total / wall}%.1f " +
      f"p50=${pct(0.50) / 1000}%.2fs p95=${pct(0.95) / 1000}%.2fs max=${lats.max / 1000}%.2fs")
    // per-batch trajectory: the floor must stay flat as the stored corpus
    // and index grow batch-over-batch (the ProbeAmortize floor argument)
    progress.sortBy(_._1).foreach { case (bid, _, ms) =>
      println(f"STREAMSLO batch=$bid%2d docs=${total / nBatches}%5d latency=${ms / 1000}%.2fs")
    }
    spark.stop()
  }
}
