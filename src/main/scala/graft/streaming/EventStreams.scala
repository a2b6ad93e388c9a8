package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Structured-Streaming surface (SURVEY E6): the same window expressions
  * power the batch-parity queries in EventQueries and the streaming tests
  * (MemoryStream in EventStreamsSpec) — one definition, two execution modes,
  * which is exactly how Structured Streaming is meant to be used.
  *
  * Scale: streaming aggs shuffle on (group, window); watermarks bound state.
  * At 100 TB/day the same code runs with kafka sources — nothing here is
  * local-mode-specific.
  */
object EventStreams {

  /** Tumbling 1-hour counts+sums per event type. `withEventTimeWatermark`
    * must be applied by the caller for streaming inputs.
    */
  def tumblingAgg(events: DataFrame): DataFrame =
    events
      .groupBy(col("event_type"), window(col("ts"), "1 hour").as("w"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(14, 2))).cast("double").as("total"))
      .select(col("event_type"), col("w.start").as("win_start"), col("n"), col("total"))

  /** Sliding 1h/30min counts per event type. */
  def slidingAgg(events: DataFrame): DataFrame =
    events
      .groupBy(col("event_type"), window(col("ts"), "1 hour", "30 minutes").as("w"))
      .agg(count(lit(1)).as("n"))
      .select(col("event_type"), col("w.start").as("win_start"), col("n"))

  /** Session windows (10-minute gap) per user. */
  def sessionAgg(events: DataFrame): DataFrame =
    events
      .groupBy(session_window(col("ts"), "10 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"), col("w.start").as("session_start"), col("n"))

  /** Streaming wrapper: 10-minute watermark for late data, then tumbling agg. */
  def streamingTumbling(stream: DataFrame): DataFrame =
    tumblingAgg(stream.withWatermark("ts", "10 minutes"))

  /** Streaming dedup by event_id within the watermark horizon. */
  def streamingDedup(stream: DataFrame): DataFrame =
    stream.withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")

  /** Continual-ingest dedup sink: each micro-batch of documents is vetted
    * against the clean corpus accumulated so far (Dedup.dedupIncremental —
    * exact fingerprints + MinHash-LSH) and only survivors land in
    * `outDir/docs` — the streaming composition the incremental
    * signature-index story exists for. The signature index is MAINTAINED
    * at `outDir/index` from the signatures already computed during vetting
    * (dedupIncrementalWithIndex), so no round re-tokenizes or re-hashes
    * the accumulated corpus. Earlier batches always win against later
    * ones, so with ingest-ordered ids the result equals running the batch
    * dedup over the full corpus at once (asserted in StreamingSpec).
    *
    * Replay-idempotent by construction: every write goes to a
    * `batch=<id>` partition directory in OVERWRITE mode, and both reads
    * exclude the current batch id — so a batch replayed after a crash at
    * ANY point (between the two writes, or after both but before the
    * checkpoint commit) recomputes against exactly the state its first
    * attempt saw and overwrites the same directories with the same rows.
    * A pre-existing external corpus at outDir/docs (no index yet) is
    * bootstrapped once: its files move into the sink's `batch=-1`
    * partition directory (a metadata-only rename) and a full index builds
    * under `index/batch=-1` — after that, every batch is index-only. The
    * sink owns outDir's layout from then on.
    */
  def incrementalDedupSink(docs: DataFrame, idCol: String, textCol: String,
                           outDir: String, checkpointDir: String,
                           threshold: Double = 0.5)
  : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, bid: Long) =>
        val spark = batch.sparkSession
        val incoming = batch.select(idCol, textCol)
        // explicit existence probes: catching AnalysisException instead
        // would also swallow real read failures (schema drift, listing
        // errors) and silently disable dedup
        val hconf = spark.sparkContext.hadoopConfiguration
        val docsPath = new org.apache.hadoop.fs.Path(s"$outDir/docs")
        val idxPath = new org.apache.hadoop.fs.Path(s"$outDir/index")
        val fs = docsPath.getFileSystem(hconf)
        // bootstrap an externally-created corpus: loose files would break
        // partition discovery next to batch=N dirs, so move them (metadata-
        // only rename) into the sink's batch=-1 partition first
        if (fs.exists(docsPath)) {
          val loose = fs.listStatus(docsPath)
            .filterNot(_.getPath.getName.startsWith("batch="))
          if (loose.nonEmpty) {
            val boot = new org.apache.hadoop.fs.Path(docsPath, "batch=-1")
            fs.mkdirs(boot)
            loose.foreach(e => fs.rename(e.getPath,
              new org.apache.hadoop.fs.Path(boot, e.getPath.getName)))
          }
        }
        def withoutThisBatch(df: org.apache.spark.sql.DataFrame) =
          if (df.columns.contains("batch")) df.where(col("batch") =!= bid) else df
        val existing =
          if (fs.exists(docsPath))
            withoutThisBatch(spark.read.parquet(s"$outDir/docs")).select(idCol, textCol)
          else spark.createDataFrame(
            spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], incoming.schema)
        if (fs.exists(docsPath) && !fs.exists(idxPath)) {
          // one-time O(corpus) index build for the bootstrapped corpus;
          // every later batch maintains the index incrementally
          graft.operators.Dedup.signatureIndex(existing, idCol, textCol)
            .write.mode("overwrite").parquet(s"$outDir/index/batch=-1")
        }
        val storedIndex =
          if (fs.exists(idxPath))
            Some(withoutThisBatch(spark.read.parquet(s"$outDir/index")))
          else None
        // scoped: concurrent streams/queries in the same session must not
        // release each other's pinned intermediates
        graft.operators.Pinned.scoped {
          val (kept, keptIndex) = graft.operators.Dedup.dedupIncrementalWithIndex(
            existing, incoming, idCol, textCol, threshold, existingIndex = storedIndex)
          kept.write.mode("overwrite").parquet(s"$outDir/docs/batch=$bid")
          keptIndex.write.mode("overwrite").parquet(s"$outDir/index/batch=$bid")
        }
      }
      .start()

  final case class UserRunning(user_id: Long, events: Long, total: Double)

  /** Custom keyed state (flatMapGroupsWithState surface): cumulative
    * per-user counters maintained across micro-batches — the shape every
    * "custom state machine" streaming op takes. Works identically over a
    * bounded Dataset (one group pass) for batch parity.
    */
  def runningUserTotals(events: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row])
  : org.apache.spark.sql.Dataset[UserRunning] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import events.sparkSession.implicits._
    val typed = events.select(col("user_id").cast("long"), col("value").cast("double"))
      .as[(Long, Double)]
    typed.groupByKey(_._1)
      .flatMapGroupsWithState[UserRunning, UserRunning](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        case (uid, rows, state: GroupState[UserRunning]) =>
          val prev = state.getOption.getOrElse(UserRunning(uid, 0L, 0.0))
          var n = prev.events
          var t = prev.total
          rows.foreach { case (_, v) => n += 1; t += v }
          val next = UserRunning(uid, n, t)
          state.update(next)
          Iterator(next)
      }
  }
}
