package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{broadcast, coalesce, col, count, lit, sum, when}

/** Incrementally-maintained aggregate tables over a [[ManifestStore]]
  * change feed — classic incremental view maintenance (IVM) for the
  * RETRACTABLE (abelian-group) aggregates, COUNT and SUM: an `insert`
  * change adds its contribution, a `delete` change subtracts exactly what
  * the row once added, so the maintained table advances from the CHANGES
  * alone. AVG derives downstream as sum/n; MIN/MAX are not retractable
  * without per-group full state and are deliberately absent.
  *
  * Exactly-once end to end: each tick folds the source's row-level
  * changes since the last maintained version ([[ManifestStore.readChangesSince]])
  * and commits the merged groups through ONE atomic upsert whose txn
  * watermark carries `(appId -> sourceVersion)` — a crash before the
  * commit recomputes the same deterministic deltas, a crash after it
  * no-ops inside the commit (the [[ManifestStore.appendBatch]] idempotence
  * contract, extended to upserts). The destination's watermark IS the
  * resume point; no side checkpoint exists.
  *
  * 100 TB posture: per tick the source side costs one manifest diff plus
  * a scan of exactly the CHANGED files — never the accumulated table.
  * The destination side reads only the maintained table's touched groups
  * (semi-join on the delta keys) and upserts them through the stats-pruned
  * key probe; the maintained table is |groups|-sized, not |rows|-sized.
  * Physical maintenance on the source (compaction, dv materialization)
  * streams through invisibly; a data-changing CoW rewrite refuses loudly
  * — same contracts as every feed consumer.
  *
  * Semantics notes: a group whose count retracts to zero is KEPT as an
  * `n = 0` row (the upsert protocol replaces rows, it does not delete
  * them) — read with `where(col("n") > 0)`, or purge offline with
  * `deleteWhere(dst, EqualTo("n", 0L))`. A SUM over an all-null group
  * stores 0 where SQL would say NULL — compare with `coalesce(sum, 0)`.
  * NULL group keys refuse loudly at the merge (the upsert's null-key
  * contract) — filter or sentinel them upstream. Floating-point SUMs
  * accumulate rounding exactly like any streaming aggregation (the
  * incremental addition order differs from a batch recompute's) — use
  * integer or decimal columns where bit-exactness matters.
  */
object Materialized {

  /** One maintained tick (or `ticks` of them, polling like
    * [[ManifestStore.tailStream]]): advance the grouped COUNT (+ SUMs)
    * table under `dstRoot` to the source's current version. The
    * destination schema is `keys ++ [n] ++ sumCols.map("sum_" + _)`.
    * Returns the last maintained source version.
    */
  def maintainSums(spark: SparkSession, srcRoot: String, dstRoot: String,
                   keys: Seq[String], sumCols: Seq[String] = Nil,
                   appId: String = "graft-ivm", ticks: Int = 1,
                   pollMs: Long = 1000L, maxProbeKeys: Int = 10000): Long = {
    require(keys.nonEmpty, "maintainSums needs at least one group key")
    require(ticks >= 1, s"ticks must be positive: $ticks")
    val aggNames = "n" +: sumCols.map(c => s"sum_$c")
    require(keys.intersect(aggNames).isEmpty,
      s"group keys collide with maintained column names $aggNames")
    val M = ManifestStore
    var last = M.latestSnapshot(spark, dstRoot)
      .map(_.txns.getOrElse(appId, 0L)).getOrElse(0L)
    var tick = 0
    while (tick < ticks) {
      tick += 1
      val advanced =
        if (last == 0L) M.latestSnapshot(spark, srcRoot) match {
          case Some(cur) if cur.files.nonEmpty =>
            val full = M.readWhere(spark, srcRoot, cur, Seq.empty)
            M.appendBatch(spark, grouped(full.withColumn(SignCol, lit(1L)), keys, sumCols),
              dstRoot, appId, cur.version)
            last = cur.version
            true
          case _ => false
        } else {
          val (v, changes) = M.readChangesSince(spark, srcRoot, last)
          if (v > last) {
            if (!changes.isEmpty)
              mergeChanges(spark, changes, dstRoot, keys, sumCols,
                appId, v, maxProbeKeys)
            last = v
            true
          } else false
        }
      if (!advanced && tick < ticks) Thread.sleep(pollMs)
    }
    last
  }

  /** The same maintenance under ENGINE triggers: a `changeFeed` stream of
    * the source merged per micro-batch through the txn-watermarked upsert
    * (batchId is the idempotence key — the engine's replays no-op inside
    * the commit). The FIRST batch of a fresh checkpoint is the full
    * snapshot as `insert` rows, which seeds the table through the very
    * same delta path (merging into an empty table IS the seed). Returns
    * the started query; stop it or use Trigger.AvailableNow.
    *
    * The idempotence key here is the ENGINE batch id, not the source
    * version — never share an `appId` between [[maintainSums]] ticks and
    * a streaming maintainer of the same destination (the defaults
    * differ deliberately).
    */
  def streamingMaintain(spark: SparkSession, srcRoot: String, dstRoot: String,
                        keys: Seq[String], sumCols: Seq[String] = Nil,
                        appId: String = "graft-ivm-stream",
                        checkpointLocation: String,
                        trigger: org.apache.spark.sql.streaming.Trigger =
                          org.apache.spark.sql.streaming.Trigger.AvailableNow(),
                        maxProbeKeys: Int = 10000)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    require(keys.nonEmpty, "streamingMaintain needs at least one group key")
    spark.readStream.format("graft-manifest")
      .option("changeFeed", "true").load(srcRoot)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty)
          mergeChanges(spark, batch, dstRoot, keys, sumCols,
            appId, batchId, maxProbeKeys)
      }
      .option("checkpointLocation", checkpointLocation)
      .trigger(trigger)
      .start()
  }

  /** Fold one batch of `_change_type`-tagged rows into the maintained
    * table: signed deltas per group, merged with the touched groups'
    * current values, committed as ONE txn-watermarked upsert (idempotent
    * per (appId, batchId)). Seeds a missing destination via the same
    * math against an empty table.
    */
  private def mergeChanges(spark: SparkSession, changes: DataFrame,
                           dstRoot: String, keys: Seq[String],
                           sumCols: Seq[String], appId: String,
                           batchId: Long, maxProbeKeys: Int): Unit = {
    val M = ManifestStore
    val aggNames = "n" +: sumCols.map(c => s"sum_$c")
    val signed = changes.withColumn(SignCol,
      when(col(ManifestStore.ChangeTypeCol) === "insert", 1L).otherwise(-1L))
    // |groups-touched|-sized by construction, and evaluated several times
    // below (key probe, broadcast, rewrite) — pin it so each evaluation
    // does not re-run the change-feed scan and the grouping (review r12)
    val deltaAgg = grouped(signed, keys, sumCols).persist()
    try {
    if (M.latestSnapshot(spark, dstRoot).isEmpty) {
      // first ever batch: the merge against an empty table IS the seed
      M.appendBatch(spark, deltaAgg, dstRoot, appId, batchId): Unit
      return
    }
    val dTypes = aggNames.map(n => n -> deltaAgg.schema(n).dataType).toMap
    val deltas = deltaAgg.select(keys.map(col) ++
      aggNames.map(n => col(n).as(s"__d_$n")): _*)
    // existing values of exactly the touched groups: the delta key set is
    // change-sized, so it broadcasts into a semi-join against the
    // |groups|-sized maintained table
    val touched = broadcast(deltas.select(keys.map(col): _*))
    val existing = M.read(spark, dstRoot).join(touched, keys, "left_semi")
    val merged = deltas.join(existing, keys, "left").select(
      keys.map(col) ++ aggNames.map { n =>
        (coalesce(col(n), lit(0L).cast(dTypes(n))) + col(s"__d_$n")).as(n)
      }: _*)
    val (_, _, v) = M.upsertByKey(spark, dstRoot, merged, keys,
      maxProbeKeys = maxProbeKeys, txn = Some(appId -> batchId))
    // -1 is EITHER the idempotent replay (watermark already at/past this
    // batch — fine) OR an abandonment (a concurrent rewrite of the
    // destination superseded a touched file — NOTHING committed). The two
    // must not be conflated: returning normally from an abandoned merge
    // would advance the caller past deltas that were never applied. The
    // durable watermark distinguishes them; fail the tick for retry.
    if (v == -1L) {
      val wm = M.latestSnapshot(spark, dstRoot)
        .map(_.txns.getOrElse(appId, -1L)).getOrElse(-1L)
      require(wm >= batchId,
        s"maintained merge for batch $batchId abandoned (a concurrent " +
          s"rewrite of $dstRoot superseded a touched file; watermark=$wm) " +
          "— failing the tick so it retries against the fresh state")
    }
    } finally deltaAgg.unpersist(blocking = false): Unit
  }

  private val SignCol = "__graft_ivm_sign"

  /** Grouped signed aggregates: `n = Σ sign`, `sum_c = Σ sign * c` (0,
    * not NULL, when every contribution is null — the retraction algebra
    * needs a group element, and NULL is not one).
    */
  private def grouped(signed: DataFrame, keys: Seq[String],
                      sumCols: Seq[String]): DataFrame = {
    val aggs: Seq[Column] =
      sum(col(SignCol)).as("n") +:
        sumCols.map(c => sum(col(c) * col(SignCol)).as(s"sum_$c"))
    val raw = signed.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
    sumCols.foldLeft(raw)((df, c) => df.withColumn(s"sum_$c",
      coalesce(col(s"sum_$c"), lit(0L).cast(df.schema(s"sum_$c").dataType))))
  }
}
