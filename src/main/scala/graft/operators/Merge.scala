package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mutation-shaped table maintenance on an immutable engine (SURVEY §2.7
  * extension — the CDC/merge surface a production pipeline needs around
  * the reference's static RDD tables: apply a change feed onto a snapshot,
  * or historize a change feed into validity intervals).
  *
  * Both operators are one window pass over a union — no iterative driver
  * loop, no per-key lookups. At 100 TB the union shuffles once on the key
  * (same cost as any equi-join on the key) and the window computes per-key
  * in a single sort; with the snapshot and feed bucketed by the key
  * (Sink.writeBucketed) even that exchange disappears.
  */
object Merge {

  /** Latest-wins upsert: the state after applying `changes` on top of
    * `base` — per key, the row with the greatest version wins; `changes`
    * beats `base` at equal version; a winning row matching `isDelete` is a
    * tombstone and removes the key from the result.
    *
    * Determinism contract: (keyCols, versionCols) must be unique within
    * each side — equal-version duplicates within one side have no defined
    * winner (same contract as any CDC feed). Schemas must union by name.
    */
  def upsertLatest(base: DataFrame, changes: DataFrame,
                   keyCols: Seq[String], versionCols: Seq[String],
                   isDelete: Option[Column] = None): DataFrame = {
    // an empty key list would make partitionBy() a SINGLE global window
    // partition — the whole union sorted in one task, and a lone global
    // winner instead of per-key upserts (review r9)
    require(keyCols.nonEmpty, "upsertLatest needs at least one key column")
    require(versionCols.nonEmpty, "upsertLatest needs at least one version column")
    // NULL-version rows LOSE every comparison (desc = nulls last in
    // Spark): a change row with a corrupted/null version silently yields
    // to any non-null base row — refuse on the CHANGES side, where a null
    // version is a feed defect, not a decidable merge input (review r9)
    val nullVersioned = changes.filter(
      versionCols.map(col(_).isNull).reduce(_ || _)).limit(1).collect()
    require(nullVersioned.isEmpty,
      s"upsertLatest: changes contain a NULL version in (${versionCols.mkString(", ")}) — " +
        s"such a row would silently lose to any base row: ${nullVersioned.headOption.orNull}")
    // helper names must not collide with user data (a real __src column —
    // a plausible lineage tag in a CDC feed — would be silently
    // overwritten, used as the tiebreaker, and dropped from the output)
    for (c <- Seq("__src", "__rn"))
      require(!base.columns.contains(c) && !changes.columns.contains(c),
        s"input already has a $c column — rename it before merging")
    val all = base.withColumn("__src", lit(0))
      .unionByName(changes.withColumn("__src", lit(1)))
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy((versionCols.map(col(_).desc) :+ col("__src").desc): _*)
    val winners = all.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1).drop("__rn", "__src")
    isDelete.map(d => winners.where(!coalesce(d, lit(false)))).getOrElse(winners)
  }

  /** SCD2 historize: turn a versioned change feed into validity intervals —
    * each row becomes effective at its version and expires when the next
    * version of the same key arrives (`validTo` null = current row).
    * One lead() window per key; the feed itself is the history.
    */
  def scd2History(changes: DataFrame, keyCols: Seq[String],
                  versionCols: Seq[String],
                  validFrom: String = "valid_from",
                  validTo: String = "valid_to"): DataFrame = {
    require(keyCols.nonEmpty, "scd2History needs at least one key column")
    require(versionCols.nonEmpty, "scd2History needs at least one version column")
    // output interval columns must not silently destroy user data (the
    // same reserved-name convention as upsertLatest's __src/__rn — review
    // r9: a CDC extract of an SCD2 SOURCE table legitimately carries
    // valid_from/valid_to already), and the two names must differ
    require(validFrom != validTo, s"validFrom and validTo are both '$validFrom'")
    for (c <- Seq(validFrom, validTo))
      require(!changes.columns.contains(c),
        s"input already has a $c column — pass different validFrom/validTo names")
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(versionCols.map(col(_).asc): _*)
    changes
      .withColumn(validFrom, col(versionCols.head))
      .withColumn(validTo, lead(col(versionCols.head), 1).over(w))
  }
}
