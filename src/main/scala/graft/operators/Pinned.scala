package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Lifecycle registry for the intermediates the operator library persists
  * on behalf of a RETURNED lazy frame (shingle tables, candidate sets,
  * component labels). Those persists must outlive the operator call — the
  * caller hasn't consumed the result yet — so the operator cannot
  * unpersist them itself; but a long-lived application must not leak
  * storage either, and `spark.catalog.clearCache()` is a sledgehammer that
  * also evicts the caller's own caches.
  *
  * Contract: consume the operator's result (write/collect/count), then
  * call [[release]]. Every intermediate pinned by any graft operator since
  * the last release is unpersisted; frames the CALLER persisted are
  * untouched. The Verify/Bench harnesses release after every query;
  * OperatorsSpec asserts no net cached blocks survive a release.
  */
object Pinned {

  private val pins = new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()

  /** Persist `df` and register it for the next [[release]]. */
  private[graft] def pin(df: DataFrame,
      lvl: StorageLevel = StorageLevel.MEMORY_AND_DISK): DataFrame = {
    df.persist(lvl)
    pins.add(df)
    df
  }

  /** Register an already-persisted frame for the next [[release]]. */
  private[graft] def register(df: DataFrame): DataFrame = {
    pins.add(df)
    df
  }

  /** Unpersist every intermediate pinned since the last release. Safe to
    * call at any time — results already materialized stay correct; lazy
    * results not yet consumed recompute without the cache.
    */
  def release(blocking: Boolean = false): Unit = {
    var d = pins.poll()
    while (d != null) { d.unpersist(blocking); d = pins.poll() }
  }

  /** Number of currently-pinned intermediates (diagnostics). */
  def pinnedCount: Int = pins.size()
}
