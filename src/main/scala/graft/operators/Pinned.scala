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

  // a thread-local scope (see [[scoped]]) collects pins made on this thread
  // so concurrent consumers don't release each other's intermediates
  private val scope = new ThreadLocal[java.util.ArrayDeque[DataFrame]]()

  /** Persist `df` and register it for the enclosing [[scoped]] block (if
    * any on this thread) or the next global [[release]].
    */
  private[graft] def pin(df: DataFrame,
      lvl: StorageLevel = StorageLevel.MEMORY_AND_DISK): DataFrame = {
    df.persist(lvl)
    register(df)
  }

  /** Register an already-persisted frame for release. */
  private[graft] def register(df: DataFrame): DataFrame = {
    val s = scope.get()
    if (s != null) s.add(df) else pins.add(df)
    df
  }

  /** [[pin]] + force materialization NOW (one count of the persisted
    * frame). A merely-lazy persist is RACED when its consumers fan out
    * into concurrent stages of one action: AQE materializes independent
    * shuffle-map stages in parallel, and each stage's tasks recompute any
    * not-yet-cached partition of the shared upstream instead of waiting
    * for it — profiled this round (r15) as the kmv/minhash corpus
    * pipelines executing up to 6x per query. Forcing the cache costs the
    * one pass the first consumer would have paid anyway; every
    * concurrent consumer then reads blocks. Use for pins whose upstream
    * is expensive AND whose consumers meet in a single action; keep
    * plain [[pin]] where consumption is sequential (the first action
    * populates the cache for the rest).
    */
  private[graft] def pinEager(df: DataFrame,
      lvl: StorageLevel = StorageLevel.MEMORY_AND_DISK): DataFrame = {
    val p = pin(df, lvl)
    p.count()
    p
  }

  /** Run `f`, then unpersist every intermediate the graft operators pinned
    * DURING it (on this thread). Use when the result is fully consumed
    * inside the block — e.g. a foreachBatch body or a per-query harness
    * loop — and other queries may be in flight: unlike the global
    * [[release]], a scope never touches another consumer's pins.
    */
  def scoped[T](f: => T): T = {
    val prev = scope.get()
    val mine = new java.util.ArrayDeque[DataFrame]()
    scope.set(mine)
    try f
    finally {
      scope.set(prev)
      mine.forEach(d => d.unpersist(false))
    }
  }

  /** Unpersist every GLOBALLY pinned intermediate (pins made outside any
    * [[scoped]] block) since the last release. Safe to call at any time —
    * results already materialized stay correct; lazy results not yet
    * consumed recompute without the cache. Single-consumer pattern: in an
    * application with concurrent graft queries, prefer [[scoped]].
    */
  def release(blocking: Boolean = false): Unit = {
    var d = pins.poll()
    while (d != null) { d.unpersist(blocking); d = pins.poll() }
  }

  /** Number of currently-pinned global intermediates (diagnostics). */
  def pinnedCount: Int = pins.size()
}
