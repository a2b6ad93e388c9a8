package graft.queries

/** One random token per JVM for the catalog's scratch directories: the
  * maintenance entries (o11/o12) delete-and-rebuild their scratch dir every
  * run, so two concurrent processes on the same fixture must not share one
  * path (review r9). Stable WITHIN a process so repeated runs in one
  * session reuse (and clean) the same dir.
  */
private[queries] object ProcessNonce {
  val value: String = java.lang.Long.toHexString(
    java.util.concurrent.ThreadLocalRandom.current().nextLong())

  /** Scratch path `<tmpdir>/<prefix>_<fixtureTag>_<nonce>` with the two
    * hygiene properties the per-process nonce alone lost (advice r9):
    * stale SIBLING dirs (same prefix, different nonce, mtime older than
    * `sweepAgeMs`) are swept before ours is handed out — otherwise every
    * JVM leaks one dir into tmpdir forever — and our own dir is deleted by
    * a JVM shutdown hook. The age guard keeps a live concurrent run's dir
    * safe: its files are being rewritten every catalog pass, so its mtime
    * is fresh.
    */
  def scratchDir(prefix: String, fixtureTag: String,
                 sweepAgeMs: Long = 6L * 3600 * 1000): String = {
    val tmp = new java.io.File(sys.props("java.io.tmpdir"))
    val mine = new java.io.File(tmp, s"${prefix}_${fixtureTag}_$value")
    // liveness = the NEWEST mtime anywhere in the sibling's tree, not the
    // top-level dir's: POSIX dir mtime only moves when direct children
    // are created/removed, so a long concurrent run whose writes all land
    // in nested subdirs would look idle at the top and get swept mid-run —
    // the exact race the nonce exists to prevent (advice r10; same
    // recursion as ManifestStore.vacuum's newestTouch).
    val cutoff = System.currentTimeMillis() - sweepAgeMs
    val stale = Option(tmp.listFiles()).getOrElse(Array.empty).filter { f =>
      f.isDirectory && f.getName.startsWith(prefix + "_") &&
        f.getName != mine.getName && !touchedSince(f, cutoff)
    }
    stale.foreach(deleteRecursively)
    registerCleanup(mine)
    mine.toString
  }

  /** Any mtime in the tree at/after `cutoff`? Short-circuits on the first
    * fresh entry, so probing a large LIVE sibling (the common case) is
    * O(path-to-first-fresh-file), not a full tree walk (review r11).
    */
  private def touchedSince(f: java.io.File, cutoff: Long): Boolean =
    f.lastModified() >= cutoff || (f.isDirectory &&
      Option(f.listFiles()).getOrElse(Array.empty[java.io.File])
        .exists(touchedSince(_, cutoff)))

  private val cleanupRegistered =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  private def registerCleanup(dir: java.io.File): Unit =
    if (cleanupRegistered.add(dir.getAbsolutePath))
      Runtime.getRuntime.addShutdownHook(new Thread(() => deleteRecursively(dir)))

  private def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory)
      Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRecursively)
    f.delete(): Unit
  }
}
