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
}
