package graft.sources

import java.nio.charset.StandardCharsets
import java.util.UUID

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Manifest-committed parquet table — the OBJECT-STORE answer to the
  * rename-swap compaction in [[Sink]] (whose `requireAtomicRename` refuses
  * s3a/gs/wasb up front). Same public pattern as Delta/Iceberg commit
  * logs, reduced to the minimum the engine needs:
  *
  *  - **Readers never list data directories.** A snapshot is exactly the
  *    file list in the highest INTACT manifest under `_manifests/`; files
  *    a crashed or in-flight writer left behind are invisible because no
  *    manifest references them.
  *  - **Writers never rename.** Each append writes its parquet to a fresh
  *    `data/batch-<uuid>/` directory (single-writer, collision-free), then
  *    commits a new manifest version referencing those files in place.
  *    A crash before commit leaves an unreferenced directory that
  *    [[vacuum]] collects; a crash after commit is a completed write.
  *  - **Commits are atomic via create-exclusive**, not rename.
  *    Concurrent committers race for the next version number; the loser
  *    REBASES onto the winner's snapshot and retries (appends union their
  *    files in; compactions re-apply replace-only-what-I-read, or ABANDON
  *    when their inputs were already replaced), so no committed write is
  *    ever lost — optimistic concurrency, the object-store replacement
  *    for the swap protocol's single-writer contract.
  *  - **Torn manifests are detectable, not trusted**: the last line is an
  *    md5 of everything above it, so a reader seeing a half-written
  *    manifest falls back to the previous intact version. Because a torn
  *    slot can be a committer that is still WRITING (create and close are
  *    not one atomic step on a real filesystem), torn slots above the
  *    intact head get a GRACE window keyed on their mtime: committers
  *    wait for a young torn slot to either become intact or age out
  *    before building past it — without the wait, a slow writer's
  *    committed version could be silently orphaned by the next commit.
  *
  * '''Commit-point contract''': `FileSystem.create(path, overwrite=false)`
  * must atomically fail on an existing path. HDFS provides this natively.
  * The local filesystem's Hadoop `create` is check-then-act, so the
  * `file:` scheme is special-cased through `File.createNewFile()` (POSIX
  * `O_CREAT|O_EXCL`, atomic) — which also makes single-box multi-threaded
  * use sound. Object stores map the claim to a conditional PUT
  * (If-None-Match); that requires a connector that actually implements it
  * (e.g. Hadoop 3.4.1+ s3a conditional create) — on a connector whose
  * create is a HEAD-then-PUT race, commits can be lost, mirroring exactly
  * the rename caveat [[Sink.requireAtomicRename]] documents. Verify the
  * connector before pointing this store at a bucket.
  *
  * Compaction here is [[compact]]: read the current snapshot, rewrite it
  * into ~targetFileBytes files (same narrow packing scan as
  * [[Sink.compactParquet]]), commit a manifest that references only the
  * new files. Old files stay on disk for in-flight readers of older
  * snapshots (time travel via [[readVersion]] is free) until [[vacuum]]
  * drops everything unreferenced by the kept versions and older than a
  * safety age (keyed on the files INSIDE a batch directory — object
  * stores report synthetic mtimes for directory markers).
  *
  * 100 TB posture: the manifest holds one line per live FILE (at the
  * 128 MB target that is ~8k lines per PB — a driver-side text file, fine
  * up to millions of files); data bytes move only when compaction
  * rewrites them, never for a commit; reads prune to exactly the listed
  * files with no LIST-under-prefix race. Reference analog: the engine's
  * ingest utilities stage whole datasets (chapter2/DataUtilities.java:33-89);
  * this is the curated-output side of that pipeline at scale.
  */
object ManifestStore {

  final case class ManifestEntry(path: String, bytes: Long)

  /** `txns` carries the highest committed batch id per streaming writer
    * (appId): foreachBatch delivery is at-least-once, so a retried
    * micro-batch must be detectable AT THE COMMIT, not by the caller —
    * the same public idempotent-writes pattern as Delta's txnAppId/
    * txnVersion. Compactions and plain appends preserve the map.
    */
  final case class Snapshot(version: Long, files: Seq[ManifestEntry],
                            txns: Map[String, Long] = Map.empty)

  private val Header = "graft-manifest v1"
  private def manifestsDir(root: Path) = new Path(root, "_manifests")
  private def dataDir(root: Path) = new Path(root, "data")
  private def manifestPath(root: Path, v: Long) =
    new Path(manifestsDir(root), f"v$v%020d.manifest")
  private val ManifestName = """^v(\d{20})\.manifest$""".r

  private def fsFor(spark: SparkSession, root: String): (FileSystem, Path) = {
    val p = new Path(root)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    (fs, fs.makeQualified(p))
  }

  private def render(s: Snapshot): Array[Byte] = {
    val body = new StringBuilder
    body.append(Header).append('\n')
    body.append("version=").append(s.version).append('\n')
    s.txns.toSeq.sortBy(_._1).foreach { case (appId, batchId) =>
      require(!appId.contains('\n') && !appId.contains('\t') && appId.nonEmpty,
        s"appId not manifest-safe: '$appId'")
      body.append("txn=").append(appId).append('\t').append(batchId).append('\n')
    }
    s.files.foreach { f =>
      require(!f.path.contains('\n') && !f.path.contains('\t'),
        s"file path not manifest-safe: ${f.path}")
      // file paths are URIs (scheme-prefixed), so the txn= marker cannot
      // collide — enforced rather than assumed
      require(!f.path.startsWith("txn="), s"file path collides with txn marker: ${f.path}")
      body.append(f.path).append('\t').append(f.bytes).append('\n')
    }
    val bodyStr = body.toString
    val sum = org.apache.commons.codec.digest.DigestUtils.md5Hex(
      bodyStr.getBytes(StandardCharsets.UTF_8))
    (bodyStr + s"checksum=$sum\n").getBytes(StandardCharsets.UTF_8)
  }

  /** Parse a manifest; None when torn/corrupt (bad header, bad checksum,
    * version mismatch with its file name) — callers treat that version
    * slot as not (yet) committed.
    */
  private def parse(bytes: Array[Byte], expectVersion: Long): Option[Snapshot] =
    try parseStrict(bytes, expectVersion)
    catch { case _: NumberFormatException => None }

  private def parseStrict(bytes: Array[Byte], expectVersion: Long): Option[Snapshot] = {
    val text = new String(bytes, StandardCharsets.UTF_8)
    val ck = text.lastIndexOf("checksum=")
    if (ck < 0 || !text.endsWith("\n")) return None
    val body = text.substring(0, ck)
    val sum = text.substring(ck + "checksum=".length).trim
    if (org.apache.commons.codec.digest.DigestUtils.md5Hex(
        body.getBytes(StandardCharsets.UTF_8)) != sum) return None
    val lines = body.split("\n", -1).toSeq.dropRight(1) // trailing ""
    if (lines.isEmpty || lines.head != Header) return None
    val v = lines.lift(1).collect { case s if s.startsWith("version=") =>
      s.stripPrefix("version=").toLong }
    if (!v.contains(expectVersion)) return None
    val (txnLines, fileLines) = lines.drop(2).partition(_.startsWith("txn="))
    val txns = txnLines.map { l =>
      val i = l.lastIndexOf('\t')
      if (i <= 0) return None
      l.substring("txn=".length, i) -> l.substring(i + 1).toLong
    }.toMap
    val files = fileLines.map { l =>
      val i = l.lastIndexOf('\t')
      if (i <= 0) return None
      ManifestEntry(l.substring(0, i), l.substring(i + 1).toLong)
    }
    Some(Snapshot(expectVersion, files, txns))
  }

  private def listVersions(fs: FileSystem, root: Path): Seq[Long] = {
    val dir = manifestsDir(root)
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq.flatMap(s => s.getPath.getName match {
      case ManifestName(d) => Some(d.toLong)
      case _ => None
    }).sorted
  }

  /** Highest intact snapshot, or None for an empty/uninitialized table.
    * Torn versions (crashed or in-flight committers) are skipped, never
    * trusted.
    */
  def latestSnapshot(spark: SparkSession, root: String): Option[Snapshot] = {
    val (fs, rootP) = fsFor(spark, root)
    latestIntact(fs, rootP, listVersions(fs, rootP))
  }

  private def latestIntact(fs: FileSystem, root: Path,
                           versions: Seq[Long]): Option[Snapshot] =
    versions.reverse.iterator.flatMap(v => readManifest(fs, root, v)).nextOption()

  private def readManifest(fs: FileSystem, root: Path, v: Long): Option[Snapshot] = {
    val p = manifestPath(root, v)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val bytes = try {
        val out = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](8192)
        var n = in.read(buf)
        while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
        out.toByteArray
      } finally in.close()
      parse(bytes, v)
    }
  }

  /** Atomically claim version `v` with the given snapshot content. False
    * when the slot is already taken (another committer won the race).
    * The `file:` scheme claims via `File.createNewFile` (POSIX O_EXCL —
    * Hadoop's local `create(overwrite=false)` is check-then-act and would
    * race); everywhere else `FileSystem.create(p, false)` is the claim
    * (atomic on HDFS; a conditional PUT on capable object-store
    * connectors — see the class contract).
    */
  private def tryCommit(fs: FileSystem, root: Path, s: Snapshot): Boolean = {
    fs.mkdirs(manifestsDir(root))
    val p = manifestPath(root, s.version)
    if ("file".equalsIgnoreCase(fs.getUri.getScheme)) {
      val local = new java.io.File(p.toUri.getPath)
      if (!local.createNewFile()) return false // atomic O_EXCL claim
      val out = new java.io.FileOutputStream(local)
      try out.write(render(s)) finally out.close()
      true
    } else {
      // a lost race surfaces differently per connector: HDFS throws
      // FileAlreadyExistsException, some connectors PathExistsException,
      // and a conditional-PUT 412 can arrive as a plain IOException — in
      // that last case probe the path: if it now exists, the slot was
      // taken (rebase-retry), otherwise it is a genuine I/O failure
      val out = try fs.create(p, false)
      catch {
        case _: org.apache.hadoop.fs.FileAlreadyExistsException => return false
        case _: org.apache.hadoop.fs.PathExistsException => return false
        case e: java.io.IOException =>
          if (try fs.exists(p) catch { case _: java.io.IOException => false })
            return false
          else throw e
      }
      try { out.write(render(s)); true } finally out.close()
    }
  }

  /** Stage `df` as a fresh immutable batch directory; returns the manifest
    * entries of its data files. Shared by append and compact so "what
    * counts as a committed data file" has exactly one definition.
    */
  private def writeBatch(fs: FileSystem, root: Path, df: DataFrame): Seq[ManifestEntry] = {
    val batch = new Path(dataDir(root), s"batch-${UUID.randomUUID()}")
    df.write.mode(SaveMode.ErrorIfExists).parquet(batch.toString)
    fs.listStatus(batch).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .map(s => ManifestEntry(s.getPath.toUri.toString, s.getLen))
  }

  /** Write `df` as a new batch and commit it appended to the latest
    * snapshot. Returns the committed version. An input that produces no
    * data files (a zero-partition empty frame) is a NO-OP returning the
    * current version (0 for an uninitialized table) — committing an
    * empty manifest would make the table unreadable. Safe under
    * concurrent appends/compactions: on a lost race the commit rebases
    * onto the winner (its own data files are untouched and still valid)
    * and retries.
    */
  def append(spark: SparkSession, df: DataFrame, root: String,
             maxRetries: Int = 10, tornGraceMs: Long = 60000L): Long = {
    val (fs, rootP) = fsFor(spark, root)
    requireCompatibleSchema(spark, df, root)
    val mine = writeBatch(fs, rootP, df)
    if (mine.isEmpty)
      return latestSnapshot(spark, root).map(_.version).getOrElse(0L)
    commitWithRebase(fs, rootP, maxRetries, tornGraceMs) { base =>
      Some(Snapshot(0L, base.map(_.files).getOrElse(Seq.empty) ++ mine,
        base.map(_.txns).getOrElse(Map.empty)))
    }
  }

  /** Idempotent streaming append — the foreachBatch sink primitive.
    * Structured Streaming delivers micro-batches AT-LEAST-ONCE after a
    * failure, so the sink must make the redelivered (appId, batchId)
    * commit a no-op: the snapshot's txn watermark for `appId` is checked
    * INSIDE the same atomic commit that adds the files, so a retry can
    * never double the batch even racing other writers. Returns the
    * committed version, or the current version when the batch was already
    * committed (the retry case). Batch ids must be monotonically
    * increasing per appId — exactly what foreachBatch provides.
    *
    * Usage: `stream.writeStream.foreachBatch { (df, id) =>
    *   ManifestStore.appendBatch(spark, df, root, "my-sink", id) }`.
    */
  def appendBatch(spark: SparkSession, df: DataFrame, root: String,
                  appId: String, batchId: Long,
                  maxRetries: Int = 10, tornGraceMs: Long = 60000L): Long = {
    val (fs, rootP) = fsFor(spark, root)
    // cheap pre-check: skip the batch WRITE too on an obvious redelivery
    // (the authoritative check remains inside the commit)
    val pre = latestSnapshot(spark, root)
    if (pre.exists(_.txns.getOrElse(appId, -1L) >= batchId))
      return pre.get.version
    requireCompatibleSchema(spark, df, root)
    val mine = writeBatch(fs, rootP, df)
    val v = commitWithRebase(fs, rootP, maxRetries, tornGraceMs) { base =>
      val txns = base.map(_.txns).getOrElse(Map.empty)
      if (txns.getOrElse(appId, -1L) >= batchId) None // lost race to our own retry
      else Some(Snapshot(0L,
        base.map(_.files).getOrElse(Seq.empty) ++ mine,
        txns + (appId -> batchId)))
    }
    if (v == -1L) // already committed concurrently: report the live version
      latestSnapshot(spark, root).map(_.version).getOrElse(0L)
    else v
  }

  /** A batch whose schema disagrees with the table commits fine but
    * poisons every later read (missing columns silently null, changed
    * types fail mid-scan far from the writer) — refuse at the append,
    * where the cause is nameable. Compatibility = same (name -> type)
    * set, order-insensitive, nullability-insensitive (parquet unions by
    * name on read). Cost: one footer-only schema read of ONE live file
    * per append; skipped on an empty table (its first append DEFINES the
    * schema).
    */
  private def requireCompatibleSchema(spark: SparkSession, df: DataFrame,
                                      root: String): Unit =
    latestSnapshot(spark, root).filter(_.files.nonEmpty).foreach { snap =>
      val existing = spark.read.parquet(snap.files.head.path).schema
      // nullability is normalized RECURSIVELY: DataType equality includes
      // nested containsNull/valueContainsNull/field nullability, and a
      // literal-built frame often differs from a source-read one in
      // exactly those bits — refusing such an append would block a
      // logically-identical pipeline (advice r9)
      def shape(st: org.apache.spark.sql.types.StructType) =
        st.fields.map(f => f.name -> normalizeNullability(f.dataType)).toMap
      require(shape(df.schema) == shape(existing),
        s"appendBatch/append: batch schema ${df.schema.simpleString} is not " +
          s"compatible with the table's ${existing.simpleString} under $root — " +
          "a mismatched commit would poison every later read")
    }

  /** All nested nullability bits forced true, so two types that differ
    * ONLY in containsNull/valueContainsNull/field-nullable compare equal
    * (`DataType.asNullable` is private[spark] — this is its public twin).
    */
  private def normalizeNullability(dt: org.apache.spark.sql.types.DataType)
      : org.apache.spark.sql.types.DataType = {
    import org.apache.spark.sql.types._
    dt match {
      case ArrayType(et, _) => ArrayType(normalizeNullability(et), containsNull = true)
      case MapType(kt, vt, _) =>
        MapType(normalizeNullability(kt), normalizeNullability(vt), valueContainsNull = true)
      case StructType(fields) => StructType(fields.map(f =>
        f.copy(dataType = normalizeNullability(f.dataType), nullable = true)))
      case other => other
    }
  }

  /** Rebase-and-retry commit loop shared by append/compact. `build`
    * returns None to ABANDON the commit against the given base (e.g. a
    * compaction whose inputs another compactor already replaced) —
    * reported as -1.
    *
    * The base snapshot and the claimed slot derive from ONE listing: the
    * slot is strictly above every version that listing saw, so a commit
    * landing between listing and claim occupies our slot and the
    * create-exclusive collides — we rebase and retry, never silently
    * drop the interleaved commit. Torn slots above the intact head are
    * handled by [[awaitTornSlots]] before each attempt.
    */
  private def commitWithRebase(fs: FileSystem, root: Path, maxRetries: Int,
                               tornGraceMs: Long)
                              (build: Option[Snapshot] => Option[Snapshot]): Long = {
    var attempt = 0
    while (attempt <= maxRetries) {
      val versions = awaitTornSlots(fs, root, tornGraceMs)
      val base = latestIntact(fs, root, versions)
      val next = (versions :+ 0L).max + 1
      build(base) match {
        case None => return -1L
        case Some(snap) => if (tryCommit(fs, root, snap.copy(version = next))) return next
      }
      attempt += 1
    }
    throw new java.io.IOException(
      s"manifest commit lost ${maxRetries + 1} consecutive races under $root — " +
        "a pathologically hot table; back off and retry")
  }

  /** Wait for torn slots above the intact head to become intact or age
    * past `tornGraceMs` (by slot mtime). A torn slot may be a committer
    * mid-write: building past it and winning the NEXT slot would orphan
    * its commit the moment it completes — told "committed", referenced by
    * no later snapshot. A slot still torn after the grace is a crashed
    * committer (its caller never got a success), dead forever. Returns
    * the final listing. A committer that takes longer than the grace to
    * flush its manifest bytes can still be orphaned — size the grace to
    * dwarf a small-file write (default 60 s), not to zero.
    */
  private def awaitTornSlots(fs: FileSystem, root: Path,
                             tornGraceMs: Long): Seq[Long] = {
    while (true) {
      val versions = listVersions(fs, root)
      val headV = latestIntact(fs, root, versions).map(_.version).getOrElse(0L)
      val youngTorn = versions.filter(_ > headV).flatMap { v =>
        try {
          val st = fs.getFileStatus(manifestPath(root, v))
          val age = System.currentTimeMillis() - st.getModificationTime
          if (age < tornGraceMs) Some(tornGraceMs - age) else None
        } catch { case _: java.io.FileNotFoundException => None }
      }
      if (youngTorn.isEmpty) return versions
      Thread.sleep(math.min(youngTorn.max, 200L))
    }
    sys.error("unreachable")
  }

  /** DataFrame over the latest snapshot (fails loudly when the table has
    * no committed version — callers create tables via [[append]]).
    */
  def read(spark: SparkSession, root: String): DataFrame =
    readSnapshot(spark, root,
      latestSnapshot(spark, root).getOrElse(
        throw new java.util.NoSuchElementException(
          s"no committed manifest under $root")))

  /** Time travel: the exact file set of version `v` (intact manifests are
    * immutable, so this read is stable while the files survive [[vacuum]]).
    */
  def readVersion(spark: SparkSession, root: String, v: Long): DataFrame = {
    val (fs, rootP) = fsFor(spark, root)
    readSnapshot(spark, root, readManifest(fs, rootP, v).getOrElse(
      throw new java.util.NoSuchElementException(
        s"no intact manifest v$v under $root")))
  }

  private def readSnapshot(spark: SparkSession, root: String,
                           snap: Snapshot): DataFrame = {
    if (snap.files.isEmpty)
      throw new java.util.NoSuchElementException(
        s"manifest v${snap.version} under $root references no files")
    spark.read.parquet(snap.files.map(_.path): _*)
  }

  /** Rewrite the CURRENT snapshot into ~targetFileBytes files and commit
    * the compacted file list as a new version. Returns
    * (filesBefore, filesAfter, committedVersion). Concurrent appends are
    * preserved: if one lands between our snapshot read and our commit, the
    * rebase keeps its files and swaps out only the files we actually
    * rewrote. If a concurrent COMPACTION already replaced any of our input
    * files, committing our copy too would double the rows — the commit is
    * abandoned instead (version -1; the orphaned rewrite directory is
    * [[vacuum]] food). Old files remain on disk for older-version readers
    * until [[vacuum]].
    */
  def compact(spark: SparkSession, root: String,
              targetFileBytes: Long = 128L << 20,
              maxRetries: Int = 10): (Int, Int, Long) = {
    val before = latestSnapshot(spark, root).getOrElse(
      throw new java.util.NoSuchElementException(s"no committed manifest under $root"))
    compactFrom(spark, root, before, targetFileBytes, maxRetries)
  }

  /** [[compact]] against an explicit base snapshot — the test seam for the
    * stale-inputs abandonment path (a second compactor holding a snapshot
    * the first already replaced).
    */
  private[graft] def compactFrom(spark: SparkSession, root: String,
                                 before: Snapshot, targetFileBytes: Long,
                                 maxRetries: Int = 10,
                                 tornGraceMs: Long = 60000L): (Int, Int, Long) = {
    require(targetFileBytes > 0, s"targetFileBytes must be positive: $targetFileBytes")
    val (fs, rootP) = fsFor(spark, root)
    if (before.files.isEmpty)
      return (0, 0, before.version)
    val rewrote = before.files.map(_.path).toSet
    // same packing scan as Sink.compactParquet (shared scopedSession):
    // maxPartitionBytes = target, open cost zeroed — a narrow,
    // shuffle-free merge of the snapshot
    val scoped = Sink.scopedSession(spark, targetFileBytes)
    val mine = writeBatch(fs, rootP,
      scoped.read.parquet(rewrote.toSeq.sorted: _*))
    if (mine.isEmpty) // zero-row snapshot: nothing to commit, keep the base
      return (before.files.size, before.files.size, before.version)
    val v = commitWithRebase(fs, rootP, maxRetries, tornGraceMs) { base =>
      val baseFiles = base.map(_.files).getOrElse(Seq.empty)
      val present = baseFiles.map(_.path).toSet
      if (rewrote.exists(p => !present(p))) None // inputs already replaced
      else Some(Snapshot(0L, baseFiles.filterNot(f => rewrote(f.path)) ++ mine,
        base.map(_.txns).getOrElse(Map.empty))) // txn watermarks survive compaction
    }
    (before.files.size, mine.size, v)
  }

  /** Drop data unreferenced by the newest `keepVersions` intact manifests
    * AND older than `minAgeMs` — age is the max of the batch directory's
    * own mtime and its FILES' mtimes (object stores report synthetic
    * times on directory markers; a writer mid-upload always has fresh
    * files). Also prunes manifest files older than the kept set. Returns
    * the number of batch directories deleted.
    */
  def vacuum(spark: SparkSession, root: String, keepVersions: Int = 2,
             minAgeMs: Long = 24L * 3600 * 1000): Int = {
    require(keepVersions >= 1, "must keep at least the latest version")
    val (fs, rootP) = fsFor(spark, root)
    val versions = listVersions(fs, rootP)
    val kept = versions.reverse.iterator
      .flatMap(v => readManifest(fs, rootP, v)).take(keepVersions).toSeq
    if (kept.isEmpty) return 0
    // compare scheme/authority-STRIPPED paths: a Path parsed from a
    // manifest string carries a null URI authority ("file:/x") while
    // listStatus returns an empty one ("file:///x") — raw-URI comparison
    // would read every live directory as unreferenced and vacuum the
    // current snapshot itself
    def stripped(p: Path): String =
      Path.getPathWithoutSchemeAndAuthority(p).toString
    val live = kept.flatMap(_.files.map(f =>
      stripped(new Path(f.path).getParent))).toSet
    val cutoff = System.currentTimeMillis() - minAgeMs
    val dd = dataDir(rootP)
    var dropped = 0
    if (fs.exists(dd)) for (d <- fs.listStatus(dd) if d.isDirectory) {
      val ref = live.contains(stripped(d.getPath))
      lazy val newestTouch = (d.getModificationTime +:
        fs.listStatus(d.getPath).map(_.getModificationTime).toSeq).max
      if (!ref && newestTouch < cutoff) {
        fs.delete(d.getPath, true)
        dropped += 1
      }
    }
    val keepV = kept.map(_.version).min
    for (v <- versions if v < keepV)
      fs.delete(manifestPath(rootP, v), false)
    dropped
  }
}
