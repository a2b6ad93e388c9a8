package graft

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import graft.sources.ManifestStore

/** Manifest-committed table (the object-store compaction posture —
  * [[graft.sources.Sink.requireAtomicRename]]'s documented alternative,
  * r9): readers resolve the highest INTACT manifest instead of listing
  * directories, writers never rename, commits are create-exclusive with
  * optimistic rebase, compaction and vacuum are manifest swaps.
  */
class ManifestStoreSpec extends SparkSpec {

  import SharedSpark.spark.implicits._

  private def freshRoot() =
    Files.createTempDirectory("graft-manifest").toString

  private def batch(lo: Int, hi: Int) =
    (lo until hi).map(i => (i.toLong, s"row-$i")).toDF("id", "payload")

  private def ids(df: org.apache.spark.sql.DataFrame): Seq[Long] =
    df.select("id").as[Long].collect().toSeq.sorted

  test("append/read round-trip; versions increment; snapshots are unions") {
    val root = freshRoot()
    val v1 = ManifestStore.append(spark, batch(0, 10).repartition(4), root)
    assert(v1 == 1L)
    assert(ids(ManifestStore.read(spark, root)) == (0L until 10L))
    val v2 = ManifestStore.append(spark, batch(10, 25).repartition(4), root)
    assert(v2 == 2L)
    assert(ids(ManifestStore.read(spark, root)) == (0L until 25L))
    // time travel: v1 still sees only the first batch
    assert(ids(ManifestStore.readVersion(spark, root, 1)) == (0L until 10L))
  }

  test("uncommitted data is invisible: no manifest references it") {
    val root = freshRoot()
    ManifestStore.append(spark, batch(0, 5), root)
    // a crashed writer's orphan: parquet under data/ with no commit
    batch(100, 110).write.parquet(s"$root/data/batch-orphan")
    assert(ids(ManifestStore.read(spark, root)) == (0L until 5L),
      "readers must resolve the manifest, never list the data directory")
  }

  test("compact preserves the multiset, reduces files, keeps old versions readable") {
    val root = freshRoot()
    ManifestStore.append(spark, batch(0, 200).repartition(16), root)
    ManifestStore.append(spark, batch(200, 400).repartition(16), root)
    val before = ManifestStore.latestSnapshot(spark, root).get
    assert(before.files.size >= 32)
    val totalBytes = before.files.map(_.bytes).sum
    val (nBefore, nAfter, v) =
      ManifestStore.compact(spark, root, targetFileBytes = totalBytes / 2)
    assert(nBefore == before.files.size && v == 3L)
    assert(nAfter < nBefore / 4, s"$nBefore -> $nAfter should be a real merge")
    assert(ids(ManifestStore.read(spark, root)) == (0L until 400L))
    // pre-vacuum, the pre-compaction snapshot is still fully readable
    assert(ids(ManifestStore.readVersion(spark, root, 2)) == (0L until 400L))
    assert(ManifestStore.latestSnapshot(spark, root).get.files.size == nAfter)
  }

  test("torn manifests are skipped by readers and never reused by committers") {
    val root = freshRoot()
    ManifestStore.append(spark, batch(0, 5), root)
    // a crashed committer's half-upload at the next slot: garbage content
    val torn = new Path(s"$root/_manifests/v${"%020d".format(2)}.manifest")
    val fs = torn.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(torn, false)
    out.write("graft-manifest v1\nversion=2\nhalf-a-lin".getBytes("UTF-8"))
    out.close()
    // readers fall back to the intact v1
    assert(ManifestStore.latestSnapshot(spark, root).get.version == 1L)
    assert(ids(ManifestStore.read(spark, root)) == (0L until 5L))
    // the next commit claims ABOVE the dead slot, never overwrites it
    // (tornGraceMs=0: this test plays a CRASHED committer, already aged out)
    val v = ManifestStore.append(spark, batch(5, 8), root, tornGraceMs = 0L)
    assert(v == 3L, s"torn v2 must stay dead; got $v")
    assert(ids(ManifestStore.read(spark, root)) == (0L until 8L))
  }

  test("a young torn slot is an IN-FLIGHT committer: later commits wait out the grace") {
    val root = freshRoot()
    ManifestStore.append(spark, batch(0, 5), root)
    // a committer mid-write at slot 2 (created, bytes not yet flushed):
    // building past it immediately would orphan its commit when it lands
    val torn = new Path(s"$root/_manifests/v${"%020d".format(2)}.manifest")
    val fs = torn.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.create(torn, false).close() // 0 bytes = torn, mtime = now
    val grace = 800L
    val t0 = System.nanoTime()
    val v = ManifestStore.append(spark, batch(5, 8), root, tornGraceMs = grace)
    val waitedMs = (System.nanoTime() - t0) / 1000000
    assert(v == 3L)
    assert(waitedMs >= grace / 2,
      s"committer must wait out the torn slot's grace, waited only ${waitedMs}ms")
    assert(ids(ManifestStore.read(spark, root)) == (0L until 8L))
  }

  test("an empty append yields a READABLE zero-row table, never an unreadable commit") {
    // Spark emits a schema-only part file for an empty frame, so the
    // commit carries one file and reads back as zero rows; the
    // writeBatch-empty no-op guard stays as defense for a zero-file
    // write (a behavior Spark is free to adopt), which must report the
    // current version instead of committing a file-less manifest
    val root = freshRoot()
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], batch(0, 1).schema)
    val v0 = ManifestStore.append(spark, empty, root)
    if (v0 == 0L) { // zero-file write: no-op, table stays uninitialized
      intercept[java.util.NoSuchElementException] { ManifestStore.read(spark, root) }
    } else { // schema-only file: committed and readable as zero rows
      assert(v0 == 1L && ManifestStore.read(spark, root).count() == 0L)
    }
    val v = ManifestStore.append(spark, batch(0, 5), root)
    assert(v == v0 + 1 && ids(ManifestStore.read(spark, root)) == (0L until 5L))
  }

  test("concurrent appends all survive: single listing + exclusive claim") {
    val root = freshRoot()
    val threads = 4
    val perThread = 2
    val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
    try {
      val tasks = (0 until threads).map { t =>
        pool.submit(new java.util.concurrent.Callable[Unit] {
          def call(): Unit = for (b <- 0 until perThread) {
            val lo = (t * perThread + b) * 10
            ManifestStore.append(spark, batch(lo, lo + 10), root, maxRetries = 50)
          }
        })
      }
      tasks.foreach(_.get())
    } finally pool.shutdown()
    assert(ManifestStore.latestSnapshot(spark, root).get.version == (threads * perThread).toLong)
    assert(ids(ManifestStore.read(spark, root)) == (0L until (threads * perThread * 10).toLong),
      "every racing committer's rows must appear in the final snapshot")
  }

  test("append rebases over a concurrent commit instead of losing it") {
    val root = freshRoot()
    ManifestStore.append(spark, batch(0, 5), root)
    // simulate a racing committer that wins slot 2 between our snapshot
    // read and our create-exclusive: seed it before our append runs by
    // committing normally, then verify a THIRD append sees both
    ManifestStore.append(spark, batch(5, 10), root)
    val v = ManifestStore.append(spark, batch(10, 15), root)
    assert(v == 3L)
    assert(ids(ManifestStore.read(spark, root)) == (0L until 15L),
      "every committed append must survive")
  }

  test("stale compaction abandons instead of duplicating rows") {
    val root = freshRoot()
    ManifestStore.append(spark, batch(0, 100).repartition(8), root)
    val stale = ManifestStore.latestSnapshot(spark, root).get
    // a faster compactor replaces the same inputs first
    val (_, _, v2) = ManifestStore.compact(spark, root, targetFileBytes = 1L << 30)
    assert(v2 == 2L)
    // the slower compactor holds the PRE-compaction snapshot: its inputs
    // are gone from the latest manifest — committing its copy would
    // double every row, so it must abandon (version -1, no new manifest)
    val (_, _, vAbandoned) =
      ManifestStore.compactFrom(spark, root, stale, targetFileBytes = 1L << 30)
    assert(vAbandoned == -1L)
    assert(ManifestStore.latestSnapshot(spark, root).get.version == 2L)
    assert(ids(ManifestStore.read(spark, root)) == (0L until 100L),
      "no duplicated rows after the abandoned stale compaction")
  }

  test("compaction rebase preserves an append that lands mid-compaction") {
    val root = freshRoot()
    ManifestStore.append(spark, batch(0, 50).repartition(8), root)
    val base = ManifestStore.latestSnapshot(spark, root).get
    // an append commits AFTER the compactor snapshotted its inputs
    ManifestStore.append(spark, batch(50, 60), root)
    val (_, _, v) =
      ManifestStore.compactFrom(spark, root, base, targetFileBytes = 1L << 30)
    assert(v == 3L)
    assert(ids(ManifestStore.read(spark, root)) == (0L until 60L),
      "the interleaved append's files must survive the compaction commit")
  }

  test("vacuum keeps chain-interior versions' DATA readable — manifest and data retention agree (advice r13)") {
    val root = freshRoot()
    ManifestStore.append(spark, batch(0, 10).repartition(2), root)  // v1 checkpoint: batch A
    ManifestStore.append(spark, batch(10, 20).repartition(2), root) // v2 delta: batch B
    ManifestStore.append(spark, batch(20, 30).repartition(2), root) // v3 delta: batch C
    // CoW delete of exactly batch A's rows: stats-pruned to A's files, the
    // rewrite survives zero rows so v4 is a small DELTA (rm= only) whose
    // chain anchors on the v1 checkpoint
    import org.apache.spark.sql.sources.LessThan
    val (n, _, v4) = ManifestStore.deleteWhere(spark, root, Seq(LessThan("id", 10L)))
    assert(n == 10 && v4 == 4L)
    assert(ManifestStore.latestSnapshot(spark, root).get.deltaDepth > 0,
      "the delete must commit as a delta for this regression to bite")
    // keepVersions=1 retains manifests down to v4's checkpoint (v1) to keep
    // the chain replayable — so the data THOSE manifests reference must stay
    // live too: pre-r14, batch A dropped here while readVersion(3) still
    // resolved, and the scan died with FileNotFoundException at execution
    assert(ManifestStore.vacuum(spark, root, keepVersions = 1, minAgeMs = 0L) == 0,
      "every batch is referenced by a retained (chain) manifest — none may drop")
    assert(ids(ManifestStore.readVersion(spark, root, 3)) == (0L until 30L),
      "a chain-interior version whose manifest vacuum retained must stay readable")
    assert(ids(ManifestStore.read(spark, root)) == (10L until 30L))
    // once the head is a CHECKPOINT (compaction rewrites the whole table),
    // the chain collapses and retention genuinely reclaims: old batches drop
    // AND their versions become unresolvable together
    ManifestStore.compact(spark, root)
    // batches A, B, C drop (plus the CoW delete's orphaned empty-rewrite dir)
    assert(ManifestStore.vacuum(spark, root, keepVersions = 1, minAgeMs = 0L) >= 3)
    assert(ManifestStore.snapshotAt(spark, root, 3).isEmpty,
      "below the kept checkpoint, manifests are pruned with their data")
    assert(ids(ManifestStore.read(spark, root)) == (10L until 30L))
  }

  test("committer-seeded snapshot matches cold resolution file ORDER after in-place dv tagging (advice r13)") {
    val root = freshRoot()
    ManifestStore.append(spark, batch(0, 10).repartition(2), root)
    ManifestStore.append(spark, batch(10, 20).repartition(2), root)
    // MoR delete tags batch A's files with dvs IN PLACE (same path, new dv)
    import org.apache.spark.sql.sources.LessThan
    val (n, _, _) = ManifestStore.deleteWhereMergeOnRead(
      spark, root, Seq(LessThan("id", 3L)))
    assert(n == 3)
    val seeded = ManifestStore.latestSnapshot(spark, root).get.files
      .map(f => f.path -> f.dv.map(_.path))
    ManifestStore.clearCachesForTest()
    val cold = ManifestStore.latestSnapshot(spark, root).get.files
      .map(f => f.path -> f.dv.map(_.path))
    assert(seeded == cold,
      "the committer's seedCache order must be exactly what a cold delta-chain " +
        "resolution reconstructs (dv-tagged entries replace IN PLACE)")
  }

  test("vacuum drops unreferenced batches and old manifests, honors the age guard") {
    val root = freshRoot()
    ManifestStore.append(spark, batch(0, 100).repartition(8), root)
    batch(500, 510).write.parquet(s"$root/data/batch-orphan") // crashed writer
    ManifestStore.compact(spark, root, targetFileBytes = 1L << 30)
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    def batchDirs() = fs.listStatus(new Path(s"$root/data")).count(_.isDirectory)
    assert(batchDirs() == 3) // original, orphan, compacted

    // age guard first: nothing young enough to delete
    assert(ManifestStore.vacuum(spark, root, keepVersions = 1,
      minAgeMs = 24L * 3600 * 1000) == 0)
    assert(batchDirs() == 3)

    // an in-flight writer: its batch DIRECTORY may report a synthetic old
    // mtime (object-store marker), but its FILES are fresh — the age guard
    // keys on the newest touch, so it must survive a bounded-age vacuum
    val orphanDir = new java.io.File(s"$root/data/batch-orphan")
    assert(orphanDir.setLastModified(System.currentTimeMillis() - 48L * 3600 * 1000))
    assert(ManifestStore.vacuum(spark, root, keepVersions = 1,
      minAgeMs = 3600 * 1000) == 0,
      "fresh files inside an old-mtime directory must block deletion")
    assert(batchDirs() == 3)

    val dropped = ManifestStore.vacuum(spark, root, keepVersions = 1, minAgeMs = 0)
    assert(dropped == 2, s"original + orphan should drop, got $dropped")
    assert(batchDirs() == 1)
    assert(ids(ManifestStore.read(spark, root)) == (0L until 100L),
      "the live snapshot survives vacuum intact")
    // the pre-compaction manifest is gone with its files
    intercept[java.util.NoSuchElementException] {
      ManifestStore.readVersion(spark, root, 1)
    }
  }

  test("a type-changing append is refused, not committed as read poison") {
    val root = freshRoot()
    ManifestStore.append(spark, batch(0, 5), root) // defines (id, payload)
    // r10: ADDING or OMITTING columns is sanctioned evolution; what stays
    // refused is changing an existing column's TYPE
    val wrong = Seq(("x", "y")).toDF("id", "payload") // id string, table long
    val e = intercept[IllegalArgumentException] {
      ManifestStore.append(spark, wrong, root)
    }
    assert(e.getMessage.contains("id") && e.getMessage.contains("type"), e.getMessage)
    intercept[IllegalArgumentException] {
      ManifestStore.appendBatch(spark, wrong, root, "sink", 0L)
    }
    // column ORDER does not matter (reads resolve by name)
    val reordered = batch(5, 8).select("payload", "id")
    assert(ManifestStore.append(spark, reordered, root) == 2L)
    assert(ids(ManifestStore.read(spark, root)) == (0L until 8L))
  }

  test("reading an empty or uninitialized table fails loudly, not emptily") {
    val root = freshRoot()
    intercept[java.util.NoSuchElementException] {
      ManifestStore.read(spark, root)
    }
  }

  /** r9: the foreachBatch sink primitive — streaming delivery is
    * at-least-once, so a REDELIVERED (appId, batchId) commit must be a
    * no-op, checked inside the same atomic commit that adds the files;
    * watermarks survive compaction; independent appIds don't interfere.
    */
  test("appendBatch: redelivered micro-batches are no-ops; watermarks survive compaction") {
    val root = freshRoot()
    assert(ManifestStore.appendBatch(spark, batch(0, 10), root, "sinkA", 0L) == 1L)
    assert(ManifestStore.appendBatch(spark, batch(10, 20), root, "sinkA", 1L) == 2L)
    // the retry: same appId + batchId delivered again after a "failure"
    val vRetry = ManifestStore.appendBatch(spark, batch(10, 20), root, "sinkA", 1L)
    assert(vRetry == 2L, s"redelivery must not commit, got $vRetry")
    assert(ids(ManifestStore.read(spark, root)) == (0L until 20L),
      "no duplicated rows after redelivery")
    // an independent writer is unaffected by sinkA's watermark
    assert(ManifestStore.appendBatch(spark, batch(20, 25), root, "sinkB", 0L) == 3L)
    // compaction preserves the watermarks: a post-compaction redelivery
    // must STILL no-op
    ManifestStore.compact(spark, root, targetFileBytes = 1L << 30)
    val snap = ManifestStore.latestSnapshot(spark, root).get
    assert(snap.txns == Map("sinkA" -> 1L, "sinkB" -> 0L), s"txns lost: ${snap.txns}")
    val vRetry2 = ManifestStore.appendBatch(spark, batch(10, 20), root, "sinkA", 1L)
    assert(vRetry2 == snap.version && ids(ManifestStore.read(spark, root)) == (0L until 25L),
      "a watermark dropped by compaction would re-admit the duplicate batch")
  }

  // ---- r10: data skipping, partitioned tables, schema evolution, probe ----

  /** r10 #1 (VERDICT): per-file min/max stats from the parquet footers ride
    * the manifest; a pushed predicate prunes the FILE LIST before the scan
    * plans — and never changes the answer.
    */
  test("data skipping: stats in the manifest, selective predicates open fewer files") {
    import org.apache.spark.sql.sources._
    val root = freshRoot()
    // range-layout so files carry tight disjoint id bounds (the layout a
    // real ingest gets from Sink.writeZOrdered / time-ordered appends)
    ManifestStore.append(spark,
      batch(0, 400).repartitionByRange(8, col("id")).sortWithinPartitions("id"), root)
    val snap = ManifestStore.latestSnapshot(spark, root).get
    assert(snap.files.size >= 8)
    assert(snap.files.forall(_.rows.exists(_ > 0)), "every entry carries its row count")
    assert(snap.files.forall(e => e.stats.contains("id") && e.stats.contains("payload")),
      "long and string columns both carry footer stats")

    val pred: Seq[Filter] = Seq(GreaterThanOrEqual("id", 350L))
    val pruned = ManifestStore.prunedEntries(snap, pred)
    assert(pruned.size < snap.files.size,
      s"selective predicate must skip files: ${pruned.size} of ${snap.files.size} kept")
    assert(pruned.nonEmpty)
    // parity: skipping changes which files open, never the rows
    assert(ids(ManifestStore.readWhere(spark, root, pred)) == (350L until 400L))
    // string bounds prune too (payload = "row-N", byte-ordered)
    val sPred: Seq[Filter] = Seq(LessThan("payload", "row-1"))
    assert(ManifestStore.prunedEntries(snap, sPred).size < snap.files.size)
    assert(ManifestStore.readWhere(spark, root, sPred).count() ==
      ManifestStore.read(spark, root).where(col("payload") < "row-1").count())
    // a predicate outside every bound prunes EVERYTHING and still returns
    // an empty frame with the table schema
    val none = ManifestStore.readWhere(spark, root, Seq(GreaterThan("id", 100000L)))
    assert(none.count() == 0L && none.columns.toSeq == Seq("id", "payload"))
    // null pruning: no file has null ids, so IsNull opens nothing
    assert(ManifestStore.prunedEntries(snap, Seq(IsNull("id"))).isEmpty)
    assert(ManifestStore.readWhere(spark, root, Seq(IsNull("id"))).count() == 0L)
  }

  /** r10 #2 (VERDICT): hive-style partition values in manifest entries —
    * equality on the partition column prunes whole batches before any
    * file-level stats run; the full append→compact→vacuum cycle preserves
    * partition grouping; values (and the hive null) reconstruct exactly.
    */
  test("partitioned table: pruned reads, compaction keeps grouping, vacuum cycle") {
    import org.apache.spark.sql.sources._
    val root = freshRoot()
    def src(lo: Int, hi: Int) = (lo until hi)
      .map(i => (i.toLong, s"row-$i", if (i % 3 == 0) "a" else if (i % 3 == 1) "b" else null))
      .toDF("id", "payload", "src")
    ManifestStore.append(spark, src(0, 90).repartition(4), root, partitionBy = Seq("src"))
    ManifestStore.append(spark, src(90, 180).repartition(4), root, partitionBy = Seq("src"))
    // a mismatched layout is refused before any bytes land
    intercept[IllegalArgumentException] {
      ManifestStore.append(spark, src(180, 181), root) // missing partitionBy
    }
    val snap = ManifestStore.latestSnapshot(spark, root).get
    assert(snap.partCols == Seq("src"))
    assert(snap.files.forall(_.partition.exists(_.contains("src"))))

    // partition pruning: only src=a files survive the filter
    val aOnly = ManifestStore.prunedEntries(snap, Seq(EqualTo("src", "a")))
    assert(aOnly.nonEmpty && aOnly.size < snap.files.size)
    assert(aOnly.forall(_.partition.get("src").contains("a")))
    // reconstruction parity: the partition column comes back typed + exact
    val got = ManifestStore.readWhere(spark, root, Seq(EqualTo("src", "a")))
    assert(got.columns.toSeq == Seq("id", "payload", "src"))
    assert(ids(got) == (0L until 180L by 3L).toSeq)
    // the hive null partition round-trips as real SQL NULL
    assert(ManifestStore.readWhere(spark, root, Seq(IsNull("src"))).count() == 60L)
    assert(ids(ManifestStore.read(spark, root)) == (0L until 180L))

    // compaction preserves partition grouping (and therefore pruning)
    val (nB, nA, _) = ManifestStore.compact(spark, root, targetFileBytes = 1L << 30)
    assert(nA < nB)
    val snap2 = ManifestStore.latestSnapshot(spark, root).get
    assert(snap2.partCols == Seq("src"))
    assert(snap2.files.forall(_.partition.exists(_.contains("src"))),
      "compacted files must keep their partition values")
    assert(ManifestStore.prunedEntries(snap2, Seq(EqualTo("src", "b"))).size < snap2.files.size)
    assert(ids(ManifestStore.readWhere(spark, root, Seq(EqualTo("src", "b")))) ==
      (1L until 180L by 3L).toSeq)

    // vacuum: the pre-compaction partitioned batches (nested dirs) drop,
    // the live compacted batch survives
    assert(ManifestStore.vacuum(spark, root, keepVersions = 1, minAgeMs = 0) == 2)
    assert(ids(ManifestStore.read(spark, root)) == (0L until 180L),
      "live partitioned snapshot must survive vacuum")
  }

  test("partition values with hive-escaped characters round-trip exactly") {
    import org.apache.spark.sql.sources._
    val root = freshRoot()
    val tricky = Seq("a/b", "x=y", "p:q r", "plain")
    val df = tricky.zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("id", "key")
    ManifestStore.append(spark, df, root, partitionBy = Seq("key"))
    val back = ManifestStore.read(spark, root).select("key").as[String].collect().toSet
    assert(back == tricky.toSet, s"escaped partition values corrupted: $back")
    assert(ids(ManifestStore.readWhere(spark, root, Seq(EqualTo("key", "a/b")))) == Seq(0L))
  }

  /** r10 #3 (VERDICT): sanctioned widening — a batch may ADD nullable
    * columns (old files read as null) or OMIT existing ones (its files
    * read as null there); type changes stay refused, including two
    * concurrent widenings racing the same column name with different
    * types; time travel replays the OLD schema.
    */
  test("schema evolution: add-nullable-column widens, old versions replay their schema") {
    val root = freshRoot()
    ManifestStore.append(spark, batch(0, 10), root) // (id, payload)
    val widened = (10 until 20).map(i => (i.toLong, s"row-$i", i * 0.5))
      .toDF("id", "payload", "score")
    assert(ManifestStore.append(spark, widened, root) == 2L)
    val full = ManifestStore.read(spark, root)
    assert(full.columns.toSeq == Seq("id", "payload", "score"))
    assert(full.where(col("score").isNull).count() == 10L,
      "pre-widening files must null-fill the new column")
    assert(full.where(col("score").isNotNull).count() == 10L)
    // time travel: v1 replays WITHOUT the later column
    assert(ManifestStore.readVersion(spark, root, 1).columns.toSeq == Seq("id", "payload"))
    // a batch OMITTING a column null-fills its own files instead
    val narrow = Seq((20L, 9.9)).toDF("id", "score")
    assert(ManifestStore.append(spark, narrow, root) == 3L)
    val v3 = ManifestStore.read(spark, root)
    assert(v3.where(col("id") === 20L && col("payload").isNull).count() == 1L)
    // type changes stay refused
    val clash = Seq((21L, 7)).toDF("id", "score") // score int, table double
    val e = intercept[IllegalArgumentException] {
      ManifestStore.append(spark, clash, root)
    }
    assert(e.getMessage.contains("score"), e.getMessage)
    // compaction MATERIALIZES the widened schema and keeps answers
    ManifestStore.compact(spark, root, targetFileBytes = 1L << 30)
    assert(ManifestStore.read(spark, root).where(col("payload").isNull).count() == 1L)
    assert(ids(ManifestStore.read(spark, root)) == (0L until 21L))
  }

  /** r10: partial compaction (the OPTIMIZE WHERE shape) — only the files
    * matching the filter are rewritten; everything else keeps its
    * identity, and a concurrent append is preserved by the usual rebase.
    */
  test("compactWhere rewrites only the matching partition, preserves the rest") {
    import org.apache.spark.sql.sources._
    val root = freshRoot()
    def src(lo: Int, hi: Int) = (lo until hi)
      .map(i => (i.toLong, s"row-$i", (i % 2).toString)).toDF("id", "payload", "day")
    ManifestStore.append(spark, src(0, 100).repartition(8), root, partitionBy = Seq("day"))
    ManifestStore.append(spark, src(100, 200).repartition(8), root, partitionBy = Seq("day"))
    val before = ManifestStore.latestSnapshot(spark, root).get
    val day0Before = ManifestStore.prunedEntries(before, Seq(EqualTo("day", "0"))).map(_.path).toSet
    val day1Before = ManifestStore.prunedEntries(before, Seq(EqualTo("day", "1"))).map(_.path).toSet
    assert(day0Before.size > 1 && day1Before.size > 1)

    val (nB, nA, v) = ManifestStore.compactWhere(spark, root,
      Seq(EqualTo("day", "0")), targetFileBytes = 1L << 30)
    assert(v > before.version && nB == day0Before.size && nA < nB)
    val after = ManifestStore.latestSnapshot(spark, root).get
    val day1After = ManifestStore.prunedEntries(after, Seq(EqualTo("day", "1"))).map(_.path).toSet
    assert(day1After == day1Before, "non-matching partition files must keep their identity")
    assert(ManifestStore.prunedEntries(after, Seq(EqualTo("day", "0"))).size == nA)
    assert(ids(ManifestStore.read(spark, root)) == (0L until 200L))
    assert(ids(ManifestStore.readWhere(spark, root, Seq(EqualTo("day", "0")))) ==
      (0L until 200L by 2L).toSeq)
  }

  /** r10: two compactors on DISJOINT partitions both land — the second
    * holds a stale snapshot, but its inputs were untouched by the first,
    * so the rebase commits instead of abandoning (the property that makes
    * per-partition maintenance parallelizable).
    */
  test("disjoint compactWhere commits from a stale snapshot; overlapping one abandons") {
    import org.apache.spark.sql.sources._
    val root = freshRoot()
    def src(lo: Int, hi: Int) = (lo until hi)
      .map(i => (i.toLong, s"row-$i", (i % 2).toString)).toDF("id", "payload", "day")
    ManifestStore.append(spark, src(0, 100).repartition(8), root, partitionBy = Seq("day"))
    val stale = ManifestStore.latestSnapshot(spark, root).get
    def subset(day: String) =
      stale.copy(files = ManifestStore.prunedEntries(stale, Seq(EqualTo("day", day))))
    // compactor A rewrites day=0 (commits v2)
    val (_, _, vA) = ManifestStore.compactFrom(spark, root, subset("0"), 1L << 30)
    assert(vA == 2L)
    // compactor B still holds the PRE-A snapshot but touches only day=1:
    // its inputs survive in v2, so it must commit, not abandon
    val (_, _, vB) = ManifestStore.compactFrom(spark, root, subset("1"), 1L << 30)
    assert(vB == 3L, s"disjoint stale compaction must land, got $vB")
    assert(ids(ManifestStore.read(spark, root)) == (0L until 100L))
    // a THIRD compactor re-running day=0 from the stale snapshot overlaps
    // A's replaced inputs and must abandon
    val (_, _, vC) = ManifestStore.compactFrom(spark, root, subset("0"), 1L << 30)
    assert(vC == -1L, s"overlapping stale compaction must abandon, got $vC")
    assert(ids(ManifestStore.read(spark, root)) == (0L until 100L))
  }

  /** r10: copy-on-write DELETE — only files that might match are
    * rewritten; null predicate results survive (SQL semantics); time
    * travel still reads the pre-delete rows; the abandonment contract
    * holds against concurrent rewrites.
    */
  test("deleteWhere: prunes untouched files, deletes exactly the matching rows") {
    import org.apache.spark.sql.sources._
    val root = freshRoot()
    ManifestStore.append(spark,
      batch(0, 400).repartitionByRange(8, col("id")).sortWithinPartitions("id"), root)
    val before = ManifestStore.latestSnapshot(spark, root).get
    // the untouched set is the COMPLEMENT of the touched set — a file
    // straddling the cut belongs to touched, not untouched (review r10)
    val untouchedBefore = (before.files.map(_.path).toSet --
      ManifestStore.prunedEntries(before, Seq(GreaterThanOrEqual("id", 300L)))
        .map(_.path).toSet)

    val (deleted, rewritten, v) =
      ManifestStore.deleteWhere(spark, root, Seq(GreaterThanOrEqual("id", 300L)))
    assert(deleted == 100L && v == 2L)
    assert(rewritten < before.files.size,
      s"delete must rewrite only the touched slice: $rewritten of ${before.files.size}")
    assert(ids(ManifestStore.read(spark, root)) == (0L until 300L))
    // files outside the predicate keep their IDENTITY (no rewrite)
    val after = ManifestStore.latestSnapshot(spark, root).get
    assert(untouchedBefore.subsetOf(after.files.map(_.path).toSet),
      "files that cannot match must not be rewritten")
    // time travel: v1 still reads the deleted rows until vacuum
    assert(ids(ManifestStore.readVersion(spark, root, 1L)) == (0L until 400L))
    // no-match delete is a version-preserving no-op
    assert(ManifestStore.deleteWhere(spark, root, Seq(GreaterThan("id", 10000L)))
      == ((0L, 0, 2L)))
    // null rows survive a delete keyed on the nullable column (SQL: a NULL
    // comparison never matches the predicate)
    val root2 = freshRoot()
    ManifestStore.append(spark,
      Seq((1L, "a"), (2L, null.asInstanceOf[String]), (3L, "b")).toDF("id", "payload"), root2)
    val (d2, _, _) = ManifestStore.deleteWhere(spark, root2, Seq(EqualTo("payload", "a")))
    assert(d2 == 1L)
    assert(ids(ManifestStore.read(spark, root2)) == Seq(2L, 3L),
      "the null-payload row must survive a payload-keyed delete")
    // deleting every row of an UNPARTITIONED table stays readable: the
    // rewrite's schema-only part file keeps the manifest non-empty (same
    // contract as the empty-append case)
    val (dAll, _, _) = ManifestStore.deleteWhere(spark, root2, Seq(IsNotNull("id")))
    assert(dAll == 2L && ManifestStore.read(spark, root2).count() == 0L)
    // ABANDONMENT: a delete holding a stale snapshot whose inputs a
    // concurrent rewrite already replaced must commit NOTHING and report
    // (0, 0, -1) — never resurrect/duplicate rows (deleteFrom seam,
    // mirroring the compactFrom stale test)
    val root3 = freshRoot()
    ManifestStore.append(spark, batch(0, 50).repartition(4), root3)
    val stale = ManifestStore.latestSnapshot(spark, root3).get
    ManifestStore.compactFrom(spark, root3, stale, 1L << 30) // v2 replaces all
    val abandoned = ManifestStore.deleteFrom(spark, root3, stale, Seq(LessThan("id", 10L)))
    assert(abandoned == ((0L, 0, -1L)),
      s"stale delete must abandon with an all-zero effect claim: $abandoned")
    assert(ids(ManifestStore.read(spark, root3)) == (0L until 50L),
      "abandoned delete must leave every row live")
    // a FRESH delete then works against the compacted table
    val (d3, _, v3) = ManifestStore.deleteWhere(spark, root3, Seq(LessThan("id", 10L)))
    assert(d3 == 10L && v3 == 3L)
    assert(ids(ManifestStore.read(spark, root3)) == (10L until 50L))
  }

  /** r10: CDC-lite tail reads — rows appended strictly after a version,
    * refusing any range a rewrite crossed (the only sound contract without
    * real change files).
    */
  test("readAddedSince: exact tail over append-only ranges, loud refusal across rewrites") {
    val root = freshRoot()
    val v1 = ManifestStore.append(spark, batch(0, 10), root)
    val v2 = ManifestStore.append(spark, batch(10, 30), root)
    val v3 = ManifestStore.append(spark, batch(30, 35), root)
    // tail from v1: exactly batches 2 + 3
    val (cur, tail) = ManifestStore.readAddedSince(spark, root, v1)
    assert(cur == v3 && ids(tail) == (10L until 35L))
    // consumer loop shape: checkpoint cur, poll again -> empty
    val (cur2, tail2) = ManifestStore.readAddedSince(spark, root, cur)
    assert(cur2 == cur && tail2.count() == 0L &&
      tail2.columns.toSeq == Seq("id", "payload"))
    // a partitioned table reconstructs partition columns in the tail
    val rootP = freshRoot()
    val pdf = (0 until 20).map(i => (i.toLong, (i % 2).toString)).toDF("id", "src")
    ManifestStore.append(spark, pdf, rootP, partitionBy = Seq("src"))
    val pv1 = ManifestStore.latestSnapshot(spark, rootP).get.version
    ManifestStore.append(spark,
      Seq((100L, "0")).toDF("id", "src"), rootP, partitionBy = Seq("src"))
    val (_, ptail) = ManifestStore.readAddedSince(spark, rootP, pv1)
    assert(ptail.columns.toSeq == Seq("id", "src"))
    assert(ptail.select("id").as[Long].collect().toSeq == Seq(100L))
    // r12: a PHYSICAL rewrite (compaction) inside the range passes
    // through — the op-labeled, row-conserving commit is skipped by the
    // span walk, so the tail still reads exactly the appended rows
    ManifestStore.compact(spark, root, targetFileBytes = 1L << 30)
    val (_, tailC) = ManifestStore.readAddedSince(spark, root, v2)
    assert(ids(tailC) == (30L until 35L),
      "a compaction in range must be transparent to the tail")
    // a DATA-CHANGING rewrite (CoW delete) still refuses loudly
    val vc = ManifestStore.latestSnapshot(spark, root).get.version
    ManifestStore.append(spark, batch(35, 40), root)
    assert(ManifestStore.deleteWhere(spark, root,
      Seq(org.apache.spark.sql.sources.EqualTo("id", 3L)))._1 == 1L)
    val e = intercept[IllegalArgumentException] {
      ManifestStore.readAddedSince(spark, root, vc)
    }
    assert(e.getMessage.contains("not derivable") &&
      e.getMessage.contains("op=delete"), e.getMessage)
    // but tailing from the post-rewrite version works again
    val vd = ManifestStore.latestSnapshot(spark, root).get.version
    ManifestStore.append(spark, batch(40, 45), root)
    val (_, tail3) = ManifestStore.readAddedSince(spark, root, vd)
    assert(ids(tail3) == (40L until 45L))
    // a vacuumed base version refuses (diff base unknowable)
    ManifestStore.vacuum(spark, root, keepVersions = 1, minAgeMs = 0L)
    intercept[java.util.NoSuchElementException] {
      ManifestStore.readAddedSince(spark, root, v1)
    }
  }

  /** r10: single-commit MERGE — matched keys replaced, new keys inserted,
    * both atomically; untouched files keep identity; new columns refused;
    * stale abandonment honest.
    */
  test("upsertByKey: matched keys replaced, unmatched inserted, one atomic version") {
    import org.apache.spark.sql.sources._
    val root = freshRoot()
    ManifestStore.append(spark,
      batch(0, 400).repartitionByRange(8, col("id")).sortWithinPartitions("id"), root)
    val before = ManifestStore.latestSnapshot(spark, root).get
    // update 20 clustered keys + insert 5 new ones
    val updates = ((380 until 400).map(i => (i.toLong, s"updated-$i")) ++
      (500 until 505).map(i => (i.toLong, s"new-$i"))).toDF("id", "payload")
    val (replaced, rewritten, v) =
      ManifestStore.upsertByKey(spark, root, updates, Seq("id"))
    assert(replaced == 20L && v == 2L)
    assert(rewritten < before.files.size,
      s"key-clustered upsert must rewrite one slice: $rewritten of ${before.files.size}")
    val after = ManifestStore.read(spark, root)
    assert(after.count() == 405L)
    assert(after.where(col("payload").startsWith("updated-")).count() == 20L)
    assert(after.where(col("payload").startsWith("new-")).count() == 5L)
    assert(after.where(col("id") === 399L).select("payload").as[String].head() == "updated-399")
    assert(after.where(col("id") === 10L).select("payload").as[String].head() == "row-10")
    // ONE version: the replace and the insert are not separately visible
    assert(ManifestStore.latestSnapshot(spark, root).get.version == 2L)
    // time travel still reads the pre-merge rows
    assert(ManifestStore.readVersion(spark, root, 1L)
      .where(col("id") === 399L).select("payload").as[String].head() == "row-399")
    // untouched files keep identity
    val touched = ManifestStore.prunedEntries(before,
      Seq(In("id", (380L until 400L).toArray.map(_.asInstanceOf[Any]))))
    val untouched = before.files.map(_.path).toSet -- touched.map(_.path).toSet
    assert(untouched.subsetOf(
      ManifestStore.latestSnapshot(spark, root).get.files.map(_.path).toSet))
    // pure insert: no key overlap → zero rewrites
    val ins = Seq((600L, "fresh")).toDF("id", "payload")
    val (r2, w2, v2) = ManifestStore.upsertByKey(spark, root, ins, Seq("id"))
    assert(r2 == 0L && w2 == 0 && v2 == 3L)
    assert(ManifestStore.read(spark, root).count() == 406L)
    // new columns are refused with the widen-first recipe
    val widening = Seq((1L, "x", 3.14)).toDF("id", "payload", "score")
    val e = intercept[IllegalArgumentException] {
      ManifestStore.upsertByKey(spark, root, widening, Seq("id"))
    }
    assert(e.getMessage.contains("widen"), e.getMessage)
  }

  test("upsertByKey guards: over-cap degrade, stale abandonment, partitioned, dup/null keys") {
    import org.apache.spark.sql.sources._
    // over-cap: pruning degrades to full rewrite, result still exact
    val root = freshRoot()
    ManifestStore.append(spark,
      batch(0, 100).repartitionByRange(4, col("id")).sortWithinPartitions("id"), root)
    val before = ManifestStore.latestSnapshot(spark, root).get
    val upd = (0 until 25).map(i => (i.toLong * 4, s"upd-${i * 4}")).toDF("id", "payload")
    val (r1, w1, _) = ManifestStore.upsertByKey(spark, root, upd, Seq("id"),
      maxProbeKeys = 2) // 25 keys >> cap
    assert(r1 == 25L && w1 == before.files.size,
      s"over-cap upsert must rewrite everything: replaced=$r1 rewritten=$w1")
    val t = ManifestStore.read(spark, root)
    assert(t.count() == 100L)
    assert(t.where(col("payload").startsWith("upd-")).count() == 25L)

    // stale abandonment: a concurrent compaction replaced the inputs
    val stale = ManifestStore.latestSnapshot(spark, root).get
    ManifestStore.compactFrom(spark, root, stale, 1L << 30)
    val abandoned = ManifestStore.upsertFrom(spark, root, stale,
      Seq((1L, "ghost")).toDF("id", "payload"), Seq("id"))
    assert(abandoned == ((0L, 0, -1L)), s"stale upsert must abandon honestly: $abandoned")
    assert(ManifestStore.read(spark, root)
      .where(col("payload") === "ghost").count() == 0L)

    // partitioned: partition-keyed updates rewrite one slice; the hive
    // NULL-sentinel empty string is refused
    val root2 = freshRoot()
    // id ranges correlate with partitions (ids 0-29 = day 0, ...), so the
    // key-stats pruning can actually exclude the other partitions' files
    val pdf = (0 until 90).map(i => (i.toLong, s"row-$i", (i / 30).toString))
      .toDF("id", "payload", "day")
    ManifestStore.append(spark, pdf, root2, partitionBy = Seq("day"))
    val b2 = ManifestStore.latestSnapshot(spark, root2).get
    val pupd = (0 until 30).map(i => (i.toLong, s"upd-$i", "0")).toDF("id", "payload", "day")
    val (r2, w2, _) = ManifestStore.upsertByKey(spark, root2, pupd, Seq("id"))
    assert(r2 == 30L && w2 < b2.files.size,
      "a key-clustered update set must rewrite only its partition's files")
    assert(ManifestStore.readWhere(spark, root2, Seq(EqualTo("day", "0")))
      .where(col("payload").startsWith("upd-")).count() == 30L)
    intercept[IllegalArgumentException] {
      ManifestStore.upsertByKey(spark, root2,
        Seq((1000L, "x", "")).toDF("id", "payload", "day"), Seq("id"))
    }

    // duplicate and null keys refuse loudly instead of multiplying rows
    val eDup2 = intercept[IllegalArgumentException] {
      ManifestStore.upsertByKey(spark, root2, Seq((1L, "a", "0"), (1L, "b", "0"))
        .toDF("id", "payload", "day"), Seq("id"))
    }
    assert(eDup2.getMessage.contains("distinct keys"), eDup2.getMessage)
    val eNull = intercept[IllegalArgumentException] {
      ManifestStore.upsertByKey(spark, root2,
        Seq((null.asInstanceOf[java.lang.Long], "a", "0")).toDF("id", "payload", "day"),
        Seq("id"))
    }
    assert(eNull.getMessage.contains("NULL key"), eNull.getMessage)
  }

  test("deleteWhere on a partitioned table: partition-keyed delete touches one slice") {
    import org.apache.spark.sql.sources._
    val root = freshRoot()
    val df = (0 until 120)
      .map(i => (i.toLong, s"row-$i", (i % 3).toString)).toDF("id", "payload", "day")
    ManifestStore.append(spark, df, root, partitionBy = Seq("day"))
    val before = ManifestStore.latestSnapshot(spark, root).get
    val (deleted, rewritten, _) =
      ManifestStore.deleteWhere(spark, root, Seq(EqualTo("day", "1")))
    // an entire partition deleted: every touched file emptied and dropped
    assert(deleted == 40L)
    assert(rewritten == ManifestStore.prunedEntries(before, Seq(EqualTo("day", "1"))).size)
    val after = ManifestStore.latestSnapshot(spark, root).get
    assert(after.partCols == Seq("day"))
    assert(ManifestStore.prunedEntries(after, Seq(EqualTo("day", "1"))).isEmpty)
    assert(ids(ManifestStore.read(spark, root)) ==
      (0L until 120L).filterNot(_ % 3 == 1))
    // a PARTITIONED full-table delete writes no files at all — committing
    // it would leave an unreadable empty manifest, so it is refused
    intercept[IllegalArgumentException] {
      ManifestStore.deleteWhere(spark, root, Seq(IsNotNull("id")))
    }
    assert(ids(ManifestStore.read(spark, root)) ==
      (0L until 120L).filterNot(_ % 3 == 1), "refused delete must not commit")
  }

  /** r10: z-ordered appends — multi-column predicates prune the manifest's
    * file list because every interleaved dimension's per-file bounds stay
    * tight (the Sink.writeZOrdered story, composed with the manifest).
    */
  test("appendZOrdered: two-dimensional predicates skip files") {
    import org.apache.spark.sql.sources._
    val n = 4096
    val side = 64 // ids form a 64x64 (x, y) grid
    val grid = (0 until n).map(i => (i.toLong, (i % side).toLong, (i / side).toLong))
      .toDF("id", "x", "y")
    val root = freshRoot()
    ManifestStore.appendZOrdered(spark, grid, root,
      Seq(col("x"), col("y")), files = 16, bits = 6)
    val snap = ManifestStore.latestSnapshot(spark, root).get
    assert(snap.files.size >= 8)
    // a small (x, y) box: both dimensions prune under z-layout
    val box: Seq[Filter] = Seq(And(
      And(GreaterThanOrEqual("x", 8L), LessThan("x", 16L)),
      And(GreaterThanOrEqual("y", 8L), LessThan("y", 16L))))
    val kept = ManifestStore.prunedEntries(snap, box)
    assert(kept.nonEmpty && kept.size < snap.files.size / 2,
      s"z-layout should prune most files for a small box: kept ${kept.size} of ${snap.files.size}")
    val got = ManifestStore.readWhere(spark, root, box)
    assert(got.count() == 64L)
    assert(got.agg(sum("id")).as[Long].head() ==
      grid.where(col("x").between(8, 15) && col("y").between(8, 15))
        .agg(sum("id")).as[Long].head())
  }

  /** r12: OPTIMIZE ZORDER BY — retro-clustering an arrival-ordered table
    * makes multi-column predicates prune, commits as a PHYSICAL version
    * (tails stream through it), and conserves the multiset exactly.
    */
  test("compactZOrdered: retro-clustering prunes; tails stream through it") {
    import org.apache.spark.sql.sources._
    val n = 4096
    val side = 64
    val root = freshRoot()
    // arrival order = id order: every file spans the full (x, y) domain,
    // so a small box prunes nothing
    val grid = (0 until n).map(i => (i.toLong, (i % side).toLong, (i / side).toLong))
      .toDF("id", "x", "y").repartition(16)
    ManifestStore.append(spark, grid, root)
    val v1 = ManifestStore.latestSnapshot(spark, root).get.version
    val box: Seq[Filter] = Seq(And(
      And(GreaterThanOrEqual("x", 8L), LessThan("x", 16L)),
      And(GreaterThanOrEqual("y", 8L), LessThan("y", 16L))))
    val beforeSnap = ManifestStore.latestSnapshot(spark, root).get
    assert(ManifestStore.prunedEntries(beforeSnap, box).size == beforeSnap.files.size,
      "arrival order must not prune (the premise of the rewrite)")
    val (was, now, v2) = ManifestStore.compactZOrdered(spark, root,
      Seq(col("x"), col("y")), files = 16, bits = 6)
    assert(v2 == v1 + 1 && was == 16 && now >= 8)
    val snap = ManifestStore.latestSnapshot(spark, root).get
    assert(snap.op == "compact")
    val kept = ManifestStore.prunedEntries(snap, box)
    assert(kept.nonEmpty && kept.size < snap.files.size / 2,
      s"z-layout should prune most files for a small box: kept ${kept.size} of ${snap.files.size}")
    assert(ManifestStore.readWhere(spark, root, box).count() == 64L)
    assert(ManifestStore.read(spark, root).count() == n.toLong)
    // the rewrite is PHYSICAL: a tail from before it sees nothing
    ManifestStore.append(spark, Seq((9999L, 0L, 0L)).toDF("id", "x", "y"), root)
    val (_, tail) = ManifestStore.readAddedSince(spark, root, v1)
    assert(tail.select("id").as[Long].collect().toSeq == Seq(9999L),
      "the z-order rewrite must be transparent to the tail")
  }

  /** r12: the span walk BISECTS a long maintenance-bearing range (one
    * compaction among many appends) and a schema widened mid-range
    * null-fills on the pre-widening spans — the evolution contract
    * carried into the change feed.
    */
  test("span walk bisects a long range; mid-range schema widening null-fills") {
    val root = freshRoot()
    (0 until 5).foreach(i =>
      ManifestStore.append(spark, batch(5 * i, 5 * i + 5), root)) // v1..v5
    ManifestStore.compact(spark, root, targetFileBytes = 1L << 30) // v6
    (5 until 8).foreach(i =>
      ManifestStore.append(spark, batch(5 * i, 5 * i + 5), root)) // v7..v9
    ManifestStore.append(spark, // v10: widening append (new column)
      (40 until 45).map(i => (i.toLong, s"row-$i", i * 2L))
        .toDF("id", "payload", "extra"), root)
    val (v, ch) = ManifestStore.readChangesSince(spark, root, 1L)
    assert(v == 10L)
    val ins = ch.where(col("_change_type") === "insert")
    assert(ins.select("id").as[Long].collect().sorted.toSeq == (5L until 45L),
      "the compaction must be invisible; every post-v1 append must surface")
    assert(ch.where(col("_change_type") === "delete").isEmpty)
    assert(ins.where(col("extra").isNotNull)
      .select("id").as[Long].collect().sorted.toSeq == (40L until 45L),
      "pre-widening spans must null-fill the new column")
    // the plain tail walks the same range identically
    val (_, tail) = ManifestStore.readAddedSince(spark, root, 1L)
    assert(tail.select("id").as[Long].collect().sorted.toSeq == (5L until 45L))
    assert(tail.columns.contains("extra"))
  }

  /** r10: pre-r10 tables (no schema line, no per-file meta) never skip —
    * upgradeTable retrofits footer stats + a schema without touching a
    * data byte, after which readWhere prunes. Idempotent.
    */
  test("upgradeTable retrofits stats and schema onto a legacy manifest") {
    import org.apache.spark.sql.sources._
    val root = freshRoot()
    // hand-craft a LEGACY (pre-r10) table: parquet batch + a v1 manifest
    // with bare path\tbytes lines and no schema
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    batch(0, 200).repartitionByRange(8, col("id")).sortWithinPartitions("id")
      .write.parquet(s"$root/data/batch-legacy")
    val files = fs.listStatus(new Path(s"$root/data/batch-legacy"))
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
    val body = "graft-manifest v1\nversion=1\n" +
      files.map(f => s"${f.getPath.toString}\t${f.getLen}").mkString("", "\n", "\n")
    val sum = org.apache.commons.codec.digest.DigestUtils.md5Hex(
      body.getBytes("UTF-8"))
    fs.mkdirs(new Path(s"$root/_manifests"))
    val out = fs.create(new Path(s"$root/_manifests/v${"%020d".format(1)}.manifest"), false)
    out.write((body + s"checksum=$sum\n").getBytes("UTF-8")); out.close()

    val legacy = ManifestStore.latestSnapshot(spark, root).get
    assert(legacy.schema.isEmpty && legacy.files.forall(_.stats.isEmpty))
    val pred = Seq(GreaterThanOrEqual("id", 180L))
    assert(ManifestStore.prunedEntries(legacy, pred).size == legacy.files.size,
      "a legacy table has nothing to skip with")
    assert(ids(ManifestStore.readWhere(spark, root, pred)) == (180L until 200L),
      "legacy reads stay correct, just unpruned")

    val v2 = ManifestStore.upgradeTable(spark, root)
    assert(v2 == 2L)
    val up = ManifestStore.latestSnapshot(spark, root).get
    assert(up.schema.isDefined && up.files.forall(f => f.rows.isDefined && f.stats.contains("id")))
    assert(ManifestStore.prunedEntries(up, pred).size < up.files.size,
      "the upgraded table must skip")
    assert(ids(ManifestStore.readWhere(spark, root, pred)) == (180L until 200L))
    // idempotent: a fully-enriched table is a no-op
    assert(ManifestStore.upgradeTable(spark, root) == 2L)
    // and ordinary appends compose on top
    assert(ManifestStore.append(spark, batch(200, 210), root) == 3L)
    assert(ids(ManifestStore.read(spark, root)) == (0L until 210L))
  }

  /** r10 review sweep: the places where skipping could go from "opens too
    * many files" (safe) to "opens too few" (silent row loss) — oversized
    * string bounds a writer may drop, all-null columns, wrong-typed meta
    * fields, empty-string partition values.
    */
  test("skipping stays conservative: huge strings, all-null columns, malformed meta, empty partition values") {
    import org.apache.spark.sql.sources._
    val root = freshRoot()
    // a value large enough that a writer may drop/truncate its binary
    // bounds — whatever parquet chose, the row must survive every
    // predicate it matches
    val huge = "z" * 5000
    val df = Seq((1L, "alpha", "x"), (2L, huge, null.asInstanceOf[String]))
      .toDF("id", "payload", "maybe")
    ManifestStore.append(spark, df, root)
    val got = ManifestStore.readWhere(spark, root, Seq(GreaterThan("payload", "y")))
      .select("id").as[Long].collect().toSeq
    assert(got == Seq(2L), s"oversized-bounds row lost to pruning: $got")

    // an all-null column file: IsNotNull prunes it, IsNull keeps it
    val root2 = freshRoot()
    ManifestStore.append(spark,
      Seq((1L, null.asInstanceOf[String])).toDF("id", "maybe"), root2)
    ManifestStore.append(spark, Seq((2L, "present")).toDF("id", "maybe"), root2)
    val snap2 = ManifestStore.latestSnapshot(spark, root2).get
    assert(ManifestStore.prunedEntries(snap2, Seq(IsNotNull("maybe"))).size == 1)
    assert(ids(ManifestStore.readWhere(spark, root2, Seq(IsNotNull("maybe")))) == Seq(2L))
    assert(ids(ManifestStore.readWhere(spark, root2, Seq(IsNull("maybe")))) == Seq(1L))

    // malformed meta fields degrade to stats-LESS (skip-nothing), never to
    // wrong stats like "no nulls here"
    import graft.sources.ManifestStats
    assert(ManifestStats.parseMeta("""{"r":10,"s":{"c":{"t":"long","n":"junk"}}}""").isEmpty)
    assert(ManifestStats.parseMeta("""{"r":"ten"}""").isEmpty)
    assert(ManifestStats.parseMeta("""{"s":{"c":{"t":5,"n":0}}}""").isEmpty)
    assert(ManifestStats.parseMeta("""{"p":{"k":7}}""").isEmpty)
    val ok = ManifestStats.parseMeta("""{"r":10,"s":{"c":{"t":"long","m":"1","x":"9","n":0}},"p":{"k":null}}""")
    assert(ok.exists { case (r, s, p, dv) =>
      r.contains(10L) && s("c").min.contains("1") && p.exists(_("k").isEmpty) && dv.isEmpty })
    // dv round-trip, and a malformed dv refuses the whole meta (a dropped
    // vector would resurrect deleted rows — it must never degrade)
    val okDv = ManifestStats.parseMeta("""{"r":10,"d":{"p":"file:/x/dv.parquet","n":3}}""")
    assert(okDv.exists { case (_, _, _, dv) =>
      dv.contains(graft.sources.ManifestStore.DvRef("file:/x/dv.parquet", 3L)) })
    assert(ManifestStats.parseMeta("""{"r":10,"d":{"p":"x"}}""").isEmpty)
    assert(ManifestStats.parseMeta("""{"r":10,"d":{"p":7,"n":3}}""").isEmpty)

    // empty-string partition values cannot round-trip (hive writes the
    // NULL sentinel) — refused at the append, not mutated silently
    val root3 = freshRoot()
    val e = intercept[IllegalArgumentException] {
      ManifestStore.append(spark, Seq((1L, "")).toDF("id", "key"), root3,
        partitionBy = Seq("key"))
    }
    assert(e.getMessage.contains("empty-string"), e.getMessage)
  }

  /** r10 #4 (VERDICT): the commit-point probe — a connector whose
    * create(overwrite=false) silently overwrites loses committed versions;
    * verifyCommitPoint turns that into a loud refusal up front.
    */
  test("verifyCommitPoint refuses a silently-overwriting filesystem, passes a compliant one") {
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new Path(freshRoot())

    val bad = new OverwritingFs
    bad.initialize(java.net.URI.create("badfs:///"), conf)
    val e = intercept[IllegalStateException] {
      ManifestStore.verifyCommitPoint(bad, root)
    }
    assert(e.getMessage.contains("commit-point"), e.getMessage)

    val good = new RenamedSchemeFs // RawLocal semantics under a non-file scheme
    good.initialize(java.net.URI.create("goodfs:///"), conf)
    ManifestStore.verifyCommitPoint(good, root) // must not throw
    // probes clean up after themselves
    val fs = root.getFileSystem(conf)
    val leftovers = fs.listStatus(new Path(root, "_manifests"))
      .map(_.getPath.getName).filter(_.startsWith(".probe-"))
    assert(leftovers.isEmpty, s"probe files left behind: ${leftovers.toSeq}")
  }

  /** r10 #6 (VERDICT): forced redelivery AT RATE — every micro-batch
    * delivered twice, the duplicate racing the original from another
    * thread (the worst-case retry storm). The txn watermark inside the
    * atomic commit must keep the table duplicate-free; the measured-rate
    * twin of this spec is graft.ManifestSlo (numbers in SCALE.md).
    */
  test("appendBatch under forced redelivery at rate: zero duplicate rows") {
    val root = freshRoot()
    val retriesBefore = ManifestStore.commitRetries.sum()
    for (b <- 0 until 8) {
      val df = batch(b * 10, b * 10 + 10)
      val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
      try {
        val tasks = (0 until 2).map(_ => pool.submit(
          new java.util.concurrent.Callable[Long] {
            def call(): Long =
              ManifestStore.appendBatch(spark, df, root, "rate-sink", b.toLong,
                maxRetries = 50)
          }))
        tasks.foreach(_.get())
      } finally pool.shutdown()
    }
    assert(ids(ManifestStore.read(spark, root)) == (0L until 80L),
      "redelivered batches must never double rows, even racing their original")
    val snap = ManifestStore.latestSnapshot(spark, root).get
    assert(snap.txns == Map("rate-sink" -> 7L))
    // the loser's orphaned batch dirs are vacuum food, not corpus rows
    ManifestStore.vacuum(spark, root, keepVersions = 1, minAgeMs = 0L)
    assert(ids(ManifestStore.read(spark, root)) == (0L until 80L))
    // the retry counter is an ops signal, monotone under contention
    assert(ManifestStore.commitRetries.sum() >= retriesBefore)
  }

  test("appendBatch drives a real Structured Streaming foreachBatch sink exactly-once") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = freshRoot()
    val mem = MemoryStream[Long]
    val q = mem.toDF().withColumnRenamed("value", "id")
      .writeStream.trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$root/_ckpt")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, batchId: Long) =>
        ManifestStore.appendBatch(df.sparkSession, df, root, "stream-sink", batchId)
        () // Unit: the Scala-2.13 foreachBatch overload
      }
    mem.addData(0L until 50L: _*)
    val run1 = q.start(); run1.awaitTermination()
    mem.addData(50L until 80L: _*)
    val run2 = q.start(); run2.awaitTermination()
    assert(ids(ManifestStore.read(spark, root)) == (0L until 80L),
      "each micro-batch committed exactly once across two stream restarts")
  }

  /** r11 (VERDICT r10 #2): the `_latest` pointer makes snapshot resolution
    * O(1) in version count, but is NEVER load-bearing — stale, corrupt,
    * dangling and absent hints all degrade to the full-listing answer.
    */
  test("_latest hint accelerates resolution; every broken-hint shape degrades to the listing") {
    val root = freshRoot()
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val hintP = new Path(s"$root/_manifests/_latest")
    for (b <- 0 until 5) ManifestStore.append(spark, batch(b * 10, b * 10 + 10), root)
    def hintText() = {
      val in = fs.open(hintP)
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim finally in.close()
    }
    assert(hintText() == "5", "every commit must refresh the hint")
    def headV() = ManifestStore.latestSnapshot(spark, root).get.version
    def overwriteHint(s: String): Unit = {
      val out = fs.create(hintP, true); out.write(s.getBytes("UTF-8")); out.close()
    }
    // stale hint: forward probes walk to the true head
    overwriteHint("2")
    assert(headV() == 5L, "stale hint must probe forward to the head")
    // corrupt hint: unparseable content falls back to the listing
    overwriteHint("not-a-version")
    assert(headV() == 5L)
    // dangling hint: plausible number whose manifest does not exist
    overwriteHint("40")
    assert(headV() == 5L)
    // absent hint (legacy table)
    fs.delete(hintP, false)
    assert(headV() == 5L)
    // and the commit path self-heals the hint
    ManifestStore.append(spark, batch(50, 60), root)
    assert(hintText() == "6" && headV() == 6L)
    assert(ids(ManifestStore.read(spark, root)) == (0L until 60L))
    // the unhinted comparison arm resolves identically
    assert(ManifestStore.latestSnapshotUnhinted(spark, root).get.version == 6L)
  }

  /** review r11: a flat column literally named "a.b" is indistinguishable
    * from struct leaf a.b in parquet's dot-string addressing — new writes
    * refuse, and legacy collisions never produce (merged, unsound) stats.
    */
  test("literal-dot column names refuse at write; legacy collisions yield no stats") {
    val root = freshRoot()
    val e = intercept[IllegalArgumentException] {
      ManifestStore.append(spark,
        spark.range(5).select(col("id"), lit(1L).as("a.b")), root)
    }
    assert(e.getMessage.contains("literal '.'"), e.getMessage)

    // legacy table holding BOTH a flat `a.b` (all null) and struct a{b}
    // (no nulls): merged stats would claim "100 nulls in 100 rows" and
    // prune IsNotNull wrongly — the colliding key must get NO stats
    val r2 = freshRoot()
    val fs = new Path(r2).getFileSystem(spark.sparkContext.hadoopConfiguration)
    spark.range(100).select(col("id"),
        struct(col("id").as("b")).as("a"),
        lit(null).cast("long").as("a.b"))
      .coalesce(1).write.parquet(s"$r2/data/batch-legacy")
    val files = fs.listStatus(new Path(s"$r2/data/batch-legacy"))
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
    val body = "graft-manifest v1\nversion=1\n" +
      files.map(f => s"${f.getPath.toString}\t${f.getLen}").mkString("", "\n", "\n")
    val sum = org.apache.commons.codec.digest.DigestUtils.md5Hex(body.getBytes("UTF-8"))
    fs.mkdirs(new Path(s"$r2/_manifests"))
    val out = fs.create(new Path(s"$r2/_manifests/v${"%020d".format(1)}.manifest"), false)
    out.write((body + s"checksum=$sum\n").getBytes("UTF-8")); out.close()

    ManifestStore.upgradeTable(spark, r2)
    val up = ManifestStore.latestSnapshot(spark, r2).get
    assert(up.files.forall(e2 => !e2.stats.contains("a.b")),
      s"colliding dot-string must never carry stats: ${up.files.head.stats.keySet}")
    assert(up.files.forall(_.stats.contains("id")), "non-colliding leaves still collect")
    // and the conservative outcome: IsNotNull keeps the file
    import org.apache.spark.sql.sources.IsNotNull
    assert(ManifestStore.prunedEntries(up, Seq(IsNotNull("a.b"))).size
      == up.files.size)
  }

  /** r11: merge-on-read MERGE — matched keys' old rows become deletion
    * vectors, updates append, ONE atomic version, zero rewrites. The
    * high-churn dimension-update shape.
    */
  test("merge-on-read upsert: replaced keys dv'd, updates appended, one version") {
    val root = freshRoot()
    ManifestStore.append(spark,
      spark.range(0, 10000).select(col("id"), lit("old").as("payload"))
        .repartitionByRange(8, col("id")).sortWithinPartitions("id"), root)
    val before = ManifestStore.latestSnapshot(spark, root).get
    // 100 existing keys (clustered at the top) + 101 brand-new ones
    val updates = spark.range(9900, 10101)
      .select(col("id"), lit("new").as("payload"))
    val (replaced, tagged, v) = ManifestStore.upsertByKeyMergeOnRead(
      spark, root, updates, Seq("id"), maxProbeKeys = 1000000)
    assert(replaced == 100L && v == before.version + 1,
      s"(replaced=$replaced, v=$v) — replace + insert must land in ONE version")
    assert(tagged > 0 && tagged < before.files.size,
      s"clustered keys must tag one slice: $tagged of ${before.files.size}")
    // every pre-existing data file keeps byte identity
    val after = ManifestStore.latestSnapshot(spark, root).get
    assert(before.files.map(e => (e.path, e.bytes)).toSet.subsetOf(
      after.files.map(e => (e.path, e.bytes)).toSet),
      "merge-on-read upsert must not rewrite data files")
    val t = ManifestStore.read(spark, root)
    assert(t.count() == 10101L)
    assert(t.select("id").distinct().count() == 10101L, "MERGE must not duplicate keys")
    assert(t.where(col("id") >= 9900).where(col("payload") =!= "new").count() == 0L)
    assert(t.where(col("id") < 9900 && col("payload") === "old").count() == 9900L)
    // an OVERLAPPING second merge: all 201 keys now exist — dv merge fires
    // on the original slice AND the first merge's own updates batch
    val updates2 = spark.range(9900, 10101)
      .select(col("id"), lit("newer").as("payload"))
    val (replaced2, _, v2) = ManifestStore.upsertByKeyMergeOnRead(
      spark, root, updates2, Seq("id"), maxProbeKeys = 1000000)
    assert(replaced2 == 201L && v2 == v + 1, s"(replaced2=$replaced2)")
    val t2 = ManifestStore.read(spark, root)
    assert(t2.count() == 10101L)
    assert(t2.where(col("id") >= 9900).where(col("payload") =!= "newer").count() == 0L)
    // pure insert through the MoR path: no candidate file holds the keys
    val (r3, g3, v3) = ManifestStore.upsertByKeyMergeOnRead(spark, root,
      spark.range(50000, 50010).select(col("id"), lit("x").as("payload")),
      Seq("id"))
    assert(r3 == 0L && g3 == 0 && v3 == v2 + 1)
    assert(ManifestStore.read(spark, root).count() == 10111L)
    // a compaction retires all vectors and preserves the merged content
    ManifestStore.compact(spark, root, targetFileBytes = 1L << 30)
    val snapC = ManifestStore.latestSnapshot(spark, root).get
    assert(snapC.files.forall(_.dv.isEmpty))
    assert(ManifestStore.read(spark, root).count() == 10111L)
    assert(ManifestStore.read(spark, root)
      .where(col("id") >= 9900 && col("id") < 10101)
      .where(col("payload") =!= "newer").count() == 0L)
  }

  /** r11: STRUCT leaves get min/max stats under parquet's dotted path, so
    * nested predicates prune files — through the library Filter ADT
    * (dotted attribute names) AND the planner (GetStructField
    * translation); per-leaf null counts follow Spark's `a.b IS NULL`
    * semantics (parent-null rows count).
    */
  test("nested struct stats: dotted predicates prune library and format reads") {
    import org.apache.spark.sql.sources._
    val root = freshRoot()
    val df = spark.range(0, 1000).select(col("id"),
      struct((col("id") * 2).as("k"), concat(lit("s"), col("id")).as("s")).as("meta"))
    ManifestStore.append(spark,
      df.repartitionByRange(8, col("id")).sortWithinPartitions("id"), root)
    val snap = ManifestStore.latestSnapshot(spark, root).get
    assert(snap.files.forall(e => e.stats.contains("meta.k") && e.stats.contains("meta.s")),
      s"nested leaf stats missing: ${snap.files.head.stats.keySet}")
    val pred = Seq(GreaterThanOrEqual("meta.k", 1800L))
    val kept = ManifestStore.prunedEntries(snap, pred)
    assert(kept.nonEmpty && kept.size < snap.files.size,
      s"nested pruning inert: ${kept.size}/${snap.files.size}")
    assert(ManifestStore.readWhere(spark, root, pred).count() == 100L) // ids 900..999
    // through the planner: GetStructField chains translate to dotted keys
    val fmt = spark.read.format("graft-manifest").load(root)
      .where(col("meta.k") >= 1800L)
    fmt.collect()
    val opened = fmt.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec =>
        s.metrics("numFiles").value
    }.sum
    assert(opened > 0 && opened < snap.files.size,
      s"planner-routed nested skipping inert: $opened of ${snap.files.size}")
    assert(fmt.count() == 100L)
    // parent-null rows: IsNull keeps the null-struct file, IsNotNull prunes it
    ManifestStore.append(spark, spark.range(2000, 2010).select(col("id"),
      lit(null).cast(df.schema("meta").dataType).as("meta")), root)
    assert(ManifestStore.readWhere(spark, root, Seq(IsNull("meta.k"))).count() == 10L)
    val snap2 = ManifestStore.latestSnapshot(spark, root).get
    assert(ManifestStore.prunedEntries(snap2, Seq(IsNotNull("meta.k"))).size
      < snap2.files.size, "all-null struct file must prune for IsNotNull")
    assert(ManifestStore.readWhere(spark, root, Seq(IsNotNull("meta.k"))).count() == 1000L)
  }

  /** r11: MERGE-ON-READ delete (deletion vectors) — a delete costs
    * O(matched rows) in dv bytes while data files keep byte identity;
    * every library read applies the vectors; re-deletes merge; rewrites
    * materialize them away; the format read refuses until then.
    */
  test("merge-on-read delete: byte-identical files, applied vectors, merge, materialize") {
    import org.apache.spark.sql.sources._
    val root = freshRoot()
    ManifestStore.append(spark,
      spark.range(0, 1000).select(col("id"), (col("id") % 10).as("m"))
        .repartitionByRange(8, col("id")).sortWithinPartitions("id"), root)
    val before = ManifestStore.latestSnapshot(spark, root).get

    // delete a clustered slice: ids < 250
    val (n1, tagged1, v1) =
      ManifestStore.deleteWhereMergeOnRead(spark, root, Seq(LessThan("id", 250L)))
    assert(n1 == 250L && v1 == 2L)
    assert(tagged1 > 0 && tagged1 < before.files.size,
      s"MoR delete should tag only the matching slice: $tagged1 of ${before.files.size}")
    val after1 = ManifestStore.latestSnapshot(spark, root).get
    // data files keep BYTE IDENTITY (same paths, same sizes)
    assert(after1.files.map(e => e.path -> e.bytes).toSet ==
      before.files.map(e => e.path -> e.bytes).toSet,
      "merge-on-read must not rewrite data files")
    assert(ids(ManifestStore.read(spark, root)) == (250L until 1000L))
    // skipping still composes with vectors
    assert(ids(ManifestStore.readWhere(spark, root, Seq(LessThan("id", 400L))))
      == (250L until 400L))

    // a second, OVERLAPPING delete merges vectors (re-deleting dead rows
    // is vacuous; the counts stay exact)
    val (n2, _, v2) =
      ManifestStore.deleteWhereMergeOnRead(spark, root, Seq(LessThan("id", 300L)))
    assert(n2 == 50L && v2 == 3L, s"overlap must count only LIVE matches: $n2")
    assert(ids(ManifestStore.read(spark, root)) == (300L until 1000L))
    val merged = ManifestStore.latestSnapshot(spark, root).get
    assert(merged.files.flatMap(_.dv).map(_.rows).sum == 300L)

    // r13: with GraftExtensions installed the planner-integrated format
    // APPLIES live vectors (ManifestDvApplyRule attaches the scan-side
    // bitmap filter); the r12 refusal remains for extension-less sessions
    assert(spark.read.format("graft-manifest").load(root).count() == 700L,
      "format read must apply live deletion vectors under GraftExtensions")
    assert(spark.read.format("graft-manifest").load(root)
      .where(col("id") < 400L).count() == 100L,
      "vectors compose with pushed filters on the format path")

    // CoW delete on the dv-carrying slice counts LIVE rows only, and its
    // rewrite naturally materializes the touched vectors away
    val (n3, _, _) =
      ManifestStore.deleteWhere(spark, root, Seq(LessThan("id", 350L)))
    assert(n3 == 50L, s"CoW over dv files must not count dead rows: $n3")
    assert(ids(ManifestStore.read(spark, root)) == (350L until 1000L))
    assert(ManifestStore.latestSnapshot(spark, root).get.files.forall(_.dv.isEmpty),
      "a CoW rewrite over dv files must drop their vectors")

    // time travel still sees the pre-delete snapshot
    assert(ManifestStore.readVersion(spark, root, 1L).count() == 1000L)

    // a fresh MoR delete, then ON-DEMAND materialization hands the table
    // back to the format read
    assert(ManifestStore.deleteWhereMergeOnRead(spark, root,
      Seq(LessThan("id", 400L)))._1 == 50L)
    val (nMat, vMat) = ManifestStore.materializeDeletes(spark, root)
    assert(nMat > 0 && vMat > 0)
    assert(ManifestStore.latestSnapshot(spark, root).get.files.forall(_.dv.isEmpty))
    assert(spark.read.format("graft-manifest").load(root).count() == 600L)
    assert(ids(ManifestStore.read(spark, root)) == (400L until 1000L))
    // idempotent
    assert(ManifestStore.materializeDeletes(spark, root)._1 == 0)

    // full wipe on an UNPARTITIONED table: reads go empty (never throw),
    // and materialization yields a readable zero-row table — the format
    // read's own recovery recipe must be satisfiable (review r11)
    val rootW = freshRoot()
    ManifestStore.append(spark, batch(0, 100), rootW)
    val (nW, _, _) = ManifestStore.deleteWhereMergeOnRead(spark, rootW,
      Seq(LessThan("id", 10000L)))
    assert(nW == 100L)
    assert(ManifestStore.read(spark, rootW).count() == 0L)
    val (nMatW, vW) = ManifestStore.materializeDeletes(spark, rootW)
    assert(nMatW > 0 && vW > 0)
    assert(ManifestStore.read(spark, rootW).count() == 0L)
    assert(spark.read.format("graft-manifest").load(rootW).count() == 0L)
  }

  test("merge-on-read delete: partitioned tables, no-match no-op, vacuum keeps dv dirs, CDC refusal") {
    import org.apache.spark.sql.sources._
    val root = freshRoot()
    ManifestStore.append(spark,
      (0 until 300).map(i => (i.toLong, s"d${i % 3}")).toDF("id", "day"),
      root, partitionBy = Seq("day"))
    val v1 = ManifestStore.latestSnapshot(spark, root).get.version

    // no live match → no-op, no commit
    val (n0, t0, vSame) = ManifestStore.deleteWhereMergeOnRead(
      spark, root, Seq(GreaterThan("id", 100000L)))
    assert(n0 == 0L && t0 == 0 && vSame == v1)

    // partition-scoped delete: only d1's rows vanish; partition columns
    // survive the dv-filtered reconstruction
    val (n1, _, _) = ManifestStore.deleteWhereMergeOnRead(spark, root,
      Seq(EqualTo("day", "d1"), LessThan("id", 150L)))
    assert(n1 == 50L)
    val t = ManifestStore.read(spark, root)
    assert(t.count() == 250L)
    assert(t.where(col("day") === "d1").count() == 50L)
    assert(t.where(col("day") === "d1").select("id").as[Long].collect().forall(_ >= 150L))

    // readAddedSince refuses across the dv change (a delete is no append)
    val eCdc = intercept[IllegalArgumentException] {
      ManifestStore.readAddedSince(spark, root, v1)
    }
    assert(eCdc.getMessage.contains("deletion vector"), eCdc.getMessage)

    // vacuum with aggressive settings must keep the LIVE dv dirs (and the
    // deleted rows must stay deleted after it)
    ManifestStore.vacuum(spark, root, keepVersions = 1, minAgeMs = 0L)
    assert(ManifestStore.read(spark, root).count() == 250L)

    // append after MoR delete composes
    ManifestStore.append(spark,
      (300 until 310).map(i => (i.toLong, "d1")).toDF("id", "day"),
      root, partitionBy = Seq("day"))
    assert(ManifestStore.read(spark, root).count() == 260L)
  }

  test("merge-on-read delete: racing rewrites abandon instead of resurrecting rows") {
    import org.apache.spark.sql.sources._
    val root = freshRoot()
    ManifestStore.append(spark,
      spark.range(0, 400).select(col("id"), lit("x").as("p"))
        .repartitionByRange(4, col("id")).sortWithinPartitions("id"), root)
    val stale = ManifestStore.latestSnapshot(spark, root).get
    // a MoR delete lands after `stale` was read
    val (nd, _, _) = ManifestStore.deleteWhereMergeOnRead(
      spark, root, Seq(LessThan("id", 100L)))
    assert(nd == 100L)
    // a compaction still holding the PRE-delete snapshot must abandon —
    // committing its rewrite would resurrect the 100 deleted rows
    val (_, _, vc) = ManifestStore.compactFrom(spark, root, stale, 1L << 30)
    assert(vc == -1L, "stale compaction over a moved dv must abandon")
    assert(ManifestStore.read(spark, root).count() == 300L)
    // a stale MoR delete must abandon too (racing MoR deletes on one file
    // must not lose positions)
    val (nStale, _, vStale) = ManifestStore.deleteMorFrom(spark, root, stale,
      Seq(LessThan("id", 150L)))
    assert(vStale == -1L && nStale == 0L, s"($nStale, $vStale)")
    assert(ManifestStore.read(spark, root).count() == 300L)
    // a FRESH compaction materializes the vectors and preserves content
    val (_, _, vc2) = ManifestStore.compact(spark, root, targetFileBytes = 1L << 30)
    assert(vc2 > 0)
    val snap = ManifestStore.latestSnapshot(spark, root).get
    assert(snap.files.forall(_.dv.isEmpty))
    assert(ids(ManifestStore.read(spark, root)) == (100L until 400L))
  }

  /** advice r11 (high): parquet stats order ±0.0 inconsistently across
    * writers, and Double.compare calls -0.0 < 0.0 — but the engine's own
    * comparison is IEEE, where they are EQUAL. A zero-bounded file must
    * never be pruned away from the zero literal of the other sign.
    */
  test("signed-zero double bounds never prune an IEEE-equal match") {
    import org.apache.spark.sql.sources._
    val root = freshRoot()
    // one file whose only value is -0.0, one whose only value is +0.0,
    // one clearly disjoint file the predicate SHOULD prune
    ManifestStore.append(spark, Seq((1L, -0.0d)).toDF("id", "v"), root)
    ManifestStore.append(spark, Seq((2L, 0.0d)).toDF("id", "v"), root)
    ManifestStore.append(spark, Seq((3L, 42.0d)).toDF("id", "v"), root)
    for (zero <- Seq(0.0d, -0.0d)) {
      assert(ids(ManifestStore.readWhere(spark, root, Seq(EqualTo("v", zero))))
        == Seq(1L, 2L), s"rows IEEE-equal to $zero lost to signed-zero pruning")
      assert(ids(ManifestStore.readWhere(spark, root,
        Seq(GreaterThanOrEqual("v", zero)))) == Seq(1L, 2L, 3L))
      assert(ids(ManifestStore.readWhere(spark, root,
        Seq(LessThanOrEqual("v", zero)))) == Seq(1L, 2L))
    }
    // the skip itself still fires on the disjoint file
    val snap = ManifestStore.latestSnapshot(spark, root).get
    assert(ManifestStore.prunedEntries(snap, Seq(EqualTo("v", 0.0d))).size
      < snap.files.size, "zero-equality must still prune the 42.0 file")
  }

  /** r11 (VERDICT r10 #1): the `graft-manifest` format — idiomatic
    * `spark.read.format(...).load(root).where(...)` gets manifest-stats
    * file skipping THROUGH THE PLANNER (no hand-built Filter ADT), the
    * scan stays Spark's native vectorized parquet path, and planning
    * never lists a data directory.
    */
  test("graft-manifest format: idiomatic where() prunes files through the planner") {
    val root = freshRoot()
    ManifestStore.append(spark,
      spark.range(0, 10000).select(col("id"), (col("id") * 2).as("v"))
        .repartitionByRange(8, col("id")).sortWithinPartitions("id"), root)
    val snap = ManifestStore.latestSnapshot(spark, root).get
    assert(snap.files.size == 8)

    val df = spark.read.format("graft-manifest").load(root)
      .where(col("id") >= 9000)
    df.collect() // populate scan metrics on THIS queryExecution
    val scans = df.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(scans.size == 1, s"expected one file scan:\n${df.queryExecution.executedPlan}")
    val opened = scans.head.metrics("numFiles").value
    assert(opened > 0 && opened < snap.files.size,
      s"planner-routed skipping inert: opened $opened of ${snap.files.size}")
    // answer parity with the library readWhere
    import org.apache.spark.sql.sources.GreaterThanOrEqual
    assert(df.count() == 1000L)
    assert(df.agg(sum("v")).as[Long].head() ==
      ManifestStore.readWhere(spark, root, Seq(GreaterThanOrEqual("id", 9000L)))
        .agg(sum("v")).as[Long].head())
    // parquet row-group pushdown still fires on top of file skipping
    val planStr = scans.head.toString
    assert(planStr.contains("PushedFilters") && planStr.contains("GreaterThanOrEqual(id,9000)"),
      s"parquet pushdown missing:\n$planStr")
    assert(planStr.contains("ManifestFileIndex"), s"wrong file index:\n$planStr")

    // the library convenience twin plans identically
    assert(ManifestStore.table(spark, root).where(col("id") >= 9000).count() == 1000L)

    // fully-pruned: a predicate outside every file's bounds plans a
    // zero-file scan and answers empty (never throws)
    assert(spark.read.format("graft-manifest").load(root)
      .where(col("id") >= 1000000).count() == 0L)

    // a schema the translator cannot push (arithmetic on the column) stays
    // correct — it just opens every file
    assert(spark.read.format("graft-manifest").load(root)
      .where(col("id") % 7 === 3).count() ==
      spark.range(0, 10000).where(col("id") % 7 === 3).count())
  }

  test("graft-manifest format: partition pruning, evolution null-fill, versionAsOf") {
    val root = freshRoot()
    val d0 = (0 until 50).map(i => (i.toLong, "d0")).toDF("id", "day")
    val d1 = (50 until 120).map(i => (i.toLong, "d1")).toDF("id", "day")
    ManifestStore.append(spark, d0, root, partitionBy = Seq("day"))
    ManifestStore.append(spark, d1, root, partitionBy = Seq("day"))
    val snap = ManifestStore.latestSnapshot(spark, root).get

    val df = spark.read.format("graft-manifest").load(root)
      .where(col("day") === "d1")
    df.collect()
    val opened = df.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec =>
        s.metrics("numFiles").value
    }.sum
    assert(opened > 0 && opened < snap.files.size,
      s"partition pruning inert through the planner: $opened of ${snap.files.size}")
    assert(df.count() == 70L)
    assert(df.select("id").as[Long].collect().sorted.toSeq == (50L until 120L))

    // schema evolution: a widened column null-fills old files through the
    // format read too
    ManifestStore.append(spark,
      (120 until 130).map(i => (i.toLong, "d2", s"x$i")).toDF("id", "day", "extra"),
      root, partitionBy = Seq("day"))
    val widened = spark.read.format("graft-manifest").load(root)
    assert(widened.columns.toSet == Set("id", "extra", "day"))
    assert(widened.where(col("extra").isNull).count() == 120L)

    // versionAsOf time travel replays the old file set and schema
    val v2 = spark.read.format("graft-manifest")
      .option("versionAsOf", "2").load(root)
    assert(v2.columns.toSet == Set("id", "day") && v2.count() == 120L)

    // a NON-STRING partition column round-trips through the catalyst
    // partition-value conversion (int here; the hive path stores text)
    val root2 = freshRoot()
    ManifestStore.append(spark,
      (0 until 40).map(i => (i.toLong, i % 4)).toDF("id", "bucket"),
      root2, partitionBy = Seq("bucket"))
    val byBucket = spark.read.format("graft-manifest").load(root2)
      .where(col("bucket") === 3)
    assert(byBucket.count() == 10L)
    assert(byBucket.select("bucket").distinct().as[Int].collect().toSeq == Seq(3))

    // r14: a default-mode (ErrorIfExists) save BIRTHS a table when no
    // manifest exists — and refuses once one does
    d0.write.format("graft-manifest").save(s"$root-other")
    assert(ManifestStore.read(spark, s"$root-other").count() == d0.count())
    intercept[Exception] {
      d0.write.format("graft-manifest").save(s"$root-other")
    }
  }

  /** r11: the format registers in the SQL catalog — `CREATE TABLE ...
    * USING graft-manifest` + plain SQL gets the same planner-routed file
    * skipping, and REFRESH TABLE re-resolves to the newest snapshot.
    */
  test("graft-manifest tables register in the SQL catalog and prune through SQL") {
    val root = freshRoot()
    ManifestStore.append(spark,
      spark.range(0, 8000).select(col("id"), (col("id") * 5).as("v"))
        .repartitionByRange(8, col("id")).sortWithinPartitions("id"), root)
    spark.sql(s"CREATE TABLE graft_sql_probe USING `graft-manifest` OPTIONS (path '$root')")
    try {
      val df = spark.sql("SELECT id, v FROM graft_sql_probe WHERE id >= 7000")
      df.collect()
      val opened = df.queryExecution.executedPlan.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec =>
          s.metrics("numFiles").value
      }.sum
      assert(opened > 0 && opened < 8,
        s"SQL-path skipping inert: opened $opened of 8")
      assert(df.count() == 1000L)
      // appends become visible after REFRESH TABLE (createRelation
      // re-resolves the latest snapshot)
      ManifestStore.append(spark,
        spark.range(8000, 8100).select(col("id"), (col("id") * 5).as("v")), root)
      spark.sql("REFRESH TABLE graft_sql_probe")
      assert(spark.sql("SELECT count(*) AS n FROM graft_sql_probe")
        .as[Long].head() == 8100L)
    } finally spark.sql("DROP TABLE IF EXISTS graft_sql_probe")
  }

  /** r12 (VERDICT r11 #5): the WRITE idiom — SQL INSERT INTO a registered
    * table and df.write.format("graft-manifest").mode("append") both land
    * as committed manifest versions through the append protocol; INSERT
    * OVERWRITE and writer overwrite refuse with the recipe; concurrent
    * INSERTs rebase and union (the o12 contract).
    */
  test("SQL INSERT INTO and writer append commit through the manifest protocol") {
    val root = freshRoot()
    ManifestStore.append(spark, batch(0, 10).coalesce(1), root)
    spark.sql(s"CREATE TABLE graft_ins_probe USING `graft-manifest` OPTIONS (path '$root')")
    try {
      // INSERT INTO ... VALUES → one committed version, visible post-refresh
      spark.sql("INSERT INTO graft_ins_probe VALUES (100L, 'row-100'), (101L, 'row-101')")
      assert(ManifestStore.latestSnapshot(spark, root).get.version == 2L,
        "one INSERT = one committed version")
      assert(ids(ManifestStore.read(spark, root)) ==
        ((0L until 10L) ++ Seq(100L, 101L)))
      // INSERT INTO ... SELECT
      spark.sql("INSERT INTO graft_ins_probe SELECT id, concat('row-', id) FROM range(200, 203)")
      assert(ids(ManifestStore.read(spark, root)) ==
        ((0L until 10L) ++ Seq(100L, 101L, 200L, 201L, 202L)))
      // the files landed under data/batch-*, referenced by the manifest —
      // never bare parquet at the table root
      val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
      assert(!fs.listStatus(new Path(root)).exists(s =>
        s.isFile && s.getPath.getName.endsWith(".parquet")),
        "INSERT must not write unreferenced parquet at the table root")
      // INSERT OVERWRITE on an UNPARTITIONED table refuses with the
      // replaceWhere recipe (r15: partitioned tables get the dynamic
      // partition overwrite — ManifestOverwriteSpec)
      val eOver = intercept[Exception] {
        spark.sql("INSERT OVERWRITE graft_ins_probe VALUES (1L, 'x')")
      }
      assert(eOver.getMessage.contains("replaceWhere"), eOver.getMessage)
      // concurrent INSERTs rebase: both batches survive
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration._
      import scala.concurrent.ExecutionContext.Implicits.global
      val racers = (0 until 4).map { k =>
        Future(spark.sql(
          s"INSERT INTO graft_ins_probe SELECT id, concat('c', id) FROM range(${300 + 10 * k}, ${305 + 10 * k})"))
      }
      Await.result(Future.sequence(racers), 120.seconds)
      assert(ids(ManifestStore.read(spark, root)).count(_ >= 300L) == 20,
        "a concurrent INSERT was lost instead of rebasing")
    } finally spark.sql("DROP TABLE IF EXISTS graft_ins_probe")

    // writer path: append commits; other modes refuse; partitioning reused
    val r2 = freshRoot()
    batch(0, 6).withColumn("day", concat(lit("d"), col("id") % 2))
      .write.format("graft-manifest").partitionBy("day").mode("append").save(r2)
    assert(ManifestStore.latestSnapshot(spark, r2).get.partCols == Seq("day"))
    // second append WITHOUT partitionBy: the table's layout is reused
    batch(6, 9).withColumn("day", lit("d1"))
      .write.format("graft-manifest").mode("append").save(r2)
    assert(ids(ManifestStore.read(spark, r2)) == (0L until 9L))
    assert(ManifestStore.readWhere(spark, r2,
      Seq(org.apache.spark.sql.sources.EqualTo("day", "d0")))
      .count() == 3L)
    val eW = intercept[Exception] {
      batch(0, 2).write.format("graft-manifest").mode("overwrite").save(r2)
    }
    assert(eW.getMessage.contains("cannot replace it"), eW.getMessage)
  }

  /** review r11: partition-only predicates are REMOVED from the post-scan
    * filters by FileSourceStrategy, so the index must enforce them EXACTLY
    * — including shapes the pruning translator cannot express (function-
    * wrapped, null-laden IN, null-safe equality). A conservative keep here
    * is not conservative: it returns rows the query filtered out.
    */
  test("graft-manifest format: untranslatable partition predicates are enforced exactly") {
    val root = freshRoot()
    val df = (0 until 90).map(i => (i.toLong, s"d${i % 3}")).toDF("id", "day")
    ManifestStore.append(spark, df, root, partitionBy = Seq("day"))
    val t = spark.read.format("graft-manifest").load(root)
    // function-wrapped: translate() cannot express upper(day)
    assert(t.where(upper(col("day")) === "D1").count() == 30L,
      "function-wrapped partition predicate not enforced")
    assert(t.where(upper(col("day")) === "D1")
      .select("id").as[Long].collect().forall(_ % 3 == 1))
    // IN with a null member
    assert(t.where(col("day").isin(null, "d2")).count() == 30L)
    // null-safe equality against a non-null literal
    assert(t.where(col("day") <=> "d0").count() == 30L)
    // and the exact evaluation also PRUNES (not just corrects): the
    // wrapped-equality scan opens only d1's files
    val q = t.where(upper(col("day")) === "D1")
    q.collect()
    val opened = q.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec =>
        s.metrics("numFiles").value
    }.sum
    val total = ManifestStore.latestSnapshot(spark, root).get.files.size
    assert(opened > 0 && opened < total,
      s"exact partition evaluation should prune: opened $opened of $total")
  }

  /** r11 (VERDICT r10 #5): above maxProbeKeys the upsert's exact key-set
    * probe is off, but a clustered bulk update must still rewrite only its
    * key-range slice (per-column min/max from the audit agg), never the
    * whole table.
    */
  test("over-cap upsert prunes by key range: a clustered bulk update rewrites one slice") {
    val root = freshRoot()
    val table = spark.range(0, 40000).select(col("id"), lit("old").as("payload"))
    ManifestStore.append(spark,
      table.repartitionByRange(8, col("id")).sortWithinPartitions("id"), root)
    val before = ManifestStore.latestSnapshot(spark, root).get
    assert(before.files.size == 8)
    // 5000 distinct keys (cap is 100) confined to the first slice's range
    val updates = spark.range(0, 5000).select(col("id"), lit("new").as("payload"))
    val (replaced, rewritten, v) = ManifestStore.upsertByKey(
      spark, root, updates, Seq("id"), maxProbeKeys = 100)
    assert(v > 0 && replaced == 5000L, s"(replaced=$replaced, v=$v)")
    assert(rewritten > 0 && rewritten <= 2,
      s"range-confined over-cap update rewrote $rewritten of 8 files")
    val after = ManifestStore.read(spark, root)
    assert(after.count() == 40000L)
    assert(after.where(col("payload") === "new").count() == 5000L)
    assert(after.where(col("id") < 5000 && col("payload") === "old").count() == 0L)
  }

  /** r11 (VERDICT r10 #4): decimal columns get min/max stats — over all
    * three physical widths Spark writes (INT32 ≤9 digits, INT64 ≤18,
    * FIXED_LEN_BYTE_ARRAY beyond) — so decimal-keyed reads AND deletes
    * prune files; double literals against decimal stats are kept, never
    * pruned (the residual comparison casts the decimal DOWN to double).
    */
  test("decimal stats prune reads and deletes across all physical widths") {
    import org.apache.spark.sql.sources._
    val root = freshRoot()
    val df = spark.range(0, 1000).select(col("id"),
      (col("id") / 100.0).cast("decimal(8,2)").as("p32"),
      (col("id") / 100.0).cast("decimal(12,2)").as("p64"),
      (col("id") / 100.0).cast("decimal(24,6)").as("pbin"))
    ManifestStore.append(spark,
      df.repartitionByRange(8, col("id")).sortWithinPartitions("id"), root)
    val snap = ManifestStore.latestSnapshot(spark, root).get
    val nine = new java.math.BigDecimal("9.00")
    for (c <- Seq("p32", "p64", "pbin")) {
      assert(snap.files.forall(_.stats.contains(c)), s"$c stats not harvested")
      val kept = ManifestStore.prunedEntries(snap, Seq(GreaterThanOrEqual(c, nine)))
      assert(kept.nonEmpty && kept.size < snap.files.size,
        s"decimal pruning inert on $c: ${kept.size}/${snap.files.size}")
      assert(ManifestStore.readWhere(spark, root, Seq(GreaterThanOrEqual(c, nine)))
        .count() == 100L, s"pruned read wrong on $c") // ids 900..999
    }
    // a double literal must keep every file (conservative), and the read
    // still answers through the residual filter
    assert(ManifestStore.prunedEntries(snap, Seq(GreaterThanOrEqual("p64", 9.0d)))
      .size == snap.files.size, "double-vs-decimal must not prune")
    assert(ManifestStore.readWhere(spark, root,
      Seq(GreaterThanOrEqual("p64", 9.0d))).count() == 100L)
    // decimal-keyed copy-on-write DELETE rewrites only the matching slice
    val one = new java.math.BigDecimal("1.00")
    val (nDel, rewritten, _) =
      ManifestStore.deleteWhere(spark, root, Seq(LessThan("p64", one)))
    assert(nDel == 100L, s"deleted $nDel") // ids 0..99
    assert(rewritten > 0 && rewritten < snap.files.size,
      s"decimal delete rewrote $rewritten of ${snap.files.size}")
    assert(ManifestStore.read(spark, root).count() == 900L)
  }

  /** advice r11 (medium): a zero-file micro-batch (any empty PARTITIONED
    * frame — an all-dropped first dedup batch) must be a no-op, never a
    * zero-file manifest that read() then refuses by contract.
    */
  test("appendBatch with a zero-file partitioned batch is a no-op, table stays readable") {
    val root = freshRoot()
    val empty = batch(0, 0).withColumn("day", lit("d0")).where(lit(false))
    // fresh table: must NOT commit an unreadable zero-file manifest
    val v0 = ManifestStore.appendBatch(spark, empty, root, "sink", 0L,
      partitionBy = Seq("day"))
    assert(v0 == 0L && ManifestStore.latestSnapshot(spark, root).isEmpty,
      "an all-dropped first batch must leave the table uninitialized")
    // a real batch then creates the table normally
    val v1 = ManifestStore.appendBatch(spark,
      batch(0, 5).withColumn("day", lit("d1")), root, "sink", 1L,
      partitionBy = Seq("day"))
    assert(v1 == 1L && ids(ManifestStore.read(spark, root)) == (0L until 5L))
    // and a later zero-file batch no-ops against the live table too
    val v2 = ManifestStore.appendBatch(spark, empty, root, "sink", 2L,
      partitionBy = Seq("day"))
    assert(v2 == 1L, "zero-file batch must not mint a version")
    assert(ids(ManifestStore.read(spark, root)) == (0L until 5L))
  }

  /** advice r11 (low): legacy (pre-schema-line) tables seed their schema
    * from the UNION of footers, not files.head's — a mixed-footer table
    * must not permanently drop the columns that live only in other files.
    */
  test("legacy schema seeding unions mixed footers instead of trusting one") {
    val fs = new Path(freshRoot()).getFileSystem(spark.sparkContext.hadoopConfiguration)
    def mkLegacy(root: String): Unit = {
      // two footers with DIFFERENT column sets: (id, a) and (id, b)
      Seq((1L, "a1")).toDF("id", "a").write.parquet(s"$root/data/batch-l1")
      Seq((2L, "b2")).toDF("id", "b").write.parquet(s"$root/data/batch-l2")
      val files = Seq("batch-l1", "batch-l2").flatMap(d =>
        fs.listStatus(new Path(s"$root/data/$d"))
          .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet")))
      val body = "graft-manifest v1\nversion=1\n" +
        files.map(f => s"${f.getPath.toString}\t${f.getLen}").mkString("", "\n", "\n")
      val sum = org.apache.commons.codec.digest.DigestUtils.md5Hex(body.getBytes("UTF-8"))
      fs.mkdirs(new Path(s"$root/_manifests"))
      val out = fs.create(new Path(s"$root/_manifests/v${"%020d".format(1)}.manifest"), false)
      out.write((body + s"checksum=$sum\n").getBytes("UTF-8")); out.close()
    }
    // upgradeTable path: the committed schema must carry BOTH a and b
    val r1 = freshRoot(); mkLegacy(r1)
    ManifestStore.upgradeTable(spark, r1)
    val up = ManifestStore.latestSnapshot(spark, r1).get
    assert(up.schema.exists(s => s.fieldNames.contains("a") && s.fieldNames.contains("b")),
      s"upgrade seeded a head-footer-only schema: ${up.schema}")
    assert(ManifestStore.read(spark, r1).columns.toSet == Set("id", "a", "b"))
    // append path: the merged schema unions footers too
    val r2 = freshRoot(); mkLegacy(r2)
    ManifestStore.append(spark, Seq((3L, "a3")).toDF("id", "a"), r2)
    val ap = ManifestStore.latestSnapshot(spark, r2).get
    assert(ap.schema.exists(s => s.fieldNames.contains("b")),
      s"append seeding dropped column b: ${ap.schema}")
    assert(ManifestStore.read(spark, r2).where(col("b").isNotNull).count() == 1L)
  }

  /** advice r12 (was r11 low): a file appended AFTER fromVersion that then
    * gained a deletion vector within the same polled range carries a dv the
    * from-snapshot never saw — "new files" would emit its NET rows and
    * silently hide the delete. The refusal must cover it.
    */
  test("readAddedSince refuses a dv on an in-range-ADDED file") {
    import org.apache.spark.sql.sources._
    val root = freshRoot()
    ManifestStore.append(spark, batch(0, 10).coalesce(1), root) // v1
    ManifestStore.append(spark, batch(10, 20).coalesce(1), root) // v2
    // stats-pruned to v2's file only: v1's entries keep their (absent) dv,
    // so the old shared-file check alone would let this slip through
    val (nd, _, _) = ManifestStore.deleteWhereMergeOnRead(
      spark, root, Seq(GreaterThanOrEqual("id", 15L)))
    assert(nd == 5L)
    val e = intercept[IllegalArgumentException] {
      ManifestStore.readAddedSince(spark, root, 1L)
    }
    assert(e.getMessage.contains("appended after"), e.getMessage)
  }

  /** advice r12: the literal-dot refusal guards EXTERNAL frames only — a
    * legacy table that already carries a flat `a.b` column must stay
    * compactable and deletable in place (the maintenance rewrite reads the
    * table's own committed schema; the collision predates the guard).
    */
  test("legacy dotted-column tables stay compactable and deletable") {
    val root = freshRoot()
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    spark.range(100).select(col("id"), lit(7L).as("a.b"))
      .coalesce(1).write.parquet(s"$root/data/batch-legacy")
    val files = fs.listStatus(new Path(s"$root/data/batch-legacy"))
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
    val body = "graft-manifest v1\nversion=1\n" +
      files.map(f => s"${f.getPath.toString}\t${f.getLen}").mkString("", "\n", "\n")
    val sum = org.apache.commons.codec.digest.DigestUtils.md5Hex(body.getBytes("UTF-8"))
    fs.mkdirs(new Path(s"$root/_manifests"))
    val out = fs.create(new Path(s"$root/_manifests/v${"%020d".format(1)}.manifest"), false)
    out.write((body + s"checksum=$sum\n").getBytes("UTF-8")); out.close()
    ManifestStore.upgradeTable(spark, root)

    val (nb, na, vc) = ManifestStore.compact(spark, root, targetFileBytes = 1L << 30)
    assert(vc > 0, s"compaction of a legacy dotted table must commit, got $vc")
    assert(nb == 1 && na >= 1)
    assert(ManifestStore.read(spark, root).count() == 100L)
    assert(ManifestStore.read(spark, root).columns.toSet == Set("id", "a.b"))

    import org.apache.spark.sql.sources.LessThan
    val (deleted, _, vd) = ManifestStore.deleteWhere(spark, root, Seq(LessThan("id", 10L)))
    assert(deleted == 10L && vd > vc)
    assert(ManifestStore.read(spark, root).count() == 90L)

    // external appends still refuse the dotted name
    val e = intercept[IllegalArgumentException] {
      ManifestStore.append(spark, spark.range(5).select(col("id"), lit(1L).as("a.b")), root)
    }
    assert(e.getMessage.contains("literal '.'"), e.getMessage)
  }

  /** advice r12: a split fk leaf (a writer/config that ignores the
    * maxRecordsPerFile=0 packing) merges into ONE dv file instead of
    * aborting the whole MoR operation after the dv write.
    */
  test("dvFileOf merges a split fk leaf instead of aborting") {
    val dvDir = new Path(freshRoot(), "dv-split")
    val fs = dvDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val fk = "0123456789abcdef0123456789abcdef"
    (0L until 100L).map(p => (fk, p)).toDF("fkey", "pos")
      .repartition(3).write.parquet(new Path(dvDir, s"fk=$fk").toString)
    val leafFiles = fs.listStatus(new Path(dvDir, s"fk=$fk"))
      .count(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
    assert(leafFiles > 1, "precondition: the leaf must actually be split")
    val merged = ManifestStore.dvFileOf(spark, fs, dvDir, fk)
    val back = spark.read.parquet(merged.toString)
    assert(back.count() == 100L)
    assert(back.select("pos").as[Long].collect().sorted.toSeq == (0L until 100L))
    // single-file leaves return their file untouched (no merge write)
    val fk2 = "fedcba9876543210fedcba9876543210"
    Seq((fk2, 1L)).toDF("fkey", "pos").coalesce(1)
      .write.parquet(new Path(dvDir, s"fk=$fk2").toString)
    val single = ManifestStore.dvFileOf(spark, fs, dvDir, fk2)
    assert(single.getParent.getName == s"fk=$fk2")
  }

  /** advice r12: a pathologically stale hint (persistently failing hint
    * writes while commits succeed) falls back to ONE full listing past the
    * probe cap instead of O(gap) sequential exists() probes — and still
    * resolves the true head.
    */
  test("stale hint past the probe cap falls back to listing, resolves correctly") {
    val root = freshRoot()
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    ManifestStore.append(spark, batch(0, 5), root)  // v1
    ManifestStore.append(spark, batch(5, 10), root) // v2
    // 68 torn slots above the head (exist, unparseable) + a hint pinned at 1
    for (v <- 3L to 70L) {
      val out = fs.create(new Path(s"$root/_manifests/v${"%020d".format(v)}.manifest"), false)
      out.close()
    }
    val hint = fs.create(new Path(s"$root/_manifests/_latest"), true)
    hint.write("1".getBytes("UTF-8")); hint.close()
    val snap = ManifestStore.latestSnapshot(spark, root).get
    assert(snap.version == 2L, s"expected the intact head v2, got v${snap.version}")
    assert(ids(ManifestStore.read(spark, root)) == (0L until 10L))
  }

  /** r12 (VERDICT r11 #2): repeated MoR deletes on one file retire its
    * vector at the configured fraction — a more-than-half-deleted file
    * pays more in scan-and-filter tax than its rewrite costs. Sub-
    * threshold files keep byte identity; the standalone policy scopes the
    * same way.
    */
  test("auto-materialize retires dv-heavy files at the threshold") {
    import org.apache.spark.sql.sources.LessThan
    val root = freshRoot()
    // 4 range files of 250 rows each
    ManifestStore.append(spark,
      spark.range(0, 1000).select(col("id"), lit("x").as("p"))
        .repartitionByRange(4, col("id")).sortWithinPartitions("id"), root)
    val before = ManifestStore.latestSnapshot(spark, root).get
    assert(before.files.size == 4)

    // 30% of file 0 deleted: BELOW the 0.5 threshold, vector stays
    val (n1, _, v1) = ManifestStore.deleteWhereMergeOnRead(spark, root,
      Seq(LessThan("id", 75L)), autoMaterializeFraction = Some(0.5))
    assert(n1 == 75L && v1 > 0)
    val s1 = ManifestStore.latestSnapshot(spark, root).get
    assert(s1.version == v1, "below the threshold nothing else commits")
    assert(s1.files.count(_.dv.exists(_.rows > 0)) == 1)

    // push file 0 to 60% deleted: the follow-up commit retires it
    val (n2, _, v2) = ManifestStore.deleteWhereMergeOnRead(spark, root,
      Seq(LessThan("id", 150L)), autoMaterializeFraction = Some(0.5))
    assert(n2 == 75L && v2 > 0)
    val s2 = ManifestStore.latestSnapshot(spark, root).get
    assert(s2.version == v2 + 1, "retirement is a follow-up commit")
    assert(s2.files.forall(_.dv.forall(_.rows == 0L)),
      s"dv-heavy file not retired: ${s2.files.flatMap(_.dv)}")
    // the three untouched files keep byte identity
    val beforePaths = before.files.map(_.path).toSet
    assert(s2.files.count(f => beforePaths(f.path)) == 3)
    assert(ids(ManifestStore.read(spark, root)) == (150L until 1000L))
    // retired table reads through the planner-integrated format again
    assert(ManifestStore.table(spark, root).count() == 850L)

    // standalone policy: a fresh sub-threshold vector survives a 0.9-scoped
    // materialize, then a 0.0 sweep retires it
    val (n3, _, _) = ManifestStore.deleteWhereMergeOnRead(spark, root,
      Seq(LessThan("id", 200L)))
    assert(n3 == 50L)
    val (m0, _) = ManifestStore.materializeDeletes(spark, root, minDvFraction = 0.9)
    assert(m0 == 0, "a lightly-deleted file must survive a high-threshold sweep")
    assert(ManifestStore.latestSnapshot(spark, root).get
      .files.count(_.dv.exists(_.rows > 0)) == 1)
    val (m1, _) = ManifestStore.materializeDeletes(spark, root)
    assert(m1 == 1)
    assert(ids(ManifestStore.read(spark, root)) == (200L until 1000L))
  }

  /** r12 (VERDICT r11 #3): the snapshot cache makes steady-state
    * resolution O(1) in entry count (measured flat 0.18–0.30 ms from 1k
    * to 300k entries — ManifestResolveSlo) — these pin its safety edges:
    * a new commit is visible immediately (the version is in the key) and
    * a table recreated IN PLACE at the same version number is re-read,
    * never served from the dead table's cache (the key carries the
    * manifest file's length and mtime).
    */
  test("snapshot cache: commits visible immediately; recreated tables never served stale") {
    val root = freshRoot()
    ManifestStore.append(spark, batch(0, 10).coalesce(1), root)
    assert(ids(ManifestStore.read(spark, root)) == (0L until 10L))
    // a second resolution hits the cache; a commit right after must win
    assert(ManifestStore.latestSnapshot(spark, root).get.version == 1L)
    ManifestStore.append(spark, batch(10, 20).coalesce(1), root)
    assert(ManifestStore.latestSnapshot(spark, root).get.version == 2L)
    assert(ids(ManifestStore.read(spark, root)) == (0L until 20L))
    // recreate the table in place: same version numbers, different content
    // (two files → a different manifest length, deterministically)
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new Path(root), true)
    ManifestStore.append(spark, batch(500, 520).repartition(2), root)
    val snap = ManifestStore.latestSnapshot(spark, root).get
    assert(snap.version == 1L)
    assert(ids(ManifestStore.read(spark, root)) == (500L until 520L),
      "a recreated table must never resolve to the dead table's cached snapshot")
    // time travel through the cache stays version-exact
    assert(ManifestStore.readVersion(spark, root, 1L).count() == 20L)
  }

  /** r12 (VERDICT r11 #6): the change feed — dv growth reads back as
    * EXACT deletes (new bitmap minus old), in-range-added files net out,
    * copy-on-write rewrites still refuse.
    */
  test("readChangesSince: exact deletes from dv growth; added files net; rewrites refuse") {
    import org.apache.spark.sql.sources._
    val root = freshRoot()
    ManifestStore.append(spark,
      spark.range(0, 1000).select(col("id"), lit("x").as("p"))
        .repartitionByRange(4, col("id")).sortWithinPartitions("id"), root)
    val v1 = ManifestStore.latestSnapshot(spark, root).get.version

    // same-version diff: typed empty frame
    val (vSame, none) = ManifestStore.readChangesSince(spark, root, v1)
    assert(vSame == v1 && none.columns.contains("_change_type") && none.isEmpty)

    // MoR delete → pure deletes, exact rows with OLD content
    assert(ManifestStore.deleteWhereMergeOnRead(spark, root,
      Seq(LessThan("id", 100L)))._1 == 100L)
    val v2 = ManifestStore.latestSnapshot(spark, root).get.version
    val (gv2, c12) = ManifestStore.readChangesSince(spark, root, v1)
    assert(gv2 == v2)
    assert(c12.where(col("_change_type") === "insert").isEmpty)
    assert(c12.where(col("_change_type") === "delete")
      .select("id").as[Long].collect().sorted.toSeq == (0L until 100L))

    // append a file, then one delete touching BOTH the old file (dv grows:
    // exact deletes) and the new file (added in range: nets out)
    ManifestStore.append(spark, spark.range(1000, 1100)
      .select(col("id"), lit("y").as("p")).coalesce(1), root)
    assert(ManifestStore.deleteWhereMergeOnRead(spark, root,
      Seq(Or(And(GreaterThanOrEqual("id", 100L), LessThan("id", 150L)),
        GreaterThanOrEqual("id", 1080L))))._1 == 70L)
    val (_, c2) = ManifestStore.readChangesSince(spark, root, v2)
    assert(c2.where(col("_change_type") === "insert")
      .select("id").as[Long].collect().sorted.toSeq == (1000L until 1080L),
      "an in-range-added file must net out its own dv")
    assert(c2.where(col("_change_type") === "delete")
      .select("id").as[Long].collect().sorted.toSeq == (100L until 150L),
      "dv growth on a pre-existing file must emit exactly the diff")

    // spanning the whole range from v1: deletes accumulate, inserts net
    val (_, cAll) = ManifestStore.readChangesSince(spark, root, v1)
    assert(cAll.where(col("_change_type") === "delete")
      .select("id").as[Long].collect().sorted.toSeq == (0L until 150L))
    assert(cAll.where(col("_change_type") === "insert").count() == 80L)

    // r12: a compaction (physical, row-conserving) is TRANSPARENT to the
    // feed — the span walk skips it and the changes stay exactly the
    // pre-compaction diff (the compaction also materializes the vectors,
    // which must NOT surface as deletes)
    val vc = ManifestStore.compact(spark, root, targetFileBytes = 1L << 30)._3
    assert(vc > 0)
    val (_, cAcross) = ManifestStore.readChangesSince(spark, root, v2)
    assert(cAcross.where(col("_change_type") === "insert")
      .select("id").as[Long].collect().sorted.toSeq == (1000L until 1080L))
    assert(cAcross.where(col("_change_type") === "delete")
      .select("id").as[Long].collect().sorted.toSeq == (100L until 150L))
    // a DATA-CHANGING rewrite (CoW delete) still makes the diff
    // unknowable: refuse, naming the op
    assert(ManifestStore.deleteWhere(spark, root,
      Seq(EqualTo("id", 500L)))._1 == 1L)
    val e = intercept[IllegalArgumentException] {
      ManifestStore.readChangesSince(spark, root, vc)
    }
    assert(e.getMessage.contains("not derivable") &&
      e.getMessage.contains("op=delete"), e.getMessage)
  }

  /** r12: tailStream in changeFeed mode streams MoR upserts end-to-end as
    * an exactly-once change log (VERDICT r11 #6's consumer half — the
    * plain tail REFUSES across an upsert; the change feed expresses it).
    */
  test("tailStream changeFeed: MoR upserts stream exactly-once as a change log") {
    val src = freshRoot()
    val dst = freshRoot()
    ManifestStore.append(spark,
      spark.range(0, 100).select(col("id"), lit("old").as("p"))
        .repartitionByRange(2, col("id")).sortWithinPartitions("id"), src)
    // tick 1: full snapshot as inserts
    val l1 = ManifestStore.tailStream(spark, src, dst, "cdc", changeFeed = true)
    assert(l1 == 1L)
    assert(ManifestStore.read(spark, dst).count() == 100L)
    // a MoR upsert on the source: 10 updates + 5 brand-new keys
    val ups = spark.range(90, 105).select(col("id"), lit("new").as("p"))
    val (replaced, _, _) = ManifestStore.upsertByKeyMergeOnRead(
      spark, src, ups, Seq("id"), maxProbeKeys = 1000000)
    assert(replaced == 10L)
    // tick 2: the upsert streams as 15 inserts + 10 deletes
    val l2 = ManifestStore.tailStream(spark, src, dst, "cdc", changeFeed = true)
    assert(l2 > l1)
    val log = ManifestStore.read(spark, dst)
    assert(log.count() == 125L)
    assert(log.where(col("_change_type") === "delete")
      .select("id").as[Long].collect().sorted.toSeq == (90L until 100L))
    assert(log.where(col("_change_type") === "insert" && col("p") === "new")
      .count() == 15L)
    // crash-replay: a third tick at the same watermark appends nothing
    val l3 = ManifestStore.tailStream(spark, src, dst, "cdc", changeFeed = true)
    assert(l3 == l2)
    assert(ManifestStore.read(spark, dst).count() == 125L)
  }

  /** r12 (VERDICT r11 #4): library reads plan through the same
    * HadoopFsRelation machinery as the format — a 100-leaf partitioned
    * read is ONE native FileSourceScan with the partition values carried
    * in PartitionDirectorys, not a 100-way union of per-tuple scans.
    */
  test("partitioned library read plans one native scan, not a per-tuple union") {
    import org.apache.spark.sql.sources.EqualTo
    val root = freshRoot()
    ManifestStore.append(spark,
      spark.range(0, 2000).coalesce(1)
        .select(col("id"), (col("id") % 100L).cast("int").as("leaf")),
      root, partitionBy = Seq("leaf"))
    assert(ManifestStore.latestSnapshot(spark, root).get
      .files.flatMap(_.partition).distinct.size == 100)
    val df = ManifestStore.read(spark, root)
    // the library contract: schema-order columns (not hive-last)
    assert(df.columns.toSeq == Seq("id", "leaf"))
    assert(df.count() == 2000L)
    val scans = df.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s }
    assert(scans.size == 1,
      s"expected ONE native scan for 100 leaves:\n${df.queryExecution.executedPlan}")
    assert(scans.head.toString.contains("ManifestFileIndex"))
    // content parity with a straight reconstruction
    assert(df.select(col("id"), col("leaf").cast("long")).as[(Long, Long)]
      .collect().sorted.toSeq ==
      (0L until 2000L).map(i => (i, i % 100L)))
    // partition pruning still fires through the library filter path
    val pruned = ManifestStore.readWhere(spark, root, Seq(EqualTo("leaf", 3)))
    assert(pruned.select("id").as[Long].collect().sorted.toSeq ==
      (0L until 2000L).filter(_ % 100L == 3L))
    val prunedScan = { pruned.collect()
      pruned.queryExecution.executedPlan.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => s } }
    assert(prunedScan.map(_.metrics("numFiles").value).sum == 1,
      s"partition pruning inert: ${prunedScan.map(_.metrics("numFiles").value)} of 100")
  }

  /** r12: commit op markers — every commit names its operation in the
    * manifest, and the version-range consumers use them to skip PHYSICAL
    * rewrites (compaction) while still refusing data-changing ones.
    */
  test("op markers round-trip; a mixed maintenance range walks correctly") {
    import org.apache.spark.sql.sources.LessThan
    val root = freshRoot()
    ManifestStore.append(spark, batch(0, 10), root) // v1
    assert(ManifestStore.latestSnapshot(spark, root).get.op == "append")
    // the table identity is minted at birth and carried by every commit
    val tableId = ManifestStore.latestSnapshot(spark, root).get.tableId
    assert(tableId.nonEmpty, "v1 must mint a table id")
    ManifestStore.compact(spark, root, targetFileBytes = 1L << 30) // v2
    assert(ManifestStore.latestSnapshot(spark, root).get.op == "compact")
    ManifestStore.append(spark, batch(10, 20), root) // v3
    assert(ManifestStore.deleteWhereMergeOnRead(spark, root,
      Seq(LessThan("id", 2L)))._1 == 2L) // v4
    assert(ManifestStore.latestSnapshot(spark, root).get.op == "mor-delete")
    // plain tail from v1: the compaction is skipped, but the dv change is
    // still a delete — refuse (a delete is not an append)
    val eTail = intercept[IllegalArgumentException] {
      ManifestStore.readAddedSince(spark, root, 1L)
    }
    assert(eTail.getMessage.contains("deletion vector"), eTail.getMessage)
    // the change feed expresses the whole range: appended rows as inserts,
    // the MoR delete as exact deletes, the compaction invisible
    val (vGot, ch) = ManifestStore.readChangesSince(spark, root, 1L)
    assert(vGot == 4L)
    assert(ch.where(col("_change_type") === "insert")
      .select("id").as[Long].collect().sorted.toSeq == (10L until 20L))
    assert(ch.where(col("_change_type") === "delete")
      .select("id").as[Long].collect().sorted.toSeq == Seq(0L, 1L))
    // and tailing the same range in changeFeed=false mode from AFTER the
    // delete works (append-only suffix)
    ManifestStore.append(spark, batch(20, 25), root) // v5
    val (_, tail) = ManifestStore.readAddedSince(spark, root, 4L)
    assert(ids(tail) == (20L until 25L))
    assert(ManifestStore.latestSnapshot(spark, root).get.tableId == tableId,
      "every commit must carry the minted identity forward")
  }
}

/** A connector whose create(path, overwrite=false) silently overwrites —
  * the HEAD-then-PUT object-store shim the commit-point contract warns
  * about. Local-disk semantics otherwise.
  */
private class OverwritingFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getUri: java.net.URI = java.net.URI.create("badfs:///")
  override def create(f: Path, overwrite: Boolean, bufferSize: Int,
                      replication: Short, blockSize: Long,
                      progress: org.apache.hadoop.util.Progressable)
      : org.apache.hadoop.fs.FSDataOutputStream =
    super.create(f, true, bufferSize, replication, blockSize, progress)
  override def create(f: Path, permission: org.apache.hadoop.fs.permission.FsPermission,
                      overwrite: Boolean, bufferSize: Int, replication: Short,
                      blockSize: Long, progress: org.apache.hadoop.util.Progressable)
      : org.apache.hadoop.fs.FSDataOutputStream =
    super.create(f, permission, true, bufferSize, replication, blockSize, progress)
}

/** RawLocal semantics under a non-`file:` scheme, so the probe actually
  * runs (the `file:` scheme is exempt — claims there use O_EXCL).
  */
private class RenamedSchemeFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getUri: java.net.URI = java.net.URI.create("goodfs:///")
}
