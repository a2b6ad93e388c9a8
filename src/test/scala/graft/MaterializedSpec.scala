package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, count, lit, sum}
import org.apache.spark.sql.sources.{EqualTo, LessThan}

import graft.sources.{ManifestStore => M, Materialized}

/** Incremental view maintenance over the manifest change feed: the
  * maintained (count, sum) table must equal a full recompute after every
  * kind of source change, advance exactly-once, and ignore physical
  * maintenance.
  */
class MaterializedSpec extends SparkSpec {

  import SharedSpark.spark.implicits._

  private def freshRoot() =
    java.nio.file.Files.createTempDirectory("graft-ivm").toString

  private def rows(lo: Long, hi: Long): DataFrame =
    (lo until hi).map(i => (i, i % 5, i)).toDF("id", "k", "v")

  private def maintained(dst: String): Set[(Long, Long, Long)] =
    M.table(spark, dst).where(col("n") > 0)
      .select("k", "n", "sum_v").as[(Long, Long, Long)].collect().toSet

  private def recompute(src: String): Set[(Long, Long, Long)] =
    M.read(spark, src).groupBy("k")
      .agg(count(lit(1)).as("n"), sum("v").as("sum_v"))
      .as[(Long, Long, Long)].collect().toSet

  test("maintained aggregate tracks appends, MoR deletes/upserts and retractions exactly") {
    val src = freshRoot(); val dst = freshRoot()
    def tickAndCheck(): Unit = {
      Materialized.maintainSums(spark, src, dst, Seq("k"), Seq("v"))
      assert(maintained(dst) == recompute(src), "maintained != recompute")
    }
    M.append(spark, rows(0, 100).repartition(4), src)
    tickAndCheck() // seed from the full snapshot

    M.append(spark, rows(100, 120), src)
    tickAndCheck() // plain append folds in

    assert(M.deleteWhereMergeOnRead(spark, src, Seq(LessThan("id", 10L)))._1 == 10L)
    tickAndCheck() // MoR delete retracts

    val ups = (50L until 60L).map(i => (i, i % 5, i + 1000L)).toDF("id", "k", "v")
    M.upsertByKeyMergeOnRead(spark, src, ups, Seq("id"), maxProbeKeys = 1000000)
    tickAndCheck() // MoR upsert = retraction + addition in one tick

    // full retraction of one group: k=3 disappears behind the n>0 read
    assert(M.deleteWhereMergeOnRead(spark, src, Seq(EqualTo("k", 3L)))._1 > 0L)
    tickAndCheck()
    assert(!maintained(dst).exists(_._1 == 3L), "retracted group must not surface")
    assert(M.table(spark, dst).where(col("k") === 3L && col("n") === 0L).count() == 1L,
      "the zero row is kept by contract (upserts replace, never delete)")

    // idle tick: no source change — no destination commit (exactly-once)
    val vBefore = M.latestSnapshot(spark, dst).get.version
    Materialized.maintainSums(spark, src, dst, Seq("k"), Seq("v"))
    assert(M.latestSnapshot(spark, dst).get.version == vBefore)

    // a replayed merge (same appId, same already-committed source
    // version) no-ops INSIDE the commit — the crash-after-commit retry
    val wm = M.latestSnapshot(spark, dst).get.txns("graft-ivm")
    val replay = Seq((0L, 999L, 999L)).toDF("k", "n", "sum_v")
    val (_, _, vReplay) = M.upsertByKey(spark, dst, replay, Seq("k"),
      txn = Some("graft-ivm" -> wm))
    assert(vReplay == -1L, "a replayed (appId, version) must abandon")
    assert(M.latestSnapshot(spark, dst).get.version == vBefore)
    assert(maintained(dst) == recompute(src), "the replay must not corrupt")

    // physical maintenance is invisible to the view
    M.compact(spark, src)
    Materialized.maintainSums(spark, src, dst, Seq("k"), Seq("v"))
    assert(M.latestSnapshot(spark, dst).get.version == vBefore,
      "a compaction tick must not commit")
    assert(maintained(dst) == recompute(src))

    // a CoW rewrite of a file appended ENTIRELY within the tick nets out
    // (the documented net-effect caveat): the view stays exact
    M.append(spark, rows(200, 205), src)
    M.deleteWhere(spark, src, Seq(EqualTo("id", 202L)))
    tickAndCheck()

    // a CoW delete touching PRE-watermark data is unknowable — refuse
    M.deleteWhere(spark, src, Seq(EqualTo("id", 20L)))
    val e = intercept[IllegalArgumentException] {
      Materialized.maintainSums(spark, src, dst, Seq("k"), Seq("v"))
    }
    assert(e.getMessage.contains("not derivable"), e.getMessage)
  }

  test("min/max maintain exactly through extreme-retracting deletes via " +
    "touched-group source recompute (r13)") {
    val src = freshRoot(); val dst = freshRoot()
    import org.apache.spark.sql.functions.{max => smax, min => smin}
    def tickAndCheck(): Unit = {
      Materialized.maintainSums(spark, src, dst, Seq("k"), Seq("v"),
        minMaxCols = Seq("v"))
      val got = M.table(spark, dst).where(col("n") > 0)
        .select("k", "n", "sum_v", "min_v", "max_v")
        .as[(Long, Long, Long, Long, Long)].collect().toSet
      val exp = M.read(spark, src).groupBy("k")
        .agg(count(lit(1)).as("n"), sum("v").as("sum_v"),
          smin("v").as("min_v"), smax("v").as("max_v"))
        .as[(Long, Long, Long, Long, Long)].collect().toSet
      assert(got == exp, s"min/max maintained != recompute\n$got\n$exp")
    }
    // source PARTITIONED by the group key: the recompute's In-pruning
    // opens only the touched groups' files (the delta-proportional claim)
    M.append(spark, rows(0, 100).repartition(2), src, partitionBy = Seq("k"))
    tickAndCheck() // seed carries min/max
    // delete the MAX rows of group k=0 (v 95, 90) — not retractable from
    // the change alone; the recompute must surface the new max 85
    M.deleteWhereMergeOnRead(spark, src,
      Seq(org.apache.spark.sql.sources.And(EqualTo("k", 0L),
        org.apache.spark.sql.sources.GreaterThanOrEqual("v", 90L))))
    tickAndCheck()
    // a new min lands in another group; both change kinds in one tick
    M.append(spark, Seq((-10L, 1L, -10L)).toDF("id", "k", "v"), src,
      partitionBy = Seq("k"))
    M.deleteWhereMergeOnRead(spark, src,
      Seq(org.apache.spark.sql.sources.And(EqualTo("k", 2L), LessThan("v", 10L))))
    tickAndCheck()
    // an EMPTIED group keeps its n=0 row with null extremes
    M.deleteWhereMergeOnRead(spark, src, Seq(EqualTo("k", 3L)))
    Materialized.maintainSums(spark, src, dst, Seq("k"), Seq("v"),
      minMaxCols = Seq("v"))
    val emptied = M.table(spark, dst).where(col("k") === 3L)
      .select("n", "min_v", "max_v").collect().head
    assert(emptied.getLong(0) == 0L && emptied.isNullAt(1) && emptied.isNullAt(2))
    // the pruning the recompute rides on: a one-group In-filter keeps
    // only that group's partition files
    val snap = M.latestSnapshot(spark, src).get
    val kept = M.prunedEntries(snap,
      Seq(org.apache.spark.sql.sources.In("k", Array(0L))))
    assert(kept.nonEmpty && kept.size < snap.files.size,
      s"recompute pruning must open only touched partitions: " +
        s"${kept.size}/${snap.files.size}")
  }

  test("replicate maintains an exact keyed mirror through appends, upserts, " +
    "deletes and source compaction (r13)") {
    val src = freshRoot(); val dst = freshRoot()
    def content(root: String): Set[(Long, Long, Long)] =
      M.read(spark, root).as[(Long, Long, Long)].collect().toSet
    def tickAndCheck(): Unit = {
      Materialized.replicate(spark, src, dst, Seq("id"))
      assert(content(dst) == content(src), "mirror != source")
    }
    M.append(spark, rows(0, 50).repartition(4), src)
    tickAndCheck() // seed = full snapshot
    // one tick folds an append + a MoR upsert + a MoR delete
    M.append(spark, rows(50, 70), src)
    M.upsertByKeyMergeOnRead(spark, src,
      Seq((10L, 99L, 1010L), (60L, 99L, 6060L)).toDF("id", "k", "v"), Seq("id"))
    M.deleteWhereMergeOnRead(spark, src, Seq(LessThan("id", 5L)))
    tickAndCheck()
    // a key deleted then re-inserted across versions lands present
    M.deleteWhereMergeOnRead(spark, src, Seq(EqualTo("id", 20L)))
    M.append(spark, Seq((20L, 7L, 777L)).toDF("id", "k", "v"), src)
    tickAndCheck()
    assert(M.read(spark, dst).where(col("id") === 20L)
      .select("v").as[Long].head() == 777L)
    // source compaction is physical: the next tick applies nothing new
    val vBefore = M.latestSnapshot(spark, dst).get.version
    M.compact(spark, src)
    Materialized.replicate(spark, src, dst, Seq("id"))
    assert(content(dst) == content(src))
    assert(M.latestSnapshot(spark, dst).get.version == vBefore,
      "a compaction tick must not commit to the mirror")
    // idempotent re-run: nothing new, nothing committed
    Materialized.replicate(spark, src, dst, Seq("id"))
    assert(M.latestSnapshot(spark, dst).get.version == vBefore)
  }

  test("merge abandonment is distinguishable from replay via the watermark") {
    val src = freshRoot(); val dst = freshRoot()
    M.append(spark, rows(0, 50).repartition(2), src)
    Materialized.maintainSums(spark, src, dst, Seq("k"), Seq("v"))
    val wm = M.latestSnapshot(spark, dst).get.txns("graft-ivm")
    val stale = M.latestSnapshot(spark, dst).get
    M.compact(spark, dst) // supersede the stale snapshot's files
    val upd = Seq((0L, 1L, 1L)).toDF("k", "n", "sum_v")
    val (_, _, v) = M.upsertFrom(spark, dst, stale, upd, Seq("k"),
      txn = Some("graft-ivm" -> (wm + 1)))
    assert(v == -1L, "a superseded base must abandon, not commit blind")
    assert(M.latestSnapshot(spark, dst).get.txns("graft-ivm") == wm,
      "an abandoned merge must not advance the watermark — the signal " +
        "mergeChanges uses to fail the tick for retry")
  }

  test("streamingMaintain runs the same maintenance under engine triggers") {
    val src = freshRoot(); val dst = freshRoot()
    val ckpt = freshRoot()
    def runOnce(): Unit = {
      val q = Materialized.streamingMaintain(spark, src, dst,
        Seq("k"), Seq("v"), checkpointLocation = ckpt)
      q.awaitTermination()
    }
    M.append(spark, rows(0, 100).repartition(4), src)
    runOnce() // seed batch
    assert(maintained(dst) == recompute(src))
    // MoR churn + append between runs; the restart folds it exactly once
    assert(M.deleteWhereMergeOnRead(spark, src, Seq(LessThan("id", 20L)))._1 == 20L)
    M.append(spark, rows(100, 130), src)
    runOnce()
    assert(maintained(dst) == recompute(src))
    // idle restart: nothing new, no commit
    val vBefore = M.latestSnapshot(spark, dst).get.version
    runOnce()
    assert(M.latestSnapshot(spark, dst).get.version == vBefore,
      "an idle engine restart must not commit to the maintained table")
  }

  test("multi-key groups and double sums maintain within float tolerance") {
    val src = freshRoot(); val dst = freshRoot()
    def rows2(lo: Long, hi: Long): DataFrame =
      (lo until hi).map(i => (i, i % 3, if (i % 2 == 0) "a" else "b", i * 0.5))
        .toDF("id", "k1", "k2", "x")
    def check(): Unit = {
      val got = M.table(spark, dst).where(col("n") > 0)
        .select("k1", "k2", "n", "sum_x")
        .as[(Long, String, Long, Double)].collect()
        .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
      val exp = M.read(spark, src).groupBy("k1", "k2")
        .agg(count(lit(1)).as("n"), sum("x").as("sum_x"))
        .as[(Long, String, Long, Double)].collect()
        .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
      assert(got.keySet == exp.keySet, s"groups: ${got.keySet} vs ${exp.keySet}")
      got.foreach { case (k, (n, s)) =>
        assert(n == exp(k)._1, s"count of $k")
        assert(math.abs(s - exp(k)._2) < 1e-9, s"sum of $k: $s vs ${exp(k)._2}")
      }
    }
    M.append(spark, rows2(0, 60).repartition(3), src)
    Materialized.maintainSums(spark, src, dst, Seq("k1", "k2"), Seq("x"))
    check()
    M.append(spark, rows2(60, 90), src)
    assert(M.deleteWhereMergeOnRead(spark, src, Seq(LessThan("id", 12L)))._1 == 12L)
    Materialized.maintainSums(spark, src, dst, Seq("k1", "k2"), Seq("x"))
    check()
  }

  test("AVG maintains as a retractable (sum, non-null count) pair (r14)") {
    val src = freshRoot(); val dst = freshRoot()
    // v column with NULLs: AVG must ignore them (per-column denominator)
    def mk(lo: Long, hi: Long) = (lo until hi)
      .map(i => (i, i % 3, if (i % 4 == 0) None else Some(i.toDouble)))
      .toDF("id", "k", "v")
    def check(): Unit = {
      Materialized.maintainSums(spark, src, dst, Seq("k"), avgCols = Seq("v"))
      val got = M.table(spark, dst).where(col("n") > 0)
        .select("k", "avg_v").as[(Long, Option[Double])].collect().toMap
      val want = M.read(spark, src).groupBy("k")
        .agg(org.apache.spark.sql.functions.avg("v").as("a"))
        .as[(Long, Option[Double])].collect().toMap
      assert(got.keySet == want.keySet)
      got.foreach { case (k, a) =>
        (a, want(k)) match {
          case (Some(x), Some(y)) => assert(math.abs(x - y) < 1e-9, s"k=$k: $x vs $y")
          case (x, y) => assert(x == y, s"k=$k: $x vs $y")
        }
      }
    }
    M.append(spark, mk(0, 60).repartition(3), src)
    check() // seed
    M.append(spark, mk(60, 90), src)
    check() // append folds
    assert(M.deleteWhereMergeOnRead(spark, src, Seq(LessThan("id", 30L)))._1 == 30L)
    check() // retraction adjusts both numerator and denominator
    // a group whose every value is NULL reads avg = NULL (SQL semantics)
    M.append(spark, Seq((1000L, 9L, Option.empty[Double])).toDF("id", "k", "v"), src)
    check()
    assert(M.table(spark, dst).where(col("k") === 9L)
      .select("avg_v").as[Option[Double]].head().isEmpty)
  }

  test("maintained fact⋈dim join view: bilinear delta folding from BOTH feeds (r14)") {
    val fact = freshRoot(); val dim = freshRoot(); val dst = freshRoot()
    def factRows(lo: Long, hi: Long) =
      (lo until hi).map(i => (i, i % 7, i)).toDF("id", "fk", "amount")
    def dimRows(keys: Seq[Long]) =
      keys.map(k => (k, s"name$k")).toDF("fk", "dname")
    def tickAndCheck(): Unit = {
      Materialized.maintainJoinedSums(spark, fact, dim, dst,
        joinKeys = Seq("fk"), groupKeys = Seq("dname"), sumCols = Seq("amount"))
      val got = M.table(spark, dst).where(col("n") > 0)
        .select("dname", "n", "sum_amount").as[(String, Long, Long)]
        .collect().toSet
      val want = M.read(spark, fact).join(M.read(spark, dim), "fk")
        .groupBy("dname")
        .agg(count(lit(1)).as("n"), sum("amount").as("s"))
        .as[(String, Long, Long)].collect().toSet
      assert(got == want, s"maintained != recompute:\n$got\n$want")
    }
    // dim covers only SOME fact keys at seed — unmatched facts contribute 0
    M.append(spark, factRows(0, 70).repartition(4), fact)
    M.append(spark, dimRows(Seq(0L, 1L, 2L, 3L)), dim)
    tickAndCheck() // seed = full join

    M.append(spark, factRows(70, 100), fact)
    tickAndCheck() // Δfact ⋈ dim

    // LATE-ARRIVING dim keys: old fact rows (fk=4,5) fold in retroactively
    M.append(spark, dimRows(Seq(4L, 5L)), dim)
    tickAndCheck() // fact_old ⋈ Δdim

    // BOTH sides advance in one tick
    M.append(spark, factRows(100, 120), fact)
    M.append(spark, dimRows(Seq(6L)), dim)
    tickAndCheck()

    // dim attribute UPDATE = delete+insert in its feed: group moves
    M.upsertByKeyMergeOnRead(spark, dim,
      Seq((2L, "RENAMED")).toDF("fk", "dname"), Seq("fk"), maxProbeKeys = 1000)
    tickAndCheck()
    assert(M.table(spark, dst).where(col("dname") === "RENAMED" && col("n") > 0)
      .count() == 1L)

    // fact retraction
    assert(M.deleteWhereMergeOnRead(spark, fact, Seq(LessThan("id", 20L)))._1 == 20L)
    tickAndCheck()

    // dim key REMOVAL retracts that group entirely
    assert(M.deleteWhereMergeOnRead(spark, dim, Seq(EqualTo("fk", 0L)))._1 == 1L)
    tickAndCheck()
    assert(!maintainedNames(dst).contains("name0"))

    // idle tick: neither side changed → no destination commit
    val vBefore = M.latestSnapshot(spark, dst).get.version
    Materialized.maintainJoinedSums(spark, fact, dim, dst,
      Seq("fk"), Seq("dname"), Seq("amount"))
    assert(M.latestSnapshot(spark, dst).get.version == vBefore)

    // physical maintenance on the FACT side streams through (a compaction
    // advances the version with zero row changes → watermark-only stamp)
    M.compact(spark, fact)
    val before = maintainedNames(dst)
    Materialized.maintainJoinedSums(spark, fact, dim, dst,
      Seq("fk"), Seq("dname"), Seq("amount"))
    assert(maintainedNames(dst) == before)
    val txns = M.latestSnapshot(spark, dst).get.txns
    assert(txns("graft-ivm-join#fact") == M.latestSnapshot(spark, fact).get.version,
      "the zero-delta tick must still advance the fact watermark")
  }

  private def maintainedNames(dst: String): Set[String] =
    M.table(spark, dst).where(col("n") > 0)
      .select("dname").as[String].collect().toSet

  test("replicateConsistent: two-phase version-vector pin + epoch stamps give join-consistent mirrors (r14)") {
    val srcA = freshRoot(); val srcB = freshRoot()
    val dstA = freshRoot(); val dstB = freshRoot()
    def tables = Seq((srcA, dstA, Seq("id")), (srcB, dstB, Seq("id")))
    M.append(spark, rows(0, 50).repartition(2), srcA)
    M.append(spark, rows(0, 30), srcB)
    val (e1, pins1) = Materialized.replicateConsistent(spark, tables)
    assert(e1 == 1L && pins1 == Seq(1L, 1L))
    assert(M.table(spark, dstA).count() == 50L && M.table(spark, dstB).count() == 30L)

    // both sources advance differently; mirrors pin TOGETHER
    M.append(spark, rows(50, 80), srcA)
    M.upsertByKeyMergeOnRead(spark, srcB,
      Seq((5L, 99L, 500L)).toDF("id", "k", "v"), Seq("id"), maxProbeKeys = 100)
    M.deleteWhereMergeOnRead(spark, srcB, Seq(LessThan("id", 3L)))
    val (e2, _) = Materialized.replicateConsistent(spark, tables)
    assert(e2 == 2L)
    def setOf(root: String) =
      M.table(spark, root).as[(Long, Long, Long)].collect().toSet
    assert(setOf(dstA) == setOf(srcA) && setOf(dstB) == setOf(srcB))

    // the read-side key: newest COMPLETE epoch, per-mirror versions —
    // time-travel reads at those versions reproduce epoch-2 state even
    // after the sources (and mirrors) move on
    val Some((eGot, at2)) = Materialized.consistentMirrorVersions(
      spark, Seq(dstA, dstB)): @unchecked
    assert(eGot == 2L)
    val a2 = M.readVersion(spark, dstA, at2(dstA)).count()
    M.append(spark, rows(80, 90), srcA)
    Materialized.replicateConsistent(spark, tables) // epoch 3
    assert(M.readVersion(spark, dstA, at2(dstA)).count() == a2,
      "epoch-2 mirror versions stay replayable after epoch 3")
    val Some((e3, at3)) = Materialized.consistentMirrorVersions(
      spark, Seq(dstA, dstB)): @unchecked
    assert(e3 == 3L)
    assert(M.readVersion(spark, dstA, at3(dstA)).count() == 90L)
    // an idle source still stamps the epoch (B unchanged since epoch 2)
    assert(M.latestSnapshot(spark, dstB).get.txns("graft-replicate-multi#epoch") == 3L)
  }
}
