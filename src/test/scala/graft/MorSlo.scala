package graft

import org.apache.spark.sql.functions._

/** Merge-on-read vs copy-on-write DELETE cost (r11): two identical
  * manifest tables from sf0.1 lineitem (range-laid-out on l_orderkey),
  * same clustered delete predicate against each — wall time, bytes
  * REWRITTEN (CoW: the replaced files' sizes; MoR: the dv parquet bytes)
  * and files touched. The point at 100 TB: the CoW cost scales with the
  * touched slice's BYTES, the MoR cost with the matched ROWS.
  * `Test/runMain graft.MorSlo [srcDir] [files]`; numbers land in SCALE.md.
  */
object MorSlo {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nFiles = args.lift(1).map(_.toInt).getOrElse(32)
    val spark = GraftSession.getOrCreate(32)
    val M = graft.sources.ManifestStore
    val work = java.nio.file.Files.createTempDirectory("graft-morslo").toString
    val li = spark.read.parquet(s"$src/lineitem.parquet")
      .select("l_orderkey", "l_partkey", "l_quantity", "l_extendedprice")
    val laid = li.repartitionByRange(nFiles, col("l_orderkey"))
      .sortWithinPartitions("l_orderkey")

    def dirBytes(p: String): Long = {
      val path = new org.apache.hadoop.fs.Path(p)
      val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val it = fs.listFiles(path, true)
      var b = 0L
      while (it.hasNext) { val s = it.next(); if (s.isFile) b += s.getLen }
      b
    }

    val maxKey = li.agg(max("l_orderkey")).head().getLong(0)
    // clustered: the bottom ~1% of the LAYOUT key (prunes to one file);
    // interleaved: ~1% of an UNRELATED key (every file holds matches —
    // the CoW worst case, and exactly the GDPR-erasure shape: the erased
    // entity's rows are scattered, not clustered)
    val scenarios = Seq(
      "clustered" -> Seq(org.apache.spark.sql.sources.LessThan("l_orderkey", maxKey / 100L)),
      "interleaved" -> Seq(org.apache.spark.sql.sources.EqualTo("l_partkey",
        li.agg(max("l_partkey")).head().getLong(0) / 2L)))

    for ((scen, pred) <- scenarios; mode <- Seq("cow", "mor")) {
      val root = s"$work/$scen-$mode"
      M.append(spark, laid, root)
      val before = M.latestSnapshot(spark, root).get
      val tableBytes = before.files.map(_.bytes).sum
      val t0 = System.nanoTime()
      val (deleted, files, _) =
        if (mode == "cow") M.deleteWhere(spark, root, pred)
        else M.deleteWhereMergeOnRead(spark, root, pred)
      val wall = (System.nanoTime() - t0) / 1e9
      val after = M.latestSnapshot(spark, root).get
      val rewrittenBytes =
        if (mode == "cow")
          before.files.filterNot(e => after.files.exists(_.path == e.path)).map(_.bytes).sum
        else after.files.flatMap(_.dv).map(d => dirBytes(d.path)).sum
      val n = M.read(spark, root).count()
      println(f"MORSLO scenario=$scen mode=$mode deleted=$deleted files_touched=$files " +
        f"bytes_written=$rewrittenBytes table_bytes=$tableBytes " +
        f"wall=$wall%.2fs rows_after=$n")
    }

    // --- accrual (r12, VERDICT r11 #1 "done" gate): ≥1M ACCUMULATED deleted
    // rows, interleaved across every file. The r11 (fkey, pos) anti-join
    // crossed the 10 MB broadcast threshold near ~250k accumulated deletes
    // and silently became a full shuffle of the data scan; the bitmap
    // scan-side filter must hold read cost FLAT through 1M+.
    val root = s"$work/accrual"
    M.append(spark,
      spark.range(0, 20000000L).select(col("id"), (col("id") % 100L).as("r"))
        .repartitionByRange(16, col("id")).sortWithinPartitions("id"), root)
    def readWall(): Double = {
      val t0 = System.nanoTime()
      // prime stride: survives every r-keyed delete (id%997==0 hits all
      // residues of id%100, so most probe rows outlive the deletions)
      val n = M.read(spark, root).where(col("id") % 997L === 0L).count()
      require(n > 0)
      (System.nanoTime() - t0) / 1e9
    }
    readWall() // warm the scan path once
    println(f"MORSLO-ACCRUAL dv_rows=0 read_wall=${readWall()}%.2fs dv_bytes=0")
    var accrued = 0L
    for (k <- 0 until 5) {
      val (nd, _, v) = M.deleteWhereMergeOnRead(spark, root,
        Seq(org.apache.spark.sql.sources.EqualTo("r", k.toLong)))
      require(v > 0 && nd == 200000L, s"delete $k: ($nd, $v)")
      accrued += nd
      val snap = M.latestSnapshot(spark, root).get
      val dvBytes = snap.files.flatMap(_.dv).map(d => dirBytes(d.path)).sum
      println(f"MORSLO-ACCRUAL dv_rows=$accrued read_wall=${readWall()}%.2fs " +
        f"dv_bytes=$dvBytes")
    }
    require(M.read(spark, root).count() == 20000000L - accrued)
    spark.stop()
  }
}
