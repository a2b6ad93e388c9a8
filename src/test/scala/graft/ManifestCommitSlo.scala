package graft

/** COMMIT-wall SLO for the manifest store (r13, VERDICT r12 #1 —
  * measure-first discipline): every manifest version used to be
  * SELF-CONTAINED (one text line per live file), so every commit paid
  * O(live files) render+write — the write-side twin of the resolution
  * cost ManifestResolveSlo measured (and r12's snapshot cache fixed) on
  * the READ side. At the SCALE.md design point (~800k entries at
  * 100 TB / 128 MB files) that is ~150-200 MB of manifest text per
  * commit, paid by every streaming micro-batch, every IVM tick, every
  * MoR delete.
  *
  * The harness synthesizes a table at growing live-entry counts from a
  * real committed entry line (same stats meta shape; commits never open
  * data files) and measures the wall of `append` of a tiny batch — the
  * streaming-sink-shaped commit — plus the bytes the commit actually
  * wrote under `_manifests/`. With delta-encoded commits (r13) the wall
  * and bytes must come out FLAT in live-entry count except at the
  * periodic self-contained checkpoint, whose amortized share is
  * 1/checkpointInterval of the old cost.
  *
  * `Test/runMain graft.ManifestCommitSlo [maxEntries]`; numbers land in
  * SCALE.md.
  */
object ManifestCommitSlo {
  def main(args: Array[String]): Unit = {
    val maxEntries = args.headOption.map(_.toInt).getOrElse(300000)
    val spark = GraftSession.getOrCreate(8)
    val M = graft.sources.ManifestStore

    // one real committed table seeds the entry-line shape
    val seed = java.nio.file.Files.createTempDirectory("graft-mcslo-seed").toString
    M.append(spark,
      spark.range(0, 1000).select(org.apache.spark.sql.functions.col("id"),
        org.apache.spark.sql.functions.lit("payload-string").as("payload")), seed)
    val seedFs = new org.apache.hadoop.fs.Path(seed)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def readAll(p: org.apache.hadoop.fs.Path): String = {
      val in = seedFs.open(p)
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      in.close(); out.toString("UTF-8")
    }
    val seedBytes = readAll(new org.apache.hadoop.fs.Path(
      s"$seed/_manifests/v${"%020d".format(1)}.manifest"))
    val seedLines = seedBytes.split("\n").toSeq
    val headerLines = seedLines.takeWhile(l => !l.contains("\t") || l.startsWith("txn="))
    val entryLine = seedLines.find(l => l.contains("\t") && !l.startsWith("txn=")
      && !l.startsWith("checksum=")).get
    val entryPath = entryLine.takeWhile(_ != '\t')

    val batch = spark.range(0, 10).select(
      org.apache.spark.sql.functions.col("id"),
      org.apache.spark.sql.functions.lit("payload-string").as("payload"))

    for (nEntries <- Seq(10000, 100000, 300000, maxEntries).distinct.sorted
         if nEntries <= maxEntries) {
      val rootN = java.nio.file.Files
        .createTempDirectory(s"graft-mcslo-$nEntries").toString
      val body = new StringBuilder
      headerLines.foreach(l => body.append(l).append('\n'))
      for (i <- 0 until nEntries)
        body.append(entryLine.replace(entryPath, s"file:/tbl/part-$i.parquet"))
          .append('\n')
      val sum = org.apache.commons.codec.digest.DigestUtils.md5Hex(
        body.toString.getBytes("UTF-8"))
      val fsN = new org.apache.hadoop.fs.Path(rootN)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val mdir = new org.apache.hadoop.fs.Path(s"$rootN/_manifests")
      fsN.mkdirs(mdir)
      val out = fsN.create(new org.apache.hadoop.fs.Path(
        s"$rootN/_manifests/v${"%020d".format(1)}.manifest"), false)
      out.write((body.toString + s"checksum=$sum\n").getBytes("UTF-8")); out.close()
      val hint = fsN.create(new org.apache.hadoop.fs.Path(s"$rootN/_manifests/_latest"), true)
      hint.write("1".getBytes("UTF-8")); hint.close()

      // commit wall: p50 over enough appends to cross a checkpoint slot,
      // so the number is honest about the amortized mix; also report max
      // (the checkpoint commit) and the manifest bytes written per commit
      def manifestBytes: Long = fsN.listStatus(mdir)
        .filter(_.getPath.getName.endsWith(".manifest")).map(_.getLen).sum
      var before = manifestBytes
      val reps = 20
      val walls = (0 until reps).map { _ =>
        val t0 = System.nanoTime()
        M.append(spark, batch, rootN)
        (System.nanoTime() - t0) / 1e6
      }.sorted
      val after = manifestBytes
      val perCommitKb = (after - before) / 1024.0 / reps
      println(f"MANIFESTCOMMIT entries=$nEntries%7d p50_ms=${walls(reps / 2)}%.1f " +
        f"max_ms=${walls.last}%.1f manifest_kb_per_commit=$perCommitKb%.1f")
      before = after
    }
    spark.stop()
  }
}
