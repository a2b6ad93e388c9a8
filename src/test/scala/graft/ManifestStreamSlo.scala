package graft

import org.apache.spark.sql.streaming.Trigger

import graft.sources.{ManifestStore => M}

/** Streaming-endpoint SLO (r12): what does the ENGINE cost per trigger on
  * top of the library tail, and what does the span walk cost to construct
  * across a maintenance-bearing backlog?
  *
  *  - catch-up arms: a 30-commit backlog consumed as ONE batch vs PAGED
  *    at maxVersionsPerTrigger=1 (30 micro-batches) — the paged total
  *    minus the one-batch total, over 29, is the marginal engine cost per
  *    micro-batch (offset log + commit log + batch planning);
  *  - idle-restart arm: AvailableNow with nothing new — the fixed floor a
  *    scheduled restart pays;
  *  - library baseline: tailStream folding the same backlog in one tick;
  *  - walk arm: changesBetween CONSTRUCTION time over a 400-version range,
  *    pure-append (one span, zero interior resolutions) vs with one
  *    mid-range compaction (bisected boundary search + 2 spans), plus one
  *    full execution for the answer's sanity.
  *
  * `Test/runMain graft.ManifestStreamSlo` (or tools/run.sh); numbers land
  * in SCALE.md.
  */
object ManifestStreamSlo {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.getOrCreate(8)
    import spark.implicits._

    def fresh(tag: String) =
      java.nio.file.Files.createTempDirectory(s"graft-mss-$tag").toString
    def wallMs(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e6
    }
    def runOnce(src: String, dst: String, ckpt: String,
                options: Map[String, String] = Map.empty): Unit = {
      val q = spark.readStream.format("graft-manifest").options(options).load(src)
        .writeStream.format("graft-manifest")
        .option("appId", "slo").option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start(dst)
      q.awaitTermination()
    }

    // ---- catch-up arms: 30 one-row commits -----------------------------
    val nCommits = 30
    val src = fresh("src")
    (0 until nCommits).foreach(i =>
      M.append(spark, Seq((i.toLong, s"r$i")).toDF("id", "payload"), src))
    val (dst1, ck1) = (fresh("dst1"), fresh("ck1"))
    val oneBatch = wallMs(runOnce(src, dst1, ck1))
    val (dst2, ck2) = (fresh("dst2"), fresh("ck2"))
    val paged = wallMs(runOnce(src, dst2, ck2,
      Map("maxVersionsPerTrigger" -> "1")))
    require(M.latestSnapshot(spark, dst2).get.version == nCommits.toLong,
      "paged run must land one destination version per source commit")
    val idle = (0 until 3).map(_ => wallMs(runOnce(src, dst1, ck1))).min
    val (dst3, _) = (fresh("dst3"), ())
    val tailOne = wallMs {
      M.tailStream(spark, src, dst3, "slo-tail"): Unit
    }
    println(f"STREAMSLO catchup commits=$nCommits one_batch=${oneBatch / 1000}%.2fs " +
      f"paged=${paged / 1000}%.2fs per_trigger_marginal=" +
      f"${(paged - oneBatch) / (nCommits - 1)}%.0fms idle_restart=${idle / 1000}%.2fs " +
      f"tailStream_one_tick=${tailOne / 1000}%.2fs")

    // ---- walk arm: 400 versions, construction cost ---------------------
    def buildTable(withCompact: Boolean): String = {
      val root = fresh(if (withCompact) "walkc" else "walk")
      (0 until 200).foreach(i =>
        M.append(spark, Seq((i.toLong, s"r$i")).toDF("id", "payload"), root))
      if (withCompact) M.compact(spark, root, targetFileBytes = 1L << 30): Unit
      (200 until 400).foreach(i =>
        M.append(spark, Seq((i.toLong, s"r$i")).toDF("id", "payload"), root))
      root
    }
    val pure = buildTable(withCompact = false)
    val mixed = buildTable(withCompact = true)
    // warm the snapshot caches equally (one resolution each)
    M.latestSnapshot(spark, pure); M.latestSnapshot(spark, mixed)
    def p50(reps: Int)(f: => Unit): Double =
      (0 until reps).map(_ => wallMs(f)).sorted.apply(reps / 2)
    val consPure = p50(9) { M.readChangesSince(spark, pure, 1L): Unit }
    val consMixed = p50(9) { M.readChangesSince(spark, mixed, 1L): Unit }
    val n = M.readChangesSince(spark, mixed, 1L)._2.count()
    require(n == 399L, s"walk answer wrong: $n") // 399 appends after v1
    println(f"STREAMSLO walk versions=400 construct_pure_append=${consPure}%.0fms " +
      f"construct_with_compaction=${consMixed}%.0fms (bisected boundary; " +
      f"pure range is a single span with zero interior resolutions)")

    spark.stop()
  }
}
