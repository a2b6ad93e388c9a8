package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.api._
import graft.sources.{Sink, Tables}

/** End-to-end curation pipeline over the real fixture corpus — the chain a
  * user runs at 100 TB, composed exactly as the fluent API exposes it:
  *
  *   quality gate → exact dedup → near-dedup (MinHash-LSH) →
  *   decontaminate vs eval set → sequence packing →
  *   partitioned sink → small-files compaction → read back
  *
  * The corpus is salted with one planted document per failure mode plus one
  * clean admit. The oracle is differential: the same deterministic chain
  * over the UNSALTED corpus must yield exactly the full run's survivors
  * minus the clean admit — i.e. the pipeline removes precisely the planted
  * garbage, admits the clean doc, and causes zero collateral change.
  */
class PipelineE2ESpec extends SparkSpec {

  import SharedSpark.spark.implicits._

  private val evalShingle = "zorqat wivven kelmor pryxus"

  private def curate(corpus: DataFrame, evalSet: DataFrame): DataFrame =
    corpus
      .qualityScored()
      .where(col("quality") >= 0.2)
      .dedupExact(Seq("text"), "doc_id")
      .dedupNear("doc_id", threshold = 0.5)
      .decontaminatedAgainst(evalSet, "doc_id", n = 4)

  test("curate -> pack -> partitioned write -> compact: removes exactly the planted garbage") {
    val base = Tables.documents(spark, sfDir).where(col("doc_id") < 200)
      .select("doc_id", "lang", "text")
    val Seq(t0, t1) = base.where(col("doc_id") < 2).orderBy("doc_id")
      .select("text").as[String].collect().toSeq

    val goodText = "the quick brown fox jumps over the lazy dog and then it " +
      "walks away to the river where it drinks some water before the sun sets"
    val planted = Seq(
      (900001L, "en", t0),                                   // exact dup of doc 0
      (900002L, "en", t1.take((t1.length * 9) / 10)),        // near-dup of doc 1
      (900003L, "en", s"this is a perfectly normal document about the weather " +
        s"but it quotes the benchmark verbatim $evalShingle and so it must go"),
      (900004L, "en", "!!! ??? !!! ??? !!!"),                // fails the quality gate
      (900005L, "en", goodText)                              // clean — must survive
    ).toDF("doc_id", "lang", "text")
    val evalSet = Seq((1L, s"held out benchmark question $evalShingle indeed"))
      .toDF("doc_id", "text")

    val survivors = curate(base.unionByName(planted), evalSet)
    val survivorIds = survivors.select("doc_id").as[Long].collect().toSet

    // planted-fact assertions: each failure mode caught, the clean doc kept
    assert(!survivorIds.contains(900001L), "exact dup survived")
    assert(!survivorIds.contains(900002L), "near dup survived")
    assert(!survivorIds.contains(900003L), "contaminated doc survived")
    assert(!survivorIds.contains(900004L), "junk doc survived")
    assert(survivorIds.contains(900005L), "clean doc was dropped")
    assert(survivorIds.contains(0L) && survivorIds.contains(1L),
      "keep-min rule must keep the original, not drop both sides")

    // differential oracle: zero collateral change vs the unsalted chain
    val cleanIds = curate(base, evalSet).select("doc_id").as[Long].collect().toSet
    assert(survivorIds == cleanIds + 900005L,
      s"collateral diff: extra=${survivorIds -- cleanIds - 900005L} " +
        s"missing=${cleanIds -- survivorIds}")

    // pack survivors into token-budget chunks, land them partitioned by
    // lang, compact each leaf, read back — ids intact, pruning still fires
    val packed = survivors.packed(budget = 512, partitionCol = "lang")
    assert(packed.where(col("n_tokens") <= 0).isEmpty, "empty token counts")
    val outDir = Files.createTempDirectory("graft-e2e").toString
    Sink.writePartitioned(packed.select("doc_id", "lang", "chunk", "text"),
      outDir, Seq("lang"))
    val report = Sink.compactPartitions(spark, outDir, targetFileBytes = 1L << 30)
    assert(report.nonEmpty && report.values.forall(_._2 == 1), s"compact: $report")

    val back = spark.read.parquet(outDir)
    assert(back.select("doc_id").as[Long].collect().toSet == survivorIds)
    val pruned = back.where(col("lang") === "en")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(lang"),
      s"partition pruning lost through the pipeline sink:\n$plan")
    assert(pruned.count() == survivors.where(col("lang") === "en").count())
  }
}
