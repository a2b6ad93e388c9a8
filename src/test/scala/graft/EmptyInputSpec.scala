package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators._

/** Library hardening: every non-ML operator must handle an EMPTY input
  * frame gracefully — empty out, never a crash. A 100 TB pipeline stage
  * routinely receives empty slices (a partition-pruned day with no data,
  * a batch that fully deduped upstream, a filter that matched nothing),
  * and an operator that throws on them turns a quiet no-op into a failed
  * job. ML fits (KMeans/Word2Vec/MLP) legitimately require data and
  * validate their inputs instead — not exercised here.
  */
class EmptyInputSpec extends SparkSpec {

  import SharedSpark.spark.implicits._

  private def emptyDocs: DataFrame =
    Seq.empty[(Long, String)].toDF("doc_id", "text")
  private def someDocs: DataFrame =
    Seq((1L, "alpha beta gamma delta epsilon"), (2L, "zeta eta theta iota kappa"))
      .toDF("doc_id", "text")

  test("dedup family: empty corpus -> empty result, no crash") {
    assert(Dedup.exactDedup(emptyDocs, Seq("text"), "doc_id").count() == 0)
    assert(Dedup.exactDedupByFingerprint(emptyDocs, "text", "doc_id").count() == 0)
    assert(Dedup.removeNearDups(emptyDocs, "doc_id", "text").count() == 0)
    assert(Dedup.removeNearDupsTransitive(emptyDocs, "doc_id", "text").count() == 0)
    assert(Dedup.segmentDedup(emptyDocs, "doc_id", "text").count() == 0)
    assert(Dedup.removeBoilerplate(emptyDocs, "doc_id", "text", minDocs = 2).count() == 0)
    assert(Dedup.simhash(emptyDocs, "doc_id", "text").count() == 0)
    assert(Dedup.connectedComponents(
      Seq.empty[(Long, Long)].toDF("a_id", "b_id")).count() == 0)
  }

  test("incremental dedup: empty batch keeps nothing, empty existing keeps batch") {
    val emptyBatch = Dedup.dedupIncremental(someDocs, emptyDocs, "doc_id", "text")
    assert(emptyBatch.count() == 0)
    val emptyExisting = Dedup.dedupIncremental(emptyDocs, someDocs, "doc_id", "text")
    assert(emptyExisting.select("doc_id").as[Long].collect().sorted.toSeq == Seq(1L, 2L))
    Pinned.release()
  }

  test("decontamination: empty eval keeps everything, empty train yields nothing") {
    assert(Dedup.decontaminate(someDocs, emptyDocs, "doc_id", "text").count() == 2)
    assert(Dedup.decontaminate(emptyDocs, someDocs, "doc_id", "text").count() == 0)
    assert(Dedup.contaminationReport(emptyDocs, someDocs, "doc_id", "text").count() == 0)
    assert(Dedup.contaminationReportBloom(someDocs, emptyDocs, "doc_id", "text").count() == 0)
    Pinned.release()
  }

  test("sketches: empty input -> empty signatures/estimates, no crash") {
    val sig = Sketches.kmvSignatures(
      Seq.empty[(String, String)].toDF("source", "text"), "source", "text", n = 3, k = 64)
    assert(sig.count() == 0)
    assert(Sketches.kmvJaccard(sig, 64).count() == 0)
    val cms = Sketches.countMinSketchOf(
      Seq.empty[(String, Long)].toDF("token", "n"), "token")
    assert(Sketches.withEstimate(
      Seq.empty[(String, Long)].toDF("token", "n"), "token", cms, "est").count() == 0)
    Pinned.release()
  }

  test("similarity: empty corpus or empty query side -> empty top-k") {
    val emptyEmb = Seq.empty[(Long, Seq[Float])].toDF("vec_id", "embedding")
    val someEmb = Seq((1L, Seq(1f, 0f)), (2L, Seq(0f, 1f))).toDF("vec_id", "embedding")
    assert(Similarity.exactTopK(emptyEmb, someEmb, 3).count() == 0)
    assert(Similarity.exactTopK(someEmb, emptyEmb, 3).count() == 0)
    assert(Similarity.recallSummary(
      Seq.empty[(Long, Long)].toDF("q_id", "n_id"),
      Seq.empty[(Long, Long)].toDF("q_id", "n_id"), 0.8).count() == 1)
  }

  test("sampling/mixing: empty input -> empty output for every sampler") {
    val e = Seq.empty[(Long, String)].toDF("id", "source")
    assert(Sampling.hashSample(e, col("id"), "s", 50).count() == 0)
    assert(Sampling.hashShuffle(e, col("id"), "s").count() == 0)
    assert(Sampling.hashFixedK(e, col("source"), col("id"), "s", 3).count() == 0)
    assert(Sampling.weightedMix(e, col("source"), Map("a" -> 2.0), col("id"), "s").count() == 0)
    assert(Sampling.temperatureMix(e, col("source"), col("id"), "s").count() == 0)
    val et = Seq.empty[(Long, String, Long)].toDF("id", "source", "n_toks")
    assert(Sampling.tokenBudget(et, "source", col("id"), col("n_toks"), "s", 100L).count() == 0)
  }

  test("merge/asof/skew/quality/ngram: empty frames flow through") {
    val base = Seq((1L, "x", 10L)).toDF("k", "v", "ts")
    val eCh = Seq.empty[(Long, String, Long)].toDF("k", "v", "ts")
    assert(Merge.upsertLatest(base, eCh, Seq("k"), Seq("ts")).count() == 1)
    assert(Merge.upsertLatest(eCh, base, Seq("k"), Seq("ts")).count() == 1)
    assert(Merge.scd2History(eCh, Seq("k"), Seq("v")).count() == 0)
    val eL = Seq.empty[(Long, Long)].toDF("k", "ts")
    val r = Seq((1L, 5L, "v")).toDF("k", "ts", "v")
    assert(AsOfJoin.backward(eL, r, "k", "ts", "v").count() == 0)
    assert(AsOfJoin.backward(Seq((1L, 9L)).toDF("k", "ts"),
      Seq.empty[(Long, Long, String)].toDF("k", "ts", "v"), "k", "ts", "v").count() == 1)
    assert(Skew.saltedSum(Seq.empty[(String, Long)].toDF("k", "n"),
      Seq("k"), col("n")).count() == 0)
    assert(Quality.withCompressionRatio(emptyDocs, "text", "ratio").count() == 0)
    val model = NgramLM.fit(emptyDocs, "text")
    assert(model.count() == 0)
    // scoring a non-empty corpus against an EMPTY model: every gram is
    // unseen -> scores flow through the null/zero contract, no crash
    assert(NgramLM.scoreMeanProb(someDocs, model, "doc_id", "text").count() == 2)
    Pinned.release()
  }

  test("compaction: empty/fresh directories are quiet no-ops") {
    val spark2 = spark
    // a dir with zero parquet files reports (0, 0) and touches nothing
    val emptyDir = java.nio.file.Files.createTempDirectory("graft-empty-compact").toString
    assert(graft.sources.Sink.compactParquet(spark2, emptyDir) == ((0, 0)))
    // a partition root with no leaves reports an empty map
    assert(graft.sources.Sink.compactPartitions(spark2, emptyDir).isEmpty)
    // an empty DataFrame written then compacted stays readable
    val written = java.nio.file.Files.createTempDirectory("graft-empty-write").toString
    emptyDocs.write.mode("overwrite").parquet(written)
    graft.sources.Sink.compactParquet(spark2, written)
    assert(spark2.read.parquet(written).count() == 0)
  }

  test("native DL: empty dataset -> seeded init back from fit, NaN accuracy") {
    import graft.ml._
    val cfg = ConvNetConfig(inSize = 10, k = 3, conv1Maps = 2, conv2Maps = 3,
      hidden = 4, classes = 2, pool = 2)
    val none = spark.emptyDataset[(Int, Array[Double])]
    val p = ConvNet.fitParameterAveraging(none, cfg, epochs = 2, lr = 0.1,
      batchSize = 8, seed = 9)
    assert(p.w1.sameElements(ConvNet.init(cfg, 9).w1), "empty fit must return the init")
    assert(ConvNet.accuracy(none, cfg, p).isNaN)
    val lcfg = LstmConfig(inDim = 4, hidden = 3, classes = 2)
    val lNone = spark.emptyDataset[(Int, Seq[Array[Double]])]
    val lp = Lstm.fitParameterAveraging(lNone, lcfg, epochs = 2, lr = 0.01,
      batchSize = 8, seed = 9)
    assert(lp.wx.sameElements(Lstm.init(lcfg, 9).wx))
    assert(Lstm.accuracy(lNone, lcfg, lp).isNaN)
  }

  test("round-7 ops: empty inputs flow through hubCap pairs, invariant summary, and index append") {
    // candidatePairs with the hub guard on an empty band table
    val eBands = Seq.empty[(Int, String, Long)].toDF("band", "key", "doc_id")
    assert(Dedup.candidatePairs(eBands, hubCap = Some(8)).count() == 0)
    // invariant summary of an empty semDedup result: laws hold vacuously
    val eRes = Seq.empty[(Long, Int, Long, Boolean, Option[Double])]
      .toDF("id", "cell", "component", "kept", "witness_cos")
    val (n, ok) = Similarity.semDedupInvariants(eRes, 0.999)
      .as[(Long, Boolean)].head()
    assert(n == 0L && ok, "empty result must satisfy the invariants vacuously")
    Pinned.release()
    // appending an EMPTY batch to a valid IVF-PQ index: no rows added,
    // manifest re-stamped, index still valid
    val emb = (0 until 60).map(i =>
      (i.toLong, Seq.tabulate(8)(d => ((i * 7 + d * 3) % 13).toFloat)))
      .toDF("vec_id", "embedding")
    val dir = java.nio.file.Files.createTempDirectory("graft-ivfempty").toString
    ProductQuantization.writeIvfPqIndex(emb, dir, nCells = 2, dim = 8, m = 2,
      kCodes = 4, fitSampleFraction = 1.0)
    val before = SharedSpark.spark.read.parquet(s"$dir/codes").count()
    val eBatch = Seq.empty[(Long, Seq[Float])].toDF("vec_id", "embedding")
    ProductQuantization.appendToIvfPqIndex(eBatch, dir, nCells = 2, dim = 8,
      m = 2, kCodes = 4, fitSampleFraction = 1.0)
    assert(ProductQuantization.ivfPqIndexMatches(SharedSpark.spark, dir,
      nCells = 2, dim = 8, m = 2, kCodes = 4, fitSampleFraction = 1.0))
    assert(SharedSpark.spark.read.parquet(s"$dir/codes").count() == before)
  }

  test("bpe: empty token table trains zero merges; encode still lossless") {
    val merges = Bpe.trainOn(Seq.empty[String].toDF("token"), "token", 10)
    assert(merges.isEmpty)
    val out = Bpe.withPieces(Seq((1L, Seq("ab"))).toDF("id", "toks"), "toks", merges, "p")
    assert(out.select("p").as[Seq[String]].head() == Seq("a", "b", Bpe.EndOfWord))
  }
}
