package graft

import org.apache.spark.sql.functions._
import graft.operators.{AsOfJoin, Dedup, Multimodal, Similarity}
import graft.sources.Tables

/** Operator-library behavior tests: dedup determinism, LSH recall,
  * as-of semantics, multimodal plumbing (E1/E2/E3/E4, J6-asof).
  */
class OperatorsSpec extends SparkSpec {

  import SharedSpark.spark.implicits._

  test("E1: fingerprint dedup equals full-text dedup (digest shuffle, same survivors)") {
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
    val corpus = docs.union(docs.where(col("doc_id") < 30)
      .select((col("doc_id") + 5000).as("doc_id"), col("text")))
    val byText = Dedup.exactDedup(corpus, Seq("text"), "doc_id")
      .select("doc_id").as[Long].collect().sorted.toSeq
    val byFp = Dedup.exactDedupByFingerprint(corpus, "text", "doc_id")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(byFp == byText)
    assert(byFp.forall(_ < 5000), "a planted copy survived")
    // r10: null-text rows are NOT duplicates of each other — the window
    // used to group every null fingerprint together and delete all but one
    val withNulls = Seq[(Long, String)]((1L, "same"), (2L, "same"),
      (3L, null), (4L, null)).toDF("doc_id", "text")
    val survivors = Dedup.exactDedupByFingerprint(withNulls, "text", "doc_id")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(survivors == Seq(1L, 3L, 4L),
      s"null-text rows must pass through untouched: $survivors")
    // degenerate numHashes refuses loudly instead of NoSuchElementException
    // (minhash) or silently ZERO bands = zero candidates forever (bands)
    intercept[IllegalArgumentException] {
      Dedup.minhashSignatures(Dedup.shingleSet(withNulls, "doc_id", "text"), 0)
    }
    intercept[IllegalArgumentException] {
      Dedup.bands(withNulls, numHashes = 0, rowsPerBand = 4)
    }
  }

  test("E1: exactDedup keeps the min-tiebreak row deterministically") {
    val df = Seq(("x", 3L, "c"), ("x", 1L, "a"), ("x", 2L, "b"), ("y", 9L, "z"))
      .toDF("k", "id", "payload")
    val out = Dedup.exactDedup(df, Seq("k"), "id").orderBy("k")
      .as[(String, Long, String)].collect().toSeq
    assert(out == Seq(("x", 1L, "a"), ("y", 9L, "z")))
  }

  test("E1: segmentDedup — unique docs reassemble verbatim, full copies vanish, cross-doc repeats keep first") {
    // doc 1 and 2 share no 3-token segment; doc 10 is a verbatim copy of 1;
    // doc 20 starts with doc 1's first segment then diverges
    val d1 = "a b c d e f"          // segments: "a b c", "d e f"
    val d2 = "g h i j k l"          // segments: "g h i", "j k l"
    val d20 = "a b c x y z"         // first segment collides with d1's
    val corpus = Seq((1L, d1), (2L, d2), (10L, d1), (20L, d20))
      .toDF("doc_id", "text")
    val out = Dedup.segmentDedup(corpus, "doc_id", "text", segTokens = 3)
      .orderBy("doc_id")
      .as[(Long, Long, String)].collect().toSeq
    assert(out == Seq((1L, 2L, d1), (2L, 2L, d2), (20L, 1L, "x y z")))
    // determinism under partitioning: same survivors at parallelism 1
    val out1 = Dedup.segmentDedup(corpus.repartition(1), "doc_id", "text", segTokens = 3)
      .orderBy("doc_id").as[(Long, Long, String)].collect().toSeq
    assert(out1 == out)
  }

  test("E1: segmentDedup handles ragged tails and single-token docs") {
    val corpus = Seq((1L, "a b c d"), (2L, "z")).toDF("doc_id", "text")
    val out = Dedup.segmentDedup(corpus, "doc_id", "text", segTokens = 3)
      .orderBy("doc_id").as[(Long, Long, String)].collect().toSeq
    // doc 1 = "a b c" + tail "d"; doc 2 = its single token
    assert(out == Seq((1L, 2L, "a b c d"), (2L, 1L, "z")))
  }

  test("E1: segmentDedup string-id fallback matches the packed-long path's survivors") {
    // same corpus under long ids (packed hash-agg path) and their string
    // twins (min(struct) fallback) — ids chosen so both orders agree
    val longCorpus = Seq((1L, "a b c d e f"), (2L, "g h i j k l"),
      (5L, "a b c d e f"), (7L, "a b c x y z")).toDF("doc_id", "text")
    val strCorpus = longCorpus.select(
      format_string("id%d", col("doc_id")).as("doc_id"), col("text"))
    val viaLong = Dedup.segmentDedup(longCorpus, "doc_id", "text", segTokens = 3)
      .select(format_string("id%d", col("doc_id")).as("doc_id"), col("n_segments"), col("cleaned_text"))
      .orderBy("doc_id").as[(String, Long, String)].collect().toSeq
    val viaStr = Dedup.segmentDedup(strCorpus, "doc_id", "text", segTokens = 3)
      .orderBy("doc_id").as[(String, Long, String)].collect().toSeq
    assert(viaStr == viaLong)
    assert(viaStr.map(_._1) == Seq("id1", "id2", "id7"))
  }

  test("E1: segmentDedup raises on ids outside the packed-long range instead of mis-deduping") {
    val corpus = Seq((1L << 50, "a b c")).toDF("doc_id", "text")
    val e = intercept[Exception] {
      Dedup.segmentDedup(corpus, "doc_id", "text", segTokens = 3).collect()
    }
    assert(e.getMessage != null)
  }

  test("E1: segmentDedup packedIds=false handles hash-derived (negative / full-range) long ids") {
    // the documented escape hatch for xxhash64-style ids: the general
    // min(struct) path is correct for every orderable id value
    val corpus = Seq((-42L, "a b c d e f"), (1L << 50, "a b c d e f"),
      (-7L, "g h i j k l")).toDF("doc_id", "text")
    val out = Dedup.segmentDedup(corpus, "doc_id", "text", segTokens = 3,
      packedIds = false).orderBy("doc_id")
      .as[(Long, Long, String)].collect().toSeq
    // -42 < 2^50, so -42 keeps the shared text and 2^50 vanishes entirely
    assert(out == Seq((-42L, 2L, "a b c d e f"), (-7L, 2L, "g h i j k l")))
  }

  test("E2: candidatePairs hubCap — oversized buckets emit hub pairs only; small buckets are untouched; keep-min survivors agree") {
    import graft.operators.Dedup
    // one small bucket (3 docs -> 3 pairs) and one oversized bucket
    // (6 docs -> 15 pairs uncapped, 5 hub pairs capped)
    val bands = (Seq((0, "small", 1L), (0, "small", 2L), (0, "small", 3L)) ++
      (10L to 15L).map(i => (1, "giant", i)))
      .toDF("band", "key", "doc_id")
    val uncapped = Dedup.candidatePairs(bands)
      .as[(Long, Long)].collect().toSet
    assert(uncapped.size == 3 + 15)
    val capped = Dedup.candidatePairs(bands, hubCap = Some(4))
      .as[(Long, Long)].collect().toSet
    val smallPairs = Set((1L, 2L), (1L, 3L), (2L, 3L))
    val hubPairs = (11L to 15L).map(b => (10L, b)).toSet
    assert(capped == smallPairs ++ hubPairs,
      s"capped pairs wrong: ${capped.toSeq.sorted}")
    // a cap no bucket exceeds must reproduce the exact pair set
    assert(Dedup.candidatePairs(bands, hubCap = Some(100))
      .as[(Long, Long)].collect().toSet == uncapped)
    // end-to-end: for a clique cluster, keep-min cleaning survives the cap
    // unchanged — every non-min member still pairs with the minimum
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val cluster = (0 until 30).map(i => (100L + i, s"$base variant$i"))
    val others = Seq((1L, "one two three four five six seven eight nine ten"),
      (2L, "eleven twelve thirteen fourteen fifteen sixteen seventeen eighteen nineteen twenty"))
    val corpus = (cluster ++ others).toDF("doc_id", "text")
    val ref = Dedup.removeNearDups(corpus, "doc_id", "text", threshold = 0.5)
      .select("doc_id").as[Long].collect().toSet
    graft.operators.Pinned.release()
    val drop = Dedup.nearDupPairs(corpus, "doc_id", "text", threshold = 0.5,
      hubCap = Some(8)).select(col("b_id")).distinct()
    val cappedSurv = corpus.join(drop.withColumnRenamed("b_id", "doc_id"),
      Seq("doc_id"), "left_anti").select("doc_id").as[Long].collect().toSet
    graft.operators.Pinned.release()
    assert(cappedSurv == ref, s"capped survivors $cappedSurv != $ref")
    assert(ref == Set(100L, 1L, 2L), "cluster must collapse to its min id")
  }

  test("E2: MinHash-LSH finds planted near-dups and no false positives on tiny corpus") {
    val docs = (0 until 30).map { i =>
      val words = (0 until 40).map(j => s"w${(i * 13 + j * 7) % 97}x$j").mkString(" ")
      (i.toLong, words)
    }
    // plant: doc 100 = doc 0 with last 4 words changed
    val base = docs.head._2.split(" ")
    val near = (100L, (base.dropRight(4) ++ Seq("a1", "a2", "a3", "a4")).mkString(" "))
    val corpus = (docs :+ near).toDF("doc_id", "text")
    val pairs = Dedup.nearDupPairs(corpus, "doc_id", "text", threshold = 0.5)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 100L)), s"planted pair missed: $pairs")
    assert(pairs.size == 1, s"false positives: $pairs")
  }

  test("E2: candidate pairs never bypass exact-Jaccard verification") {
    val corpus = Tables.documents(spark, sfDir).limit(50).select("doc_id", "text")
    val sh = Dedup.shingleSet(corpus, "doc_id", "text")
    val cand = Dedup.candidatePairs(Dedup.bands(Dedup.minhashSignatures(sh)))
    val verified = Dedup.exactJaccard(cand, sh)
    // jaccard is always defined and in (0, 1]
    val jacs = verified.select("jaccard").as[Double].collect()
    assert(jacs.forall(j => j > 0.0 && j <= 1.0))
  }

  test("E2: simhash of identical docs equal; near-dup within small hamming") {
    val df = Seq((1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"),
      (3L, "alpha beta gamma delta epsilon theta")).toDF("doc_id", "text")
    val sims = Dedup.simhash(df, "doc_id", "text").as[(Long, Long)].collect().toMap
    assert(sims(1L) == sims(2L))
    assert(java.lang.Long.bitCount(sims(1L) ^ sims(3L)) <= 12)
  }

  test("E3: LSH ANN achieves >=30% recall@5 vs exact top-k on fixtures") {
    val emb = Tables.embeddings(spark, sfDir)
    val q = emb.where(col("vec_id") < 20)
    val exact = Similarity.exactTopK(emb, q, 5)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val ann = Similarity.lshTopK(emb, q, 5)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val recall = (exact & ann).size.toDouble / exact.size
    assert(recall >= 0.3, s"recall too low: $recall")
    info(f"LSH recall@5 = $recall%.2f (${ann.size} returned)")
  }

  test("E3: recallSummary — mean recall over per-query hit fractions, floor gates the boolean") {
    // exact: q1 -> {10, 11}, q2 -> {20, 21}; ann hits 1/2 for q1 and 2/2
    // for q2 (plus a non-neighbor that must not count) -> mean 0.75
    val exact = Seq((1L, 10L), (1L, 11L), (2L, 20L), (2L, 21L)).toDF("q_id", "n_id")
    val ann = Seq((1L, 10L), (1L, 99L), (2L, 20L), (2L, 21L)).toDF("q_id", "n_id")
    val ok = Similarity.recallSummary(ann, exact, 0.7)
      .as[(Long, Boolean)].head()
    assert(ok == ((2L, true)))
    val notOk = Similarity.recallSummary(ann, exact, 0.8)
      .as[(Long, Boolean)].head()
    assert(notOk == ((2L, false)))
  }

  test("E3: recallSummary — a query the ANN returns nothing for counts as zero recall") {
    val exact = Seq((1L, 10L), (2L, 20L)).toDF("q_id", "n_id")
    val ann = Seq((1L, 10L)).toDF("q_id", "n_id") // q2 entirely missed
    val (n, ok) = Similarity.recallSummary(ann, exact, 0.6)
      .as[(Long, Boolean)].head()
    assert(n == 2L) // q2 still counted (denominator from the exact side)
    assert(!ok)     // mean = (1 + 0)/2 = 0.5 < 0.6
  }

  /** Review-r9 pin: an ANN result that returns the SAME neighbor twice
    * (the duplicated-code defect the append path guards against) must not
    * count it as two hits — inflated recall would keep the oracle gate
    * green through a real regression.
    */
  test("E3: recallSummary — duplicate (q_id, n_id) rows count as one hit") {
    val exact = Seq((1L, 10L), (1L, 11L)).toDF("q_id", "n_id")
    val ann = Seq((1L, 10L), (1L, 10L)).toDF("q_id", "n_id") // dup, missed 11
    val (_, ok) = Similarity.recallSummary(ann, exact, 0.8)
      .as[(Long, Boolean)].head()
    assert(!ok, "recall must read 0.5, not 1.0, when the hit is duplicated")
  }

  /** Review-r9 pins: NaN embeddings (upstream 0/0 normalization) must not
    * hijack similarity search — Spark sorts NaN ABOVE every double, so a
    * NaN cosine would rank the corrupt row #1 for every query. The native
    * cosine nulls NaN results; nulls sort last under desc and fall out.
    */
  test("E3: a NaN corpus embedding never ranks in exact top-k") {
    val clean = (0 until 20).map(i =>
      (i.toLong, Seq.tabulate(8)(d => math.sin(i * 8 + d).toFloat)))
    val corrupt = (100L, Seq.tabulate(8)(d =>
      if (d == 3) Float.NaN else 1.0f))
    val emb = (clean :+ corrupt).toDF("vec_id", "embedding")
    val q = emb.where(col("vec_id") < 3)
    val top = Similarity.exactTopK(emb, q, 5)
      .select("n_id").as[Long].collect()
    assert(!top.contains(100L),
      "the NaN row must fall out of every top-k window, not rank first")
    // and the LSH path's signature guard refuses a silently-wrapping width
    intercept[IllegalArgumentException] {
      Similarity.lshSignature(col("embedding"), dim = 8, numPlanes = 65)
    }
    // r10: a wrong-LENGTH (or null) embedding refuses loudly — every such
    // row used to co-bucket under the all-zero signature, degenerating the
    // bucket join toward the cross product
    val wrongDim = Seq((1L, Seq.fill(8)(0.5f)), (2L, Seq.fill(16)(0.5f)))
      .toDF("vec_id", "embedding")
    val eDim = intercept[Exception] {
      wrongDim.select(Similarity.lshSignature(col("embedding"), dim = 8,
        numPlanes = 4)).collect()
    }
    assert(eDim.getMessage != null && eDim.getMessage.contains("does not match dim"),
      s"${eDim.getMessage}")
  }

  /** Review-r9 pins on the continual-ingest guards: a batch in which NOT
    * ONE row is indexable (upstream schema change) refuses loudly instead
    * of reporting success while skipping the whole batch; and a row with a
    * null SLOT (correct length) is excluded — encode() would store a null
    * code for it, a permanently unretrievable index row.
    */
  test("E3: append refuses an all-unindexable batch; null-slot rows never enter the index") {
    import graft.operators.ProductQuantization
    val emb = (0 until 40).map(i =>
      (i.toLong, Seq.tabulate(8)(d => ((i * 5 + d) % 11).toFloat)))
      .toDF("vec_id", "embedding")
    val dir = java.nio.file.Files.createTempDirectory("graft-appendguard").toString
    ProductQuantization.writeIvfPqIndex(emb, dir, nCells = 4, dim = 8, m = 2,
      kCodes = 8, fitSampleFraction = 1.0)
    // schema drift: every batch row is 4-wide against the stored dim=8
    val wrongDim = (100 until 110).map(i =>
      (i.toLong, Seq.tabulate(4)(_.toFloat))).toDF("vec_id", "embedding")
    val e = intercept[IllegalStateException] {
      ProductQuantization.appendToIvfPqIndex(wrongDim, dir, nCells = 4, dim = 8,
        m = 2, kCodes = 8, fitSampleFraction = 1.0)
    }
    assert(e.getMessage.contains("none of the 10"), e.getMessage)
    assert(ProductQuantization.ivfPqIndexMatches(spark, dir, nCells = 4, dim = 8,
      m = 2, kCodes = 8, fitSampleFraction = 1.0),
      "the refusal must fire BEFORE the manifest is invalidated")
    // mixed batch: the null-slot row is dropped, the good row lands
    val mixed = Seq(
      (200L, Seq.tabulate(8)(d => java.lang.Float.valueOf((d + 1).toFloat))),
      (201L, Seq.tabulate(8)(d =>
        if (d == 2) null else java.lang.Float.valueOf(d.toFloat))))
      .toDF("vec_id", "embedding")
    ProductQuantization.appendToIvfPqIndex(mixed, dir, nCells = 4, dim = 8,
      m = 2, kCodes = 8, fitSampleFraction = 1.0)
    val ids = spark.read.parquet(s"$dir/codes").select("n_id").as[Long].collect().toSet
    assert(ids.contains(200L) && !ids.contains(201L),
      "null-slot embeddings must be excluded from the stored index")
  }

  test("E3: PQ index params manifest — probe gate rejects a stale or mismatched index") {
    import graft.operators.ProductQuantization
    val emb = Tables.embeddings(spark, sfDir)
    val dir = java.nio.file.Files.createTempDirectory("graft-pqman").toString
    ProductQuantization.writeIndex(emb, dir, kCodes = 8, fitSampleFraction = 0.5)
    assert(ProductQuantization.pqIndexMatches(spark, dir,
      kCodes = 8, fitSampleFraction = 0.5))
    // any differing build parameter must read as a mismatch -> rebuild
    assert(!ProductQuantization.pqIndexMatches(spark, dir,
      kCodes = 16, fitSampleFraction = 0.5))
    assert(!ProductQuantization.pqIndexMatches(spark, dir,
      kCodes = 8, fitSampleFraction = 0.25))
    // a pre-manifest index (params dir missing) must also mismatch
    val bare = java.nio.file.Files.createTempDirectory("graft-pqbare").toString
    assert(!ProductQuantization.pqIndexMatches(spark, bare, kCodes = 8))
    // IVF-PQ manifests carry nCells on top of the PQ params
    val ivfDir = java.nio.file.Files.createTempDirectory("graft-ivfman").toString
    ProductQuantization.writeIvfPqIndex(emb, ivfDir, nCells = 4, kCodes = 8,
      fitSampleFraction = 0.5)
    assert(ProductQuantization.ivfPqIndexMatches(spark, ivfDir, nCells = 4,
      kCodes = 8, fitSampleFraction = 0.5))
    assert(!ProductQuantization.ivfPqIndexMatches(spark, ivfDir, nCells = 8,
      kCodes = 8, fitSampleFraction = 0.5))
  }

  test("E3: PQ manifest is a COMPLETION marker — a rebuild that dies leaves no valid manifest") {
    // a rebuild over an existing same-params index must invalidate the old
    // manifest BEFORE touching index files: if the build dies mid-write,
    // the next probe must see a mismatch and rebuild, not ADC-scan a
    // half-overwritten codes table
    import graft.operators.ProductQuantization
    val emb = Tables.embeddings(spark, sfDir)
    val dir = java.nio.file.Files.createTempDirectory("graft-pqcrash").toString
    ProductQuantization.writeIndex(emb, dir, kCodes = 8, fitSampleFraction = 0.5)
    assert(ProductQuantization.pqIndexMatches(spark, dir,
      kCodes = 8, fitSampleFraction = 0.5))
    // a rebuild attempt that fails at ANY point (here: the earliest
    // possible one, the fit-fraction validation) must already have
    // invalidated the previous manifest
    intercept[IllegalArgumentException] {
      ProductQuantization.writeIndex(emb, dir, kCodes = 8, fitSampleFraction = -1.0)
    }
    assert(!ProductQuantization.pqIndexMatches(spark, dir,
      kCodes = 8, fitSampleFraction = 0.5))
    // same contract for the IVF-PQ writer
    val ivfDir = java.nio.file.Files.createTempDirectory("graft-ivfcrash").toString
    ProductQuantization.writeIvfPqIndex(emb, ivfDir, nCells = 4, kCodes = 8,
      fitSampleFraction = 0.5)
    intercept[IllegalArgumentException] {
      ProductQuantization.writeIvfPqIndex(emb, ivfDir, nCells = 4, kCodes = 8,
        fitSampleFraction = -1.0)
    }
    assert(!ProductQuantization.ivfPqIndexMatches(spark, ivfDir, nCells = 4,
      kCodes = 8, fitSampleFraction = 0.5))
  }

  test("E3: appendToIvfPqIndex — appended codes equal encoding the batch against the stored artifacts; probe finds them") {
    import graft.operators.{ProductQuantization, Similarity}
    val emb = Tables.embeddings(spark, sfDir)
    val seed = emb.where(col("vec_id") % 10 =!= 0)
    val batch = emb.where(col("vec_id") % 10 === 0)
    val dir = java.nio.file.Files.createTempDirectory("graft-ivfapp").toString
    ProductQuantization.writeIvfPqIndex(seed, dir, nCells = 4, kCodes = 8,
      fitSampleFraction = 0.5)
    ProductQuantization.appendToIvfPqIndex(batch, dir, nCells = 4, kCodes = 8,
      fitSampleFraction = 0.5)
    // manifest re-stamped after the append completes
    assert(ProductQuantization.ivfPqIndexMatches(spark, dir, nCells = 4,
      kCodes = 8, fitSampleFraction = 0.5))
    // the append law: stored batch codes == assign+encode of the batch
    // against the STORED cells/codebooks (no refit anywhere)
    val cents = spark.read.parquet(s"$dir/cells")
    val books = ProductQuantization.readCodebooks(spark, dir)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select(col("cell").cast("int"), col("n_id"), col("codes"))
        .as[(Int, Long, Seq[Int])].collect().toSet
    val stored = spark.read.parquet(s"$dir/codes")
    val batchIds = batch.select("vec_id").as[Long].collect().toSet
    assert(rows(stored.where(col("n_id") % 10 === 0)) ==
      rows(ProductQuantization.encodeAgainstIvfPq(batch, cents, books)))
    // CROSS-PATH law (the one that actually pins bit-compatibility): the
    // BUILD-written seed codes equal the APPEND encoder's output for the
    // same vectors — build and append share one assignment rule, so this
    // is not a circular re-run of the same code path
    assert(rows(stored.where(col("n_id") % 10 =!= 0)) ==
      rows(ProductQuantization.encodeAgainstIvfPq(seed, cents, books)))
    assert(stored.count() == emb.count(), "index must cover seed + batch exactly once")
    assert(rows(stored).map(_._2) == batchIds ++
      seed.select("vec_id").as[Long].collect().toSet)
    // appended vectors are as findable as built-in ones: probing with the
    // batch as queries over the full corpus clears the same recall floor
    val q = batch.where(col("vec_id") < 100)
    val ann = ProductQuantization.ivfPqProbe(spark, dir, emb, q, k = 5,
      nProbe = 3, rerank = 16)
    val (nQ, ok) = Similarity.recallSummary(ann,
      Similarity.exactTopK(emb, q, k = 5), 0.8).as[(Long, Boolean)].head()
    assert(nQ == q.count() && ok, s"appended-vector recall below floor ($nQ queries)")
    // refusal law: append into a missing/mismatched index must throw, not mix codes
    intercept[IllegalStateException] {
      ProductQuantization.appendToIvfPqIndex(batch, dir, nCells = 8, kCodes = 8,
        fitSampleFraction = 0.5)
    }
    // RETRY IDEMPOTENCE (review r8): re-running the append with the same
    // batch — an at-least-once orchestrator's timeout retry — must not
    // double-write codes; and a batch row with a null or mis-sized
    // embedding is dropped (un-indexable) instead of NPE-killing the job
    // after the manifest invalidation
    val preRetry = rows(stored)
    val dirty = batch.select("vec_id", "embedding").union(Seq(
        (9000001L, null.asInstanceOf[Seq[Float]]),
        (9000002L, Seq(1.0f, 2.0f))).toDF("vec_id", "embedding"))
    ProductQuantization.appendToIvfPqIndex(dirty, dir, nCells = 4, kCodes = 8,
      fitSampleFraction = 0.5)
    assert(rows(spark.read.parquet(s"$dir/codes")) == preRetry,
      "retried append must be a no-op on already-indexed ids; corrupt rows dropped")
    assert(ProductQuantization.ivfPqIndexMatches(spark, dir, nCells = 4,
      kCodes = 8, fitSampleFraction = 0.5), "manifest re-stamped after the no-op retry")
    // maintenance: compacting the per-cell delta files left by the append is
    // content-preserving — same code rows, same probe answer, manifest and
    // staleness probe still valid, and every cell leaf collapses to 1 file
    val preCompact = rows(stored)
    val report = ProductQuantization.compactIvfPqCodes(spark, dir,
      targetFileBytes = 1L << 30)
    assert(report.nonEmpty && report.keys.forall(_.startsWith("cell=")), s"bad leaves: $report")
    assert(report.values.exists(_._1 >= 2) && report.values.forall(_._2 == 1),
      s"append should leave delta files, compaction exactly 1 per cell: $report")
    assert(rows(spark.read.parquet(s"$dir/codes")) == preCompact)
    assert(ProductQuantization.ivfPqIndexMatches(spark, dir, nCells = 4,
      kCodes = 8, fitSampleFraction = 0.5), "manifest invalidated by compaction")
    val postAnn = ProductQuantization.ivfPqProbe(spark, dir, emb, q, k = 5,
      nProbe = 3, rerank = 16)
    assert(Similarity.recallSummary(postAnn, Similarity.exactTopK(emb, q, k = 5), 0.8)
      .as[(Long, Boolean)].head() == ((nQ, ok)), "probe answer changed after compaction")
  }

  test("E3: indexCovers — the row-count staleness probe catches a regenerated corpus") {
    import graft.operators.ProductQuantization
    val emb = (0 until 40).map(i =>
      (i.toLong, Seq.tabulate(8)(d => ((i * 5 + d) % 11).toFloat)))
      .toDF("vec_id", "embedding")
    val dir = java.nio.file.Files.createTempDirectory("graft-cover").toString
    ProductQuantization.writeIvfPqIndex(emb, dir, nCells = 2, dim = 8, m = 2,
      kCodes = 4, fitSampleFraction = 1.0)
    // params still match after a simulated fixture regeneration that
    // changes cardinality — only the row-count probe can catch it
    assert(ProductQuantization.ivfPqIndexMatches(spark, dir, nCells = 2,
      dim = 8, m = 2, kCodes = 4, fitSampleFraction = 1.0))
    assert(ProductQuantization.indexCovers(spark, dir, 40L))
    assert(!ProductQuantization.indexCovers(spark, dir, 60L))
    // absent/unreadable index reads as not-covering, never throws
    assert(!ProductQuantization.indexCovers(spark, "/nonexistent/idx", 1L))
  }

  test("as-of join: equal-ts right duplicates resolve to the max value deterministically") {
    val left = Seq((1L, 10L)).toDF("k", "ts")
    val right = Seq((1L, 10L, "rA"), (1L, 10L, "rZ"), (1L, 10L, "rM")).toDF("k", "ts", "v")
    val out = AsOfJoin.backward(left, right, "k", "ts", "v")
      .select("v").as[String].head()
    assert(out == "rZ") // documented tiebreak: greatest value wins
  }

  test("as-of join: latest right value at-or-before each left ts") {
    val left = Seq((1L, 10L), (1L, 20L), (1L, 5L), (2L, 10L))
      .toDF("k", "ts")
    val right = Seq((1L, 10L, "r10"), (1L, 15L, "r15"), (2L, 99L, "r99"))
      .toDF("k", "ts", "v")
    val out = AsOfJoin.backward(left, right, "k", "ts", "v")
      .select("k", "ts", "v").as[(Long, Long, Option[String])].collect().toSet
    assert(out == Set((1L, 5L, None), (1L, 10L, Some("r10")), (1L, 20L, Some("r15")),
      (2L, 10L, None)))
  }

  test("dedupIncremental vets only the new batch against the existing corpus") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 4
    val existing = Seq((1L, base), (2L, "some other existing document body here with words")).toDF("doc_id", "text")
    val batch = Seq(
      (100L, base),                                  // exact dup of doc 1 -> dropped
      (101L, base + "lambda mu nu"),                 // near-dup of doc 1 -> dropped
      (102L, "a genuinely new document about entirely different topics altogether")
    ).toDF("doc_id", "text")
    val kept = Dedup.dedupIncremental(existing, batch, "doc_id", "text", threshold = 0.5)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(102L), s"kept=$kept")

    // orientation robustness: batch ids sort BEFORE existing ids — the
    // batch near-dup must still drop (cross pairs drop the batch side in
    // either orientation)
    val existingHi = Seq((500L, base)).toDF("doc_id", "text")
    val batchLo = Seq((1L, base + "lambda mu nu"), (2L, "fresh unique content words")).toDF("doc_id", "text")
    val keptLo = Dedup.dedupIncremental(existingHi, batchLo, "doc_id", "text")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(keptLo == Seq(2L), s"keptLo=$keptLo")

    // batch-internal exact dups of SHORT docs (no 3-shingles) still dedup
    val shortBatch = Seq((200L, "hi there"), (201L, "hi there")).toDF("doc_id", "text")
    val keptShort = Dedup.dedupIncremental(existing, shortBatch, "doc_id", "text")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(keptShort == Seq(200L), s"keptShort=$keptShort")

    // a short batch doc exactly duplicating a short EXISTING doc is caught
    // too: the signature index keeps fingerprints of shingle-less docs
    val shortExisting = Seq((50L, "hi there"), (51L, "unrelated long document body of many words")).toDF("doc_id", "text")
    val keptCross = Dedup.dedupIncremental(shortExisting,
      Seq((300L, "hi there"), (301L, "brand new words nobody wrote before today")).toDF("doc_id", "text"),
      "doc_id", "text")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(keptCross == Seq(301L), s"keptCross=$keptCross")

    // the stored signature-index path returns the same answer as inline
    val idx = Dedup.signatureIndex(existing, "doc_id", "text")
    val keptIdx = Dedup.dedupIncremental(existing, batch, "doc_id", "text",
      threshold = 0.5, existingIndex = Some(idx))
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(keptIdx == kept, s"index path diverged: $keptIdx vs $kept")
  }

  test("dedupIncremental: an empty batch (streaming delivers those) yields empty, on both probe paths") {
    val existing = Seq((1L, "some existing document body here with words")).toDF("doc_id", "text")
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], existing.schema)
    assert(Dedup.dedupIncremental(existing, empty, "doc_id", "text").count() == 0)
    val idx = Dedup.signatureIndex(existing, "doc_id", "text")
    val bandIdx = Dedup.bandIndexTable(idx)
    assert(Dedup.dedupIncremental(existing, empty, "doc_id", "text",
      existingIndex = Some(idx), bandIndex = Some(bandIdx)).count() == 0)
  }

  test("dedupIncremental stored band index: bucket-pruned probe, no stored-side shuffle, same survivors") {
    val existing = Tables.documents(spark, sfDir).select("doc_id", "text")
    val someText = existing.where(col("doc_id") === 7L).select("text").as[String].head()
    val batch = Seq(
      (900001L, someText),                               // exact dup -> dropped
      (900002L, someText + " with a small appended tail"), // near-dup -> dropped
      (900003L, "entirely novel words that no fixture document contains anywhere")
    ).toDF("doc_id", "text")
    val idx = Dedup.signatureIndex(existing, "doc_id", "text")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // fresh metastore entry + location (same hygiene as ScaleOpsSpec)
    spark.sql("DROP TABLE IF EXISTS g_band_idx")
    val loc = new java.io.File("/tmp/graft-warehouse", "g_band_idx")
    if (loc.exists()) { import scala.reflect.io.Directory; new Directory(loc).deleteRecursively() }
    Dedup.writeBandIndex(idx, "g_band_idx", buckets = 32)
    val stored = spark.table("g_band_idx")

    val inline = Dedup.dedupIncremental(existing, batch, "doc_id", "text",
      existingIndex = Some(idx))
      .select("doc_id").as[Long].collect().sorted.toSeq
    val probed = Dedup.dedupIncremental(existing, batch, "doc_id", "text",
      existingIndex = Some(idx), bandIndex = Some(stored))
    val probedKept = probed.select("doc_id").as[Long].collect().sorted.toSeq
    assert(probedKept == inline, s"stored-band path diverged: $probedKept vs $inline")
    assert(probedKept == Seq(900003L), s"kept=$probedKept")

    // the probe must READ only touched buckets (bucket pruning from the IN
    // filter) and must never shuffle the stored band table
    val plan = probed.queryExecution.executedPlan.toString
    val sel = "SelectedBucketsCount: (\\d+) out of (\\d+)".r
      .findFirstMatchIn(plan)
    assert(sel.isDefined, s"no bucket pruning on the stored band index:\n$plan")
    val (selected, total) = (sel.get.group(1).toInt, sel.get.group(2).toInt)
    assert(selected < total,
      s"probe scanned every bucket ($selected of $total):\n$plan")
    assert(!plan.contains("Exchange hashpartitioning(bkey"),
      s"stored band table was shuffled:\n$plan")
    // candidate re-shingling pushes the collision-bounded id set down as an
    // IN predicate — shown as In/INSET, or EqualTo when Catalyst collapses
    // a single-candidate list — reaching the parquet scan's row-group
    // stats, instead of a corpus-wide text scan behind a semi-join
    assert(plan.contains("In(doc_id") || plan.contains("EqualTo(doc_id") ||
        "doc_id#\\d+L? (IN|INSET|= )".r.findFirstIn(plan).isDefined,
      s"candidate ids not pushed into the existing scan:\n$plan")
    idx.unpersist()
  }

  /** r10 (VERDICT r9 #7): the stored band table has an APPEND path, so a
    * long-running ingest loop maintains it per batch instead of rebuilding
    * it per ingest (O(corpus)) or probing it stale. Parity contract: the
    * appended table probes identically to one freshly built over the same
    * union; a mismatched bucket spec is refused loudly.
    */
  test("appendBandIndex maintains the stored index: appended == fresh-built, mismatched spec refused") {
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
    val older = docs.where(col("doc_id") % 2 === 0)
    val newer = docs.where(col("doc_id") % 2 =!= 0)
    val idxOld = Dedup.signatureIndex(older, "doc_id", "text")
    val idxNew = Dedup.signatureIndex(newer, "doc_id", "text")
    val idxAll = Dedup.signatureIndex(docs, "doc_id", "text")

    for (t <- Seq("g_band_append", "g_band_fresh")) {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File("/tmp/graft-warehouse", t)
      if (loc.exists()) { import scala.reflect.io.Directory; new Directory(loc).deleteRecursively() }
    }
    Dedup.writeBandIndex(idxOld, "g_band_append", buckets = 32)
    Dedup.appendBandIndex(idxNew, "g_band_append", buckets = 32)
    Dedup.writeBandIndex(idxAll, "g_band_fresh", buckets = 32)

    // same multiset of (bkey, doc_id) rows as the fresh full build
    val got = spark.table("g_band_append").groupBy("bkey", "doc_id").count()
    val want = spark.table("g_band_fresh").groupBy("bkey", "doc_id").count()
    assert(got.join(want, Seq("bkey", "doc_id", "count"), "full_outer")
      .where(col("count").isNull).isEmpty, "appended band table diverged from fresh build")

    // probe parity: a batch vetted against the APPENDED table keeps the
    // same survivors as against the fresh one
    val someText = docs.where(col("doc_id") === 3L).select("text").as[String].head()
    val batch = Seq(
      (920001L, someText),
      (920002L, "fully novel band-append probe text matching nothing stored")
    ).toDF("doc_id", "text")
    def survivors(table: String) =
      Dedup.dedupIncremental(docs, batch, "doc_id", "text",
        existingIndex = Some(idxAll), bandIndex = Some(spark.table(table)))
        .select("doc_id").as[Long].collect().sorted.toSeq
    assert(survivors("g_band_append") == survivors("g_band_fresh"))
    assert(survivors("g_band_append") == Seq(920002L))

    // a drifted bucket spec cannot silently land
    intercept[org.apache.spark.sql.AnalysisException] {
      Dedup.appendBandIndex(idxNew, "g_band_append", buckets = 16)
    }
  }

  test("dedupIncremental probe strategies (Auto/InFilter/SemiJoin) agree; SemiJoin never collects at call time") {
    val existing = Tables.documents(spark, sfDir).select("doc_id", "text")
    val someText = existing.where(col("doc_id") === 11L).select("text").as[String].head()
    val batch = Seq(
      (910001L, someText),                                  // exact dup -> dropped
      (910002L, someText + " plus an appended tail here"),  // near-dup -> dropped
      (910003L, "wholly original content unseen in any fixture document body")
    ).toDF("doc_id", "text")
    val idx = Dedup.signatureIndex(existing, "doc_id", "text")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bandIdx = Dedup.bandIndexTable(idx)
    def run(strategy: Dedup.ProbeStrategy) =
      Dedup.dedupIncremental(existing, batch, "doc_id", "text",
        existingIndex = Some(idx), bandIndex = Some(bandIdx),
        probeStrategy = strategy)
    // SemiJoin keeps the call lazy: no Spark job may run while composing.
    // (Auto/InFilter collect bucket keys + candidate ids at call time.)
    val tracker = spark.sparkContext.statusTracker
    val jobsBefore = tracker.getJobIdsForGroup(null).length
    val lazyFrame = run(Dedup.SemiJoin)
    assert(tracker.getJobIdsForGroup(null).length == jobsBefore,
      "SemiJoin strategy ran Spark jobs during composition — it must stay lazy")
    val semi = lazyFrame.select("doc_id").as[Long].collect().sorted.toSeq
    val auto = run(Dedup.Auto).select("doc_id").as[Long].collect().sorted.toSeq
    val inF = run(Dedup.InFilter).select("doc_id").as[Long].collect().sorted.toSeq
    assert(semi == Seq(910003L), s"kept=$semi")
    assert(auto == semi && inF == semi,
      s"probe strategies diverged: auto=$auto inFilter=$inF semiJoin=$semi")
    idx.unpersist()
  }

  test("removeNearDupsTransitive collapses a similarity chain to its min exemplar") {
    // A and C share no 3-shingles directly but both overlap B heavily; the
    // transitive variant must keep only A, the pairwise variant keeps A
    // (B and C each lose a detected pair)
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 4
    val b = base + "lambda mu nu xi omicron pi rho sigma"
    val c = b + " tau upsilon phi chi psi omega one two"
    val corpus = Seq((1L, base), (2L, b), (3L, c), (9L, "totally different words entirely unrelated content here"))
      .toDF("doc_id", "text")
    val kept = Dedup.removeNearDupsTransitive(corpus, "doc_id", "text", threshold = 0.5)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(1L, 9L), s"kept=$kept")
  }

  test("connectedComponents: empty pair list and string ids are handled") {
    val empty = Seq.empty[(Long, Long)].toDF("a_id", "b_id")
    assert(Dedup.connectedComponents(empty).count() == 0)
    val clean = Seq((7L, "distinct doc one"), (8L, "distinct doc two"))
      .toDF("doc_id", "text")
    // no near-dups -> transitive removal returns the corpus unchanged
    assert(Dedup.removeNearDupsTransitive(clean, "doc_id", "text").count() == 2)
    // string ids use the exact changed-row probe
    val strPairs = Seq(("a", "b"), ("b", "c"), ("x", "y")).toDF("a_id", "b_id")
    val comp = Dedup.connectedComponents(strPairs).as[(String, String)].collect().toMap
    assert(Seq("a", "b", "c").forall(comp(_) == "a") && comp("x") == "x" && comp("y") == "x")
  }

  test("connectedComponents: chains, cycles and disjoint pairs resolve to min-id clusters") {
    // component {1,2,3,4,5} via a chain with a cycle edge; {10,11}; {20,21,22}
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 1L), // cycle
      (10L, 11L), (21L, 20L), (21L, 22L)).toDF("a_id", "b_id")
    val comp = Dedup.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    assert(Seq(1L, 2L, 3L, 4L, 5L).forall(comp(_) == 1L), comp.toString)
    assert(comp(10L) == 10L && comp(11L) == 10L)
    assert(Seq(20L, 21L, 22L).forall(comp(_) == 20L))
    assert(comp.size == 10)
  }

  test("connectedComponents: a 200-node path converges within O(log n) rounds") {
    // diameter 199 — plain min-label propagation would need ~200 rounds and
    // throw at maxRounds=12; the path-halving shortcut must get there
    val pairs = (0L until 199L).map(i => (i, i + 1)).toDF("a_id", "b_id")
    val labels = Dedup.connectedComponents(pairs, maxRounds = 12)
      .as[(Long, Long)].collect()
    assert(labels.length == 200)
    assert(labels.forall(_._2 == 0L), "every node must label to the minimum id 0")
  }

  test("as-of join: a newer right row with null value supersedes an older non-null one") {
    val left = Seq((1L, 20L)).toDF("k", "ts")
    val right = Seq((1L, 10L, Some("r10")), (1L, 15L, None: Option[String]))
      .toDF("k", "ts", "v")
    val out = AsOfJoin.backward(left, right, "k", "ts", "v")
      .select("v").as[Option[String]].head()
    assert(out.isEmpty, "the newest right row carries null — lookup must return null, not the stale r10")
  }

  test("E4: resizeFeatures mean-pools buckets; frameSample keeps every k-th frame") {
    val resized = Multimodal.resizeFeatures(Array(1f, 3f, 5f, 7f), 2)
    assert(resized.toSeq == Seq(2f, 6f))
    assert(Multimodal.resizeFeatures(Array(1f, 2f, 3f), 3).toSeq == Seq(1f, 2f, 3f))

    implicit val s = spark
    import s.implicits._
    val payload = (0 until 40).map(_.toByte).toArray // 10 frames of 4 bytes
    val media = Seq(Multimodal.MediaRecord("v.bin", "video/raw", payload)).toDS()
    val frames = Multimodal.frameSample(media, frameSize = 4, everyK = 3).collect()
    assert(frames.map(_.frameIdx).toSeq == Seq(0, 3, 6, 9))
    assert(frames.head.frame.toSeq == Seq[Byte](0, 1, 2, 3))
    assert(frames.last.frame.toSeq == Seq[Byte](36, 37, 38, 39))
  }

  test("E5: rolling fingerprint is order-sensitive, md5 fingerprint is not") {
    import graft.functions.TextFunctions._
    val df = Seq("alpha beta gamma", "gamma beta alpha").toDF("text")
      .select(rollingFingerprint(tokenize(col("text"))).as("rfp"),
        fingerprint(col("text")).as("mfp"))
    val rows = df.collect()
    assert(rows(0).getLong(0) != rows(1).getLong(0), "rolling fp must see order")
    assert(rows(0).getString(1) != rows(1).getString(1)) // different token seq => different md5 too
    val same = Seq("Alpha, beta! gamma", "alpha beta gamma").toDF("text")
      .select(fingerprint(col("text"))).collect()
    assert(same(0) == same(1), "md5 fp must collapse punctuation/case variants")
  }

  test("E4: multimodal stub decode preserves schema and is deterministic") {
    implicit val s = spark
    val media = Multimodal.asMedia(
      Tables.documents(spark, sfDir).limit(10), "doc_id", "text/plain", "text")
    val feats = Multimodal.decodeStub(media, dim = 8).collect()
    assert(feats.length == 10)
    assert(feats.forall(_.features.length == 8))
    assert(feats.forall(f => f.features.forall(v => v >= 0f && v < 1f)))
    val again = Multimodal.decodeStub(media, dim = 8).collect()
    assert(feats.map(_.features.toSeq).toSeq == again.map(_.features.toSeq).toSeq)
  }

  test("E4: decodeImage reads a real PNG into [0,1] grayscale pixels; decode falls back to stub for non-images") {
    // render a deterministic 8x8 PNG in memory: left half black, right half white
    val src = new java.awt.image.BufferedImage(8, 8, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until 8; x <- 0 until 8) src.getRaster.setSample(x, y, 0, if (x < 4) 0 else 255)
    val baos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(src, "png", baos))
    val png = baos.toByteArray

    val px = Multimodal.decodeImage(png, 8, 8).get
    assert(px.length == 64)
    assert(px.forall(v => v >= 0f && v <= 1f))
    assert(px(0) == 0f && px(7) == 1f, "left column black, right column white")

    // resample 8x8 -> 4x4 still splits black/white halves
    val small = Multimodal.decodeImage(png, 4, 4).get
    assert(small.length == 16 && small(0) == 0f && small(3) == 1f)

    assert(Multimodal.decodeImage("not an image".getBytes, 4, 4).isEmpty)

    implicit val s = spark
    import s.implicits._
    val media = Seq(
      Multimodal.MediaRecord("a.png", "image/png", png),
      Multimodal.MediaRecord("b.txt", "text/plain", "plain bytes, no magic".getBytes))
      .toDS()
    val feats = Multimodal.decode(media, width = 8, height = 8).collect()
      .map(f => f.path -> f.features).toMap
    assert(feats("a.png").toSeq == px.toSeq, "PNG goes through the real ImageIO path")
    assert(feats("b.txt").length == 64, "undecodable payload falls back to stub at the same dim")
    assert(feats("b.txt").toSeq == Multimodal.stubFeatures("plain bytes, no magic".getBytes, 64).toSeq)
  }

  test("E4: decodeAudio reads a real WAV into RMS energy envelopes; falls back to stub for non-audio") {
    // synthesize a deterministic WAV in memory: 0.5 s of a 440 Hz sine at
    // amplitude 0.5 followed by 0.5 s of silence, 16-bit mono PCM, 8 kHz
    val rate = 8000
    val half = rate / 2
    val samples = new Array[Byte](2 * rate)
    for (i <- 0 until half) {
      val v = (math.sin(2 * math.Pi * 440 * i / rate) * 0.5 * 32767).toInt
      samples(2 * i) = (v & 0xff).toByte
      samples(2 * i + 1) = ((v >> 8) & 0xff).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(rate.toFloat, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(samples), fmt, rate.toLong)
    val baos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, baos)
    val wav = baos.toByteArray

    val env = Multimodal.decodeAudio(wav, 8).get
    assert(env.length == 8 && env.forall(v => v >= 0f && v <= 1f))
    // first half: sine at amplitude 0.5 -> RMS ~ 0.5/sqrt(2) = 0.354
    for (i <- 0 until 4)
      assert(math.abs(env(i) - 0.3535f) < 0.01f, s"window $i RMS ${env(i)}")
    // second half: silence
    for (i <- 4 until 8) assert(env(i) == 0f, s"window $i not silent: ${env(i)}")

    assert(Multimodal.decodeAudio("not audio".getBytes, 8).isEmpty)

    // stereo downmix: L = the same sine, R = its negation -> mono averages
    // to silence everywhere; a broken interleave/average would read as the
    // sine's energy instead of 0
    val stereo = new Array[Byte](4 * rate)
    for (i <- 0 until rate) {
      val v = (math.sin(2 * math.Pi * 440 * i / rate) * 0.5 * 32767).toInt
      stereo(4 * i) = (v & 0xff).toByte
      stereo(4 * i + 1) = ((v >> 8) & 0xff).toByte
      val nv = -v
      stereo(4 * i + 2) = (nv & 0xff).toByte
      stereo(4 * i + 3) = ((nv >> 8) & 0xff).toByte
    }
    val sFmt = new javax.sound.sampled.AudioFormat(rate.toFloat, 16, 2, true, false)
    val sAis = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(stereo), sFmt, rate.toLong)
    val sBaos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(sAis,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, sBaos)
    val sEnv = Multimodal.decodeAudio(sBaos.toByteArray, 4).get
    for (i <- 0 until 4)
      assert(sEnv(i) < 0.001f, s"L/-R stereo must downmix to ~silence, window $i = ${sEnv(i)}")
    // and a same-phase stereo sine downmixes to the mono RMS
    for (i <- 0 until rate) {
      stereo(4 * i + 2) = stereo(4 * i); stereo(4 * i + 3) = stereo(4 * i + 1)
    }
    val s2Ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(stereo), sFmt, rate.toLong)
    val s2Baos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(s2Ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, s2Baos)
    val s2Env = Multimodal.decodeAudio(s2Baos.toByteArray, 4).get
    for (i <- 0 until 4)
      assert(math.abs(s2Env(i) - 0.3535f) < 0.01f,
        s"same-phase stereo window $i RMS ${s2Env(i)} != mono sine RMS")

    implicit val s = spark
    import s.implicits._
    val media = Seq(
      Multimodal.MediaRecord("a.wav", "audio/wav", wav),
      Multimodal.MediaRecord("b.bin", "application/octet-stream", "no riff magic".getBytes))
      .toDS()
    val feats = Multimodal.decodeAudioFeatures(media, dim = 8).collect()
      .map(f => f.path -> f.features).toMap
    assert(feats("a.wav").toSeq == env.toSeq, "WAV goes through the real sampled-sound path")
    assert(feats("b.bin").toSeq == Multimodal.stubFeatures("no riff magic".getBytes, 8).toSeq)
  }

  /** RIFF/AVI helpers for the video test: chunk framing per the public
    * spec (fourcc + LE32 size + data + even padding; LIST nests after a
    * 4-byte list type).
    */
  private def riffChunk(cc: String, data: Array[Byte]): Array[Byte] = {
    val size = data.length
    val out = new java.io.ByteArrayOutputStream()
    out.write(cc.getBytes("US-ASCII"))
    out.write(Array[Byte]((size & 0xff).toByte, ((size >> 8) & 0xff).toByte,
      ((size >> 16) & 0xff).toByte, ((size >> 24) & 0xff).toByte))
    out.write(data)
    if (size % 2 == 1) out.write(0)
    out.toByteArray
  }
  private def riffList(listType: String, children: Array[Byte]*): Array[Byte] =
    riffChunk("LIST", listType.getBytes("US-ASCII") ++ children.flatten)
  private def jpegFrame(brightness: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(16, 16,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until 16; x <- 0 until 16) img.getRaster.setSample(x, y, 0, brightness)
    val baos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", baos))
    baos.toByteArray
  }

  test("E4: MJPEG-in-AVI video decode — real frames out of a real container") {
    // six frames of rising brightness, plus an interleaved audio chunk
    // (01wb) and a second video stream's frame (01dc) that must be ignored
    val frames = (0 until 6).map(i => jpegFrame(30 + i * 40))
    val movi = riffList("movi",
      (frames.take(3).map(riffChunk("00dc", _)) ++
        Seq(riffChunk("01wb", Array.fill[Byte](64)(7)),
          riffChunk("01dc", jpegFrame(255))) ++
        frames.drop(3).map(riffChunk("00dc", _))): _*)
    val hdrl = riffList("hdrl", riffChunk("avih", new Array[Byte](56)))
    val body = "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi
    val avi = riffChunk("RIFF", body)

    val chunks = Multimodal.aviVideoChunks(avi).get
    assert(chunks.length == 6, s"6 frames of stream 00, audio + stream 01 skipped: ${chunks.length}")

    val decoded = Multimodal.decodeVideoFrames(avi, everyK = 2, width = 8, height = 8).get
    assert(decoded.map(_._1) == Vector(0, 2, 4), "indices are full-stream positions")
    // r10: the sampling happens INSIDE the walk (no full-payload copy for
    // sparse sampling) — parity with sampling after the fact
    val sampled = Multimodal.aviVideoChunksEvery(avi, 2).get
    assert(sampled.map(_._1) == Vector(0, 2, 4))
    assert(sampled.map(_._2.toSeq) ==
      chunks.zipWithIndex.filter(_._2 % 2 == 0).map(_._1.toSeq),
      "walk-side sampling must equal post-hoc sampling")
    val means = decoded.map { case (_, px) => px.sum / px.length }
    assert(means == means.sorted && means.last - means.head > 0.3f,
      s"sampled frames must track the rising brightness: $means")

    // not-an-AVI and AVI-without-movi are None (caller decides fallback)
    assert(Multimodal.aviVideoChunks("not a riff file at all".getBytes).isEmpty)
    assert(Multimodal.aviVideoChunks(
      riffChunk("RIFF", "AVI ".getBytes("US-ASCII") ++ hdrl)).isEmpty)

    // a truncated file salvages the frames that fit, never throws
    val truncated = java.util.Arrays.copyOfRange(avi, 0, avi.length - frames.last.length / 2)
    val salvage = Multimodal.aviVideoChunks(truncated).get
    assert(salvage.length >= 4 && salvage.length <= 6, s"salvaged ${salvage.length}")

    // bytes appended AFTER the RIFF chunk (naive concatenation) must not
    // inject foreign frames: the walk honors the container's declared size
    val concatenated = avi ++ movi ++ Array.fill[Byte](37)(1)
    assert(Multimodal.aviVideoChunks(concatenated).get.length == 6,
      "trailing bytes past the declared RIFF extent must be ignored")

    // distributed path: mixed corpus — AVI explodes to frame rows; junk
    // payload AND a real AVI in a non-MJPEG codec (every dc chunk fails
    // JPEG decode) each fall back to one stub row at frameIdx -1, so no
    // input ever silently vanishes (review r8)
    val h264ish = riffChunk("RIFF", "AVI ".getBytes("US-ASCII") ++ hdrl ++
      riffList("movi", riffChunk("00dc", Array.fill[Byte](40)(3)),
        riffChunk("00dc", Array.fill[Byte](40)(4))))
    implicit val s = spark
    import s.implicits._
    val media = Seq(
      Multimodal.MediaRecord("clip.avi", "video/x-msvideo", avi),
      Multimodal.MediaRecord("junk.bin", "application/octet-stream", "zzz".getBytes),
      Multimodal.MediaRecord("h264.avi", "video/x-msvideo", h264ish))
      .toDS()
    val rows = Multimodal.decodeVideo(media, everyK = 3, width = 8, height = 8).collect()
    val byPath = rows.groupBy(_.path)
    assert(byPath("clip.avi").map(_.frameIdx).sorted.toSeq == Seq(0, 3))
    assert(byPath("junk.bin").map(_.frameIdx).toSeq == Seq(-1))
    assert(byPath("junk.bin").head.features.toSeq ==
      Multimodal.stubFeatures("zzz".getBytes, 64).toSeq)
    assert(byPath("h264.avi").map(_.frameIdx).toSeq == Seq(-1),
      "an AVI whose chunks are not JPEG must stub, not vanish")

    // review-r9 pin: a chunk whose declared size puts dataStart + size at
    // exactly Int.MaxValue with an ODD size used to overflow the padded
    // advance to a negative offset (passing the `off + 8 <= end` loop
    // guard) and index the buffer out of bounds — the walker must treat it
    // as truncation and salvage, never throw
    val overflowSize = Int.MaxValue - 20 // dataStart = 20; odd by construction
    assert(overflowSize % 2 == 1)
    val szLe = Array[Byte](
      (overflowSize & 0xff).toByte, ((overflowSize >> 8) & 0xff).toByte,
      ((overflowSize >> 16) & 0xff).toByte, ((overflowSize >> 24) & 0xff).toByte)
    val crafted = "RIFF".getBytes("US-ASCII") ++
      Array[Byte](-1, -1, -1, 0x7f) ++ "AVI ".getBytes("US-ASCII") ++
      "JUNK".getBytes("US-ASCII") ++ szLe ++ Array.fill[Byte](12)(9)
    assert(Multimodal.aviVideoChunks(crafted).isEmpty,
      "no movi list: None — and absolutely no index-out-of-bounds")
  }

  test("cache lifecycle: Pinned.release() after consumption leaves no net cached blocks") {
    import graft.operators.Pinned
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 4
    val corpus = (Seq((0L, base), (1L, base + "lambda"), (2L, base + "lambda mu")) ++
      (3 until 20).map(i => (i.toLong, s"unique document number $i with its own words ${i * 7}")))
      .toDF("doc_id", "text")
    // exercise every persisting operator, consuming each result fully
    val pairs = Dedup.nearDupPairs(corpus, "doc_id", "text", 0.5)
    assert(pairs.count() >= 2)
    assert(Dedup.connectedComponents(pairs).count() >= 3)
    val batch = Seq((100L, base), (101L, "novel content nobody wrote")).toDF("doc_id", "text")
    assert(Dedup.dedupIncremental(corpus, batch, "doc_id", "text").count() == 1)
    assert(Pinned.pinnedCount > 0, "operators should have pinned intermediates")
    Pinned.release(blocking = true)
    assert(Pinned.pinnedCount == 0)
    val after = spark.sparkContext.getPersistentRDDs.keySet
    assert((after -- before).isEmpty,
      s"leaked cached RDDs: ${(after -- before).mkString(",")}")
  }

  test("cache lifecycle: Pinned.scoped releases its own pins and never another consumer's") {
    import graft.operators.Pinned
    val outer = Seq((1L, "outer pinned frame")).toDF("doc_id", "text")
    val outerPinned = Dedup.exactDedupByFingerprint(outer, "text", "doc_id") // no pin — just data
    val globalBefore = Pinned.pinnedCount
    val existing = Seq((1L, "some existing document body with words")).toDF("doc_id", "text")
    val batch = Seq((10L, "a brand new batch document")).toDF("doc_id", "text")
    Pinned.scoped {
      // pins made here must go to the scope, not the global queue...
      assert(Dedup.dedupIncremental(existing, batch, "doc_id", "text").count() == 1)
      assert(Pinned.pinnedCount == globalBefore, "scoped pins leaked into the global queue")
    }
    // ...and must be unpersisted when the scope closes
    assert(Pinned.pinnedCount == globalBefore)
    assert(outerPinned.count() == 1)
  }

  test("E10: decontaminate drops exactly the docs sharing an n-gram with the eval set") {
    val eval = Seq(
      (100L, "the quick brown fox jumps over the lazy dog"),
      (101L, "colorless green ideas sleep furiously tonight")).toDF("doc_id", "text")
    val train = Seq(
      // contains eval 4-gram "quick brown fox jumps" mid-sentence
      (1L, "we saw a quick brown fox jumps right past us"),
      // shares only a trigram ("green ideas sleep" — below n=4) => clean
      (2L, "green ideas sleep rarely in papers"),
      // no overlap at all
      (3L, "completely unrelated words fill this document body"),
      // contains TWO eval 4-grams (overlapping window of 5 shared tokens)
      (4L, "listen colorless green ideas sleep furiously every night")).toDF("doc_id", "text")
    val report = Dedup.contaminationReport(train, eval, "doc_id", "text", n = 4)
      .as[(Long, Long)].collect().toMap
    assert(report == Map(1L -> 1L, 4L -> 2L), s"report=$report")
    val clean = Dedup.decontaminate(train, eval, "doc_id", "text", n = 4)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(clean == Seq(2L, 3L), s"clean=$clean")
    // shuffle-join fallback agrees with the broadcast path
    val cleanNoBc = Dedup.decontaminate(train, eval, "doc_id", "text", n = 4,
      broadcastEval = false).select("doc_id").as[Long].collect().sorted.toSeq
    assert(cleanNoBc == clean)
  }

  test("E10: bloom-prefiltered contamination report matches the exact report") {
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
    val train = docs.where(col("doc_id") % 43 =!= 0)
    val eval = docs.where(col("doc_id") % 43 === 0)
    val exact = Dedup.contaminationReport(train, eval, "doc_id", "text", n = 4)
      .as[(Long, Long)].collect().toMap
    val bloom = Dedup.contaminationReportBloom(train, eval, "doc_id", "text", n = 4)
      .as[(Long, Long)].collect().toMap
    assert(bloom == exact, "bloom path diverged from exact on the fixture corpus")
    // broadcast-confirm variant agrees too, and the hand fixture from the
    // exact test gives the same known hit counts through the sketch path
    val evalS = Seq((100L, "the quick brown fox jumps over the lazy dog")).toDF("doc_id", "text")
    val trainS = Seq(
      (1L, "we saw a quick brown fox jumps right past us"),
      (3L, "completely unrelated words fill this document body")).toDF("doc_id", "text")
    val small = Dedup.contaminationReportBloom(trainS, evalS, "doc_id", "text",
      n = 4, broadcastConfirm = true).as[(Long, Long)].collect().toMap
    assert(small == Map(1L -> 1L), s"small=$small")
  }

  test("E1: removeBoilerplate drops ALL occurrences of frequent lines, keeps line order") {
    val corpus = Seq(
      (1L, "alpha body one\nsubscribe now"),
      (2L, "beta body two\nsubscribe now"),
      (3L, "gamma body three\nsubscribe now"),
      (4L, "delta body four"),
      (5L, "subscribe now"),
      (6L, "keep a\nsubscribe now\nkeep b")).toDF("doc_id", "text")
    val out = Dedup.removeBoilerplate(corpus, "doc_id", "text", minDocs = 3)
      .orderBy("doc_id").as[(Long, Long, Long, String)].collect().toSeq
    assert(out == Seq(
      (1L, 1L, 1L, "alpha body one"),
      (2L, 1L, 1L, "beta body two"),
      (3L, 1L, 1L, "gamma body three"),
      (4L, 1L, 0L, "delta body four"),
      (5L, 0L, 1L, ""), // all-boilerplate doc survives with empty text
      (6L, 2L, 1L, "keep a\nkeep b")), s"out=$out")
    // below threshold nothing is boilerplate — docs reassemble verbatim
    val loose = Dedup.removeBoilerplate(corpus, "doc_id", "text", minDocs = 6)
      .orderBy("doc_id").as[(Long, Long, Long, String)].collect().toSeq
    assert(loose.map(_._4) == corpus.orderBy("doc_id").as[(Long, String)]
      .collect().toSeq.map(_._2))
  }

  /** Review-r8 pins: regex split must not leak pattern characters into the
    * rejoined text, and a shuffle-join fallback must exist for the
    * low-minDocs regime where the boilerplate set is not broadcastable.
    */
  test("E1: removeBoilerplate regex sep rejoins via joinSep; shuffle fallback agrees") {
    val crlf = Seq(
      (1L, "alpha one\r\nsubscribe now"),
      (2L, "beta two\r\nsubscribe now"),
      (3L, "keep a\r\nsubscribe now\r\nkeep b")).toDF("doc_id", "text")
    val out = Dedup.removeBoilerplate(crlf, "doc_id", "text", minDocs = 3,
        sep = "\\r?\\n", joinSep = Some("\n"))
      .orderBy("doc_id").as[(Long, Long, Long, String)].collect().toSeq
    assert(out.map(_._4) == Seq("alpha one", "beta two", "keep a\nkeep b"),
      s"regex sep must never appear literally in cleaned_text: $out")
    // broadcastLines=false is result-identical (plan differs only)
    val shuffled = Dedup.removeBoilerplate(crlf, "doc_id", "text", minDocs = 3,
        sep = "\\r?\\n", joinSep = Some("\n"), broadcastLines = false)
      .orderBy("doc_id").as[(Long, Long, Long, String)].collect().toSeq
    assert(shuffled == out)
  }

  /** Review-r8 pin: one output row PER INPUT PAIR — a zero-intersection
    * pair reads jaccard 0.0 (it used to vanish through the inner join) and
    * a both-sides-shingle-less pair reads null (J(∅,∅) undefined).
    */
  test("E2: exactJaccard emits zero-overlap and shingle-less pairs, never drops them") {
    val corpus = Seq(
      (1L, "aa bb cc dd ee"), (2L, "aa bb cc dd ff"), // high overlap
      (3L, "xx yy zz ww qq"),                         // zero overlap with 1
      (4L, "a"), (5L, "b")                            // too short to shingle
    ).toDF("doc_id", "text")
    val sh = Dedup.shingleSet(corpus, "doc_id", "text")
    val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L), (4L, 5L)).toDF("a_id", "b_id")
    val got = Dedup.exactJaccard(pairs, sh).collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    assert(got.size == 4, s"one row per input pair: $got")
    assert(got((1L, 2L)).exists(_ > 0.3), s"overlapping pair scores: $got")
    assert(got((1L, 3L)).contains(0.0), s"zero-overlap pair is 0.0, not missing: $got")
    assert(got((1L, 4L)).contains(0.0), s"one shingle-less side is 0.0: $got")
    assert(got((4L, 5L)).isEmpty, s"both shingle-less -> null (undefined): $got")
  }

  /** Review-r9 pins: duplicated candidate rows must not inflate the
    * intersection count (jaccard read 3.0 for a twice-listed pair), and
    * the other guards/opt-outs from the same sweep hold.
    */
  test("E2: exactJaccard collapses duplicate input pairs; guards fire loudly") {
    val corpus = Seq((1L, "aa bb cc dd ee"), (2L, "aa bb cc dd ff"))
      .toDF("doc_id", "text")
    val sh = Dedup.shingleSet(corpus, "doc_id", "text")
    val dupPairs = Seq((1L, 2L), (1L, 2L), (1L, 2L)).toDF("a_id", "b_id")
    val rows = Dedup.exactJaccard(dupPairs, sh).collect()
    assert(rows.length == 1, s"duplicates collapse to one row: ${rows.toSeq}")
    val j = rows.head.getDouble(2)
    assert(j > 0 && j <= 1.0, s"a duplicated pair must not read jaccard > 1: $j")
    // maxRounds <= 0 is an argument error, not a fake non-convergence
    val e = intercept[IllegalArgumentException] {
      Dedup.connectedComponents(Seq((1L, 2L)).toDF("a_id", "b_id"), maxRounds = 0)
    }
    assert(e.getMessage.contains("maxRounds"), e.getMessage)
    // simhash repartition opt-out is value-identical
    val withR = Dedup.simhash(corpus, "doc_id", "text").as[(Long, Long)].collect().toMap
    val noR = Dedup.simhash(corpus, "doc_id", "text", repartitionFirst = false)
      .as[(Long, Long)].collect().toMap
    assert(withR == noR)
  }

  test("E1: removeBoilerplate keeps empty/null-text docs as zero-line rows (review r9)") {
    val corpus = Seq(
      (1L, "header\nbody one"), (2L, "header\nbody two"), (3L, "header\nbody three"),
      (4L, ""), (5L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val out = Dedup.removeBoilerplate(corpus, "doc_id", "text", minDocs = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(out.keySet == Set(1L, 2L, 3L, 4L, 5L),
      s"a cleaning operator must not delete rows: ${out.keySet}")
    assert(out(1L) == ((1L, 1L, "body one")), s"got ${out(1L)}")
    assert(out(4L) == ((0L, 0L, "")) && out(5L) == ((0L, 0L, "")),
      "empty/null text reads as the documented zero-line shape")
  }

  test("E3/CMS: backtick-bearing column names are escaped, not spliced (review r9)") {
    import graft.operators.Sketches
    val df = Seq(("a", 1), ("a", 2), ("b", 3)).toDF("k`k", "v")
    val cms = Sketches.countMinSketchOf(df, "k`k")
    assert(cms.estimateCount("a") >= 2L)
  }

  test("E2: bands refuses a numHashes not divisible by rowsPerBand") {
    val sig = Seq((1L, 1L)).toDF("doc_id", "mh0")
    val e = intercept[IllegalArgumentException] { Dedup.bands(sig, 16, 5) }
    assert(e.getMessage.contains("multiple"), e.getMessage)
  }

  test("E2: canonicalPerCluster keeps the best-scored member, ties to min id") {
    // cluster {1,2,3} via chain 1-2, 2-3: scores 5, 9, 9 → canonical 2 (tie 2<3)
    // cluster {10,11}: scores 1, 7 → canonical 11 (score wins over id)
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("a_id", "b_id")
    val members = Seq((1L, 5L), (2L, 9L), (3L, 9L), (10L, 1L), (11L, 7L))
      .toDF("id", "score")
    val out = Dedup.canonicalPerCluster(pairs, members, "id", "score")
      .orderBy("component").as[(Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq((1L, 2L, 9L, 3L), (10L, 11L, 7L, 2L)), s"out=$out")
  }

  test("Sketches: count-min estimates are one-sided and within eps * N") {
    import graft.operators.Sketches
    val toks = Tables.documents(spark, sfDir)
      .select(explode(split(col("text"), " ")).as("token"))
    val exact = toks.groupBy("token").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect()
    val total = exact.map(_._2).sum
    val cms = Sketches.countMinSketchOf(toks, "token", eps = 1e-3,
      confidence = 0.99, seed = 1)
    val slack = math.ceil(1e-3 * total).toLong
    exact.foreach { case (t, n) =>
      val est = cms.estimateCount(t)
      assert(est >= n, s"CMS underestimated '$t': $est < $n")
      assert(est <= n + slack, s"CMS overshoot beyond eps*N for '$t': $est > $n + $slack")
    }
    // withEstimate annotates without shuffling and agrees with the sketch
    val annotated = Sketches.withEstimate(
      toks.groupBy("token").agg(count(lit(1)).as("n")), "token", cms, "est")
      .as[(String, Long, Long)].collect()
    annotated.foreach { case (t, n, est) =>
      assert(est == cms.estimateCount(t) && est >= n)
    }
    // review-r8 pins: an INTEGRAL column queries through the long-hash
    // path (the implicit string cast used to return near-zero noise), and
    // the lookup stays one-sided; unsupported types refuse
    val ids = Tables.orders(spark, sfDir).select(col("o_custkey"))
    val idCms = Sketches.countMinSketchOf(ids, "o_custkey", eps = 1e-3)
    val idEst = Sketches.withEstimate(
      ids.groupBy("o_custkey").agg(count(lit(1)).as("n")), "o_custkey", idCms, "est")
      .as[(Long, Long, Long)].collect()
    assert(idEst.nonEmpty && idEst.forall { case (k, n, est) =>
      est == idCms.estimateCount(k) && est >= n
    }, "integral lookups must go through the long-hash path")
    intercept[IllegalArgumentException] {
      Sketches.withEstimate(
        Seq(Seq(1.0)).toDF("v"), "v", idCms, "est")
    }
  }

  test("skew: salts = 0 is refused instead of silently emptying the join") {
    import graft.operators.Skew
    val fact = Tables.orders(spark, sfDir).limit(10)
    val dim = Tables.customer(spark, sfDir).limit(10)
    intercept[IllegalArgumentException] {
      Skew.saltedSum(fact, Seq("o_custkey"), col("o_totalprice"), salts = 0)
    }
    intercept[IllegalArgumentException] {
      Skew.saltedBroadcastLeft(fact.withColumnRenamed("o_custkey", "c_custkey"),
        dim, "c_custkey", salts = 0)
    }
  }

  test("E5: bigram LM — hand-computed MLE conditional probabilities") {
    import graft.operators.NgramLM
    // grams: doc1 = [a b, b a, a b], doc2 = [a c]
    // counts: c(a b)=2, c(b a)=1, c(a c)=1; prefixes: a->3, b->1
    // ratios: a b = 2/3, b a = 1, a c = 1/3
    val corpus = Seq((1L, "a b a b"), (2L, "a c")).toDF("doc_id", "text")
    val model = NgramLM.fit(corpus, "text", n = 2)
    val m = model.select("gram", "c_gram", "c_prefix")
      .as[(String, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(m == Map("a b" -> ((2L, 3L)), "b a" -> ((1L, 1L)), "a c" -> ((1L, 3L))), s"model=$m")
    val scored = NgramLM.scoreMeanProb(corpus, model, "doc_id", "text")
      .orderBy("doc_id")
      .as[(Long, Long, Double, Double)].collect().toSeq
    // doc1 mean = (2/3 + 1 + 2/3)/3 = 7/9; doc2 mean = min = 1/3
    assert(scored == Seq((1L, 3L, 0.777778, 0.666667), (2L, 1L, 0.333333, 0.333333)),
      s"scored=$scored")
  }

  test("E5: bigram LM — log-prob scoring and the unseen-gram floor") {
    import graft.operators.NgramLM
    val corpus = Seq((1L, "a b a b"), (2L, "a c")).toDF("doc_id", "text")
    val model = NgramLM.fit(corpus, "text", n = 2)
    val lp = NgramLM.scoreLogProb(corpus, model, "doc_id", "text")
      .orderBy("doc_id").as[(Long, Long, Double)].collect().toSeq
    val expected1 = (math.log(2.0 / 3) + math.log(1.0) + math.log(2.0 / 3)) / 3
    assert(lp.head._1 == 1L && math.abs(lp.head._3 - expected1) < 1e-12, s"lp=$lp")
    // a doc whose grams were never fitted floors at ln(unseenProb)
    val alien = Seq((9L, "z q z q")).toDF("doc_id", "text")
    val alienLp = NgramLM.scoreLogProb(alien, model, "doc_id", "text", unseenProb = 1e-9)
      .as[(Long, Long, Double)].collect().head
    assert(math.abs(alienLp._3 - math.log(1e-9)) < 1e-12, s"alien=$alienLp")
    // docs shorter than n have no grams and drop out of scoring
    val shorty = Seq((7L, "solo")).toDF("doc_id", "text")
    assert(NgramLM.scoreMeanProb(shorty, model, "doc_id", "text").count() == 0)
  }

  test("E5: fluencyGate keeps docs whose transitions clear the threshold") {
    import graft.operators.NgramLM
    val corpus = Seq((1L, "a b a b"), (2L, "a c")).toDF("doc_id", "text")
    // doc1 mean 7/9 ≈ 0.78, doc2 mean 1/3 — a 0.5 gate keeps only doc1
    val kept = NgramLM.fluencyGate(corpus, "doc_id", "text", minMeanProb = 0.5)
      .select("doc_id").as[Long].collect().toSeq
    assert(kept == Seq(1L), s"kept=$kept")
    // fit-on-self scores are valid probabilities on the real fixture
    val docs = Tables.documents(spark, sfDir).limit(100).select("doc_id", "text")
    val probs = NgramLM.scoreMeanProb(docs, NgramLM.fit(docs, "text"), "doc_id", "text")
      .select("mean_cond_prob").as[Double].collect()
    assert(probs.nonEmpty && probs.forall(p => p > 0.0 && p <= 1.0))

    // review-r8 pins: unscoreable (< n tokens) docs drop by default but
    // pass ungated with keepUnscoreable = true; an n-mismatched model is
    // refused instead of scoring everything at unseenProb
    val withShort = corpus.union(Seq((9L, "solo")).toDF("doc_id", "text"))
    assert(NgramLM.fluencyGate(withShort, "doc_id", "text", 0.0)
      .select("doc_id").as[Long].collect().toSet == Set(1L, 2L),
      "default: unscoreable docs drop even at threshold 0")
    assert(NgramLM.fluencyGate(withShort, "doc_id", "text", 0.5, keepUnscoreable = true)
      .select("doc_id").as[Long].collect().toSet == Set(1L, 9L),
      "keepUnscoreable admits the short doc; the gate still cuts doc 2")
    // r10: NULL text is unscoreable via an EXPLICIT null branch — the old
    // size(tokenize(NULL)) < n check rode legacy sizeOfNull=-1 semantics
    // and would flip under spark.sql.ansi.enabled
    val withNull = withShort.union(
      Seq((10L, null.asInstanceOf[String])).toDF("doc_id", "text"))
    assert(NgramLM.fluencyGate(withNull, "doc_id", "text", 0.5, keepUnscoreable = true)
      .select("doc_id").as[Long].collect().toSet == Set(1L, 9L, 10L),
      "null-text docs must pass the ungated branch explicitly")
    assert(NgramLM.fluencyGate(withNull, "doc_id", "text", 0.0)
      .select("doc_id").as[Long].collect().toSet == Set(1L, 2L),
      "default: null-text docs drop like any unscoreable doc")
    val bigram = NgramLM.fit(corpus, "text", n = 2)
    val e = intercept[IllegalArgumentException] {
      NgramLM.scoreMeanProb(corpus, bigram, "doc_id", "text", n = 3)
    }
    assert(e.getMessage.contains("fitted with n = 2"), e.getMessage)
  }

  test("O8: upsertLatest — newer wins, changes beat base at equal version, tombstone deletes") {
    import graft.operators.Merge
    val base = Seq(
      (1L, "old", 10L),   // superseded by a newer change
      (2L, "keep", 10L),  // no change row: survives as-is
      (3L, "tie", 10L),   // equal-version change must win
      (4L, "gone", 10L))  // tombstoned by a change
      .toDF("k", "v", "ver")
    val changes = Seq(
      (1L, "new", 20L),
      (3L, "tie2", 10L),
      (4L, "DEL", 20L),
      (5L, "ins", 5L))    // brand-new key inserts
      .toDF("k", "v", "ver")
    val out = Merge.upsertLatest(base, changes, Seq("k"), Seq("ver"),
        isDelete = Some(col("v") === "DEL"))
      .orderBy("k").as[(Long, String, Long)].collect().toSeq
    assert(out == Seq((1L, "new", 20L), (2L, "keep", 10L),
      (3L, "tie2", 10L), (5L, "ins", 5L)), s"got $out")
    // a stale tombstone must NOT delete a newer live row
    val lateDel = Seq((1L, "DEL", 15L)).toDF("k", "v", "ver")
    val out2 = Merge.upsertLatest(base, changes.union(lateDel), Seq("k"), Seq("ver"),
        isDelete = Some(col("v") === "DEL"))
      .where(col("k") === 1L).as[(Long, String, Long)].collect().toSeq
    assert(out2 == Seq((1L, "new", 20L)), s"stale tombstone won: $out2")
  }

  test("O8: scd2History — validity intervals chain, current row open-ended") {
    import graft.operators.Merge
    val feed = Seq((1L, "a", 10L, 100L), (1L, "b", 20L, 101L), (1L, "c", 30L, 102L),
      (2L, "x", 5L, 103L)).toDF("k", "v", "ver", "id")
    val hist = Merge.scd2History(feed, Seq("k"), Seq("ver", "id"))
      .select("k", "v", "valid_from", "valid_to").orderBy("k", "valid_from")
      .as[(Long, String, Long, Option[Long])].collect().toSeq
    assert(hist == Seq(
      (1L, "a", 10L, Some(20L)), (1L, "b", 20L, Some(30L)), (1L, "c", 30L, None),
      (2L, "x", 5L, None)), s"got $hist")
    // every non-current interval's valid_to equals the successor's valid_from
    // and intervals never overlap — the invariant a time-travel join relies on
    hist.groupBy(_._1).foreach { case (_, rows) =>
      rows.sortBy(_._3).sliding(2).foreach {
        case Seq((_, _, _, Some(to)), (_, _, from, _)) => assert(to == from)
        case _ => ()
      }
    }
  }

  test("E2: semDedup drops planted exact copies, keeps one representative per component") {
    val base = Tables.embeddings(spark, sfDir).select(col("vec_id"), col("embedding"))
    val copies = base.where(col("vec_id") < 5)
      .select((col("vec_id") + 1000000).as("vec_id"), col("embedding"))
    val result = Similarity.semDedup(base.union(copies), threshold = 0.999,
      nCells = 4, fitSampleFraction = 1.0)
    val out = result.as[(Long, Int, Long, Boolean, Option[Double])].collect().toSeq
    assert(out.size == base.count() + 5, "one row per input vector")
    // every planted copy is an exact duplicate of its base: same cell,
    // above-threshold edge, higher id -> dropped, base id labels the
    // component, and the cosine-1.0 edge is the recorded witness
    for ((id, _, comp, kept, witness) <- out if id >= 1000000) {
      assert(!kept, s"exact copy $id survived")
      assert(comp <= id - 1000000, s"copy $id not linked to its base (component $comp)")
      assert(witness.exists(_ >= 0.999), s"copy $id lacks its witness cosine: $witness")
    }
    // every dropped row carries an above-threshold witness; kept singletons carry none
    for ((id, _, comp, kept, witness) <- out) {
      if (!kept) assert(witness.exists(_ >= 0.999), s"evidence-free drop of $id")
      if (kept && comp == id && witness.isEmpty) () // singleton — fine
    }
    // exactly one kept member per component, and it is the min id
    out.groupBy(_._3).foreach { case (comp, rows) =>
      val keptRows = rows.filter(_._4)
      assert(keptRows.map(_._1) == Seq(rows.map(_._1).min),
        s"component $comp kept ${keptRows.map(_._1)} of ${rows.map(_._1).sorted}")
      assert(comp == rows.map(_._1).min)
    }
    // the invariant summary distills exactly these laws into one row
    val inv = Similarity.semDedupInvariants(result, 0.999)
      .as[(Long, Boolean)].collect().head
    assert(inv == ((out.size.toLong, true)), s"invariant row: $inv")
    graft.operators.Pinned.release()
  }

  test("E2: semDedupInvariants flips on a broken closure (two keepers / evidence-free drop)") {
    import org.apache.spark.sql.functions.{lit => flit}
    // a valid 2-vector component, then corrupt it two ways
    val good = Seq((1L, 0, 1L, true, None: Option[Double]),
      (2L, 0, 1L, false, Some(0.9995)))
      .toDF("id", "cell", "component", "kept", "witness_cos")
    assert(Similarity.semDedupInvariants(good, 0.999)
      .as[(Long, Boolean)].collect().head == ((2L, true)))
    graft.operators.Pinned.release()
    val twoKeepers = good.withColumn("kept", flit(true))
    assert(!Similarity.semDedupInvariants(twoKeepers, 0.999)
      .as[(Long, Boolean)].collect().head._2, "two keepers must flip the gate")
    graft.operators.Pinned.release()
    val evidenceFree = Seq((1L, 0, 1L, true, None: Option[Double]),
      (2L, 0, 1L, false, None: Option[Double]))
      .toDF("id", "cell", "component", "kept", "witness_cos")
    assert(!Similarity.semDedupInvariants(evidenceFree, 0.999)
      .as[(Long, Boolean)].collect().head._2, "an evidence-free drop must flip the gate")
    graft.operators.Pinned.release()
  }

  test("E2: KMV overlap — identical strata read 1.0, disjoint strata 0.0, at any k") {
    import graft.operators.Sketches
    val a = Seq("alpha beta gamma delta epsilon zeta", "eta theta iota kappa lambda mu")
    val c = Seq("one two three four five six", "seven eight nine ten eleven twelve")
    val corpus = (a.map(("A", _)) ++ a.map(("B", _)) ++ c.map(("C", _)))
      .toDF("source", "text")
    for (k <- Seq(1, 3, 64)) {
      val est = Sketches.kmvJaccard(
        Sketches.kmvSignatures(corpus, "source", "text", n = 3, k = k), k = k)
        .orderBy("source_a", "source_b")
        .as[(String, String, Long, Long, Double)].collect().toSeq
      assert(est.map(e => (e._1, e._2, e._5)) ==
        Seq(("A", "B", 1.0), ("A", "C", 0.0), ("B", "C", 0.0)), s"k=$k: $est")
    }
  }

  test("E2: KMV overlap is EXACT when k covers the union (the estimator law)") {
    import graft.operators.Sketches
    import graft.functions.TextFunctions
    val corpus = Tables.documents(spark, sfDir).where(col("doc_id") < 60)
      .select(col("source"), col("text"))
    // exact pairwise Jaccard over the full distinct shingle-hash sets
    val sets = corpus
      .select(col("source"),
        explode(TextFunctions.shingles(TextFunctions.tokenize(col("text")), 3)).as("sh"))
      .select(col("source"), TextFunctions.hash60(col("sh")).as("h"))
      .distinct().as[(String, Long)].collect()
      .groupBy(_._1).map { case (s, xs) => s -> xs.map(_._2).toSet }
    val exact = for {
      (sa, ha) <- sets.toSeq.sortBy(_._1)
      (sb, hb) <- sets.toSeq.sortBy(_._1) if sa < sb
    } yield (sa, sb, (ha & hb).size.toDouble / (ha | hb).size)
    // with k >= |union| the sketch degrades to the exact computation
    val k = sets.values.map(_.size).sum + 1
    val est = Sketches.kmvJaccard(
      Sketches.kmvSignatures(corpus, "source", "text", n = 3, k = k), k = k)
      .orderBy("source_a", "source_b")
      .as[(String, String, Long, Long, Double)].collect().toSeq
      .map(e => (e._1, e._2, e._5))
    assert(est == exact, s"est $est\nexact $exact")
    // r10: a FOREIGN signature table with duplicated (stratum, h) rows must
    // estimate like its distinct form — the shared test counts union-row
    // multiplicity and duplicates used to inflate/deflate it silently
    val sig = Sketches.kmvSignatures(corpus, "source", "text", n = 3, k = k)
    val dupEst = Sketches.kmvJaccard(sig.union(sig), k = k)
      .orderBy("source_a", "source_b")
      .as[(String, String, Long, Long, Double)].collect().toSeq
      .map(e => (e._1, e._2, e._5))
    assert(dupEst == exact, s"duplicated signature rows skewed the estimate: $dupEst")
  }
}
