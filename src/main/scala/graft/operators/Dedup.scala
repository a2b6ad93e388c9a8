package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, ShortType, IntegerType, LongType}
import graft.functions.TextFunctions._

/** Deduplication operators for corpus-scale pipelines (SURVEY E1/E2).
  *
  * Design for 100 TB:
  *  - Exact dedup is a single hash-shuffle on the dedup key (or its md5 —
  *    shuffling a 16-byte digest instead of megabyte documents), with a
  *    deterministic keep-min-tiebreak window, never a driver collect.
  *  - Near-dup is MinHash + LSH banding: signature computation is a single
  *    groupBy(doc) over exploded shingles (map-side partial min), candidate
  *    generation is a *band-bucket shuffle join* — docs only meet if they
  *    agree on a full band, so the cross-product is per-bucket, not global.
  *    An all-pairs comparison never happens; skewed buckets are handled by
  *    AQE skew-join splitting.
  *  - All hashes are md5-derived (TextFunctions.hash32), portable across
  *    engines so the DuckDB oracle replays the identical pipeline.
  */
object Dedup {

  /** Mod prime just above 2^32 for the universal-hash family. */
  val P: Long = 4294967311L

  /** (a, b) parameters of the j-th universal hash h_j(x) = (a*x + b) mod P. */
  def hashParams(j: Int): (Long, Long) = (2L * j + 1L, 12289L * j + 1L)

  /** One shared "is this an integral id type" rule — [[segmentDedup]]'s
    * packed fast path and [[connectedComponents]]' sum-based convergence
    * probe both dispatch on it; two hand-rolled copies could drift.
    */
  private def isIntegralType(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
    case _: ByteType | _: ShortType | _: IntegerType | _: LongType => true
    case _ => false
  }

  /** E1: exact dedup keeping, per duplicate group, the row with the minimal
    * tiebreak value. Deterministic (unlike dropDuplicates, whose survivor
    * depends on partitioning) — PROVIDED the tiebreak is unique within
    * each key group (give it your primary key): with tiebreak TIES between
    * rows that differ elsewhere, which row survives is partition-order-
    * dependent again, because row_number breaks the remaining tie
    * arbitrarily. Every catalog caller passes a unique id.
    */
  def exactDedup(df: DataFrame, key: Seq[String], tiebreak: String): DataFrame = {
    val w = Window.partitionBy(key.map(col): _*).orderBy(col(tiebreak))
    df.withColumn("__rn", row_number().over(w)).where(col("__rn") === 1).drop("__rn")
  }

  /** E1 at document scale: dedup on the md5 of the payload instead of the
    * payload itself — the shuffle moves 32-char digests, not megabyte
    * documents (the SCALE.md design). Collision risk at 128 bits is
    * negligible against any corpus size.
    */
  /** The ONE document-fingerprint expression (md5 over raw text bytes).
    * Bit-for-bit agreement between the stored index and every recompute
    * site is load-bearing for the incremental anti-join — a drifted copy
    * would make exact-dup detection silently stop matching (review r9).
    */
  private[graft] def docFingerprint(textCol: String): Column =
    md5(col(textCol).cast("binary"))

  def exactDedupByFingerprint(df: DataFrame, textCol: String, tiebreak: String): DataFrame = {
    // null text fingerprints NULL, and the window would group every
    // null-fp row into ONE "duplicate" group and delete all but one --
    // two null-text docs are not provably identical payloads, and the
    // cross-batch anti-join never matches null fps either, so within-batch
    // collapse would also diverge from the incremental path (review r10).
    // Null-fp rows bypass the dedup untouched.
    val withFp = df.withColumn("__fp", docFingerprint(textCol))
    exactDedup(withFp.where(col("__fp").isNotNull), Seq("__fp"), tiebreak)
      .unionByName(withFp.where(col("__fp").isNull))
      .drop("__fp")
  }

  /** Distinct (id, shingle) pairs for a corpus of (id, text). By default
    * the input is repartitioned to full parallelism first:
    * tokenize+shingle+explode is the CPU-heavy stage, and a single-row-group
    * parquet file (or any skewed file layout) would otherwise pin it to a
    * handful of tasks. Pass repartitionFirst=false when the input is
    * corpus-sized and well-split (a 100 TB scan already yields thousands of
    * tasks) — there the round-robin exchange would move every byte of text
    * for no parallelism gain.
    */
  def shingleSet(df: DataFrame, idCol: String, textCol: String, n: Int = 3,
                 repartitionFirst: Boolean = true): DataFrame = {
    val spread =
      if (repartitionFirst) df.repartition(df.sparkSession.sparkContext.defaultParallelism)
      else df
    spread
      // project tokens first: shingling reads the token array 3x per
      // position, and without this boundary each read would re-run the
      // whole regexp tokenizer (O(doc^2) work per document)
      .select(col(idCol).as("doc_id"), tokenize(col(textCol)).as("toks"))
      .select(col("doc_id"), explode(array_distinct(shingles(col("toks"), n))).as("sh"))
  }

  /** MinHash signatures: one row per doc with columns mh0..mh{numHashes-1}
    * plus `n_sh`, the doc's distinct-shingle count (free here since the
    * input is distinct (doc, sh) pairs; downstream Jaccard uses it without
    * re-aggregating the shingle table). One shuffle (groupBy doc_id) with
    * map-side partial mins. The md5-based base hash is projected ONCE
    * before the aggregate — as an aggregate input it would be re-evaluated
    * per min() expression, multiplying the dominant md5 cost by numHashes.
    */
  def minhashSignatures(shingleSets: DataFrame, numHashes: Int = 16): DataFrame = {
    // mins.head would otherwise die with a bare NoSuchElementException --
    // name the bad argument instead (review r10)
    require(numHashes >= 1, s"numHashes must be >= 1, got $numHashes")
    val hashed = shingleSets.select(col("doc_id"), hash32(col("sh")).as("__h"))
    val mins = (0 until numHashes).map { j =>
      val (a, b) = hashParams(j)
      min((col("__h") * a + b) % P).as(s"mh$j")
    }
    // n_sh rides along for free (the input is already distinct (doc, sh)
    // pairs), so downstream Jaccard never re-aggregates the shingle table
    // for sizes
    hashed.groupBy("doc_id").agg(mins.head, (mins.tail :+ count(lit(1)).as("n_sh")): _*)
  }

  /** LSH banding: (doc_id, band, key) rows; docs sharing a (band, key) are
    * candidate near-duplicates. rowsPerBand hashes are concatenated per
    * band. Default 4 bands x 4 rows: detection probability at jaccard j is
    * 1-(1-j^4)^4 — ~95% at j=0.85, ~2% at j=0.3 — which keeps the
    * candidate set near-linear even on corpora with high baseline overlap
    * (2-row bands collide quadratically on such data).
    */
  def bands(signatures: DataFrame, numHashes: Int = 16, rowsPerBand: Int = 4): DataFrame = {
    // a non-divisible split would silently DISCARD the trailing hashes —
    // the caller would pay for numHashes but get a different banding curve
    require(numHashes >= 1, s"numHashes must be >= 1, got $numHashes " +
      "(0 passes the divisibility check below and silently yields ZERO bands -- " +
      "no candidate would ever surface)")
    require(numHashes % rowsPerBand == 0,
      s"numHashes ($numHashes) must be a multiple of rowsPerBand ($rowsPerBand)")
    val numBands = numHashes / rowsPerBand
    val bandStructs = (0 until numBands).map { k =>
      val keyCols = (0 until rowsPerBand).map(r => col(s"mh${k * rowsPerBand + r}"))
      struct(lit(k).as("band"), concat_ws("_", keyCols: _*).as("key"))
    }
    signatures.select(col("doc_id"), explode(array(bandStructs: _*)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.key").as("key"))
  }

  /** Candidate pairs (a_id < b_id) from the band-bucket join.
    *
    * `hubCap` is the giant-bucket skew guard: a bucket of m docs emits
    * m(m-1)/2 pairs from ONE task, so a boilerplate cluster of 10^6
    * members — routine at 100 TB — would emit 5x10^11 rows from a single
    * straggler. With a cap, buckets over it emit HUB pairs only (bucket-min
    * id vs each member): O(m) output, same single task. For the flows these
    * buckets matter to (keep-min cleaning, canonical clustering) the
    * survivor set is unchanged whenever the bucket is a near-clique — and a
    * bucket whose members collided on EVERY minhash in a band is exactly
    * that — because each non-min member still pairs with the minimum and
    * the downstream exact-Jaccard verify still gates every emitted pair.
    * The trade: chain-shaped clusters that happen to share one bucket lose
    * their non-hub edges (pair RECALL, not precision) — so the cap is
    * opt-in and pair-reporting callers keep the exact default. Measured in
    * the round-7 skew rehearsal (SCALE.md): a planted 1001-member cluster's
    * pair stage drops from ~500k to 1k rows.
    */
  def candidatePairs(bands: DataFrame): DataFrame = candidatePairs(bands, None)

  /** See the one-arg overload; `hubCap = Some(cap)` enables the
    * giant-bucket guard.
    */
  def candidatePairs(bands: DataFrame, hubCap: Option[Int]): DataFrame = {
    val allOf = (bk: DataFrame) => {
      val a = bk.select(col("band"), col("key"), col("doc_id").as("a_id"))
      val b = bk.select(col("band"), col("key"), col("doc_id").as("b_id"))
      a.join(b, Seq("band", "key")).where(col("a_id") < col("b_id"))
        .select("a_id", "b_id")
    }
    hubCap match {
      case None => allOf(bands).distinct()
      case Some(cap) =>
        require(cap >= 2, s"hubCap must be >= 2, got $cap")
        // bucket stats partial-aggregate map-side; the join back is on the
        // same (band, key) the pair join needed anyway
        val stats = bands.groupBy("band", "key")
          .agg(count(lit(1)).as("__n"), min("doc_id").as("__hub"))
        val tagged = bands.join(stats, Seq("band", "key"))
        val small = tagged.where(col("__n") <= cap)
          .select("band", "key", "doc_id")
        val hubPairs = tagged
          .where(col("__n") > cap && col("doc_id") =!= col("__hub"))
          .select(col("__hub").as("a_id"), col("doc_id").as("b_id"))
        allOf(small).union(hubPairs).distinct()
    }
  }

  /** Exact shingle-Jaccard for a set of candidate pairs. The corpus-sized
    * shingle table is first cut down (semi-join) to docs that actually
    * appear in a pair, so verification cost scales with the candidate set,
    * not the corpus — at 100 TB the pairs side is orders of magnitude
    * smaller than the corpus and the semi-join is the whole ballgame.
    *
    * Emits ONE ROW PER DISTINCT INPUT PAIR (duplicate (a_id, b_id) input
    * rows collapse — counting them into the intersection would read
    * jaccard > 1, review r9): a pair with zero shared shingles gets
    * jaccard 0.0 (it used to vanish through the inner intersection join —
    * a caller iterating "one row per candidate" lost exactly the
    * hash-collision-only candidates), and a pair where BOTH members are
    * shingle-less gets null (J(∅,∅) is undefined; the engine's cosine
    * uses the same null convention). Threshold filters downstream are
    * unaffected — 0.0 and null both fail `>= threshold`.
    */
  def exactJaccard(pairs: DataFrame, shingleSets: DataFrame): DataFrame =
    exactJaccard(pairs, shingleSets, sizes = None)

  /** As above, with precomputed per-doc shingle counts (e.g. the `n_sh`
    * column minhashSignatures emits) so the corpus-sized size aggregate is
    * skipped.
    */
  def exactJaccard(pairs: DataFrame, shingleSets: DataFrame,
                   sizes: Option[DataFrame]): DataFrame = {
    // duplicate (a_id, b_id) input rows would multiply the intersection
    // count (inter = dupFactor x true overlap, jaccard > 1) while the
    // final left joins fan the corrupt value back out — ONE distinct here
    // keeps the "one row per input pair" contract exact for any caller
    // (review r9; the pair frame is id-only, the cheapest possible distinct)
    val uniquePairs = pairs.select("a_id", "b_id").distinct()
    // left_semi dedups its right side itself — no distinct needed
    val docsInPairs = uniquePairs.select(col("a_id").as("doc_id"))
      .union(uniquePairs.select(col("b_id").as("doc_id")))
    val sh = shingleSets.join(docsInPairs, Seq("doc_id"), "left_semi")
    val szs = sizes.getOrElse(sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh")))
      .select("doc_id", "n_sh")
    val sa = sh.select(col("doc_id").as("a_id"), col("sh"))
    val sb = sh.select(col("doc_id").as("b_id"), col("sh"))
    val inter = uniquePairs
      .join(sa, "a_id").join(sb, Seq("b_id", "sh"))
      .groupBy("a_id", "b_id").agg(count(lit(1)).as("inter"))
    // LEFT joins from the pair list: zero-intersection and shingle-less
    // members must yield a 0.0/null row, never a silently missing pair
    val i = coalesce(col("inter"), lit(0L))
    val denom = coalesce(col("na"), lit(0L)) + coalesce(col("nb"), lit(0L)) - i
    uniquePairs
      .join(inter, Seq("a_id", "b_id"), "left")
      .join(szs.select(col("doc_id").as("a_id"), col("n_sh").as("na")), Seq("a_id"), "left")
      .join(szs.select(col("doc_id").as("b_id"), col("n_sh").as("nb")), Seq("b_id"), "left")
      .select(col("a_id"), col("b_id"),
        when(denom > 0, i.cast("double") / denom).otherwise(lit(null).cast("double"))
          .as("jaccard"))
  }

  /** E2 end-to-end: near-duplicate pairs with exact Jaccard >= threshold,
    * candidates generated by MinHash-LSH banding (never all-pairs).
    */
  def nearDupPairs(corpus: DataFrame, idCol: String, textCol: String,
                   threshold: Double = 0.5, numHashes: Int = 16,
                   rowsPerBand: Int = 4, shingleN: Int = 3,
                   hubCap: Option[Int] = None,
                   repartitionFirst: Boolean = true): DataFrame = {
    // the shingle set feeds 3 consumers (signatures, both jaccard sides)
    // and the candidate set feeds 2 (doc filter, pair join) — persist both
    // so each pipeline stage computes exactly once; per-doc sizes ride the
    // signature aggregate instead of re-scanning the shingle table. The
    // persists back the RETURNED lazy frame, so they stay cached until the
    // caller finishes consuming it; consumers then call Pinned.release()
    // (the Verify/Bench harnesses do so between queries)
    // pinEager, not pin (r15): the three consumers meet in ONE action,
    // and AQE's concurrent stage materialization raced the lazy caches —
    // each stage recomputed the shingle/signature pipelines instead of
    // sharing them (profiled: up to 6 parallel corpus-shaped jobs per
    // query). Eager chaining also makes each level build FROM the
    // previous level's cache.
    val sh = Pinned.pinEager(shingleSet(corpus, idCol, textCol, shingleN, repartitionFirst))
    val sig = Pinned.pinEager(minhashSignatures(sh, numHashes))
    val cand = Pinned.pinEager(candidatePairs(bands(sig, numHashes, rowsPerBand), hubCap))
    exactJaccard(cand, sh, sizes = Some(sig.select("doc_id", "n_sh")))
      .where(col("jaccard") >= threshold)
  }

  /** E2 end-to-end corpus cleaner: detect near-dup pairs, then drop the
    * higher-id member of each pair (greedy keep-min survivor — for
    * transitive clusters every non-minimal member pairs with a smaller id
    * at detection thresholds, so the minimal doc survives). Returns the
    * cleaned corpus with original columns.
    */
  def removeNearDups(corpus: DataFrame, idCol: String, textCol: String,
                     threshold: Double = 0.5,
                     repartitionFirst: Boolean = true,
                     numHashes: Int = 16, rowsPerBand: Int = 4,
                     shingleN: Int = 3,
                     hubCap: Option[Int] = None): DataFrame = {
    // hubCap threads through (review r10): keep-min cleaning is EXACTLY
    // the flow candidatePairs documents the giant-bucket guard as safe
    // for (survivor parity), yet the cleaner could not reach it before
    val drop = nearDupPairs(corpus, idCol, textCol, threshold,
        numHashes = numHashes, rowsPerBand = rowsPerBand, shingleN = shingleN,
        hubCap = hubCap, repartitionFirst = repartitionFirst)
      .select(col("b_id").as(idCol)).distinct()
    corpus.join(drop, Seq(idCol), "left_anti")
  }

  /** The persisted artifact that makes incremental dedup scale with the
    * batch: one row per existing doc with its MinHash signature, distinct-
    * shingle count and exact fingerprint. Build once, store (parquet),
    * union in new batches' signatures as they are accepted.
    */
  def signatureIndex(corpus: DataFrame, idCol: String, textCol: String,
                     numHashes: Int = 16,
                     repartitionFirst: Boolean = true): DataFrame =
    // LEFT join from the fingerprints: a doc too short to shingle (under n
    // tokens) still carries its exact fingerprint in the index — only its
    // mh*/n_sh columns are null. repartitionFirst=false for corpus-sized
    // well-split inputs (shingleSet's contract): building the 100 TB index
    // must not round-robin every byte of text through an exchange first.
    corpus.select(col(idCol).as("doc_id"), docFingerprint(textCol).as("fp"))
      .join(minhashSignatures(
          shingleSet(corpus, idCol, textCol, repartitionFirst = repartitionFirst),
          numHashes),
        Seq("doc_id"), "left")

  /** Storable LSH band table of a [[signatureIndex]]: one row per
    * (bkey, doc_id), where `bkey = "band:key"` is a single composite
    * bucket column. Persist with [[writeBandIndex]] (bucketed BY bkey) and
    * hand the read-back table to [[dedupIncremental]] — a batch probe then
    * prunes its scan to the buckets the batch's own bands touch, instead of
    * re-emitting and scanning every stored doc's bands per ingest.
    * Shingle-less index rows (null signature) carry no bands, matching the
    * inline path.
    */
  def bandIndexTable(index: DataFrame, numHashes: Int = 16, rowsPerBand: Int = 4): DataFrame =
    bands(index.where(col("mh0").isNotNull), numHashes, rowsPerBand)
      .select(concat_ws(":", col("band"), col("key")).as("bkey"), col("doc_id"))

  /** Persist the band table of `index` as a parquet table bucketed+sorted
    * by `bkey`; read back with `spark.table(table)`. Bucketing is what buys
    * the probe-side scan pruning AND a shuffle-free join on bkey.
    */
  def writeBandIndex(index: DataFrame, table: String, buckets: Int = 64,
                     numHashes: Int = 16, rowsPerBand: Int = 4): Unit =
    graft.sources.Sink.writeBucketed(
      bandIndexTable(index, numHashes, rowsPerBand), table, "bkey", buckets)

  /** MAINTAIN a stored [[writeBandIndex]] table across ingests: append the
    * band rows of `index` — typically the survivors' signature-index frame
    * [[dedupIncrementalWithIndex]] returns — so a long-running ingest loop
    * neither rebuilds the band table per batch (O(corpus) writes) nor
    * probes a stale one (VERDICT r9 #7). Bucketing must repeat the
    * original spec: Spark validates it against the existing table and
    * refuses a mismatch loudly (a silently different spec would break the
    * shuffle-free probe join). numHashes/rowsPerBand must also match the
    * original build — they define the band keys themselves, so a drift
    * makes probes miss; pass the same values, as with [[dedupIncremental]].
    * Each append adds one file per bucket touched; compact the table on
    * the usual small-files cadence ([[graft.sources.Sink.compactParquet]]
    * cannot be used on bucketed tables' layout — re-running
    * [[writeBandIndex]] over the full index IS the compaction here,
    * amortized over many appends).
    */
  def appendBandIndex(index: DataFrame, table: String, buckets: Int = 64,
                      numHashes: Int = 16, rowsPerBand: Int = 4): Unit =
    bandIndexTable(index, numHashes, rowsPerBand)
      .write.mode(org.apache.spark.sql.SaveMode.Append)
      .bucketBy(buckets, "bkey").sortBy("bkey")
      .format("parquet").saveAsTable(table)

  /** How [[dedupIncremental]] probes the stored index (VERDICT r4 #6: the
    * default IN-pushdown collects bounded key sets at CALL time, which
    * surprises callers composing lazy frames).
    *
    *  - Auto: collect-and-push when under the caps (bucket keys under
    *    `maxProbeKeys`; candidate ids under the parquet
    *    inFilterThreshold) — buys row-group pruning at the cost of two
    *    bounded driver-side collects at call time.
    *  - InFilter: like Auto but candidate ids push down up to
    *    `maxProbeKeys` even past the parquet inFilterThreshold — for
    *    stores where the IN list prunes regardless (e.g. a bucketed or
    *    z-ordered corpus).
    *  - SemiJoin: never collects — every probe is a join, the whole call
    *    stays lazy until the caller's first action. Same result (parity
    *    asserted in OperatorsSpec); trades scan pruning for laziness.
    */
  sealed trait ProbeStrategy
  case object Auto extends ProbeStrategy
  case object InFilter extends ProbeStrategy
  case object SemiJoin extends ProbeStrategy

  /** How many literals a probe may enumerate into a pushed-down IN filter
    * before falling back to a join — shared by the band-key probe and the
    * candidate-id pushdown so the two sites cannot desynchronize. -1 means
    * never enumerate (SemiJoin: the fully-lazy contract). Auto follows
    * parquet's inFilterThreshold: past it the scan degrades the IN to a
    * min/max range (and bucket hashing saturates), so a larger literal
    * list buys no pruning while its plan compile costs seconds — measured
    * on a ~11k-key band probe, see ProbeAmortize/SCALE.md. InFilter honors
    * `maxProbeKeys` verbatim as the documented explicit opt-in.
    */
  private def pushdownCap(strategy: ProbeStrategy, maxProbeKeys: Int,
                          spark: org.apache.spark.sql.SparkSession): Int =
    strategy match {
      case SemiJoin => -1
      case InFilter => maxProbeKeys
      case Auto => math.min(spark.conf
        .get("spark.sql.parquet.pushdown.inFilterThreshold", "10").toInt, maxProbeKeys)
    }

  /** Incremental dedup: drop rows of `batch` that duplicate (exactly, by
    * md5 fingerprint) or near-duplicate (MinHash-LSH) any EXISTING document
    * or an earlier batch document — the continual-ingest shape, where
    * yesterday's corpus is already clean and only the new batch needs
    * vetting. `existingIndex` is the stored [[signatureIndex]] of the clean
    * corpus; the existing TEXT is touched only to re-shingle the handful of
    * docs that land in candidate pairs, so per-batch cost scales with the
    * batch + LSH collisions, never with the corpus. Phases:
    *  1. batch-internal exact dedup (fingerprint-keyed, keep-min) — catches
    *     identical short docs the shingle phase cannot see;
    *  2. fingerprint anti-join against the index (digests shuffle, not
    *     documents);
    *  3. band-bucket candidates of batch signatures vs index signatures,
    *     filtered to pairs touching a batch doc BEFORE exact-Jaccard
    *     verification. A batch doc paired with an existing doc drops
    *     regardless of id orientation; of a batch-batch pair the larger id
    *     drops. Ids of the two frames must be disjoint.
    *
    * At extreme scale pass `bandIndex` = the stored [[writeBandIndex]]
    * table (built from the SAME `existingIndex`, numHashes and rowsPerBand):
    * phase 3 then probes only the buckets the batch's bands touch — the
    * batch's distinct bucket keys become an IN filter on the bucket column
    * (bucket pruning cuts the scan) and the batch side broadcasts, so the
    * stored band table is never shuffled OR fully scanned. Without it, the
    * band table of the whole index is re-emitted per batch — an O(corpus)
    * pass per ingest that the stored variant exists to remove.
    *
    * Measured at sf0.1 (template-heavy fixture corpus, worst case for
    * collision count): index build 5.8 s one-time, 50-doc batch vetted in
    * ~12 s, with the cost concentrated in re-shingling collided existing
    * docs — a term that scales with the batch's collision count, not the
    * corpus.
    *
    * @param maxProbeKeys largest batch bucket-key count still pushed down
    *        as an IN filter (the key list is collected to the driver —
    *        bounded by batch x numBands, so this caps driver memory);
    *        above it the probe is a plain join against the bucketed table,
    *        which still avoids a stored-side exchange but scans all buckets
    */
  def dedupIncremental(existing: DataFrame, batch: DataFrame, idCol: String,
                       textCol: String, threshold: Double = 0.5,
                       existingIndex: Option[DataFrame] = None,
                       numHashes: Int = 16, rowsPerBand: Int = 4,
                       bandIndex: Option[DataFrame] = None,
                       maxProbeKeys: Int = 50000,
                       probeStrategy: ProbeStrategy = Auto): DataFrame =
    dedupIncrementalCore(existing, batch, idCol, textCol, threshold,
      existingIndex, numHashes, rowsPerBand, bandIndex, maxProbeKeys,
      probeStrategy)._2

  /** As [[dedupIncremental]], but ALSO returns the survivors' signature-
    * index rows (doc_id, fp, mh*, n_sh — the [[signatureIndex]] schema),
    * derived from the batch signatures already computed during vetting:
    * one extra md5 per survivor instead of a second tokenize/shingle/
    * minhash pass. Append the second frame to the stored index to maintain
    * it across ingests (the streaming sink does). The kept frame is
    * pinned, since both returned frames share its lineage.
    */
  def dedupIncrementalWithIndex(existing: DataFrame, batch: DataFrame, idCol: String,
                                textCol: String, threshold: Double = 0.5,
                                existingIndex: Option[DataFrame] = None,
                                numHashes: Int = 16, rowsPerBand: Int = 4,
                                bandIndex: Option[DataFrame] = None,
                                maxProbeKeys: Int = 50000,
                                probeStrategy: ProbeStrategy = Auto): (DataFrame, DataFrame) = {
    val (batchSig, kept0) = dedupIncrementalCore(existing, batch, idCol, textCol,
      threshold, existingIndex, numHashes, rowsPerBand, bandIndex, maxProbeKeys,
      probeStrategy)
    val kept = Pinned.pin(kept0)
    val keptIndex = kept
      .select(col(idCol).as("doc_id"), docFingerprint(textCol).as("fp"))
      .join(batchSig, Seq("doc_id"), "left")
    (kept, keptIndex)
  }

  private def dedupIncrementalCore(existing: DataFrame, batch: DataFrame, idCol: String,
                                   textCol: String, threshold: Double,
                                   existingIndex: Option[DataFrame],
                                   numHashes: Int, rowsPerBand: Int,
                                   bandIndex: Option[DataFrame],
                                   maxProbeKeys: Int,
                                   probeStrategy: ProbeStrategy): (DataFrame, DataFrame) = {
    // project the stored index to exactly the columns this code consumes:
    // a table read back from parquet may carry extras (e.g. a batch
    // partition column) that would poison the unionByName below
    val indexCols = (Seq("doc_id", "fp") ++
      (0 until numHashes).map(i => s"mh$i") :+ "n_sh").map(col)
    // a caller-persisted index is the caller's to unpersist; anything we
    // persist ourselves is pinned for the caller's Pinned.release().
    // With a STORED band table the index is consumed only twice, through
    // disjoint narrow projections (fp for the exact anti-join; doc_id+n_sh
    // for verification sizes) — caching all numHashes+3 columns to serve
    // two single-column scans costs a full-width materialization per probe
    // (measured ~3s of the sf0.1 probe floor, VERDICT r5 #4), so leave it
    // unpinned there and let column pruning reach the parquet scan. The
    // inline-bands path reads the wide mh columns anyway and fans out to
    // three consumers — pinning stays right for it.
    val index = existingIndex match {
      case Some(idx)
        if idx.storageLevel != org.apache.spark.storage.StorageLevel.NONE =>
        idx.select(indexCols: _*)
      case Some(idx) if bandIndex.isDefined => idx.select(indexCols: _*)
      case Some(idx) => Pinned.pin(idx.select(indexCols: _*))
      case None => Pinned.pin(signatureIndex(existing, idCol, textCol, numHashes))
    }
    // feeds the signature build, the batch-flag table and the final
    // anti-join — persist or the whole exact phase re-runs per consumer
    // one md5 pass: the fingerprint serves both the batch-internal dedup
    // and the index anti-join (exactDedupByFingerprint would drop it and
    // force an identical recompute)
    val fresh = Pinned.pin(
      exactDedup(batch.withColumn("__fp", docFingerprint(textCol)),
          Seq("__fp"), idCol)
        .join(index.select(col("fp").as("__fp")).distinct(), Seq("__fp"), "left_anti")
        .drop("__fp"))
    val batchSh = Pinned.pin(shingleSet(fresh, idCol, textCol))
    val batchSig = Pinned.pin(minhashSignatures(batchSh, numHashes))
    // shingle-less index rows (null signature) carry only a fingerprint —
    // they cannot near-dup and must not enter the band tables
    val allSig = index.drop("fp").where(col("mh0").isNotNull).unionByName(batchSig)
    val isBatch = fresh.select(col(idCol).as("__bid"), lit(true).as("__in_batch"))
    // candidates: BATCH bands probe the band table — existing docs never
    // band-join each other, so this stage is batch x collisions, not
    // corpus x corpus
    val rawCand = bandIndex match {
      case Some(stored) =>
        // stored-band probe: batch buckets -> IN filter (bucket pruning) +
        // broadcast batch side (stored table neither shuffles nor fully
        // scans); batch-batch pairs come from a tiny self-join
        val batchB = Pinned.pin(bands(batchSig, numHashes, rowsPerBand)
          .select(concat_ws(":", col("band"), col("key")).as("bkey"),
            col("doc_id").as("q_id")))
        val enumCap = pushdownCap(probeStrategy, maxProbeKeys,
          existing.sparkSession)
        val keys =
          if (enumCap < 0) Seq.empty[String]
          else batchB.select("bkey").distinct().limit(enumCap + 1)
            .collect().map(_.getString(0)).toSeq
        // a batch small enough to enumerate is small enough to broadcast;
        // above the cap — or under SemiJoin, which never enumerates — fall
        // back to plain joins (AQE decides the strategy, the bucketed
        // layout still spares the stored side its exchange)
        val small = enumCap >= 0 && keys.size <= enumCap
        val pruned =
          if (small) stored.where(col("bkey").isin(keys: _*)) else stored
        val batchC = batchB.select(col("bkey"), col("q_id").as("c_id"))
        val cross = (if (small) broadcast(batchB) else batchB)
          .join(pruned.select(col("bkey"), col("doc_id").as("c_id")), "bkey")
        val self = batchB.join(if (small) broadcast(batchC) else batchC, "bkey")
        cross.unionByName(self).select("q_id", "c_id")
      case None =>
        val batchBands = bands(batchSig, numHashes, rowsPerBand)
          .select(col("band"), col("key"), col("doc_id").as("q_id"))
        val allBands = bands(allSig, numHashes, rowsPerBand)
          .select(col("band"), col("key"), col("doc_id").as("c_id"))
        batchBands.join(allBands, Seq("band", "key")).select("q_id", "c_id")
    }
    val cand = Pinned.pin(rawCand
      .where(col("q_id") =!= col("c_id"))
      .select(least(col("q_id"), col("c_id")).as("a_id"),
        greatest(col("q_id"), col("c_id")).as("b_id"))
      .distinct()
      .join(isBatch.select(col("__bid").as("a_id"), col("__in_batch").as("__a_b")), Seq("a_id"), "left")
      .join(isBatch.select(col("__bid").as("b_id"), col("__in_batch").as("__b_b")), Seq("b_id"), "left"))
    // shingles for verification: batch side is already computed; existing
    // side re-shingles ONLY the candidate docs (semi-join cut on the text)
    val candExisting = cand.where(!coalesce(col("__a_b"), lit(false)))
      .select(col("a_id").as(idCol))
      .union(cand.where(!coalesce(col("__b_b"), lit(false))).select(col("b_id").as(idCol)))
    // the candidate-id set is collision-bounded (small); pushing it down as
    // an IN filter reaches the parquet scan's row-group stats, so the
    // existing TEXT column is read only where candidates can live — a
    // semi-join would still scan the whole corpus's text per batch. The cap
    // follows spark.sql.parquet.pushdown.inFilterThreshold (GraftSession
    // raises it to 1000): above it parquet degrades the IN to a min/max
    // range that spans most row groups, so larger sets fall back to the
    // semi-join instead of bloating the plan with a dead literal list.
    // NOTE this collect makes the call eager under Auto/InFilter: candidate
    // generation (and the inline index build, when existingIndex is None)
    // runs at call time, not first-action time. Pass probeStrategy=SemiJoin
    // to keep the whole call lazy (no collect anywhere).
    val idPushdownCap = pushdownCap(probeStrategy, maxProbeKeys,
      existing.sparkSession)
    val candIds =
      if (idPushdownCap < 0) Array.empty[Any]
      else candExisting.distinct().limit(idPushdownCap + 1).collect().map(_.get(0))
    val candExistingDocs =
      if (idPushdownCap >= 0 && candIds.length <= idPushdownCap)
        existing.where(col(idCol).isin(candIds.toSeq: _*))
      else existing.join(candExisting, Seq(idCol), "left_semi")
    val existingSh = shingleSet(candExistingDocs, idCol, textCol)
    // pinEager (r15): exactJaccard reads both sides of this union in
    // concurrent stages of its one action — see Pinned.pinEager. Only
    // when the call is ALREADY eager (a pushdown strategy collected
    // above): SemiJoin's no-collect-at-call-time contract must hold, so
    // it keeps the lazy pin and pays the first-action cache race.
    val verifySh =
      if (idPushdownCap >= 0) Pinned.pinEager(batchSh.unionByName(existingSh))
      else Pinned.pin(batchSh.unionByName(existingSh))
    val verified = exactJaccard(cand.select("a_id", "b_id"), verifySh,
      sizes = Some(allSig.select("doc_id", "n_sh")))
      .where(col("jaccard") >= threshold)
    // drop the batch-side member: cross pairs drop their batch doc in
    // either orientation; batch-batch pairs (a_id < b_id) drop the larger
    val drop = verified
      .join(cand.select("a_id", "b_id", "__a_b", "__b_b"), Seq("a_id", "b_id"))
      .select(when(coalesce(col("__a_b"), lit(false)) && !coalesce(col("__b_b"), lit(false)),
        col("a_id")).otherwise(col("b_id")).as(idCol))
      .distinct()
    (batchSig, fresh.join(drop, Seq(idCol), "left_anti"))
  }

  /** E2: transitive near-dup removal — detect pairs, resolve transitive
    * clusters via [[connectedComponents]], and keep exactly the minimal-id
    * member of every cluster. Stricter than [[removeNearDups]] (which drops
    * only the larger member of each DETECTED pair and so keeps cluster
    * members that were never directly compared) — use this when clusters
    * should collapse to one exemplar even across similarity chains.
    */
  def removeNearDupsTransitive(corpus: DataFrame, idCol: String, textCol: String,
                               threshold: Double = 0.5): DataFrame = {
    val pairs = nearDupPairs(corpus, idCol, textCol, threshold)
    val drop = connectedComponents(pairs)
      .where(col("id") =!= col("component"))
      .select(col("id").as(idCol))
    corpus.join(drop, Seq(idCol), "left_anti")
  }

  /** Connected components over a near-dup pair list: every doc in a
    * transitive duplicate cluster gets the cluster's minimal id as its
    * `component`. Iterative min-label propagation — each round joins labels
    * across edges and keeps the elementwise min; rounds needed = cluster
    * diameter, which for dedup graphs (dense LSH cliques, short chains) is
    * tiny. Each round is one shuffle join + aggregate over the EDGE list —
    * corpus-size-independent, since only docs that appear in a pair
    * participate. Each round also applies a path-halving shortcut
    * (component := component's component — one extra join over the LABEL
    * table, which is paired-doc-sized, not edge-sized), so even
    * adversarial path graphs converge in O(log diameter) rounds instead
    * of O(diameter); dedup graphs (dense LSH cliques) converge in 2-3
    * either way.
    *
    * @param pairs (a_id, b_id) near-dup pairs (undirected); ids may be any
    *              orderable type (numeric, string, ...)
    * @return (id, component) — one row per doc appearing in any pair
    * @throws IllegalStateException if maxRounds passes without convergence
    *         (a silently split cluster would dedup wrong); raise maxRounds
    *         for path-like graphs of diameter > maxRounds
    */
  def connectedComponents(pairs: DataFrame, maxRounds: Int = 20): DataFrame = {
    require(maxRounds >= 1, s"maxRounds must be >= 1, got $maxRounds")
    val spark = pairs.sparkSession
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val edges = pairs.select(col("a_id").as("src"), col("b_id").as("dst"))
      .union(pairs.select(col("b_id").as("src"), col("a_id").as("dst")))
      .persist(lvl)
    // seed with min(self, direct neighbors): same cost as the identity
    // init's distinct (one grouped pass over edges) but already one
    // propagation hop ahead, saving a full iteration on most graphs
    var labels = edges.groupBy(col("src").as("id"))
      .agg(min("dst").as("__mn"))
      .select(col("id"), least(col("__mn"), col("id")).as("component"))
      .persist(lvl)
    // convergence probe: labels only ever decrease elementwise, so for
    // integral ids the label sum strictly decreases iff any label changed —
    // one aggregate per round instead of a join+count. The sum accumulates
    // in DECIMAL(38,0): exact for any count of full-range 64-bit ids, so a
    // wrap-around false-convergence cannot occur. Non-integral ids fall
    // back to the exact changed-row join. Empty inputs read as NULL -> 0.
    val numericIds = isIntegralType(labels.schema("component").dataType)
    def labelSum(df: DataFrame): java.math.BigDecimal = {
      val row = df.agg(sum(col("component")
        .cast(org.apache.spark.sql.types.DecimalType(38, 0)))).head()
      if (row.isNullAt(0)) java.math.BigDecimal.ZERO else row.getDecimal(0)
    }
    var prevSum = if (numericIds) labelSum(labels) else java.math.BigDecimal.ZERO
    var round = 0
    var converged = false
    while (!converged && round < maxRounds) {
      val neighborMin = edges
        .join(labels.withColumnRenamed("id", "dst"), "dst")
        .groupBy(col("src").as("id")).agg(min("component").as("nmin"))
      val propagated = labels.join(neighborMin, Seq("id"), "left")
        .select(col("id"),
          least(col("component"), coalesce(col("nmin"), col("component"))).as("component"))
      // path-halving shortcut: a label is always the id of some node in the
      // graph, so look its own label up and jump to it — turns O(diameter)
      // convergence into O(log diameter) on chain-shaped graphs for one
      // label-table-sized join per round
      val shortcut = propagated
        .join(propagated.select(col("id").as("__cid"), col("component").as("__cc")),
          propagated("component") === col("__cid"), "left")
        .select(propagated("id"),
          least(propagated("component"),
            coalesce(col("__cc"), propagated("component"))).as("component"))
      // truncate lineage: the self-join above references the round's plan
      // TWICE, so carrying the logical plan across rounds would double it
      // per round (exponential analysis cost — OOMs around round 12).
      // Rebasing on the materialized RDD keeps every round's plan
      // constant-size, the same checkpointing discipline GraphX applies.
      val next = spark.createDataFrame(shortcut.rdd, shortcut.schema).persist(lvl)
      if (numericIds) {
        val nextSum = labelSum(next)
        converged = nextSum.compareTo(prevSum) == 0
        prevSum = nextSum
        labels.unpersist()
      } else {
        val changed = next.join(labels.withColumnRenamed("component", "prev"), "id")
          .where(col("component") =!= col("prev")).count()
        converged = changed == 0
        labels.unpersist()
      }
      labels = next
      round += 1
    }
    edges.unpersist()
    if (!converged && round >= maxRounds) {
      labels.unpersist() // don't strand the last round's blocks on the throw path
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxRounds rounds — " +
          "graph diameter exceeds maxRounds; raise it (or use a " +
          "pointer-jumping formulation for path-like graphs)")
    }
    // the final labels stay persisted (the result IS this frame, already
    // materialized by the convergence probe) — registered so the caller's
    // Pinned.release() reclaims the storage after consumption
    Pinned.register(labels)
  }

  /** E2 (SimHash variant): 32-bit SimHash over the distinct-token set.
    * Near-dups land within a small Hamming distance; bit_count(xor) compares.
    */
  def simhash(df: DataFrame, idCol: String, textCol: String,
              repartitionFirst: Boolean = true): DataFrame = {
    // project the hash ONCE below the aggregate — referenced directly
    // inside the 32 sum() expressions it would be re-evaluated per
    // expression, multiplying the dominant md5 cost 32x per token (the
    // same measured trap minhashSignatures documents for its min()s).
    // repartitionFirst=false for corpus-sized well-split inputs — the
    // same exchange opt-out shingleSet documents (review r9)
    val spread =
      if (repartitionFirst) df.repartition(df.sparkSession.sparkContext.defaultParallelism)
      else df
    val toks = spread
      .select(col(idCol).as("doc_id"),
        explode(array_distinct(tokenize(col(textCol)))).as("token"))
      .select(col("doc_id"), hash32(col("token")).as("__h"))
    val bitSums = (0 until 32).map { i =>
      sum(shiftright(col("__h"), i) % 2 * 2 - 1).as(s"s$i")
    }
    val agg = toks.groupBy("doc_id").agg(bitSums.head, bitSums.tail: _*)
    val value = (0 until 32).map { i =>
      when(col(s"s$i") > 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
    agg.select(col("doc_id"), value.as("simhash"))
  }

  /** E10: benchmark decontamination report — per training doc that shares
    * at least one distinct n-token shingle with the eval corpus, the count
    * of shared shingles. The standard pre-training hygiene step: any doc
    * overlapping a held-out benchmark at n-gram granularity is suspect.
    *
    * 100 TB shape: the asymmetry is the whole design. Eval suites are tiny
    * (10^3-10^5 docs) next to the training corpus, so the eval side
    * collapses to a distinct shingle set that BROADCASTS (~30 bytes/gram:
    * a 100k-doc suite is a few GB — within executor memory; the hint is
    * load-bearing because the eval side arrives via explode+distinct, whose
    * size estimate is too pessimistic for auto-broadcast). The corpus then
    * streams through the hash join exactly once — no corpus shuffle, no
    * all-pairs term, and the per-doc groupBy aggregates only the HITS
    * (corpus-size-independent). Pass broadcastEval=false above driver
    * memory to fall back to a shuffle join of the two shingle sets.
    */
  def contaminationReport(train: DataFrame, eval: DataFrame, idCol: String,
                          textCol: String, n: Int = 4,
                          broadcastEval: Boolean = true): DataFrame =
    contaminationReportShingles(train,
      shingleSet(eval, idCol, textCol, n).select("sh").distinct(),
      idCol, textCol, n, broadcastEval)

  /** As [[contaminationReport]], against a PRECOMPUTED distinct eval
    * shingle frame (`shingleSet(eval).select("sh").distinct()` — shingle
    * `n` must match the one passed here for the train side). The
    * static-eval hot path: a caller who scores many corpora (or a
    * streaming curate hook firing every micro-batch) computes and persists
    * the eval shingles ONCE instead of re-shingling and re-distincting
    * the whole suite per invocation.
    */
  def contaminationReportShingles(train: DataFrame, evalShingles: DataFrame,
                                  idCol: String, textCol: String, n: Int = 4,
                                  broadcastEval: Boolean = true): DataFrame =
    // corpus side: NO repartition — shingling parallelism comes from the
    // scan's file splits; a round-robin exchange here would shuffle the
    // whole corpus's text before a join that never needed it moved
    shingleSet(train, idCol, textCol, n, repartitionFirst = false)
      .join(if (broadcastEval) broadcast(evalShingles) else evalShingles, "sh")
      .groupBy("doc_id").agg(count(lit(1)).as("n_hits"))

  /** E10: the training corpus with every contaminated doc removed. The
    * flagged-id set is report-sized (small), so it broadcasts into a
    * left-anti join against the corpus — again a single corpus pass.
    */
  def decontaminate(train: DataFrame, eval: DataFrame, idCol: String,
                    textCol: String, n: Int = 4,
                    broadcastEval: Boolean = true,
                    broadcastHits: Boolean = true): DataFrame = {
    val hit = contaminationReport(train, eval, idCol, textCol, n, broadcastEval)
      .select(col("doc_id").as(idCol))
    // broadcastHits=false is the escape hatch for the regime where a
    // common shingle (license boilerplate in the eval suite) flags a
    // corpus-scale fraction of training docs — a forced broadcast there
    // has no non-OOM path (review r9)
    train.join(if (broadcastHits) broadcast(hit) else hit, Seq(idCol), "left_anti")
  }

  /** [[decontaminate]] against a precomputed eval shingle frame (see
    * [[contaminationReportShingles]] for the contract and why).
    */
  def decontaminateShingles(train: DataFrame, evalShingles: DataFrame,
                            idCol: String, textCol: String, n: Int = 4,
                            broadcastEval: Boolean = true,
                            broadcastHits: Boolean = true): DataFrame = {
    val hit = contaminationReportShingles(train, evalShingles, idCol, textCol,
        n, broadcastEval)
      .select(col("doc_id").as(idCol))
    train.join(if (broadcastHits) broadcast(hit) else hit, Seq(idCol), "left_anti")
  }

  /** E1 at sub-document granularity (the C4-style line/paragraph dedup):
    * split every document into fixed `segTokens`-token segments, drop every
    * CORPUS-WIDE repeat of a segment (survivor = minimal (id, position)),
    * and reassemble each document from its surviving segments in order.
    * Documents whose every segment was seen earlier vanish entirely.
    *
    * 100 TB shape: segmentation is a narrow per-row transform (tokens are
    * never exploded — segments are built by slicing the token array
    * in-place); the only wide stages are one shuffle on the segment for
    * the global keep-first aggregate and one shuffle back on the doc id
    * for reassembly — the same two-exchange cost as C4's production
    * line-dedup. Keep-first is a partial-aggregable `min` grouped by the
    * segment, NOT a row_number window: a window partitioned by segment
    * text would shuffle and SORT every duplicate row on a long string
    * key, while the min collapses duplicate segments map-side BEFORE the
    * exchange — and duplicates are precisely what is abundant at scale,
    * so the exchange carries ~distinct segments per task, not the
    * corpus's full segment stream. For integral ids with
    * `packedIds = true` (the default) the (id, seg) pair packs into one
    * BIGINT (requires 0 <= id < 2^41 and < 2^21 segments per doc — 20M
    * tokens at segTokens=10), which keeps the aggregate in pure
    * HashAggregate form: zero sorts in the whole keep-first stage.
    * Out-of-range rows raise_error rather than mis-dedup — fail loud,
    * never corrupt. Corpora whose integral ids legitimately leave that
    * range (hash-derived 64-bit ids, negative ids) pass
    * `packedIds = false` to take the general `min(struct(id, seg))`
    * path — same map-side collapse, correct for every orderable id,
    * plus a local sort the packed form avoids (it compiles to a
    * SortAggregate: struct buffers are not hash-mutable). Non-integral
    * id types always take the general path. The survivor's (id, seg)
    * rides inside the min and the text is the grouping key, so no
    * join-back is needed either.
    */
  def segmentDedup(corpus: DataFrame, idCol: String, textCol: String,
                   segTokens: Int = 10, packedIds: Boolean = true): DataFrame = {
    require(segTokens >= 1, s"segTokens must be >= 1, got $segTokens")
    // empty/null-text docs have NO segments, so they vanish like
    // every-segment-duplicated docs do — the documented vanishing rule,
    // stated here because the filter is easy to misread as an oversight
    // (review r9; removeBoilerplate's contract differs and KEEPS them)
    val segs = corpus
      .where(length(col(textCol)) > 0)
      .select(col(idCol), split(col(textCol), " ").as("__toks"))
      .select(col(idCol), expr(
        s"""transform(sequence(0, cast(ceil(size(__toks) / ${segTokens}.0) as int) - 1),
           |          i -> array_join(slice(__toks, i * $segTokens + 1, $segTokens), ' '))"""
          .stripMargin).as("__segarr"))
      .select(col(idCol), posexplode(col("__segarr")).as(Seq("seg", "segment")))
    val idType = segs.schema(idCol).dataType
    val keep =
      if (packedIds && isIntegralType(idType)) {
        val segBits = 21
        val maxSeg = 1L << segBits
        val maxId = 1L << (62 - segBits) // sign bit stays clear
        val packed = when(
          col(idCol).cast("long").between(0, maxId - 1) && col("seg") < maxSeg,
          shiftleft(col(idCol).cast("long"), segBits) + col("seg"))
          .otherwise(raise_error(lit(
            s"segmentDedup packed keep-first needs 0 <= $idCol < 2^${62 - segBits} " +
              s"and < 2^$segBits segments per doc")))
        segs
          .groupBy("segment")
          .agg(min(packed).as("__p"))
          .select(shiftright(col("__p"), segBits).cast(idType).as(idCol),
            (col("__p") bitwiseAND (maxSeg - 1)).cast("int").as("seg"), col("segment"))
      } else {
        segs
          .groupBy("segment")
          .agg(min(struct(col(idCol), col("seg"))).as("__keep"))
          .select(col("__keep").getField(idCol).as(idCol),
            col("__keep").getField("seg").as("seg"), col("segment"))
      }
    keep
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_segments"),
        array_join(transform(array_sort(collect_list(struct(col("seg"), col("segment")))),
          x => x.getField("segment")), " ").as("cleaned_text"))
  }

  /** E10 (sketch path): [[contaminationReport]] with a Bloom-filter
    * prefilter. Semantics are IDENTICAL to the exact report — the Bloom
    * pass only prunes, an exact join on the surviving shingles kills the
    * false positives — so the two share one oracle.
    *
    * 100 TB shape: the exact path must broadcast the eval shingle STRINGS
    * (~30 bytes/gram). A Bloom filter at `fpp` = 1% costs ~9.6 BITS per
    * gram — ~25x smaller — so eval suites beyond exact-broadcast reach
    * still fit in every executor, and the corpus still streams through
    * the prefilter exactly once with no shuffle. The confirm join then
    * moves only `fpp x corpus-shingles + true hits` rows (the Bloom
    * guarantee: no false negatives, so no contamination is missed), which
    * is why `broadcastConfirm = false` is the honest default: at the scale
    * where you reach for the sketch, the exact set does NOT broadcast,
    * and the point is that the post-filter shuffle is negligible. The one
    * driver-side action is eval-sized (a count + sketch build over the
    * eval shingles — bounded by the same contract that makes eval suites
    * broadcastable in the exact path).
    */
  def contaminationReportBloom(train: DataFrame, eval: DataFrame,
                               idCol: String, textCol: String, n: Int = 4,
                               fpp: Double = 0.01,
                               broadcastConfirm: Boolean = false): DataFrame = {
    require(fpp > 0 && fpp < 1, s"fpp must be in (0, 1), got $fpp")
    val evalSh = Pinned.pin(
      shingleSet(eval, idCol, textCol, n).select("sh").distinct())
    val nEval = evalSh.count() // eval-sized action, reuses the pinned frame
    // empty eval set -> nothing can be contaminated; short-circuit with an
    // empty report of the right shape (Spark's bloomFilter aggregate
    // returns a null buffer over zero rows and readFrom NPEs on it)
    if (nEval == 0)
      return train.select(col(idCol).as("doc_id")).limit(0)
        .withColumn("n_hits", lit(0L))
    val bf = evalSh.stat.bloomFilter("sh", nEval, fpp)
    val bcast = train.sparkSession.sparkContext.broadcast(bf)
    val mightContain = udf((sh: String) => sh != null && bcast.value.mightContainString(sh))
    val confirm = if (broadcastConfirm) broadcast(evalSh) else evalSh
    shingleSet(train, idCol, textCol, n, repartitionFirst = false)
      .where(mightContain(col("sh")))
      .join(confirm, "sh")
      .groupBy("doc_id").agg(count(lit(1)).as("n_hits"))
  }

  /** E1c (C4-style boilerplate removal): drop every LINE that occurs in at
    * least `minDocs` distinct documents (nav bars, cookie banners,
    * footers), reassemble each document from its surviving lines in
    * order. Unlike [[segmentDedup]] — which keeps a segment's FIRST
    * occurrence — boilerplate removal drops ALL occurrences once a line
    * crosses the document-frequency threshold: a footer on 10k pages is
    * noise on every one of them, including the first. Documents whose
    * every line is boilerplate survive with `cleaned_text = ""` (callers
    * chain a length filter to drop them).
    *
    * `sep` is a Java regex for SPLITTING (default newline); surviving
    * lines are rejoined with `joinSep` taken LITERALLY — it defaults to
    * `sep`, which is correct whenever sep is a literal separator, but a
    * non-literal regex (e.g. `\r?\n`) MUST pass an explicit joinSep or
    * every cleaned document would have the raw pattern characters
    * spliced between its lines.
    *
    * 100 TB shape: two wide stages — a line-frequency aggregate (map-side
    * partial `countDistinct` on the line hash-partitions only distinct
    * (line, doc) pairs) and the per-doc reassembly groupBy. The
    * boilerplate set itself is threshold-filtered and usually tiny
    * (only lines repeated across >= minDocs docs survive the HAVING), so
    * by default it broadcasts into the anti-style NULL-mark join — the
    * corpus is never shuffled on the line key for the marking pass. At
    * LOW minDocs on a big corpus the "boilerplate" set is any common
    * sentence and no longer tiny: pass broadcastLines=false to fall back
    * to a shuffle join instead of OOMing the broadcast (the same opt-out
    * contaminationReport gives its eval side).
    */
  def removeBoilerplate(corpus: DataFrame, idCol: String, textCol: String,
                        minDocs: Int, sep: String = "\n",
                        joinSep: Option[String] = None,
                        broadcastLines: Boolean = true): DataFrame = {
    require(minDocs >= 2, s"minDocs must be >= 2, got $minDocs")
    val rejoin = joinSep.getOrElse(sep)
    val lines = corpus
      .where(length(col(textCol)) > 0)
      .select(col(idCol), posexplode(split(col(textCol), sep)).as(Seq("pos", "line")))
    val boiler = lines.groupBy("line")
      .agg(countDistinct(col(idCol)).as("__docs"))
      .where(col("__docs") >= minDocs)
      .select(col("line"), lit(1).as("__bp"))
    val cleaned = lines
      .join(if (broadcastLines) broadcast(boiler) else boiler, Seq("line"), "left")
      .groupBy(idCol)
      .agg(
        sum(when(col("__bp").isNull, 1L).otherwise(0L)).as("n_lines_kept"),
        sum(when(col("__bp").isNotNull, 1L).otherwise(0L)).as("n_lines_dropped"),
        array_join(transform(
          array_sort(collect_list(when(col("__bp").isNull, struct(col("pos"), col("line"))))),
          x => x.getField("line")), rejoin).as("cleaned_text"))
    // empty/null-text docs never reach the line explode, but a CLEANING
    // operator must not delete rows it was never asked to drop (review
    // r9): they come back with the same shape the documented
    // fully-boilerplate case gets — zero lines, empty cleaned_text. The
    // rejoin moves ids only.
    corpus.select(col(idCol))
      .join(cleaned, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_lines_kept"), lit(0L)).as("n_lines_kept"),
        coalesce(col("n_lines_dropped"), lit(0L)).as("n_lines_dropped"),
        coalesce(col("cleaned_text"), lit("")).as("cleaned_text"))
  }

  /** E2i (cluster canonicalization): given near-dup edges and a per-member
    * quality score, keep exactly one representative per transitive
    * cluster — the member with the highest score, ties broken by minimal
    * id. The standard final step of fuzzy dedup: [[nearDupPairs]] finds
    * the edges, [[connectedComponents]] closes them transitively, and the
    * curator keeps the best-quality member of each cluster rather than an
    * arbitrary one.
    *
    * `members` must carry one row per node id appearing in `pairs`
    * (members absent from it silently drop — same contract as a lookup
    * join). Returns (component, canonical_id, score, n_members).
    *
    * 100 TB shape: inherits [[connectedComponents]]'s edge-list-sized
    * iteration; the scoring join and the per-component argmax window both
    * hash on the component id — one shuffle each, sized by the MEMBER
    * list (cluster members only, not the corpus).
    */
  def canonicalPerCluster(pairs: DataFrame, members: DataFrame,
                          idCol: String, scoreCol: String): DataFrame = {
    val comp = connectedComponents(pairs)
    val scored = comp.join(
      members.select(col(idCol).as("id"), col(scoreCol).as("score")), "id")
    val best = Window.partitionBy("component")
      .orderBy(col("score").desc, col("id"))
    scored
      .withColumn("__rn", row_number().over(best))
      .withColumn("n_members", count(lit(1)).over(Window.partitionBy("component")))
      .where(col("__rn") === 1)
      .select(col("component"), col("id").as("canonical_id"), col("score"),
        col("n_members"))
  }
}
