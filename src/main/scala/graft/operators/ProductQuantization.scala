package graft.operators

import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization for embedding columns (SURVEY E3, the
  * memory-compression half of the ANN story; the classic IVFADC layout from
  * the public FAISS/Jégou et al. literature — companion to
  * [[Similarity.ivfTopK]], which prunes compute but still stores full
  * vectors).
  *
  * The embedding dimension D is split into `m` subspaces of D/m dims; each
  * subspace gets its own small KMeans codebook of `kCodes` centroids, and a
  * vector is stored as its m nearest-centroid ids — m bytes (kCodes <= 256)
  * instead of 4*D. At D=64/m=8 that is a 32x reduction of the bytes the ANN
  * scan reads: the asymmetric-distance (ADC) pass touches ONLY the code
  * table (per query: one (m x kCodes) lookup table built from the full-
  * precision query, then m array lookups per corpus row), and full vectors
  * are fetched just for the final exact re-rank of the few surviving
  * candidates — an equi-join on vec_id, never a second corpus scan pattern.
  *
  * Everything is expression-only (codegen-friendly): codebooks embed as
  * literal arrays exactly like [[Similarity.lshSignature]]'s hyperplanes,
  * so encode/ADC run inside whole-stage codegen with no UDF. At 100 TB the
  * codebooks are fit on a deterministic hash sample (a few MB of state —
  * m*kCodes*(D/m) floats — regardless of corpus size), the code table is
  * written once at ingest, and each query costs one scan of the 32x-smaller
  * code table plus rerank*k full-vector fetches.
  */
object ProductQuantization {

  /** Per-subspace codebooks: m x (<=kCodes) x (dim/m) floats, fit with one
    * small KMeans per subspace (seeded, random init — like the IVF coarse
    * quantizer, cell SHAPE is what matters; recall comes from re-ranking).
    * r15: each fit goes through [[KMeansFit]] — bit-identical centers to
    * the ml.KMeans wrapper used through r14, minus its per-fit summary/
    * transform jobs (see KMeansFit's scaladoc for why bit-identity is the
    * point).
    *
    * @param fitSampleFraction deterministic hash-sample fraction for the
    *        fit (the assignment/encode step still covers every vector).
    *        At 100 TB pass ~0.001: codebooks need the density shape only.
    */
  def fitCodebooks(corpus: DataFrame, dim: Int, m: Int, kCodes: Int,
                   fitSampleFraction: Double = 1.0): Array[Array[Array[Float]]] = {
    require(dim % m == 0, s"dim $dim not divisible by m=$m subspaces")
    require(kCodes >= 2 && kCodes <= 256,
      s"kCodes must be in [2, 256] (one byte per code), got $kCodes")
    require(fitSampleFraction > 0.0 && fitSampleFraction <= 1.0,
      s"fitSampleFraction must be in (0, 1], got $fitSampleFraction")
    val d = dim / m
    val fitInput = corpus
      .where(Sampling.hashSampleFraction(col("vec_id"), "pq_fit", fitSampleFraction))
      .select(col("embedding"))
    // one cached pass feeds all m sub-fits; each fit sees only its d-dim slice
    val sliced = fitInput.select(
      (0 until m).map(s =>
        array_to_vector(slice(col("embedding"), s * d + 1, d)).as(s"sub_$s")): _*)
      .cache()
    // the m sub-fits are independent (disjoint seeds, disjoint feature
    // columns, shared read-only cache), so they run as CONCURRENT Spark
    // jobs: each small KMeans leaves most of the cluster idle between its
    // stages, and sequential fits stack that idle time m times. Result is
    // bit-identical to the sequential loop — concurrency changes job
    // scheduling, never each fit's input or seed. The cache is
    // materialized once up front so the first wave doesn't race to build it.
    val pool = java.util.concurrent.Executors.newFixedThreadPool(math.min(m, 8))
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    try {
      sliced.count()
      val fits = (0 until m).map { s =>
        scala.concurrent.Future {
          KMeansFit.centers(sliced, s"sub_$s", kCodes, seed = 42 + s)
        }
      }
      scala.concurrent.Await.result(
        scala.concurrent.Future.sequence(fits),
        scala.concurrent.duration.Duration.Inf).toArray
    } finally {
      // shutdownNow, not shutdown: Future.sequence fails fast when one
      // sub-fit throws, and a plain shutdown would leave the sibling fits
      // recomputing against the just-unpersisted cache (review r9)
      pool.shutdownNow()
      sliced.unpersist()
    }
  }

  /** Sum of squared differences between a d-dim slice and a literal
    * centroid — the ADC table's per-query primitive (|Q| rows; the
    * corpus-side encode uses the fused native PqEncode instead).
    */
  private def sqDist(sub: Column, centroid: Array[Float]): Column =
    aggregate(
      zip_with(sub, array(centroid.map(c => lit(c.toDouble)): _*),
        (x, c) => { val diff = x.cast("double") - c; diff * diff }),
      lit(0.0), (acc, v) => acc + v)

  /** PQ codes for an embedding column: array<int> of length m, code s =
    * index of the nearest subspace-s centroid (first-min tie-break, so
    * encoding is deterministic under any partitioning). r15 optimization:
    * the composed slice/array_min/array_position form expanded to m x
    * kCodes interpreted aggregate(zip_with(...)) chains per row — the
    * native [[graft.plans.PqEncode]] expression is the same arithmetic as
    * one fused loop (semantics doc'd there; parity pinned in ScaleOpsSpec
    * and PqEncodeSpec).
    */
  def encode(emb: Column, codebooks: Array[Array[Array[Float]]]): Column =
    graft.plans.NativeColumns.pqEncode(emb, codebooks)

  /** Per-query ADC lookup table: array<array<double>>, entry [s][j] =
    * squared distance from the query's subspace-s slice to centroid j.
    * Built once per query row from the FULL-precision query vector — the
    * "asymmetric" in ADC (only the corpus side is quantized).
    */
  def adcTable(qEmb: Column, codebooks: Array[Array[Array[Float]]]): Column =
    // r15: the composed nested-array form embedded m x kCodes x d literal
    // nodes (1,024 at the catalog shape) and its per-probe ANALYSIS cost
    // outweighed the arithmetic — the native expression is one plan node,
    // bit-identical (see plans.AdcTable; parity pinned in PqEncodeSpec)
    graft.plans.NativeColumns.adcTable(qEmb, codebooks)

  /** The pre-r15 composed adcTable, kept as the parity oracle for the
    * native expression (PqEncodeSpec), like [[adcDistanceComposed]].
    */
  private[graft] def adcTableComposed(qEmb: Column,
                                      codebooks: Array[Array[Array[Float]]]): Column = {
    val d = codebooks(0)(0).length
    array(codebooks.zipWithIndex.map { case (book, s) =>
      val sub = slice(qEmb, s * d + 1, d)
      array(book.map(c => sqDist(sub, c)): _*)
    }: _*)
  }

  /** ADC distance of a code row against a query's lookup table:
    * sum_s table[s][code_s] — m array lookups, no arithmetic on vectors.
    * Delegates to the native codegen expression (plans.AdcDistance): the
    * ADC scan touches |Q| x corpus/nCells x nProbe rows, and the composed
    * higher-order-function form's interpreted lambdas + per-row array
    * allocation dominated the probe's cost at fixture scale (AnnSweep).
    */
  def adcDistance(codes: Column, table: Column): Column =
    graft.plans.NativeColumns.adcDistance(codes, table)

  /** The pre-round-6 composed form, kept as the parity oracle for the
    * native expression (PlansSpec asserts bitwise agreement, same policy
    * as graft_cosine / graft_tokenize).
    */
  def adcDistanceComposed(codes: Column, table: Column): Column =
    aggregate(
      zip_with(codes, table, (c, row) => element_at(row, c + 1)),
      lit(0.0), (acc, v) => acc + v)

  /** ANN top-k via PQ: encode corpus once, ADC-scan the code table per
    * query, exact-cosine re-rank the best `rerank`*k candidates.
    *
    * The scan side reads (vec_id, codes) only — at 100 TB the code table
    * is the persisted index (32x smaller than the vectors at D=64/m=8);
    * full embeddings are fetched by equi-join for just the re-rank set.
    * Compose with [[Similarity.ivfTopK]]'s cell assignment for IVF-PQ
    * (assign + encode in the same ingest pass; probe prunes cells, ADC
    * prunes bytes).
    */
  def pqTopK(corpus: DataFrame, queries: DataFrame, k: Int,
             dim: Int = 64, m: Int = 8, kCodes: Int = 16, rerank: Int = 4,
             fitSampleFraction: Double = 1.0): DataFrame = {
    val books = fitCodebooks(corpus, dim, m, kCodes, fitSampleFraction)
    // the compressed index: the only thing the per-query scan touches
    val codeTable = corpus.select(col("vec_id").as("n_id"),
      encode(col("embedding"), books).as("codes"))
    pqTopKPrebuilt(codeTable, corpus, queries, books, k, rerank)
  }

  /** The per-query (probe) half of [[pqTopK]] alone: ADC-scan a PRE-BUILT
    * code table, exact-cosine re-rank via equi-join. This is what a
    * production pipeline pays per query once codebooks + codes are
    * persisted at ingest ([[writeIndex]]); the catalog's `_probe` entry
    * times exactly this path.
    */
  def pqTopKPrebuilt(codeTable: DataFrame, corpus: DataFrame, queries: DataFrame,
                     codebooks: Array[Array[Array[Float]]], k: Int,
                     rerank: Int = 4): DataFrame = {
    val q = queries.select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
      adcTable(col("embedding"), codebooks).as("dtable"))
    val scored = codeTable.join(broadcast(q), col("n_id") =!= col("q_id"))
      .select(col("q_id"), col("n_id"),
        adcDistance(col("codes"), col("dtable")).as("adc_dist"))
    rerankAdcShortlist(scored, q, corpus, k, rerank)
  }

  /** Shared ADC-shortlist -> exact-rerank tail of BOTH probe paths
    * ([[pqTopKPrebuilt]] and the IVF-PQ probe — historically duplicated,
    * and the null-ordering fix had to land twice): rank candidates per
    * query by ADC distance with NULLS LAST (AdcDistance yields null for
    * corrupt/param-mismatched codes; ascending nulls-FIRST would rank
    * exactly those at the top), cut to k*rerank, then exact-cosine
    * re-rank against full vectors (equi-join on id, never a rescan).
    *
    * The shortlist carries ONLY (q_id, n_id, adc_dist) through the
    * per-query ranking exchange; q_emb re-joins from the tiny broadcast
    * query table AFTER the cut — previously both paths dragged the query
    * vector (~10x the bytes at D=64) onto every candidate row of the
    * hottest shuffle in the module (review r8).
    */
  private def rerankAdcShortlist(scored: DataFrame, q: DataFrame,
                                 corpus: DataFrame, k: Int, rerank: Int): DataFrame = {
    val wAdc = Window.partitionBy("q_id")
      .orderBy(col("adc_dist").asc_nulls_last, col("n_id"))
    val shortlist = scored
      .withColumn("ar", row_number().over(wAdc)).where(col("ar") <= k * rerank)
      .select("q_id", "n_id")
    val full = corpus.select(col("vec_id").as("n_id"), col("embedding").as("n_emb"))
    val w = Window.partitionBy("q_id").orderBy(col("cos_sim").desc, col("n_id"))
    shortlist
      .join(broadcast(q.select(col("q_id"), col("q_emb"))), "q_id")
      .join(full, "n_id")
      .select(col("q_id"), col("n_id"),
        graft.plans.NativeColumns.cosine(col("q_emb"), col("n_emb")).as("cos_sim"))
      .withColumn("rnk", row_number().over(w)).where(col("rnk") <= k)
  }

  /** Persist the PQ index (the one-time ingest cost): codebooks as a tiny
    * (s, j, centroid) parquet, the code table as (n_id, codes) parquet —
    * 32x smaller than the vectors at D=64/m=8, and the ONLY thing the
    * per-query ADC scan reads back. Returns the fitted codebooks so a
    * build-and-query caller skips the read-back.
    */
  def writeIndex(corpus: DataFrame, dir: String, dim: Int = 64, m: Int = 8,
                 kCodes: Int = 16,
                 fitSampleFraction: Double = 1.0): Array[Array[Array[Float]]] = {
    invalidateManifest(corpus.sparkSession, dir)
    val books = fitCodebooks(corpus, dim, m, kCodes, fitSampleFraction)
    writeCodebooks(corpus.sparkSession, books, s"$dir/codebooks")
    corpus.select(col("vec_id").as("n_id"), encode(col("embedding"), books).as("codes"))
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(s"$dir/codes")
    writeManifest(corpus.sparkSession, dir,
      pqParams(dim, m, kCodes, fitSampleFraction))
    books
  }

  /** Build-parameter manifests: every persisted index carries a one-file
    * (name, value) parquet written LAST (after codes) and deleted FIRST
    * on any rebuild, so a probe can detect a directory left behind by a
    * run with different parameters — or a build that died at any point,
    * including mid-overwrite of a previously valid index — and rebuild
    * instead of silently probing a stale index (ADVICE r5). A missing or
    * unreadable manifest (including any pre-manifest index) reads as a
    * mismatch.
    */
  private def pqParams(dim: Int, m: Int, kCodes: Int, fit: Double) =
    Map("dim" -> dim.toDouble, "m" -> m.toDouble, "kCodes" -> kCodes.toDouble,
      "fitSampleFraction" -> fit)

  /** Delete `dir`/params before touching any index file: the manifest is
    * a COMPLETION marker, so a rebuild over an existing same-params index
    * must not leave the old manifest validating half-overwritten codes if
    * the build dies mid-write.
    */
  private def invalidateManifest(spark: org.apache.spark.sql.SparkSession,
                                 dir: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/params")
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
  }

  private def writeManifest(spark: org.apache.spark.sql.SparkSession,
                            dir: String, params: Map[String, Double]): Unit = {
    import spark.implicits._
    params.toSeq.sortBy(_._1).toDF("name", "value")
      .coalesce(1)
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(s"$dir/params")
  }

  private def manifestMatches(spark: org.apache.spark.sql.SparkSession,
                              dir: String, params: Map[String, Double]): Boolean =
    try {
      spark.read.parquet(s"$dir/params").collect()
        .map(r => r.getString(0) -> r.getDouble(1)).toMap == params
    } catch { // NonFatal only: an OOM/VM error must surface, not silently
      // read as "stale" and trigger a rebuild on a distressed JVM (r9)
      case scala.util.control.NonFatal(_) => false }

  /** True iff a [[writeIndex]] PQ index at `dir` is present AND was built
    * with exactly these parameters — the `_probe` staleness gate.
    */
  def pqIndexMatches(spark: org.apache.spark.sql.SparkSession, dir: String,
                     dim: Int = 64, m: Int = 8, kCodes: Int = 16,
                     fitSampleFraction: Double = 1.0): Boolean =
    manifestMatches(spark, dir, pqParams(dim, m, kCodes, fitSampleFraction))

  /** True iff a [[writeIvfPqIndex]] index at `dir` is present AND was
    * built with exactly these parameters — the `_probe` staleness gate.
    */
  def ivfPqIndexMatches(spark: org.apache.spark.sql.SparkSession, dir: String,
                        nCells: Int = 16, dim: Int = 64, m: Int = 8,
                        kCodes: Int = 16, fitSampleFraction: Double = 1.0): Boolean =
    manifestMatches(spark, dir,
      pqParams(dim, m, kCodes, fitSampleFraction) + ("nCells" -> nCells.toDouble))

  /** True iff the stored code table covers exactly `expected` vectors — a
    * cheap (parquet footer metadata) staleness probe complementing the
    * params manifest. The manifest sees build PARAMETERS only; an index
    * stored outside the fixture dir (IndexStore roots under tmpdir)
    * survives a fixture REGENERATION with matching params and would be
    * silently probed against data it no longer describes (the round-7
    * AnnSweep incident: a regenerated corpus read 0.44 recall against a
    * 0.8-green stale gate). A count mismatch catches regeneration that
    * changes cardinality; same-cardinality drift is caught downstream by
    * the recall-floor gates every probe entry emits.
    */
  def indexCovers(spark: org.apache.spark.sql.SparkSession, dir: String,
                  expected: Long): Boolean =
    try spark.read.parquet(s"$dir/codes").count() == expected
    catch { case scala.util.control.NonFatal(_) => false }

  /** Read back [[writeIndex]]'s codebooks (driver-side: m*kCodes rows). */
  def readCodebooks(spark: org.apache.spark.sql.SparkSession,
                    dir: String): Array[Array[Array[Float]]] =
    spark.read.parquet(s"$dir/codebooks").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Float](2).toArray))
      .groupBy(_._1).toSeq.sortBy(_._1)
      .map(_._2.sortBy(_._2).map(_._3))
      .toArray

  /** IVF-PQ (the classic IVFADC composition, public FAISS/Jégou et al.
    * layout): a KMeans coarse quantizer prunes CELLS (each query touches
    * corpus/nCells x nProbe vectors) and product quantization prunes BYTES
    * within them (the scan reads m-byte codes, not 4*dim-byte vectors).
    * Codes quantize the RESIDUAL vector - cell centroid — residuals
    * cluster far tighter than raw vectors, so the same kCodes buys more
    * precision — and the ADC table is rebuilt per (query, probed cell)
    * from the query's residual against that cell.
    *
    * At 100 TB: assignment + encoding happen once at ingest (cell id +
    * codes persisted next to vec_id); a query broadcasts against the tiny
    * centroid table, probes nProbe cells (partition-prunable when the code
    * table is written partitioned by cell), ADC-scans only those cells'
    * codes, and fetches full vectors for the rerank set by equi-join.
    * Recall is gated vs exact top-k in OperatorsSpec (≥0.8, like the
    * other ANN paths).
    */
  def ivfPqTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                nCells: Int = 16, nProbe: Int = 4,
                dim: Int = 64, m: Int = 8, kCodes: Int = 16, rerank: Int = 4,
                fitSampleFraction: Double = 1.0): DataFrame = {
    val (codeTable, cents, books) =
      buildIvfPq(corpus, nCells, dim, m, kCodes, fitSampleFraction)
    ivfPqProbePrebuilt(codeTable, cents, books, corpus, queries, k, nProbe, rerank)
  }

  /** Ingest half shared by [[ivfPqTopK]] (inline) and [[writeIvfPqIndex]]
    * (persisted) — ONE implementation so the build recipe (seed, init,
    * sampling salt, residual arithmetic) cannot drift between the two and
    * silently break the stored-probe-equals-inline invariant
    * (ScaleOpsSpec). The assigned frame is pinned: fitCodebooks and the
    * code-table projection both consume the corpus-wide
    * transform+broadcast-join+residual pipeline.
    */
  private def buildIvfPq(corpus: DataFrame, nCells: Int, dim: Int, m: Int,
                         kCodes: Int, fitSampleFraction: Double)
      : (DataFrame, DataFrame, Array[Array[Array[Float]]]) = {
    require(fitSampleFraction > 0.0 && fitSampleFraction <= 1.0,
      s"fitSampleFraction must be in (0, 1], got $fitSampleFraction")
    val spark = corpus.sparkSession
    import spark.implicits._
    val feat = corpus.select(col("vec_id"), col("embedding"),
      array_to_vector(col("embedding")).as("features"))
    val fitInput =
      feat.where(Sampling.hashSampleFraction(col("vec_id"), "ivf_fit", fitSampleFraction))
    // r15: KMeansFit = bit-identical centers to the r14 ml.KMeans fit,
    // minus the wrapper's summary/transform jobs
    val coarse = KMeansFit.centers(fitInput, "features", nCells, seed = 42)
    val cents = coarse.zipWithIndex
      .map { case (c, i) => (i, c.toSeq) }
      .toSeq.toDF("cell", "c_emb")
    // assignment goes through the SAME float-centroid rule appends use
    // (withAssignedCell), NOT the model's double-precision transform: the
    // persisted cells table is the single source of truth for which cell a
    // vector lives in, so build-time and append-time codes agree bit-exactly
    val assigned = Pinned.pin(
      withAssignedCell(corpus.select(col("vec_id"), col("embedding")), cents)
        .select(col("vec_id").as("n_id"), col("embedding").as("n_emb"), col("cell"))
        .join(broadcast(cents), "cell")
        .withColumn("res",
          zip_with(col("n_emb"), col("c_emb"), (x, c) => x - c)))
    val residuals = assigned.select(col("n_id").as("vec_id"), col("res").as("embedding"))
    val books = fitCodebooks(residuals, dim, m, kCodes, fitSampleFraction)
    val codeTable = assigned.select(col("cell"), col("n_id"),
      encode(col("res"), books).as("codes"))
    (codeTable, cents, books)
  }

  /** Persist the IVF-PQ index (the one-time ingest cost): cell centroids
    * (`dir/cells`, nCells rows), residual codebooks (`dir/codebooks`,
    * same layout as [[writeIndex]]) and the code table written
    * PARTITIONED BY cell (`dir/codes`) so a probe's nProbe cell filter
    * prunes at the directory level and the ADC scan never opens the other
    * nCells - nProbe partitions' files.
    */
  def writeIvfPqIndex(corpus: DataFrame, dir: String,
                      nCells: Int = 16, dim: Int = 64, m: Int = 8,
                      kCodes: Int = 16, fitSampleFraction: Double = 1.0): Unit = {
    invalidateManifest(corpus.sparkSession, dir)
    val (codeTable, cents, books) =
      buildIvfPq(corpus, nCells, dim, m, kCodes, fitSampleFraction)
    val spark = corpus.sparkSession
    import spark.implicits._
    cents.coalesce(1)
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(s"$dir/cells")
    writeCodebooks(spark, books, s"$dir/codebooks")
    // align write tasks to cells before partitionBy: without it every task
    // holds rows of every cell and the committer fans out tasks x nCells
    // tiny files (1024 at fixture scale; at production nCells it is the
    // classic small-files explosion). One exchange on the cell id makes it
    // ~one file per cell, and the probe's directory-pruned scan opens one
    // file instead of task-count shards.
    codeTable.repartition(col("cell")).write.partitionBy("cell")
      .mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(s"$dir/codes")
    writeManifest(spark, dir,
      pqParams(dim, m, kCodes, fitSampleFraction) + ("nCells" -> nCells.toDouble))
  }

  /** Persist codebooks in the layout [[readCodebooks]] reads — shared by
    * [[writeIndex]] and [[writeIvfPqIndex]].
    */
  private def writeCodebooks(spark: org.apache.spark.sql.SparkSession,
                             books: Array[Array[Array[Float]]], path: String): Unit = {
    import spark.implicits._
    books.zipWithIndex.flatMap { case (book, s) =>
      book.zipWithIndex.map { case (c, j) => (s, j, c.toSeq) }
    }.toSeq.toDF("s", "j", "centroid")
      .coalesce(1) // m*kCodes rows — one file, not 32 shards
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(path)
  }

  /** Nearest-cell assignment against the persisted FLOAT centroid table —
    * the ONE assignment rule shared by [[buildIvfPq]] and
    * [[encodeAgainstIvfPq]], so build-time and append-time codes are
    * bit-compatible by construction (a build assigning with the KMeans
    * model's double-precision centers while appends assign with the
    * float32 stored table could flip near-boundary vectors between the
    * two ingest paths). Map-only: the centroid table broadcasts into a
    * UDF that scans all cells per row (sanctioned broadcast-state UDF —
    * an explode-to-nCells + window argmin would shuffle |rows| x nCells,
    * a 10^3x blowup at production nCells); ties break to the lowest cell.
    */
  private def withAssignedCell(df: DataFrame, cents: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val centArr: Array[(Int, Array[Float])] = cents.collect()
      .map(r => r.getInt(0) -> r.getSeq[Float](1).toArray).sortBy(_._1)
    val bc = spark.sparkContext.broadcast(centArr)
    val d = centArr.head._2.length
    // degrade, don't crash (the module's null policy, see AdcDistance):
    // a null, mis-sized, null-slotted, or NaN-slotted embedding cannot be
    // assigned a meaningful cell — dropping it keeps the row un-indexed,
    // while letting it through would either NPE the assign UDF (whole
    // embedding null), unbox a null slot as 0.0f and assign a cell from
    // wrong arithmetic while encode() emits a null code (a permanently
    // unretrievable stored row — review r9), or rank garbage
    val indexable = df.where(col("embedding").isNotNull &&
      size(col("embedding")) === d &&
      !exists(col("embedding"), e => e.isNull || isnan(e)))
    val assign = udf((emb: Seq[Float]) => {
      var best = -1
      var bestD = Double.MaxValue
      for ((cell, c) <- bc.value) {
        var dsum = 0.0
        var i = 0
        while (i < c.length) {
          val dd = emb(i).toDouble - c(i); dsum += dd * dd; i += 1
        }
        if (dsum < bestD) { bestD = dsum; best = cell } // first (lowest) cell wins ties
      }
      best
    })
    indexable.withColumn("cell", assign(col("embedding")))
  }

  /** Assign + residual-encode a batch against EXISTING IVF-PQ artifacts
    * (no refit) — the encode half of [[appendToIvfPqIndex]], exposed so
    * the append law (append(A,B)'s stored codes ≡ encoding A∪B against
    * the same artifacts) is directly testable. Assignment and residuals
    * both use the stored float centroids via [[withAssignedCell]] — the
    * identical arithmetic the build path applies, so the law holds
    * bit-exactly across ingest paths (cross-path equality pinned in
    * OperatorsSpec).
    */
  def encodeAgainstIvfPq(batch: DataFrame, cents: DataFrame,
                         books: Array[Array[Array[Float]]]): DataFrame =
    withAssignedCell(batch.select(col("vec_id"), col("embedding")), cents)
      .join(broadcast(cents), "cell")
      .withColumn("res", zip_with(col("embedding"), col("c_emb"), (x, c) => x - c))
      .select(col("cell"), col("vec_id").as("n_id"), encode(col("res"), books).as("codes"))

  /** Incremental ingest into a persisted [[writeIvfPqIndex]]: encode a new
    * batch against the EXISTING cells + codebooks (never refits), append
    * the codes partitioned-by-cell, and re-stamp the manifest. The
    * continual-ingest twin of the dedup side's stored-band probe: corpus
    * growth costs one batch-sized encode pass, not an index rebuild.
    * RETRY-IDEMPOTENT: vec_ids already present in the stored codes are
    * skipped via an anti-join (one id-column scan per append), so an
    * at-least-once orchestrator re-running a completed append cannot
    * double-write codes. Rows whose embedding is null or mis-sized are
    * dropped (un-indexable — see withAssignedCell) rather than killing
    * the append after the manifest invalidation.
    *
    * Manifest discipline matches [[writeIvfPqIndex]]: the params manifest
    * is deleted BEFORE the append and rewritten after, so an append that
    * dies mid-write leaves a manifest-less (= invalid, rebuild-on-probe)
    * index rather than a silently half-appended one. Refuses (IllegalState)
    * when no valid same-params index exists — appending into a mismatched
    * or half-built index would mix incompatible codes.
    *
    * Drift-refit policy: the codebooks stay frozen at build time, so a
    * batch whose distribution has drifted from the build corpus encodes
    * with higher quantization error (recall erodes, never corrupts —
    * the exact re-rank still sees full vectors). Callers monitoring drift
    * should periodically rebuild with [[writeIvfPqIndex]]; the classic
    * IVFADC deployments do exactly this (index rebuilds are scheduled,
    * appends are continuous).
    */
  def appendToIvfPqIndex(batch: DataFrame, dir: String,
                         nCells: Int = 16, dim: Int = 64, m: Int = 8,
                         kCodes: Int = 16, fitSampleFraction: Double = 1.0): Unit = {
    val spark = batch.sparkSession
    if (!ivfPqIndexMatches(spark, dir, nCells, dim, m, kCodes, fitSampleFraction))
      throw new IllegalStateException(
        s"appendToIvfPqIndex: no valid IVF-PQ index with these parameters at $dir — " +
          "build with writeIvfPqIndex first (append never refits)")
    val cents = spark.read.parquet(s"$dir/cells")
    val books = readCodebooks(spark, dir)
    // retry idempotence: vec_ids already present in the stored codes are
    // skipped — a re-run of an append that actually completed (orchestrator
    // timeout, at-least-once scheduling) must not double-write codes, or
    // the probe would return the same n_id twice in a top-k and displace a
    // genuine neighbor. Cost: one id-column scan of the code table per
    // append (column-pruned; the codes bytes are never read).
    // config-mismatch tripwire BEFORE the manifest is invalidated: the
    // degrade-don't-crash filter drops stray corrupt rows silently by
    // policy, but a batch in which NOT ONE row is indexable (dim mismatch
    // after an upstream schema change) is a misconfiguration — returning
    // success while permanently skipping the whole ingest batch would be
    // silent data loss (review r9). Judged on the batch as handed in, not
    // the post-anti-join remainder: a retried append legitimately leaves
    // only its stray corrupt rows fresh.
    val (nBatch, nIndexable) = batch.agg(count(lit(1)),
      count(when(col("embedding").isNotNull &&
        size(col("embedding")) === dim &&
        !exists(col("embedding"), e => e.isNull || isnan(e)), 1)))
      .head() match { case r => (r.getLong(0), r.getLong(1)) }
    if (nBatch > 0 && nIndexable == 0)
      throw new IllegalStateException(
        s"appendToIvfPqIndex: none of the $nBatch batch rows are " +
          s"indexable at dim=$dim — the batch schema no longer matches the " +
          "stored index (wrong embedding width, or all-null/NaN embeddings); " +
          "refusing rather than silently skipping the whole batch")
    val existing = spark.read.parquet(s"$dir/codes").select(col("n_id").as("vec_id"))
    val fresh = batch.join(existing, Seq("vec_id"), "left_anti")
    invalidateManifest(spark, dir)
    encodeAgainstIvfPq(fresh, cents, books)
      .repartition(col("cell")) // same task-to-cell alignment as the build path
      .write.partitionBy("cell")
      .mode(org.apache.spark.sql.SaveMode.Append).parquet(s"$dir/codes")
    writeManifest(spark, dir,
      pqParams(dim, m, kCodes, fitSampleFraction) + ("nCells" -> nCells.toDouble))
  }

  /** Maintenance companion to [[appendToIvfPqIndex]]: every append lands one
    * more file set per touched cell leaf, so a long-running continual-ingest
    * index accumulates small files exactly where probes read (the nProbe
    * pruned cells). Compacts each `cell=…` leaf of `dir/codes` in place via
    * [[graft.sources.Sink.compactPartitions]] — content-preserving and hive
    * layout kept, so probe-side directory pruning, the params manifest, and
    * the [[indexCovers]] row-count staleness probe are all unaffected
    * (compaction changes file boundaries, not rows). Run it BETWEEN ingest
    * cycles, not concurrent with an in-flight [[appendToIvfPqIndex]] (which
    * invalidates the manifest until it completes — the same single-writer
    * discipline the append path already requires). Returns
    * leaf -> (filesBefore, filesAfter).
    */
  def compactIvfPqCodes(spark: org.apache.spark.sql.SparkSession, dir: String,
                        targetFileBytes: Long = 128L << 20): Map[String, (Int, Int)] =
    graft.sources.Sink.compactPartitions(spark, s"$dir/codes", targetFileBytes)

  /** Probe a persisted [[writeIvfPqIndex]] — the recurring per-query
    * production cost: read centroids + codebooks (driver-side, tiny),
    * probe nProbe cells against the partition-pruned code table, exact
    * re-rank via equi-join on the survivors.
    */
  def ivfPqProbe(spark: org.apache.spark.sql.SparkSession, dir: String,
                 corpus: DataFrame, queries: DataFrame, k: Int,
                 nProbe: Int = 4, rerank: Int = 4): DataFrame = {
    val cents = spark.read.parquet(s"$dir/cells")
    val books = readCodebooks(spark, dir)
    val codeTable = spark.read.parquet(s"$dir/codes")
      .select(col("cell"), col("n_id"), col("codes"))
    ivfPqProbePrebuilt(codeTable, cents, books, corpus, queries, k, nProbe, rerank)
  }

  /** Query half shared by [[ivfPqTopK]] (inline build) and [[ivfPqProbe]]
    * (stored index): probe nProbe nearest cells, ADC against the per-cell
    * residual code table, exact re-rank of the union of survivors.
    */
  private def ivfPqProbePrebuilt(codeTable: DataFrame, cents: DataFrame,
                                 books: Array[Array[Array[Float]]],
                                 corpus: DataFrame, queries: DataFrame,
                                 k: Int, nProbe: Int, rerank: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val wCell = Window.partitionBy("q_id").orderBy(col("c_dist"), col("cell"))
    val probed = q.join(broadcast(cents))
      .withColumn("c_dist",
        aggregate(zip_with(col("q_emb"), col("c_emb"), (x, y) => {
          val dd = x.cast("double") - y.cast("double"); dd * dd
        }), lit(0.0), (a, v) => a + v))
      .withColumn("cr", row_number().over(wCell)).where(col("cr") <= nProbe)
      .withColumn("q_res", zip_with(col("q_emb"), col("c_emb"), (x, c) => x - c))
      .select(col("q_id"), col("cell"),
        adcTable(col("q_res"), books).as("dtable"))
    val scored = codeTable.join(broadcast(probed), Seq("cell"))
      .where(col("n_id") =!= col("q_id"))
      .select(col("q_id"), col("n_id"),
        adcDistance(col("codes"), col("dtable")).as("adc_dist"))
    rerankAdcShortlist(scored, q, corpus, k, rerank)
  }
}
