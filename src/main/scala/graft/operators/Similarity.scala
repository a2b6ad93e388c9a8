package graft.operators

import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (SURVEY E3).
  *
  * Two paths, selected by scale:
  *  - exactTopK: brute-force cosine of a (small, broadcast) query set
  *    against the corpus — the corpus side streams through one scan, never
  *    shuffles; per-query top-k via window. Right answer for |Q| small.
  *  - lshTopK: random-hyperplane LSH — corpus and queries are bucketed by
  *    the sign-bit signature of K deterministic hyperplanes; candidates
  *    meet in a bucket equi-join (shuffle on the signature, per-bucket
  *    work only), then exact cosine re-ranks. This is the 100 TB path:
  *    cost ~ corpus_size + bucket_collisions, not |Q| x corpus.
  *    Hyperplanes are derived from md5 (portable, seed-free determinism).
  */
object Similarity {

  /** Fused native cosine (plans.CosineSimilarity): one primitive loop inside
    * whole-stage codegen vs the composed zip_with+aggregate form's three
    * generic array passes — same result bit-for-bit on finite float vectors,
    * measured severalfold faster on the reranking hot path where it runs per
    * candidate pair. Registry-independent construction (NativeColumns), so
    * it works under sessions without GraftExtensions.
    */
  private def cosine(a: Column, b: Column): Column = graft.plans.NativeColumns.cosine(a, b)

  /** Exact top-k cosine neighbors for each query vector.
    *
    * ID-SPACE CONTRACT (shared by [[lshTopK]]/[[ivfTopK]] and the PQ
    * paths): queries and corpus share ONE id space, and a candidate with
    * `n_id == q_id` is excluded as the SELF-match -- the self-query /
    * dedup convention every catalog entry uses. Queries drawn from a
    * DIFFERENT id space must be re-keyed first (e.g. negative ids), or a
    * query whose id coincidentally equals an unrelated corpus id silently
    * loses that vector from its results (review r10).
    */
  def exactTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val scored = corpus.join(broadcast(q), col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("n_id"),
        cosine(col("q_emb"), col("embedding")).as("cos_sim"))
    val w = Window.partitionBy("q_id").orderBy(col("cos_sim").desc, col("n_id"))
    scored.withColumn("rnk", row_number().over(w)).where(col("rnk") <= k)
  }

  /** ONE coarse-quantizer definition for [[ivfTopK]] and [[semDedup]]
    * (review r10: two verbatim copies could silently drift): a rough
    * KMeans over a deterministic hash sample -- recall/quality come from
    * nProbe / the threshold, not centroid polish, so random init + few
    * iterations suffice (the k-means|| init alone is several passes).
    * r15: the fit goes through [[KMeansFit]] (bit-identical centers to
    * the r14 ml.KMeans wrapper, minus its per-fit summary/transform
    * jobs) and assignment is the model's own `predict` broadcast into a
    * map pass — the identical findClosest rule ml's transform applied.
    * Returns (float centers, (vec_id, embedding, cell)).
    */
  private def coarseQuantizer(corpus: DataFrame, nCells: Int,
                              fitSampleFraction: Double, salt: String)
      : (Array[Array[Float]], DataFrame) = {
    val feat = corpus.select(col("vec_id"), col("embedding"),
      array_to_vector(col("embedding")).as("features"))
    val fitInput =
      feat.where(Sampling.hashSampleFraction(col("vec_id"), salt, fitSampleFraction))
    val model = KMeansFit.model(fitInput, "features", nCells, seed = 42)
    val bc = corpus.sparkSession.sparkContext.broadcast(model)
    val assign = udf((v: org.apache.spark.ml.linalg.Vector) =>
      bc.value.predict(org.apache.spark.mllib.linalg.Vectors.fromML(v)))
    (model.clusterCenters.map(_.toArray.map(_.toFloat)),
      feat.select(col("vec_id"), col("embedding"),
        assign(col("features")).as("cell")))
  }

  /** Deterministic pseudo-random hyperplane component in [-1, 1): plane `p`,
    * dimension `i`, derived from an md5 prefix — no RNG, no seed drift.
    * Computed driver-side so planes embed as literal arrays (a column-side
    * formulation would explode into dim x planes codegen terms per row).
    */
  private def planeComponent(p: Int, i: Int): Double = {
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(s"plane_${p}_$i".getBytes("UTF-8"))
    val h = digest.take(4).foldLeft(0L)((acc, b) => (acc << 8) | (b & 0xff))
    h.toDouble / 2147483648.0 - 1.0
  }

  /** Test seam: the parity spec reconstructs the pre-r15 composed
    * signature from the same plane components.
    */
  private[graft] def planeComponentForTest(p: Int, i: Int): Double =
    planeComponent(p, i)

  /** Sign-bit LSH signature under planes [p0, p0+numPlanes): one zip_with
    * dot product per plane against a literal plane vector.
    */
  def lshSignature(emb: org.apache.spark.sql.Column, dim: Int, numPlanes: Int,
                   p0: Int = 0) = {
    // 1L << p masks the shift count to 6 bits: plane 64 would silently
    // alias plane 0's bit and the summed signature would carry into wrong
    // positions — fail loudly instead of degrading recall (review r9)
    require(numPlanes >= 1 && numPlanes <= 63,
      s"numPlanes must be in [1, 63] (one signature bit per plane in a Long), got $numPlanes")
    // r15: one native accumulator node instead of numPlanes x dim literal
    // nodes — the composed tree's analysis/codegen dominated the LSH
    // entries' wall time (see plans.LshBits; bit-identical arithmetic,
    // parity pinned in PqEncodeSpec)
    val planes = Array.tabulate(numPlanes, dim)((p, i) => planeComponent(p0 + p, i))
    val bits = graft.plans.NativeColumns.lshBits(emb, planes)
    // a null or wrong-length embedding would null the dot and every bit
    // would fall to 0 -- ALL such rows co-bucket under signature 0 and the
    // bucket join degenerates toward the |Q| x corpus cross product this
    // scheme exists to avoid. Same fail-loudly posture as the numPlanes
    // guard (review r10).
    when(emb.isNull || size(emb) =!= dim,
      raise_error(concat(lit("lshSignature: embedding length "),
        coalesce(size(emb).cast("string"), lit("NULL")),
        lit(s" does not match dim=$dim - an all-zero signature would " +
          "co-bucket every mismatched row"))).cast("long"))
      .otherwise(bits)
  }

  /** ANN via multi-table random-hyperplane LSH + exact re-rank. Classic
    * (L tables) x (b bits) scheme: a neighbor is a candidate if it agrees
    * with the query on ALL b sign bits in ANY of the L tables; recall
    * 1-(1-(1-theta/pi)^b)^L rises with L at linear cost (each row emits L
    * bucket keys; the join shuffles on (table, bucket), per-bucket work
    * only — cost ~ corpus x L + collisions, never |Q| x corpus).
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              dim: Int = 64, bitsPerTable: Int = 4, numTables: Int = 5,
              broadcastQueries: Boolean = true): DataFrame = {
    // bucket frames carry IDS ONLY: the bucket join + cross-table distinct
    // are the hottest exchanges here, and dragging two dim-length float
    // arrays through them per candidate multiplies the shuffle payload
    // ~10x at D=64 — embeddings re-attach by equi-join afterwards, the
    // same carry-only-what-is-needed shape as rerankAdcShortlist (review r9)
    def withBuckets(df: DataFrame, idAs: String) = {
      val tables = (0 until numTables).map { t =>
        struct(lit(t).as("table"),
          lshSignature(col("embedding"), dim, bitsPerTable, t * bitsPerTable).as("sig"))
      }
      df.select(col("vec_id").as(idAs), explode(array(tables: _*)).as("tb"))
        .select(col(idAs), col("tb.table").as("table"), col("tb.sig").as("sig"))
    }
    val cand = withBuckets(corpus, "n_id")
      .join(withBuckets(queries, "q_id"), Seq("table", "sig"))
      .where(col("n_id") =!= col("q_id"))
      .select("q_id", "n_id").distinct()
    // broadcastQueries=false is the corpus-vs-corpus escape hatch (same
    // posture as decontaminate's broadcastHits): a large query set must
    // not be forced through a driver-side broadcast collect (advice r9)
    val qe0 = queries.select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val qe = if (broadcastQueries) broadcast(qe0) else qe0
    val ne = corpus.select(col("vec_id").as("n_id"), col("embedding").as("n_emb"))
    val scored = cand.join(qe, "q_id").join(ne, "n_id")
      .select(col("q_id"), col("n_id"), cosine(col("q_emb"), col("n_emb")).as("cos_sim"))
    val w = Window.partitionBy("q_id").orderBy(col("cos_sim").desc, col("n_id"))
    scored.withColumn("rnk", row_number().over(w)).where(col("rnk") <= k)
  }

  /** ANN via IVF (inverted-file) index: a KMeans coarse quantizer assigns
    * every corpus vector to one of `nCells` cells; each query probes its
    * `nProbe` nearest cells and exact-reranks only those vectors. At 100 TB
    * the assignment is one broadcast-scored scan (centroids are tiny), the
    * probe join shuffles on cell id, and per-query work is corpus/nCells x
    * nProbe.
    *
    * @param fitSampleFraction fraction of the corpus the quantizer fits on
    *        (deterministic hash sample, so the cells are reproducible).
    *        At 100 TB pass ~0.001-0.01: a coarse quantizer only needs the
    *        density shape, which a sample carries — recall comes from
    *        nProbe, not centroid polish (gate held at 10% fit in
    *        ScaleOpsSpec). Every corpus vector is still ASSIGNED to a cell;
    *        only the fit is sampled.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              nCells: Int = 16, nProbe: Int = 4,
              fitSampleFraction: Double = 1.0): DataFrame = {
    require(fitSampleFraction > 0.0 && fitSampleFraction <= 1.0,
      s"fitSampleFraction must be in (0, 1], got $fitSampleFraction")
    val spark = corpus.sparkSession
    import spark.implicits._
    val (centers, assigned0) = coarseQuantizer(corpus, nCells, fitSampleFraction, "ivf_fit")
    val assigned = assigned0
      .select(col("vec_id").as("n_id"), col("embedding").as("n_emb"), col("cell"))
    // tiny centroid table, broadcast against the query side
    val cents = centers.zipWithIndex
      .map { case (c, i) => (i, c.toSeq) }
      .toSeq.toDF("cell", "c_emb")
    val q = queries.select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val wCell = Window.partitionBy("q_id").orderBy(col("c_dist"), col("cell"))
    val probed = q.join(broadcast(cents))
      .withColumn("c_dist",
        aggregate(zip_with(col("q_emb"), col("c_emb"), (x, y) => {
          val dd = x.cast("double") - y.cast("double"); dd * dd
        }), lit(0.0), (a, v) => a + v))
      .withColumn("cr", row_number().over(wCell)).where(col("cr") <= nProbe)
      .select("q_id", "q_emb", "cell")
    val cand = probed.join(assigned, "cell").where(col("n_id") =!= col("q_id"))
      .select(col("q_id"), col("n_id"), cosine(col("q_emb"), col("n_emb")).as("cos_sim"))
    val w = Window.partitionBy("q_id").orderBy(col("cos_sim").desc, col("n_id"))
    cand.withColumn("rnk", row_number().over(w)).where(col("rnk") <= k)
  }

  /** Aggregate recall@k of an ANN result against the exact result over the
    * same query set: one row `(n_queries, recall_ok)` where `recall_ok` is
    * mean per-query recall >= `minMeanRecall`. The catalog's `e3_ann_*`
    * entries append this so every CORRECTNESS round RECORDS the ANN quality
    * number as a hash-checked oracle row (VERDICT r5 #3) instead of burying
    * it in a test log: the oracle pins `(|Q|, true)`, so a recall
    * regression below the floor breaks the round's correctness gate, not
    * just a spec. A boolean against a floor — not the raw mean — is pinned
    * because fixtures regenerate between rounds and the exact mean moves
    * with them; the floor carries a measured >= 0.10 margin per entry
    * (0.90-0.98 mean recall at sf0.01 vs the 0.8 floor).
    *
    * Queries with NO exact neighbors (corpus of 1) are absent from both
    * sides and don't count; recall of an ANN path returning zero rows for
    * a query counts as 0 via the left join.
    */
  def recallSummary(ann: DataFrame, exact: DataFrame,
                    minMeanRecall: Double): DataFrame = {
    val e = exact.select(col("q_id"), col("n_id"))
    // distinct BEFORE counting: an ANN path that returns the same neighbor
    // twice (the duplicated-code defect the append path guards against)
    // must not count it as two hits — inflated recall would keep this
    // gate green through a real regression (review r9)
    val hits = ann.select(col("q_id"), col("n_id")).distinct()
      .join(e, Seq("q_id", "n_id"), "left_semi")
      .groupBy("q_id").agg(count(lit(1)).as("hits"))
    e.groupBy("q_id").agg(count(lit(1)).as("k_actual"))
      .join(hits, Seq("q_id"), "left")
      .select(col("q_id"),
        (coalesce(col("hits"), lit(0L)).cast("double") /
          col("k_actual").cast("double")).as("recall"))
      .agg(count(lit(1)).as("n_queries"),
        (avg(col("recall")) >= minMeanRecall).as("recall_ok"))
  }

  /** SemDeDup-style semantic deduplication (Abbas et al. 2023, public
    * arXiv:2303.09540 recipe): cluster the embedding space with a coarse
    * KMeans, compute cosine pairs ONLY within each cluster, and drop every
    * vector that has a kept lower-id neighbor with cosine >= `threshold`.
    * The keep rule is component-min: [[Dedup.connectedComponents]] closes
    * the above-threshold edge graph transitively and each component keeps
    * exactly its min-id member. Note this is STRICTER than a greedy
    * sweep against surviving neighbors: in a chain A~B~C where cos(A,C)
    * is below threshold, C drops too (its witness B was itself dropped),
    * because transitive chains are treated as one near-duplicate group —
    * deterministic regardless of partitioning.
    *
    * Returns (id, cell, component, kept, witness_cos) — one row per input
    * vector; `witness_cos` is the max above-threshold cosine among the
    * vector's within-cell edges (null when it has none — every kept
    * singleton), so a dropped row carries the evidence that justified
    * dropping it and [[semDedupInvariants]] can gate on it without
    * recomputing the quadratic edge pass.
    *
    * 100 TB shape: the quadratic term is per-CELL, not per-corpus
    * (corpus/nCells average cell size; nCells scales with corpus so cells
    * stay bounded); the edge graph that feeds the component step holds
    * only above-threshold pairs (near-dups are rare by definition), so
    * the iterative min-label closure runs on edge-list-sized frames. The
    * KMeans fit samples via `fitSampleFraction` exactly like [[ivfTopK]].
    */
  def semDedup(corpus: DataFrame, threshold: Double,
               nCells: Int = 16, fitSampleFraction: Double = 1.0): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"threshold must be in (0, 1], got $threshold")
    require(fitSampleFraction > 0.0 && fitSampleFraction <= 1.0,
      s"fitSampleFraction must be in (0, 1], got $fitSampleFraction")
    val spark = corpus.sparkSession
    import spark.implicits._
    // pinEager (r15): both self-join sides of the edge pass read this in
    // concurrent stages of one action — a lazy persist was raced and the
    // assignment pipeline ran per side
    val assigned = Pinned.pinEager(coarseQuantizer(corpus, nCells, fitSampleFraction,
      "semdedup_fit")._2)
    val a = assigned.select(col("cell"), col("vec_id").as("a_id"), col("embedding").as("a_emb"))
    val b = assigned.select(col("cell"), col("vec_id").as("b_id"), col("embedding").as("b_emb"))
    // edges carry their cosine so the witness survives to the output —
    // pinned because both the component closure and the witness aggregate
    // read them (the quadratic per-cell pass must run once, not twice)
    val edges = Pinned.pinEager(
      a.join(b, "cell").where(col("a_id") < col("b_id"))
        .select(col("a_id"), col("b_id"),
          cosine(col("a_emb"), col("b_emb")).as("cos"))
        .where(col("cos") >= threshold))
    val comps = Dedup.connectedComponents(edges.select("a_id", "b_id"))
    val witness = edges.select(col("a_id").as("id"), col("cos"))
      .union(edges.select(col("b_id").as("id"), col("cos")))
      .groupBy("id").agg(max(col("cos")).as("witness_cos"))
    assigned.select(col("vec_id").as("id"), col("cell"))
      .join(comps, Seq("id"), "left")
      .join(witness, Seq("id"), "left")
      .select(col("id"), col("cell"),
        coalesce(col("component"), col("id")).as("component"),
        (coalesce(col("component"), col("id")) === col("id")).as("kept"),
        col("witness_cos"))
  }

  /** Partition-invariant invariants of a [[semDedup]] result as ONE
    * hash-checkable row `(n_vectors, invariants_ok)` — the same pattern
    * [[recallSummary]] gave the ANN entries (VERDICT r6 #7): the per-row
    * output is KMeans-clustered and correctly NOT golden-pinned, but these
    * properties hold for every valid run regardless of cell floats, so the
    * oracle can pin them:
    *  - every component keeps EXACTLY ONE member, and it is the component's
    *    min id (which is also the component label);
    *  - every dropped row carries an above-threshold witness cosine (it was
    *    dropped because of real evidence, not a closure bug).
    * A closure regression (two keepers, non-min keeper, evidence-free drop)
    * flips the boolean and breaks the round's correctness gate.
    */
  def semDedupInvariants(result: DataFrame, threshold: Double): DataFrame = {
    val r = Pinned.pin(result)
    val compOk = r.groupBy("component").agg(
        min(col("id")).as("min_id"),
        min(when(col("kept"), col("id"))).as("kept_id"),
        sum(when(col("kept"), lit(1L)).otherwise(lit(0L))).as("n_keep"))
      .agg(bool_and(col("n_keep") === 1 && col("kept_id") === col("min_id") &&
        col("min_id") === col("component")).as("comp_ok"))
    val rowOk = r.agg(
      count(lit(1)).as("n_vectors"),
      bool_and(col("kept") || (col("witness_cos").isNotNull &&
        col("witness_cos") >= threshold)).as("drop_ok"))
    // two 1-row frames; the cross join is a broadcast of one scalar row.
    // bool_and over ZERO rows is null — an empty result satisfies every
    // law vacuously, so null coalesces to true (both flags null together,
    // only on empty input)
    rowOk.crossJoin(compOk)
      .select(col("n_vectors"),
        coalesce(col("comp_ok") && col("drop_ok"), lit(true)).as("invariants_ok"))
  }
}
