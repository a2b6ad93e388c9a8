package graft.operators

import java.io.ByteArrayInputStream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.CountMinSketch

import graft.functions.TextFunctions

/** Count-min-sketch frequency estimation (the heavy-hitters companion to
  * the HLL++ distinct sketch already catalogued as a10_approx_distinct).
  *
  * 100 TB shape: the sketch aggregate is a single map-side-combinable
  * pass — each task folds its rows into a fixed `depth x width` counter
  * grid (a few hundred KB at eps = 1e-4), tasks merge grids pairwise, and
  * ONE grid reaches the driver regardless of corpus size or cardinality.
  * That is the whole point vs the exact path: exact heavy-hitters shuffles
  * the full distinct-key set; the sketch shuffles a constant. Estimates
  * are deterministic (fixed seed, addition is commutative) and one-sided:
  * never below the true count, above it by at most eps * N with
  * probability >= confidence.
  */
object Sketches {

  /** Build a count-min sketch over `colName` (string or integral column)
    * with the standard (eps, confidence) sizing. The returned sketch is a
    * driver-side object a few hundred KB large — the ONE deliberate
    * driver materialization here, same contract as a broadcast build.
    */
  def countMinSketchOf(df: DataFrame, colName: String, eps: Double = 1e-4,
                       confidence: Double = 0.99, seed: Int = 1): CountMinSketch = {
    require(eps > 0 && eps < 1, s"eps must be in (0, 1), got $eps")
    require(confidence > 0 && confidence < 1,
      s"confidence must be in (0, 1), got $confidence")
    // backtick-quote WITH backtick escaping: quoting alone still breaks on
    // legal backtick-bearing names and a crafted name could close the
    // identifier early and splice arbitrary SQL (review r9)
    val quoted = colName.replace("`", "``")
    val bytes = df
      .select(expr(s"count_min_sketch(`$quoted`, CAST($eps AS DOUBLE), " +
        s"CAST($confidence AS DOUBLE), $seed)").as("cms"))
      .head.getAs[Array[Byte]](0)
    CountMinSketch.readFrom(new ByteArrayInputStream(bytes))
  }

  /** Annotate `df` with the sketch's frequency estimate for the column —
    * the sketch broadcasts (task-serialized), the frame is never shuffled.
    * Dispatches on the column's TYPE: the sketch hashes strings and longs
    * differently, so querying an integral column through the string path
    * (which Spark's implicit UDF cast would silently do) returns
    * near-zero noise instead of the count — the lookup type must match
    * the build type (r8).
    */
  def withEstimate(df: DataFrame, colName: String, cms: CountMinSketch,
                   as: String): DataFrame = {
    val bcast = df.sparkSession.sparkContext.broadcast(cms)
    import org.apache.spark.sql.types._
    // backtick-quote like the paired builder countMinSketchOf: raw
    // col(name) parses dots as struct paths, so the build/lookup API pair
    // would disagree on which column names are legal (review r10)
    def c = col("`" + colName.replace("`", "``") + "`")
    val est = df.schema(colName).dataType match {
      case StringType =>
        udf((v: String) => if (v == null) 0L else bcast.value.estimateCount(v))
          .apply(c)
      case ByteType | ShortType | IntegerType | LongType =>
        udf((v: java.lang.Long) =>
          if (v == null) 0L else bcast.value.estimateCount(v.longValue()))
          .apply(c.cast("long"))
      case other => throw new IllegalArgumentException(
        s"withEstimate supports string/integral columns, got ${other.catalogString}")
    }
    df.withColumn(as, est)
  }

  /** KMV (k-minimum-values) signature per stratum: the `k` smallest
    * DISTINCT portable 60-bit hashes of the corpus's n-token shingles,
    * one (stratum, h) row each. The classic dataset-level overlap sketch
    * (Beyer et al., "On synopses for distinct-value estimation under
    * multiset operations", SIGMOD'07): because [[TextFunctions.hash60]]
    * is md5-derived, the signature — and therefore every estimate built
    * from it — is deterministic and replayable bit-for-bit by a DuckDB
    * oracle, unlike seeded-RNG sketches. 60 bits matter at corpus scale:
    * a 32-bit space saturates around 10^9-10^10 distinct shingles, at
    * which point every large stratum's k-minimum signature converges to
    * the same global minima and estimates bias toward 1.0.
    *
    * Strata whose documents yield no n-token shingles (every doc shorter
    * than n tokens) have an EMPTY signature and therefore no output rows —
    * and consequently no pairs in [[kmvJaccard]] (a Jaccard against an
    * empty set is 0/0, not 0).
    *
    * 100 TB shape: the corpus streams once (tokenize → shingle → hash,
    * all expression work); 8-byte digests move, never text, and the
    * dense_rank <= k filter compiles to a PARTIAL WindowGroupLimit below
    * the stratum exchange (pinned in PlanSpec), so the lone corpus-wide
    * shuffle carries only each task's local k smallest distinct hashes.
    * Output is `k x |strata|` rows: constant-size per stratum regardless
    * of corpus size, which is the entire point vs computing pairwise
    * overlap on raw shingle sets (corpus x corpus shuffle).
    */
  def kmvSignatures(corpus: DataFrame, strataCol: String, textCol: String,
                    n: Int, k: Int,
                    repartitionFirst: Boolean = true): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    require(k >= 1, s"k must be >= 1, got $k")
    // Dedup.shingleSet owns the shingling pipeline (and its two perf
    // traps: token projection before the shingle lambda, repartition of
    // single-split inputs); its id column is the stratum here.
    // repartitionFirst=false is the documented corpus-sized/well-split
    // opt-out — without plumbing it, the "corpus streams once" claim was
    // unreachable at scale (review r9)
    val sh = Dedup.shingleSet(corpus, strataCol, textCol, n, repartitionFirst)
      .select(col("doc_id").as("stratum"), TextFunctions.hash60(col("sh")).as("h"))
    // dense_rank <= k over the RAW (duplicated) hash stream, dedup after:
    // dense_rank admits a map-side partial WindowGroupLimit (each task
    // keeps only its local k smallest DISTINCT values pre-shuffle — a
    // per-task k-smallest-distinct set provably covers the global one),
    // so the lone exchange moves ~tasks x k surviving rows instead of the
    // corpus's full distinct hash set. A distinct() + row_number
    // formulation reads the same but costs two full-width shuffles.
    val w = Window.partitionBy("stratum").orderBy("h")
    sh.withColumn("__rk", dense_rank().over(w))
      .where(col("__rk") <= k)
      .select("stratum", "h")
      .distinct()
  }

  /** Pairwise Jaccard estimates between strata from a [[kmvSignatures]]
    * table: for each stratum pair (a < b), take the k smallest hashes of
    * the UNION of the two signatures and count how many sit in BOTH —
    * the KMV estimator J ≈ |S_k(A ∪ B) ∩ A ∩ B| / min(k, |union|).
    * Exact (not an estimate) whenever a pair's union of distinct shingle
    * hashes fits within k — asserted as a law in OperatorsSpec.
    *
    * Returns (source_a, source_b, shared, denom, est_jaccard), one row
    * per unordered pair of strata PRESENT IN THE SIGNATURE, including
    * zero-overlap pairs (shared = 0). Strata absent from `sig` (empty
    * signature — see [[kmvSignatures]]) have no pairs here.
    *
    * 100 TB shape: operates ONLY on the signature table (`k x |strata|`
    * rows) — every join here is on frames that fit in one task; corpus
    * scale is paid once, in [[kmvSignatures]].
    *
    * `k` must be <= the k the signatures were built with: the KMV prefix
    * property makes any SMALLER k valid (the k smallest of a k'-minimum
    * signature are exact for k <= k'), but a LARGER k inflates `denom`
    * past the signature's resolution and biases every estimate low.
    * Callers that hold the build-time k (the catalog entries, the
    * [[graft.api]] verb) pass it through; when consuming a foreign
    * signature table, derive it as the max per-stratum row count.
    */
  def kmvJaccard(sigRaw: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    // the signature is structurally consumed four times below (strata
    // list x2, union sides x2) — pin the k x |strata|-row frame once
    // instead of re-running the corpus pipeline per consumer. pinEager
    // (r15): the consumers fan out into concurrent stages of one action,
    // which raced the lazy cache and re-ran the corpus pipeline per side.
    val sig = Pinned.pinEager(sigRaw)
    val strata = sig.select(col("stratum")).distinct()
    val prs = strata.select(col("stratum").as("source_a"))
      .crossJoin(strata.select(col("stratum").as("source_b")))
      .where(col("source_a") < col("source_b"))
    // a FOREIGN signature table may carry duplicate (stratum, h) rows; the
    // __c == 2 shared test below assumes distinctness, so enforce it here
    // rather than inflate/deflate the estimate silently (review r10).
    // kmvSignatures' own output is already distinct -- this is a no-op there.
    val sigD = sig.distinct()
    val ua = prs.join(sigD.withColumnRenamed("stratum", "source_a"), "source_a")
    val ub = prs.join(sigD.withColumnRenamed("stratum", "source_b"), "source_b")
    val u = ua.select("source_a", "source_b", "h")
      .union(ub.select("source_a", "source_b", "h"))
      .groupBy("source_a", "source_b", "h")
      .agg(count(lit(1)).as("__c"))
    val w = Window.partitionBy("source_a", "source_b").orderBy("h")
    val topk = u.withColumn("__rn", row_number().over(w)).where(col("__rn") <= k)
    // every pair has union rows (each stratum contributes >= 1 signature
    // hash), so zero-overlap pairs surface naturally with shared = 0
    topk.groupBy("source_a", "source_b")
      .agg(sum(when(col("__c") === 2, 1L).otherwise(0L)).as("shared"),
        count(lit(1)).as("denom"))
      .withColumn("est_jaccard",
        col("shared").cast("double") / col("denom").cast("double"))
  }
}
