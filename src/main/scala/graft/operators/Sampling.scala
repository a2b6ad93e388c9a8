package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions.hash32

/** Deterministic, engine-portable "randomness" (SURVEY §7.3 — the O2-O4
  * sampling surface of chapter1/SparkRDDAPITest.scala:39 and
  * chapter3/MNISTAnomalyDetector.java:71-76, made reproducible).
  *
  * Spark's rand(seed) / sample(seed) / randomSplit(seed) are per-partition
  * pseudo-random streams: which rows land in the sample depends on the
  * partition layout, so results change under repartitioning and cannot be
  * replayed in another engine. These variants derive each row's fate from a
  * portable md5 hash of its key plus a salt string instead — same rows in,
  * same rows out, under any partitioning, on any engine with md5 (the
  * DuckDB oracle replays them exactly). Selection is a plain per-row
  * predicate: no shuffle, no RNG state, pushdown-friendly — the right
  * sampling primitive at 100 TB, where a "seeded" sample that silently
  * changes with file splits is a correctness bug.
  *
  * The trade: draws are keyed, so two rows with equal keys draw alike —
  * callers must pass a unique key (every fixture table has one).
  */
object Sampling {

  /** Portable per-row draw in [0, 2^32): hash32 of "key:salt".
    *
    * NULL keys draw NULL, and every comparison against a NULL draw is
    * false — so rows with a null key silently vanish from the FILTER-style
    * consumers (samples, shuffle positions, token budget). That is
    * deliberate (a null key is not unique, violating the keyed-draw
    * contract) but easy to miss: filter or coalesce null keys explicitly
    * before sampling if they must survive. [[splitLabel]] is the one
    * non-filter consumer: there a null draw falls through to the 'test'
    * label instead of vanishing (its own scaladoc states this).
    */
  def drawOn(key: Column, salt: String): Column =
    hash32(concat(key.cast("string"), lit(":" + salt)))

  /** Fractional keep-predicate at micro-unit (1e-6) granularity — the
    * shared sampling rule of the ANN/semdedup fit samplers, centralized so
    * its edge cases live in ONE place (it used to be re-inlined per
    * caller). The threshold floors at 1 micro-unit: a fraction under 5e-7
    * would otherwise ROUND TO A ZERO threshold and silently keep nothing,
    * crashing the downstream KMeans fit on an empty dataset (review r8).
    * fraction >= 1.0 keeps everything without evaluating the hash.
    */
  def hashSampleFraction(key: Column, salt: String, fraction: Double): Column = {
    require(fraction > 0.0 && fraction <= 1.0,
      s"fraction must be in (0, 1], got $fraction")
    if (fraction >= 1.0) lit(true)
    else drawOn(key, salt) % 1000000 <
      math.max(1L, math.round(fraction * 1000000)).toInt
  }

  /** Keep ~pct% of rows (0-100), deterministically by key. */
  def hashSample(df: DataFrame, key: Column, salt: String, pct: Int): DataFrame = {
    require(pct >= 0 && pct <= 100, s"pct must be 0-100, got $pct")
    df.where(drawOn(key, salt) % 100 < pct)
  }

  /** Stratified sample with per-stratum keep rates in permille (0-1000);
    * strata absent from the map are dropped entirely (sampleBy semantics).
    */
  def hashStratifiedSample(df: DataFrame, key: Column, strata: Column,
                           permille: Map[String, Int], salt: String): DataFrame = {
    require(permille.values.forall(p => p >= 0 && p <= 1000),
      "permille rates must be 0-1000")
    df.where(drawOn(key, salt) % 1000 < strataLookup(strata, permille.view.mapValues(lit(_)).toMap, lit(0)))
  }

  /** Shared strata → per-row value when-chain (absent strata get `default`
    * — the drop semantics both consumers document); one copy so a
    * null-stratum or collation fix cannot land in one and miss the other.
    */
  private def strataLookup(strata: Column, values: Map[String, Column],
                           default: Column): Column =
    values.foldRight(default) { case ((s, v), acc) =>
      when(strata === s, v).otherwise(acc)
    }

  /** Deterministic permutation: every row gets a global 1-based position
    * ordered by its draw (key as tiebreak). Scale-safe total order via
    * [[Ranking.stableRowNumber]] (range partition + zipWithIndex), never a
    * single-partition window. `pin = false` for long-lived sessions that
    * never call `Pinned.release` (see [[Ranking.stableRowNumber]]).
    */
  def hashShuffle(df: DataFrame, key: Column, salt: String,
                  outCol: String = "pos", pin: Boolean = true): DataFrame = {
    require(!df.columns.contains("__draw"), "input already has a __draw column")
    require(!df.columns.contains(outCol), s"input already has a $outCol column")
    // null keys draw NULL and must VANISH (drawOn's documented contract);
    // without the filter they sort FIRST with a partition-layout-dependent
    // order among themselves — the opposite of both the contract and the
    // determinism guarantee (review r10)
    Ranking.stableRowNumber(
      df.withColumn("__draw", drawOn(key, salt)).where(col("__draw").isNotNull),
      Seq(col("__draw"), key), outCol, pin).drop("__draw")
  }

  /** Exactly-k-per-group deterministic sample: each group keeps its k
    * smallest-draw rows (key as tiebreak). Rate-based sampling scales output
    * with group size; this bounds it — the "k examples per class" primitive
    * (balanced eval sets, per-source probes), reproducible under any
    * partitioning. One shuffle on the group key; the rank filter is a
    * `row_number <= k` that Catalyst executes as a WindowGroupLimit
    * (per-partition top-k heap pushed below the shuffle), so no group is
    * ever fully sorted — safe on skewed groups at 100 TB.
    */
  def hashFixedK(df: DataFrame, group: Column, key: Column, salt: String,
                 k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(!df.columns.contains("__rk"), "input already has a __rk column")
    val w = Window.partitionBy(group).orderBy(drawOn(key, salt), key)
    df.withColumn("__rk", row_number().over(w)).where(col("__rk") <= k).drop("__rk")
  }

  /** 'train'/'test' split label with ~trainPct% train, deterministic by key
    * — disjoint and exhaustive by construction (one draw decides).
    * NULL keys draw NULL and fall through the when() to 'test' — unlike
    * the filter-style samplers, where null-key rows vanish (see
    * [[drawOn]]); filter nulls first if deterministic-test is not the
    * posture you want for them.
    */
  def splitLabel(key: Column, salt: String, trainPct: Int): Column = {
    require(trainPct >= 0 && trainPct <= 100, s"trainPct must be 0-100, got $trainPct")
    when(drawOn(key, salt) % 100 < trainPct, lit("train")).otherwise(lit("test"))
  }

  /** E12: source-weighted mixing — replicate each row `weight(stratum)`
    * times, where fractional weights resolve per-row by a deterministic
    * draw (weight 2.5: every row twice, plus a hash-chosen half of them a
    * third time). The pre-training mix step ("2 epochs of wiki, 0.3 of
    * web"); copies are labeled 1..n in `epochCol` so a downstream
    * [[hashShuffle]] can interleave them. Strata absent from the map drop
    * (same contract as [[hashStratifiedSample]]).
    *
    * 100 TB shape: entirely map-side — a per-row expression computes the
    * copy count and `explode(sequence(...))` emits the copies. No shuffle,
    * no skew sensitivity, output size = sum of weights x stratum sizes by
    * construction. The fractional draw threshold uses floor(w * 10^6)
    * micro-units so the same arithmetic replays exactly in DuckDB
    * (truncation semantics differ between engines for a bare cast).
    */
  def weightedMix(df: DataFrame, strata: Column, weights: Map[String, Double],
                  key: Column, salt: String, epochCol: String = "epoch"): DataFrame = {
    require(weights.values.forall(_ >= 0.0), "weights must be non-negative")
    val w = strataLookup(strata, weights.view.mapValues(lit(_)).toMap, lit(0.0))
    replicateByWeight(df, w, key, salt, epochCol)
  }

  /** E12b: temperature-based source mixing — the multilingual-pretraining
    * reweight (Conneau & Lample's p_i ∝ (n_i/N)^α) at α = 0.5: each
    * stratum's epoch weight is sqrt(n_max / n_i), so the largest stratum
    * runs one epoch and low-resource strata are upsampled toward (never
    * to) parity. Weights DERIVE from the data — one tiny per-stratum count
    * aggregate, broadcast back — rather than arriving as caller constants
    * like [[weightedMix]].
    *
    * α is fixed at 0.5 deliberately: the reweight is then `sqrt`, an
    * exactly-rounded IEEE op, so the fractional-epoch draw threshold is
    * bit-identical in any engine and the operator stays oracle-replayable
    * (a general pow(x, α) is correctly-rounded on neither JVM nor C libm,
    * and a one-ULP difference at a draw boundary flips which rows copy).
    *
    * The unpartitioned max() window below runs over the per-stratum COUNT
    * aggregate — |strata| rows, never the corpus — so its single-partition
    * execution is a no-op cost (the corpus itself only sees a broadcast
    * join plus map-side replication, same as [[weightedMix]]).
    *
    * NULL strata are a stratum like any other: weights derive from the
    * data, so every input row must stay represented — the weights join is
    * null-safe (`<=>`), unlike [[weightedMix]]'s documented absent-strata
    * drop (there the caller's map simply has no NULL entry).
    */
  def temperatureMix(df: DataFrame, strata: Column, key: Column, salt: String,
                     epochCol: String = "epoch"): DataFrame = {
    for (c <- Seq("__wt", "__s", "__n_s"))
      require(!df.columns.contains(c), s"input already has a $c column")
    val counts = df.groupBy(strata.as("__s")).agg(count(lit(1)).as("__n_s"))
    val weights = counts
      .withColumn("__wt", sqrt(max(col("__n_s")).over(Window.partitionBy()) /
        col("__n_s").cast("double")))
      .select(col("__s"), col("__wt"))
    val joined = df.join(broadcast(weights), strata <=> col("__s")).drop("__s")
    replicateByWeight(joined, col("__wt"), key, salt, epochCol).drop("__wt")
  }

  /** Shared replicate step of the mixing operators: `floor(w)` whole copies
    * plus one more when the row's draw lands under the fractional part
    * (micro-unit arithmetic — see [[weightedMix]]'s scaladoc). Map-side
    * only: a per-row expression computes the copy count and
    * `explode(sequence(...))` emits the copies.
    */
  private def replicateByWeight(df: DataFrame, w: Column, key: Column,
                                salt: String, epochCol: String): DataFrame = {
    for (c <- Seq("__n", epochCol))
      require(!df.columns.contains(c), s"input already has a $c column")
    val whole = floor(w).cast("long")
    // clamp a positive sub-micro-unit weight to 1 micro-unit: floor(w*1e6)
    // = 0 would silently EMPTY a stratum whose weight is positive — the
    // same round-to-zero trap hashSampleFraction clamps (review r10)
    val rawFrac = floor(w * 1000000d).cast("long") - whole * 1000000L
    val fracMicros = when(whole === 0L && w > 0d && rawFrac === 0L, 1L)
      .otherwise(rawFrac)
    val extra = when(drawOn(key, salt) % 1000000L < fracMicros, 1L).otherwise(0L)
    // the n > 0 guard runs BEFORE the explode: Spark's sequence(1, 0)
    // counts DOWN ([1, 0]) instead of yielding an empty array
    df.withColumn("__n", whole + extra).where(col("__n") > 0)
      .withColumn(epochCol, explode(sequence(lit(1L), col("__n"))))
      .drop("__n")
  }

  /** E11: token-budget curation — per group (source/domain/language), keep
    * rows in deterministic draw order while the group's running token total
    * stays within `budget`. The corpus-mixing step of a pre-training
    * pipeline: "at most N tokens from each source, chosen reproducibly".
    *
    * Semantically this is one cumulative-sum window per group
    * (`ORDER BY draw, key`), which is exactly the oracle formulation — but
    * a group at 100 TB is terabytes, and a per-group window is a
    * single-task sort of the whole group. So the plan splits the draw space
    * into `buckets` draw-ordered slices and runs two phases:
    *
    *  1. per-(group, bucket) token sums — a map-side-combined aggregate to
    *     a tiny frame (|groups| x buckets rows); its per-group running sum
    *     gives every bucket the tokens preceding it (`__cumprev`);
    *  2. broadcast those offsets back and window WITHIN each (group,
    *     bucket) slice only — parallelism |groups| x buckets instead of
    *     |groups|, with each sort 1/buckets of the group.
    *
    * Because the bucket index is `draw div width` (order-preserving in the
    * draw), offset + within-bucket running sum equals the single-window
    * cumulative exactly — asserted against the naive formulation in
    * SeededOpsSpec, and DuckDB-replayed via the plain window. Buckets whose
    * offset already exceeds the budget are pruned BEFORE their window: the
    * expensive sort touches ~budget-sized data, not corpus-sized.
    */
  def tokenBudget(df: DataFrame, group: String, key: Column, tokens: Column,
                  salt: String, budget: Long, buckets: Int = 1024): DataFrame = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    for (c <- Seq("__draw", "__b", "__bsum", "__cumprev", "__run", "__og", "__ob"))
      require(!df.columns.contains(c), s"input already has a $c column")
    val width = (4294967296L + buckets - 1) / buckets
    // integer `div`, not double '/': a double quotient can round across the
    // bucket boundary for draws near a multiple of width.
    // Null-key rows are dropped UP FRONT (drawOn's documented vanish
    // contract) — before r10 they vanished at the join but their tokens
    // had already entered __cumprev, displacing real rows from the budget
    val base = df.withColumn("__draw", drawOn(key, salt))
      .where(col("__draw").isNotNull)
      .withColumn("__b", expr(s"__draw div $width"))
    val wB = Window.partitionBy(group).orderBy("__b")
    val offsets = base.groupBy(group, "__b").agg(sum(tokens).as("__bsum"))
      .withColumn("__cumprev", sum(col("__bsum")).over(wB) - col("__bsum"))
      // prune buckets no row of which can fit. <=, not <: at cumprev ==
      // budget a ZERO-token row (empty doc) still satisfies run <= budget
      // and the single-window reference keeps it — the relaxation only
      // admits candidate buckets whose rows the run-filter below re-judges,
      // so parity is by construction either way (review r8)
      .where(col("__cumprev") <= budget)
      .select(col(group).as("__og"), col("__b").as("__ob"), col("__cumprev"))
    val wIn = Window.partitionBy(col(group), col("__b")).orderBy(col("__draw"), key)
    // NULL-SAFE on the group: a null group value is a legitimate stratum
    // with its own budget (the single-window reference and the DuckDB
    // oracle both keep it); a plain equi-join silently dropped it (r10)
    base.join(broadcast(offsets),
        col(group) <=> col("__og") && col("__b") === col("__ob"))
      .withColumn("__run", col("__cumprev") + sum(tokens).over(wIn))
      .where(col("__run") <= budget)
      .drop("__draw", "__b", "__cumprev", "__run", "__og", "__ob")
  }
}
