package graft

import graft.queries.Catalog

/** Catalog-wide physical-plan lint: the one undebatable 100 TB rule is that
  * no query may plan a Cartesian product, and a BroadcastNestedLoopJoin is
  * tolerable ONLY as a deliberate broadcast-scoring scan (tiny broadcast
  * side streamed against the corpus). Every catalogued query is planned and
  * checked — a new query that accidentally cross-joins fails here, not in
  * production.
  */
class PlanLintSpec extends SparkSpec {

  /** Queries that train MLlib models during construction — planned shapes
    * are owned by MLlib and the fits cost seconds even at sf0.001.
    */
  private val skip = Set(
    "m1_classification_pipeline", "m2_pca_anomaly", "m3_mlp_classifier",
    "m4_regression_sum", "m5_word2vec_table", "e3_ann_ivf", "e2_semdedup")

  /** Deliberate broadcast-NL scoring scans: a handful of query vectors
    * broadcast against the corpus with a non-equi (id inequality)
    * condition. The corpus side streams exactly once; this is the designed
    * exact-topk shape, not an accident (SCALE.md E3).
    */
  private val bnljAllowed = Set("e3_cosine_topk", "e2_embedding_neardup",
    // PQ ADC scan: broadcast query rows stream once against the (vec_id,
    // codes) table with the n_id =!= q_id guard — same designed shape,
    // shared by the build entry, its probe twin, and the IVFADC composition
    "e3_ann_pq", "e3_ann_pq_probe", "e3_ann_ivfpq", "e3_ann_ivfpq_probe",
    // every e3_ann_* entry now appends recallSummary vs exactTopK (VERDICT
    // r5 #3), so the exact-topk broadcast-scoring scan rides along
    "e3_ann_lsh",
    // KMV pairwise: the |strata| x |strata| pair frame (a few hundred rows
    // of source names) built by an inequality cross — both sides are
    // signature-derived, never the corpus
    "e2_source_overlap_kmv",
    // Scalar feedback: a 1-row broadcast aggregate (global threshold /
    // mean) cross-joined into the stream — O(corpus) with no shuffle, the
    // scale-safe decorrelation of TPC-H's scalar subqueries (Q11/Q20/Q22).
    // The BNLJ side is exactly one row by construction.
    "q11_important_parts", "q20_excess_shippers", "q22_idle_customers")

  test("no catalogued query plans a CartesianProduct; BNLJ only where designed") {
    // keep e2_incremental_probe's VETTING plan inspectable: with the
    // default materialize=true its checkpoint collapses the plan to
    // Scan ExistingRDD and the lint would see nothing
    spark.conf.set("spark.graft.probe.materialize", "false")
    val offenders = try Catalog.all.filterNot(q => skip(q.name)).flatMap { q =>
      val plan = q.run(spark, sfDir).queryExecution.executedPlan.toString
      val bad =
        (if (plan.contains("CartesianProduct")) Seq(s"${q.name}: CartesianProduct") else Nil) ++
        (if (plan.contains("BroadcastNestedLoopJoin") && !bnljAllowed(q.name))
          Seq(s"${q.name}: unexpected BroadcastNestedLoopJoin") else Nil)
      bad
    } finally spark.conf.set("spark.graft.probe.materialize", "true")
    assert(offenders.isEmpty, s"plan lint failures:\n${offenders.mkString("\n")}")
  }
}
