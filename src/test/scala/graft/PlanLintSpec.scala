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
    "m4_regression_sum", "m5_word2vec_table", "e3_ann_ivf", "e2_semdedup",
    // native DL fits (25-epoch CNN / 10-epoch LSTM / 10-epoch AE) whose
    // result frame is a LocalRelation the lint can never flag — running
    // them buys nothing
    "m3_convnet", "m1_lstm", "m2_autoencoder")

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
    "e3_ann_ivfpq_append",
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

  test("catalog-wide: no single-partition exchange except under a keyless global aggregate; no global sort feeding a limit") {
    // VERDICT r6 #8: PlanSpec pins ~20 headline plans; a Catalyst upgrade
    // could silently de-optimize the rest. These two invariants hold for
    // every catalogued plan:
    //  - an Exchange to SinglePartition is only ever the final hop of a
    //    keyless (global) aggregate — one row per partial, unavoidable and
    //    cheap. Anywhere else it serializes the whole stream through one
    //    task (the accidental-coalesce(1) class of regression).
    //  - a GlobalLimit/CollectLimit directly over a global Sort means the
    //    sort-limit fusion into TakeOrderedAndProject (per-partition heaps)
    //    regressed to a full cluster sort.
    import org.apache.spark.sql.execution._
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.catalyst.plans.physical.SinglePartition

    def kids(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.inputPlan)
      case other => other.children
    }
    // does this subtree hit a global Sort before any exchange/aggregate
    // boundary (transparent nodes like Project/WholeStageCodegen skipped)?
    @annotation.tailrec
    def globalSortBelow(p: SparkPlan): Boolean = p match {
      case s: SortExec => s.global
      case _: ShuffleExchangeExec | _: AdaptiveSparkPlanExec => false
      case p if p.children.size == 1 => globalSortBelow(p.children.head)
      case _ => false
    }
    def keylessAgg(p: SparkPlan): Boolean = p match {
      case h: aggregate.HashAggregateExec => h.groupingExpressions.isEmpty
      case o: aggregate.ObjectHashAggregateExec => o.groupingExpressions.isEmpty
      case s: aggregate.SortAggregateExec => s.groupingExpressions.isEmpty
      case p if p.children.size == 1 => keylessAgg(p.children.head)
      case _ => false
    }
    def lint(name: String, root: SparkPlan): Seq[String] = {
      val bad = scala.collection.mutable.ArrayBuffer.empty[String]
      def walk(p: SparkPlan, parentChain: List[SparkPlan]): Unit = {
        p match {
          case e: ShuffleExchangeExec if e.outputPartitioning == SinglePartition =>
            // allowed iff some ancestor within the same stage is a keyless
            // aggregate (the exchange feeds the global-agg final step)
            val justified = parentChain.takeWhile {
              case _: ShuffleExchangeExec => false
              case _ => true
            }.exists(keylessAgg)
            if (!justified) bad += s"$name: Exchange SinglePartition outside a global aggregate"
          case l: GlobalLimitExec if globalSortBelow(l.child) =>
            bad += s"$name: GlobalLimit over a global Sort (TakeOrderedAndProject regressed)"
          case l: CollectLimitExec if globalSortBelow(l.child) =>
            bad += s"$name: CollectLimit over a global Sort (TakeOrderedAndProject regressed)"
          case _ => ()
        }
        kids(p).foreach(walk(_, p :: parentChain))
        p.subqueries.foreach(walk(_, p :: parentChain))
      }
      walk(root, Nil)
      bad.toSeq
    }
    spark.conf.set("spark.graft.probe.materialize", "false")
    val offenders = try Catalog.all.filterNot(q => skip(q.name)).flatMap { q =>
      lint(q.name, q.run(spark, sfDir).queryExecution.executedPlan)
    } finally spark.conf.set("spark.graft.probe.materialize", "true")
    assert(offenders.isEmpty, s"plan lint failures:\n${offenders.distinct.mkString("\n")}")
  }

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
