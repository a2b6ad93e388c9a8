package graft

import java.nio.file.{Files, Paths}

/** Dumps the physical operator tree of each headline query to PLANS.md —
  * the `.explain("formatted")` audit trail behind the 100 TB design claims
  * (pushdown, broadcast placement, partial aggregation, top-k strategy).
  * Regenerate with: tools/run.sh graft.PlanAudit /root/testdata/sf0.01
  */
object PlanAudit {

  /** (query, what the plan must show and why it scales). */
  private val audits: Seq[(String, String)] = Seq(
    "q1_pricing_summary" ->
      "Single scan of lineitem with the shipdate filter pushed to parquet; partial HashAggregate before the exchange so the shuffle carries one row per (returnflag, linestatus) per task, not 6M rows.",
    "q3_shipping_priority" ->
      "BUILDING customers broadcast; orders/lineitem shuffle only on the o_orderkey equi-join; top-10 via TakeOrderedAndProject, never a total sort.",
    "j6_multiway_join" ->
      "TPC-H Q5 shape: the whole dimension chain (region -> nation -> customer/supplier) collapses to broadcasts; only lineitem<->orders exchange. At 1000 executors the fact shuffle is the single unavoidable data movement.",
    "q10_returned_items" ->
      "TPC-H Q10 shape: returnflag filter pushed into the lineitem scan, date window prunes orders before the fact-fact join; the aggregate shuffles on the high-cardinality customer key and the top-20 is TakeOrderedAndProject over that intermediate.",
    "w1_top_bottom_per_group" ->
      "Window rank partitioned by label: one hash exchange on the group key, sort within partitions — per-group top/bottom-k with no global sort and no collect_list blowup.",
    "w2_global_topk" ->
      "TakeOrderedAndProject: per-partition heaps + driver merge of k rows. O(n) scan, O(k) result; a total sort would shuffle everything.",
    "e1_dedup_exact" ->
      "Exact dedup = one hash exchange on the dedup key + row_number window; survivor choice is deterministic (min tiebreak), no driver-side state.",
    "e2_minhash_lsh" ->
      "Shingle explode stays narrow (no shuffle) until the signature groupBy; candidate generation is an equi-join on (band, key) buckets — the plan has NO cross join anywhere; exact-Jaccard verification joins only candidate docs (semi-join cut).",
    "e3_cosine_topk" ->
      "Query side broadcast; the corpus streams through one scan scoring graft_cosine inside whole-stage codegen; per-query top-k via windowed rank over the small scored set.",
    "e2_components" ->
      "One round of the min-label iteration: an edge-list join + grouped min + label merge. Rounds = cluster diameter; every round touches only docs that appear in a pair, never the corpus.",
    "e8_pack_chunks" ->
      "Sequence packing is one window pass partitioned by lang: a single exchange on the partition key, cumulative sum within sorted partitions — linear in corpus size.",
    "j6_range_join" ->
      "Range predicate evaluated after an equi-prefilter so the join is not a broadcast-nested-loop over the full cross space.",
    "o2_sample_seeded" ->
      "Deterministic hash sampling is a plain per-row predicate fused into the scan's codegen stage: a 10% sample of 100 TB costs one scan and ZERO shuffles, and (unlike rand(seed)) the selected rows are independent of file splits and partition layout.",
    "o3_shuffle_seeded" ->
      "Deterministic shuffle = range-repartition on the md5 draw + per-partition zipWithIndex (stableRowNumber): a scale-safe total order, never a single-partition row_number window.",
    "e2_incremental" ->
      "Continual ingest: exact dups leave via a fingerprint anti-join (16-byte digests shuffle, not documents); candidates are a batch-bands x all-bands equi-join with NO cross join; verification re-shingles only candidate docs. The index builds inline here — with the stored bucketed band index the probe reads only the buckets the batch touches.",
    "e10_decontaminate" ->
      "Benchmark decontamination: the eval side's distinct shingle set BROADCASTS (eval suites are tiny next to the corpus), so the training corpus streams through one BroadcastHashJoin and is never shuffled; flagged ids broadcast again into the left-anti join. No corpus-sized exchange anywhere.",
    "e11_token_budget" ->
      "Token-budget curation: phase 1 is a map-side-combined aggregate to a (source x bucket) frame; its per-source running sum broadcasts back, so the only corpus-wide exchange is the (source, bucket) window partitioning — parallelism sources x buckets, each sort 1/buckets of a source, with over-budget buckets pruned BEFORE the sort.",
    "e12_weighted_mix" ->
      "Source-weighted mixing: copy count is a per-row expression, copies come from explode(sequence) — scan, project, generate; ZERO exchanges in the whole plan (the trailing sort is the test harness's deterministic dump order, not the operator).",
    "q18_large_orders" ->
      "TPC-H Q18 shape: the lineitem aggregate partial-aggregates map-side before its one exchange; the selective HAVING output joins orders/customer (AQE broadcasts it at small SF, free to shuffle at scale); top-100 via TakeOrderedAndProject.",
    "q19_disjunctive_revenue" ->
      "TPC-H Q19 shape: Catalyst extracts the per-side implications of the OR-of-ANDs — the part scan keeps only rows inside some brand/size window and the lineitem scan only rows inside some quantity window (visible as pushed scan filters) — so the disjunction never forces an unfiltered fact-dim join.",
    "e5_bigram_fluency" ->
      "Bigram-LM fluency: the model is a gram-type-sized aggregate (one shuffle over exploded grams + a prefix-total join); scoring joins doc grams to the model on the gram string and partial-aggregates per doc. No corpus-text shuffle, no UDFs — every stage is codegen.",
    "q2_min_cost_supplier" ->
      "TPC-H Q2 shape: the correlated per-part MIN subquery decorrelates to ONE window pass over the candidate set (single exchange on p_partkey) — never a per-row subquery and never a candidates-vs-candidates self-join; nation broadcasts.",
    "q7_volume_shipping" ->
      "TPC-H Q7 shape: both nation lookups ride broadcasts (the filtered supplier side is broadcast-hinted — 12% of an already-small table even at scale), so the only fact-fact exchange is lineitem<->orders; the nation-pair disjunction filters rows after the joins provide the labels.",
    "q9_product_profit" ->
      "TPC-H Q9 shape: part (name-filtered) and supplier->nation collapse to broadcasts; the profit expression is computed narrow before the orders join so the fact exchange carries (orderkey, nation, amount), not full rows.",
    "q11_important_parts" ->
      "TPC-H Q11 shape: the global threshold is a 1-row broadcast nested-loop feedback — the grouped values stream against one scalar row with no shuffle; the only exchanges are the two grouped aggregations the query inherently needs.",
    "q13_cust_order_counts" ->
      "TPC-H Q13 shape: the ON-clause priority predicate pre-filters orders BEFORE the outer join; per-customer counts shuffle on the high-cardinality customer key, the count histogram re-aggregates a customer-sized frame into ~20 rows.",
    "q17_small_qty_revenue" ->
      "TPC-H Q17 shape: the correlated per-part AVG decorrelates to a grouped threshold joined back on the part key, with the brand filter applied BEFORE both passes (equivalent under the equi-join, shrinks both); the final aggregate is a scalar.",
    "q21_sole_blame" ->
      "TPC-H Q21 shape: EXISTS/NOT EXISTS self-joins become a left-semi + left-anti pair hashing on l_orderkey with the supplier-inequality as a non-equi residual — lineitem is probed with 2-column projections, never re-scanned wide.",
    "e1_segment_dedup" ->
      "C4-style segment dedup: segmentation is a narrow in-place slice of the token array (tokens never explode); keep-first is min over a packed (id,seg) BIGINT grouped by segment — a pure HashAggregate pair, so duplicate segments collapse MAP-SIDE before the exchange and no sort exists anywhere in the keep-first stage (min(struct) would SortAggregate; the packed form is why PlanSpec can pin zero SortAggregate nodes) — leaving the keep-first aggregate exchange on the segment and the reassembly exchange on doc_id as the plan's only wide stages.",
    "o2_fixed_k_per_group" ->
      "Exactly-k-per-group sampling: the row_number <= k filter compiles to a PARTIAL WindowGroupLimit below the exchange — every task keeps a k-row heap per group before shuffling, so a skewed 100 TB group ships k rows per task, never its full contents, and no group is ever fully sorted.",
    "e13_outlier_mad" ->
      "Robust outlier scoring: both per-source median/MAD aggregates reduce to source-cardinality frames and broadcast back, so the corpus streams through two BroadcastHashJoins with no corpus-wide exchange; the 20 most extreme rows come from TakeOrderedAndProject (per-partition heaps), and the trailing rank window runs on those 20 rows only.",
    "o9_zorder_curve" ->
      "Z-order curve value: pure scan + whole-stage-codegen projection — zero exchanges; the payoff is at WRITE time (Sink.writeZOrdered range-partitions on the curve so parquet min/max stats stay tight in every interleaved dimension — file-skipping asserted in ScaleOpsSpec).",
    "e2_source_overlap_kmv" ->
      "KMV dataset-overlap sketch: the corpus streams once through tokenize/shingle/hash codegen; the dense_rank <= k filter compiles to a PARTIAL WindowGroupLimit below the stratum exchange, so each task ships only its local k smallest distinct hashes — the shuffle is ~tasks x k rows, not the corpus's distinct shingle set. Everything after (pairwise union/top-k/estimate) runs on k x |strata| rows.",
    "e5_dup_ngram_coverage" ->
      "Duplicate n-gram coverage: shingle digests shuffle as 8-byte hash60 longs, never 32-char md5 strings; per-doc totals come from a map-side partial count (no join), and only the df >= 2 digest subset joins back against the gram stream — the corpus-wide equi-join carries the narrow dup set, not every gram's document frequency.",
    "q12_shipmode_priority" ->
      "TPC-H Q12 shape: both fact scans project to the 3 columns the query touches (visible in ReadSchema) and the returnflag filter pushes into the lineitem scan; the one exchange pair is the l_orderkey equi-join both facts inherently need, the lateness range predicate rides as a post-join filter, and the priority split partial-aggregates to 2 rows before the final exchange.",
    "e5_bpe_encode" ->
      "Full BPE tokenizer: training's only corpus cost is the exact word-count aggregate (map-side partial combine) capped by a TakeOrderedAndProject vocab cut — the merge loop runs driver-side on that bounded table, corpus-independent; encoding is a broadcast-rank UDF fused into the document scan's map stage (ZERO text shuffles), and the lone remaining exchange is the |sources|-row fertility aggregate."
  )

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val out = if (args.length > 1) args(1) else "PLANS.md"
    val spark = GraftSession.getOrCreate(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt)
    val sb = new StringBuilder
    sb.append("# PLANS — physical-plan audit of headline queries\n\n")
    sb.append(s"Generated by `graft.PlanAudit` at `$sfDir` (operator tree section of\n")
    sb.append("`explain(\"formatted\")`; per-node detail omitted). Each plan is asserted\n")
    sb.append("in spirit by PlanSpec; this file is the human-readable audit trail.\n")
    audits.foreach { case (name, note) =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val buf = new java.io.ByteArrayOutputStream()
      Console.withOut(new java.io.PrintStream(buf)) { df.explain("formatted") }
      val tree = buf.toString.split("\n\n").head
      sb.append(s"\n## $name\n\n$note\n\n```\n$tree\n```\n")
    }
    Files.writeString(Paths.get(out), sb.toString)
    println(s"wrote $out")
    spark.stop()
  }
}
