package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.sources.Tables

/** Date/JSON kits (F13/F14), as-of lookup (W5) and the batch-parity halves
  * of the streaming surface (E6: tumbling/sliding/session windows) over the
  * `events` fixture. The true streaming versions (readStream + watermark +
  * the same window expressions) live in graft.streaming.EventStreams and are
  * exercised with MemoryStream in tests; these batch queries pin down the
  * window semantics against the DuckDB oracle.
  *
  * Timestamps are surfaced as epoch milliseconds (unix_millis / epoch_ms) —
  * never as raw timestamp columns — so engine-specific timezone/encoding
  * differences can't perturb the comparison.
  */
object EventQueries {

  val defs: Seq[QueryDef] = Seq(

    // F13: date/time kit over orders.
    QueryDef.sql(
      "f13_date_kit",
      """SELECT o_orderkey,
        |       CAST(year(o_orderdate) AS BIGINT) AS y,
        |       CAST(month(o_orderdate) AS BIGINT) AS m,
        |       CAST(day(o_orderdate) AS BIGINT) AS dom,
        |       epoch_ms(date_trunc('month', o_orderdate)) AS month_start_ms,
        |       CAST(date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS BIGINT) AS days_since_95
        |FROM orders ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      Tables.orders(s, d).select(
        col("o_orderkey"),
        year(col("o_orderdate")).cast("long").as("y"),
        month(col("o_orderdate")).cast("long").as("m"),
        dayofmonth(col("o_orderdate")).cast("long").as("dom"),
        unix_millis(date_trunc("month", col("o_orderdate"))).as("month_start_ms"),
        datediff(col("o_orderdate").cast("date"), lit("1995-01-01").cast("date"))
          .cast("long").as("days_since_95"))
        .orderBy("o_orderkey")
    },

    // F14: JSON kit — extract props.k, aggregate by event type.
    QueryDef.sql(
      "f14_json_extract",
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |FROM events ORDER BY event_id""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .select(col("event_id"), get_json_object(col("props"), "$.k").cast("long").as("k"))
        .orderBy("event_id")
    },

    // F14b: typed JSON parsing — map-typed and struct-typed from_json plus
    // a normalized to_json rebuild (both engines emit {"k":N}).
    QueryDef.sql(
      "f14_json_typed",
      // rebuilt normalizes a missing/null k to 0 on BOTH sides: Spark's
      // to_json omits null struct fields ('{}') while DuckDB emits
      // '{"k":null}' — a latent cross-engine divergence that would fire on
      // the first fixture row without a k (review r9)
      """SELECT event_id,
        |       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_map,
        |       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_struct,
        |       to_json(struct_pack(k := coalesce(CAST(json_extract_string(props, '$.k') AS BIGINT), 0))) AS rebuilt
        |FROM events ORDER BY event_id""".stripMargin) { (s, d) =>
      val asMap = from_json(col("props"), org.apache.spark.sql.types.MapType(
        org.apache.spark.sql.types.StringType, org.apache.spark.sql.types.StringType))
      val asStruct = from_json(col("props"), org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.LongType))))
      Tables.events(s, d).select(col("event_id"),
        element_at(asMap, "k").cast("long").as("k_map"),
        asStruct.getField("k").as("k_struct"),
        to_json(struct(coalesce(asStruct.getField("k"), lit(0L)).as("k"))).as("rebuilt"))
        .orderBy("event_id")
    },

    QueryDef.sql(
      "f14_json_agg",
      """SELECT event_type,
        |       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_total,
        |       count(*) AS n
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .select(col("event_type"), get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy("event_type").agg(sum("k").as("k_total"), count(lit(1)).as("n"))
        .orderBy("event_type")
    },

    // E9: funnel analysis — the composed event-analytics shape: per-user
    // first signup (window min), purchases within 7 days of it (as-of-style
    // range condition pushed into a pre-grouped join, never row-by-row),
    // conversion aggregated per cohort week. Two shuffles total: the
    // per-user window and the final aggregate.
    QueryDef.sql(
      "e9_funnel",
      """WITH first_signup AS (
        |  SELECT user_id, min(ts) AS signup_ts FROM events
        |  WHERE event_type = 'signup' GROUP BY user_id
        |),
        |conv AS (
        |  SELECT f.user_id, f.signup_ts,
        |         (SELECT count(*) FROM events p
        |          WHERE p.user_id = f.user_id AND p.event_type = 'purchase'
        |            AND p.ts >= f.signup_ts
        |            AND p.ts < f.signup_ts + INTERVAL 7 DAY) AS n_purchases_7d
        |  FROM first_signup f
        |)
        |SELECT epoch_ms(date_trunc('week', signup_ts)) AS cohort_week_ms,
        |       count(*) AS n_users,
        |       CAST(sum(CASE WHEN n_purchases_7d > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_converted,
        |       CAST(sum(n_purchases_7d) AS BIGINT) AS total_purchases
        |FROM conv GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
      val firstSignup = ev.where(col("event_type") === "signup")
        .groupBy("user_id").agg(min("ts").as("signup_ts"))
      // purchases pre-grouped per user BEFORE the join keeps the join input
      // small; the 7-day window is a filter on the joined pair, not a range
      // scan per row
      val purchases = ev.where(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"), col("ts").as("p_ts"))
      // the 7-day window belongs in the JOIN condition: a user whose
      // purchases all fall outside the window must still surface with a
      // zero count, which a post-join filter would silently drop
      val conv = firstSignup.join(purchases,
          col("user_id") === col("p_user") &&
            col("p_ts") >= col("signup_ts") &&
            col("p_ts") < col("signup_ts") + expr("INTERVAL 7 DAY"),
          "left")
        .groupBy("user_id", "signup_ts")
        .agg(count(col("p_ts")).as("n_purchases_7d"))
      conv.groupBy(unix_millis(date_trunc("week", col("signup_ts"))).as("cohort_week_ms"))
        .agg(count(lit(1)).as("n_users"),
          sum(when(col("n_purchases_7d") > 0, 1L).otherwise(0L)).as("n_converted"),
          sum("n_purchases_7d").as("total_purchases"))
        .orderBy("cohort_week_ms")
    },

    // W5: as-of lookup — last signup at-or-before each event, per user
    // (the step-schedule pattern of chapter_4/MnistClassification.java:92-102).
    QueryDef.sql(
      "w5_asof_lookup",
      """SELECT event_id, user_id, epoch_ms(ts) AS ts_ms,
        |       epoch_ms(max(CASE WHEN event_type = 'signup' THEN ts END) OVER
        |         (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING)) AS last_signup_ms
        |FROM events ORDER BY event_id""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, d).select(
        col("event_id"), col("user_id"), unix_millis(col("ts")).as("ts_ms"),
        unix_millis(max(when(col("event_type") === "signup", col("ts"))).over(w))
          .as("last_signup_ms"))
        .orderBy("event_id")
    },

    // W5b: the same as-of lookup through the AsOfJoin operator (union +
    // single window pass — no range cross-join; see operators.AsOfJoin),
    // checked against a correlated-subquery oracle.
    QueryDef.sql(
      "w5_asof_join_op",
      """SELECT e.event_id, e.user_id, epoch_ms(e.ts) AS ts_ms,
        |       epoch_ms((SELECT max(s.ts) FROM events s
        |                 WHERE s.user_id = e.user_id AND s.event_type = 'signup'
        |                   AND s.ts <= e.ts)) AS signup_ms
        |FROM events e WHERE e.event_type = 'purchase'
        |ORDER BY e.event_id""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
      val left = ev.where(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts")
      val right = ev.where(col("event_type") === "signup")
        .select(col("user_id"), col("ts"), col("ts").as("signup_ts"))
      graft.operators.AsOfJoin.backward(left, right, "user_id", "ts", "signup_ts")
        .select(col("event_id"), col("user_id"), unix_millis(col("ts")).as("ts_ms"),
          unix_millis(col("signup_ts")).as("signup_ms"))
        .orderBy("event_id")
    },

    // W5c: the reference's literal learning-rate step schedule
    // (MapSchedule ITERATION {0->.06, 200->.05, 600->.028, 800->.006,
    // 1000->.001} — chapter_4/MnistClassification.java:92-102) as a
    // piecewise as-of lookup over an iteration domain.
    QueryDef.sql(
      "w5_step_schedule",
      """WITH iters AS (SELECT unnest(generate_series(0, 1199)) AS iter),
        |bp AS (SELECT start_iter, CAST(rate AS DOUBLE) AS rate FROM (VALUES
        |  (0, 0.06), (200, 0.05), (600, 0.028), (800, 0.006), (1000, 0.001)) t(start_iter, rate))
        |SELECT iter, (SELECT rate FROM bp WHERE start_iter <= iter
        |              ORDER BY start_iter DESC LIMIT 1) AS rate
        |FROM iters ORDER BY iter""".stripMargin) { (s, _) =>
      // ascending fold => the highest matching bound ends up outermost
      val schedule = Seq(200 -> 0.05, 600 -> 0.028, 800 -> 0.006, 1000 -> 0.001)
      val rate = schedule.foldLeft(lit(0.06)) { case (acc, (bound, r)) =>
        when(col("iter") >= bound, r).otherwise(acc)
      }
      s.range(0, 1200).toDF("iter").select(col("iter"), rate.as("rate")).orderBy("iter")
    },

    // E6a: tumbling 1-hour windows (batch parity of the streaming agg).
    QueryDef.sql(
      "e6_tumbling_window",
      """SELECT event_type, epoch_ms(date_trunc('hour', ts)) AS win_start_ms,
        |       count(*) AS n,
        |       CAST(SUM(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS total
        |FROM events GROUP BY event_type, win_start_ms ORDER BY event_type, win_start_ms""".stripMargin) {
      (s, d) =>
        Tables.events(s, d)
          .groupBy(col("event_type"), window(col("ts"), "1 hour").as("w"))
          .agg(count(lit(1)).as("n"),
            sum(col("value").cast(DecimalType(14, 2))).cast("double").as("total"))
          .select(col("event_type"), unix_millis(col("w.start")).as("win_start_ms"),
            col("n"), col("total"))
          .orderBy("event_type", "win_start_ms")
    },

    // E6b: sliding windows (1 h length, 30 min slide) — every event lands in
    // exactly two windows; the oracle materializes both via unnest.
    QueryDef.sql(
      "e6_sliding_window",
      """WITH slotted AS (
        |  SELECT event_type,
        |         unnest([to_timestamp(floor(epoch(ts) / 1800) * 1800),
        |                 to_timestamp(floor(epoch(ts) / 1800) * 1800 - 1800)]) AS win_start
        |  FROM events
        |)
        |SELECT event_type, epoch_ms(win_start) AS win_start_ms, count(*) AS n
        |FROM slotted GROUP BY event_type, win_start_ms ORDER BY event_type, win_start_ms""".stripMargin) {
      (s, d) =>
        Tables.events(s, d)
          .groupBy(col("event_type"), window(col("ts"), "1 hour", "30 minutes").as("w"))
          .agg(count(lit(1)).as("n"))
          .select(col("event_type"), unix_millis(col("w.start")).as("win_start_ms"), col("n"))
          .orderBy("event_type", "win_start_ms")
    },

    // E6c: session windows, 10-minute gap per user. Oracle = classic
    // gaps-and-islands; Spark = session_window (new session iff the gap
    // since the previous event is >= the timeout, end-exclusive).
    QueryDef.sql(
      "e6_session_window",
      """WITH flagged AS (
        |  SELECT user_id, ts, event_id,
        |         CASE WHEN ts >= lag(ts) OVER w + INTERVAL 10 MINUTE OR lag(ts) OVER w IS NULL
        |              THEN 1 ELSE 0 END AS new_session
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |), sessions AS (
        |  SELECT user_id, ts,
        |         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS session_id
        |  FROM flagged
        |)
        |SELECT user_id, epoch_ms(min(ts)) AS session_start_ms, count(*) AS n
        |FROM sessions GROUP BY user_id, session_id ORDER BY user_id, session_start_ms""".stripMargin) {
      (s, d) =>
        Tables.events(s, d)
          .groupBy(session_window(col("ts"), "10 minutes").as("w"), col("user_id"))
          .agg(count(lit(1)).as("n"))
          .select(col("user_id"), unix_millis(col("w.start")).as("session_start_ms"), col("n"))
          .orderBy("user_id", "session_start_ms")
    },

    // E6d (r8): stream-stream interval join — view->purchase attribution
    // within a 30-minute horizon. EXACTLY the streaming definition
    // (EventStreams.viewPurchaseAttribution: watermarks on BOTH sides +
    // equi-key + time-range predicate) run in batch mode, where
    // watermarks are no-ops — so the oracle checks the join semantics the
    // stream executes, and StreamingSpec separately proves the streamed
    // execution emits the same rows. State stays bounded by
    // horizon x per-user rate (the property that lets it run forever);
    // the shuffle is on user_id, never a cross join.
    QueryDef.sql(
      "e6_stream_join",
      """SELECT v.user_id AS user_id, epoch_ms(v.ts) AS view_ts_ms,
        |       epoch_ms(p.ts) AS purchase_ts_ms, p.value AS purchase_value
        |FROM events v JOIN events p
        |  ON p.user_id = v.user_id
        | AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 30 MINUTE
        |WHERE v.event_type = 'view' AND p.event_type = 'purchase'
        |ORDER BY user_id, view_ts_ms, purchase_ts_ms, purchase_value""".stripMargin) {
      (s, d) =>
        val ev = Tables.events(s, d)
        graft.streaming.EventStreams.viewPurchaseAttribution(
            ev.where(col("event_type") === "view"),
            ev.where(col("event_type") === "purchase"), horizonMinutes = 30)
          .select(col("user_id"), unix_millis(col("view_ts")).as("view_ts_ms"),
            unix_millis(col("purchase_ts")).as("purchase_ts_ms"), col("purchase_value"))
          .orderBy("user_id", "view_ts_ms", "purchase_ts_ms", "purchase_value")
    },

    // E6e (r11): the exactly-once MANIFEST dedup sink in the oracle gate
    // (VERDICT r10 #3) — three micro-batches of documents driven through
    // EventStreams.manifestDedupBatch with EVERY batch FORCE-REDELIVERED
    // (the at-least-once worst case), then the converged docs table is
    // hash-checked against a DuckDB replay of the dedup outcome, plus
    // pinned convergence booleans (zero duplicate ids, both tables' txn
    // watermarks at the last batch, version monotonicity). Texts are
    // shingle-SALTED with their own content hash (spaces -> content-hash
    // tokens), which makes distinct texts' shingle sets disjoint — so the
    // near-dup path runs end-to-end (signatures, band index, maintenance)
    // but provably drops nothing at ANY scale factor, and the converged
    // corpus is exact arithmetic: keep-first-by-(batch, doc_id) per text.
    // The MinHash math itself is hash-pinned by e2_incremental's full
    // DuckDB replay; THIS entry pins the sink's exactly-once convergence.
    QueryDef.sql(
      "e6_manifest_sink",
      """WITH raw AS (
        |  SELECT doc_id, text, 0 AS b FROM documents WHERE doc_id < 60
        |  UNION ALL
        |  SELECT doc_id + 2000000 AS doc_id, text, 1 AS b FROM documents WHERE doc_id < 20
        |  UNION ALL
        |  SELECT doc_id + 3000000 AS doc_id, reverse(text) AS text, 1 AS b
        |  FROM documents WHERE doc_id BETWEEN 20 AND 39
        |  UNION ALL
        |  SELECT doc_id + 3100000 AS doc_id, reverse(text) AS text, 1 AS b
        |  FROM documents WHERE doc_id BETWEEN 20 AND 24
        |  UNION ALL
        |  SELECT doc_id + 4000000 AS doc_id, reverse(text) AS text, 2 AS b
        |  FROM documents WHERE doc_id BETWEEN 20 AND 29
        |  UNION ALL
        |  SELECT doc_id + 5000000 AS doc_id, reverse(text) AS text, 2 AS b
        |  FROM documents WHERE doc_id BETWEEN 40 AND 59
        |  UNION ALL
        |  SELECT doc_id + 6000000 AS doc_id, text, 2 AS b FROM documents WHERE doc_id < 10
        |),
        |salted AS (
        |  SELECT doc_id, replace(text, ' ', ' ' || substr(md5(text), 1, 4) || ' ') AS text, b
        |  FROM raw
        |),
        |keep AS (
        |  SELECT doc_id, text FROM salted
        |  QUALIFY row_number() OVER (PARTITION BY text ORDER BY b, doc_id) = 1
        |)
        |SELECT doc_id, CAST(length(text) AS BIGINT) AS text_len, true AS sink_converged
        |FROM keep ORDER BY doc_id""".stripMargin) { (s, d) =>
      val spark = s
      import spark.implicits._
      val M = graft.sources.ManifestStore
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
      def salted(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = df.withColumn("text",
        expr("replace(text, ' ', concat(' ', substring(md5(text), 1, 4), ' '))"))
      def slice(lo: Int, hi: Int, off: Long, rev: Boolean): org.apache.spark.sql.DataFrame = {
        val base = docs.where(col("doc_id") >= lo && col("doc_id") < hi)
        base.select((col("doc_id") + off).as("doc_id"),
          (if (rev) reverse(col("text")) else col("text")).as("text"))
      }
      val batches = Seq(
        slice(0, 60, 0L, rev = false),
        slice(0, 20, 2000000L, rev = false)
          .union(slice(20, 40, 3000000L, rev = true))
          .union(slice(20, 25, 3100000L, rev = true)),
        slice(20, 30, 4000000L, rev = true)
          .union(slice(40, 60, 5000000L, rev = true))
          .union(slice(0, 10, 6000000L, rev = false))
      ).map(salted)
      val root = ProcessNonce.scratchDir("graft_e6_msink",
        Integer.toHexString(d.hashCode))
      val fs = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(root), true)
      for ((b, bid) <- batches.zipWithIndex; _ <- 0 until 2) // every batch DELIVERED TWICE
        graft.streaming.EventStreams.manifestDedupBatch(
          b, bid.toLong, "doc_id", "text", root, threshold = 0.5, curate = identity)
      val table = M.read(s, s"$root/docs")
      val (nRows, nIds) = table.agg(count(lit(1)), countDistinct("doc_id"))
        .as[(Long, Long)].head()
      val docsSnap = M.latestSnapshot(s, s"$root/docs").get
      val idxSnap = M.latestSnapshot(s, s"$root/index").get
      val converged = nRows == nIds && // zero duplicate rows under redelivery
        docsSnap.txns.get(graft.streaming.EventStreams.ManifestDedupDocsApp).contains(2L) &&
        idxSnap.txns.get(graft.streaming.EventStreams.ManifestDedupIndexApp).contains(2L)
      table.select(col("doc_id"), length(col("text")).cast("long").as("text_len"))
        .withColumn("sink_converged", lit(converged))
        .orderBy("doc_id")
    },

    // E9b: cohort retention matrix — per signup-cohort week, how many users
    // are active 0..3 weeks later. Cohort and activity weeks are both
    // Monday-truncated, so the offset is an exact integer division of the
    // day difference; one distinct-activity aggregate, one join, one count.
    QueryDef.sql(
      "e9_retention",
      """WITH first_signup AS (
        |  SELECT user_id, date_trunc('week', min(ts)) AS cw FROM events
        |  WHERE event_type = 'signup' GROUP BY user_id
        |), act AS (
        |  SELECT DISTINCT user_id, date_trunc('week', ts) AS aw FROM events
        |), joined AS (
        |  SELECT f.user_id, f.cw,
        |         CAST(date_diff('day', CAST(f.cw AS DATE), CAST(a.aw AS DATE)) // 7 AS BIGINT) AS week_offset
        |  FROM first_signup f JOIN act a ON a.user_id = f.user_id AND a.aw >= f.cw
        |), counts AS (
        |  SELECT cw, week_offset, count(DISTINCT user_id) AS n_active
        |  FROM joined WHERE week_offset <= 3 GROUP BY cw, week_offset
        |), sizes AS (
        |  SELECT cw, count(DISTINCT user_id) AS n_cohort FROM first_signup GROUP BY cw
        |)
        |SELECT epoch_ms(c.cw) AS cohort_week_ms, c.week_offset, c.n_active, s.n_cohort,
        |       round(CAST(c.n_active AS DOUBLE) / s.n_cohort, 6) AS retention
        |FROM counts c JOIN sizes s ON s.cw = c.cw
        |ORDER BY cohort_week_ms, week_offset""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
      val firstSignup = ev.where(col("event_type") === "signup")
        .groupBy("user_id").agg(date_trunc("week", min("ts")).as("cw"))
      // distinct (user, week) BEFORE the join: the join input shrinks from
      // every event to at most users x weeks
      val act = ev.select(col("user_id"), date_trunc("week", col("ts")).as("aw")).distinct()
      val joined = firstSignup.join(act, "user_id").where(col("aw") >= col("cw"))
        .select(col("user_id"), col("cw"),
          floor(datediff(col("aw"), col("cw")) / 7).cast("long").as("week_offset"))
        .where(col("week_offset") <= 3)
      val counts = joined.groupBy("cw", "week_offset")
        .agg(countDistinct("user_id").as("n_active"))
      val sizes = firstSignup.groupBy("cw").agg(countDistinct("user_id").as("n_cohort"))
      counts.join(sizes, "cw")
        .select(unix_millis(col("cw")).as("cohort_week_ms"), col("week_offset"),
          col("n_active"), col("n_cohort"),
          round(col("n_active").cast("double") / col("n_cohort"), 6).as("retention"))
        .orderBy("cohort_week_ms", "week_offset")
    },

    // O8a: latest-wins upsert — a base snapshot (per-user state as of a
    // cutoff) plus a change feed (every later event) merge to exactly the
    // per-user latest event overall; a winner of type 'error' is a
    // tombstone and drops the user from serving state. One window pass
    // over the union (operators.Merge.upsertLatest).
    QueryDef.sql(
      "o8_upsert",
      """WITH ranked AS (
        |  SELECT user_id, event_type, value, ts, event_id,
        |         row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events
        |)
        |SELECT user_id, event_type, round(value, 6) AS value, epoch_ms(ts) AS ts_ms
        |FROM ranked WHERE rn = 1 AND event_type <> 'error'
        |ORDER BY user_id""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
        .select("user_id", "event_type", "value", "ts", "event_id")
      // cutoff = median-ish fixed date inside the fixture's range; rows at
      // or before it form the base snapshot, the rest are the change feed
      val cutoff = lit("2024-01-15").cast("timestamp")
      val wBase = Window.partitionBy("user_id")
        .orderBy(col("ts").desc, col("event_id").desc)
      val base = ev.where(col("ts") <= cutoff)
        .withColumn("__rn", row_number().over(wBase))
        .where(col("__rn") === 1).drop("__rn")
      val changes = ev.where(col("ts") > cutoff)
      graft.operators.Merge.upsertLatest(base, changes,
          keyCols = Seq("user_id"), versionCols = Seq("ts", "event_id"),
          isDelete = Some(col("event_type") === "error"))
        .select(col("user_id"), col("event_type"), round(col("value"), 6).as("value"),
          unix_millis(col("ts")).as("ts_ms"))
        .orderBy("user_id")
    },

    // O8b: SCD2 historize — each user's event feed becomes validity
    // intervals: effective at its ts, expiring when the next event of that
    // user arrives (null = current). One lead() window
    // (operators.Merge.scd2History).
    QueryDef.sql(
      "o8_scd2_history",
      """SELECT user_id, event_id, event_type, epoch_ms(ts) AS valid_from_ms,
        |       epoch_ms(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) AS valid_to_ms
        |FROM events
        |ORDER BY user_id, event_id""".stripMargin) { (s, d) =>
      val hist = graft.operators.Merge.scd2History(
        Tables.events(s, d).select("user_id", "event_type", "ts", "event_id"),
        keyCols = Seq("user_id"), versionCols = Seq("ts", "event_id"))
      hist.select(col("user_id"), col("event_id"), col("event_type"),
          unix_millis(col("valid_from")).as("valid_from_ms"),
          unix_millis(col("valid_to")).as("valid_to_ms"))
        .orderBy("user_id", "event_id")
    }
  )
}
