package graft

/** Benchmark main: times every catalogued query at SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line. Failures are reported per-query in an "errors"
  * object (never silently folded into a wall time — see VERDICT.md round 1).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    // optional arg: regex over query names (dev iteration on a subset —
    // the driver passes none and times the whole catalog)
    val nameFilter = args.headOption.getOrElse(".*")
    // contamination evidence (VERDICT.md round 3): a bench sharing the box
    // with other work inflates every query uniformly and is not a valid
    // measurement. Record the 1-min load average before/after plus the host
    // CPU count in the JSON line so a contaminated run is self-identifying;
    // annotate rather than refuse (an unattended harness run must still
    // produce its artifact).
    val os = java.lang.management.ManagementFactory.getOperatingSystemMXBean
    val hostCpus = Runtime.getRuntime.availableProcessors
    val loadStart = os.getSystemLoadAverage
    val statStart = procStat()
    val calibStart = calibrate()
    val spark = GraftSession.getOrCreate(cpus)
    // Untimed warmup: first use of the parquet reader, whole-stage codegen
    // compiler, and shuffle machinery costs seconds of one-time JVM init
    // that would otherwise be billed to whichever query sorts first.
    try spark.read.parquet(s"$sfDir/region.parquet")
      .groupBy("r_regionkey").count().collect()
    catch { case _: Throwable => () } // warmup only — never fail the run
    var errors = List.empty[(String, String)]
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(_._1.matches(nameFilter)).flatMap { case (name, fn) =>
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).count()
        // queries persist/cache intermediates; drop them so 100+ sequential
        // queries don't accumulate blocks and skew later timings
        graft.operators.Pinned.release()
        spark.catalog.clearCache()
        Some(name -> (System.nanoTime() - t0) / 1e9)
      } catch {
        case e: Throwable =>
          errors ::= (name -> Option(e.getMessage).getOrElse(e.getClass.getName).take(200))
          // a FAILED query must not leave its blocks in the next query's
          // timed window either
          graft.operators.Pinned.release()
          spark.catalog.clearCache()
          None
      }
    }
    def esc(s: String): String = JsonText.escape(s)
    // Locale.ROOT: a comma-decimal default locale would break the JSON line
    val qs = results.map { case (k, v) =>
      "\"" + esc(k) + "\":" + String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    }.mkString("{", ",", "}")
    val errJson = errors.map { case (k, v) => "\"" + esc(k) + "\":\"" + esc(v) + "\"" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val loadEnd = os.getSystemLoadAverage
    // host-speed evidence beyond load average: a shared host can run this
    // box 1.4x slower with an IDLE load average (hypervisor steal and
    // per-core frequency variance are invisible to it — measured on this
    // very box, see BASELINE.md round-4 note). calib_sec times a fixed
    // single-thread LCG loop before and after the run (code-independent:
    // two runs of ANY revision are comparable through it); steal_pct is
    // the /proc/stat steal share across the whole run (Linux only, -1.0
    // when unavailable).
    val calibEnd = calibrate()
    val stealPct = (for {
      a <- statStart; b <- procStat()
      d = b.zip(a).map { case (y, x) => y - x }
      tot = d.sum.toDouble
      if tot > 0 && d.length > 7
    } yield 100.0 * d(7) / tot).getOrElse(-1.0)
    // single-thread slowdown DURING the run (VERDICT r5 #2: round 5's
    // driver bench printed 31 false over-2x ghosts with contaminated=false
    // while its own calib probe doubled mid-run — load average alone
    // misses per-core degradation)
    val hostDegraded = isHostDegraded(calibStart, calibEnd)
    // pre-existing load above half the cores is unambiguously external;
    // end load is checked against 1.5x cores (this JVM alone can drive
    // ~cores of load, so a lower end-threshold would false-positive on the
    // bench's own work) to catch jobs that landed mid-run; calib drift
    // catches what neither load number can see
    val contaminated =
      loadStart > hostCpus / 2.0 || loadEnd > hostCpus * 1.5 || hostDegraded
    if (contaminated)
      System.err.println(f"[bench] WARNING: timings contaminated — start load " +
        f"$loadStart%.1f, end load $loadEnd%.1f on $hostCpus CPUs, calib " +
        f"$calibStart%.2fs -> $calibEnd%.2fs (degraded=$hostDegraded)")
    def f2(d: Double): String =
      String.format(java.util.Locale.ROOT, "%.2f", Double.box(d))
    // Self-normalization against BASELINE.md (VERDICT rounds 3+4: raw
    // totals from a shared box read as 2-4x regressions that evaporate on
    // an idle re-run). Execute the normalization rule BASELINE.md states in
    // prose: per-query ratio vs the recorded base, shared-query median as
    // the machine-condition estimate, and the over-2x lists both raw and
    // median-normalized — so a noisy run self-reports "uniformly slow box"
    // instead of per-query ghosts.
    val base = baselineTimes()
    // Re-time raw over-2x offenders ONCE before listing them (VERDICT r5
    // #2): a transient host stall inflates whichever queries it lands on;
    // a second measurement in the same warmed session separates a real
    // regression (slow twice) from a ghost (fast on retry). The smaller
    // of the two timings feeds every derived field; both are reported.
    val firstPass = results.toMap
    val firstRatios = firstPass.collect {
      case (n, t) if base.get(n).exists(_ > 0) => n -> t / base(n) }
    val (suspects, nSuspectsTotal) = selectSuspects(firstRatios)
    if (nSuspectsTotal > suspects.size)
      System.err.println(s"[bench] WARNING: $nSuspectsTotal over-2x suspects, " +
        s"re-timing only the first ${suspects.size}")
    val qmap = SparkEntry.queries
    // a failed second timing is REPORTED and retired from the suspect
    // pool (review r9): silently keeping the inflated first-pass time
    // defeats the ghost-vs-regression retime design, and an unretired
    // failure would be re-selected by every normalized-gate pass
    var retimeFailed = Set.empty[String]
    def retime(names: Seq[String]): Map[String, Double] = names.flatMap { n =>
      qmap.get(n).flatMap { fn =>
        val t0 = System.nanoTime()
        val ok = try { fn(spark, sfDir).count(); true }
                 catch { case e: Throwable =>
                   System.err.println(s"[bench] WARNING: retime of $n failed " +
                     s"(${Option(e.getMessage).getOrElse(e.getClass.getName).take(120)}) — " +
                     "its published time is the single first-pass measurement")
                   retimeFailed += n
                   false
                 }
        graft.operators.Pinned.release()
        spark.catalog.clearCache()
        if (ok) Some(n -> (System.nanoTime() - t0) / 1e9) else None
      }
    }.toMap
    def effectiveOf(rt: Map[String, Double]) = results.map { case (n, t) =>
      n -> math.min(t, rt.getOrElse(n, t)) }
    def sharedOf(eff: Seq[(String, Double)]) = eff.collect {
      case (n, t) if base.contains(n) && base(n) > 0 => (n, t / base(n)) }
    // Second retimer pass (VERDICT r6 #2): the suspect gate above uses the
    // FIRST-PASS median, while the final over_2x_normalized list uses the
    // post-retime effective median — a marginal query could be LISTED as
    // over-2x-normalized without ever getting its second timing. Iterated
    // to a bounded fixpoint: each retime round can itself shift the
    // effective median and push a new marginal query over the bar, so keep
    // re-timing until no unretimed member remains (or the round cap trips —
    // warned, same no-silent-caps discipline as the first pass).
    var retimed = retime(suspects)
    var normPasses = 0
    var pending = Seq.empty[String]
    var normLoop = true
    while (normLoop) {
      val (capped, totalSusp) = selectNormSuspects(
        sharedOf(effectiveOf(retimed)).toMap, retimed.keySet ++ retimeFailed)
      pending = capped
      if (pending.isEmpty || normPasses >= 3) normLoop = false
      else {
        // warn only on a pass that will actually run (review r9: the old
        // in-condition print also fired on the exiting iteration,
        // describing a retime that never executed)
        if (totalSusp > capped.size)
          System.err.println(s"[bench] WARNING: $totalSusp normalized-gate suspects, " +
            s"re-timing only the first ${capped.size}")
        retimed ++= retime(pending)
        normPasses += 1
      }
    }
    if (pending.nonEmpty)
      System.err.println(s"[bench] WARNING: normalized-gate retimer hit its " +
        s"$normPasses-pass bound with ${pending.size} members still unretimed")
    val effective = effectiveOf(retimed)
    val shared = sharedOf(effective)
    val medianRatio = med(shared.map(_._2).toSeq)
    def names(xs: Seq[String]): String = xs.sorted.map("\"" + esc(_) + "\"").mkString("[", ",", "]")
    val over2xRaw = shared.filter(_._2 > 2.0).map(_._1)
    val over2xNorm =
      if (medianRatio > 0) shared.filter(_._2 / medianRatio > 2.0).map(_._1) else Nil
    val retimedJson = retimed.toSeq.sortBy(_._1).map { case (k, v) =>
      "\"" + esc(k) + "\":" + String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    }.mkString("{", ",", "}")
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errJson,"n_queries":${results.size},"sf":"${esc(sfDir)}","load_avg_start":${f2(loadStart)},"load_avg_end":${f2(loadEnd)},"host_cpus":$hostCpus,"contaminated":$contaminated,"host_degraded":$hostDegraded,"calib_sec_start":${f2(calibStart)},"calib_sec_end":${f2(calibEnd)},"steal_pct":${f2(stealPct)},"n_shared_with_baseline":${shared.size},"shared_median_vs_baseline":${f2(medianRatio)},"queries_retimed":$retimedJson,"over_2x_raw":${names(over2xRaw)},"over_2x_normalized":${names(over2xNorm)}}"""
    println(line)
    // Also persist the line verbatim (VERDICT r6 #3): the driver's stdout
    // capture truncates the 169-query JSON, losing the per-query map. Only
    // full-catalog runs overwrite the artifact — a dev subset run must not
    // clobber the round's record. Best-effort: never fail the bench on IO.
    if (nameFilter == ".*") try
      java.nio.file.Files.writeString(java.nio.file.Paths.get("BENCH_LAST.json"), line + "\n")
    catch { case e: Throwable => System.err.println(s"[bench] BENCH_LAST.json write failed: ${e.getMessage}") }
    spark.stop()
  }

  /** Single-thread host degradation predicate: the post-run calibration
    * loop running >1.3x slower than the pre-run one means per-core speed
    * fell DURING the run (frequency scaling, steal, a co-tenant pinning a
    * core) — every timing is suspect even if load average stayed flat.
    * Pure and separately testable (BenchLogicSpec); guards calibStart=0.
    */
  private[graft] def isHostDegraded(calibStart: Double, calibEnd: Double): Boolean =
    calibStart > 0 && calibEnd / calibStart > 1.3

  /** Median of a sample; -1.0 sentinel when empty (matches the JSON
    * line's "no baseline" convention).
    */
  private[graft] def med(s: Seq[Double]): Double =
    if (s.isEmpty) -1.0
    else {
      val v = s.sorted
      if (v.size % 2 == 1) v(v.size / 2) else (v(v.size / 2 - 1) + v(v.size / 2)) / 2
    }

  /** Which queries the one-shot retimer should re-run, given first-pass
    * per-query ratios vs baseline. Suspects are gated on the ratio
    * NORMALIZED by the first-pass median (floored at 1.0 so a fast box
    * never inflates ratios): a uniformly slow box — rounds 3-4 measured
    * every raw ratio at 2-4x — must produce ZERO suspects, because that
    * condition is the median's to report, not the retimer's to re-run.
    * The set is capped so a pathological run can at most re-time a
    * bounded slice of the catalog (with a warning), never double the
    * whole bench. Returns (capped suspects, total suspect count). Pure
    * and separately testable (BenchLogicSpec).
    */
  private[graft] def selectSuspects(firstRatios: Map[String, Double],
                                    maxRetimes: Int = 25): (Seq[String], Int) = {
    val m = math.max(med(firstRatios.values.toSeq), 1.0)
    val all = firstRatios.collect {
      case (n, r) if r > 2.0 && r / m > 2.0 => n }.toSeq.sorted
    (all.take(maxRetimes), all.size)
  }

  /** Second-pass retimer gate (VERDICT r6 #2): queries whose EFFECTIVE
    * (post-retime) ratio clears the normalized over-2x bar but were never
    * re-timed — the exact population the first pass can miss, because its
    * gate uses the first-pass median while the published list uses the
    * effective one. Called in a bounded loop (each retime round can shift
    * the median and expose a new marginal member). Returns (capped
    * suspects, total suspect count) so the caller can warn when the cap
    * truncates — same discipline as [[selectSuspects]]. Pure and
    * separately testable (BenchLogicSpec).
    */
  private[graft] def selectNormSuspects(effectiveRatios: Map[String, Double],
                                        alreadyRetimed: Set[String],
                                        maxRetimes: Int = 25): (Seq[String], Int) = {
    val m = med(effectiveRatios.values.toSeq)
    if (m <= 0) (Nil, 0)
    else {
      val all = effectiveRatios.collect {
        case (n, r) if r / m > 2.0 && !alreadyRetimed(n) => n
      }.toSeq.sorted
      (all.take(maxRetimes), all.size)
    }
  }

  /** Per-query base times parsed from BASELINE.md's measurement table
    * (`| <catalog_name> | <seconds> | ...`). Catalog names are bare
    * [a-z0-9_]+ tokens, so the prose tables (multi-word metric cells)
    * never match. Empty map when the file is absent — every derived field
    * then reports its -1/[] sentinel rather than failing the bench.
    */
  private def baselineTimes(): Map[String, Double] =
    try {
      val path = sys.env.getOrElse("SPARK_GRAFT_BASELINE", "BASELINE.md")
      // explicit UTF-8: BASELINE.md contains non-ASCII prose; under a POSIX
      // locale (empty LANG) Java 17's default charset is ASCII and the lazy
      // decode throws mid-iteration, silently zeroing the whole table
      val src = scala.io.Source.fromFile(path)(scala.io.Codec.UTF8)
      try {
        val row = """^\|\s*([a-z][a-z0-9_]*)\s*\|\s*([0-9]+\.?[0-9]*)\s*\|.*""".r
        src.getLines().collect { case row(n, t) => n -> t.toDouble }.toMap
      } finally src.close()
    } catch { case _: Throwable => Map.empty }

  /** First cpu line of /proc/stat as counters (None off-Linux). */
  private def procStat(): Option[Array[Long]] =
    try {
      val src = scala.io.Source.fromFile("/proc/stat")
      try Some(src.getLines().next().trim.split("\\s+").drop(1).map(_.toLong))
      finally src.close()
    } catch { case _: Throwable => None }

  /** Fixed single-thread CPU probe: 2x10^8 LCG steps, ~0.2-0.5 s. Measures
    * effective per-core speed (frequency + steal) independent of any
    * engine code, so totals from different machine conditions can be
    * normalized by the calib ratio.
    */
  private def calibrate(): Double = {
    val t0 = System.nanoTime()
    var x = 1234567891L
    var i = 0
    while (i < 200000000) {
      x = x * 6364136223846793005L + 1442695040888963407L
      i += 1
    }
    if (x == 42L) System.err.print("") // keep the loop observable
    (System.nanoTime() - t0) / 1e9
  }
}
