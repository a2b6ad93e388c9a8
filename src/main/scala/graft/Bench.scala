package graft

/** Benchmark main: times every catalogued query at SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line. Failures are reported per-query in an "errors"
  * object (never silently folded into a wall time — see VERDICT.md round 1).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.getOrCreate(cpus)
    // Untimed warmup: first use of the parquet reader, whole-stage codegen
    // compiler, and shuffle machinery costs seconds of one-time JVM init
    // that would otherwise be billed to whichever query sorts first.
    try spark.read.parquet(s"$sfDir/region.parquet")
      .groupBy("r_regionkey").count().collect()
    catch { case _: Throwable => () } // warmup only — never fail the run
    var errors = List.empty[(String, String)]
    val results = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).count()
        // queries persist/cache intermediates; drop them so 100+ sequential
        // queries don't accumulate blocks and skew later timings
        spark.catalog.clearCache()
        Some(name -> (System.nanoTime() - t0) / 1e9)
      } catch {
        case e: Throwable =>
          errors ::= (name -> Option(e.getMessage).getOrElse(e.getClass.getName).take(200))
          None
      }
    }
    def esc(s: String): String =
      s.flatMap { case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
                  case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString }
    // Locale.ROOT: a comma-decimal default locale would break the JSON line
    val qs = results.map { case (k, v) =>
      "\"" + esc(k) + "\":" + String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    }.mkString("{", ",", "}")
    val errJson = errors.map { case (k, v) => "\"" + esc(k) + "\":\"" + esc(v) + "\"" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errJson,"n_queries":${results.size},"sf":"$sfDir"}""")
    spark.stop()
  }
}
