package graft

/** Dev tool: print the full `explain("formatted")` of catalogued queries —
  * the per-node detail (PushedFilters, ReadSchema, codegen ids) that
  * PlanAudit's tree-only dump omits.
  * Usage: tools/run.sh graft.Explain <query> [<query> ...] [sfDir]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val (names, dir) = args.partition(a => !a.startsWith("/"))
    val sfDir = dir.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = GraftSession.getOrCreate(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt)
    names.foreach { name =>
      println(s"\n===== $name =====")
      SparkEntry.queries(name)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
