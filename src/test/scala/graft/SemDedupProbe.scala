package graft

import org.apache.spark.sql.functions._

/** Dev probe (r8, VERDICT task 1): where does e2_semdedup's wall time go?
  * Times the entry's phases separately in one warmed session so the stale
  * 2.84 s base can be re-recorded with a root cause, or the cost clawed
  * back. `sbt "Test/runMain graft.SemDedupProbe [sfDir]"`.
  */
object SemDedupProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.getOrCreate(32)
    // warmup
    spark.read.parquet(s"$d/region.parquet").groupBy("r_regionkey").count().collect()

    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"SEMPROBE $name%-28s ${(System.nanoTime() - t0) / 1e9}%6.2fs")
      r
    }

    for (round <- 1 to 2) {
      println(s"--- round $round")
      val base = sources.Tables.embeddings(spark, d).select(col("vec_id"), col("embedding"))
      val corpus = base.union(base.where(col("vec_id") < 10)
        .select((col("vec_id") + 1000000).as("vec_id"), col("embedding")))

      import org.apache.spark.ml.clustering.KMeans
      import org.apache.spark.ml.functions.array_to_vector
      val feat = corpus.select(col("vec_id"), col("embedding"),
        array_to_vector(col("embedding")).as("features"))
      val fitInput = feat.where(operators.Sampling.drawOn(col("vec_id"), "semdedup_fit") % 1000000 < 500000)
      val model = timed("kmeans_fit") {
        new KMeans().setK(16).setSeed(42).setMaxIter(4).setInitMode("random").fit(fitInput)
      }
      val assigned = operators.Pinned.pin(model.transform(feat)
        .select(col("vec_id"), col("embedding"), col("prediction").as("cell")))
      timed("assign+pin")(assigned.count())

      val a = assigned.select(col("cell"), col("vec_id").as("a_id"), col("embedding").as("a_emb"))
      val b = assigned.select(col("cell"), col("vec_id").as("b_id"), col("embedding").as("b_emb"))
      val edges = operators.Pinned.pin(
        a.join(b, "cell").where(col("a_id") < col("b_id"))
          .select(col("a_id"), col("b_id"),
            graft.plans.NativeColumns.cosine(col("a_emb"), col("b_emb")).as("cos"))
          .where(col("cos") >= 0.999))
      timed("edges(quadratic)+pin")(edges.count())
      val comps = timed("connected_components") {
        val c = operators.Dedup.connectedComponents(edges.select("a_id", "b_id"))
        c.count(); c
      }
      timed("final_entry_total") {
        SparkEntry.queries("e2_semdedup")(spark, d).count()
      }
      operators.Pinned.release()
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
