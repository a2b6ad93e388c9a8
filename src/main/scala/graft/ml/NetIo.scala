package graft.ml

import org.apache.spark.sql.{SaveMode, SparkSession}

/** Model sink/source for the native nets (S9 for the from-scratch family —
  * the reference persists its DL4J models via ModelSerializer,
  * 13486_Code/src/main/scala/chapter3/MNISTAnomalyDetector.java uses the
  * standard save/restore cycle): weights ride as a PARQUET table of
  * `(array_idx, pos, value)` — no Java serialization, so a saved model is
  * readable by any Spark/DuckDB/pandas reader, diffable, and stable across
  * Scala/JVM versions. Works for every [[FlatParams]] implementor
  * ([[ConvNet]], [[Lstm]], [[Autoencoder]]) through the same two calls.
  *
  * Shape safety: `load` rebuilds into a caller-supplied TEMPLATE (usually
  * `Model.init(cfg, seed)`), and refuses a table whose array count or
  * lengths disagree with it — a config/file mismatch fails fast instead of
  * silently mis-assigning weights.
  */
object NetIo {

  /** Write `params` as a parquet weight table (overwrite). Weights are KBs
    * to MBs, so a single file is written (coalesce(1)) — the artifact is a
    * model, not a dataset.
    */
  def save[P <: FlatParams[P]](spark: SparkSession, params: P, path: String): Unit = {
    import spark.implicits._
    val rows = params.arrays.zipWithIndex.flatMap { case (arr, ai) =>
      arr.iterator.zipWithIndex.map { case (v, i) => (ai, i, v) }
    }
    rows.toDF("array_idx", "pos", "value")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(path)
  }

  /** Read a weight table back into the template's shape (bit-exact: values
    * round-trip as doubles through parquet).
    */
  def load[P <: FlatParams[P]](spark: SparkSession, template: P, path: String): P = {
    import spark.implicits._
    val byArray = spark.read.parquet(path)
      .select("array_idx", "pos", "value").as[(Int, Int, Double)]
      .collect().groupBy(_._1)
    val shapes = template.arrays.map(_.length)
    // zero-length template arrays write zero rows (save's flatMap emits
    // nothing for them), so they are legitimately absent from the table —
    // requiring the full index range would make such a model unable to
    // ever round-trip (review r9)
    val expected = shapes.indices.filter(shapes(_) > 0).toSet
    require(byArray.keySet == expected,
      s"weight table has arrays ${byArray.keySet.toSeq.sorted}, template expects ${expected.toSeq.sorted}")
    val arrs = shapes.indices.map { ai =>
      if (shapes(ai) == 0) Array.empty[Double]
      else {
        val entries = byArray(ai)
        require(entries.length == shapes(ai),
          s"array $ai has ${entries.length} weights, template expects ${shapes(ai)}")
        val a = new Array[Double](shapes(ai))
        // full position coverage, no duplicates: a table with a repeated
        // pos and a missing one has the RIGHT row count but would load a
        // nondeterministic value at the duplicate and a silent 0.0 at the
        // hole — exactly the mis-assignment this loader promises to refuse
        val seen = new java.util.BitSet(a.length)
        for ((_, pos, v) <- entries) {
          require(pos >= 0 && pos < a.length, s"array $ai position $pos out of range")
          require(!seen.get(pos), s"array $ai has a duplicate weight at position $pos")
          seen.set(pos)
          a(pos) = v
        }
        a
      }
    }
    template.rebuild(arrs)
  }
}
