package graft.ml

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.Dataset
import org.apache.spark.storage.StorageLevel

/** Shared machinery for the native nets ([[ConvNet]], [[Lstm]]): init/softmax
  * numerics and the ONE parameter-averaging driver loop both models train
  * through — a single copy, so fixes to the averaging protocol (empty-input
  * handling, broadcast lifecycle, determinism ordering) cannot drift between
  * models.
  */
/** Flat-array parameter container: ONE copy of the clone/zero/axpy
  * plumbing all three nets' params ride through, so a numerics change to
  * the averaging arithmetic lands everywhere at once. Implementors provide
  * `arrays` (a stable ordering of every parameter array) and `rebuild`
  * (reconstruct from a same-shaped sequence).
  */
trait FlatParams[P <: FlatParams[P]] extends Serializable { self: P =>
  def arrays: Seq[Array[Double]]
  def rebuild(arrs: Seq[Array[Double]]): P
  final def copyOf: P = rebuild(arrays.map(_.clone()))
  final def zeroed: P = rebuild(arrays.map(a => new Array[Double](a.length)))
  final def addInPlace(o: P): P = {
    for ((a, b) <- arrays.zip(o.arrays); i <- a.indices) a(i) += b(i)
    this
  }
  final def scaleInPlace(s: Double): P = {
    for (a <- arrays; i <- a.indices) a(i) *= s
    this
  }
}

private[ml] object NetOps {

  def xavier(rnd: scala.util.Random, n: Int, fanIn: Int, fanOut: Int): Array[Double] = {
    val limit = math.sqrt(6.0 / (fanIn + fanOut))
    Array.fill(n)((rnd.nextDouble() * 2 - 1) * limit)
  }

  def softmax(z: Array[Double]): Array[Double] = {
    val m = z.max
    val e = z.map(v => math.exp(v - m))
    val s = e.sum
    e.map(_ / s)
  }

  /** The per-epoch parameter-averaging loop (the reference's DL4J
    * ParameterAveragingTrainingMaster pattern; SparkNet, Moritz et al.
    * 2015): broadcast current weights, run `train` locally inside each
    * non-empty partition over a seeded shuffle of its rows, average the
    * partition results ON THE DRIVER IN PARTITION ORDER — float addition is
    * not associative, so a treeReduce (combine order = task completion
    * order) would make the fit run-to-run nondeterministic, while
    * partition-ordered summation makes it bit-deterministic under a fixed
    * seed + partitioning.
    *
    * MEMORY BOUND: each task materializes its whole partition (plus one
    * shuffled copy of the row references) to run the seeded local shuffle,
    * so per-task heap is O(partition bytes) — the standard local-SGD
    * trade (the reference's dl4j-spark ParameterAveragingTrainingMaster
    * fits each worker's split the same way). At 100 TB a partition of
    * decoded Double rows can be several GB, so the bound is ENFORCED: a
    * partition over `spark.graft.ml.maxRowsPerPartition` rows (default
    * 2,000,000 — ~1 GB of 64-double rows) fails fast with an error naming
    * `repartition`, instead of OOM-killing the executor mid-epoch. More
    * partitions also means more local models averaged per epoch, which is
    * the intended scale-out axis anyway.
    *
    * Per-epoch traffic is one weight vector per
    * partition, independent of corpus size. An entirely empty dataset
    * returns the initial weights unchanged (empty-input posture: quiet
    * no-op, never a crash). Caches the RDD only if the caller has not
    * already persisted it (no double-cache), and restores that state after.
    */
  def averageEpochs[R, P: scala.reflect.ClassTag](data: Dataset[R], epochs: Int, seed: Long)
                         (initial: P)
                         (copy: P => P)
                         (train: (P, Vector[R]) => Unit)
                         (average: Seq[P] => P): P = {
    val sc = data.sparkSession.sparkContext
    // read on the driver, captured by the task closure (no session on executors)
    val maxRows = data.sparkSession.conf
      .get("spark.graft.ml.maxRowsPerPartition", "2000000").toLong
    val rdd: RDD[R] = data.rdd
    // no double-cache: if the caller already persisted the Dataset, the
    // derived RDD re-reads its InMemoryRelation each epoch — cheap — and
    // caching it again would hold a second copy of every row
    val weCache = data.storageLevel == StorageLevel.NONE &&
      rdd.getStorageLevel == StorageLevel.NONE
    if (weCache) rdd.cache()
    var params = initial
    try {
      for (epoch <- 1 to epochs) {
        val bc = sc.broadcast(params)
        try {
          val locals = rdd
            .mapPartitionsWithIndex { (pid, it) =>
              val buf = Vector.newBuilder[R]
              var n = 0L
              while (it.hasNext) {
                n += 1
                if (n > maxRows)
                  throw new IllegalStateException(
                    s"averageEpochs: partition $pid exceeds " +
                      s"spark.graft.ml.maxRowsPerPartition = $maxRows rows. " +
                      "Local-SGD training materializes each partition on the task " +
                      "heap for its seeded shuffle — repartition(...) the dataset " +
                      "into smaller partitions (more partitions = more local models " +
                      "averaged, the intended scale-out), or raise the limit if " +
                      "executor memory allows.")
                buf += it.next()
              }
              val rows = buf.result()
              if (rows.isEmpty) Iterator.empty
              else {
                val local = copy(bc.value)
                val shuffled = new scala.util.Random(seed + epoch * 1013L + pid).shuffle(rows)
                train(local, shuffled)
                Iterator.single((pid, local))
              }
            }
            .collect().sortBy(_._1).map(_._2).toIndexedSeq
          if (locals.nonEmpty) params = average(locals)
        } finally bc.destroy()
      }
      params
    } finally if (weCache) rdd.unpersist()
  }

  /** Distributed accuracy with a deterministically-destroyed broadcast;
    * NaN on an empty dataset (undefined, not a crash).
    */
  def accuracyOf[R, P: scala.reflect.ClassTag](data: Dataset[R], p: P)
                (correct: (P, R) => Boolean): Double = {
    val bc = data.sparkSession.sparkContext.broadcast(p)
    try {
      val (hit, n) = data.rdd
        .map(r => (if (correct(bc.value, r)) 1L else 0L, 1L))
        .fold((0L, 0L)) { case ((h1, n1), (h2, n2)) => (h1 + h2, n1 + n2) }
      if (n == 0) Double.NaN else hit.toDouble / n
    } finally bc.destroy()
  }
}
