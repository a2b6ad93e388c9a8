package graft

import graft.ml.{ConvNet, ConvNetConfig}
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/** Round-8 native-DL scaling rehearsal (VERDICT r7 task 6): fit the SAME
  * planted spatial task through `ConvNet.fitParameterAveraging` at 1, 4
  * and 16 partitions and MEASURE what the parameter-averaging design
  * argues (the reference's own scale-out claim — dl4j-spark parameter
  * averaging, 13486_Code/build.sbt:30):
  *
  *  - per-epoch model traffic is O(|params| x partitions): each epoch
  *    collects one locally-trained weight vector per partition, measured
  *    here as the driver-collected task RESULT bytes of the fit;
  *  - wall time must not grow with partition count on fixed data (smaller
  *    local splits per task);
  *  - averaging must not degrade the learned model below the accuracy
  *    floor (more partitions = fewer local steps between averages — the
  *    known local-SGD trade, bounded, not a cliff).
  *
  * `sbt "Test/runMain graft.DlScaleRehearsal"` — results in SCALE.md.
  */
object DlScaleRehearsal {

  /** Sums successful-task result sizes (the collect of (pid, params) pairs
    * is the fit's only driver-bound traffic; accuracy jobs run OUTSIDE the
    * listener window).
    */
  private class ResultMeter extends SparkListener {
    @volatile var bytes = 0L
    @volatile var tasks = 0L
    override def onTaskEnd(te: SparkListenerTaskEnd): Unit = synchronized {
      if (te.taskInfo != null && te.taskInfo.successful && te.taskMetrics != null) {
        bytes += te.taskMetrics.resultSize
        tasks += 1
      }
    }
  }

  private def spatialData(n: Int, seed: Long): Seq[(Int, Array[Double])] = {
    val rnd = new scala.util.Random(seed)
    val size = 14
    (0 until n).map { i =>
      val cls = i % 3
      val img = Array.fill(size * size)(rnd.nextDouble() * 0.2)
      val pos = 2 + rnd.nextInt(size - 4)
      cls match {
        case 0 => for (j <- 0 until size) img(pos * size + j) = 0.8 + rnd.nextDouble() * 0.2
        case 1 => for (j <- 0 until size) img(j * size + pos) = 0.8 + rnd.nextDouble() * 0.2
        case 2 => for (j <- 0 until size) img(j * size + j) = 0.8 + rnd.nextDouble() * 0.2
      }
      (cls, img)
    }
  }

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.getOrCreate(32)
    import spark.implicits._
    val sc = spark.sparkContext

    val cfg = ConvNetConfig(inSize = 14, k = 3, conv1Maps = 4, conv2Maps = 6,
      hidden = 16, classes = 3, pool = 2)
    val epochs = 6
    val nParams = ConvNet.init(cfg, 42).arrays.map(_.length).sum
    val trainRows = spatialData(1920, seed = 5)
    val testDs = spark.createDataset(sc.parallelize(spatialData(480, seed = 99), 4))

    // warm JVM/codegen so the 1-partition row isn't billed session init
    spark.createDataset(sc.parallelize(trainRows.take(64), 1)).count()

    println(s"DLSCALE config: |params|=$nParams doubles " +
      s"(${nParams * 8 / 1024} KiB/model), epochs=$epochs, train=${trainRows.size} rows")
    for (parts <- Seq(1, 4, 16)) {
      val train = spark.createDataset(sc.parallelize(trainRows, parts))
      val meter = new ResultMeter
      sc.addSparkListener(meter)
      val t0 = System.nanoTime()
      val p = ConvNet.fitParameterAveraging(train, cfg, epochs = epochs,
        lr = 0.05, batchSize = 16, seed = 42)
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // listener bus drains asynchronously
      sc.removeSparkListener(meter)
      val acc = ConvNet.accuracy(testDs, cfg, p)
      val perEpochKiB = meter.bytes / 1024.0 / epochs
      val modelKiB = nParams * 8.0 / 1024
      println(f"DLSCALE parts=$parts%2d wall=$wall%6.2fs acc=$acc%.3f " +
        f"resultBytes/epoch=$perEpochKiB%8.1fKiB " +
        f"(~${perEpochKiB / modelKiB}%4.1f models/epoch vs $parts partitions) " +
        f"tasks=${meter.tasks}%3d")
    }
    spark.stop()
  }
}
