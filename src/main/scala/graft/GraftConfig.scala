package graft

import org.apache.spark.sql.SparkSession

/** Typed run configuration (the reference's config surface —
  * 13486_Code/src/main/resources/application.conf:1-26 — re-exposed with the
  * same keys and defaults). The reference used Typesafe HOCON; that library
  * no longer ships with Spark 4, so per SURVEY §1.1 the values ride on
  * `spark.conf` (`spark.graft.*` keys, settable via --conf / spark-defaults)
  * with the reference's defaults preserved. Engine code takes these as
  * parameters; this is the boundary where deployment config enters.
  */
final case class GraftConfig(
    cores: Int,
    batchSize: Int,
    seed: Long,
    epochs: Int,
    datasetTotal: Int,
    datasetTrain: Int,
    numClasses: Int,
    imageHeight: Int,
    imageWidth: Int,
    imageChannels: Int)

object GraftConfig {

  /** application.conf:2-26 defaults. */
  val Defaults: GraftConfig = GraftConfig(
    cores = 6, batchSize = 100, seed = 123L, epochs = 50,
    datasetTotal = 500, datasetTrain = 400, numClasses = 10,
    imageHeight = 28, imageWidth = 28, imageChannels = 1)

  def load(settings: Map[String, String]): GraftConfig = {
    def int(key: String, dflt: Int): Int = settings.get(key).map(_.trim.toInt).getOrElse(dflt)
    def long(key: String, dflt: Long): Long = settings.get(key).map(_.trim.toLong).getOrElse(dflt)
    GraftConfig(
      cores = int("spark.graft.cores", Defaults.cores),
      batchSize = int("spark.graft.batchSize", Defaults.batchSize),
      seed = long("spark.graft.seed", Defaults.seed),
      epochs = int("spark.graft.epochs", Defaults.epochs),
      datasetTotal = int("spark.graft.dataset.total", Defaults.datasetTotal),
      datasetTrain = int("spark.graft.dataset.train", Defaults.datasetTrain),
      numClasses = int("spark.graft.dataset.classes", Defaults.numClasses),
      imageHeight = int("spark.graft.image.height", Defaults.imageHeight),
      imageWidth = int("spark.graft.image.width", Defaults.imageWidth),
      imageChannels = int("spark.graft.image.channels", Defaults.imageChannels))
  }

  def load(spark: SparkSession): GraftConfig = load(spark.conf.getAll)
}
