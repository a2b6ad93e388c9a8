package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared session for all suites (getOrCreate reuses one JVM-wide session;
  * config matches the engine's GraftSession so plans tested here are the
  * plans the harness runs).
  */
object SharedSpark {
  lazy val spark: SparkSession = GraftSession.getOrCreate(4)
  val sfDir = "/root/testdata/sf0.001"
}

trait SparkSpec extends AnyFunSuite {
  def spark: SparkSession = SharedSpark.spark
  def sfDir: String = SharedSpark.sfDir
}
