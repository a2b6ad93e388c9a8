package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-per-document corpus sources (SURVEY S3/S4/F11) — the reference's
  * aclImdb/{pos,neg} directory layout (chapter2/Word2VecTransformingIterator.java:47-50)
  * and ParentPathLabelGenerator image dirs (chapter_4/MnistClassification.java:59-63),
  * re-expressed as distributed reads: no driver-side File.listFiles, the
  * file listing and reads scale across executors.
  */
object TextCorpus {

  /** One row per file: (path, label = parent directory name, text). */
  def wholeTextWithLabels(spark: SparkSession, dir: String): DataFrame =
    spark.read.option("wholetext", "true").text(s"$dir/*/*")
      .select(input_file_name().as("path"), col("value").as("text"))
      .withColumn("label", regexp_extract(col("path"), "/([^/]+)/[^/]+$", 1))

  /** One row per binary file: (path, label, length, content). */
  def binaryWithLabels(spark: SparkSession, dir: String): DataFrame =
    spark.read.format("binaryFile").load(s"$dir/*/*")
      .select(col("path"), col("length"), col("content"))
      .withColumn("label", regexp_extract(col("path"), "/([^/]+)/[^/]+$", 1))
}
