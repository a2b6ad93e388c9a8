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

  /** Parent-directory segment of a path — the raw form, for sources whose
    * path column is ALREADY unescaped (review r9: Spark's binaryFile
    * source fills `path` from Hadoop Path.toString, the deliberately
    * unescaped form — url-decoding it a second time throws on a directory
    * literally named '50%off' and silently mangles 'a%20b').
    */
  private def parentDirSegment(path: org.apache.spark.sql.Column) =
    regexp_extract(path, "/([^/]+)/[^/]+$", 1)

  /** Parent-directory label from a PERCENT-ENCODED file URI
    * (input_file_name's form): decode %XX escapes ONLY — url_decode alone
    * applies form semantics where '+' means space, but URI path encoding
    * never writes a space as '+', so a directory literally named 'c++'
    * would mislabel as 'c  ' and 'a+b'/'a b' would collide (review r9).
    * Escaping literal '+' to %2B first makes url_decode a pure
    * percent-decoder; a pre-existing literal '%2B' arrives encoded as
    * '%252B' and still round-trips. (reviews r8 + r9)
    */
  private def parentDirLabelEncoded(path: org.apache.spark.sql.Column) =
    url_decode(regexp_replace(parentDirSegment(path), "\\+", "%2B"))

  /** One row per file: (path, text, label = parent directory name). */
  def wholeTextWithLabels(spark: SparkSession, dir: String): DataFrame =
    spark.read.option("wholetext", "true").text(s"$dir/*/*")
      .select(input_file_name().as("path"), col("value").as("text"))
      .withColumn("label", parentDirLabelEncoded(col("path")))

  /** One row per binary file: (path, length, content, label = parent
    * directory name). The binaryFile path column is unescaped already —
    * no decode (see [[parentDirSegment]]).
    */
  def binaryWithLabels(spark: SparkSession, dir: String): DataFrame =
    spark.read.format("binaryFile").load(s"$dir/*/*")
      .select(col("path"), col("length"), col("content"))
      .withColumn("label", parentDirSegment(col("path")))

  /** Lenient JSONL ingest with a quarantine channel. Raw crawl/feed data
    * always contains malformed records; FAILFAST turns one bad line into a
    * dead 100 TB job, and default PERMISSIVE silently nulls the row's
    * fields — the record is lost without a trace. This reads PERMISSIVE
    * with an explicit corrupt-record column and splits the stream:
    *
    *  - `good`: rows that parsed against `schema` (corrupt column dropped);
    *  - `quarantine`: one `raw_record` column holding the malformed line
    *    VERBATIM — repair tooling re-parses from the raw line, which
    *    loses nothing (partially-parsed fields are derivable from it).
    *
    * Implementation: a TEXT scan + `from_json` with a corrupt-record
    * column, not the json file source's internal `_corrupt_record` — the
    * internal column forbids projections that read only it (Spark's
    * QUERY_ONLY_CORRUPT_RECORD_COLUMN restriction, which is exactly the
    * shape a quarantine audit query takes), while `from_json` is a plain
    * expression with no such limit, the raw line is verbatim by
    * construction, and the same text→parse shape drops into `readStream`
    * unchanged. Both sides stay lazy single-pass scans.
    */
  def readJsonQuarantine(spark: SparkSession, path: String,
                         schema: org.apache.spark.sql.types.StructType):
      (DataFrame, DataFrame) = {
    val corruptCol = "_graft_corrupt"
    require(!schema.fieldNames.contains(corruptCol), s"schema already has $corruptCol")
    val parsed = spark.read.text(path).select(
      col("value"),
      from_json(col("value"), schema.add(corruptCol, org.apache.spark.sql.types.StringType),
        Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> corruptCol))
        .as("parsed"))
    // from_json returns a NULL struct (no corrupt record) for blank,
    // whitespace-only and literal `null` lines — those must reach the
    // quarantine too, or they'd pass as silent all-null "good" rows, the
    // exact loss mode this channel exists to prevent. getField (not a
    // dotted path) so schema field names containing dots resolve literally.
    val isGood = col("parsed").isNotNull &&
      col("parsed").getField(corruptCol).isNull
    val good = parsed.where(isGood)
      .select(schema.fieldNames.map(f => col("parsed").getField(f).as(f)).toIndexedSeq: _*)
    val quarantine = parsed.where(!isGood).select(col("value").as("raw_record"))
    (good, quarantine)
  }
}
