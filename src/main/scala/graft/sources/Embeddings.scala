package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** External word-vector file source (SURVEY S8 — the static-model load of
  * chapter2/PredictCommentsUsingRNNAndWord2Vec.java:55, which reads a
  * pre-trained GoogleNews model instead of training one): loads the
  * word2vec/GloVe text interchange format, one `word v1 v2 ... vn` line
  * per word, into a (word, vec) DataFrame that feeds the same broadcast
  * lookup-join path as the trained m5 table.
  *
  * Scale: the file parses distributedly (spark.read.text splits it like
  * any text input); a vocabulary table is dimension-small next to a corpus,
  * so the lookup join broadcasts it — the corpus never shuffles for
  * embedding lookup.
  */
object Embeddings {

  /** Read a text vector file into (word: string, vec: array<float>).
    *
    * Tolerates the optional word2vec header line ("count dim") and skips
    * malformed lines: fewer than 3 components (so vectors must have
    * dim >= 2 — a 2-component line is indistinguishable from the header),
    * or any non-FINITE component ('oops', but also 'nan'/'inf', which the
    * float cast would otherwise accept and silently poison every
    * downstream pooled mean with). Pass `dim` to additionally enforce one
    * vector width and drop the rest.
    */
  def readWordVectors(spark: SparkSession, path: String,
                      dim: Option[Int] = None): DataFrame = {
    val parts = split(trim(col("value")), "\\s+")
    val bad = (v: Column) =>
      v.isNull || isnan(v) || abs(v) === lit(Float.PositiveInfinity)
    val parsed = spark.read.text(path)
      .where(size(parts) >= 3) // header ("count dim") and blank lines drop here
      .select(element_at(parts, 1).as("word"),
        transform(slice(parts, lit(2), size(parts) - 1),
          v => v.try_cast("float")).as("vec")) // try_cast: ANSI-safe, malformed -> null
      .where(!exists(col("vec"), bad))
    dim.map(d => parsed.where(size(col("vec")) === d)).getOrElse(parsed)
  }

  /** Write (word, vec) rows back to the text interchange format.
    * concat_ws flattens array arguments, so one call renders the line.
    * Rows with empty vectors write as a bare word, which readWordVectors
    * then skips — a useless embedding does not survive a round-trip.
    */
  def writeWordVectors(df: DataFrame, wordCol: String, vecCol: String,
                       path: String): Unit =
    df.select(concat_ws(" ", col(wordCol),
        transform(col(vecCol), v => v.cast("string"))).as("value"))
      .write.mode(SaveMode.Overwrite).text(path)
}
