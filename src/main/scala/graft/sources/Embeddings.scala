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
    *
    * Words containing whitespace (or null words) are REFUSED, matching
    * [[writeWordVectorsBinary]]'s guard: the line format delimits on
    * whitespace, so 'new york' would read back as word='new' and be
    * silently dropped, and an embedded newline would fabricate a bogus
    * vocabulary entry from its tail (review r9).
    */
  def writeWordVectors(df: DataFrame, wordCol: String, vecCol: String,
                       path: String): Unit = {
    val offender = df.select(col(wordCol).cast("string").as("w"))
      .where(col("w").isNull || col("w") === "" || col("w").rlike("[\\s]"))
      .limit(1).collect()
    offender.foreach { r =>
      throw new IllegalArgumentException(
        s"writeWordVectors: word '${r.getString(0)}' is null, empty or contains " +
          "whitespace — the text format cannot delimit it (an empty word's line " +
          "reads back with its first component promoted to the word); replace " +
          "separators (word2vec phrase convention is '_') before writing")
    }
    // a NULL vector COMPONENT would be silently skipped by concat_ws,
    // shortening the written vector — refuse where the cause is nameable
    val nullElem = df.select(col(wordCol).cast("string").as("w"), col(vecCol).as("v"))
      .where(exists(col("v"), _.isNull)).limit(1).collect()
    nullElem.foreach { r =>
      throw new IllegalArgumentException(
        s"writeWordVectors: word '${r.getString(0)}' carries a null vector " +
          "component — concat_ws would silently drop it and the vector would " +
          "read back shortened; repair or filter the row first")
    }
    df.select(concat_ws(" ", col(wordCol),
        transform(col(vecCol), v => v.cast("string"))).as("value"))
      .write.mode(SaveMode.Overwrite).text(path)
  }

  /** Read the word2vec BINARY interchange format (the original C tool's
    * layout, what GoogleNews-vectors ships as — the reference's
    * loadStaticModel input, chapter2/PredictCommentsUsingRNNAndWord2Vec
    * .java:55): ASCII header "vocab dim\n", then per word the token bytes
    * up to a space followed by dim little-endian float32s and an optional
    * newline. Yields the same (word: string, vec: array<float>) schema as
    * [[readWordVectors]], so it feeds the identical broadcast lookup-join
    * path (s8).
    *
    * The format is not line-splittable (binary payloads contain every
    * byte value), so the file parses as ONE stream on the driver — fine
    * by design: a vocabulary table is dimension-small next to a corpus
    * (3M x 300 floats for GoogleNews), and it broadcasts afterwards
    * anyway. Opens through the Hadoop FileSystem, so any configured
    * scheme (file:/hdfs:/s3a:) works. Non-finite components drop the
    * word, matching the text reader's hygiene contract.
    */
  def readWordVectorsBinary(spark: SparkSession, path: String,
                            dim: Option[Int] = None): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = new java.io.DataInputStream(new java.io.BufferedInputStream(fs.open(p)))
    val rows = try {
      def readToken(stop: Byte, skipLeadingWs: Boolean): String = {
        // collect BYTES and decode once as UTF-8: per-byte toChar would be
        // Latin-1, mangling every non-ASCII word ('café' -> 'cafÃ©') while
        // the writer encodes UTF-8 — an asymmetric round-trip that made
        // the broadcast lookup miss every such vocabulary entry
        val bytes = new java.io.ByteArrayOutputStream
        var b = in.read()
        while (skipLeadingWs && (b == '\n' || b == '\r' || b == ' ')) b = in.read()
        while (b != -1 && b != stop && b != '\n') { bytes.write(b); b = in.read() }
        if (b == -1 && bytes.size == 0)
          throw new java.io.EOFException(s"truncated word2vec binary file: $path")
        new String(bytes.toByteArray, java.nio.charset.StandardCharsets.UTF_8)
      }
      val vocab = readToken(' ', skipLeadingWs = false).toInt
      val d = readToken('\n', skipLeadingWs = true).trim.toInt
      // vocab=0 is a legal degenerate file (the writer's own output for an
      // empty frame must round-trip — review r9); d >= 1 is only required
      // when there are words to carry vectors
      // cap dim so a forged header cannot overflow 4*d in Int or attempt a
      // multi-GB driver allocation with no diagnostic (largest public
      // models are dim ~4096; 1M is generous headroom — review r10)
      require(vocab >= 0 && (vocab == 0 || (d >= 1 && d <= 1000000)),
        s"implausible word2vec header: vocab=$vocab dim=$d")
      val buf = new Array[Byte](4 * d)
      (0 until vocab).iterator.map { _ =>
        val word = readToken(' ', skipLeadingWs = true)
        in.readFully(buf)
        val bb = java.nio.ByteBuffer.wrap(buf).order(java.nio.ByteOrder.LITTLE_ENDIAN)
        val vec = Array.fill(d)(bb.getFloat)
        (word, vec.toSeq)
      }.filter(_._2.forall(v => !v.isNaN && !v.isInfinite)).toSeq
    } finally in.close()
    import spark.implicits._
    val parsed = rows.toDF("word", "vec")
    dim.map(d => parsed.where(size(col("vec")) === d)).getOrElse(parsed)
  }

  /** Write (word, vec) rows as a word2vec binary model file ([[
    * readWordVectorsBinary]]'s format). Driver-side single file by the
    * format's nature; vectors must share one dimension.
    */
  def writeWordVectorsBinary(df: DataFrame, wordCol: String, vecCol: String,
                             path: String): Unit = {
    val rows = df.select(col(wordCol).cast("string"),
      col(vecCol).cast("array<float>")).collect()
    // nameable refusals, not NPEs (review r9): null words/vectors and
    // delimiter-bearing words all desynchronize or corrupt the stream
    rows.find(r => r.isNullAt(0) || r.isNullAt(1)).foreach { r =>
      throw new IllegalArgumentException(
        s"writeWordVectorsBinary: row with null ${if (r.isNullAt(0)) "word"
          else "vector"} cannot serialize (word=${r.get(0)}, vec=${r.get(1)})")
    }
    // the format delimits words with space/newline: a word CONTAINING one
    // would desynchronize the stream and silently poison every later
    // (word, vec) pair — refuse it here, where the cause is nameable
    rows.find(r => r.getString(0).isEmpty ||
        r.getString(0).exists(c => c == ' ' || c == '\n' || c == '\r'))
      .foreach { r =>
        throw new IllegalArgumentException(
          s"writeWordVectorsBinary: word '${r.getString(0)}' is empty or " +
            "contains a space/newline — the binary format cannot delimit it " +
            "(an empty word desynchronizes the read stream: its delimiter " +
            "space is eaten as leading whitespace and raw float bytes become " +
            "the word); replace separators ('_') or drop the row")
      }
    rows.find(r => r.getSeq[Any](1).exists(_ == null)).foreach { r =>
      throw new IllegalArgumentException(
        s"writeWordVectorsBinary: word '${r.getString(0)}' carries a null " +
          "vector component — it cannot serialize as a float; repair or " +
          "filter the row first")
    }
    val dims = rows.map(_.getSeq[Float](1).size).distinct
    require(dims.length <= 1, s"mixed vector dims ${dims.toSeq} cannot serialize")
    val d = dims.headOption.getOrElse(0)
    // zero-dim vectors on a NON-empty frame would write a "N 0" header the
    // reader rightly rejects; an empty frame writes "0 0", which reads
    // back as an empty table (review r9)
    require(rows.isEmpty || d >= 1,
      "writeWordVectorsBinary: zero-dimension vectors cannot serialize")
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
    val out = new java.io.BufferedOutputStream(fs.create(p, true))
    try {
      out.write(s"${rows.length} $d\n".getBytes("UTF-8"))
      val bb = java.nio.ByteBuffer.allocate(4 * d).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      rows.foreach { r =>
        out.write((r.getString(0) + " ").getBytes("UTF-8"))
        bb.clear()
        r.getSeq[Float](1).foreach(bb.putFloat)
        out.write(bb.array())
        out.write('\n')
      }
    } finally out.close()
  }
}
