package graft

import java.io.{ByteArrayOutputStream, DataOutputStream, File, FileOutputStream}
import java.nio.file.Files
import java.util.zip.GZIPOutputStream
import graft.sources.{IdxSource, IngestUtil, TextCorpus}

/** Source/ingest tests (S3-S7): corpus dirs, IDX binaries, tar.gz extract. */
class SourcesSpec extends SparkSpec {

  import SharedSpark.spark.implicits._

  test("S3/F11: wholetext corpus read with parent-dir labels") {
    val root = Files.createTempDirectory("graft-corpus").toFile
    for (lbl <- Seq("pos", "neg"); i <- 0 until 3) {
      val d = new File(root, lbl); d.mkdirs()
      Files.writeString(new File(d, s"doc$i.txt").toPath, s"$lbl document number $i")
    }
    val df = TextCorpus.wholeTextWithLabels(spark, root.toString)
    assert(df.count() == 6)
    val byLabel = df.groupBy("label").count().as[(String, Long)].collect().toMap
    assert(byLabel == Map("pos" -> 3L, "neg" -> 3L))
    val one = df.where(df("path").endsWith("pos/doc1.txt")).select("text").as[String].head()
    assert(one == "pos document number 1")
  }

  test("S4: binary corpus read preserves bytes and labels") {
    val root = Files.createTempDirectory("graft-bin").toFile
    val d = new File(root, "cls"); d.mkdirs()
    Files.write(new File(d, "x.bin").toPath, Array[Byte](1, 2, 3, -1))
    val row = TextCorpus.binaryWithLabels(spark, root.toString).collect().head
    assert(row.getAs[String]("label") == "cls")
    assert(row.getAs[Array[Byte]]("content").toSeq == Seq[Byte](1, 2, 3, -1))
  }

  /** Review-r8 pin: file paths arrive as percent-encoded URIs, so a label
    * directory with spaces/non-ASCII must decode back to its real name
    * ('class A', not 'class%20A') in both corpus readers.
    */
  test("S3/S4: label directories with spaces decode to their real names") {
    val root = Files.createTempDirectory("graft-enc").toFile
    val d = new File(root, "class A"); d.mkdirs()
    Files.writeString(new File(d, "doc.txt").toPath, "text body")
    val t = TextCorpus.wholeTextWithLabels(spark, root.toString).collect().head
    assert(t.getAs[String]("label") == "class A",
      s"text label: ${t.getAs[String]("label")}")
    val b = TextCorpus.binaryWithLabels(spark, root.toString).collect().head
    assert(b.getAs[String]("label") == "class A",
      s"binary label: ${b.getAs[String]("label")}")
  }

  /** Review-r9 pins: the two readers' path columns differ in encoding —
    * input_file_name is percent-encoded, binaryFile's path is Hadoop's
    * unescaped Path.toString — so the TEXT reader percent-decodes (and
    * ONLY percent-decodes: '+' is a legal URI path char, not a space) and
    * the BINARY reader must not decode at all (a second decode throws on
    * a literal '%' and mangles literal '%20').
    */
  test("S3/S4: labels with '%', '+' and encoded spaces survive both readers") {
    val root = Files.createTempDirectory("graft-enc2").toFile
    for (lbl <- Seq("50%off", "c++", "a+b", "a b")) {
      val d = new File(root, lbl); d.mkdirs()
      Files.writeString(new File(d, "doc.txt").toPath, s"body of $lbl")
    }
    val expected = Set("50%off", "c++", "a+b", "a b")
    val tLabels = TextCorpus.wholeTextWithLabels(spark, root.toString)
      .select("label").as[String].collect().toSet
    assert(tLabels == expected, s"text labels: $tLabels")
    val bLabels = TextCorpus.binaryWithLabels(spark, root.toString)
      .select("label").as[String].collect().toSet
    assert(bLabels == expected, s"binary labels: $bLabels")
  }

  /** Review-r9 pins on the embedding writers: delimiter-bearing or null
    * words are refused with a nameable error in BOTH formats (the text
    * format silently lost 'new york' on read-back; the binary one already
    * refused), and an empty frame round-trips through the binary format
    * instead of writing an unreadable '0 0' header.
    */
  test("S8: embedding writers refuse undelimitable words; empty binary round-trips") {
    import graft.sources.Embeddings
    val dir = Files.createTempDirectory("graft-embw").toString
    val badText = Seq(("new york", Seq(0.1f, 0.2f))).toDF("word", "vec")
    val e = intercept[IllegalArgumentException] {
      Embeddings.writeWordVectors(badText, "word", "vec", s"$dir/t")
    }
    assert(e.getMessage.contains("new york"), e.getMessage)
    val nullWord = Seq((null.asInstanceOf[String], Seq(0.1f))).toDF("word", "vec")
    intercept[IllegalArgumentException] {
      Embeddings.writeWordVectors(nullWord, "word", "vec", s"$dir/t2")
    }
    val e2 = intercept[IllegalArgumentException] {
      Embeddings.writeWordVectorsBinary(nullWord, "word", "vec", s"$dir/b2")
    }
    assert(e2.getMessage.contains("null word"), e2.getMessage)
    // empty frame: binary writes '0 0' and reads back as an empty table
    val empty = Seq.empty[(String, Seq[Float])].toDF("word", "vec")
    Embeddings.writeWordVectorsBinary(empty, "word", "vec", s"$dir/empty.bin")
    assert(Embeddings.readWordVectorsBinary(spark, s"$dir/empty.bin").count() == 0L)

    // r10 pins: an EMPTY word desynchronizes the binary stream (its
    // delimiter space is eaten as leading whitespace) and fabricates a
    // bogus entry in the text format — both writers refuse it
    val emptyWord = Seq(("", Seq(0.1f, 0.2f))).toDF("word", "vec")
    assert(intercept[IllegalArgumentException] {
      Embeddings.writeWordVectors(emptyWord, "word", "vec", s"$dir/t3")
    }.getMessage.contains("empty"))
    assert(intercept[IllegalArgumentException] {
      Embeddings.writeWordVectorsBinary(emptyWord, "word", "vec", s"$dir/b3")
    }.getMessage.contains("empty"))
    // a null vector COMPONENT would silently shorten the text line
    // (concat_ws skips nulls) or NPE in the binary writer — refuse both
    val nullElem = Seq(("w", Seq[java.lang.Float](1.0f, null, 2.0f)))
      .toDF("word", "vec")
    assert(intercept[IllegalArgumentException] {
      Embeddings.writeWordVectors(nullElem, "word", "vec", s"$dir/t4")
    }.getMessage.contains("component"))
    assert(intercept[IllegalArgumentException] {
      Embeddings.writeWordVectorsBinary(nullElem, "word", "vec", s"$dir/b4")
    }.getMessage.contains("component"))
    // a forged multi-hundred-MB dim header refuses with a named error
    val forged = s"$dir/forged.bin"
    val out = new java.io.FileOutputStream(forged)
    out.write("3 600000000\n".getBytes("UTF-8")); out.close()
    assert(intercept[IllegalArgumentException] {
      Embeddings.readWordVectorsBinary(spark, forged)
    }.getMessage.contains("implausible"))
  }

  test("S7: IDX source parses images and labels, scales pixels to [0,1]") {
    val dir = Files.createTempDirectory("graft-idx").toFile
    val img = new File(dir, "images-idx3-ubyte")
    val out = new DataOutputStream(new FileOutputStream(img))
    out.writeInt(0x00000803); out.writeInt(3); out.writeInt(2); out.writeInt(2)
    out.write(Array[Byte](0, 127, -128, -1, 10, 20, 30, 40, 5, 6, 7, 8)); out.close()
    val lbl = new File(dir, "labels-idx1-ubyte")
    val out2 = new DataOutputStream(new FileOutputStream(lbl))
    out2.writeInt(0x00000801); out2.writeInt(3)
    out2.write(Array[Byte](7, 2, 9)); out2.close()

    val ds = IdxSource.readDataset(spark, img.toString, lbl.toString)
      .orderBy("idx").collect()
    assert(ds.length == 3)
    assert(ds.map(_.getAs[Int]("label")).toSeq == Seq(7, 2, 9))
    val px0 = ds(0).getSeq[Float](ds(0).fieldIndex("pixels")).toSeq
    assert(px0 == Seq(0f, 127 / 255.0f, 128 / 255.0f, 1f))
  }

  /** The r8 writer half of S7: sharded export must round-trip through the
    * distributed reader exactly — per-record pixel bytes and labels intact
    * across shards, empty partitions skipped without breaking image/label
    * shard alignment, out-of-range inputs clamped to ubyte.
    */
  test("S7: writeDataset exports sharded IDX that readDataset round-trips exactly") {
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("graft-idx-w").toString
    // 7 records of 2x2 double pixels incl. exact bytes and clamp cases,
    // spread over 4 partitions (one likely empty after repartition)
    val recs = (0 until 7).map { i =>
      (Seq(i / 255.0, 1.0, 0.0, (2 * i) / 255.0 + (if (i == 6) 9.0 else 0.0)), i + 10)
    }
    val df = recs.toDF("pixels", "label").repartition(4)
    IdxSource.writeDataset(df, dir, side = 2)

    val files = new File(dir).listFiles().map(_.getName).sorted.toSeq
    val imgShards = files.count(_.startsWith("images-"))
    val lblShards = files.count(_.startsWith("labels-"))
    assert(imgShards == lblShards && imgShards >= 2, s"sharded pair layout: $files")
    assert(!files.exists(_.endsWith(".tmp")), "no temp debris")

    val back = IdxSource.readDataset(spark,
      s"$dir/images-*-idx3-ubyte", s"$dir/labels-*-idx1-ubyte").collect()
    assert(back.length == 7)
    val byLabel = back.map(r => r.getAs[Int]("label") ->
      r.getSeq[Float](r.fieldIndex("pixels")).map(p => math.round(p * 255))).toMap
    for (i <- 0 until 7) {
      val want = Seq(i, 255, 0, math.min(255, 2 * i + (if (i == 6) 9 * 255 else 0)))
      assert(byLabel(i + 10) == want, s"record $i: ${byLabel(i + 10)} != $want")
    }
  }

  test("S6: tar.gz extraction round-trips files safely") {
    // build a minimal ustar archive in memory
    def tarEntry(name: String, data: Array[Byte]): Array[Byte] = {
      val header = new Array[Byte](512)
      name.getBytes("US-ASCII").copyToArray(header, 0)
      "000644 ".getBytes.copyToArray(header, 100)
      "000000 ".getBytes.copyToArray(header, 108)
      "000000 ".getBytes.copyToArray(header, 116)
      ("%011o".format(data.length) + " ").getBytes.copyToArray(header, 124)
      "00000000000 ".getBytes.copyToArray(header, 136)
      java.util.Arrays.fill(header, 148, 156, ' '.toByte) // checksum spaces
      header(156) = '0'
      val sum = header.map(_ & 0xff).sum
      ("%06o".format(sum) + "  ").getBytes.copyToArray(header, 148)
      val padded = data ++ new Array[Byte]((512 - data.length % 512) % 512)
      header ++ padded
    }
    val payload = "hello graft".getBytes
    val tar = tarEntry("sub/file.txt", payload) ++ new Array[Byte](1024)
    val archive = File.createTempFile("graft", ".tar.gz")
    val gz = new GZIPOutputStream(new FileOutputStream(archive))
    gz.write(tar); gz.close()

    val dest = Files.createTempDirectory("graft-untar").toFile
    val n = IngestUtil.extractTarGz(archive, dest)
    assert(n == 1)
    assert(Files.readString(new File(dest, "sub/file.txt").toPath) == "hello graft")
  }

  /** Review-r8 pins: the ustar PREFIX field (offset 345 — core ustar, used
    * for paths over 100 bytes) must join the entry path, and non-file
    * entries (symlinks, PAX/GNU metadata blocks) must be consumed without
    * materializing junk files or empty stand-ins.
    */
  test("S6: ustar prefix paths extract to the right place; metadata entries skip") {
    def entry(name: String, data: Array[Byte], typeFlag: Char,
              prefix: String = ""): Array[Byte] = {
      val header = new Array[Byte](512)
      name.getBytes("US-ASCII").copyToArray(header, 0)
      ("%011o".format(data.length) + " ").getBytes.copyToArray(header, 124)
      header(156) = typeFlag.toByte
      prefix.getBytes("US-ASCII").copyToArray(header, 345)
      val padded = data ++ new Array[Byte]((512 - data.length % 512) % 512)
      header ++ padded
    }
    val payload = "deep file".getBytes
    val paxJunk = "30 mtime=1700000000.000000000\n".getBytes
    val tar =
      entry("PaxHeaders.0/f.txt", paxJunk, 'x') ++     // PAX block: skip
      entry("link-to-f", Array.emptyByteArray, '2') ++ // symlink: skip
      entry("tail.txt", payload, '0', prefix = "very/long/dir/chain") ++
      new Array[Byte](1024)
    val dest = Files.createTempDirectory("graft-ustar").toFile
    val n = IngestUtil.extractTar(new java.io.ByteArrayInputStream(tar), dest)
    assert(n == 1, s"only the regular file counts, got $n")
    assert(Files.readString(
      new File(dest, "very/long/dir/chain/tail.txt").toPath) == "deep file",
      "prefix field must join the entry path")
    assert(!new File(dest, "tail.txt").exists(), "no flattened copy")
    assert(!new File(dest, "link-to-f").exists(), "symlink must not become an empty file")
    assert(!new File(dest, "PaxHeaders.0/f.txt").exists(), "PAX block must not extract")
  }

  /** Review-r9 pins: GNU 'L' long-name blocks and PAX 'x' `path` records
    * override the NEXT entry's (truncated) header name — consuming the
    * block but ignoring the payload lands long-pathed files at wrong
    * truncated locations. Overrides still route through the zip-slip
    * sanitizer, and a PAX GLOBAL path (which would rename everything
    * after it) is refused.
    */
  test("S6: GNU long-name and PAX path overrides apply to the next entry") {
    def entry(name: String, data: Array[Byte], typeFlag: Char): Array[Byte] = {
      val header = new Array[Byte](512)
      name.getBytes("US-ASCII").copyToArray(header, 0)
      ("%011o".format(data.length) + " ").getBytes.copyToArray(header, 124)
      header(156) = typeFlag.toByte
      val padded = data ++ new Array[Byte]((512 - data.length % 512) % 512)
      header ++ padded
    }
    def paxRecord(key: String, value: String): String = {
      // len counts the whole record incl. the len field and newline
      val body = s" $key=$value\n"
      var len = body.length + 1
      while ((len.toString.length + body.length) != len) len = len.toString.length + body.length
      s"$len$body"
    }
    val longPath = "deeply/" + ("nested/" * 20) + "gnu-long-named-file.txt"
    val paxPath = "pax/override/target.txt"
    val tar =
      entry("././@LongLink", (longPath + " ").getBytes, 'L') ++
      entry(longPath.take(100), "gnu payload".getBytes, '0') ++
      entry("PaxHeaders.0/t.txt", paxRecord("path", paxPath).getBytes, 'x') ++
      entry("t.txt", "pax payload".getBytes, '0') ++
      entry("plain.txt", "plain payload".getBytes, '0') ++ // no override leaks
      new Array[Byte](1024)
    val dest = Files.createTempDirectory("graft-longname").toFile
    val n = IngestUtil.extractTar(new java.io.ByteArrayInputStream(tar), dest)
    assert(n == 3)
    assert(Files.readString(new File(dest, longPath).toPath) == "gnu payload",
      "GNU 'L' payload must become the next entry's path")
    assert(!new File(dest, longPath.take(100)).exists(), "no truncated copy")
    assert(Files.readString(new File(dest, paxPath).toPath) == "pax payload",
      "PAX path record must become the next entry's path")
    assert(!new File(dest, "t.txt").exists(), "no truncated PAX copy")
    assert(Files.readString(new File(dest, "plain.txt").toPath) == "plain payload",
      "an override must not leak past the entry it names")

    // overrides route through the sanitizer: an 'L' escape is refused
    val evil = entry("././@LongLink", "../../evil.txt ".getBytes, 'L') ++
      entry("x.txt", "boom".getBytes, '0') ++ new Array[Byte](1024)
    intercept[IllegalArgumentException] {
      IngestUtil.extractTar(new java.io.ByteArrayInputStream(evil),
        Files.createTempDirectory("graft-longname-evil").toFile)
    }
    // a PAX GLOBAL path override is refused, not silently applied/ignored
    val globalPath = entry("pax_global", paxRecord("path", "everywhere.txt").getBytes, 'g') ++
      entry("y.txt", "boom".getBytes, '0') ++ new Array[Byte](1024)
    intercept[IllegalArgumentException] {
      IngestUtil.extractTar(new java.io.ByteArrayInputStream(globalPath),
        Files.createTempDirectory("graft-paxg").toFile)
    }
    // malformed PAX records throw instead of half-parsing past `path`
    intercept[IllegalArgumentException] {
      IngestUtil.parsePaxRecords("999 path=too-short\n")
    }
    assert(IngestUtil.parsePaxRecords(
      paxRecord("mtime", "1700000000.5") + paxRecord("path", "a=b.txt")) ==
      Map("mtime" -> "1700000000.5", "path" -> "a=b.txt"),
      "values containing '=' split at the FIRST '='")
  }

  /** r10 review pins: PAX `size` records override the octal field (which
    * holds a placeholder for > 8 GiB entries — copying it would misalign
    * every later header), and directory entries that CARRY data consume
    * it instead of desynchronizing the stream.
    */
  test("S6: PAX size records and data-bearing directory entries keep the stream aligned") {
    def entry(name: String, data: Array[Byte], typeFlag: Char,
              headerSize: Option[Int] = None): Array[Byte] = {
      val header = new Array[Byte](512)
      name.getBytes("US-ASCII").copyToArray(header, 0)
      ("%011o".format(headerSize.getOrElse(data.length)) + " ")
        .getBytes.copyToArray(header, 124)
      header(156) = typeFlag.toByte
      val padded = data ++ new Array[Byte]((512 - data.length % 512) % 512)
      header ++ padded
    }
    def paxRecord(key: String, value: String): String = {
      val body = s" $key=$value\n"
      var len = body.length + 1
      while ((len.toString.length + body.length) != len) len = len.toString.length + body.length
      s"$len$body"
    }
    val payload = "real sized payload".getBytes
    val tar =
      // pax size record: octal field says 0, the record carries the truth
      entry("PaxHeaders.0/big.txt", paxRecord("size", payload.length.toString).getBytes, 'x') ++
      entry("big.txt", payload, '0', headerSize = Some(0)) ++
      // a directory entry carrying 7 bytes of data (old Solaris tar shape)
      entry("datadir/", "dirdata".getBytes, '5') ++
      entry("after.txt", "after payload".getBytes, '0') ++
      new Array[Byte](1024)
    val dest = Files.createTempDirectory("graft-paxsize").toFile
    val n = IngestUtil.extractTar(new java.io.ByteArrayInputStream(tar), dest)
    assert(n == 2, s"expected 2 files, got $n")
    assert(Files.readString(new File(dest, "big.txt").toPath) == new String(payload),
      "PAX size record must override the placeholder octal field")
    assert(new File(dest, "datadir").isDirectory)
    assert(Files.readString(new File(dest, "after.txt").toPath) == "after payload",
      "a data-bearing directory entry must not desynchronize later headers")
    // a PAX GLOBAL size is refused like a global path
    val g = entry("pax_global", paxRecord("size", "5").getBytes, 'g') ++
      entry("x.txt", "xxxxx".getBytes, '0') ++ new Array[Byte](1024)
    intercept[IllegalArgumentException] {
      IngestUtil.extractTar(new java.io.ByteArrayInputStream(g),
        Files.createTempDirectory("graft-paxgs").toFile)
    }
  }

  test("S6: zip-slip entries are rejected") {
    def headerFor(name: String): Array[Byte] = {
      val header = new Array[Byte](512)
      name.getBytes("US-ASCII").copyToArray(header, 0)
      "00000000005 ".getBytes.copyToArray(header, 124)
      header
    }
    val evil = headerFor("../../evil.txt") ++ new Array[Byte](512) ++ new Array[Byte](1024)
    val dest = Files.createTempDirectory("graft-slip").toFile
    val bos = new ByteArrayOutputStream()
    bos.write(evil)
    intercept[IllegalArgumentException] {
      IngestUtil.extractTar(new java.io.ByteArrayInputStream(bos.toByteArray), dest)
    }
  }

  test("S5: HTTP download fetches bytes from a live server") {
    import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
    val server = HttpServer.create(new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    val payload = "graft ingest payload".getBytes
    server.createContext("/data.bin", new HttpHandler {
      def handle(x: HttpExchange): Unit = {
        x.sendResponseHeaders(200, payload.length)
        x.getResponseBody.write(payload); x.close()
      }
    })
    server.start()
    try {
      val dest = File.createTempFile("graft-dl", ".bin")
      val n = IngestUtil.downloadFile(
        s"http://127.0.0.1:${server.getAddress.getPort}/data.bin", dest)
      assert(n == payload.length)
      assert(Files.readAllBytes(dest.toPath).toSeq == payload.toSeq)
    } finally server.stop(0)
  }

  test("S10: console sink renders rows (show without error, capped output)") {
    val out = new ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(out)) {
      graft.sources.Tables.customer(spark, sfDir).show(3, truncate = true)
    }
    val rendered = out.toString
    assert(rendered.contains("c_custkey"))
    assert(rendered.contains("only showing top 3 rows"))
  }

  test("config: spark.graft.* surface parses overrides and keeps reference defaults") {
    assert(GraftConfig.load(Map.empty[String, String]) == GraftConfig.Defaults)
    val over = GraftConfig.load(Map(
      "spark.graft.cores" -> "32", "spark.graft.seed" -> "42",
      "spark.graft.dataset.classes" -> "2"))
    assert(over.cores == 32 && over.seed == 42L && over.numClasses == 2)
    assert(over.batchSize == 100) // untouched keys keep defaults
    spark.conf.set("spark.graft.epochs", "7")
    assert(GraftConfig.load(spark).epochs == 7)
    spark.conf.unset("spark.graft.epochs")
  }

  test("X1/X2: cache parity — cached results equal recomputed results") {
    val base = graft.sources.Tables.customer(spark, sfDir)
      .where($"c_acctbal" > 0).select("c_custkey", "c_acctbal")
    val uncached = base.collect().map(_.toString).sorted.toSeq
    val cached = base.cache()
    cached.count() // materialize
    val fromCache = cached.collect().map(_.toString).sorted.toSeq
    assert(uncached == fromCache)
    // the reference's action set (SparkRDDAPITest.scala:31-39), cached vs not
    assert(cached.count() == uncached.size)
    assert(cached.orderBy("c_custkey").first() == base.orderBy("c_custkey").first())
    assert(cached.orderBy($"c_acctbal".desc).limit(1).collect().toSeq ==
      base.orderBy($"c_acctbal".desc).limit(1).collect().toSeq)
    assert(cached.sample(false, 0.1, 42).count() == base.sample(false, 0.1, 42).count())
    cached.unpersist()
  }

  test("S8: word-vector text file loads, round-trips, and feeds the broadcast lookup join") {
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("graft-wv").toString
    // word2vec text interchange format, with the optional header line and
    // a malformed line that must be skipped
    Files.writeString(new File(dir, "vecs.txt").toPath,
      """4 3
        |alpha 0.1 0.2 0.3
        |beta 0.4 0.5 0.6
        |gamma 0.7 0.8 0.9
        |broken 0.1 oops 0.3
        |poison nan inf 1.0
        |delta 1.0 1.1 1.2
        |""".stripMargin)
    val vecs = graft.sources.Embeddings.readWordVectors(spark, s"$dir/vecs.txt", dim = Some(3))
    val loaded = vecs.as[(String, Seq[Float])].collect().toMap
    assert(loaded.keySet == Set("alpha", "beta", "gamma", "delta"))
    assert(loaded("beta") == Seq(0.4f, 0.5f, 0.6f))

    // round-trip through the writer
    graft.sources.Embeddings.writeWordVectors(vecs, "word", "vec", s"$dir/out")
    val back = graft.sources.Embeddings.readWordVectors(spark, s"$dir/out")
      .as[(String, Seq[Float])].collect().toMap
    assert(back == loaded)

    // the loaded table drops into the s8 lookup shape: tokenize, broadcast
    // join on word, mean-pool the first component per doc
    val docs = Seq((1L, "alpha beta beta"), (2L, "gamma unknown delta"))
      .toDF("doc_id", "text")
    val pooled = docs
      .select(col("doc_id"), explode(graft.functions.TextFunctions.tokenize(col("text"))).as("word"))
      .join(broadcast(vecs), "word")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        round(avg(element_at(col("vec"), 1).cast("double")), 6).as("mean_e1"))
      .as[(Long, Long, Double)].collect().map { case (k, n, m) => k -> ((n, m)) }.toMap
    assert(pooled(1L) == ((3L, 0.3)), s"doc1 pooled ${pooled(1L)}") // (0.1+0.4+0.4)/3
    assert(pooled(2L) == ((2L, 0.85)), s"doc2 pooled ${pooled(2L)}") // (0.7+1.0)/2
  }

  test("S8: word2vec BINARY model round-trips and matches the text reader's schema") {
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("graft-wvbin").toString
    val src = Seq(
      ("alpha", Seq(0.1f, 0.2f, 0.3f)),
      ("beta", Seq(-0.4f, 0.5f, 0.6f)),
      ("</s>", Seq(1.5f, -2.5f, 3.25f))).toDF("word", "vec")
    graft.sources.Embeddings.writeWordVectorsBinary(src, "word", "vec", s"$dir/model.bin")
    val back = graft.sources.Embeddings.readWordVectorsBinary(spark, s"$dir/model.bin")
    // identical schema to the text reader — drops into the same s8 join
    assert(back.schema == graft.sources.Embeddings
      .readWordVectorsBinary(spark, s"$dir/model.bin", dim = Some(3)).schema)
    val loaded = back.as[(String, Seq[Float])].collect().toMap
    assert(loaded == Map(
      "alpha" -> Seq(0.1f, 0.2f, 0.3f),
      "beta" -> Seq(-0.4f, 0.5f, 0.6f),
      "</s>" -> Seq(1.5f, -2.5f, 3.25f)), s"binary round-trip drifted: $loaded")
    // a hand-built file in the C tool's exact layout (no trailing newline
    // after the last vector) parses too
    val bos = new java.io.ByteArrayOutputStream()
    bos.write("1 2\n".getBytes("UTF-8"))
    bos.write("solo ".getBytes("UTF-8"))
    val bb = java.nio.ByteBuffer.allocate(8).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putFloat(7.5f); bb.putFloat(-1.25f)
    bos.write(bb.array())
    Files.write(new File(dir, "raw.bin").toPath, bos.toByteArray)
    val raw = graft.sources.Embeddings.readWordVectorsBinary(spark, s"$dir/raw.bin")
      .as[(String, Seq[Float])].collect().toMap
    assert(raw == Map("solo" -> Seq(7.5f, -1.25f)))
    // non-finite vectors drop, matching the text reader's hygiene
    val bad = Seq(("ok", Seq(1f, 2f)), ("poison", Seq(Float.NaN, 1f))).toDF("word", "vec")
    graft.sources.Embeddings.writeWordVectorsBinary(bad, "word", "vec", s"$dir/bad.bin")
    assert(graft.sources.Embeddings.readWordVectorsBinary(spark, s"$dir/bad.bin")
      .as[(String, Seq[Float])].collect().toMap == Map("ok" -> Seq(1f, 2f)))
    // UTF-8 words round-trip byte-exactly (review r8: a per-byte toChar
    // decode was Latin-1 — 'café' read back as 'cafÃ©' and missed the
    // lookup join for every non-ASCII vocabulary entry)
    val utf8 = Seq(("café", Seq(1f, 2f)), ("naïve_日本", Seq(3f, 4f))).toDF("word", "vec")
    graft.sources.Embeddings.writeWordVectorsBinary(utf8, "word", "vec", s"$dir/utf8.bin")
    assert(graft.sources.Embeddings.readWordVectorsBinary(spark, s"$dir/utf8.bin")
      .as[(String, Seq[Float])].collect().toMap ==
      Map("café" -> Seq(1f, 2f), "naïve_日本" -> Seq(3f, 4f)))
    // a word containing the format's delimiter is refused (it would
    // desynchronize the stream and poison every later pair)
    val e = intercept[IllegalArgumentException] {
      graft.sources.Embeddings.writeWordVectorsBinary(
        Seq(("New York", Seq(1f, 2f))).toDF("word", "vec"), "word", "vec", s"$dir/sp.bin")
    }
    assert(e.getMessage.contains("space"), e.getMessage)
  }

  test("S2+: csv and json round-trip through write/read with explicit schemas") {
    val dir = Files.createTempDirectory("graft-fmt").toString
    val base = graft.sources.Tables.nation(spark, sfDir)
    base.write.option("header", "true").csv(s"$dir/csv")
    base.write.json(s"$dir/json")
    // schema-on-read is EXPLICIT (production posture — inference is a
    // per-read full scan and can drift types between runs)
    val fromCsv = spark.read.option("header", "true").schema(base.schema).csv(s"$dir/csv")
    val fromJson = spark.read.schema(base.schema).json(s"$dir/json")
    val want = base.collect().map(_.toString).sorted.toSeq
    assert(fromCsv.collect().map(_.toString).sorted.toSeq == want)
    assert(fromJson.collect().map(_.toString).sorted.toSeq == want)
  }

  test("S2+: JSONL quarantine ingest splits good rows from raw malformed lines") {
    import org.apache.spark.sql.types._
    val dir = Files.createTempDirectory("graft-jsonq").toString
    val lines = Seq(
      """{"doc_id": 1, "text": "alpha"}""",
      """{"doc_id": 2, "text": "beta"}""",
      """{"doc_id": "not-a-number", "text": "gamma"}""", // type mismatch
      """{broken json""",                                // unparseable
      "",                                                // blank separator line
      "null",                                            // literal null record
      """{"doc_id": 3, "text": "delta"}""")
    Files.write(java.nio.file.Paths.get(dir, "feed.jsonl"),
      lines.mkString("\n").getBytes)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))

    val (good, quarantine) = TextCorpus.readJsonQuarantine(spark, dir, schema)
    import SharedSpark.spark.implicits._
    assert(good.columns.toSeq == Seq("doc_id", "text"))
    assert(good.select("doc_id").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L))
    // the quarantine side preserves each malformed line VERBATIM for repair —
    // including blank and literal-null lines, which from_json turns into a
    // NULL struct rather than a corrupt record (they must never pass as
    // silent all-null good rows)
    val raws = quarantine.select("raw_record").as[String].collect().toSet
    assert(raws == Set(lines(2), lines(3), "", "null"), s"raw lines not preserved: $raws")
    // a clean feed quarantines nothing
    val clean = Files.createTempDirectory("graft-jsonq-clean").toString
    Files.write(java.nio.file.Paths.get(clean, "feed.jsonl"),
      lines.take(2).mkString("\n").getBytes)
    val (g2, q2) = TextCorpus.readJsonQuarantine(spark, clean, schema)
    assert(g2.count() == 2 && q2.count() == 0)
  }

  test("events loader normalizes ts to TimestampType across fixture generations") {
    // the driver has shipped events.ts as TIMESTAMP(NANOS)-as-long in some
    // testdata generations and plain TIMESTAMP_NTZ in others; every
    // downstream unix_millis/window call requires session-UTC TimestampType
    val ts = graft.sources.Tables.events(spark, sfDir).schema("ts").dataType
    assert(ts == org.apache.spark.sql.types.TimestampType, s"ts surfaced as $ts")
  }

  /** Review-r9 pin: the NTZ-reinterpret precondition accepts any
    * UTC-EQUIVALENT session zone ("Etc/UTC", "GMT", "+00:00" — the
    * reinterpret is exact for all of them), and refuses zones with a real
    * offset by rules, not by string comparison.
    */
  test("events loader accepts UTC-equivalent session zones, refuses offsets") {
    val dir = Files.createTempDirectory("graft-ntz").toString
    spark.sql(
      "select 1L as user_id, timestamp_ntz'2024-03-01 12:00:00' as ts, 'view' as kind")
      .write.parquet(s"$dir/events.parquet")
    val tzKey = "spark.sql.session.timeZone"
    val orig = spark.conf.get(tzKey)
    try {
      for (tz <- Seq("UTC", "Etc/UTC", "GMT", "+00:00")) {
        spark.conf.set(tzKey, tz)
        val got = graft.sources.Tables.events(spark, dir)
          .select(org.apache.spark.sql.functions.unix_millis(
            org.apache.spark.sql.functions.col("ts")))
          .as[Long].head()
        assert(got == 1709294400000L, s"zone $tz read $got")
      }
      spark.conf.set(tzKey, "America/New_York")
      val e = intercept[IllegalArgumentException] {
        graft.sources.Tables.events(spark, dir)
      }
      assert(e.getMessage.contains("America/New_York"))
    } finally spark.conf.set(tzKey, orig)
  }
}
