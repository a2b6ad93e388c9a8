package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.operators.{ProductQuantization, Similarity, Skew}
import graft.sources.{Sink, Tables}

/** Scale-path operators: IVF ANN recall, skew salting equivalence,
  * partitioned/bucketed output layout behavior.
  */
class ScaleOpsSpec extends SparkSpec {

  import SharedSpark.spark.implicits._

  test("E3: IVF ANN achieves >=30% recall@5 vs exact top-k") {
    val emb = Tables.embeddings(spark, sfDir)
    val q = emb.where(col("vec_id") < 20)
    val exact = Similarity.exactTopK(emb, q, 5)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val ivf = Similarity.ivfTopK(emb, q, 5)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val recall = (exact & ivf).size.toDouble / exact.size
    assert(recall >= 0.3, s"IVF recall too low: $recall")
    info(f"IVF recall@5 = $recall%.2f")

    // the 100 TB posture: quantizer fitted on a 10% hash-sample of the
    // corpus must hold the same recall gate (cells only need the density
    // shape; every vector is still assigned)
    val ivfSampled = Similarity.ivfTopK(emb, q, 5, fitSampleFraction = 0.1)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val recallSampled = (exact & ivfSampled).size.toDouble / exact.size
    assert(recallSampled >= 0.3, s"sampled-fit IVF recall too low: $recallSampled")
    info(f"IVF recall@5 (10%% fit sample) = $recallSampled%.2f")
  }

  test("E3: PQ ANN achieves >=30% recall@5 vs exact top-k") {
    val emb = Tables.embeddings(spark, sfDir)
    val q = emb.where(col("vec_id") < 20)
    val exact = Similarity.exactTopK(emb, q, 5)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val pq = ProductQuantization.pqTopK(emb, q, 5)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val recall = (exact & pq).size.toDouble / exact.size
    assert(recall >= 0.3, s"PQ recall too low: $recall")
    info(f"PQ recall@5 = $recall%.2f")

    // 100 TB posture: codebooks fitted on a 10% hash-sample hold the gate
    val pqSampled = ProductQuantization.pqTopK(emb, q, 5, fitSampleFraction = 0.1)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val recallSampled = (exact & pqSampled).size.toDouble / exact.size
    assert(recallSampled >= 0.3, s"sampled-fit PQ recall too low: $recallSampled")
    info(f"PQ recall@5 (10%% fit sample) = $recallSampled%.2f")
  }

  test("E3: IVF-PQ composition achieves >=30% recall@5 vs exact top-k") {
    val emb = Tables.embeddings(spark, sfDir)
    val q = emb.where(col("vec_id") < 20)
    val exact = Similarity.exactTopK(emb, q, 5)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val ivfpq = ProductQuantization.ivfPqTopK(emb, q, 5)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val recall = (exact & ivfpq).size.toDouble / exact.size
    assert(recall >= 0.3, s"IVF-PQ recall too low: $recall")
    info(f"IVF-PQ recall@5 = $recall%.2f")
    // 100 TB posture: both quantizers fitted on a 25% hash-sample hold the gate
    val sampled = ProductQuantization.ivfPqTopK(emb, q, 5, fitSampleFraction = 0.25)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val recallSampled = (exact & sampled).size.toDouble / exact.size
    assert(recallSampled >= 0.3, s"sampled-fit IVF-PQ recall too low: $recallSampled")
    info(f"IVF-PQ recall@5 (25%% fit sample) = $recallSampled%.2f")
  }

  test("E3: PQ index round-trips through the store; prebuilt probe equals inline pqTopK") {
    val emb = Tables.embeddings(spark, sfDir)
    val q = emb.where(col("vec_id") < 10)
    val dir = Files.createTempDirectory("graft_pq_idx").toString
    val written = ProductQuantization.writeIndex(emb, dir, fitSampleFraction = 0.25)
    val read = ProductQuantization.readCodebooks(spark, dir)
    assert(read.length == written.length &&
      read.zip(written).forall { case (a, b) =>
        a.length == b.length && a.zip(b).forall { case (x, y) => x.sameElements(y) } },
      "codebooks must survive the parquet round-trip exactly")
    val inline = ProductQuantization.pqTopK(emb, q, 5, fitSampleFraction = 0.25)
      .select("q_id", "n_id", "rnk").as[(Long, Long, Int)].collect().toSet
    val probed = ProductQuantization.pqTopKPrebuilt(
        spark.read.parquet(s"$dir/codes"), emb, q, read, 5)
      .select("q_id", "n_id", "rnk").as[(Long, Long, Int)].collect().toSet
    assert(probed == inline, "probe from the stored index must equal the inline build+query")
  }

  test("E3: IVF-PQ index round-trips through the store; stored probe equals inline ivfPqTopK") {
    val emb = Tables.embeddings(spark, sfDir)
    val q = emb.where(col("vec_id") < 10)
    val dir = Files.createTempDirectory("graft_ivfpq_idx").toString
    ProductQuantization.writeIvfPqIndex(emb, dir, fitSampleFraction = 0.25)
    val inline = ProductQuantization.ivfPqTopK(emb, q, 5, fitSampleFraction = 0.25)
      .select("q_id", "n_id", "rnk").as[(Long, Long, Int)].collect().toSet
    // guards the partitioned-by-cell write round-trip: the partition
    // column must come back join-compatible and no cell may be lost
    val probed = ProductQuantization.ivfPqProbe(spark, dir, emb, q, 5)
      .select("q_id", "n_id", "rnk").as[(Long, Long, Int)].collect().toSet
    assert(probed == inline,
      "probe from the stored IVF-PQ index must equal the inline build+query")
  }

  test("E3: PQ codes are the compressed contract — m small ints, partition-invariant") {
    val emb = Tables.embeddings(spark, sfDir)
    val books = ProductQuantization.fitCodebooks(emb, dim = 64, m = 8, kCodes = 16)
    assert(books.length == 8 && books.forall(_.forall(_.length == 8)))
    def codesOf(df: org.apache.spark.sql.DataFrame) =
      df.select(col("vec_id"), ProductQuantization.encode(col("embedding"), books).as("codes"))
        .as[(Long, Seq[Int])].collect().toMap
    val codes = codesOf(emb)
    assert(codes.values.forall(c => c.length == 8 && c.forall(v => v >= 0 && v < 16)),
      "every code must be one of kCodes=16 byte-sized ids")
    // deterministic under any partition layout (argmin ties break by index)
    assert(codesOf(emb.repartition(3)) == codes)
    // ADC distance of a vector against its own table must not exceed that
    // of a random other vector on average (sanity: quantization preserves
    // the coarse geometry ADC ranks on)
    val dtable = ProductQuantization.adcTable(col("embedding"), books)
    val self = emb.select(
      ProductQuantization.adcDistance(
        ProductQuantization.encode(col("embedding"), books), dtable).as("d"))
      .agg(avg("d")).as[Double].head()
    val cross = emb.limit(50).select(col("embedding").as("a"))
      .crossJoin(emb.orderBy(col("vec_id").desc).limit(50).select(col("embedding").as("b")))
      .select(ProductQuantization.adcDistance(
        ProductQuantization.encode(col("a"), books),
        ProductQuantization.adcTable(col("b"), books)).as("d"))
      .agg(avg("d")).as[Double].head()
    assert(self < cross, s"self ADC $self should undercut cross ADC $cross")
  }

  test("skew: saltedSum equals the plain grouped sum") {
    val df = Tables.lineitem(spark, sfDir)
    val plain = df.groupBy("l_returnflag").agg(sum("l_quantity").as("total"))
      .as[(String, Double)].collect().toMap
    val salted = Skew.saltedSum(df, Seq("l_returnflag"), col("l_quantity"))
      .as[(String, Double)].collect().toMap
    assert(plain.keySet == salted.keySet)
    for ((k, v) <- plain) assert(math.abs(salted(k) - v) < 1e-6, s"key $k: $v vs ${salted(k)}")
  }

  test("skew: saltedSum works when the frame carries a map column") {
    // hash() rejects MapType — the salt must derive from the map-free columns
    val df = Tables.events(spark, sfDir)
      .selectExpr("event_type", "value", "map('k', props) AS m")
    val plain = df.groupBy("event_type").agg(sum("value").as("total"))
      .as[(String, Double)].collect().toMap
    val salted = Skew.saltedSum(df, Seq("event_type"), col("value"))
      .as[(String, Double)].collect().toMap
    assert(plain.keySet == salted.keySet)
    for ((k, v) <- plain) assert(math.abs(salted(k) - v) < 1e-6)
  }

  test("skew: saltedBroadcastLeft equals the plain broadcast join") {
    val fact = Tables.orders(spark, sfDir).select("o_orderkey", "o_custkey")
    val dim = Tables.customer(spark, sfDir).select("c_custkey", "c_mktsegment")
      .withColumnRenamed("c_custkey", "o_custkey")
    val plain = fact.join(broadcast(dim), "o_custkey")
      .select("o_orderkey", "c_mktsegment").as[(Long, String)].collect().toSet
    val salted = Skew.saltedBroadcastLeft(fact, dim, "o_custkey")
      .select("o_orderkey", "c_mktsegment").as[(Long, String)].collect().toSet
    assert(plain == salted)
  }

  test("sink: partitioned write enables partition pruning on read") {
    val dir = Files.createTempDirectory("graft-part").toString
    val df = Tables.orders(spark, sfDir)
      .withColumn("order_year", year(col("o_orderdate")))
    Sink.writePartitioned(df, dir, Seq("order_year"))
    val back = spark.read.parquet(dir)
    assert(back.count() == df.count())
    val pruned = back.where(col("order_year") === 1996)
    val expected = df.where(col("order_year") === 1996).count()
    assert(pruned.count() == expected)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(order_year"),
      s"no partition filter in:\n$plan")
  }

  test("sink: same-bucketed tables join without a shuffle") {
    // clean both the metastore entry and any orphaned location from a
    // previous JVM (fresh derby + surviving /tmp dir => LOCATION_ALREADY_EXISTS)
    for (t <- Seq("g_orders_b", "g_cust_b")) {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File("/tmp/graft-warehouse", t)
      if (loc.exists()) {
        import scala.reflect.io.Directory
        new Directory(loc).deleteRecursively()
      }
    }
    Sink.writeBucketed(
      Tables.orders(spark, sfDir).select("o_orderkey", "o_custkey", "o_totalprice"),
      "g_orders_b", "o_custkey", 8)
    Sink.writeBucketed(
      Tables.customer(spark, sfDir).select("c_custkey", "c_name")
        .withColumnRenamed("c_custkey", "o_custkey"),
      "g_cust_b", "o_custkey", 8)
    val joined = spark.table("g_orders_b").join(spark.table("g_cust_b"), "o_custkey")
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join still shuffles:\n$plan")
    assert(joined.count() > 0)
  }

  test("sink: writeBloomFiltered lands a footer bloom filter with no false negatives") {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import scala.jdk.CollectionConverters._
    val dir = Files.createTempDirectory("graft-bloom").toString
    val df = Tables.orders(spark, sfDir).select("o_orderkey", "o_custkey")
    // disableDictionary: at this scale every column fits the dictionary page
    // and parquet-mr correctly drops the bloom (the dictionary is already an
    // exact filter); force the plain-encoding path a production
    // high-cardinality id takes naturally.
    Sink.writeBloomFiltered(df, dir, Seq("o_custkey"), expectedNdv = 10000,
      disableDictionary = true)

    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(conf)
    val file = fs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .filter(_.getPath.getName.endsWith(".parquet")).head.getPath
    val reader = ParquetFileReader.open(HadoopInputFile.fromPath(file, conf))
    try {
      val block = reader.getFooter.getBlocks.get(0)
      val byName = block.getColumns.asScala
        .map(c => c.getPath.toDotString -> c).toMap
      // enabled column has a filter; the untouched one must not
      assert(byName("o_custkey").getBloomFilterOffset >= 0, "no bloom on o_custkey")
      assert(byName("o_orderkey").getBloomFilterOffset < 0, "stray bloom on o_orderkey")
      // bloom law: every present key answers "might be present" in SOME row
      // group's filter. Keys come from the inspected file, and filters are
      // per-row-group, so the check is an exists-over-blocks — sound even
      // when a larger fixture writes multiple row groups per file.
      val blooms = reader.getFooter.getBlocks.asScala.map { b =>
        val c = b.getColumns.asScala.find(_.getPath.toDotString == "o_custkey").get
        reader.readBloomFilter(c)
      }
      assert(blooms.nonEmpty && blooms.forall(_ != null))
      val present = spark.read.parquet(file.toString)
        .select("o_custkey").distinct().limit(20).as[Long].collect()
      assert(present.nonEmpty && present.forall(v =>
        blooms.exists(bf => bf.findHash(bf.hash(v)))), "false negative")
    } finally reader.close()

    // pushed-down point lookup stays correct through the bloom-filtered files
    val key = df.select("o_custkey").as[Long].head()
    assert(spark.read.parquet(dir).where(col("o_custkey") === key).count() ==
      df.where(col("o_custkey") === key).count())
  }

  test("sink: compactParquet merges small files to the byte-derived count, losslessly") {
    val dir = Files.createTempDirectory("graft-compact").toString
    val df = Tables.orders(spark, sfDir).select("o_orderkey", "o_totalprice")
    df.repartition(64).write.mode("overwrite").parquet(dir)
    val checksum = df.agg(sum("o_orderkey"), count("*")).as[(Long, Long)].head()

    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def files() = fs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
    val bytes = files().map(_.getLen).sum
    val target = bytes / 4 // expect ~4-5 output files (size-desc bin packing)
    val (before, after) = Sink.compactParquet(spark, dir, target)

    assert(before == 64)
    assert(after >= 4 && after <= 8, s"bin packing should land near ceil(bytes/target): $after")
    assert(files().length == after, "on-disk file count != reported count")
    assert(files().forall(_.getLen <= 2 * target),
      "an output file blew past the byte target")
    val back = spark.read.parquet(dir).agg(sum("o_orderkey"), count("*"))
      .as[(Long, Long)].head()
    assert(back == checksum, "compaction changed the data")
  }

  test("sink: compactParquet recovers an aborted swap (dir renamed aside, stale tmp)") {
    import org.apache.hadoop.fs.Path
    val dir = Files.createTempDirectory("graft-crash").toString
    val df = Tables.nation(spark, sfDir)
    df.repartition(8).write.mode("overwrite").parquet(dir)
    val expected = df.count()

    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val qdir = fs.makeQualified(new Path(dir))
    // simulate a crash between rename-aside and rename-in: the data sits in
    // the hidden `old` sibling, a half-written tmp holds garbage, dir is gone
    val old = new Path(qdir.getParent, s".${qdir.getName}._compact_old")
    val tmp = new Path(qdir.getParent, s".${qdir.getName}._compact_tmp")
    assert(fs.rename(qdir, old))
    fs.mkdirs(tmp)
    fs.create(new Path(tmp, "part-garbage.parquet")).close()

    val (before, after) = Sink.compactParquet(spark, dir, targetFileBytes = 1L << 30)
    assert(before == 8 && after == 1, s"($before, $after)")
    assert(spark.read.parquet(dir).count() == expected, "recovery lost rows")
    assert(!fs.exists(old) && !fs.exists(tmp), "compaction debris left behind")
  }

  test("sink: merge recovery — a writer recreated the leaf after a mid-swap crash") {
    import org.apache.hadoop.fs.Path
    val dir = Files.createTempDirectory("graft-crash2").toString
    val preCrash = Tables.nation(spark, sfDir).select("n_nationkey")
    preCrash.repartition(4).write.mode("overwrite").parquet(dir)

    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val qdir = fs.makeQualified(new Path(dir))
    val old = new Path(qdir.getParent, s".${qdir.getName}._compact_old")
    val tmp = new Path(qdir.getParent, s".${qdir.getName}._compact_tmp")
    // crash between rename-aside and rename-in: old = sole copy of the
    // pre-crash rows, tmp = their completed compaction
    assert(fs.rename(qdir, old))
    spark.read.parquet(old.toString).coalesce(1)
      .write.mode("overwrite").parquet(tmp.toString)
    // ...then a writer recreates the leaf with NEW rows before any recovery
    val recreated = spark.range(1000, 1010).select(col("id").cast("int").as("n_nationkey"))
    recreated.coalesce(1).write.mode("overwrite").parquet(dir)

    val (_, after) = Sink.compactParquet(spark, dir, targetFileBytes = 1L << 30)
    val back = spark.read.parquet(dir).select("n_nationkey").as[Int].collect().toSet
    val expected = preCrash.as[Int].collect().toSet ++ (1000 until 1010)
    assert(back == expected, "merge recovery must keep BOTH pre-crash and recreated rows")
    assert(after == 1)
    assert(!fs.exists(old) && !fs.exists(tmp), "debris left behind")
  }

  test("sink: compactPartitions discovers and recovers a leaf that exists only as debris") {
    import org.apache.hadoop.fs.Path
    val dir = Files.createTempDirectory("graft-crash3").toString
    val df = Tables.orders(spark, sfDir)
      .withColumn("order_year", year(col("o_orderdate")))
      .select("o_orderkey", "order_year")
    df.repartition(4).write.mode("overwrite").partitionBy("order_year").parquet(dir)
    val total = df.count()

    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val leaf = fs.makeQualified(new Path(dir, "order_year=1996"))
    val old = new Path(leaf.getParent, s".${leaf.getName}._compact_old")
    assert(fs.rename(leaf, old)) // aborted swap: visible leaf gone, data in old
    assert(spark.read.parquet(dir).count() < total, "precondition: partition invisible")

    val report = Sink.compactPartitions(spark, dir, targetFileBytes = 1L << 30)
    assert(report.contains("order_year=1996"), s"debris leaf not discovered: ${report.keys}")
    assert(spark.read.parquet(dir).count() == total, "recovered partition rows missing")
    assert(!fs.exists(old))
  }

  test("sink: stray files above hive partitions — partitions compact, files untouched") {
    import org.apache.hadoop.fs.Path
    val dir = Files.createTempDirectory("graft-mixedroot").toString
    val df = Tables.nation(spark, sfDir).select("n_nationkey", "n_regionkey")
    df.repartition(4).write.mode("overwrite").partitionBy("n_regionkey").parquet(dir)
    // a stray parquet file at the root, above the partition dirs
    Tables.region(spark, sfDir).limit(2).coalesce(1)
      .write.mode("overwrite").parquet(dir + "/.stray_tmp")
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val strayPart = fs.listStatus(new Path(dir + "/.stray_tmp"))
      .filter(_.getPath.getName.endsWith(".parquet")).head.getPath
    val stray = new Path(dir, "stray.parquet")
    assert(fs.rename(strayPart, stray))
    fs.delete(new Path(dir + "/.stray_tmp"), true)

    val report = Sink.compactPartitions(spark, dir, targetFileBytes = 1L << 30)
    assert(report.keys.forall(_.startsWith("n_regionkey=")) && report.nonEmpty,
      s"partitions should compact despite the stray file: $report")
    assert(fs.exists(stray), "the stray root file must be left untouched")
  }

  test("sink: compactPartitions awaits all leaves and aggregates failures") {
    import org.apache.hadoop.fs.Path
    val dir = Files.createTempDirectory("graft-crash4").toString
    val df = Tables.nation(spark, sfDir).select("n_nationkey", "n_regionkey")
    df.repartition(4).write.mode("overwrite").partitionBy("n_regionkey").parquet(dir)
    // corrupt one leaf so its rewrite fails
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bad = new Path(fs.makeQualified(new Path(dir, "n_regionkey=0")), "part-corrupt.parquet")
    val out = fs.create(bad); out.write("not parquet".getBytes); out.close()

    val e = intercept[java.io.IOException] {
      Sink.compactPartitions(spark, dir, targetFileBytes = 1L << 30)
    }
    assert(e.getMessage.contains("n_regionkey=0"), e.getMessage)
    assert(e.getMessage.contains("1/"), s"expected exactly one failed leaf: ${e.getMessage}")
    // the healthy leaves were still compacted (work not discarded)
    val healthy = fs.listStatus(new Path(dir))
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("n_regionkey="))
      .filterNot(_.getPath.getName == "n_regionkey=0")
    assert(healthy.nonEmpty && healthy.forall { leafDir =>
      fs.listStatus(leafDir.getPath)
        .count(f => f.isFile && f.getPath.getName.endsWith(".parquet")) == 1
    }, "healthy leaves should have compacted to one file each")
  }

  test("sink: compactParquet refuses a missing path and a dir with subdirectories") {
    // a misspelled path must fail loudly, not report success forever
    intercept[java.io.FileNotFoundException] {
      Sink.compactParquet(spark, "/tmp/graft-no-such-dir-xyz")
    }
    // a dir with both files and child dirs is not a flat leaf: the swap
    // would destroy the children (hive partitions, _spark_metadata, debris)
    val dir = Files.createTempDirectory("graft-mixed").toString
    Tables.nation(spark, sfDir).limit(5).coalesce(1).write.mode("overwrite").parquet(dir)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new org.apache.hadoop.fs.Path(dir, "date=2026-01-01"))
    val e = intercept[IllegalStateException] { Sink.compactParquet(spark, dir) }
    assert(e.getMessage.contains("subdirectories"), e.getMessage)
    assert(spark.read.parquet(dir).count() == 5, "refusal must leave the dir untouched")
  }

  test("sink: compactParquet refuses a leaf with visible non-parquet sidecars") {
    // the whole-dir swap would destroy a visible sidecar (schema.json, a
    // manifest) — refuse, same posture as the subdirectory refusal; hidden
    // _SUCCESS/_-prefixed metadata remains fine to replace
    val dir = Files.createTempDirectory("graft-sidecar").toString
    Tables.nation(spark, sfDir).limit(5).repartition(2).write.mode("overwrite").parquet(dir)
    Files.writeString(new java.io.File(dir, "schema.json").toPath, "{}")
    val e = intercept[IllegalStateException] { Sink.compactParquet(spark, dir) }
    assert(e.getMessage.contains("non-parquet"), e.getMessage)
    // (a plain parquet read of such a dir fails in Spark too — glob-filter
    // to check the data files survived the refusal untouched)
    assert(spark.read.option("pathGlobFilter", "*.parquet").parquet(dir).count() == 5,
      "refusal must leave data untouched")
    assert(Files.exists(new java.io.File(dir, "schema.json").toPath), "sidecar intact")
    // removing the sidecar makes the same leaf compactable
    Files.delete(new java.io.File(dir, "schema.json").toPath)
    val (before, after) = Sink.compactParquet(spark, dir, 1L << 30)
    assert(before == 2 && after == 1)
  }

  test("sink: compaction refuses object-store schemes (non-atomic rename)") {
    // the swap protocol's crash-state machine requires atomic directory
    // rename; object-store rename is copy+delete, so the guard must refuse
    // every known copy-rename scheme and admit real filesystems
    for (scheme <- Seq("s3a", "S3A", "s3", "gs", "wasb", "abfss", "oss")) {
      val e = intercept[UnsupportedOperationException] {
        Sink.requireAtomicRename(scheme)
      }
      assert(e.getMessage.contains("atomic"), e.getMessage)
    }
    Sink.requireAtomicRename("file")
    Sink.requireAtomicRename("hdfs")
    Sink.requireAtomicRename("viewfs")
    Sink.requireAtomicRename(null) // unknown FS: caller's responsibility
  }

  test("sink: compactPartitions compacts each hive leaf in place, pruning intact") {
    val dir = Files.createTempDirectory("graft-compact-part").toString
    val df = Tables.orders(spark, sfDir)
      .withColumn("order_year", year(col("o_orderdate")))
      .select("o_orderkey", "order_year")
    df.repartition(16).write.mode("overwrite").partitionBy("order_year").parquet(dir)
    val total = df.count()

    val report = Sink.compactPartitions(spark, dir, targetFileBytes = 1L << 30)
    assert(report.nonEmpty)
    assert(report.keys.forall(_.startsWith("order_year=")), s"bad leaves: ${report.keys}")
    assert(report.values.forall { case (b, a) => b >= a && a == 1 },
      s"every leaf should collapse to 1 file under a 1 GiB target: $report")

    val back = spark.read.parquet(dir)
    assert(back.count() == total)
    val pruned = back.where(col("order_year") === 1996)
    assert(pruned.count() == df.where(col("order_year") === 1996).count())
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(order_year"),
      s"partition pruning lost after compaction:\n$plan")
  }

  test("O1: stableRowNumber equals the single-partition window rank") {
    import org.apache.spark.sql.expressions.Window
    val c = Tables.customer(spark, sfDir)
    val viaWindow = c.select(col("c_custkey"),
      row_number().over(Window.orderBy(col("c_acctbal").desc, col("c_custkey")))
        .cast("long").as("pos"))
      .as[(Long, Long)].collect().toSet
    val viaStable = graft.operators.Ranking.stableRowNumber(
      c.select("c_custkey", "c_acctbal"), Seq(col("c_acctbal").desc, col("c_custkey")), "pos")
      .select("c_custkey", "pos").as[(Long, Long)].collect().toSet
    assert(viaStable == viaWindow)

    // review-r9 pin: the no-pin overload (long-lived sessions that never
    // call Pinned.release) must produce the identical rank without leaving
    // anything in the pin registry
    graft.operators.Pinned.release()
    val before = graft.operators.Pinned.pinnedCount
    val viaNoPin = graft.operators.Ranking.stableRowNumber(
      c.select("c_custkey", "c_acctbal"), Seq(col("c_acctbal").desc, col("c_custkey")),
      "pos", pin = false)
      .select("c_custkey", "pos").as[(Long, Long)].collect().toSet
    assert(viaNoPin == viaWindow)
    assert(graft.operators.Pinned.pinnedCount == before,
      "pin = false must register nothing for release")
  }

  test("A10: approx_count_distinct (HLL++) lands within 5% of exact") {
    val o = Tables.orders(spark, sfDir)
    val exact = o.select(countDistinct("o_custkey")).as[Long].head().toDouble
    val approx = o.select(approx_count_distinct("o_custkey", 0.02)).as[Long].head().toDouble
    assert(math.abs(approx - exact) / exact < 0.05, s"approx=$approx exact=$exact")
  }

  test("Layout: the bits*dims bound cannot be overflowed past") {
    // r10: Int bits*n could overflow negative, pass the <= 63 bound, and
    // collapse every z-value to 0 (shift counts are mod 64) — the layout
    // would silently stop clustering instead of refusing
    intercept[IllegalArgumentException] {
      graft.operators.Layout.zValue(Seq(col("x"), col("y")), bits = 1073741824)
    }
    intercept[IllegalArgumentException] {
      graft.operators.Layout.duckZValue(Seq("x", "y"), bits = 1073741824)
    }
  }

  test("Layout: zValue matches a reference Morton implementation (incl. masking)") {
    def morton(x: Long, y: Long, bits: Int): Long = {
      var z = 0L
      var j = 0
      while (j < bits) {
        z |= ((x >> j) & 1L) << (2 * j)
        z |= ((y >> j) & 1L) << (2 * j + 1)
        j += 1
      }
      z
    }
    val pairs = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L), (255L, 255L),
      (123L, 456L), (65535L, 1L), (70000L, 2L)) // last one exceeds 16 bits -> masked
    val got = pairs.toDF("x", "y")
      .select(col("x"), col("y"),
        graft.operators.Layout.zValue(Seq(col("x"), col("y"))).as("z"))
      .as[(Long, Long, Long)].collect().map(t => (t._1, t._2) -> t._3).toMap
    pairs.foreach { case (x, y) =>
      assert(got((x, y)) == morton(x & 0xffffL, y & 0xffffL, 16),
        s"z mismatch at ($x, $y)")
    }
  }

  test("Layout: z-ordered files are tight in BOTH dimensions; a linear sort is not") {
    // 128x128 uniform grid: every (x, y) in [0,128)^2 exactly once
    val n = 128L
    val grid = spark.range(n * n)
      .select((col("id") % n).as("x"), expr(s"id div $n").as("y"))
    def meanExtent(dir: String, c: String): Double = {
      val files = new java.io.File(dir).listFiles()
        .filter(_.getName.endsWith(".parquet")).map(_.getPath).toSeq
      assert(files.size >= 8, s"expected several files, got ${files.size}")
      val exts = files.map { p =>
        val (lo, hi) = spark.read.parquet(p)
          .agg(min(col(c)).cast("double"), max(col(c)).cast("double"))
          .as[(Double, Double)].head()
        hi - lo
      }
      exts.sum / exts.size
    }
    val zDir = Files.createTempDirectory("graft_zorder").toString
    Sink.writeZOrdered(grid, zDir, Seq(col("x"), col("y")), files = 16, bits = 8)
    val linDir = Files.createTempDirectory("graft_linsort").toString
    grid.repartitionByRange(16, col("x")).sortWithinPartitions("x")
      .write.mode("overwrite").parquet(linDir)

    // round trip preserves the data
    assert(spark.read.parquet(zDir).count() == n * n)
    val (zx, zy) = (meanExtent(zDir, "x"), meanExtent(zDir, "y"))
    val linY = meanExtent(linDir, "y")
    // linear sort on x leaves every file spanning ~the full y range; the
    // z-curve keeps BOTH extents near the tile size (~32 for 16 files)
    assert(linY > 100, s"linear-sort y extent should span the range, got $linY")
    assert(zx < 96 && zy < 96, s"z-order extents should be tile-sized, got ($zx, $zy)")
    assert(zy < linY * 0.6, s"z-order must beat linear sort on the non-sort dim: $zy vs $linY")
  }

  test("streaming: flatMapGroupsWithState running totals match batch aggregation") {
    val ev = Tables.events(spark, sfDir)
    val out = graft.streaming.EventStreams.runningUserTotals(ev)
      .collect().map(u => u.user_id -> (u.events, math.round(u.total * 100) / 100.0)).toMap
    val expected = ev.groupBy("user_id")
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("t"))
      .as[(Long, Long, Double)].collect()
      .map { case (u, n, t) => u -> (n, t) }.toMap
    assert(out == expected)
  }

  /** Review-r9 pins on the merge/skew/as-of guards: feed defects and
    * reserved-name collisions fail loudly instead of silently dropping or
    * clobbering rows, and a map payload no longer fails the as-of join at
    * plan time.
    */
  test("merge/skew/as-of r9 guards: null versions, reserved names, map payloads") {
    import graft.operators.{Merge, Skew, AsOfJoin}
    val base = Seq((1L, 10L, "old")).toDF("k", "ts", "v")
    // a NULL-version change would silently LOSE to the base row — refused
    val badChange = Seq((1L, Option.empty[Long], "new")).toDF("k", "ts", "v")
    val e1 = intercept[IllegalArgumentException] {
      Merge.upsertLatest(base, badChange, Seq("k"), Seq("ts"))
    }
    assert(e1.getMessage.contains("NULL version"), e1.getMessage)
    // an empty key list = one global window partition — refused
    intercept[IllegalArgumentException] {
      Merge.upsertLatest(base, base, Seq.empty, Seq("ts"))
    }
    // scd2 must not clobber a pre-existing interval column
    val cdc = Seq((1L, 10L, "x", "keep-me")).toDF("k", "ts", "v", "valid_from")
    val e2 = intercept[IllegalArgumentException] {
      Merge.scd2History(cdc, Seq("k"), Seq("ts"))
    }
    assert(e2.getMessage.contains("valid_from"), e2.getMessage)
    intercept[IllegalArgumentException] {
      Merge.scd2History(base, Seq("k"), Seq("ts"), validFrom = "vf", validTo = "vf")
    }
    // saltedSum: a key column named like the output aggregate is refused
    intercept[IllegalArgumentException] {
      Skew.saltedSum(Seq(("a", 1L)).toDF("total", "x"), Seq("total"), col("x"))
    }
    // dotted column names derive salts correctly (col() would misparse)
    val dotted = Seq(("a", 1L), ("a", 2L), ("b", 3L)).toDF("user.id", "amount")
    val sums = Skew.saltedSum(dotted, Seq("user.id"), col("amount"), salts = 4)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sums == Map("a" -> 3L, "b" -> 3L), s"got $sums")
    // as-of join with a MAP payload: tie term falls back to JSON instead
    // of an AnalysisException at plan time
    val left = Seq((1L, 100L)).toDF("k", "ts")
    val right = Seq((1L, 50L, Map("a" -> "1")), (1L, 50L, Map("b" -> "2")))
      .toDF("k", "ts", "props")
    val got = AsOfJoin.backward(left, right, "k", "ts", "props").collect()
    assert(got.length == 1 && !got.head.isNullAt(2),
      "map payload must as-of join, deterministically tie-broken")
  }
}
