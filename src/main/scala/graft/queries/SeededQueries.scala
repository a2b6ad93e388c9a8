package graft.queries

import org.apache.spark.sql.functions._
import graft.operators.Sampling
import graft.sources.Tables

/** Sampling / randomness operators (SURVEY O2-O4, F5, S4). O2-O4 use the
  * hash-based deterministic draws of [[graft.operators.Sampling]] (SURVEY
  * §7.3): partitioning-independent and md5-portable, so unlike Spark's
  * per-partition rand(seed) streams they are fully DuckDB-replayable and
  * hash-checked by the oracle. F5 (genuinely random columns) and S4
  * (binary scan) stay rows-only; SeededOpsSpec asserts their structure.
  */
object SeededQueries {

  /** DuckDB twin of Sampling.drawOn — single-sourced here so the Spark and
    * oracle formulas cannot desync.
    */
  private def duckDraw(keyExpr: String, salt: String): String =
    s"CAST('0x' || substr(md5(CAST($keyExpr AS VARCHAR) || ':$salt'), 1, 8) AS BIGINT)"

  val defs: Seq[QueryDef] = Seq(

    // O2: ~10% sample without replacement (takeSample —
    // chapter1/SparkRDDAPITest.scala:39), deterministic by key.
    QueryDef.sql("o2_sample_seeded",
      s"""SELECT c_custkey, c_name FROM customer
         |WHERE ${duckDraw("c_custkey", "o2s42")} % 100 < 10""".stripMargin) { (s, d) =>
      Sampling.hashSample(Tables.customer(s, d), col("c_custkey"), "o2s42", 10)
        .select("c_custkey", "c_name")
    },

    // O2b: stratified sample — per-class keep rates (the class-balanced
    // sampling a training-data pipeline uses); unlisted strata drop.
    QueryDef.sql("o2_stratified_sample",
      s"""SELECT c_custkey, c_mktsegment FROM customer
         |WHERE ${duckDraw("c_custkey", "o2b42")} % 1000 <
         |  CASE c_mktsegment WHEN 'BUILDING' THEN 500 WHEN 'MACHINERY' THEN 200
         |       WHEN 'AUTOMOBILE' THEN 100 ELSE 0 END""".stripMargin) { (s, d) =>
      Sampling.hashStratifiedSample(Tables.customer(s, d), col("c_custkey"),
        col("c_mktsegment"),
        Map("BUILDING" -> 500, "MACHINERY" -> 200, "AUTOMOBILE" -> 100), "o2b42")
        .select("c_custkey", "c_mktsegment")
    },

    // O2c: exactly-k-per-group sample — bounded output per class no matter
    // how skewed the class sizes are (the balanced-eval-set primitive).
    // Catalyst runs the rank filter as a WindowGroupLimit (top-k heap below
    // the shuffle), so no group is ever fully sorted.
    QueryDef.sql("o2_fixed_k_per_group",
      s"""SELECT c_custkey, c_mktsegment FROM (
         |  SELECT c_custkey, c_mktsegment,
         |    row_number() OVER (PARTITION BY c_mktsegment
         |      ORDER BY ${duckDraw("c_custkey", "o2c42")}, c_custkey) AS rk
         |  FROM customer) WHERE rk <= 20""".stripMargin) { (s, d) =>
      Sampling.hashFixedK(Tables.customer(s, d), col("c_mktsegment"),
        col("c_custkey"), "o2c42", 20)
        .select("c_custkey", "c_mktsegment")
    },

    // O3: deterministic shuffle (Collections.shuffle seed 1244 —
    // chapter_5/NetworkTrainedToSumNumbersUsingRegression.java:101): a
    // reproducible permutation with an explicit position column, ranked by
    // the scale-safe stableRowNumber (never a single-partition window).
    QueryDef.sql("o3_shuffle_seeded",
      s"""SELECT c_custkey, c_mktsegment,
         |  row_number() OVER (ORDER BY ${duckDraw("c_custkey", "o3s1244")}, c_custkey) AS pos
         |FROM customer""".stripMargin) { (s, d) =>
      Sampling.hashShuffle(
        Tables.customer(s, d).select("c_custkey", "c_mktsegment"),
        col("c_custkey"), "o3s1244", "pos")
    },

    // O4: train/test split (splitTestAndTrain 80/20 —
    // chapter3/MNISTAnomalyDetector.java:71-76): one draw labels each row,
    // so the split is disjoint+exhaustive by construction; emits the sizes.
    QueryDef.sql("o4_train_test_split",
      s"""SELECT CASE WHEN ${duckDraw("vec_id", "o4s42")} % 100 < 80
         |            THEN 'train' ELSE 'test' END AS split, count(*) AS n
         |FROM embeddings GROUP BY 1""".stripMargin) { (s, d) =>
      Tables.embeddings(s, d)
        .select(Sampling.splitLabel(col("vec_id"), "o4s42", 80).as("split"))
        .groupBy("split").agg(count(lit(1)).as("n"))
    },

    // F5: uniform/gaussian random columns (Nd4j.rand/randn — ND4JTest.java:32,37),
    // range-scaled to [0, 3) like the regression generators. Genuinely
    // random by contract, so the VALUES stay un-pinned — but the laws a
    // correct RNG column must satisfy are exact booleans the oracle CAN
    // pin (r7, same pattern as the ANN recall / ML floor rows): row
    // count, hard bounds (u in [0,3), g finite), and distribution moments
    // inside windows wide enough that a legitimate draw never flaps: the
    // embeddings fixture has 500 rows at sf0.001/sf0.01 (2000 at sf0.1),
    // so the +-0.5 windows sit >= 11 sigma from a fair draw's mean (se of
    // the gaussian mean = 1/sqrt(500) ~ 0.045); even a hypothetical
    // 50-row fixture would keep >= 3.5 sigma. The detailed bounds/moments
    // analysis stays in SeededOpsSpec.
    QueryDef.sql(
      "f5_random_columns",
      """SELECT CAST(count(*) AS BIGINT) AS n_rows, true AS bounds_ok,
        |       true AS moments_ok
        |FROM embeddings""".stripMargin) { (s, d) =>
      Tables.embeddings(s, d).select(col("vec_id"),
          (rand(42) * 3.0).as("u"), randn(42).as("g"))
        .agg(
          count(lit(1)).as("n_rows"),
          bool_and(col("u") >= 0.0 && col("u") < 3.0 &&
            !isnan(col("g")) && abs(col("g")) < 100.0).as("bounds_ok"),
          (abs(avg(col("u")) - 1.5) < 0.5 && abs(avg(col("g"))) < 0.5 &&
            abs(stddev(col("g")) - 1.0) < 0.5).as("moments_ok"))
    },

    // S4: binary-file scan with path metadata (ImageRecordReader +
    // ParentPathLabelGenerator — chapter_4/MnistClassification.java:59-63):
    // reads the fixture directory itself as opaque binaries. Oracle-checked
    // (VERDICT r5 #6): DuckDB's read_blob stats the same files live, so
    // name+size match hash-exactly with no stored golden. The oracle path
    // is the t2 contract's fixed correctness dir (TESTDATA.md: the driver
    // always verifies at sf0.01) — the one place the static oracle string
    // must name a directory the Spark side receives as a parameter.
    QueryDef.pinnedSql(
      "s4_binary_scan",
      """SELECT regexp_extract(filename, '/([^/]+)$', 1) AS file_name,
        |       CAST(size AS BIGINT) AS length
        |FROM read_blob('/root/testdata/sf0.01/*.parquet')
        |ORDER BY file_name""".stripMargin) { (s, d) =>
      // pathGlobFilter instead of a glob-in-path: same files, but the
      // reader's streaming-metadata probe gets a real directory (a glob
      // path makes it log a spurious FileNotFoundException WARN per run)
      s.read.format("binaryFile").option("pathGlobFilter", "*.parquet").load(d)
        .select(regexp_extract(col("path"), "/([^/]+)$", 1).as("file_name"),
          col("length"))
        .orderBy("file_name")
    },

    // S7 (r8): IDX export + distributed read-back, oracle-checked — the
    // MNIST-format source graduates from test-only coverage to the hash
    // gate. Embeddings quantize to ubyte pixels (round((x+1)/2 * 255) IN
    // DOUBLE on both engines, so rounding parity is exact), export as
    // sharded IDX files (IdxSource.writeDataset, one shard pair per
    // partition), read back through the distributed IDX reader, and
    // reduce to a per-label (count, byte-checksum) histogram the oracle
    // recomputes straight from the embeddings table. A drift anywhere in
    // the writer's framing, the reader's parsing, or the quantization
    // hash-fails the round. Scratch dir per sfDir, rebuilt every run.
    QueryDef.sql(
      "s7_idx_roundtrip",
      """SELECT label, CAST(count(*) AS BIGINT) AS n,
        |       CAST(sum(list_aggregate(list_transform(CAST(embedding AS DOUBLE[]),
        |         x -> round(least(greatest((x + 1) / 2, 0), 1) * 255)), 'sum')) AS BIGINT) AS byte_sum
        |FROM embeddings GROUP BY label ORDER BY label""".stripMargin) { (s, d) =>
      // IndexStore owns the scratch-path scheme (sanitized name + hash —
      // a bare 32-bit hash tag can collide across fixture dirs and the
      // unconditional delete below would then race another run, review r9)
      val dir = s"${graft.sources.IndexStore.root(d)}/s7_idx"
      val fs = new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(dir), true)
      val quant = Tables.embeddings(s, d).select(
        transform(col("embedding"),
          x => least(greatest((x.cast("double") + 1) / 2, lit(0.0)), lit(1.0))).as("pixels"),
        col("label"))
      graft.sources.IdxSource.writeDataset(quant.repartition(4), dir, side = 8)
      graft.sources.IdxSource
        .readDataset(s, s"$dir/images-*-idx3-ubyte", s"$dir/labels-*-idx1-ubyte")
        .select(col("label"),
          aggregate(transform(col("pixels"), p => round(p * 255).cast("long")),
            lit(0L), (acc, v) => acc + v).as("rec_sum"))
        .groupBy("label")
        .agg(count(lit(1)).as("n"), sum(col("rec_sum")).as("byte_sum"))
        .orderBy("label")
    },

    // E11: token-budget curation — keep at most 800 tokens per source,
    // chosen in deterministic draw order (the corpus-mixing step of a
    // pre-training pipeline). The oracle replays the single-window
    // formulation; the Spark side runs the bucketed two-phase plan
    // (buckets=8 here so multi-bucket offsets are exercised) — identical
    // results by construction, see Sampling.tokenBudget.
    QueryDef.sql("e11_token_budget",
      s"""WITH toks AS (SELECT doc_id, source,
         |  CAST(len(${TextQueries.duckToks}) AS BIGINT) AS n_toks FROM documents),
         |run AS (SELECT doc_id, source, n_toks,
         |  sum(n_toks) OVER (PARTITION BY source
         |    ORDER BY ${duckDraw("doc_id", "e11s7")}, doc_id) AS cum FROM toks)
         |SELECT doc_id, source, n_toks FROM run WHERE cum <= 800
         |ORDER BY doc_id""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d).select(col("doc_id"), col("source"),
        size(graft.functions.TextFunctions.tokenize(col("text"))).cast("long").as("n_toks"))
      Sampling.tokenBudget(docs, "source", col("doc_id"), col("n_toks"),
        "e11s7", budget = 800L, buckets = 8)
        .orderBy("doc_id")
    },

    // E12: source-weighted mixing — 2.5 epochs of src0, 0.25 of src1, one
    // of src2 (others drop). Fractional epochs resolve per-row by the
    // deterministic draw; copies carry an epoch index. Entirely map-side
    // (see Sampling.weightedMix) and exactly replayable: the oracle runs
    // the identical micro-unit arithmetic.
    QueryDef.sql("e12_weighted_mix",
      s"""WITH w AS (SELECT doc_id, source,
         |  CASE source WHEN 'src0' THEN 2.5 WHEN 'src1' THEN 0.25
         |       WHEN 'src2' THEN 1.0 ELSE 0.0 END AS wt FROM documents),
         |n AS (SELECT doc_id, source,
         |  CAST(floor(wt) AS BIGINT) +
         |  CASE WHEN ${duckDraw("doc_id", "e12mix")} % 1000000 <
         |            CAST(floor(wt * 1000000) AS BIGINT) - CAST(floor(wt) AS BIGINT) * 1000000
         |       THEN 1 ELSE 0 END AS n_copies
         |  FROM w),
         |mixed AS (SELECT doc_id, source, unnest(generate_series(1, n_copies)) AS epoch
         |          FROM n WHERE n_copies > 0)
         |SELECT doc_id, source, CAST(epoch AS BIGINT) AS epoch FROM mixed
         |ORDER BY doc_id, epoch""".stripMargin) { (s, d) =>
      Sampling.weightedMix(Tables.documents(s, d).select("doc_id", "source"),
        col("source"), Map("src0" -> 2.5, "src1" -> 0.25, "src2" -> 1.0),
        col("doc_id"), "e12mix")
        .orderBy("doc_id", "epoch")
    },

    // E12b: temperature mixing — epoch weights DERIVED from the data
    // (sqrt(n_max/n_lang), the α=0.5 multilingual upsampling curve), so
    // the dominant language runs one epoch and low-resource languages are
    // pulled toward parity. sqrt is exactly-rounded IEEE on every engine,
    // which is what keeps the fractional-epoch draw replayable (see
    // Sampling.temperatureMix). The weights join is null-safe in BOTH
    // twins (<=> / IS NOT DISTINCT FROM): a NULL stratum is data-derived
    // like any other and must stay represented.
    QueryDef.sql("e12_temperature_mix",
      s"""WITH cnt AS (SELECT lang, count(*) AS n_s FROM documents GROUP BY lang),
         |w AS (SELECT lang, sqrt(CAST((SELECT max(n_s) FROM cnt) AS DOUBLE) / n_s) AS wt
         |      FROM cnt),
         |n AS (SELECT doc_id, d.lang AS lang,
         |  CAST(floor(wt) AS BIGINT) +
         |  CASE WHEN ${duckDraw("doc_id", "e12temp")} % 1000000 <
         |            CAST(floor(wt * 1000000) AS BIGINT) - CAST(floor(wt) AS BIGINT) * 1000000
         |       THEN 1 ELSE 0 END AS n_copies
         |  FROM documents d JOIN w ON d.lang IS NOT DISTINCT FROM w.lang),
         |mixed AS (SELECT doc_id, lang, unnest(generate_series(1, n_copies)) AS epoch
         |          FROM n WHERE n_copies > 0)
         |SELECT doc_id, lang, CAST(epoch AS BIGINT) AS epoch FROM mixed
         |ORDER BY doc_id, epoch""".stripMargin) { (s, d) =>
      Sampling.temperatureMix(Tables.documents(s, d).select("doc_id", "lang"),
        col("lang"), col("doc_id"), "e12temp")
        .orderBy("doc_id", "epoch")
    }
  )
}
