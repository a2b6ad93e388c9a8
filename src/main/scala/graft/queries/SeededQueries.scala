package graft.queries

import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Seeded / nondeterministic operators (SURVEY O2-O4, F5, S4) — excluded
  * from hash-matching per FIXTURES.md; the driver records rows-only checks
  * and SeededOpsSpec asserts the structural properties (sizes, multiset
  * equality, value bounds).
  */
object SeededQueries {

  val defs: Seq[QueryDef] = Seq(

    // O2: random sample without replacement (takeSample —
    // chapter1/SparkRDDAPITest.scala:39).
    QueryDef.rowsOnly("o2_sample_seeded") { (s, d) =>
      Tables.customer(s, d).sample(withReplacement = false, 0.1, seed = 42)
        .select("c_custkey", "c_name")
    },

    // O2b: stratified sample — per-class fractions (the class-balanced
    // sampling a training-data pipeline uses; structural assertions in
    // SeededOpsSpec).
    QueryDef.rowsOnly("o2_stratified_sample") { (s, d) =>
      Tables.customer(s, d).stat.sampleBy("c_mktsegment",
        Map("BUILDING" -> 0.5, "MACHINERY" -> 0.2, "AUTOMOBILE" -> 0.1), seed = 42L)
        .select("c_custkey", "c_mktsegment")
    },

    // O3: seeded shuffle (Collections.shuffle seed 1244 —
    // chapter_5/NetworkTrainedToSumNumbersUsingRegression.java:101).
    QueryDef.rowsOnly("o3_shuffle_seeded") { (s, d) =>
      Tables.customer(s, d).orderBy(rand(1244)).select("c_custkey", "c_mktsegment")
    },

    // O4: train/test split (splitTestAndTrain 80/20 —
    // chapter3/MNISTAnomalyDetector.java:71-76): emits the split sizes.
    QueryDef.rowsOnly("o4_train_test_split") { (s, d) =>
      val Array(train, test) = Tables.embeddings(s, d).randomSplit(Array(0.8, 0.2), seed = 42)
      val spark = s
      import spark.implicits._
      Seq(("train", train.count()), ("test", test.count())).toDF("split", "n")
    },

    // F5: uniform/gaussian random columns (Nd4j.rand/randn — ND4JTest.java:32,37),
    // range-scaled to [0, 3) like the regression generators.
    QueryDef.rowsOnly("f5_random_columns") { (s, d) =>
      Tables.embeddings(s, d).select(col("vec_id"),
        (rand(42) * 3.0).as("u"), randn(42).as("g"))
    },

    // S4: binary-file scan with path metadata (ImageRecordReader +
    // ParentPathLabelGenerator — chapter_4/MnistClassification.java:59-63):
    // reads the fixture directory itself as opaque binaries.
    QueryDef.rowsOnly("s4_binary_scan") { (s, d) =>
      s.read.format("binaryFile").load(s"$d/*.parquet")
        .select(regexp_extract(col("path"), "/([^/]+)$", 1).as("file_name"),
          col("length"))
        .orderBy("file_name")
    }
  )
}
