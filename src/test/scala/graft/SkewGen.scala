package graft

import org.apache.spark.sql.functions._

/** Skewed-fixture generator for the round-7 skew rehearsal (VERDICT r6 #4):
  * SCALE.md argued skew-safety (salting, AQE, partial aggregation) but no
  * fixture actually had a hot key. This derives a gitignored
  * `fixtures/skew0.1` from sf0.1 with two planted pathologies:
  *
  *  - a HOT CUSTOMER: ~10% of all orders reassigned to c_custkey = 1
  *    (every o_orderkey % 10 == 0) — the grouped-aggregate / outer-join
  *    skew shape (reference analog: the label-frequency-skewed groupBy of
  *    chapter3/MNISTAnomalyDetector.java:184-217);
  *  - a GIANT NEAR-DUP CLUSTER: 1000 planted variants of doc 0's text
  *    (each appends one distinct token, so pairwise Jaccard stays ~n/(n+2)
  *    — far above the 0.5 detection threshold and colliding in every LSH
  *    band) at doc_ids 5,000,000+ — the boilerplate-cluster shape that
  *    makes an uncapped band bucket emit m(m-1)/2 candidate pairs.
  *
  * `Test/runMain graft.SkewGen [srcDir] [outDir] [clusterSize]`.
  */
object SkewGen {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = args.lift(1).getOrElse("/root/repo/fixtures/skew0.1")
    val clusterSize = args.lift(2).map(_.toInt).getOrElse(1000)
    val spark = GraftSession.getOrCreate(32)

    // orders: hot customer takes every 10th order
    val orders = spark.read.parquet(s"$src/orders.parquet")
      .withColumn("o_custkey",
        when(col("o_orderkey") % 10 === 0, lit(1L)).otherwise(col("o_custkey")))
    orders.write.mode("overwrite").parquet(s"$out/orders.parquet")

    // documents: base corpus + the giant near-dup cluster of doc 0
    val docs = spark.read.parquet(s"$src/documents.parquet")
    val seedText = docs.where(col("doc_id") === 0).select("text")
      .head().getString(0)
    import spark.implicits._
    val cluster = spark.range(clusterSize.toLong)
      .select((col("id") + 5000000L).as("doc_id"),
        concat(lit(seedText), lit(" zzvariant"), col("id").cast("string")).as("text"),
        lit("en").as("lang"), lit("skewcluster").as("source"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    docs.unionByName(cluster).write.mode("overwrite").parquet(s"$out/documents.parquet")

    // tables the rehearsal queries join against, copied unchanged
    Seq("customer", "lineitem", "nation", "region").foreach { t =>
      spark.read.parquet(s"$src/$t.parquet")
        .write.mode("overwrite").parquet(s"$out/$t.parquet")
    }
    Seq("orders", "documents", "customer").foreach { t =>
      println(s"SKEWGEN $t rows=${spark.read.parquet(s"$out/$t.parquet").count()}")
    }
    val hot = spark.read.parquet(s"$out/orders.parquet")
      .where(col("o_custkey") === 1).count()
    println(s"SKEWGEN hot-customer orders=$hot")
    spark.stop()
  }
}
