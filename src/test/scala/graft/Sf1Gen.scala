package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** sf1 fixture generator for the scale rehearsal (VERDICT r5 #1): 10
  * referentially-consistent key-shifted copies of the driver's sf0.1
  * tables, written to a gitignored fixtures/sf1 dir in TESTDATA.md's
  * schema. `Test/runMain graft.Sf1Gen [srcDir] [outDir] [copies]`.
  *
  * Design choices that keep the 10x corpus REPRESENTATIVE rather than
  * degenerate:
  *  - every copy's facts reference that copy's dimension rows (all FK
  *    columns shift by the same per-table stride), so join fan-outs and
  *    group cardinalities scale 10x like real growth;
  *  - document text gets a per-copy consonant ROTATION (translate over
  *    ten consonants, identical string lengths): each copy occupies a
  *    disjoint shingle space, so the near-dup/contamination pipelines see
  *    the same planted dup DENSITY at 10x the corpus — naive duplication
  *    would instead make every doc a 9-way near-dup and explode candidate
  *    counts quadratically, which is a different (and wrong) experiment;
  *  - region/nation stay fixed (real dimension tables don't grow with
  *    fact volume); sources/langs/labels keep their value sets so stratum
  *    counts (KMV overlap, mixing weights) stay constant.
  */
object Sf1Gen {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = args.lift(1).getOrElse("/root/repo/fixtures/sf1")
    val copies = args.lift(2).map(_.toInt).getOrElse(10)
    require(copies >= 1 && copies <= 10,
      s"copies must be in [1, 10] (ten-consonant rotation alphabet), got $copies")
    val spark = GraftSession.getOrCreate(32)

    def tbl(name: String): DataFrame = spark.read.parquet(s"$src/$name.parquet")
    def stride(df: DataFrame, k: String): Long =
      df.agg(max(col(k)).cast("long")).head().getLong(0) + 1

    // per-copy consonant rotation: i=0 is identity, each i a distinct
    // bijection, string lengths preserved (n_chars stays truthful)
    val alpha = "bcdfghjklm"
    def rotate(c: org.apache.spark.sql.Column, i: Int) =
      if (i == 0) c else translate(c, alpha, alpha.drop(i) + alpha.take(i))

    def scaled(df: DataFrame, shifts: Seq[(String, Long)],
               textCols: Seq[String] = Nil): DataFrame =
      (0 until copies).map { i =>
        var c = df
        shifts.foreach { case (k, s) => c = c.withColumn(k, col(k) + lit(i * s)) }
        textCols.foreach { t => c = c.withColumn(t, rotate(col(t), i)) }
        c
      }.reduce(_ unionByName _)

    val custS = stride(tbl("customer"), "c_custkey")
    val suppS = stride(tbl("supplier"), "s_suppkey")
    val partS = stride(tbl("part"), "p_partkey")
    val ordS = stride(tbl("orders"), "o_orderkey")
    val evS = stride(tbl("events"), "event_id")
    val userS = stride(tbl("events"), "user_id")
    val docS = stride(tbl("documents"), "doc_id")
    val vecS = stride(tbl("embeddings"), "vec_id")

    val outTables: Seq[(String, DataFrame)] = Seq(
      "region" -> tbl("region"),
      "nation" -> tbl("nation"),
      "customer" -> scaled(tbl("customer"), Seq("c_custkey" -> custS)),
      "supplier" -> scaled(tbl("supplier"), Seq("s_suppkey" -> suppS)),
      "part" -> scaled(tbl("part"), Seq("p_partkey" -> partS)),
      "orders" -> scaled(tbl("orders"),
        Seq("o_orderkey" -> ordS, "o_custkey" -> custS)),
      "lineitem" -> scaled(tbl("lineitem"),
        Seq("l_orderkey" -> ordS, "l_partkey" -> partS, "l_suppkey" -> suppS)),
      "events" -> scaled(tbl("events"),
        Seq("event_id" -> evS, "user_id" -> userS)),
      "documents" -> scaled(tbl("documents"),
        Seq("doc_id" -> docS), textCols = Seq("text")),
      "embeddings" -> scaled(tbl("embeddings"), Seq("vec_id" -> vecS)))

    outTables.foreach { case (name, df) =>
      df.write.mode("overwrite").parquet(s"$out/$name.parquet")
      println(s"SF1GEN $name rows=${spark.read.parquet(s"$out/$name.parquet").count()}")
    }
    spark.stop()
  }
}
