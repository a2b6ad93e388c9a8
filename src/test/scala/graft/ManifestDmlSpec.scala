package graft

import org.apache.spark.sql.functions._

import graft.sources.ManifestStore

/** SQL row-level DML on registered graft-manifest tables (r13, VERDICT
  * r12 #3): DELETE/UPDATE/MERGE land as single merge-on-read commits via
  * [[graft.sources.ManifestDmlRewrite]] — deletion vectors + update
  * batches, byte-identical data files, exact change-feed visibility.
  */
class ManifestDmlSpec extends SparkSpec {

  import SharedSpark.spark.implicits._

  private val M = ManifestStore

  private def freshTable(name: String, n: Int = 40): String = {
    val root = java.nio.file.Files.createTempDirectory(s"graft-dml-$name").toString
    new java.io.File(root).delete()
    M.append(spark,
      (0 until n).map(i => (i.toLong, s"p$i", i % 4)).toDF("id", "payload", "grp")
        .repartitionByRange(4, col("id")), root)
    spark.sql(s"DROP TABLE IF EXISTS $name")
    spark.sql(s"CREATE TABLE $name USING `graft-manifest` OPTIONS (path '$root')")
    root
  }

  private def ids(name: String): Seq[Long] =
    spark.sql(s"SELECT id FROM $name").as[Long].collect().sorted.toSeq

  test("DELETE FROM commits one mor-delete version; untouched files keep " +
    "byte identity; the same session sees the result without REFRESH") {
    val root = freshTable("dml_del")
    val before = M.latestSnapshot(spark, root).get
    val n = spark.sql("DELETE FROM dml_del WHERE id < 10").as[Long].head()
    assert(n == 10L, "num_affected_rows")
    val after = M.latestSnapshot(spark, root).get
    assert(after.version == before.version + 1 && after.op == "mor-delete")
    assert(ids("dml_del") == (10L until 40L))
    // merge-on-read: every data file path of the before snapshot survives
    val beforePaths = before.files.map(_.path).toSet
    assert(after.files.map(_.path).toSet == beforePaths,
      "a MoR delete must not rewrite data files")
    assert(after.files.exists(_.dv.exists(_.rows > 0)))
    // pruning: only the low-range file carries a vector
    assert(after.files.count(_.dv.exists(_.rows > 0)) == 1,
      "range-laid-out table: the condition prunes to one file")
    spark.sql("DROP TABLE IF EXISTS dml_del")
  }

  test("DELETE without WHERE truncates (all rows)") {
    val root = freshTable("dml_trunc", n = 12)
    val n = spark.sql("DELETE FROM dml_trunc").as[Long].head()
    assert(n == 12L)
    assert(spark.sql("SELECT count(*) FROM dml_trunc").as[Long].head() == 0L)
    assert(M.latestSnapshot(spark, root).get.op == "mor-delete")
    spark.sql("DROP TABLE IF EXISTS dml_trunc")
  }

  test("UPDATE applies self-referencing assignments to exactly the matched " +
    "rows in one mor-update commit") {
    val root = freshTable("dml_upd")
    val before = M.latestSnapshot(spark, root).get
    val n = spark.sql(
      "UPDATE dml_upd SET payload = concat(payload, '!'), id = id + 1000 " +
        "WHERE grp = 2 AND id < 20").as[Long].head()
    assert(n == 5L, "ids 2,6,10,14,18")
    val after = M.latestSnapshot(spark, root).get
    assert(after.version == before.version + 1 && after.op == "mor-update")
    val rows = spark.sql("SELECT id, payload FROM dml_upd WHERE id >= 1000")
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(rows == Seq(2L, 6L, 10L, 14L, 18L).map(i => (i + 1000, s"p$i!")))
    assert(spark.sql("SELECT count(*) FROM dml_upd").as[Long].head() == 40L,
      "an UPDATE conserves row count")
    // old data files keep identity (dv + appended update batch only)
    val beforePaths = before.files.map(_.path).toSet
    assert(beforePaths.subsetOf(after.files.map(_.path).toSet))
    spark.sql("DROP TABLE IF EXISTS dml_upd")
  }

  test("MERGE INTO (canonical upsert) lands as one MoR commit and the " +
    "change feed reads its exact row-level changes") {
    val root = freshTable("dml_merge", n = 20)
    val v0 = M.latestSnapshot(spark, root).get.version
    (15 until 30).map(i => (i.toLong, s"NEW$i", i % 4))
      .toDF("id", "payload", "grp").createOrReplaceTempView("dml_merge_src")
    val n = spark.sql(
      """MERGE INTO dml_merge t USING dml_merge_src s ON t.id = s.id
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin).as[Long].head()
    assert(n == 5L, "replaced rows: ids 15..19")
    val after = M.latestSnapshot(spark, root).get
    assert(after.version == v0 + 1 && after.op == "mor-upsert")
    assert(ids("dml_merge") == (0L until 30L))
    assert(spark.sql("SELECT payload FROM dml_merge WHERE id = 17")
      .as[String].head() == "NEW17")
    // the change feed: 15 inserts (the source batch) + 5 deletes (old rows)
    val (_, changes) = M.readChangesSince(spark, root, v0)
    val byType = changes.groupBy(ManifestStore.ChangeTypeCol).count()
      .as[(String, Long)].collect().toMap
    assert(byType == Map("insert" -> 15L, "delete" -> 5L))
    spark.sql("DROP TABLE IF EXISTS dml_merge")
  }

  test("SQL VERSION AS OF replays exact versions, including across a SQL " +
    "DELETE's deletion vectors (r13)") {
    val root = freshTable("dml_tt", n = 20) // v1: ids 0..19
    spark.sql("INSERT INTO dml_tt SELECT id, concat('n', id), 9 FROM range(20, 30)") // v2
    spark.sql("DELETE FROM dml_tt WHERE id < 8") // v3 (mor-delete)
    assert(spark.sql("SELECT count(*) FROM dml_tt VERSION AS OF 1")
      .as[Long].head() == 20L)
    assert(spark.sql("SELECT count(*) FROM dml_tt VERSION AS OF 2")
      .as[Long].head() == 30L)
    assert(spark.sql("SELECT count(*) FROM dml_tt VERSION AS OF 3")
      .as[Long].head() == 22L, "the travelled read applies the version's vectors")
    assert(spark.sql("SELECT count(*) FROM dml_tt").as[Long].head() == 22L)
    // TIMESTAMP AS OF (r14): a past instant that predates the table's
    // whole history refuses loudly; a future one lands on the head (exact
    // mtime-pinned resolution is covered in ManifestSqlLifecycleSpec)
    val e = intercept[Exception](
      spark.sql("SELECT * FROM dml_tt TIMESTAMP AS OF '2001-01-01'").collect())
    assert(e.getMessage.contains("predates"), e.getMessage.take(200))
    assert(spark.sql("SELECT count(*) FROM dml_tt TIMESTAMP AS OF '2999-01-01'")
      .as[Long].head() == 22L)
    // a non-manifest table keeps Spark's own time-travel refusal
    val pdir = java.nio.file.Files.createTempDirectory("graft-tt-parq").toString
    Seq((1L, "a")).toDF("id", "v").write.mode("overwrite").parquet(pdir)
    spark.sql("DROP TABLE IF EXISTS tt_parq")
    spark.sql(s"CREATE TABLE tt_parq USING parquet OPTIONS (path '$pdir')")
    val e2 = intercept[Exception](
      spark.sql("SELECT * FROM tt_parq VERSION AS OF 1").collect())
    assert(!e2.getMessage.contains("graft-manifest"))
    spark.sql("DROP TABLE IF EXISTS dml_tt")
    spark.sql("DROP TABLE IF EXISTS tt_parq")
  }

  test("out-of-scope shapes refuse with the recipe; other formats are untouched") {
    freshTable("dml_refuse", n = 8)
    Seq((1L, "x", 0)).toDF("id", "payload", "grp")
      .createOrReplaceTempView("dml_refuse_src")
    // clause condition on WHEN MATCHED → refuse
    val e1 = intercept[Exception](spark.sql(
      """MERGE INTO dml_refuse t USING dml_refuse_src s ON t.id = s.id
        |WHEN MATCHED AND s.grp = 0 THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin))
    assert(e1.getMessage.contains("canonical upsert"))
    // subquery in DELETE condition → refuse with the MERGE recipe
    val e2 = intercept[Exception](spark.sql(
      "DELETE FROM dml_refuse WHERE id IN (SELECT id FROM dml_refuse_src)"))
    assert(e2.getMessage.contains("subquer"))
    // a plain parquet table still gets Spark's own refusal, not ours
    val pdir = java.nio.file.Files.createTempDirectory("graft-dml-parq").toString
    Seq((1L, "a")).toDF("id", "v").write.mode("overwrite").parquet(pdir)
    spark.sql("DROP TABLE IF EXISTS dml_parq")
    spark.sql(s"CREATE TABLE dml_parq USING parquet OPTIONS (path '$pdir')")
    val e3 = intercept[Exception](spark.sql("DELETE FROM dml_parq WHERE id = 1"))
    assert(!e3.getMessage.contains("graft-manifest"),
      s"parquet DML must fail with Spark's own error, got: ${e3.getMessage.take(200)}")
    spark.sql("DROP TABLE IF EXISTS dml_refuse")
    spark.sql("DROP TABLE IF EXISTS dml_parq")
  }
}
