package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.sources.ManifestStore

/** Predicate-scoped atomic overwrite (r15 — the Delta replaceWhere shape)
  * and dynamic partition overwrite (SQL INSERT OVERWRITE): ONE commit
  * swaps a slice for a recomputed batch; readers see old or new, never a
  * mix or a gap.
  */
class ManifestOverwriteSpec extends SparkSpec {

  import SharedSpark.spark.implicits._

  private def freshRoot() =
    Files.createTempDirectory("graft-overwrite").toString

  private def days(d: Int, lo: Int, hi: Int, tag: String) =
    (lo until hi).map(i => (i.toLong, s"d$d", s"$tag-$i")).toDF("id", "day", "val")

  test("replaceWhere: one commit swaps the slice; rows outside the predicate refuse everything") {
    val root = freshRoot()
    ManifestStore.append(spark, days(1, 0, 10, "old")
      .union(days(2, 100, 110, "old")).repartition(4), root)
    val vBefore = ManifestStore.latestSnapshot(spark, root).get.version
    // the happy path: recompute day d1, swap it in
    val (replaced, _, v) = ManifestStore.overwriteWhere(spark,
      days(1, 0, 5, "new"), root, "day = 'd1'")
    assert(replaced == 10L && v == vBefore + 1)
    val after = ManifestStore.read(spark, root)
    assert(after.where(col("day") === "d1").count() == 5L)
    assert(after.where(col("day") === "d1" && col("val").startsWith("old"))
      .count() == 0L, "no old d1 row survives")
    assert(after.where(col("day") === "d2").count() == 10L, "d2 untouched")
    // time travel still reads the pre-overwrite slice
    assert(ManifestStore.readVersion(spark, root, vBefore)
      .where(col("day") === "d1").count() == 10L)
    assert(ManifestStore.latestSnapshot(spark, root).get.op == "overwrite")
    // a batch row OUTSIDE the predicate refuses the whole commit loudly
    val e = intercept[Exception] {
      ManifestStore.overwriteWhere(spark,
        days(1, 0, 3, "x").union(days(3, 900, 901, "leak")), root, "day = 'd1'")
    }
    assert(e.getMessage.contains("replaceWhere") &&
      e.getMessage.contains("outside the replaced slice"), e.getMessage)
    assert(ManifestStore.latestSnapshot(spark, root).get.version == v,
      "a refused overwrite must commit nothing")
    // NULL predicate evaluation does NOT satisfy (unlike CHECK): refuse
    val eNull = intercept[Exception] {
      ManifestStore.overwriteWhere(spark,
        Seq((1L, null: String, "n")).toDF("id", "day", "val"), root, "day = 'd1'")
    }
    assert(eNull.getMessage.contains("outside the replaced slice"), eNull.getMessage)
  }

  test("replaceWhere prunes: untouched files keep byte identity; no-match batch lands as pure addition") {
    val root = freshRoot()
    // three partitions → three+ files with tight day stats via partitioning
    ManifestStore.append(spark, days(1, 0, 10, "a"), root, partitionBy = Seq("day"))
    ManifestStore.append(spark, days(2, 100, 110, "a"), root, partitionBy = Seq("day"))
    ManifestStore.append(spark, days(3, 200, 210, "a"), root, partitionBy = Seq("day"))
    val before = ManifestStore.latestSnapshot(spark, root).get
    val d2paths = before.files.filter(
      _.partition.exists(_.get("day").contains(Some("d2")))).map(_.path).toSet
    val d3paths = before.files.filter(
      _.partition.exists(_.get("day").contains(Some("d3")))).map(_.path).toSet
    val (r1, files1, _) = ManifestStore.overwriteWhere(spark,
      days(1, 0, 2, "b"), root, "day = 'd1'")
    assert(r1 == 10L && files1 >= 1)
    val afterSnap = ManifestStore.latestSnapshot(spark, root).get
    assert(d2paths.subsetOf(afterSnap.files.map(_.path).toSet) &&
      d3paths.subsetOf(afterSnap.files.map(_.path).toSet),
      "files of untouched partitions keep byte identity")
    // a predicate matching nothing: batch lands, zero replaced, no file churn
    val liveBefore = ManifestStore.latestSnapshot(spark, root).get.files.map(_.path).toSet
    val (r0, f0, v0) = ManifestStore.overwriteWhere(spark,
      Seq((999L, "d9", "fresh")).toDF("id", "day", "val"), root, "day = 'd9'")
    assert(r0 == 0L && f0 == 0 && v0 > 0)
    val liveAfter = ManifestStore.latestSnapshot(spark, root).get.files.map(_.path).toSet
    assert(liveBefore.subsetOf(liveAfter), "no-match overwrite replaces nothing")
    assert(ManifestStore.read(spark, root).where(col("day") === "d9").count() == 1L)
  }

  test("replaceWhere respects table constraints and column mapping; schema mismatch refuses") {
    val root = freshRoot()
    ManifestStore.append(spark, days(1, 0, 6, "a"), root)
    ManifestStore.addCheckConstraint(spark, root, "ids_pos", "id >= 0")
    ManifestStore.renameColumn(spark, root, "val", "payload")
    // the batch speaks the NEW logical names; the predicate too
    val batch = Seq((7L, "d1", "new-7")).toDF("id", "day", "payload")
    val (r, _, _) = ManifestStore.overwriteWhere(spark, batch, root, "day = 'd1'")
    assert(r == 6L)
    assert(ManifestStore.read(spark, root).select("payload").as[String]
      .collect().toSeq == Seq("new-7"))
    // a constraint-violating batch refuses
    val eC = intercept[Exception] {
      ManifestStore.overwriteWhere(spark,
        Seq((-5L, "d1", "bad")).toDF("id", "day", "payload"), root, "day = 'd1'")
    }
    assert(eC.getMessage.contains("ids_pos"), eC.getMessage)
    // wrong columns refuse with the recipe
    val eS = intercept[IllegalArgumentException] {
      ManifestStore.overwriteWhere(spark,
        Seq((1L, "d1")).toDF("id", "day"), root, "day = 'd1'")
    }
    assert(eS.getMessage.contains("must match the table's"), eS.getMessage)
    // nondeterministic predicates refuse
    val eR = intercept[IllegalArgumentException] {
      ManifestStore.overwriteWhere(spark, batch, root, "rand() > 0.5")
    }
    assert(eR.getMessage.contains("deterministic"), eR.getMessage)
  }

  test("the write-path idiom: mode(overwrite) + option(replaceWhere); unscoped overwrite still refuses") {
    val root = freshRoot()
    ManifestStore.append(spark, days(1, 0, 8, "a")
      .union(days(2, 100, 108, "a")), root)
    days(2, 100, 103, "b").write.format("graft-manifest")
      .mode("overwrite").option("replaceWhere", "day = 'd2'").save(root)
    val after = ManifestStore.read(spark, root)
    assert(after.where(col("day") === "d2").count() == 3L &&
      after.where(col("day") === "d1").count() == 8L)
    // without the option the old refusal (and its recipe) stands
    val e = intercept[IllegalStateException] {
      days(1, 0, 1, "c").write.format("graft-manifest")
        .mode("overwrite").save(root)
    }
    assert(e.getMessage.contains("replaceWhere"), e.getMessage)
  }

  test("SQL INSERT OVERWRITE = dynamic partition overwrite in one commit; unpartitioned refuses") {
    val root = freshRoot()
    spark.sql("DROP TABLE IF EXISTS ow_t")
    days(1, 0, 10, "a").union(days(2, 100, 110, "a"))
      .createOrReplaceTempView("ow_seed")
    spark.sql(s"CREATE TABLE ow_t USING `graft-manifest` " +
      s"OPTIONS (path '$root') PARTITIONED BY (day) AS SELECT * FROM ow_seed")
    try {
      val vBefore = ManifestStore.latestSnapshot(spark, root).get.version
      // only d1 appears in the incoming rows → only d1 is replaced
      // (the v1 catalog orders partition columns LAST: (id, val, day))
      spark.sql("INSERT OVERWRITE ow_t SELECT id, 'new' AS val, 'd1' AS day " +
        "FROM range(4)")
      assert(ManifestStore.latestSnapshot(spark, root).get.version == vBefore + 1,
        "one atomic commit")
      val counts = spark.sql("SELECT day, count(*) AS n FROM ow_t GROUP BY day")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(counts == Map("d1" -> 4L, "d2" -> 10L), counts.toString)
      assert(spark.sql("SELECT count(*) FROM ow_t WHERE day='d1' AND val <> 'new'")
        .collect().head.getLong(0) == 0L)
      // time travel reads the pre-overwrite partition
      assert(ManifestStore.readVersion(spark, root, vBefore)
        .where(col("day") === "d1").count() == 10L)
      // an UNPARTITIONED table refuses with the replaceWhere recipe
      val root2 = freshRoot()
      spark.sql("DROP TABLE IF EXISTS ow_flat")
      spark.sql(s"CREATE TABLE ow_flat USING `graft-manifest` " +
        s"OPTIONS (path '$root2') AS SELECT * FROM ow_seed")
      try {
        val e = intercept[Exception] {
          spark.sql("INSERT OVERWRITE ow_flat SELECT id, 'd1', 'x' FROM range(2)")
        }
        assert(e.getMessage.contains("replaceWhere"), e.getMessage)
      } finally spark.sql("DROP TABLE IF EXISTS ow_flat")
    } finally spark.sql("DROP TABLE IF EXISTS ow_t")
  }
}
