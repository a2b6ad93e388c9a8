package graft

import org.apache.hadoop.fs.Path

import graft.sources.ManifestStore

/** SQL table LIFECYCLE on graft-manifest tables (r14, VERDICT r13 #1+#3):
  * birth (`CREATE TABLE ... AS SELECT`, column-list `CREATE TABLE` +
  * first INSERT), maintenance (`OPTIMIZE [ZORDER BY]`, `VACUUM RETAIN`),
  * and `TIMESTAMP AS OF` time travel — a SQL-only user can now create,
  * fill, query, restructure and reclaim a table without touching the
  * library API.
  */
class ManifestSqlLifecycleSpec extends SparkSpec {

  import SharedSpark.spark.implicits._

  private val M = ManifestStore

  private def freshRoot(name: String): String = {
    val root = java.nio.file.Files.createTempDirectory(s"graft-sql-$name").toString
    new java.io.File(root).delete()
    root
  }

  test("CREATE TABLE AS SELECT births a manifest table; re-CTAS refuses; INSERT extends it") {
    val root = freshRoot("ctas")
    spark.sql("DROP TABLE IF EXISTS ctas_t")
    spark.sql(s"CREATE TABLE ctas_t USING `graft-manifest` OPTIONS (path '$root') " +
      "AS SELECT id, concat('p', id) AS payload FROM range(20)")
    assert(M.latestSnapshot(spark, root).get.version == 1L,
      "CTAS must commit exactly one manifest version")
    assert(spark.sql("SELECT count(*) FROM ctas_t").as[Long].head() == 20L)
    // a second CTAS at the same root refuses — the manifest log exists
    val err = intercept[Exception] {
      spark.sql(s"CREATE TABLE ctas_t2 USING `graft-manifest` OPTIONS (path '$root') " +
        "AS SELECT id FROM range(3)")
    }
    assert(err.getMessage != null)
    spark.sql("DROP TABLE IF EXISTS ctas_t2")
    // INSERT INTO keeps working against the CTAS-born table
    spark.sql("INSERT INTO ctas_t SELECT id, 'x' FROM range(20, 25)")
    assert(spark.sql("SELECT count(*) FROM ctas_t").as[Long].head() == 25L)
    assert(M.latestSnapshot(spark, root).get.version == 2L)
    spark.sql("DROP TABLE IF EXISTS ctas_t")
  }

  test("column-list CREATE TABLE: empty read before first write, INSERT births v1") {
    val root = freshRoot("birth")
    spark.sql("DROP TABLE IF EXISTS birth_t")
    spark.sql(s"CREATE TABLE birth_t (id BIGINT, payload STRING) " +
      s"USING `graft-manifest` OPTIONS (path '$root')")
    assert(M.latestSnapshot(spark, root).isEmpty,
      "a column-list CREATE registers the schema; no manifest until data lands")
    assert(spark.sql("SELECT * FROM birth_t").count() == 0L,
      "a created-but-never-written table reads as zero rows")
    spark.sql("INSERT INTO birth_t VALUES (1, 'a'), (2, 'b')")
    val snap = M.latestSnapshot(spark, root).get
    assert(snap.version == 1L, "the FIRST insert births version 1")
    assert(spark.sql("SELECT id FROM birth_t ORDER BY id").as[Long].collect()
      .toSeq == Seq(1L, 2L))
    // the manifest owns the schema from here on: library reads agree
    assert(M.read(spark, root).columns.toSeq == Seq("id", "payload"))
    spark.sql("DROP TABLE IF EXISTS birth_t")
  }

  test("column-list CREATE TABLE ... PARTITIONED BY: first insert commits the catalog's partitioning") {
    val root = freshRoot("pbirth")
    spark.sql("DROP TABLE IF EXISTS pbirth_t")
    spark.sql(s"CREATE TABLE pbirth_t (id BIGINT, grp STRING) " +
      s"USING `graft-manifest` PARTITIONED BY (grp) OPTIONS (path '$root')")
    spark.sql("INSERT INTO pbirth_t SELECT id, concat('g', id % 3) FROM range(30)")
    val snap = M.latestSnapshot(spark, root).get
    assert(snap.partCols == Seq("grp"),
      "the catalog's PARTITIONED BY must reach the birthing commit")
    assert(snap.files.forall(_.partition.exists(_.contains("grp"))),
      "files must carry hive partition values")
    assert(spark.sql("SELECT count(*) FROM pbirth_t WHERE grp = 'g1'")
      .as[Long].head() == 10L)
    spark.sql("DROP TABLE IF EXISTS pbirth_t")
  }

  test("OPTIMIZE bin-packs; OPTIMIZE ZORDER BY lays out the curve; rows conserved") {
    val root = freshRoot("opt")
    spark.sql("DROP TABLE IF EXISTS opt_t")
    M.append(spark, (0 until 400).map(i => (i.toLong, (i * 7 % 100).toLong))
      .toDF("a", "b").repartition(16), root)
    spark.sql(s"CREATE TABLE opt_t USING `graft-manifest` OPTIONS (path '$root')")
    val r = spark.sql("OPTIMIZE opt_t").collect().head
    assert(r.getLong(0) >= 16 && r.getLong(1) < r.getLong(0),
      s"OPTIMIZE must reduce file count: ${r.getLong(0)} -> ${r.getLong(1)}")
    assert(spark.sql("SELECT count(*) FROM opt_t").as[Long].head() == 400L)
    // z-order: one physical commit, rows conserved, both dims' stats tight
    val z = spark.sql("OPTIMIZE opt_t ZORDER BY (a, b)").collect().head
    assert(z.getLong(2) == r.getLong(2) + 1, "one more committed version")
    assert(spark.sql("SELECT count(*) FROM opt_t").as[Long].head() == 400L)
    assert(M.latestSnapshot(spark, root).get.op == "compact",
      "OPTIMIZE commits are PHYSICAL — change feeds stream through them")
    spark.sql("DROP TABLE IF EXISTS opt_t")
  }

  test("VACUUM RETAIN n VERSIONS / HOURS reclaims; a path-literal target works") {
    val root = freshRoot("vac")
    spark.sql("DROP TABLE IF EXISTS vac_t")
    M.append(spark, (0 until 50).toDF("id").repartition(4), root)
    M.append(spark, (50 until 100).toDF("id").repartition(4), root)
    spark.sql(s"CREATE TABLE vac_t USING `graft-manifest` OPTIONS (path '$root')")
    spark.sql("OPTIMIZE vac_t")
    // age guard honored: RETAIN 24 HOURS (default) drops nothing young
    assert(spark.sql("VACUUM vac_t RETAIN 1 VERSIONS").as[Long].head() == 0L)
    // explicit zero-hour retention reclaims the pre-compaction batches
    val dropped = spark.sql(s"VACUUM '$root' RETAIN 1 VERSIONS RETAIN 0 HOURS")
      .as[Long].head()
    assert(dropped == 2L, s"two superseded batch dirs, got $dropped")
    assert(spark.sql("SELECT count(*) FROM vac_t").as[Long].head() == 100L)
    spark.sql("DROP TABLE IF EXISTS vac_t")
  }

  test("the delegating parser leaves every other statement to Spark (incl. its errors)") {
    assert(spark.sql("SELECT 1 + 1").as[Int].head() == 2)
    intercept[org.apache.spark.sql.catalyst.parser.ParseException] {
      spark.sql("SELEKT banana")
    }
    // OPTIMIZE on a non-manifest target refuses loudly, not silently
    spark.sql("CREATE OR REPLACE TEMP VIEW not_a_table AS SELECT 1 AS x")
    intercept[Exception] { spark.sql("OPTIMIZE not_a_table") }
  }

  test("TIMESTAMP AS OF resolves nearest-version-at-or-before by commit mtime (SQL + reader option)") {
    val root = freshRoot("ts")
    spark.sql("DROP TABLE IF EXISTS ts_t")
    M.append(spark, (0 until 10).toDF("id"), root)  // v1
    M.append(spark, (10 until 20).toDF("id"), root) // v2
    // pin distinguishable commit times (mtimes are the store's write clock)
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val t1 = 1600000000000L
    val t2 = 1600000100000L
    fs.setTimes(new Path(s"$root/_manifests/v${"%020d".format(1)}.manifest"), t1, -1)
    fs.setTimes(new Path(s"$root/_manifests/v${"%020d".format(2)}.manifest"), t2, -1)
    spark.sql(s"CREATE TABLE ts_t USING `graft-manifest` OPTIONS (path '$root')")
    def countAt(millis: Long): Long =
      spark.read.format("graft-manifest").option("timestampAsOf", millis.toString)
        .load(root).count()
    assert(countAt(t1) == 10L, "exactly at v1's commit time → v1")
    assert(countAt(t1 + 50000) == 10L, "between commits → the older version")
    assert(countAt(t2) == 20L && countAt(t2 + 1) == 20L)
    intercept[java.util.NoSuchElementException] { countAt(t1 - 1) }
    // SQL surface: literal evaluated in the session time zone
    val lit1 = new java.sql.Timestamp(t1 + 1).toString
    assert(spark.sql(s"SELECT count(*) FROM ts_t TIMESTAMP AS OF '$lit1'")
      .as[Long].head() == 10L)
    val lit2 = new java.sql.Timestamp(t2).toString
    assert(spark.sql(s"SELECT count(*) FROM ts_t TIMESTAMP AS OF '$lit2'")
      .as[Long].head() == 20L)
    spark.sql("DROP TABLE IF EXISTS ts_t")
  }

  test("RESTORE TABLE makes time travel durable; DESCRIBE HISTORY lists versions (r14)") {
    val root = freshRoot("restore")
    spark.sql("DROP TABLE IF EXISTS rst_t")
    M.append(spark, (0 until 10).map(i => (i.toLong, s"p$i")).toDF("id", "payload"), root) // v1
    M.append(spark, (10 until 20).map(i => (i.toLong, s"p$i")).toDF("id", "payload"), root) // v2
    // an exactly-once watermark that must survive the restore
    graft.sources.ManifestStore.appendBatch(spark,
      Seq((100L, "wm")).toDF("id", "payload"), root, "wm-app", 7L) // v3
    spark.sql(s"CREATE TABLE rst_t USING `graft-manifest` OPTIONS (path '$root')")
    assert(spark.sql("DELETE FROM rst_t WHERE id < 5").as[Long].head() == 5L) // v4
    assert(spark.sql("SELECT count(*) FROM rst_t").as[Long].head() == 16L)
    // durable time travel: live state becomes v3's, zero data moved
    val r = spark.sql("RESTORE TABLE rst_t TO VERSION AS OF 3").collect().head
    assert(r.getLong(0) == 3L && r.getLong(1) == 5L)
    val snap = M.latestSnapshot(spark, root).get
    assert(snap.op == "restore")
    assert(spark.sql("SELECT count(*) FROM rst_t").as[Long].head() == 21L)
    assert(snap.files.map(f => f.path -> f.dv.map(_.path)) ==
      M.snapshotAt(spark, root, 3L).get.files.map(f => f.path -> f.dv.map(_.path)),
      "the restored file list is exactly the target version's")
    assert(snap.txns.get("wm-app").contains(7L),
      "txn watermarks never regress across a restore")
    // the deleted state stays time-travelable (v4 still reads post-delete)
    assert(M.readVersion(spark, root, 4L).count() == 16L)
    // restoring to a pre-watermark version keeps the CURRENT txns too
    spark.sql("RESTORE TABLE rst_t VERSION AS OF 1") // optional TO
    assert(spark.sql("SELECT count(*) FROM rst_t").as[Long].head() == 10L)
    assert(M.latestSnapshot(spark, root).get.txns.get("wm-app").contains(7L))
    // DESCRIBE HISTORY: newest first, restore ops visible, LIMIT honored
    val hist = spark.sql("DESCRIBE HISTORY rst_t").collect()
    assert(hist.map(_.getLong(0)).toSeq == hist.map(_.getLong(0)).sorted.reverse.toSeq)
    assert(hist.exists(_.getString(1) == "restore"))
    assert(spark.sql("DESCRIBE HISTORY rst_t LIMIT 2").count() == 2L)
    spark.sql("DROP TABLE IF EXISTS rst_t")
  }

  test("ALTER TABLE ADD COLUMNS widens the manifest AND the catalog together (r14)") {
    val root = freshRoot("addcol")
    spark.sql("DROP TABLE IF EXISTS ac_t")
    M.append(spark, (0 until 8).map(i => (i.toLong, s"p$i")).toDF("id", "payload"), root)
    spark.sql(s"CREATE TABLE ac_t USING `graft-manifest` OPTIONS (path '$root')")
    spark.sql("ALTER TABLE ac_t ADD COLUMNS (score DOUBLE, tag STRING)")
    assert(M.latestSnapshot(spark, root).get.op == "add-columns")
    // old rows null-fill; catalog and manifest agree so reads keep working
    assert(spark.table("ac_t").columns.toSeq == Seq("id", "payload", "score", "tag"))
    assert(spark.sql("SELECT count(*) FROM ac_t WHERE score IS NULL")
      .as[Long].head() == 8L)
    spark.sql("INSERT INTO ac_t VALUES (8, 'x', 0.5, 't')")
    assert(spark.sql("SELECT count(*) FROM ac_t WHERE score IS NOT NULL")
      .as[Long].head() == 1L)
    // a dropped column's PHYSICAL name cannot be re-added (column mapping)
    spark.sql("ALTER TABLE ac_t DROP COLUMN tag")
    val e = intercept[Exception] {
      spark.sql("ALTER TABLE ac_t ADD COLUMNS (tag STRING)")
    }
    assert(e.getMessage.contains("PHYSICAL"), e.getMessage)
    // a parquet table keeps Spark's own ALTER behavior (rule must not touch it)
    val pdir = java.nio.file.Files.createTempDirectory("graft-ac-parq").toString
    Seq((1L, "a")).toDF("id", "v").write.mode("overwrite").parquet(pdir)
    spark.sql("DROP TABLE IF EXISTS ac_parq")
    spark.sql(s"CREATE TABLE ac_parq USING parquet OPTIONS (path '$pdir')")
    spark.sql("ALTER TABLE ac_parq ADD COLUMNS (w INT)")
    assert(spark.table("ac_parq").columns.contains("w"))
    spark.sql("DROP TABLE IF EXISTS ac_t")
    spark.sql("DROP TABLE IF EXISTS ac_parq")
  }

  test("graft_table_changes TVF reads the attributed change feed in SQL (r14)") {
    val root = freshRoot("tvf")
    spark.sql("DROP TABLE IF EXISTS tvf_t")
    M.append(spark, (0 until 10).map(i => (i.toLong, s"p$i")).toDF("id", "payload"), root) // v1
    M.append(spark, (10 until 16).map(i => (i.toLong, s"p$i")).toDF("id", "payload"), root) // v2
    spark.sql(s"CREATE TABLE tvf_t USING `graft-manifest` OPTIONS (path '$root')")
    assert(spark.sql("DELETE FROM tvf_t WHERE id < 3").as[Long].head() == 3L)  // v3
    // by PATH, full window from version 1
    val byPath = spark.sql(
      s"SELECT _change_type AS t, _commit_version AS v, count(*) AS n " +
        s"FROM graft_table_changes('$root', 1) GROUP BY 1, 2 ORDER BY 1, 2")
      .as[(String, Long, Long)].collect().toSeq
    assert(byPath == Seq(("delete", 3L, 3L), ("insert", 2L, 6L)))
    // by TABLE NAME, bounded window [from 1 to 2] — the delete is excluded
    val byName = spark.sql(
      "SELECT count(*) FROM graft_table_changes('tvf_t', 1, 2)").as[Long].head()
    assert(byName == 6L)
    // non-literal arguments refuse with the recipe
    val e = intercept[Exception](spark.sql(
      s"SELECT * FROM graft_table_changes('$root', (SELECT 1))").collect())
    assert(e.getMessage.contains("literal"), e.getMessage)
    spark.sql("DROP TABLE IF EXISTS tvf_t")
  }

  test("OPTIMIZE ... WHERE compacts only the matching slice; VACUUM DRY RUN deletes nothing (r14)") {
    val root = freshRoot("optw")
    spark.sql("DROP TABLE IF EXISTS optw_t")
    // range layout → per-file id bounds → WHERE prunes to one slice
    M.append(spark, (0 until 400).map(i => (i.toLong, i % 7)).toDF("id", "g")
      .repartitionByRange(8, org.apache.spark.sql.functions.col("id"))
      .sortWithinPartitions("id"), root)
    M.append(spark, (400 until 800).map(i => (i.toLong, i % 7)).toDF("id", "g")
      .repartitionByRange(8, org.apache.spark.sql.functions.col("id"))
      .sortWithinPartitions("id"), root)
    spark.sql(s"CREATE TABLE optw_t USING `graft-manifest` OPTIONS (path '$root')")
    val total = M.latestSnapshot(spark, root).get.files.size
    // the predicate covers exactly the FIRST batch: its 8 files compact,
    // the second batch's files are stats-pruned out of the rewrite — and
    // the whole superseded batch directory becomes vacuum food
    val r = spark.sql("OPTIMIZE optw_t WHERE id < 400").collect().head
    assert(r.getLong(0) < total,
      s"WHERE must select a strict file subset: ${r.getLong(0)} of $total")
    assert(r.getLong(0) >= 2 && r.getLong(1) < r.getLong(0),
      s"the slice must actually merge: ${r.getLong(0)} -> ${r.getLong(1)}")
    assert(spark.sql("SELECT count(*) FROM optw_t").as[Long].head() == 800L)
    // untranslatable shapes refuse (file selection must never widen silently)
    val e = intercept[Exception](spark.sql("OPTIMIZE optw_t WHERE id + 1 < 100"))
    assert(e.getMessage.contains("bare columns") ||
      e.getMessage.contains("stats-prunable"), e.getMessage)
    // DRY RUN reports without deleting
    val wouldDrop = spark.sql("VACUUM optw_t RETAIN 1 VERSIONS RETAIN 0 HOURS DRY RUN")
      .as[Long].head()
    assert(wouldDrop >= 1L)
    assert(spark.sql("SELECT count(*) FROM optw_t VERSION AS OF 2").as[Long].head() == 800L,
      "dry run must leave every old version readable")
    val dropped = spark.sql("VACUUM optw_t RETAIN 1 VERSIONS RETAIN 0 HOURS")
      .as[Long].head()
    assert(dropped == wouldDrop, s"dry-run count must match the real pass: $wouldDrop vs $dropped")
    assert(spark.sql("SELECT count(*) FROM optw_t").as[Long].head() == 800L)
    spark.sql("DROP TABLE IF EXISTS optw_t")
  }

  test("CTAS with PARTITIONED BY births a partitioned table in one statement") {
    val root = freshRoot("ctasp")
    spark.sql("DROP TABLE IF EXISTS ctasp_t")
    spark.sql(s"CREATE TABLE ctasp_t USING `graft-manifest` " +
      s"PARTITIONED BY (grp) OPTIONS (path '$root') " +
      "AS SELECT id, concat('g', id % 2) AS grp FROM range(10)")
    val snap = M.latestSnapshot(spark, root).get
    assert(snap.partCols == Seq("grp"))
    assert(spark.sql("SELECT count(*) FROM ctasp_t WHERE grp = 'g0'")
      .as[Long].head() == 5L)
    spark.sql("DROP TABLE IF EXISTS ctasp_t")
  }

  test("ADD/DROP CONSTRAINT + SET/DROP NOT NULL enforce on SQL INSERT; violating statement leaves no version (r15)") {
    val root = freshRoot("constraint")
    spark.sql("DROP TABLE IF EXISTS con_t")
    spark.sql(s"CREATE TABLE con_t USING `graft-manifest` OPTIONS (path '$root') " +
      "AS SELECT id, CAST(id % 4 AS INT) AS grp, concat('p', id) AS payload FROM range(10)")
    spark.sql("ALTER TABLE con_t ADD CONSTRAINT grp_domain CHECK (grp BETWEEN 0 AND 3)")
    spark.sql("ALTER TABLE con_t ALTER COLUMN payload SET NOT NULL")
    val vBefore = M.latestSnapshot(spark, root).get.version
    val e1 = intercept[Exception] {
      spark.sql("INSERT INTO con_t VALUES (100, 9, 'x')")
    }
    assert(e1.getMessage.contains("grp_domain"), e1.getMessage)
    val e2 = intercept[Exception] {
      spark.sql("INSERT INTO con_t VALUES (100, 2, NULL)")
    }
    assert(e2.getMessage.contains("NOT NULL payload"), e2.getMessage)
    assert(M.latestSnapshot(spark, root).get.version == vBefore,
      "refused INSERTs must not commit versions")
    assert(spark.sql("SELECT count(*) FROM con_t").as[Long].head() == 10L)
    // adding a constraint EXISTING data violates refuses, naming a row
    val e3 = intercept[Exception] {
      spark.sql("ALTER TABLE con_t ADD CONSTRAINT ids_small CHECK (id < 5)")
    }
    assert(e3.getMessage.contains("existing data violates"), e3.getMessage)
    // drop both; the formerly-violating insert lands
    spark.sql("ALTER TABLE con_t DROP CONSTRAINT grp_domain")
    spark.sql("ALTER TABLE con_t ALTER COLUMN payload DROP NOT NULL")
    spark.sql("INSERT INTO con_t VALUES (100, 9, NULL)")
    assert(spark.sql("SELECT count(*) FROM con_t").as[Long].head() == 11L)
    spark.sql("DROP TABLE IF EXISTS con_t")
  }

  test("SET/UNSET TBLPROPERTIES live in the manifest; DESCRIBE DETAIL is the one-row twin (r15)") {
    val root = freshRoot("detail")
    spark.sql("DROP TABLE IF EXISTS det_t")
    spark.sql(s"CREATE TABLE det_t USING `graft-manifest` OPTIONS (path '$root') " +
      "AS SELECT id, CAST(id % 3 AS INT) AS grp FROM range(30)")
    spark.sql("ALTER TABLE det_t SET TBLPROPERTIES ('owner' = 'team-data', 'tier' = 'gold')")
    spark.sql("ALTER TABLE det_t ADD CONSTRAINT ids_pos CHECK (id >= 0)")
    spark.sql("ALTER TABLE det_t RENAME COLUMN grp TO bucket")
    val d = spark.sql("DESCRIBE DETAIL det_t").collect().head
    assert(d.getAs[String]("format") == "graft-manifest")
    assert(d.getAs[String]("location").endsWith(root),
      s"location should be the table root (URI form allowed): ${d.getAs[String]("location")}")
    assert(d.getAs[Int]("format_version") == 3)
    assert(d.getAs[Long]("num_files") >= 1L)
    assert(d.getAs[Long]("num_rows") == 30L)
    assert(d.getAs[Map[String, String]]("properties") ==
      Map("owner" -> "team-data", "tier" -> "gold"))
    assert(d.getAs[scala.collection.Seq[String]]("constraints").toSeq ==
      Seq("ids_pos: CHECK (id >= 0)"))
    assert(d.getAs[Map[String, String]]("column_mapping") == Map("bucket" -> "grp"))
    assert(d.getAs[java.sql.Timestamp]("last_modified") != null)
    // UNSET removes; absent keys no-op; properties survive restore
    spark.sql("ALTER TABLE det_t UNSET TBLPROPERTIES ('tier', 'absent')")
    val d2 = spark.sql("DESCRIBE DETAIL det_t").collect().head
    assert(d2.getAs[Map[String, String]]("properties") == Map("owner" -> "team-data"))
    // a path-literal target works without a catalog entry
    val d3 = spark.sql(s"DESCRIBE DETAIL '$root'").collect().head
    assert(d3.getAs[Long]("version") == d2.getAs[Long]("version"))
    spark.sql("DROP TABLE IF EXISTS det_t")
  }

  test("SET TBLPROPERTIES on a NON-manifest table flows to Spark untouched (r15 gate)") {
    spark.sql("DROP TABLE IF EXISTS plainprops_t")
    spark.sql("CREATE TABLE plainprops_t (id BIGINT) USING parquet")
    try {
      spark.sql("ALTER TABLE plainprops_t SET TBLPROPERTIES ('k' = 'v')")
      val props = spark.sessionState.catalog
        .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier("plainprops_t"))
        .properties
      assert(props.get("k").contains("v"),
        s"Spark's own SET TBLPROPERTIES must keep working on parquet tables: $props")
    } finally spark.sql("DROP TABLE IF EXISTS plainprops_t")
  }

  test("ADD/DROP BLOOM INDEX in SQL; DESCRIBE DETAIL shows the ref (r15)") {
    val root = freshRoot("bloom")
    spark.sql("DROP TABLE IF EXISTS bloom_t")
    spark.sql(s"CREATE TABLE bloom_t USING `graft-manifest` OPTIONS (path '$root') " +
      "AS SELECT id, CAST(id AS STRING) AS name FROM range(1000)")
    try {
      spark.sql("ALTER TABLE bloom_t ADD BLOOM INDEX ON (id, name) WITH FPP 0.005")
      val snap = graft.sources.ManifestStore.latestSnapshot(spark, root).get
      assert(snap.bloomIdx.exists(ix =>
        ix.columns == Seq("id", "name") && ix.fpp == 0.005), snap.bloomIdx.toString)
      val d = spark.sql("DESCRIBE DETAIL bloom_t").collect().head
      assert(d.getAs[String]("bloom_index") ==
        "columns=id,name fpp=0.005 sidecars=1", d.getAs[String]("bloom_index"))
      // the indexed lookup still answers exactly through SQL
      assert(spark.sql("SELECT name FROM bloom_t WHERE id = 417")
        .collect().map(_.getString(0)).toSeq == Seq("417"))
      spark.sql("ALTER TABLE bloom_t DROP BLOOM INDEX")
      assert(graft.sources.ManifestStore.latestSnapshot(spark, root)
        .get.bloomIdx.isEmpty)
      assert(spark.sql("DESCRIBE DETAIL bloom_t").collect().head
        .getAs[String]("bloom_index") == null)
      // a non-manifest table's ALTER flows to Spark and fails ITS way
      spark.sql("DROP TABLE IF EXISTS plainbloom_t")
      spark.sql("CREATE TABLE plainbloom_t (id BIGINT) USING parquet")
      try intercept[Exception] {
        spark.sql("ALTER TABLE plainbloom_t ADD BLOOM INDEX ON (id)")
      } finally spark.sql("DROP TABLE IF EXISTS plainbloom_t")
    } finally spark.sql("DROP TABLE IF EXISTS bloom_t")
  }
}
