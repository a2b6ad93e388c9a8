package graft

import graft.queries.Catalog

/** t1 smoke: every catalogued operator runs end-to-end on sf0.001 and
  * produces a sane result (schema non-empty, deterministic re-run equality
  * for oracle-checked queries).
  */
class CatalogSpec extends SparkSpec {

  test("catalog has no duplicate names and covers all groups") {
    assert(Catalog.all.size == Catalog.byName.size)
    assert(Catalog.all.size >= 70)
    val names = Catalog.byName.keySet
    for (prefix <- Seq("s", "p", "j", "a", "w", "o", "f", "x", "e", "m"))
      assert(names.exists(_.startsWith(prefix)), s"no queries with prefix $prefix")
  }

  for (q <- Catalog.all) {
    test(s"${q.name} runs and returns rows") {
      val df = q.run(spark, sfDir)
      assert(df.columns.nonEmpty, "empty schema")
      val n = df.count()
      assert(n > 0, s"${q.name} returned 0 rows")
    }
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracle-checked queries are deterministic across re-runs") {
    // m5_word2vec_table: previously the lone partition-variant entry
    // (hogwild fit); pinned here since the single-partition-fit fix
    for (name <- Seq("w1_top_bottom_per_group", "j6_multiway_join", "e2_minhash_lsh",
                     "m5_word2vec_table")) {
      val q = Catalog.byName(name)
      val a = q.run(spark, sfDir).collect().map(_.toString).sorted
      val b = q.run(spark, sfDir).collect().map(_.toString).sorted
      assert(a.sameElements(b), s"$name not deterministic")
    }
  }
}
