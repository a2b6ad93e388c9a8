package graft

import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Structural assertions for the seeded operators (FIXTURES.md: excluded
  * from hash-matching; sizes, multiset equality and value bounds instead).
  */
class SeededOpsSpec extends SparkSpec {

  import SharedSpark.spark.implicits._

  test("O2: seeded sample is reproducible and close to the target fraction") {
    val c = Tables.customer(spark, sfDir)
    val n = c.count()
    val s1 = c.sample(false, 0.2, 42).select("c_custkey").as[Long].collect().sorted.toSeq
    val s2 = c.sample(false, 0.2, 42).select("c_custkey").as[Long].collect().sorted.toSeq
    assert(s1 == s2, "same seed must give the same sample")
    assert(s1.size > n * 0.05 && s1.size < n * 0.5, s"sample size ${s1.size} of $n")
    assert(s1.distinct.size == s1.size, "without replacement => no duplicates")
  }

  test("O3: seeded shuffle is a permutation (same multiset, same seed same order)") {
    val c = Tables.customer(spark, sfDir).select("c_custkey")
    val base = c.as[Long].collect().sorted.toSeq
    val sh1 = c.orderBy(rand(1244)).as[Long].collect().toSeq
    val sh2 = c.orderBy(rand(1244)).as[Long].collect().toSeq
    assert(sh1.sorted == base, "shuffle must preserve the multiset")
    assert(sh1 == sh2, "same seed must give the same order")
  }

  test("O4: randomSplit partitions the dataset disjointly near 80/20") {
    val e = Tables.embeddings(spark, sfDir)
    val n = e.count()
    val Array(train, test) = e.randomSplit(Array(0.8, 0.2), seed = 42)
    val tr = train.select("vec_id").as[Long].collect().toSet
    val te = test.select("vec_id").as[Long].collect().toSet
    assert(tr.size + te.size == n, "split must cover every row exactly once")
    assert((tr & te).isEmpty, "splits must be disjoint")
    assert(tr.size > n * 0.6 && tr.size < n * 0.95, s"train fraction ${tr.size.toDouble / n}")
  }

  test("O2b: stratified sample respects per-stratum fractions and drops unlisted strata") {
    val c = Tables.customer(spark, sfDir)
    val fractions = Map("BUILDING" -> 0.5, "MACHINERY" -> 0.2)
    val sampled = c.stat.sampleBy("c_mktsegment", fractions, seed = 42L)
    val bySeg = sampled.groupBy("c_mktsegment").count().as[(String, Long)].collect().toMap
    assert(bySeg.keySet.subsetOf(fractions.keySet), s"unlisted strata leaked: $bySeg")
    val totals = c.groupBy("c_mktsegment").count().as[(String, Long)].collect().toMap
    for ((seg, frac) <- fractions; n <- bySeg.get(seg)) {
      val expected = totals(seg) * frac
      assert(n > expected * 0.3 && n < expected * 2.0,
        s"$seg: sampled $n of ${totals(seg)} (target frac $frac)")
    }
    // reproducible under the same seed
    val again = c.stat.sampleBy("c_mktsegment", fractions, seed = 42L)
      .select("c_custkey").as[Long].collect().sorted.toSeq
    assert(again == sampled.select("c_custkey").as[Long].collect().sorted.toSeq)
  }

  test("F5: rand in [0,1), scaled rand in [0,3), randn roughly centered") {
    val df = Tables.embeddings(spark, sfDir)
      .select((rand(42) * 3.0).as("u"), randn(42).as("g"))
    val rows = df.as[(Double, Double)].collect()
    assert(rows.forall { case (u, _) => u >= 0.0 && u < 3.0 })
    val gMean = rows.map(_._2).sum / rows.length
    assert(math.abs(gMean) < 0.2, s"randn mean $gMean")
  }
}
