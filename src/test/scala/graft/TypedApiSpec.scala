package graft

import org.apache.spark.sql.functions._

case class UserTransaction(userId: String, amount: Int)

/** The reference's RDD demo (chapter1/SparkRDDAPITest.scala:10-84) replayed
  * through the typed Dataset API with real assertions: same 5-row dataset,
  * same transformation chain (filter -> keyBy -> map), same action set —
  * but Catalyst-planned and actually checked (the reference only printlns).
  */
class TypedApiSpec extends SparkSpec {

  import SharedSpark.spark.implicits._

  private def data = spark.createDataset(Seq(
    UserTransaction("A", 1001), UserTransaction("B", 1002),
    UserTransaction("A", 1003), UserTransaction("C", 1004),
    UserTransaction("D", 1005)))

  test("typed chain: filter -> keyBy -> map matches the reference semantics") {
    val filtered = data.filter(_.userId.contains("A"))
    val keyed = filtered.map(t => (t.userId, t))             // keyBy
    val amounts = keyed.map(_._2.amount)                     // projection

    assert(amounts.count() == 2)                             // count
    assert(amounts.collect().sorted.toSeq == Seq(1001, 1003)) // collect
    assert(amounts.orderBy("value").limit(1).head() == 1001) // first (deterministic)
    assert(amounts.reduce(_ max _) == 1003)                  // max
    assert(amounts.reduce(_ min _) == 1001)                  // min
    assert(amounts.orderBy(col("value").desc).limit(1).head() == 1003) // takeOrdered
    val sampled = amounts.sample(withReplacement = false, 0.99, seed = 1).collect()
    assert(sampled.forall(Seq(1001, 1003).contains))         // takeSample
    var seen = 0
    amounts.foreachPartition((it: Iterator[Int]) => { var n = 0; it.foreach(_ => n += 1) })
    amounts.collect().foreach(_ => seen += 1)                // foreach
    assert(seen == 2)
  }

  test("typed chain: cache parity across the action set") {
    val ds = data.filter(_.amount > 1001)
    val uncached = (ds.count(), ds.collect().map(_.amount).sorted.toSeq)
    val cached = ds.cache()
    cached.count()
    assert((cached.count(), cached.collect().map(_.amount).sorted.toSeq) == uncached)
    cached.unpersist()
  }

  test("E2 end-to-end: removeNearDups keeps originals, drops planted variants") {
    val docs = (0L until 40L).map { i =>
      val words = (0 until 40).map(j => s"w${(i * 17 + j * 5) % 101}t$j").mkString(" ")
      (i, words)
    }
    // one appended word => shingle-Jaccard ~0.93, solidly above the 4x4
    // banding's detection knee (deterministic: md5-based MinHash)
    val variants = docs.take(5).map { case (i, text) => (i + 1000, text + " extra") }
    val corpus = (docs ++ variants).toDF("doc_id", "text")
    val cleaned = graft.operators.Dedup.removeNearDups(corpus, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert((0L until 40L).forall(cleaned.contains), "an original was dropped")
    assert(variants.map(_._1).forall(v => !cleaned.contains(v)),
      s"variant survived: ${cleaned.filter(_ >= 1000)}")
  }

  test("fluent verbs delegate: compressionScored / boilerplateRemoved / sourceOverlapKmv / semDeduped") {
    import graft.api._
    val docs = graft.sources.Tables.documents(spark, sfDir).limit(40)
    val scored = docs.compressionScored()
    assert(scored.columns.contains("compression_ratio") &&
      scored.where(col("compression_ratio").isNull).count() == 0)
    val withFooter = docs.select(col("doc_id"),
      concat(col("text"), lit("\nshared footer line")).as("text"))
    val bp = withFooter.boilerplateRemoved("doc_id", minDocs = 2)
    assert(bp.where(col("n_lines_dropped") =!= 1L).count() == 0,
      "every doc drops exactly the planted footer")
    val overlap = docs.select(col("source"), col("text"))
      .sourceOverlapKmv("source", k = 16)
    assert(overlap.columns.toSeq ==
      Seq("source_a", "source_b", "shared", "denom", "est_jaccard"))
    graft.operators.Pinned.release()
    val emb = graft.sources.Tables.embeddings(spark, sfDir).limit(50)
      .select(col("vec_id"), col("embedding"))
    val sd = emb.semDeduped(threshold = 0.999, nCells = 2)
    assert(sd.count() == 50 && sd.where(col("kept")).count() > 0)
    graft.operators.Pinned.release()
  }

  test("fluent verbs delegate: topKPq / topKIvfPq / recallAgainst") {
    import graft.api._
    val emb = graft.sources.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"))
    val q = emb.where(col("vec_id") < 3)
    val exact = emb.topKExact(q, k = 3)
    // wide rerank at tiny corpus should recover the exact set comfortably
    val pq = emb.topKPq(q, k = 3, rerank = 32)
    assert(pq.columns.contains("cos_sim") && pq.count() == exact.count())
    val pqOk = pq.recallAgainst(exact, 0.5).as[(Long, Boolean)].head()
    assert(pqOk._1 == 3L && pqOk._2, s"pq recall below 0.5: $pqOk")
    val ivfpq = emb.topKIvfPq(q, k = 3, nProbe = 8, rerank = 32)
    val ivfOk = ivfpq.recallAgainst(exact, 0.5).as[(Long, Boolean)].head()
    assert(ivfOk._1 == 3L && ivfOk._2, s"ivfpq recall below 0.5: $ivfOk")
    graft.operators.Pinned.release() // topKIvfPq pins its cell assignment
  }
}
