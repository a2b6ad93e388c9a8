package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import scala.collection.mutable

/** Round-7 skew rehearsal (VERDICT r6 #4): run the skew-sensitive shapes
  * against the planted hot keys of `fixtures/skew0.1` (see [[SkewGen]])
  * and MEASURE the per-stage task-time distribution — max task vs median
  * task of each scenario's heaviest stages — with and without the
  * mitigation, so SCALE.md's skew-safety claims carry numbers instead of
  * argument. `Test/runMain graft.SkewRehearsal [skewDir]`.
  */
object SkewRehearsal {

  private class TaskClock extends SparkListener {
    val byStage: mutable.Map[Int, mutable.ArrayBuffer[Long]] = mutable.Map.empty
    override def onTaskEnd(te: SparkListenerTaskEnd): Unit = synchronized {
      if (te.taskInfo != null && te.taskInfo.successful)
        byStage.getOrElseUpdate(te.stageId, mutable.ArrayBuffer.empty) +=
          te.taskInfo.duration
    }
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/fixtures/skew0.1")
    val spark = GraftSession.getOrCreate(32)
    import spark.implicits._
    // AQE's partition coalescing folds this fixture's whole reduce side
    // into ONE task (totals are far under the 64MB advisory size), which
    // hides per-reducer skew entirely. Production-scale reducers are many
    // per stage by definition, so the rehearsal pins the uncoalesced
    // distribution; AQE's skew-join splitting stays ON (it is one of the
    // mitigations under test).
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")

    val orders = spark.read.parquet(s"$dir/orders.parquet")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))

    def med(xs: Seq[Long]): Long = {
      val v = xs.sorted
      if (v.isEmpty) 0L else v(v.size / 2)
    }

    def run(name: String)(body: => Long): Unit = {
      val clock = new TaskClock
      spark.sparkContext.addSparkListener(clock)
      val t0 = System.nanoTime()
      val rows = body
      val wall = (System.nanoTime() - t0) / 1e9
      // listener events are posted asynchronously; give the bus a moment
      // to drain before reading (listenerBus.waitUntilEmpty is private)
      Thread.sleep(300)
      spark.sparkContext.removeSparkListener(clock)
      graft.operators.Pinned.release()
      spark.catalog.clearCache()
      val top = clock.byStage.toSeq.map { case (sid, ds) =>
        (sid, ds.size, ds.max, med(ds.toSeq), ds.sum)
      }.sortBy(-_._5).take(3)
      val stages = top.map { case (sid, n, mx, md, _) =>
        val ratio = if (md > 0) mx.toDouble / md else mx.toDouble
        f"stage$sid[tasks=$n max=${mx}ms med=${md}ms ratio=$ratio%.1f]"
      }.mkString(" ")
      println(f"SKEW $name%-22s wall=$wall%6.2fs rows=$rows%9d $stages")
    }

    // warm the machinery so scenario 1 isn't billed JVM init
    orders.groupBy("o_orderstatus").count().collect()

    // A. grouped aggregate on the hot key — partial aggregation is the
    // built-in mitigation (map-side combine collapses the hot key per
    // task BEFORE the exchange); saltedSum is the explicit alternative
    run("agg_plain") {
      orders.groupBy("o_custkey").agg(sum("o_totalprice")).count()
    }
    run("agg_salted") {
      graft.operators.Skew.saltedSum(orders, Seq("o_custkey"),
        col("o_totalprice"), salts = 32).count()
    }
    // collect_list has NO partial collapse — the hot key's rows all meet
    // in one reducer; this is the shape that NEEDS salting or capping
    run("agg_holistic_plain") {
      orders.groupBy("o_custkey").agg(collect_list("o_orderkey")).count()
    }

    // B. the q13 outer-join shape against the hot customer, straight from
    // the catalog (AQE on — its skew-join splitting is the mitigation at
    // real scale; fixture partitions are below its 256MB trigger, so this
    // measures the ratio AQE would be asked to fix)
    run("q13_hot_customer") {
      SparkEntry.queries("q13_cust_order_counts")(spark, dir).count()
    }

    // C. LSH near-dup detection over the 1001-member planted cluster —
    // uncapped, the cluster's band bucket emits ~m^2/2 candidate pairs
    // from one task; hubCap bounds it to m
    run("lsh_uncapped") {
      graft.operators.Dedup.nearDupPairs(docs, "doc_id", "text",
        threshold = 0.5).count()
    }
    run("lsh_hubcap64") {
      graft.operators.Dedup.nearDupPairs(docs, "doc_id", "text",
        threshold = 0.5, hubCap = Some(64)).count()
    }

    // D. connected components over a hot hub: a 1000-member star + a
    // 200-node chain (worst diameter); min-label + path-halving must not
    // degrade on the hub
    run("components_hub") {
      val star = spark.range(1, 1000)
        .select(lit(0L).as("a_id"), col("id").as("b_id"))
      val chain = spark.range(10000, 10200)
        .select(col("id").as("a_id"), (col("id") + 1).as("b_id"))
      graft.operators.Dedup.connectedComponents(star.union(chain)).count()
    }

    spark.stop()
  }
}
