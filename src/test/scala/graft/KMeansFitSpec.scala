package graft

import graft.operators.KMeansFit
import graft.sources.Tables
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.functions._

/** The load-bearing pin behind the r15 KMeansFit swap: the low-level
  * mllib path must produce BIT-IDENTICAL centers to the ml.KMeans wrapper
  * it replaced (same seed, init mode, iteration cap) — the ANN recall
  * gates sit close enough to their floors that any center drift is a
  * luck-dependent gate flip, so byte equality, not quality equivalence,
  * is the contract.
  */
class KMeansFitSpec extends SparkSpec {

  test("KMeansFit.centers == ml.KMeans.fit centers (several k and seeds)") {
    val feat = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), array_to_vector(col("embedding")).as("features"))
    for (k <- Seq(4, 16); seed <- Seq(42L, 45L)) {
      val viaMl = new org.apache.spark.ml.clustering.KMeans()
        .setK(k).setSeed(seed).setMaxIter(4).setInitMode("random")
        .fit(feat).clusterCenters.map(_.toArray.map(_.toFloat).toSeq).toSeq
      val direct = KMeansFit.centers(feat, "features", k, seed)
        .map(_.toSeq).toSeq
      assert(direct == viaMl, s"centers diverged at k=$k seed=$seed")
    }
  }

  test("predict matches ml transform's assignment") {
    val feat = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), array_to_vector(col("embedding")).as("features"))
    val mlModel = new org.apache.spark.ml.clustering.KMeans()
      .setK(8).setSeed(42).setMaxIter(4).setInitMode("random").fit(feat)
    val viaMl = mlModel.transform(feat).select("vec_id", "prediction")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val model = KMeansFit.model(feat, "features", 8, 42)
    val bc = spark.sparkContext.broadcast(model)
    val assign = udf((v: org.apache.spark.ml.linalg.Vector) =>
      bc.value.predict(org.apache.spark.mllib.linalg.Vectors.fromML(v)))
    val direct = feat.select(col("vec_id"), assign(col("features")).as("cell"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(direct == viaMl)
  }
}
