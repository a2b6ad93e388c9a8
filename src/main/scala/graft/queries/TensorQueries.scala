package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._
import graft.sources.Tables

/** Tensor-column kit (SURVEY §2.7 F2-F10, A3/A8/A9, W1/W4, E3) over the
  * `embeddings` fixture (ArrayType(FloatType) of dim 64 — stands in for ND4J
  * tensors / MNIST pixel vectors).
  *
  * All arithmetic is double-promoted left-fold (see VectorFunctions) so the
  * DuckDB oracle (list_transform/list_aggregate with CAST(x AS DOUBLE))
  * reproduces the exact same floating-point result; outputs are rounded to
  * 6 dp per FIXTURES.md determinism rules.
  *
  * Scale: every query here is a single scan + narrow per-row expressions
  * (no shuffle except the grouped ones); W1 shuffles once on `label`;
  * E3 broadcasts the (tiny) query side so the corpus side never shuffles.
  */
object TensorQueries {

  /** DuckDB-side mean-square score, kept in lockstep with VectorFunctions.meanSquare. */
  private val duckScore =
    "list_aggregate(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum') / len(embedding)"

  val defs: Seq[QueryDef] = Seq(

    // W1 FLAGSHIP: per-group top-5/bottom-5 by anomaly score —
    // chapter3/MNISTAnomalyDetector.java:184-217 (best/worst digits).
    QueryDef.sql(
      "w1_top_bottom_per_group",
      s"""WITH scored AS (
         |  SELECT label, vec_id, round($duckScore, 6) AS score FROM embeddings
         |), ranked AS (
         |  SELECT label, vec_id, score,
         |         row_number() OVER (PARTITION BY label ORDER BY score, vec_id) AS rn_best,
         |         row_number() OVER (PARTITION BY label ORDER BY score DESC, vec_id DESC) AS rn_worst
         |  FROM scored
         |)
         |SELECT label, vec_id, score,
         |       CASE WHEN rn_best <= 5 THEN 'best' ELSE 'worst' END AS side,
         |       CASE WHEN rn_best <= 5 THEN rn_best ELSE rn_worst END AS rnk
         |FROM ranked WHERE rn_best <= 5 OR rn_worst <= 5
         |ORDER BY label, side, rnk""".stripMargin) { (s, d) =>
      val scored = Tables.embeddings(s, d)
        .select(col("label"), col("vec_id"),
          round(meanSquare(col("embedding")), 6).as("score"))
      val wBest = Window.partitionBy("label").orderBy(col("score"), col("vec_id"))
      val wWorst = Window.partitionBy("label").orderBy(col("score").desc, col("vec_id").desc)
      scored
        .withColumn("rn_best", row_number().over(wBest))
        .withColumn("rn_worst", row_number().over(wWorst))
        .where(col("rn_best") <= 5 || col("rn_worst") <= 5)
        .select(col("label"), col("vec_id"), col("score"),
          when(col("rn_best") <= 5, "best").otherwise("worst").as("side"),
          when(col("rn_best") <= 5, col("rn_best")).otherwise(col("rn_worst"))
            .cast("long").as("rnk"))
        .orderBy("label", "side", "rnk")
    },

    // A3: column mean along axis 0 (Nd4j.mean(arr,0) — ND4JTest.java:46).
    QueryDef.sql(
      "a3_mean_axis0",
      """SELECT pos, round(avg(CAST(v AS DOUBLE)), 6) AS mean_v, count(*) AS n
        |FROM (SELECT generate_subscripts(embedding, 1) AS pos, unnest(embedding) AS v FROM embeddings)
        |GROUP BY pos ORDER BY pos""".stripMargin) { (s, d) =>
      Tables.embeddings(s, d)
        .select(posexplode(col("embedding")).as(Seq("pos0", "v")))
        .select((col("pos0") + 1).cast("long").as("pos"), col("v"))
        .groupBy("pos")
        .agg(round(avg(col("v").cast("double")), 6).as("mean_v"), count(lit(1)).as("n"))
        .orderBy("pos")
    },

    // A8: per-example reconstruction score (MSE vs zero reconstruction) —
    // chapter3/MNISTAnomalyDetector.java:194.
    QueryDef.sql(
      "a8_mse_score",
      s"SELECT vec_id, round($duckScore, 6) AS mse FROM embeddings ORDER BY vec_id") { (s, d) =>
      Tables.embeddings(s, d)
        .select(col("vec_id"), round(meanSquare(col("embedding")), 6).as("mse"))
        .orderBy("vec_id")
    },

    // A9: argmax along axis 1, first-occurrence ties (Nd4j.argMax —
    // chapter3/MNISTAnomalyDetector.java:75). 1-based on both sides.
    QueryDef.sql(
      "a9_argmax",
      """SELECT vec_id, CAST(list_position(embedding, list_max(embedding)) AS BIGINT) AS argmax_pos,
        |       CAST(list_max(embedding) AS DOUBLE) AS max_val
        |FROM embeddings ORDER BY vec_id""".stripMargin) { (s, d) =>
      Tables.embeddings(s, d)
        .select(col("vec_id"), argmax1(col("embedding")).as("argmax_pos"),
          array_max(col("embedding")).cast("double").as("max_val"))
        .orderBy("vec_id")
    },

    // F2: element-wise add scalar (myArray.add(1.0) — ND4JTest.java:20).
    QueryDef.sql(
      "f2_add_scalar",
      """SELECT vec_id, round(CAST(embedding[1] AS DOUBLE) + 1.0, 6) AS first_plus1,
        |       round(list_aggregate(list_transform(embedding, x -> CAST(x AS DOUBLE) + 1.0), 'sum'), 6) AS total
        |FROM embeddings ORDER BY vec_id""".stripMargin) { (s, d) =>
      Tables.embeddings(s, d).select(col("vec_id"),
        round(element_at(col("embedding"), 1).cast("double") + 1.0, 6).as("first_plus1"),
        round(arraySum(addScalar(col("embedding"), 1.0)), 6).as("total"))
        .orderBy("vec_id")
    },

    // F3: element-wise multiply scalar (myArray2.mul(2.0) — ND4JTest.java:24).
    QueryDef.sql(
      "f3_mul_scalar",
      """SELECT vec_id, round(CAST(embedding[-1] AS DOUBLE) * 2.0, 6) AS last_x2,
        |       round(list_aggregate(list_transform(embedding, x -> CAST(x AS DOUBLE) * 2.0), 'sum'), 6) AS total
        |FROM embeddings ORDER BY vec_id""".stripMargin) { (s, d) =>
      Tables.embeddings(s, d).select(col("vec_id"),
        round(element_at(col("embedding"), -1).cast("double") * 2.0, 6).as("last_x2"),
        round(arraySum(mulScalar(col("embedding"), 2.0)), 6).as("total"))
        .orderBy("vec_id")
    },

    // F4: zeros/constant fill (Nd4j.zeros — ND4JTest.java:16).
    QueryDef.sql(
      "f4_fill",
      """SELECT l_orderkey, l_linenumber, l_linenumber AS n_zeros, CAST(0.0 AS DOUBLE) AS zsum
        |FROM lineitem WHERE l_orderkey < 100 ORDER BY l_orderkey, l_linenumber""".stripMargin) {
      (s, d) =>
        Tables.lineitem(s, d).where(col("l_orderkey") < 100)
          .select(col("l_orderkey"), col("l_linenumber"),
            size(fill(0.0, col("l_linenumber"))).as("n_zeros"),
            arraySum(fill(0.0, col("l_linenumber"))).as("zsum"))
          .orderBy("l_orderkey", "l_linenumber")
    },

    // F6: hstack / array concat (Nd4j.hstack — ND4JTest.java:57).
    QueryDef.sql(
      "f6_hstack",
      """SELECT vec_id, len(list_concat(embedding, embedding)) AS n,
        |       round(list_aggregate(list_transform(list_concat(embedding, embedding), x -> CAST(x AS DOUBLE)), 'sum'), 6) AS total
        |FROM embeddings ORDER BY vec_id""".stripMargin) { (s, d) =>
      val cc = concat(col("embedding"), col("embedding"))
      Tables.embeddings(s, d).select(col("vec_id"),
        size(cc).cast("long").as("n"), round(arraySum(cc), 6).as("total"))
        .orderBy("vec_id")
    },

    // F7: vstack / union of rows (Nd4j.vstack — ND4JTest.java:56).
    QueryDef.sql(
      "f7_vstack",
      """SELECT name FROM (
        |  SELECT c_name AS name FROM customer UNION ALL SELECT s_name FROM supplier
        |) ORDER BY name""".stripMargin) { (s, d) =>
      Tables.customer(s, d).select(col("c_name").as("name"))
        .union(Tables.supplier(s, d).select(col("s_name").as("name")))
        .orderBy("name")
    },

    // F8: transpose via long-format pivot
    // (.transpose() — Word2VecTransformingIterator.java:123).
    QueryDef.sql(
      "f8_transpose",
      """SELECT pos,
        |       CAST(max(CASE WHEN vec_id = 0 THEN v END) AS DOUBLE) AS "0",
        |       CAST(max(CASE WHEN vec_id = 1 THEN v END) AS DOUBLE) AS "1",
        |       CAST(max(CASE WHEN vec_id = 2 THEN v END) AS DOUBLE) AS "2",
        |       CAST(max(CASE WHEN vec_id = 3 THEN v END) AS DOUBLE) AS "3"
        |FROM (SELECT vec_id, generate_subscripts(embedding, 1) AS pos, unnest(embedding) AS v
        |      FROM embeddings WHERE vec_id IN (0, 1, 2, 3))
        |GROUP BY pos ORDER BY pos""".stripMargin) { (s, d) =>
      Tables.embeddings(s, d).where(col("vec_id").isin(0, 1, 2, 3))
        .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos0", "v")))
        .select(col("vec_id"), (col("pos0") + 1).cast("long").as("pos"),
          col("v").cast("double").as("v"))
        .groupBy("pos").pivot("vec_id", Seq(0, 1, 2, 3)).max("v")
        .orderBy("pos")
    },

    // F9: indexed read + slicing (getDouble/put/NDArrayIndex —
    // ND4JTest.java:17, Word2VecTransformingIterator.java:129-141).
    QueryDef.sql(
      "f9_index_slice",
      """SELECT vec_id,
        |       CAST(embedding[1] AS DOUBLE) AS first_v,
        |       CAST(embedding[-1] AS DOUBLE) AS last_v,
        |       round(list_aggregate(list_transform(embedding[9:16], x -> CAST(x AS DOUBLE)), 'sum'), 6) AS mid_sum
        |FROM embeddings ORDER BY vec_id""".stripMargin) { (s, d) =>
      Tables.embeddings(s, d).select(col("vec_id"),
        element_at(col("embedding"), 1).cast("double").as("first_v"),
        element_at(col("embedding"), -1).cast("double").as("last_v"),
        round(arraySum(slice(col("embedding"), 9, 8)), 6).as("mid_sum"))
        .orderBy("vec_id")
    },

    // F10: two-phase min-max normalization (ImagePreProcessingScaler —
    // chapter_4/MnistClassification.java:151-156): stats pass is a window
    // aggregate, apply pass is a projection — no driver collect.
    QueryDef.sql(
      "f10_minmax_norm",
      """SELECT vec_id, label,
        |       CASE WHEN mx > mn
        |            THEN round((CAST(embedding[1] AS DOUBLE) - mn) / (mx - mn), 6)
        |            ELSE CAST(0.0 AS DOUBLE) END AS scaled
        |FROM (
        |  SELECT vec_id, label, embedding,
        |         min(CAST(embedding[1] AS DOUBLE)) OVER (PARTITION BY label) AS mn,
        |         max(CAST(embedding[1] AS DOUBLE)) OVER (PARTITION BY label) AS mx
        |  FROM embeddings
        |) ORDER BY vec_id""".stripMargin) { (s, d) =>
      val e1 = element_at(col("embedding"), 1).cast("double")
      val w = Window.partitionBy("label")
      Tables.embeddings(s, d)
        .withColumn("mn", min(e1).over(w))
        .withColumn("mx", max(e1).over(w))
        .select(col("vec_id"), col("label"),
          round(minMaxScale(e1, col("mn"), col("mx")), 6).as("scaled"))
        .orderBy("vec_id")
    },

    // E3: exact top-k cosine similarity search — query side (10 vectors) is
    // broadcast against the corpus (brute-force baseline; the LSH scale path
    // is e3_ann_lsh in DedupQueries + operators.Similarity).
    QueryDef.sql(
      "e3_cosine_topk",
      // the oracle mirrors graft_cosine's EXACT formula and null posture
      // (review r9): dot / (sqrt(na) * sqrt(nb)) — same association as the
      // native loop — with zero-norm AND NaN results reading NULL (DuckDB
      // compares NaN greater than everything, so an unguarded NaN would
      // rank first while Spark's null sorts last; NULLS LAST spelled out)
      """WITH q AS (SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings WHERE vec_id < 10),
        |  pairs AS (
        |  SELECT q_id, e.vec_id AS n_id,
        |         CAST(q_emb AS DOUBLE[]) AS qa, CAST(e.embedding AS DOUBLE[]) AS ea
        |  FROM q, embeddings e WHERE e.vec_id <> q_id
        |), sims AS (
        |  SELECT q_id, n_id,
        |         list_dot_product(qa, qa) AS na, list_dot_product(ea, ea) AS nb,
        |         list_dot_product(qa, ea) AS dot
        |  FROM pairs
        |), scored AS (
        |  SELECT q_id, n_id,
        |         CASE WHEN na > 0 AND nb > 0 AND NOT isnan(dot / (sqrt(na) * sqrt(nb)))
        |              THEN round(dot / (sqrt(na) * sqrt(nb)), 6) END AS cos_sim
        |  FROM sims
        |), ranked AS (
        |  SELECT q_id, n_id, cos_sim,
        |         row_number() OVER (PARTITION BY q_id ORDER BY cos_sim DESC NULLS LAST, n_id) AS rnk
        |  FROM scored
        |)
        |SELECT q_id, n_id, cos_sim, rnk FROM ranked WHERE rnk <= 5 ORDER BY q_id, rnk""".stripMargin) {
      (s, d) =>
        val emb = Tables.embeddings(s, d)
        val q = emb.where(col("vec_id") < 10)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
        val scored = emb.join(broadcast(q), col("vec_id") =!= col("q_id"))
          .select(col("q_id"), col("vec_id").as("n_id"),
            round(cosine(col("q_emb"), col("embedding")), 6).as("cos_sim"))
        val w = Window.partitionBy("q_id").orderBy(col("cos_sim").desc, col("n_id"))
        scored.withColumn("rnk", row_number().over(w).cast("long")).where(col("rnk") <= 5)
          .select("q_id", "n_id", "cos_sim", "rnk").orderBy("q_id", "rnk")
    }
  )
}
