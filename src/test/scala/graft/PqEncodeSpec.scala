package graft

import graft.operators.ProductQuantization
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Parity pins for the r15 native PQ encoder (plans.PqEncode) against the
  * pre-r15 composed form (slice + per-centroid aggregate(zip_with) +
  * array_min/array_position) — the same native-vs-composed policy as
  * graft_cosine / graft_adc_distance in PlansSpec. The composed form is
  * reconstructed here verbatim as the oracle.
  */
class PqEncodeSpec extends SparkSpec {

  import SharedSpark.spark.implicits._

  /** The pre-r15 composed encode, kept as the semantics oracle. */
  private def composedEncode(emb: Column,
                             codebooks: Array[Array[Array[Float]]]): Column = {
    def sqDist(sub: Column, centroid: Array[Float]): Column =
      aggregate(
        zip_with(sub, array(centroid.map(c => lit(c.toDouble)): _*),
          (x, c) => { val diff = x.cast("double") - c; diff * diff }),
        lit(0.0), (acc, v) => acc + v)
    val d = codebooks(0)(0).length
    val codes = codebooks.zipWithIndex.map { case (book, s) =>
      val sub = slice(emb, s * d + 1, d)
      val dists = array(book.map(c => sqDist(sub, c)): _*)
      (array_position(dists, array_min(dists)) - 1).cast("int")
    }
    array(codes: _*)
  }

  private val books: Array[Array[Array[Float]]] =
    Array.tabulate(2, 4, 3)((s, j, i) => (s * 17 + j * 5 + i * 2 - 10).toFloat / 3f)

  private def parity(rows: Seq[Seq[java.lang.Float]], clue: String): Unit = {
    val df = rows.zipWithIndex
      .map { case (r, i) => (i.toLong, if (r == null) null else r.map(x => x: java.lang.Float)) }
      .toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
    val got = df.select(col("vec_id"),
      ProductQuantization.encode(col("embedding"), books).as("c"))
      .as[(Long, Seq[Option[Int]])].collect().toMap
    val want = df.select(col("vec_id"),
      composedEncode(col("embedding"), books).as("c"))
      .as[(Long, Seq[Option[Int]])].collect().toMap
    assert(got == want, s"$clue: native=$got composed=$want")
  }

  test("parity on clean vectors (the index-path input)") {
    parity((0 until 50).map(i => Seq.tabulate(6)(d => java.lang.Float.valueOf(((i * 11 + d * 7) % 19 - 9).toFloat / 2f))), "clean")
  }

  test("parity on exact-centroid vectors (tie territory)") {
    // vectors equal to a centroid concatenation: distance 0 in each
    // subspace, and equidistant duplicates exercise the first-min tie rule
    val dupBooks = books.map(b => b ++ b.take(1)) // centroid 0 duplicated at index 4
    val rows = (0 until 4).map(j => (books(0)(j) ++ books(1)(j)).map(java.lang.Float.valueOf).toSeq)
    val df = rows.zipWithIndex.map { case (r, i) => (i.toLong, r.map(x => x: java.lang.Float)) }
      .toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
    val got = df.select(col("vec_id"),
      ProductQuantization.encode(col("embedding"), dupBooks).as("c"))
      .as[(Long, Seq[Option[Int]])].collect().toMap
    val want = df.select(col("vec_id"),
      composedEncode(col("embedding"), dupBooks).as("c"))
      .as[(Long, Seq[Option[Int]])].collect().toMap
    assert(got == want, s"ties: native=$got composed=$want")
    // and the duplicated centroid never wins over its lower-index twin
    assert(got.values.forall(_.forall(c => !c.contains(4))))
  }

  test("parity on NaN slots (NaN ranks greatest; all-NaN picks code 0)") {
    parity(Seq(
      Seq[java.lang.Float](Float.NaN, 1f, 2f, 3f, 4f, 5f),
      Seq[java.lang.Float](Float.NaN, Float.NaN, Float.NaN, 1f, 2f, 3f)), "nan")
  }

  test("parity on null slots and short/long vectors (degrade contract)") {
    parity(Seq(
      Seq[java.lang.Float](null, 1f, 2f, 3f, 4f, 5f),  // null slot in subspace 0
      Seq[java.lang.Float](1f, 2f, 3f, null, 4f, 5f),  // null slot in subspace 1
      Seq[java.lang.Float](1f, 2f, 3f),                  // subspace 1 missing
      Seq[java.lang.Float](1f, 2f),                      // both subspaces short
      Seq[java.lang.Float](1f, 2f, 3f, 4f, 5f, 6f, 7f, 8f)), "dirty") // extra tail ignored
  }

  test("null embedding yields null codes") {
    parity(Seq(null, Seq[java.lang.Float](1f, 2f, 3f, 4f, 5f, 6f)), "null emb")
  }

  test("deterministic under repartitioning") {
    val df = (0 until 60).map(i =>
      (i.toLong, Seq.tabulate(6)(d => ((i * 3 + d) % 7).toFloat))).toDF("vec_id", "embedding")
    def codes(d: org.apache.spark.sql.DataFrame) =
      d.select(col("vec_id"), ProductQuantization.encode(col("embedding"), books).as("c"))
        .as[(Long, Seq[Int])].collect().toMap
    assert(codes(df) == codes(df.repartition(7)))
  }

  test("native adcTable == composed adcTable (clean, NaN, null-slot, short, null emb)") {
    val rows: Seq[Seq[java.lang.Float]] = Seq(
      Seq.tabulate(6)(i => java.lang.Float.valueOf((i * 3 - 7).toFloat / 2f)),
      Seq.tabulate(6)(i => java.lang.Float.valueOf(i.toFloat)),
      Seq[java.lang.Float](Float.NaN, 1f, 2f, 3f, 4f, 5f),
      Seq[java.lang.Float](null, 1f, 2f, 3f, 4f, 5f),
      Seq[java.lang.Float](1f, 2f, 3f),
      null)
    val df = rows.zipWithIndex
      .map { case (r, i) => (i.toLong, if (r == null) null else r.map(x => x: java.lang.Float)) }
      .toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
    val got = df.select(col("vec_id"),
      ProductQuantization.adcTable(col("embedding"), books).as("t"))
      .as[(Long, Seq[Seq[Option[Double]]])].collect().toMap
    val want = df.select(col("vec_id"),
      ProductQuantization.adcTableComposed(col("embedding"), books).as("t"))
      .as[(Long, Seq[Seq[Option[Double]]])].collect().toMap
    // NaN != NaN under ==; compare through string rendering
    assert(got.view.mapValues(_.toString).toMap == want.view.mapValues(_.toString).toMap,
      s"native=$got composed=$want")
  }

  test("native lshBits == composed per-plane signature (incl. NaN slots)") {
    import graft.operators.Similarity
    val dim = 8
    // the pre-r15 composed form, reconstructed as the oracle
    def composed(emb: org.apache.spark.sql.Column, numPlanes: Int, p0: Int) = {
      val bits = (0 until numPlanes).map { p =>
        val plane = array((0 until dim).map(i =>
          lit(Similarity.planeComponentForTest(p0 + p, i))): _*)
        val dot = aggregate(zip_with(emb, plane, (x, w) => x.cast("double") * w),
          lit(0.0), (acc, v) => acc + v)
        when(dot >= 0, lit(1L << p)).otherwise(lit(0L))
      }
      bits.reduce(_ + _)
    }
    val df = ((0 until 40).map(i =>
        (i.toLong, Seq.tabulate(dim)(d => ((i * 13 + d * 5) % 17 - 8).toFloat / 3f))) :+
        (100L, Seq.tabulate(dim)(d => if (d == 2) Float.NaN else d.toFloat)))
      .toDF("vec_id", "embedding")
    for (p0 <- Seq(0, 12)) {
      val got = df.select(col("vec_id"),
        Similarity.lshSignature(col("embedding"), dim, 7, p0).as("s"))
        .as[(Long, Long)].collect().toMap
      val want = df.select(col("vec_id"), composed(col("embedding"), 7, p0).as("s"))
        .as[(Long, Long)].collect().toMap
      assert(got == want, s"p0=$p0")
    }
  }
}
