package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector column kit over ArrayType(FloatType) columns — the engine's
  * tensor surface (reference: 13486_Code/src/test/java/chapter1/ND4JTest.java:16-57).
  * All built-in higher-order expressions: codegen-friendly, no UDFs, no UDTs;
  * arithmetic is promoted to double (left-fold order) so results are
  * reproducible across engines for the DuckDB oracle.
  */
object VectorFunctions {

  /** Left-fold sum of an array in double. */
  def arraySum(a: Column): Column =
    aggregate(a, lit(0.0), (acc, x) => acc + x.cast("double"))

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity in double precision; null-safe for zero vectors. */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val na = l2Norm(a)
    val nb = l2Norm(b)
    when(na > 0 && nb > 0, d / (na * nb))
  }

  /** Per-row mean squared error between two vectors (A8: reconstruction
    * score — reference chapter3/MNISTAnomalyDetector.java:194).
    */
  def mse(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => {
      val dd = x.cast("double") - y.cast("double")
      dd * dd
    }), lit(0.0), (acc, v) => acc + v) / size(a)

  /** Mean square vs the zero vector — the deterministic anomaly score that
    * feeds the W1 per-group top/bottom-k flagship.
    */
  def meanSquare(a: Column): Column =
    aggregate(a, lit(0.0), (acc, x) => acc + x.cast("double") * x.cast("double")) / size(a)

  /** 1-based index of the first maximum (ND4J argMax tie semantics —
    * reference chapter3/MNISTAnomalyDetector.java:75).
    */
  def argmax1(a: Column): Column = array_position(a, array_max(a))

  def addScalar(a: Column, s: Double): Column = transform(a, x => x.cast("double") + lit(s))
  def mulScalar(a: Column, s: Double): Column = transform(a, x => x.cast("double") * lit(s))

  /** Constant-fill vector (F4: Nd4j.zeros — ND4JTest.java:16). */
  def fill(value: Double, n: Column): Column = array_repeat(lit(value), n.cast("int"))

  /** Min-max normalize a scalar column given per-group min/max columns. */
  def minMaxScale(x: Column, mn: Column, mx: Column): Column =
    when(mx > mn, (x.cast("double") - mn) / (mx - mn)).otherwise(lit(0.0))
}
