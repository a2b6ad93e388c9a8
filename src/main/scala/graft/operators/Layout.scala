package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: Z-order (Morton) clustering.
  *
  * Parquet readers skip files/row-groups whose min/max statistics exclude a
  * predicate. A linear sort gives tight bounds on ONE column only — every
  * file spans the full range of every other column, so a second-dimension
  * filter prunes nothing. Interleaving the bits of several columns into one
  * sort key (the classic Z-order curve used by Delta/Iceberg OPTIMIZE and
  * the UB-tree literature) keeps each file's bounding box small in ALL
  * interleaved dimensions at once — at 100 TB this is the difference
  * between scanning every file and touching only the few whose hyper-
  * rectangle intersects the predicate. The curve value is plain integer
  * bit arithmetic, so it is portable (DuckDB-replayable) and codegen-
  * friendly (no UDF).
  *
  * Reference anchor: the reference has no layout control at all (its demos
  * read single local files — e.g. chapter1/SparkRDDAPITest.scala loads a
  * 5-row in-memory list); this operator is part of the 100 TB extension
  * surface (SURVEY §2.10).
  */
object Layout {

  /** Morton z-value of the given INTEGRAL dimensions, taking the low
    * `bits` bits of each. Bit `j` of dimension `d` lands at interleaved
    * position `j * n + d` (n = number of dimensions), so dimensions
    * alternate bit-by-bit and the curve weights them equally. Each
    * dimension is masked to `value mod 2^bits` up front — an explicit
    * bitwiseAND, not an implicit property of shift semantics — so
    * out-of-range values (including negatives, via their two's-complement
    * low bits) map the same way here and in the DuckDB twin by
    * construction. Callers who need an error on negatives should validate
    * before calling. Requires `bits * n <= 63` (result fits a long).
    *
    * CONTRACT (r8): `bits` must cover each dimension's DOMAIN — a value
    * over 2^bits aliases mod 2^bits, collocating rows from opposite ends
    * of the key range and silently destroying that dimension's min/max
    * pruning (the operator's whole purpose). Size bits >= ceil(log2(max))
    * or pre-normalize wide domains (rank/bucketize) before interleaving.
    * Parity with [[duckZValue]] is guaranteed for integral columns ONLY:
    * a non-integral dim diverges (Spark cast truncates doubles toward
    * zero, DuckDB CAST rounds) — cast/round explicitly first. A null in
    * ANY dimension nulls the whole z-value; [[zOrder]] then range-sorts
    * those rows FIRST, together — a heavily-null dim column concentrates
    * its rows into the leading partition(s), so coalesce nulls to a
    * sentinel before interleaving if that skew matters.
    */
  def zValue(dims: Seq[Column], bits: Int = 16): Column = {
    val n = dims.size
    // LONG multiply: an Int bits*n can overflow negative, pass the bound,
    // and make mask = 0 (shift counts are mod 64) -- every z-value then
    // collapses to the constant 0 and the layout silently stops
    // clustering (review r10)
    require(n >= 1 && bits >= 1 && bits.toLong * n <= 63L,
      s"need 1 <= bits*dims <= 63, got bits=$bits dims=$n")
    val mask = (1L << bits) - 1
    val terms = for {
      (c, d) <- dims.zipWithIndex
      masked = c.cast("long").bitwiseAND(lit(mask))
      j <- 0 until bits
    } yield shiftleft(shiftright(masked, j).bitwiseAND(lit(1L)), j * n + d)
    terms.reduce(_ + _)
  }

  /** DuckDB twin of [[zValue]] — the identical bit arithmetic rendered as
    * SQL, kept adjacent so the two formulas cannot silently desync.
    */
  def duckZValue(dims: Seq[String], bits: Int = 16): String = {
    val n = dims.size
    require(n >= 1 && bits >= 1 && bits.toLong * n <= 63L,
      s"need 1 <= bits*dims <= 63, got bits=$bits dims=$n")
    val mask = (1L << bits) - 1
    val terms = for {
      (c, d) <- dims.zipWithIndex
      j <- 0 until bits
    } yield s"((((CAST($c AS BIGINT) & $mask) >> $j) & 1) << ${j * n + d})"
    terms.mkString("(", " + ", ")")
  }

  /** Range-partition and sort `df` along the z-curve of `dims`, so a
    * subsequent parquet write yields files whose min/max stats are tight
    * in every interleaved dimension. The helper column never escapes.
    */
  def zOrder(df: DataFrame, dims: Seq[Column], partitions: Int,
             bits: Int = 16): DataFrame = {
    val z = "__graft_z"
    require(!df.columns.contains(z), s"input already has a $z column")
    df.withColumn(z, zValue(dims, bits))
      .repartitionByRange(partitions, col(z))
      .sortWithinPartitions(z)
      .drop(z)
  }
}
