package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation helpers for hot keys at 100 TB.
  *
  * AQE's skew-join splitting handles most cases at runtime; these are the
  * explicit tools for the two shapes AQE can't fix:
  *  - saltedAggregate: a grouped aggregate where one key holds a large
  *    fraction of all rows — pre-aggregate on (key, salt) so the hot key's
  *    rows spread over `salts` reducers, then combine the partials.
  *  - saltedBroadcastLeft: a join where the build side is small but the
  *    probe side's key distribution is degenerate — replicate the small
  *    side per salt so no single reducer owns the hot key.
  */
object Skew {

  /** Columns usable as deterministic salt input: hash() rejects MapType
    * (at any nesting depth), so map-bearing columns are excluded.
    */
  private def hashableCols(df: DataFrame): Seq[Column] = {
    def mapFree(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
      case _: org.apache.spark.sql.types.MapType => false
      case s: org.apache.spark.sql.types.StructType => s.fields.forall(f => mapFree(f.dataType))
      case a: org.apache.spark.sql.types.ArrayType => mapFree(a.elementType)
      case _ => true
    }
    val cols = df.schema.fields.filter(f => mapFree(f.dataType))
      .map(f => byName(df, f.name)).toSeq
    require(cols.nonEmpty,
      "no hashable (map-free) columns to derive a deterministic salt from — " +
        "add a stable row-id column before salting")
    cols
  }

  /** Resolve a TOP-LEVEL column by its literal name: bare col()/df(name)
    * PARSE the string, so a legal column named "user.id" fails to resolve
    * — or silently resolves to a struct FIELD of a different column
    * (review r9). Backtick-quoting (with escaping) forces single-part
    * resolution.
    */
  private def byName(df: DataFrame, name: String): Column =
    df(s"`${name.replace("`", "``")}`")

  /** Two-phase grouped sum with salting. Exact for integral and DECIMAL
    * values (sum is associative+commutative there); for floating-point
    * values the reassociated partial-then-combine order can differ from
    * the plain grouped sum in final ULPs — cast money/metrics to DECIMAL
    * first when comparing against an unsalted plan (the catalog's
    * o10_salted_agg does exactly this).
    *
    * The salt is derived from row content (hash of every map-free column),
    * never from spark_partition_id/monotonically_increasing_id:
    * nondeterministic salts recomputed on task retry could disagree with
    * partials already fetched (the SPARK-23207 class of bug).
    *
    * Deterministic salting needs a high-entropy deterministic source: if
    * the hot key's rows have low content entropy (tiny value domains,
    * byte-identical or near-identical rows), the content hash concentrates
    * on few salts and the mitigation silently degrades — pass the table's
    * stable row id as `saltSource` in that regime. saltSource is ALSO the
    * cost lever on wide tables: the default hashes every map-free column
    * per row (a multi-MB text payload pays a full hash just to pick one of
    * 16 salts) — pass the id column and the salt costs one word (r9).
    */
  def saltedSum(df: DataFrame, keyCols: Seq[String], valueCol: Column,
                salts: Int = 16, saltSource: Option[Column] = None): DataFrame = {
    // salts = 0 would make pmod null (single reducer, mitigation silently
    // off — or ANSI divide-by-zero); fail fast instead
    require(salts >= 1, s"salts must be >= 1, got $salts")
    require(!df.columns.contains("__salt") && !df.columns.contains("__partial"),
      "input already has a __salt/__partial column — rename it before salting")
    // the OUTPUT name is reserved too: a key column named "total" would
    // produce two same-named columns and ambiguous-reference errors far
    // from the cause (review r9)
    require(!keyCols.contains("total"),
      "a key column is named 'total', which is the output aggregate's name")
    val src = saltSource.map(c => hash(c)).getOrElse(hash(hashableCols(df): _*))
    val salted = df.withColumn("__salt", pmod(src, lit(salts)))
    // resolve keys through the FRAME, not col(): a legal dotted name like
    // "user.id" would misparse as a struct-field path (review r9)
    val partial = salted
      .groupBy((keyCols.map(byName(salted, _)) :+ salted("__salt")): _*)
      .agg(sum(valueCol).as("__partial"))
    partial.groupBy(keyCols.map(byName(partial, _)): _*)
      .agg(sum("__partial").as("total"))
  }

  /** INNER-join a skewed fact to a small dim with explicit salt
    * replication: fact rows get a deterministic content-derived salt, the
    * (broadcast) dim is exploded over all salts, and the join key becomes
    * (key, salt). "Left" in the name is the SIDE the salt derives from
    * (the fact), NOT the join type — unmatched and null-key fact rows do
    * not survive (review r9: spelled out so a drop-in replacement for a
    * left outer join is a conscious decision, not a silent row-count
    * change). Same low-entropy caveat as [[saltedSum]] — pass `saltSource`
    * (a stable row id) when the hot key's rows are near-identical.
    */
  def saltedBroadcastLeft(fact: DataFrame, dim: DataFrame, key: String,
                          salts: Int = 16, saltSource: Option[Column] = None): DataFrame = {
    // salts = 0 would explode the dim over an EMPTY salt array — every dim
    // row dropped, the join silently returns nothing
    require(salts >= 1, s"salts must be >= 1, got $salts")
    require(!fact.columns.contains("__salt") && !dim.columns.contains("__salt"),
      "input already has a __salt column — rename it before salting")
    val src = saltSource.map(c => hash(c)).getOrElse(hash(hashableCols(fact): _*))
    val saltedFact = fact.withColumn("__salt", pmod(src, lit(salts)))
    val replicatedDim = dim.withColumn("__salt",
      explode(array((0 until salts).map(lit): _*)))
    saltedFact.join(broadcast(replicatedDim), Seq(key, "__salt")).drop("__salt")
  }
}
