package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (backward) join: for each left row, the latest right row with
  * right.ts <= left.ts within the same key (SURVEY J6/W5 — the
  * step-schedule lookup of chapter_4/MnistClassification.java:92-102
  * generalized).
  *
  * Implementation: union both sides tagged, one window pass ordered by
  * (key, ts, side) carrying the last right value forward — a single sort
  * per key partition, no range cross-join. At 100 TB this shuffles each
  * side once on the key (same cost as any equi-join) and never builds
  * per-row candidate sets.
  */
object AsOfJoin {

  /** @param left     left table; must contain `key` and `ts`
    * @param right    right table; must contain `key`, `ts` and `valueCol`
    * @param valueCol carried value; must not collide with a left column
    * @return all left rows plus `valueCol` from the most recent right row
    *         with the same key and right.ts <= left.ts (null if none).
    *         A newer right row always supersedes older ones, including when
    *         its `valueCol` is NULL — row presence, not value presence,
    *         drives the lookup (ADVICE round 2). If several right rows share
    *         a (key, ts), the greatest non-null `valueCol` wins ties (nulls
    *         sort first) — a documented deterministic tiebreak rather than
    *         partition-order luck.
    */
  def backward(left: DataFrame, right: DataFrame, key: String, ts: String,
               valueCol: String): DataFrame = {
    require(!left.columns.contains(valueCol), s"left already has column $valueCol")
    for (c <- Seq("__side", "__asof"))
      require(!left.columns.contains(c) && !right.columns.contains(c),
        s"input already has a $c column — rename it before the as-of join")
    val l = left.withColumn("__side", lit(1))
    // join-equality semantics for nulls (review r8): a NULL key matches
    // nothing (the window's partitionBy would group null keys together and
    // fabricate matches join equality never makes), and a NULL ts compares
    // UNKNOWN to every left ts (ascending nulls-FIRST would treat it as
    // -infinity, entering every frame) — such right rows can never be an
    // as-of match, so drop them up front. Left-side nulls need no filter:
    // a null-key left row's partition then holds no right rows, and a
    // null-ts left row's frame holds only other null-ts rows — both yield
    // the correct null lookup.
    val r = right.select(col(key), col(ts), col(valueCol))
      .where(col(key).isNotNull && col(ts).isNotNull)
      .withColumn("__side", lit(0))
    // right rows sort before left rows at equal ts => "at or before"
    // semantics; valueCol breaks ties among equal-ts right rows. A
    // non-orderable payload (map, map-bearing struct) cannot sort — fall
    // back to its deterministic JSON rendering for the TIE TERM only,
    // instead of failing the whole join at plan time (review r9). The
    // carried payload is a struct that is non-null for every RIGHT row
    // (even when valueCol itself is null), so last(ignoreNulls) keys on
    // row presence.
    val tieOrder =
      if (org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(
          right.schema(valueCol).dataType)) col(valueCol)
      else to_json(struct(col(valueCol)))
    val w = Window.partitionBy(key).orderBy(col(ts), col("__side"), tieOrder)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r, allowMissingColumns = true)
      .withColumn("__asof",
        last(when(col("__side") === 0, struct(col(valueCol))), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
      .drop("__side", valueCol)
      .withColumn(valueCol, col("__asof")(valueCol))
      .drop("__asof")
  }
}
