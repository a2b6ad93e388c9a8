package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftshim.ColumnShim

/** Registry-independent Column constructors for the native expressions.
  *
  * `call_function("graft_...")` resolves through the session's function
  * registry, which only has our functions when GraftExtensions is
  * installed. Building the Column from the catalyst Expression directly
  * removes that coupling, so library callers get the fused kernels under
  * ANY SparkSession; the extension registration remains for the SQL string
  * surface and the optimizer rules.
  */
object NativeColumns {

  private def expr(c: Column) = ColumnShim.expression(c)

  def tokenize(text: Column): Column =
    ColumnShim.column(Tokenize(expr(text)))

  def tokenCount(text: Column): Column =
    ColumnShim.column(TokenCount(expr(text)))

  def cosine(a: Column, b: Column): Column =
    ColumnShim.column(CosineSimilarity(expr(a), expr(b)))

  def adcDistance(codes: Column, table: Column): Column =
    ColumnShim.column(AdcDistance(expr(codes), expr(table)))

  def pqEncode(emb: Column, books: Array[Array[Array[Float]]]): Column =
    ColumnShim.column(PqEncode(expr(emb), books))

  def adcTable(emb: Column, books: Array[Array[Array[Float]]]): Column =
    ColumnShim.column(AdcTable(expr(emb), books))

  def lshBits(emb: Column, planes: Array[Array[Double]]): Column =
    ColumnShim.column(LshBits(expr(emb), planes))
}
