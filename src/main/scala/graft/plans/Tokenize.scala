package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native canonical tokenizer (SQL: `graft_tokenize`).
  *
  * Semantics are EXACTLY the composed form in TextFunctions (the FIXTURES.md
  * spec mirroring DL4J's DefaultTokenizerFactory + CommonPreprocessor,
  * reference 13486_Code/src/main/scala/chapter2/Word2VecTransformingIterator.java:55-56,95):
  * lower → Java-regex `\s` chars become separators → every other char
  * outside [a-z0-9] is REMOVED (joining its neighbors) → split → drop
  * empties. The composed form walks each document through two regex engines
  * plus a split; this is one fused char scan, and tokenization sits on the
  * hot path of every text query (shingling re-tokenizes the whole corpus).
  * Codegen emits a single static call so the expression stays inside the
  * whole-stage-codegen span.
  */
case class Tokenize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_tokenize"

  override def nullSafeEval(input: Any): Any =
    Tokenize.tokenize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.Tokenize.tokenize($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Tokenize {
  val info: ExpressionInfo = new ExpressionInfo(classOf[Tokenize].getName, "graft_tokenize")

  /** Single-pass scan of the lowercased text. Kept-chars [a-z0-9] extend the
    * current token; Java-regex `\s` chars ([ \t\n\x0B\f\r]) end it; anything
    * else (unicode punctuation, symbols, non-ascii letters after
    * lowercasing) is dropped in place, joining its neighbors — identical to
    * regexp_replace(regexp_replace(lower(t), "\\s", " "), "[^a-z0-9 ]", "")
    * then split-on-spaces with empties removed.
    */
  def tokenize(s: UTF8String): ArrayData = {
    // UTF8String.toLowerCase is the same implementation Spark's lower() uses,
    // so unicode case folding matches the composed form exactly
    val str = s.toLowerCase.toString
    val out = new java.util.ArrayList[AnyRef]
    val sb = new java.lang.StringBuilder
    var i = 0
    val n = str.length
    while (i < n) {
      val c = str.charAt(i)
      if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) {
        sb.append(c)
      } else if (c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r') {
        if (sb.length > 0) { out.add(UTF8String.fromString(sb.toString)); sb.setLength(0) }
      } // else: removed, neighbors join
      i += 1
    }
    if (sb.length > 0) out.add(UTF8String.fromString(sb.toString))
    new GenericArrayData(out.toArray)
  }
}
