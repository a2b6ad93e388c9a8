package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier

/** Engine extension point (SparkSessionExtensions): registers the native
  * expressions so they are callable from SQL (`graft_cosine(a, b)`) and via
  * `call_function` from the DataFrame API. Installed by GraftSession via
  * builder.withExtensions; third-party sessions can install it with
  * spark.sql.extensions=graft.plans.GraftExtensions.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_cosine"),
      CosineSimilarity.info,
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 2, "graft_cosine takes exactly 2 arguments")
        CosineSimilarity(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_tokenize"),
      Tokenize.info,
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 1, "graft_tokenize takes exactly 1 argument")
        Tokenize(children.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_token_count"),
      TokenCount.info,
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 1, "graft_token_count takes exactly 1 argument")
        TokenCount(children.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_adc_distance"),
      AdcDistance.info,
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.size == 2, "graft_adc_distance takes exactly 2 arguments")
        AdcDistance(children.head, children(1))
      }))
    ext.injectOptimizerRule(_ => SelfCosineRewrite)
    ext.injectOptimizerRule(_ => TokenCountRewrite)
  }
}
