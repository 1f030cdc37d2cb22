package graft

import graft.functions.DotProduct
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Session extension wiring (SURVEY.md §2.13): registers graft's native
  * Catalyst expressions for SQL callers. Activate with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` or
  * `.withExtensions(new GraftExtensions)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        if (children.length != 2)
          throw new IllegalArgumentException(
            s"dot_product requires exactly 2 arguments, got ${children.length}")
        DotProduct(children(0), children(1))
      }))
    // aggregate(zip_with(a,b,*),0d,+) → native DotProduct, transparently
    ext.injectOptimizerRule(_ => graft.functions.DotProductRewrite)
  }
}
