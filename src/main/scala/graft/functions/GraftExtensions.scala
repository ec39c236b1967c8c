package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session-extension entry point: activate the engine's custom
  * Catalyst surface at session build time —
  *
  * {{{
  * SparkSession.builder()
  *   .config("spark.sql.extensions", "graft.functions.GraftExtensions")
  * }}}
  *
  * This is the production registration path (every session on the
  * cluster gets the functions, including pure-SQL clients); the
  * per-session `CosineSimilarityExpr.register(spark)` helper remains
  * for ad-hoc use. Catalyst sees a first-class Expression either way —
  * codegen, null-propagation and type checks all participate in
  * optimization, unlike an opaque UDF.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.cosineFastDescriptor)
  }
}

object GraftExtensions {
  /** (name, info, builder) descriptor for `cosine_fast`. */
  val cosineFastDescriptor: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) = (
    FunctionIdentifier("cosine_fast"),
    new ExpressionInfo(classOf[CosineSimilarityExpr].getName, "cosine_fast"),
    (exprs: Seq[Expression]) => {
      require(exprs.length == 2,
        s"cosine_fast expects 2 arguments, got ${exprs.length}")
      CosineSimilarityExpr(exprs(0), exprs(1))
    })
}
