package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: registers the engine's native
  * Catalyst expressions permanently for a session built with
  * `spark.sql.extensions=graft.GraftExtensions` — the deployment path
  * for clusters, where per-session `graft.functions.register` calls
  * are not practical. Same expressions either way; this is only the
  * injection mechanism. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("poly_hash"),
      new ExpressionInfo(classOf[graft.functions.PolyHash].getName, "poly_hash"),
      (exprs: Seq[Expression]) => graft.functions.PolyHash(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[graft.functions.DotProduct].getName, "dot_product"),
      (exprs: Seq[Expression]) => graft.functions.DotProduct(exprs(0), exprs(1))))
  }
}
