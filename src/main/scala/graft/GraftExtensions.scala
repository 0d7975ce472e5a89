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
    ext.injectFunction((
      FunctionIdentifier("token_ngrams"),
      new ExpressionInfo(classOf[graft.functions.TokenNgrams].getName, "token_ngrams"),
      (exprs: Seq[Expression]) => graft.functions.TokenNgrams(exprs(0),
        graft.functions.literalInt(exprs(1), "token_ngrams"))))
    ext.injectFunction((
      FunctionIdentifier("char_ngrams"),
      new ExpressionInfo(classOf[graft.functions.CharNgrams].getName, "char_ngrams"),
      (exprs: Seq[Expression]) => graft.functions.CharNgrams(exprs(0),
        graft.functions.literalInt(exprs(1), "char_ngrams"))))
    ext.injectFunction((
      FunctionIdentifier("cdc_chunk_hashes"),
      new ExpressionInfo(classOf[graft.functions.CdcChunkHashes].getName, "cdc_chunk_hashes"),
      (exprs: Seq[Expression]) => graft.functions.CdcChunkHashes(exprs(0),
        graft.functions.literalInt(exprs(1), "cdc_chunk_hashes"))))
  }
}
