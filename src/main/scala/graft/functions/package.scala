package graft

import org.apache.spark.sql.{Column, GraftBridge, SparkSession}

/** Column-level entry points for the engine's custom Catalyst
  * expressions, plus SQL registration. */
package object functions {

  /** Polynomial string hash (codegen'd native expression). */
  def poly_hash(c: Column): Column =
    GraftBridge.column(PolyHash(GraftBridge.expression(c)))

  /** Left-to-right dot product of two float arrays (codegen'd). */
  def dot_product(a: Column, b: Column): Column =
    GraftBridge.column(DotProduct(GraftBridge.expression(a), GraftBridge.expression(b)))

  /** Per-document MinHash signature over a shingle array (codegen'd,
    * map-side; one pass for all k permutations). combine > 1 folds
    * each group of `combine` minima into one LSH band key. */
  def min_hash_sig(c: Column, perms: Seq[(Long, Long)], combine: Int = 1): Column =
    GraftBridge.column(MinHashSig(GraftBridge.expression(c), perms, combine))

  /** Per-document packed SimHash over a shingle array (codegen'd,
    * map-side; multiplicity-weighted majority votes). */
  def simhash_pack(c: Column, mixes: Seq[(Long, Long)], width: Int): Column =
    GraftBridge.column(SimHashPack(GraftBridge.expression(c), mixes, width))

  /** Token n-grams joined with spaces (codegen'd; empty below n). */
  def token_ngrams(c: Column, n: Int): Column =
    GraftBridge.column(TokenNgrams(GraftBridge.expression(c), n))

  /** Content-defined chunk hashes over a token array (codegen'd;
    * boundary after tokens hashing to 0 mod `modulus`). */
  def cdc_chunk_hashes(c: Column, modulus: Int): Column =
    GraftBridge.column(CdcChunkHashes(GraftBridge.expression(c), modulus))

  /** Character n-grams of a string (codegen'd; empty below n chars). */
  def char_ngrams(c: Column, n: Int): Column =
    GraftBridge.column(CharNgrams(GraftBridge.expression(c), n))

  /** Unicode NFC canonical composition (codegen'd; JDK UAX#15). */
  def nfc_normalize(c: Column): Column =
    GraftBridge.column(NfcNormalize(GraftBridge.expression(c)))

  /** Extracts the literal-int second argument the n-parameterized
    * kernels need at plan time (SQL callers write token_ngrams(x, 3);
    * the 3 must be a foldable literal, like Spark's own array_repeat
    * count in codegen'd form). */
  private[graft] def literalInt(e: org.apache.spark.sql.catalyst.expressions.Expression,
      fn: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$fn expects a literal integer parameter, got $other")
  }

  /** Register the custom expressions for SQL use in the given session.
    * The seed-list sketches (min_hash_sig, simhash_pack) stay
    * Scala-only: their permutation tables are not SQL-expressible. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction(
      "poly_hash", exprs => PolyHash(exprs.head), "scala_udf")
    reg.createOrReplaceTempFunction(
      "dot_product", exprs => DotProduct(exprs(0), exprs(1)), "scala_udf")
    reg.createOrReplaceTempFunction(
      "token_ngrams",
      exprs => TokenNgrams(exprs(0), literalInt(exprs(1), "token_ngrams")), "scala_udf")
    reg.createOrReplaceTempFunction(
      "char_ngrams",
      exprs => CharNgrams(exprs(0), literalInt(exprs(1), "char_ngrams")), "scala_udf")
    reg.createOrReplaceTempFunction(
      "cdc_chunk_hashes",
      exprs => CdcChunkHashes(exprs(0), literalInt(exprs(1), "cdc_chunk_hashes")), "scala_udf")
    reg.createOrReplaceTempFunction(
      "nfc_normalize", exprs => NfcNormalize(exprs.head), "scala_udf")
  }
}
