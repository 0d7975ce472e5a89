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

  /** Register the custom expressions for SQL use in the given session. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "poly_hash", exprs => PolyHash(exprs.head), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_product", exprs => DotProduct(exprs(0), exprs(1)), "scala_udf")
  }
}
