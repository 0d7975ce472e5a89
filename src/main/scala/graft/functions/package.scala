package graft

import org.apache.spark.sql.{Column, GraftBridge, SparkSession}

/** Column-level entry points for the engine's custom Catalyst
  * expressions, plus SQL registration. */
package object functions {

  /** Polynomial string hash (codegen'd native expression). */
  def poly_hash(c: Column): Column =
    GraftBridge.column(PolyHash(GraftBridge.expression(c)))

  /** Register `poly_hash` for SQL use in the given session. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "poly_hash", exprs => PolyHash(exprs.head), "scala_udf")
}
