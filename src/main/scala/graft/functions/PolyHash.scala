package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the engine's polynomial string hash:
  * fold (acc * 31 + codepoint) % 1000003 over the characters.
  *
  * Semantically identical to the composed higher-order-function form
  * (`aggregate(transform(sequence(...), ascii(substr(...))), ...)`)
  * and to the DuckDB oracle's `list_reduce(list_transform(range(...)`,
  * but with whole-stage codegen: the HOF form allocates an integer
  * array per value and interprets three lambda layers per char, which
  * made the dedup family (minhash/simhash over ~10^6 shingles at
  * sf0.1) the bench hot spot. A custom `Expression` with `doGenCode`
  * is the idiomatic Spark escape hatch (SURVEY §4.3 preference (b):
  * Expression > UDF) — a Scala UDF would deserialize to String and
  * box; this emits a tight loop inline in the generated code.
  *
  * Codepoint note: inputs are BMP text; `String.charAt` equals the
  * codepoint for non-surrogate chars, matching DuckDB's `ascii()`
  * (first codepoint) per single-char slice. Corpus is ASCII.
  */
case class PolyHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "poly_hash"

  protected override def nullSafeEval(input: Any): Any =
    PolyHash.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PolyHash.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): PolyHash =
    copy(child = newChild)
}

object PolyHash {
  final val P = 1000003L

  /** Referenced from both interpreted eval and generated code. */
  def hash(u: UTF8String): Long = {
    val s = u.toString
    var acc = 0L
    var i = 0
    val n = s.length
    while (i < n) {
      acc = (acc * 31L + s.charAt(i)) % P
      i += 1
    }
    acc
  }
}
