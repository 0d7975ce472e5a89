package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native codegen'd expression — the
  * first stage of text-pipeline normalization (web text arrives with
  * mixed composed/decomposed accents; dedup digests and shingle
  * hashes see different bytes for identical glyphs unless canonical
  * composition runs first). Spark has no builtin; a Scala UDF would
  * pay serialization per row — this wraps `java.text.Normalizer`
  * (the JDK's UAX#15 implementation) behind `doGenCode`, so the call
  * inlines into whole-stage codegen like the other kernels. DuckDB's
  * `nfc_normalize` implements the same UAX#15 canonical composition,
  * which is what lets the text_normalize oracle hash byte-for-byte.
  * Fast path: Normalizer.isNormalized is O(n) with no allocation, so
  * already-NFC text (virtually all of a real corpus) costs one scan. */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  protected override def nullSafeEval(input: Any): Any =
    NfcNormalize.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcNormalize.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  /** Referenced from both interpreted eval and generated code. */
  def normalize(u: UTF8String): UTF8String = {
    val s = u.toString
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) u
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }
}
