package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native left-to-right dot product over two float-array columns.
  *
  * Bit-identical to the HOF form
  * `aggregate(zip_with(a, b, (x,y) -> double(x)*double(y)), 0d, +)`
  * and to the DuckDB oracle's `list_reduce(list_prepend(0.0,
  * list_transform(...)))` — strictly sequential IEEE adds in index
  * order, float->double casts exact — but codegen'd as one tight loop
  * instead of materializing a 64-element array and interpreting two
  * lambdas per element per pair. ANN scoring (Q x N pairs) is exactly
  * the shape where that overhead dominates.
  */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  /** Registered as a SQL function, so misuse (e.g. array<double>)
    * must fail analysis — the per-element reads below are
    * float-specific and would silently return garbage otherwise. */
  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_product requires two array<float> inputs, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  protected override def nullSafeEval(a: Any, b: Any): Any =
    DotProduct.dotFloat(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.DotProduct.dotFloat($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  /** Strict in-order fold; length = min(|a|, |b|) (zip_with semantics
    * never arise here — corpus vectors share one dimensionality). */
  def dotFloat(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    acc
  }
}
