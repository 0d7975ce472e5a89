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

  /** Registered as a SQL function, so misuse must fail analysis — the
    * per-element reads below are type-specific and would silently
    * return garbage otherwise. Both sides array<float> (the raw
    * embedding path) or both array<double> (the dequantized SQ8 path);
    * mixed inputs take an explicit cast, keeping the IEEE sequence
    * visible in the plan. */
  override def checkInputDataTypes(): TypeCheckResult = {
    def elem(e: Expression) = e.dataType match {
      case ArrayType(t, _) => Some(t)
      case _ => None
    }
    (elem(left), elem(right)) match {
      case (Some(FloatType), Some(FloatType)) => TypeCheckResult.TypeCheckSuccess
      case (Some(DoubleType), Some(DoubleType)) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"dot_product requires two array<float> or two array<double> inputs, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
    }
  }

  private def isDoubleInput: Boolean = left.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  protected override def nullSafeEval(a: Any, b: Any): Any =
    if (isDoubleInput) DotProduct.dotDouble(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    else DotProduct.dotFloat(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val method = if (isDoubleInput) "dotDouble" else "dotFloat"
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.DotProduct.$method($a, $b)")
  }

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

  def dotDouble(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    acc
  }
}
