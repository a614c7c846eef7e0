package graft.engine.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Per-row kernel behind [[IntMicros]] — a static method so generated code
  * calls straight into compiled bytecode (the [[BigramTop]] pattern).
  *
  * Rounding is HALF-AWAY-FROM-ZERO, the same boundary rule as Spark's
  * `round()` (BigDecimal HALF_UP) and DuckDB's `round()`: for |v| < 2⁵²
  * every exact half-integer is representable, and `(long)(v ± 0.5)`
  * truncates toward zero, which lands on the away-from-zero neighbour for
  * halves and the nearest integer everywhere else — so the kernel is
  * value-identical to the `round(x * 1e6).cast(long)` lambda spelling it
  * replaces (law-tested over the fixture corpus).
  */
object IntMicrosUtil {
  def quantize(arr: ArrayData, isFloat: Boolean): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val v = (if (isFloat) arr.getFloat(i).toDouble
                 else arr.getDouble(i)) * 1e6
        out(i) = java.lang.Long.valueOf(
          if (v < 0) (v - 0.5).toLong else (v + 0.5).toLong)
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Native integer-micros quantization over a float/double array — the
  * shared first step of every integer-exact vector pipeline (k-means, PQ,
  * SemDeDup, outlier gate): element-wise `round(x * 1e6)` as BIGINT. The
  * `transform()` lambda it replaces evaluates interpreted per element
  * (~64 closure dispatches per vector per scan); this expression runs one
  * compiled loop inside whole-stage codegen. Null elements pass through
  * null, exactly like the lambda.
  */
case class IntMicros(child: Expression) extends UnaryExpression {

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"int_micros expects array<float|double> input, got ${other.sql}")
  }
  override def dataType: DataType = child.dataType match {
    case ArrayType(_, n) => ArrayType(LongType, n)
    case _ => ArrayType(LongType, containsNull = true)
  }
  override def prettyName: String = "int_micros"

  override def nullSafeEval(a: Any): Any =
    IntMicrosUtil.quantize(a.asInstanceOf[ArrayData], isFloat)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      a => s"graft.engine.functions.IntMicrosUtil.quantize($a, $isFloat)")

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(newChild)
}
