package graft.engine.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-row helper behind [[NfcNormalize]] — static so generated code calls
  * compiled bytecode directly (one invokestatic in the whole-stage loop).
  * Fast path: NFC-quick-check via `Normalizer.isNormalized` costs one scan
  * and no allocation for the (overwhelmingly common) already-NFC input, so
  * a 100 TB mostly-ASCII corpus pays ~zero for the normalization pass.
  */
object NfcNorm {
  import java.text.Normalizer

  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }
}

/** Unicode NFC normalization — Spark ships no `normalize` SQL function, so
  * this wraps `java.text.Normalizer` (Unicode TR15) as a codegen'd native
  * expression under the SAME NAME as DuckDB's built-in `nfc_normalize`, so
  * the oracle twin is a 1:1 spelling. The standard pre-dedup normalization
  * pass: visually-identical NFC/NFD spellings (e.g. `é` vs `e`+U+0301)
  * otherwise hash to different dedup keys and silently survive exact dedup.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize expects string input, got ${other.sql}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(a: Any): Any =
    NfcNorm.nfc(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.engine.functions.NfcNorm.nfc($a)")

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(newChild)
}
