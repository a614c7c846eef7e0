package graft.engine.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** Morton (z-order) interleave of the low 16 bits of two integer keys —
  * the multi-dimensional data-CLUSTERING primitive: sorting/range-
  * partitioning 100 TB of files by `morton2(a, b)` keeps rows close in
  * BOTH dimensions close on disk, so parquet min/max stats prune files
  * for 2-D box predicates where a single-column sort order can only ever
  * serve one of the two dimensions.
  *
  * Bit i of `x` lands at position 2i, bit i of `y` at 2i+1 (bits ≥16 are
  * ignored — bucket wider domains first). Interleaving uses the standard
  * O(log w) mask-spread (no loop, branch-free), and the expression
  * participates in whole-stage codegen, so computing the key adds ~ns per
  * row to the write path.
  */
case class Morton2(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(left, right).forall(e =>
      e.dataType == IntegerType || e.dataType == LongType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"morton2 expects integer inputs, got " +
        s"${left.dataType.sql} / ${right.dataType.sql}")
  override def dataType: DataType = LongType
  override def prettyName: String = "morton2"

  private def toLong(v: Any): Long = v match {
    case i: java.lang.Integer => i.toLong
    case l: java.lang.Long => l
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    Morton2.interleave(toLong(a), toLong(b))

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val sx = ctx.freshName("sx")
      val sy = ctx.freshName("sy")
      s"""
         |long $sx = ((long) $a) & 0xFFFFL;
         |$sx = ($sx | ($sx << 8)) & 0x00FF00FFL;
         |$sx = ($sx | ($sx << 4)) & 0x0F0F0F0FL;
         |$sx = ($sx | ($sx << 2)) & 0x33333333L;
         |$sx = ($sx | ($sx << 1)) & 0x55555555L;
         |long $sy = ((long) $b) & 0xFFFFL;
         |$sy = ($sy | ($sy << 8)) & 0x00FF00FFL;
         |$sy = ($sy | ($sy << 4)) & 0x0F0F0F0FL;
         |$sy = ($sy | ($sy << 2)) & 0x33333333L;
         |$sy = ($sy | ($sy << 1)) & 0x55555555L;
         |${ev.value} = $sx | ($sy << 1);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(newLeft, newRight)
}

object Morton2 {
  /** Spread the low 16 bits of v to even positions. */
  private def spread(v: Long): Long = {
    var s = v & 0xFFFFL
    s = (s | (s << 8)) & 0x00FF00FFL
    s = (s | (s << 4)) & 0x0F0F0F0FL
    s = (s | (s << 2)) & 0x33333333L
    s = (s | (s << 1)) & 0x55555555L
    s
  }

  def interleave(x: Long, y: Long): Long = spread(x) | (spread(y) << 1)

  /** DuckDB-oracle twin: an explicit 32-term shift/mask sum reading the
    * same low-16 bits — bit-identical to [[interleave]] for any input.
    */
  def oracleSql(x: String, y: String): String = {
    val xs = (0 until 16)
      .map(i => s"(((CAST($x AS BIGINT) >> $i) & 1) << ${2 * i})")
    val ys = (0 until 16)
      .map(i => s"(((CAST($y AS BIGINT) >> $i) & 1) << ${2 * i + 1})")
    (xs ++ ys).mkString("(", " + ", ")")
  }
}
