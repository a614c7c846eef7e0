package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{And, Ascending, Attribute, BindReferences, EqualTo, Expression, GenericInternalRow, JoinedRow, LessThanOrEqual, SortOrder, UnaryExpression, UnsafeProjection}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.plans.LeftOuter
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.DataType

/** Opt-in marker for AS-OF join semantics: `graft_asof(l.k = r.k AND
  * r.t <= l.t)` as a LEFT join condition asks the planner to match each
  * left row with the single LATEST right row whose time is <= the left
  * row's time (per key) — the QuestDB/Pandas `merge_asof` contract —
  * instead of the all-pairs theta-join the raw condition means. Like
  * [[graft.engine.functions.GraftApprox]] this is an EXPLICIT semantic
  * opt-in (an optimizer must never silently change results): in a
  * session without [[AsOfJoinStrategy]] the marker evaluates as
  * identity and the query degenerates to the all-pairs join.
  */
case class AsOfMark(child: Expression) extends UnaryExpression {
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_asof"
  override def eval(input: InternalRow): Any = child.eval(input)
  // identity: reuse the child's generated code outright (the Alias pattern)
  override def genCode(ctx: CodegenContext): ExprCode = child.genCode(ctx)
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    throw new IllegalStateException("AsOfMark.genCode delegates to child")
  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(newChild)
}

/** Plans a marker-flagged LEFT join as [[AsOfJoinExec]] — the engine's
  * one custom whole-operator physical plan (SURVEY §4.3 budget): the
  * composed as-of spelling (union + keyed window + filter, q_join_asof)
  * shuffles the merged stream once and then windows it; this operator
  * instead declares the SAME key distribution on both children plus a
  * (key, time) sort per side, and merges each co-partitioned pair of
  * sorted partitions in ONE streaming pass with O(1) state — the shape
  * a time-series engine gives its ASOF JOIN. EnsureRequirements inserts
  * the exchanges/sorts exactly as it does for sort-merge join, so AQE,
  * whole-stage-codegen children, and reused exchanges all compose.
  */
object AsOfJoinStrategy extends SparkStrategy {
  def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case Join(left, right, LeftOuter,
        Some(AsOfMark(And(eq: EqualTo, le: LessThanOrEqual))), _) =>
      // normalize sidedness: key equality may arrive as l = r or r = l;
      // the time bound must be rightTime <= leftTime
      def sideOf(e: Expression): Option[Boolean] =
        if (e.references.subsetOf(left.outputSet)) Some(true)
        else if (e.references.subsetOf(right.outputSet)) Some(false)
        else None
      val keys = (sideOf(eq.left), sideOf(eq.right)) match {
        case (Some(true), Some(false)) => Some((eq.left, eq.right))
        case (Some(false), Some(true)) => Some((eq.right, eq.left))
        case _ => None
      }
      val times = (sideOf(le.left), sideOf(le.right)) match {
        case (Some(false), Some(true)) => Some((le.right, le.left))
        case _ => None
      }
      (keys, times) match {
        case (Some((lk, rk)), Some((lt, rt))) =>
          AsOfJoinExec(lk, rk, lt, rt,
            planLater(left), planLater(right)) :: Nil
        case _ => Nil
      }
    case _ => Nil
  }
}

/** LEFT-OUTER as-of join: each left row pairs with the LATEST right row
  * (greatest rightTime) having rightKey == leftKey and rightTime <=
  * leftTime, or nulls when no such row exists. Right rows with a null
  * key or time never match (the DuckDB ASOF contract); ties on
  * rightTime resolve to the LAST row in the right side's (key, time)
  * sort order, so callers wanting determinism under time ties
  * pre-aggregate the right side to one row per (key, time) — exactly
  * what the registered query does.
  *
  * Scale shape: one hash exchange per side on the key, an in-partition
  * (key, time) sort per side (both inserted by EnsureRequirements), and
  * a single zipPartitions merge with O(1) state per partition — no
  * window over a unioned stream, no buffered groups. Row evaluation is
  * interpreted (bound-reference eval per row); the children still run
  * whole-stage codegen up to the exchange.
  */
case class AsOfJoinExec(
    leftKey: Expression,
    rightKey: Expression,
    leftTime: Expression,
    rightTime: Expression,
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) ::
      ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
      Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending))

  protected override def doExecute(): RDD[InternalRow] = {
    val lk = BindReferences.bindReference(leftKey, left.output)
    val lt = BindReferences.bindReference(leftTime, left.output)
    val rk = BindReferences.bindReference(rightKey, right.output)
    val rt = BindReferences.bindReference(rightTime, right.output)
    val keyType = leftKey.dataType
    val timeType = leftTime.dataType
    val outAttrs = output
    val rightWidth = right.output.length
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val keyOrd = TypeUtils.getInterpretedOrdering(keyType)
      val timeOrd = TypeUtils.getInterpretedOrdering(timeType)
      val joiner = new JoinedRow
      val project = UnsafeProjection.create(outAttrs, outAttrs)
      val nullRight = new GenericInternalRow(rightWidth)
      // One-row lookahead over the right side. The iterator's unsafe
      // row buffer stays valid until the NEXT next() call, so the
      // lookahead itself is NOT copied — only a row promoted to `held`
      // is (it must survive further advances). Keeps the merge
      // allocation-free for skipped rows.
      var rNext: InternalRow = null
      var rNextKey: Any = null
      var rNextTime: Any = null
      def advanceRight(): Unit = {
        rNext = null
        while (rNext == null && rIter.hasNext) {
          val r = rIter.next()
          val k = rk.eval(r)
          val t = rt.eval(r)
          if (k != null && t != null) {
            rNext = r; rNextKey = k; rNextTime = t
          } // null key/time never matches — skip (ASOF contract)
        }
      }
      advanceRight()
      // the held row: latest right row seen for the CURRENT left key
      var held: InternalRow = null
      var heldKey: Any = null
      lIter.map { l =>
        val k = lk.eval(l)
        val t = lt.eval(l)
        if (held != null && (k == null || keyOrd.compare(heldKey, k) != 0)) {
          held = null
        }
        if (k != null && t != null) {
          var advancing = true
          while (advancing && rNext != null) {
            val c = keyOrd.compare(rNextKey, k)
            if (c < 0) {
              advanceRight() // right key behind every future left key too
            } else if (c == 0 && timeOrd.compare(rNextTime, t) <= 0) {
              // re-evaluate the key from the COPIED row: rNextKey may point
              // into the iterator's reusable row buffer (UTF8String/binary/
              // decimal), which the next advanceRight() overwrites.
              // The key-type matrix is law-pinned in EngineLawsSpec:
              // Long (oracle rows), UTF8String, Decimal, binary, and
              // struct each replay the expected match set independently
              held = rNext.copy(); heldKey = rk.eval(held)
              advanceRight()
            } else {
              advancing = false
            }
          }
        }
        // t == null never matches: rightTime <= NULL is never true (ASOF
        // contract), even when a held row exists for the same key
        if (held != null && k != null && t != null &&
            keyOrd.compare(heldKey, k) == 0) {
          project(joiner(l, held))
        } else {
          project(joiner(l, nullRight))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): SparkPlan =
    copy(left = newLeft, right = newRight)
}
