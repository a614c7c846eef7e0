package graft.engine.functions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType}

/** DDSketch-style relative-error quantile sketch as a
  * TypedImperativeAggregate — the mergeable percentile primitive for
  * 100 TB: build per-group sketches in one pass, merge KB-scale bucket
  * maps forever, answer any quantile later with guaranteed relative
  * error ≤ α.
  *
  * Positive values map to log-buckets i = ceil(log_γ(x)) with
  * γ = (1+α)/(1-α); non-positive values (not expected for the price/
  * size/count domains this serves) collapse into a dedicated zero
  * bucket. Bucket boundaries are FIXED by α alone, so merge is
  * bucket-wise count addition — commutative and associative, making the
  * merged sketch BYTE-IDENTICAL under any partitioning (same
  * determinism class as the engine's Bloom/CMS sketches; a t-digest's
  * merge-order-sensitive centroids would wobble run to run and break
  * the repo's reproducibility discipline).
  *
  * State: one (int, long) entry per occupied bucket — for doubles
  * spanning 12 orders of magnitude at α=0.01 that is ≤ ~2800 entries,
  * in practice far fewer.
  */
case class DdSketch(
    child: Expression,
    alpha: Double = 0.01,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[Int, Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "dd_sketch"

  // update() casts to Double; without this check `dd_sketch(int_col)`
  // would die at RUNTIME with ClassCastException instead of a clean
  // analysis error (same discipline as MisraGries)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case DoubleType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(
            s"dd_sketch requires a double input (cast first), got ${other.sql}")
    }

  private val gamma = (1 + alpha) / (1 - alpha)
  private val logGamma = math.log(gamma)

  override def createAggregationBuffer(): mutable.HashMap[Int, Long] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[Int, Long],
      input: InternalRow): mutable.HashMap[Int, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val x = v.asInstanceOf[Double]
      val idx =
        if (x > 0) math.ceil(math.log(x) / logGamma).toInt
        else DdSketch.ZeroBucket
      buf.update(idx, buf.getOrElse(idx, 0L) + 1)
    }
    buf
  }

  override def merge(buf: mutable.HashMap[Int, Long],
      other: mutable.HashMap[Int, Long]): mutable.HashMap[Int, Long] = {
    other.foreach { case (i, c) => buf.update(i, buf.getOrElse(i, 0L) + c) }
    buf
  }

  override def eval(buf: mutable.HashMap[Int, Long]): Any = serialize(buf)

  /** Bucket entries sorted by index — canonical bytes for a given
    * dataset regardless of hash-map iteration order.
    */
  override def serialize(buf: mutable.HashMap[Int, Long]): Array[Byte] = {
    val entries = buf.toArray.sortBy(_._1)
    val bb = ByteBuffer.allocate(12 + entries.length * 12)
    bb.putDouble(alpha).putInt(entries.length)
    entries.foreach { case (i, c) => bb.putInt(i).putLong(c) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[Int, Long] = {
    val bb = ByteBuffer.wrap(bytes)
    bb.getDouble
    val n = bb.getInt
    val buf = mutable.HashMap.empty[Int, Long]
    var i = 0
    while (i < n) { buf.update(bb.getInt, bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): DdSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): DdSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object DdSketch {
  /** Sentinel bucket for non-positive inputs (below every log bucket). */
  val ZeroBucket: Int = Int.MinValue
}

/** `dd_quantile(sketch, q)` — quantile estimate from a serialized
  * [[DdSketch]]: walk the cumulative bucket counts to rank q·(n-1) and
  * return the bucket midpoint 2γ^i/(γ+1), which carries the ≤ α
  * relative-error guarantee. Cold path (once per group), so
  * CodegenFallback like [[CmsQuery]].
  */
case class DdQuantile(sketch: Expression, q: Expression)
  extends Expression with CodegenFallback {

  override def children: Seq[Expression] = Seq(sketch, q)
  override def nullable: Boolean = true
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dd_quantile"

  override def eval(input: InternalRow): Any = {
    val sk = sketch.eval(input)
    val qv = q.eval(input)
    if (sk == null || qv == null) null
    else {
      val bb = ByteBuffer.wrap(sk.asInstanceOf[Array[Byte]])
      val alpha = bb.getDouble
      val gamma = (1 + alpha) / (1 - alpha)
      val n = bb.getInt
      if (n == 0) null
      else {
        val idx = new Array[Int](n)
        val cnt = new Array[Long](n)
        var i = 0
        var total = 0L
        while (i < n) {
          idx(i) = bb.getInt; cnt(i) = bb.getLong; total += cnt(i); i += 1
        }
        val rank = (qv.asInstanceOf[Double] * (total - 1)).toLong
        var seen = 0L
        i = 0
        while (i < n && seen + cnt(i) <= rank) { seen += cnt(i); i += 1 }
        val b = idx(math.min(i, n - 1))
        if (b == DdSketch.ZeroBucket) 0.0
        else 2.0 * math.pow(gamma, b) / (gamma + 1)
      }
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(sketch = newChildren(0), q = newChildren(1))
}
