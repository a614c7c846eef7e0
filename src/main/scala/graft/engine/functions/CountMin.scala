package graft.engine.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Count-Min Sketch frequency aggregate (SURVEY §4.3 exception (b)): the
  * 100 TB build-once / point-query-many frequency primitive that pairs
  * with [[KmvDistinct]] (distincts) the way `cms_query` pairs with
  * `hll_sketch_estimate`.
  *
  * The buffer is a d×w grid of longs; update increments one counter per
  * row (d independent xxhash64 seeds), merge is elementwise sum. Addition
  * commutes, so the merged sketch is IDENTICAL for every partitioning —
  * estimates are deterministic for a given dataset, keeping the engine's
  * reproducibility discipline. Point estimates (via [[CmsQuery]]) are
  * one-sided: est >= true count always, and est <= true + 2N/w with
  * probability 1 - 2^-d.
  *
  * 100 TB posture: constant 64 KiB state per group, map-side partial
  * aggregation, a single shuffle of sketches — never of rows.
  */
case class CmsSketch(
    child: Expression,
    depth: Int = 4,
    width: Int = 2048,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "cms_sketch"

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      var r = 0
      while (r < depth) {
        val h = XxHash64Function.hash(v, child.dataType, CmsSketch.seed(r))
        buf(r * width + java.lang.Math.floorMod(h, width.toLong).toInt) += 1
        r += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = serialize(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + buf.length * 8)
    bb.putInt(depth).putInt(width)
    var i = 0
    while (i < buf.length) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val d = bb.getInt; val w = bb.getInt
    val buf = new Array[Long](d * w)
    var i = 0
    while (i < buf.length) { buf(i) = bb.getLong; i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object CmsSketch {
  /** Independent row seeds (arbitrary fixed odd constants). */
  def seed(r: Int): Long = 0x9E3779B97F4A7C15L * (2 * r + 1)
}

/** Point query over a serialized [[CmsSketch]]: min over the d counters
  * the value hashes to. Runs once per (group, probe) in the projection
  * ABOVE the aggregation — a cold path, so CodegenFallback is fine; the
  * hot per-row path is the aggregate's imperative update.
  */
case class CmsQuery(sketch: Expression, probe: Expression)
  extends Expression with CodegenFallback {

  override def children: Seq[Expression] = Seq(sketch, probe)
  override def nullable: Boolean = true
  override def dataType: DataType = LongType
  override def prettyName: String = "cms_query"

  override def eval(input: InternalRow): Any = {
    val sk = sketch.eval(input)
    val v = probe.eval(input)
    if (sk == null || v == null) null
    else {
      val bb = ByteBuffer.wrap(sk.asInstanceOf[Array[Byte]])
      val d = bb.getInt; val w = bb.getInt
      var best = Long.MaxValue
      var r = 0
      while (r < d) {
        val h = XxHash64Function.hash(v, probe.dataType, CmsSketch.seed(r))
        val idx = 8 + (r * w + java.lang.Math.floorMod(h, w.toLong).toInt) * 8
        val c = bb.getLong(idx)
        if (c < best) best = c
        r += 1
      }
      best
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(sketch = newChildren(0), probe = newChildren(1))
}
