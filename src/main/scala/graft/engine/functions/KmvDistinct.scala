package graft.engine.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{DataType, LongType}

/** KMV (k-minimum-values) distinct-count sketch as a
  * TypedImperativeAggregate (SURVEY §4.3 exception (b): a mergeable sketch
  * beyond approx_count_distinct).
  *
  * The buffer keeps the k smallest distinct xxhash64 values of the input;
  * merge is set-union + trim, so the final state equals the global k
  * smallest regardless of partitioning — the estimate is DETERMINISTIC for
  * a given dataset (unlike sample-order-sensitive sketches), which matters
  * for the engine's reproducibility discipline. Estimate: (k-1)/u_k where
  * u_k is the kth smallest hash mapped to [0,1); exact below k distincts.
  *
  * 100 TB posture: constant 8k-byte state per group, map-side partial
  * aggregation, single shuffle of sketches — never of rows.
  */
case class KmvDistinct(
    child: Expression,
    k: Int = 256,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def prettyName: String = "kmv_distinct"

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def add(buf: java.util.TreeSet[java.lang.Long], h: Long): Unit = {
    // store hashes shifted to signed order = unsigned order of raw hash
    buf.add(h ^ Long.MinValue)
    if (buf.size > k) buf.remove(buf.last())
  }

  override def update(buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, XxHash64Function.hash(v, child.dataType, 42L))
    buf
  }

  override def merge(buf: java.util.TreeSet[java.lang.Long],
      other: java.util.TreeSet[java.lang.Long])
      : java.util.TreeSet[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) {
      buf.add(it.next())
      if (buf.size > k) buf.remove(buf.last())
    }
    buf
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any =
    if (buf.size < k) buf.size.toLong
    else {
      // kth smallest unsigned hash as a fraction of the full hash range
      val kthUnsigned = buf.last() ^ Long.MinValue
      val u = (kthUnsigned >>> 11).toDouble / (1L << 53).toDouble
      math.round((k - 1) / u)
    }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 8)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvDistinct =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvDistinct =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** Shared KMV estimator + serde over the serialized (sorted shifted-hash)
  * form, so sketches built per group can be COMBINED arbitrarily later —
  * the build-once / set-algebra-forever pattern: union = merge-and-trim,
  * intersection = inclusion-exclusion in the projection above.
  */
object Kmv {
  val K = 256

  def estimate(sorted: Array[Long], k: Int = K): Long =
    if (sorted.length < k) sorted.length.toLong
    else {
      val kthUnsigned = sorted(k - 1) ^ Long.MinValue
      val u = (kthUnsigned >>> 11).toDouble / (1L << 53).toDouble
      math.round((k - 1) / u)
    }

  def fromBytes(b: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(b)
    val n = bb.getInt
    val out = new Array[Long](n)
    var i = 0
    while (i < n) { out(i) = bb.getLong; i += 1 }
    out
  }

  /** Union of two serialized sketches: k smallest distinct of the merge —
    * identical to the sketch of the concatenated inputs.
    */
  def unionEstimate(a: Array[Byte], b: Array[Byte], k: Int = K): Long = {
    val merged = (fromBytes(a) ++ fromBytes(b)).distinct.sorted
    estimate(merged.take(k), k)
  }
}

/** `kmv_sketch(x)` — like [[KmvDistinct]] but evaluates to the SERIALIZED
  * sketch rather than the point estimate, so downstream projections can
  * run set algebra over per-group sketches ([[KmvEstimate]] /
  * [[KmvUnionEstimate]]) without touching the raw rows again.
  */
case class KmvSketchAgg(
    child: Expression,
    k: Int = Kmv.K,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

  private val inner = KmvDistinct(child, k)

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType =
    org.apache.spark.sql.types.BinaryType
  override def prettyName: String = "kmv_sketch"

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    inner.createAggregationBuffer()
  override def update(buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] =
    inner.update(buf, input)
  override def merge(buf: java.util.TreeSet[java.lang.Long],
      other: java.util.TreeSet[java.lang.Long])
      : java.util.TreeSet[java.lang.Long] = inner.merge(buf, other)
  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any =
    inner.serialize(buf)
  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] =
    inner.serialize(buf)
  override def deserialize(b: Array[Byte]): java.util.TreeSet[java.lang.Long] =
    inner.deserialize(b)

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** `kmv_est(sketch)` — distinct-count estimate from a serialized sketch. */
case class KmvEstimate(child: Expression)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def dataType: DataType = LongType
  override def prettyName: String = "kmv_est"
  override def nullSafeEval(v: Any): Any =
    Kmv.estimate(Kmv.fromBytes(v.asInstanceOf[Array[Byte]]))
  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(newChild)
}

/** `kmv_union_est(a, b)` — estimated |A ∪ B| from two serialized
  * sketches; |A ∩ B| follows by inclusion-exclusion in plain SQL.
  */
case class KmvUnionEstimate(left: Expression, right: Expression)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def dataType: DataType = LongType
  override def prettyName: String = "kmv_union_est"
  override def nullSafeEval(a: Any, b: Any): Any =
    Kmv.unionEstimate(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(newLeft, newRight)
}
