package graft.engine.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}

/** Bloom-filter membership sketch as a TypedImperativeAggregate (SURVEY
  * §4.3 exception (b)): the 100 TB runtime-filter primitive — build a
  * KB-sized bit set over the join keys of a selective dimension once,
  * broadcast it, and drop non-matching fact rows AT THE SCAN, before the
  * shuffle the exact join would otherwise pay for all rows.
  *
  * The buffer is m bits as Array[Long]; update sets k positions by double
  * hashing (Kirsch–Mitzenmacher: idx_i = h1 + i·h2 mod m, two independent
  * xxhash64 seeds). Merge is bitwise OR — commutative, associative AND
  * idempotent, so the merged filter is byte-identical under any
  * partitioning (stronger than CMS's sum-merge, which is only
  * order-independent). Guarantee is one-sided: a present key always
  * tests true (no false negatives); an absent key tests true with
  * probability ≈ (1 - e^{-kn/m})^k — callers re-verify positives with the
  * exact join, which restores exact semantics (and gives the query its
  * DuckDB oracle).
  *
  * Defaults m=2^19 bits (64 KiB), k=5: for n=50k inserted keys that is
  * m/n ≈ 10.5 → FPR ≈ 0.6%.
  */
case class BloomAgg(
    child: Expression,
    numBits: Int = 1 << 19,
    numHashes: Int = 5,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(Integer.bitCount(numBits) == 1, "numBits must be a power of two")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "bloom_agg"

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](numBits / 64)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h1 = XxHash64Function.hash(v, child.dataType, BloomBits.seedA)
      val h2 = XxHash64Function.hash(v, child.dataType, BloomBits.seedB) | 1L
      var i = 0
      while (i < numHashes) {
        val bit = java.lang.Math.floorMod(h1 + i * h2, numBits.toLong).toInt
        buf(bit >>> 6) |= 1L << (bit & 63)
        i += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) |= other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = serialize(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(12 + buf.length * 8)
    bb.putInt(numBits).putInt(numHashes)
      .putInt(BloomBits.typeTag(child.dataType))
    var i = 0
    while (i < buf.length) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val m = bb.getInt; bb.getInt; bb.getInt
    val buf = new Array[Long](m / 64)
    var i = 0
    while (i < buf.length) { buf(i) = bb.getLong; i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** Static probe helpers shared by the interpreted and generated paths.
  * Operate directly on the serialized bytes with manual offset math — no
  * ByteBuffer allocation per row. (Production note: Spark's own
  * BloomFilterMightContain binds the deserialized filter once per task
  * from a scalar subquery; per-row byte math here is the simpler shape and
  * still ~ns-scale since the header reads are constant-folded by JIT.)
  */
object BloomBits {
  val seedA = 0x9E3779B97F4A7C15L
  val seedB = 0xC2B2AE3D27D4EB4FL

  /** Stable tag for the Catalyst type a sketch was built over, carried in
    * the serialized header. xxhash64 hashes an int and a long to DIFFERENT
    * values, so probing an int-built sketch with a bigint key would yield
    * silent FALSE NEGATIVES — breaking the documented one-sided guarantee
    * the downstream exact join relies on. The probe verifies the tag and
    * fails loudly on mismatch instead.
    */
  def typeTag(dt: DataType): Int = dt.catalogString.hashCode

  private def checkTag(ser: Array[Byte], expected: Int,
      probeType: String): Unit = {
    val tag = readInt(ser, 8)
    if (tag != expected)
      throw new IllegalArgumentException(
        s"bloom_contains: probe type $probeType does not match the type " +
          "the sketch was built over (different types hash differently — " +
          "the test would return silent false negatives); cast the probe " +
          "to the build key's type")
  }

  private def readInt(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xFF) << 24) | ((b(off + 1) & 0xFF) << 16) |
      ((b(off + 2) & 0xFF) << 8) | (b(off + 3) & 0xFF)

  private def readLong(b: Array[Byte], off: Int): Long = {
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (b(off + i) & 0xFFL); i += 1 }
    v
  }

  private def test(ser: Array[Byte], h1: Long, h2odd: Long): Boolean = {
    val m = readInt(ser, 0)
    val k = readInt(ser, 4)
    var i = 0
    while (i < k) {
      val bit = java.lang.Math.floorMod(h1 + i * h2odd, m.toLong).toInt
      if ((readLong(ser, 12 + (bit >>> 6) * 8) & (1L << (bit & 63))) == 0L)
        return false
      i += 1
    }
    true
  }

  private val longTag = typeTag(LongType)

  /** Fast path for long keys (the join-key case) — callable from
    * generated Java with a primitive argument, keeping the probe inside
    * whole-stage codegen.
    */
  def mightContainLong(ser: Array[Byte], v: Long): Boolean = {
    checkTag(ser, longTag, "bigint")
    val h1 = XxHash64Function.hash(v, LongType, seedA)
    val h2 = XxHash64Function.hash(v, LongType, seedB) | 1L
    test(ser, h1, h2)
  }

  /** Generic path: hashes the boxed value under its Catalyst type. */
  def mightContain(ser: Array[Byte], v: Any, dt: DataType): Boolean = {
    checkTag(ser, typeTag(dt), dt.catalogString)
    val h1 = XxHash64Function.hash(v, dt, seedA)
    val h2 = XxHash64Function.hash(v, dt, seedB) | 1L
    test(ser, h1, h2)
  }
}

/** `bloom_contains(sketch, probe)` — membership test against a serialized
  * [[BloomAgg]] sketch. Unlike [[CmsQuery]] this runs on the FACT-TABLE
  * hot path (once per scanned row), so it participates in whole-stage
  * codegen via a static helper call rather than falling back to
  * interpreted eval.
  */
case class BloomContains(sketch: Expression, probe: Expression)
  extends BinaryExpression {

  override def left: Expression = sketch
  override def right: Expression = probe
  override def nullable: Boolean = true
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_contains"

  override def nullSafeEval(s: Any, v: Any): Any =
    BloomBits.mightContain(s.asInstanceOf[Array[Byte]], v, probe.dataType)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val helper = BloomBits.getClass.getName.stripSuffix("$") + "$.MODULE$"
    if (probe.dataType == LongType)
      nullSafeCodeGen(ctx, ev, (s, v) =>
        s"${ev.value} = $helper.mightContainLong($s, $v);")
    else {
      val dtRef = ctx.addReferenceObj("bloomProbeType", probe.dataType)
      nullSafeCodeGen(ctx, ev, (s, v) =>
        s"${ev.value} = $helper.mightContain($s, (Object) $v, $dtRef);")
    }
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(newLeft, newRight)
}
