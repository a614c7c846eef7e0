package graft

import org.scalacheck.{Prop, Properties}
import org.scalacheck.Prop.{forAll, propBoolean}
import graft.engine.Multimodal
import graft.engine.functions.KmvDistinct

/** Generative (ScalaCheck) properties over the engine's pure primitives:
  * sketch buffer algebra and the multimodal decoder stub (SURVEY §5.2.3).
  */
object SketchProps extends Properties("sketches") {

  private val kmv = KmvDistinct(
    org.apache.spark.sql.catalyst.expressions.Literal(1L), k = 64)

  private def buf(xs: Seq[Long]) = {
    val b = kmv.createAggregationBuffer()
    xs.foreach { x => b.add(x); if (b.size > 64) b.remove(b.last()) }
    b
  }

  property("serde roundtrip preserves the buffer") = forAll {
    (xs: List[Long]) =>
      val b = buf(xs)
      kmv.deserialize(kmv.serialize(b)) == b
  }

  property("merge equals building from the concatenation") = forAll {
    (a: List[Long], b: List[Long]) =>
      val merged = kmv.merge(buf(a), buf(b))
      merged == buf(a ++ b)
  }

  property("merge is commutative") = forAll { (a: List[Long], b: List[Long]) =>
    kmv.merge(buf(a), buf(b)) == kmv.merge(buf(b), buf(a))
  }

  property("eval is exact below k distinct values") = forAll {
    (xs: Set[Long]) =>
      (xs.size < 64) ==>
        (kmv.eval(buf(xs.toSeq)).asInstanceOf[Long] == xs.size.toLong)
  }

  property("jpeg constant-block images decode exactly for any byte value") =
    forAll { (seed: Int) =>
      val vals = Array(seed & 0xff, (seed >> 8) & 0xff,
        (seed >> 16) & 0xff, (seed >> 24) & 0xff)
      val gray = new Array[Byte](16 * 16)
      for (y <- 0 until 16; x <- 0 until 16)
        gray(y * 16 + x) = vals((y / 8) * 2 + (x / 8)).toByte
      val (w, h, nc, out) =
        graft.engine.Jpeg.decode(graft.engine.Jpeg.encodeGray(16, 16, gray))
      w == 16 && h == 16 && nc == 1 && java.util.Arrays.equals(out, gray)
    }
}
