package graft

import org.apache.spark.sql.functions._

/** Pins the r14 overflow discipline AT THE SCALE WHERE IT MATTERS: the
  * gate-SF hash parity can only show the fixed spellings are
  * value-identical at small counts — these tests evaluate the actual
  * expression shapes on synthetic count values PAST the int64 wrap
  * points and assert (a) the shipped double/decimal spellings produce
  * the mathematically-correct value there, and (b) the pre-r14 int64
  * spellings FAIL there: under this library's ANSI-on sessions (the
  * Spark 4 default, kept on deliberately — SURVEY §4 — because it
  * matches DuckDB's overflow-error behavior) the old long products
  * throw ARITHMETIC_OVERFLOW at count scale, so the fix converts a
  * guaranteed 100 TB job failure into a correct result. (In a non-ANSI
  * session the same spellings would instead wrap silently and diverge
  * from the erroring oracle — either way, broken.)
  */
class OverflowDisciplineSpec extends SparkSuite {
  import spark.implicits._

  private def ansiOverflow(body: => Any): Boolean =
    try { body; false }
    catch { case e: Throwable =>
      e.toString.contains("ARITHMETIC_OVERFLOW") ||
        Option(e.getCause).exists(_.toString.contains("ARITHMETIC_OVERFLOW"))
    }

  test("KW/Conover tie denominator: double-before-cubing is correct " +
      "past the int64 wrap; the old spelling throws there") {
    // nn = 5e9 events: nn^3 = 1.25e29, far past 2^63 ~ 9.2e18
    val df = Seq((5000000000L, 1000000L)).toDF("nn", "tc")
    val nnD = col("nn").cast("double")
    val shipped = df.select((lit(1.0) - col("tc").cast("double")
      / (nnD * nnD * nnD - nnD)).as("x")).head.getDouble(0)
    // tc/nn^3 = 1e6/1.25e29 ~ 8e-24 -> denominator ~ 1.0 exactly in
    // double precision
    assert(shipped === 1.0,
      s"shipped spelling must be ~1 at this tie fraction, got $shipped")
    assert(ansiOverflow {
      df.select((col("nn") * col("nn") * col("nn") - col("nn")).as("x"))
        .head.getLong(0)
    }, "the int64 spelling must hit ANSI ARITHMETIC_OVERFLOW here")
  }

  test("rank-sum lift: DECIMAL(38,0) carries a1*(2N) products past " +
      "int64; the old long product throws there") {
    // one cents cell holding 4e9 clicks in a 4e9-row corpus:
    // contrib = a1 * (2*cumAll - t + 1) ~ 1.6e19 > 2^63
    val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val df = Seq((4000000000L, 8000000000L)).toDF("a1", "cum2")
    val shipped = df.select((col("a1").cast(dec38)
      * (col("cum2") - col("a1") + 1)).as("x"))
      .head.getDecimal(0)
    val expect = new java.math.BigDecimal(4000000000L)
      .multiply(new java.math.BigDecimal(8000000000L - 4000000000L + 1))
    assert(shipped.compareTo(expect) === 0,
      s"decimal lift must be exact: $shipped vs $expect")
    assert(ansiOverflow {
      df.select((col("a1") * (col("cum2") - col("a1") + 1)).as("x"))
        .head.getLong(0)
    }, "the long spelling must hit ANSI ARITHMETIC_OVERFLOW here")
  }

  test("centered-cusum cross-product: DECIMAL(38,0) carries n*cum - t*tc " +
      "past int64; the old long spelling throws there (r15 lift)") {
    // the changepoint/cusum day walk at fact scale: n = 4000 days,
    // cum = 5e15 cents (a ~5e13-row type at ~100-cent values):
    // n*cum = 2e19 > 2^63 ~ 9.2e18
    val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val df = Seq((4000L, 5000000000000000L, 2000L, 9000000000000000L))
      .toDF("n", "cum", "t", "tc")
    val shipped = df.select((col("n") * col("cum").cast(dec38)
      - col("t") * col("tc").cast(dec38)).as("sdev")).head.getDecimal(0)
    val expect = new java.math.BigDecimal(4000L)
      .multiply(new java.math.BigDecimal(5000000000000000L))
      .subtract(new java.math.BigDecimal(2000L)
        .multiply(new java.math.BigDecimal(9000000000000000L)))
    assert(shipped.compareTo(expect) === 0,
      s"decimal day-walk cross-product must be exact: $shipped vs $expect")
    assert(ansiOverflow {
      df.select((col("n") * col("cum") - col("t") * col("tc")).as("x"))
        .head.getLong(0)
    }, "the int64 day-walk spelling must hit ANSI ARITHMETIC_OVERFLOW here")
  }

  test("OLS moment lift: DECIMAL(38,0) carries rolling i*c and rank " +
      "products past int64 (spearman/elasticity/win_slope class)") {
    val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
    // i = 2e12 rows into a type's stream, c = 50000 cents:
    // i*c = 1e17 fine alone, but the 24-frame sums' cross-products
    // (sx*sy ~ 24i * 24*c*i) and doubled-rank squares (rx^2*nc with
    // rx ~ 2n = 4e9, nc = 1e6 -> 1.6e25) pass 2^63
    val df = Seq((4000000000L, 1000000L)).toDF("rx", "nc")
    val shipped = df.select((col("rx").cast(dec38) * col("rx")
      * col("nc")).as("sxx")).head.getDecimal(0)
    val expect = new java.math.BigDecimal(4000000000L).pow(2)
      .multiply(new java.math.BigDecimal(1000000L))
    assert(shipped.compareTo(expect) === 0,
      s"decimal rank-square moment must be exact: $shipped vs $expect")
    assert(ansiOverflow {
      df.select((col("rx") * col("rx") * col("nc")).as("x"))
        .head.getLong(0)
    }, "the int64 moment spelling must hit ANSI ARITHMETIC_OVERFLOW here")
  }

  test("tie-cube sum: DECIMAL(38,0) carries t^3 past int64") {
    val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
    // a tie group of 3e9 rows: t^3 = 2.7e28
    val df = Seq(3000000000L).toDF("t")
    val shipped = df.select((col("t").cast(dec38) * col("t") * col("t")
      - col("t")).as("x")).head.getDecimal(0)
    val t = new java.math.BigDecimal(3000000000L)
    val expect = t.pow(3).subtract(t)
    assert(shipped.compareTo(expect) === 0,
      s"decimal cube must be exact: $shipped vs $expect")
  }
}
