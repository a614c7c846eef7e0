package graft

import org.apache.spark.sql.functions._

/** Hand-computed expectation spot checks (SURVEY §5.2.1): exact rows pinned
  * from the deterministic seed=42 fixtures, independent of the DuckDB
  * oracle path.
  */
class ExpectationSpec extends SparkSuite {

  test("cross join emits |region| x |nation| ordered pairs") {
    val rows = SparkEntry.queries("q_join_cross")(spark, sf).collect()
    assert(rows.length === 5 * 25)
    assert(rows.head.getString(0) === "AFRICA")
    assert(rows.head.getString(1) === "NATION_0")
    assert(rows.last.getString(0) === "MIDDLE EAST")
  }

  test("sequence generator yields triangular row count") {
    val rows = SparkEntry.queries("q_udtf_generator")(spark, sf).collect()
    assert(rows.length === (1 to 5).sum) // r_regionkey 0..4 -> 1+2+3+4+5
    // AFRICA has r_regionkey 0 -> exactly one row, i = 0
    assert(rows.count(_.getString(0) == "AFRICA") === 1)
    assert(rows.find(_.getString(0) == "AFRICA").get.getInt(1) === 0)
  }

  test("projection computes exact values for customer 0") {
    val r = SparkEntry.queries("q_project")(spark, sf)
      .filter(col("c_custkey") === 0).collect().head
    assert(r.getString(1) === "CUSTOMER#000000000")
    assert(r.getDouble(2) === 2095.23 * 1.1) // IEEE-exact same expression
    assert(r.getString(3) === "FURNITURE/Customer#000000000")
  }

  test("decimal arithmetic computes exact cents for order 0") {
    val r = SparkEntry.queries("q_fn_decimal")(spark, sf)
      .filter(col("o_orderkey") === 0).collect().head
    // arithmetic is decimal-exact internally; final columns are DOUBLE
    // (BIGINT for whole) so both engines emit one canonical form
    assert(r.getDouble(1) === 144449.04)
    assert(r.getDouble(2) === 288898.08)
    assert(r.getDouble(3) === 144449.045)
    assert(r.getLong(4) === 144449L)
    assert(r.getDouble(5) === 49.04)
  }

  test("validation report flags the suspicious-total rule correctly") {
    val flagged = SparkEntry.queries("q_validate_rules")(spark, sf)
    val expensive = graft.engine.Tables.orders(spark, sf)
      .filter(col("o_totalprice") > 400000).count()
    assert(flagged.filter(col("violations")
      .contains("suspicious_total")).count() === expensive)
  }
}
