package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.engine.Tables

/** r15 optimization guard: q_agg_median_weighted and q_agg_trimmed_mean
  * were rewritten from fact-scale windows PARTITIONed by 3/5-value keys
  * onto two-level (bucket, then crossing-bucket-only) prefix sums. The
  * DuckDB oracle pins result parity at sf0.001/0.01; this spec pins the
  * EQUIVALENCE ARGUMENT itself against the original windowed spelling,
  * computed here as the in-test reference, at both dual-gate SFs — so a
  * future bucket-width or boundary-condition edit that happens to pass one
  * fixture cannot silently drift the kept/crossing row set.
  */
class TwoLevelRewriteSpec extends SparkSuite {
  private val sf01 = "/root/testdata/sf0.01"

  test("q_agg_median_weighted equals the windowed reference at both SFs") {
    for (d <- Seq(sf, sf01)) {
      val ord = Window.partitionBy(col("l_returnflag"))
        .orderBy(col("c"), col("l_orderkey"), col("l_linenumber"))
      val li = Tables.lineitem(spark, d)
        .select(col("l_returnflag"), col("l_orderkey"),
          col("l_linenumber"),
          round(col("l_extendedprice") * 100).cast("long").as("c"),
          col("l_quantity").cast("long").as("q"))
        .select(col("l_returnflag"), col("c"),
          sum(col("q")).over(ord.rowsBetween(Window.unboundedPreceding,
            Window.currentRow)).as("cw"),
          sum(col("q")).over(Window.partitionBy(col("l_returnflag")))
            .as("tw"))
      val ref = li.filter(col("cw") * 2 >= col("tw"))
        .groupBy(col("l_returnflag"))
        .agg(max(col("tw")).as("total_qty"),
          (min(col("c")) / 100.0).cast("double").as("w_median"))
        .orderBy(col("l_returnflag"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      val got = SparkEntry.queries("q_agg_median_weighted")(spark, d)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      assert(got.toSeq === ref.toSeq, s"weighted median diverged at $d")
    }
  }

  test("q_agg_trimmed_mean equals the windowed reference at both SFs") {
    for (d <- Seq(sf, sf01)) {
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("c"), col("o_orderkey"))
      val ranked = Tables.orders(spark, d)
        .select(col("o_orderpriority"),
          round(col("o_totalprice") * 100).cast("long").as("c"),
          col("o_orderkey"))
        .select(col("o_orderpriority"), col("c"),
          row_number().over(w).cast("long").as("rn"),
          count(lit(1)).over(Window.partitionBy(col("o_orderpriority")))
            .as("nn"))
      val k = floor(col("nn") / lit(10)).cast("long")
      val ref = ranked.filter(col("rn") > k && col("rn") <= col("nn") - k)
        .groupBy(col("o_orderpriority"))
        .agg(max(col("nn")).as("n_total"), count(lit(1)).as("n_kept"),
          round(sum(col("c")).cast("double") / 100.0 / count(lit(1))
            + lit(5e-10), 4).as("trimmed_mean"))
        .orderBy(col("o_orderpriority"))
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getDouble(3)))
      val got = SparkEntry.queries("q_agg_trimmed_mean")(spark, d)
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getDouble(3)))
      assert(got.toSeq === ref.toSeq, s"trimmed mean diverged at $d")
    }
  }
}
