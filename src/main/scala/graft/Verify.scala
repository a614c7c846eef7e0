package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    // Estimator-study knobs silently change q_graph_closeness (and the
    // memoized estimate feeding the stability ledger) away from the
    // oracle-matched defaults — a correctness dump under them would
    // diverge from DuckDB with no visible cause. Abort, loudly
    // (ADVICE r14): the knobs stay usable for explicit Bench/Explain
    // estimator studies only.
    val knobs = Seq("SPARK_GRAFT_CENTRALITY_SOURCES",
      "SPARK_GRAFT_CENTRALITY_HOPS", "SPARK_GRAFT_DEDUP_DEMO_BOUND")
      .filter(sys.env.contains)
    if (knobs.nonEmpty) {
      System.err.println(s"[verify] FATAL: ${knobs.mkString(", ")} " +
        "set — estimator/demo-bound overrides break oracle parity by " +
        "design; unset them for a correctness dump")
      sys.exit(2)
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      // register native functions once via extensions so per-query
      // createOrReplaceTempFunction replacement warnings don't fire
      .withExtensions(new graft.engine.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // events.parquet carries nanosecond timestamps (INT64 nanos);
      // surface them as long so Tables.events can DIV to micros exactly.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // warm the session (JIT, codegen, parquet footer caches) so the first
    // dumped query isn't billed several seconds of startup cost
    try SparkEntry.entry(spark).count() catch { case _: Throwable => }
    // Optional comma-separated subset for the per-query pre-declare gate
    // (full dumps stay the default; the driver sets nothing). Unknown
    // names warn loudly instead of silently shrinking the selection.
    val only = sys.env.get("SPARK_GRAFT_VERIFY_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    only.foreach { sel =>
      val unknown = sel.diff(SparkEntry.queries.keySet)
      if (unknown.nonEmpty)
        System.err.println(
          s"[verify] WARNING: unknown names in SPARK_GRAFT_VERIFY_ONLY: " +
            unknown.toSeq.sorted.mkString(", "))
    }
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .foreach { case (name, fn) =>
      try {
        val t0 = System.nanoTime()
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        val rows = spark.read.parquet(s"$outDir/$name").count()
        System.err.println(f"[verify] $name rows=$rows " +
          f"(${(System.nanoTime() - t0) / 1e9}%.1fs)")
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
