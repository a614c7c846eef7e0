package graft

/** Degenerate-corpus guard for the near-dup composite: a corpus of
  * mass-identical documents must NOT go quadratic. q_dedup_near runs exact
  * dedup first, so every LSH bucket holds pairwise-distinct texts and the
  * per-bucket pair expansion is bounded by the LSH parameters, not by the
  * duplication factor.
  */
class DedupDegenerateSpec extends SparkSuite {
  test("mass-identical corpus stays linear: exact dedup bounds LSH buckets") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_degen").toString
    val same =
      "the quick brown fox jumps over a lazy dog near the river bank today"
    // the same drop-first-token construction the fixture's planted
    // near-duplicates use (jaccard 11/12 vs `same`)
    val near = same.split(" ").drop(1).mkString(" ")
    val docs = (0L until 500L).map(i => (i, same)) :+ (9000L, near)
    docs.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("q_dedup_near")(spark, dir)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // 500 identical copies collapse to representative doc_id 0 and every
    // near-text variant (9000 plus the auto-planted 1000000..1000019
    // copies, all identical) to representative 9000 — so the ONLY
    // surviving near-dup pair is (0, 9000). Without exact-dedup-first
    // this output would be ~125,000 jaccard-1.0 pairs from one bucket.
    assert(out.toSet === Set((0L, 9000L)))
  }
}
