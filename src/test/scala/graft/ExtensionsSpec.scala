package graft

import org.apache.spark.sql.SparkSession

/** The SparkSessionExtensions injection path: a session built with
  * GraftExtensions can call the native functions from raw SQL without any
  * per-query registration.
  */
class ExtensionsSpec extends SparkSuite {

  test("withExtensions session resolves cosine_sim and kmv_distinct in SQL") {
    // getOrCreate reuses any active/default session and would skip the
    // extensions — clear them so a NEW session (same SparkContext) is built
    // with the extensions applied, then restore the suite session after.
    val orig = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.engine.functions.GraftExtensions)
      .getOrCreate()
    try {
      val cos = s2.sql(
        "SELECT cosine_sim(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c")
        .collect().head.getDouble(0)
      assert(math.abs(cos - 1.0) < 1e-12)
      val kmv = s2.sql(
        "SELECT kmv_distinct(x) FROM (SELECT explode(sequence(1, 100)) x)")
        .collect().head.getLong(0)
      assert(kmv === 100L) // below k -> exact
    } finally {
      // do not stop s2 (shared context); restore the suite session
      SparkSession.setDefaultSession(orig)
      SparkSession.setActiveSession(orig)
    }
  }

  test("similarity-join rewrite: no cartesian, equals the exact spelling") {
    import org.apache.spark.sql.functions._
    graft.engine.functions.GraftFunctions.register(spark)
    // the registry query is written as crossJoin + graft_approx filter;
    // with the rule injected (SparkSuite session) the physical plan must
    // contain an equi-join on the simhash bucket and NO cartesian/BNLJ
    val df = SparkEntry.queries("q_sim_join_rewrite")(spark, sf)
    val physical = df.queryExecution.executedPlan.toString
    assert(!physical.contains("CartesianProduct")
      && !physical.contains("BroadcastNestedLoopJoin"),
      s"rewrite did not fire:\n$physical")
    assert(physical.contains("simhash_bucket"),
      "equi-join key must be the simhash bucket")
    // result equals the exact (marker-free, genuinely cartesian) spelling
    // on this corpus: the only >=0.99 pairs are planted identical copies,
    // which always share the bucket
    val emb = graft.engine.Tables.embeddings(spark, sf)
      .filter(col("vec_id") < 300)
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
    val corpus = emb.unionByName(emb.filter(col("vec_id") < 10)
      .select((col("vec_id") + 1000000L).as("vec_id"), col("v")))
    val a = corpus.select(col("vec_id").as("id_a"), col("v").as("va"))
    val b = corpus.select(col("vec_id").as("id_b"), col("v").as("vb"))
    val exact = a.crossJoin(b)
      .filter(col("id_a") < col("id_b")
        && expr("cosine_sim(va, vb)") >= 0.99)
      .select(col("id_a"), col("id_b"))
      .orderBy(col("id_a"), col("id_b"))
    assert(df.collect().toSeq === exact.collect().toSeq)
    assert(df.count() === 10L, "exactly the ten planted copy pairs")
  }
}
