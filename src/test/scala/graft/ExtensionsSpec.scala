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
}
