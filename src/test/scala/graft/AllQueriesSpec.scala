package graft

/** One generated spec per registered operator (the builder contract's
  * "spec per operator"): every query must execute at sf0.001, produce
  * rows, carry unique column names, and be deterministic across two
  * plans+executions — the property the driver's hash-compare gate
  * depends on.
  */
class AllQueriesSpec extends SparkSuite {

  test("every oracle key has a registered query") {
    val orphans = SparkEntry.oracleSql.keySet.diff(SparkEntry.queries.keySet)
    assert(orphans.isEmpty, s"oracle entries without queries: $orphans")
  }

  test("flagship entry returns rows (driver smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name: executes, non-empty, unique columns, deterministic") {
      val df = fn(spark, sf)
      val names = df.schema.fieldNames
      assert(names.toSet.size === names.length,
        s"duplicate column names: ${names.mkString(",")}")
      val first = df.collect()
      assert(first.nonEmpty, "query returned no rows at sf0.001")
      val second = fn(spark, sf).collect()
      assert(first.length === second.length)
      val d = first.iterator.zip(second.iterator).zipWithIndex
        .find { case ((a, b), _) => a.toString != b.toString }
      assert(d.isEmpty,
        s"nondeterministic at row ${d.map(_._2).getOrElse(-1)}: " +
          s"${d.map(_._1).getOrElse("")}")
    }
  }
}
