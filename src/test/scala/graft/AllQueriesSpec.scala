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
      // r12 lesson: the only two driver-hash failures in r10/r11 were the
      // only two queries emitting DECIMAL output columns — the driver's
      // decimal canonicalization diverges from the local replica's, so
      // final outputs must be int/double/string/bool/date/time only.
      // Complex types are the r6 lesson (driver's pandas sort dies on
      // unhashable arrays): serialize through array_join before emitting.
      import org.apache.spark.sql.types._
      val banned = df.schema.fields.collect {
        case f if f.dataType.isInstanceOf[DecimalType] ||
          f.dataType.isInstanceOf[ArrayType] ||
          f.dataType.isInstanceOf[MapType] ||
          f.dataType.isInstanceOf[StructType] =>
          s"${f.name}:${f.dataType.simpleString}"
      }
      assert(banned.isEmpty,
        s"output schema carries driver-hash-unsafe column types: " +
          banned.mkString(", "))
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
