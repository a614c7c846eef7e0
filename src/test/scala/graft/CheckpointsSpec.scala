package graft

/** Unit pins for the Checkpoints memo semantics (r14, ADVICE r13): the
  * session-keyed slot map must serve a live session's frame without
  * rebuilding, keep two live sessions' slots independent (no cross-
  * session eviction of still-readable blocks), and report the storage
  * ledger only for the asking session.
  */
class CheckpointsSpec extends SparkSuite {
  import graft.engine.Checkpoints

  test("memo builds once per session and serves the pinned frame after") {
    var builds = 0
    def build() = {
      builds += 1
      spark.range(10).toDF("v").localCheckpoint()
    }
    val a = Checkpoints.memo("spec:once", spark)(build())
    val b = Checkpoints.memo("spec:once", spark)(build())
    assert(builds === 1, "second memo() call must not rebuild")
    assert(a eq b, "served frame is the pinned object itself")
    assert(b.count() === 10L)
  }

  test("two live sessions sharing a slot name never evict each other") {
    val s2 = spark.newSession()
    val a = Checkpoints.memo("spec:dual", spark)(
      spark.range(5).toDF("v").localCheckpoint())
    val b = Checkpoints.memo("spec:dual", s2)(
      s2.range(7).toDF("v").localCheckpoint())
    assert(a.sparkSession eq spark)
    assert(b.sparkSession eq s2)
    // the first session's slot survived the second session's build: it
    // is still served without a rebuild AND its blocks are still
    // readable (the ADVICE r13 hazard was free() unpersisting them)
    val a2 = Checkpoints.memo("spec:dual", spark)(
      fail("first session's slot was evicted"))
    assert(a2 eq a)
    assert(a2.count() === 5L)
    assert(b.count() === 7L)
  }

  test("serving()/pin() artifact slots are session-keyed: two live " +
      "sessions sharing a slot name never evict each other (ADVICE r14)") {
    val s2 = spark.newSession()
    val a = Checkpoints.pin("spec:art",
      spark.range(5).toDF("v").localCheckpoint())
    val b = Checkpoints.pin("spec:art",
      s2.range(7).toDF("v").localCheckpoint())
    // each session serves ITS OWN pinned artifact — pre-r15, the second
    // pin replaced the first under the shared raw key, so session 1's
    // serving() read session 2's frame (miss) and re-pinned, ping-pong
    val sa = Checkpoints.serving("spec:art", spark)
    val sb = Checkpoints.serving("spec:art", s2)
    assert(sa.exists(_ eq a), "first session must serve its own pin")
    assert(sb.exists(_ eq b), "second session must serve its own pin")
    // and the first session's blocks are still readable (never freed)
    assert(a.count() === 5L)
    assert(b.count() === 7L)
  }

  test("pin() still evicts and frees the SAME session's previous frame") {
    val first = spark.range(3).toDF("v").localCheckpoint()
    Checkpoints.pin("spec:evict", first)
    val second = Checkpoints.pin("spec:evict",
      spark.range(4).toDF("v").localCheckpoint())
    assert(Checkpoints.serving("spec:evict", spark).exists(_ eq second))
    // the evicted frame's blocks were unpersisted (steady-state cap:
    // one frame per slot per session)
    val firstIds = first.queryExecution.analyzed.collect {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd.id
    }.toSet
    val live = spark.sparkContext.getRDDStorageInfo.map(_.id).toSet
    assert(firstIds.intersect(live).isEmpty,
      "previous same-session pin must be unpersisted on replacement")
  }

  test("storageBySlot reports only the asking session's slots, " +
      "stripped of the session suffix") {
    val s2 = spark.newSession()
    Checkpoints.memo("spec:ledger", spark)(
      spark.range(100).toDF("v").localCheckpoint())
    Checkpoints.memo("spec:ledger2", s2)(
      s2.range(100).toDF("v").localCheckpoint())
    val mine = Checkpoints.storageBySlot(spark)
    assert(mine.contains("spec:ledger"), s"have: ${mine.keys}")
    assert(!mine.contains("spec:ledger2"),
      "other session's slot must not appear")
    assert(mine.keys.forall(!_.contains('@')),
      "ledger keys are session-suffix-free")
  }
}
