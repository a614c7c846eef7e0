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
