package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shared localCheckpoint hygiene for the iterative operators (connected
  * components, Lloyd iterations, BPE merges, the hourly-series frames) —
  * factored here so Analytics / Events / Text / Vectors share one copy.
  */
object Checkpoints {

  /** Unpersist the materialized blocks behind a localCheckpoint'd frame.
    * A local checkpoint's plan is a LogicalRDD leaf wrapping the persisted
    * RDD directly, so unpersisting that RDD frees the executor storage the
    * checkpoint pinned. Safe to call on frames from a stopped session.
    */
  def free(df: DataFrame): Unit =
    try df.queryExecution.analyzed.foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(false)
      case _ => ()
    } catch { case _: Throwable => () }

  /** Pinned localCheckpoint frames, keyed per variant+fixture: the FINAL
    * frame of an invocation must stay pinned — the returned DataFrame
    * reads its blocks lazily, after the builder returns. Each invocation
    * frees the previous invocation's frame under the same slot, capping
    * steady-state checkpoint storage at one small frame per slot no
    * matter how many times a query runs (the bench runs each 6+ times in
    * one session).
    */
  private val pinnedFrames =
    new scala.collection.concurrent.TrieMap[String, DataFrame]()

  /** Pin `df` under `slot`, freeing whatever was pinned there before —
    * unless the evicted frame belongs to a DIFFERENT live session (two
    * concurrent sessions sharing a fixture dir must not unpersist each
    * other's blocks while the first may still lazily read them; ADVICE
    * r13). A frame from a stopped session is always freed. Returns `df`
    * for chaining.
    */
  def pin(slot: String, df: DataFrame): DataFrame = {
    pinnedFrames.put(slot, df).foreach { old =>
      val oldSession = old.sparkSession
      if ((oldSession eq df.sparkSession) ||
          oldSession.sparkContext.isStopped) free(old)
    }
    df
  }

  /** When set (any non-empty value), memo() rebuilds on every invocation
    * instead of serving the session-cached frame — so a timing run
    * measures the cold derivation the query label implies, not a read of
    * materialized blocks. Bench medians published in SURVEY §6 state
    * which regime they were measured under (ADVICE r13).
    */
  private def bypass: Boolean =
    sys.env.get("SPARK_GRAFT_MEMO_BYPASS").exists(_.nonEmpty)

  /** Memoized pin: return the frame already pinned under this session's
    * `slot` when the session is still live, else build, pin, and return.
    * For deterministic input frames shared across queries and bench reps
    * (the graph family's support-edge list, the HITS purchase edges):
    * the frame is a pure function of the fixture, so within one session
    * every invocation after the first reads the materialized blocks
    * instead of re-deriving the join/agg chain.
    *
    * The memo key includes the session identity, so two LIVE sessions
    * sharing a fixture dir each get their own slot and never evict each
    * other (ADVICE r13); entries whose session has stopped are swept and
    * freed on the next memo() call from any session. Slots embed the
    * dataset path — a fixture regenerated IN-PLACE mid-session would be
    * served stale, a scenario the harness never produces (fixtures are
    * driver-generated before the round); restart the session after any
    * manual regeneration.
    */
  def memo(slot: String, s: SparkSession)(build: => DataFrame): DataFrame = {
    // sweep memo entries owned by stopped sessions (cross-suite runs)
    pinnedFrames.foreach { case (k, df) =>
      if (k.contains('@') && df.sparkSession.sparkContext.isStopped &&
          pinnedFrames.remove(k, df)) free(df)
    }
    val key = slot + "@" + java.lang.System.identityHashCode(s).toHexString
    // bypass still pins (frees the previous rep's blocks) but rebuilds
    if (bypass) return pin(key, build)
    pinnedFrames.get(key) match {
      case Some(df)
          if (df.sparkSession eq s) && !s.sparkContext.isStopped =>
        df
      case _ => pin(key, build)
    }
  }

  /** Memo-style read of a pin()-managed slot: the pinned frame, when it
    * belongs to the LIVE session `s` and bypass is off. For builders
    * that pin MULTIPLE co-derived frames per fixture (the BPE walk's
    * merges+vocab pair) and want to serve them across invocations with
    * the same guard memo() applies to its own slots.
    */
  def serving(slot: String, s: SparkSession): Option[DataFrame] =
    if (bypass) None
    else pinnedFrames.get(slot).filter(df =>
      (df.sparkSession eq s) && !s.sparkContext.isStopped)

  /** Per-slot storage ledger: bytes of persisted blocks behind each frame
    * currently pinned by `s` (memory + disk, from the driver's
    * RDDStorageInfo). Emitted into bench telemetry so a future memo
    * addition that pins a fact-scale frame is caught at the bench, not
    * at 100 TB.
    */
  def storageBySlot(s: SparkSession): Map[String, Long] = {
    val sizes = s.sparkContext.getRDDStorageInfo
      .map(i => i.id -> (i.memSize + i.diskSize)).toMap
    pinnedFrames.toMap.collect {
      case (k, df) if df.sparkSession eq s =>
        val bytes = df.queryExecution.analyzed.collect {
          case lr: org.apache.spark.sql.execution.LogicalRDD =>
            sizes.getOrElse(lr.rdd.id, 0L)
        }.sum
        // drop the per-session suffix — entries are already filtered to s
        val at = k.lastIndexOf('@')
        (if (at >= 0) k.substring(0, at) else k) -> bytes
    }
  }
}
