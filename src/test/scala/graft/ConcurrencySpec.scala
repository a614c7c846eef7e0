package graft

import scala.concurrent.{Await, Future}
import scala.concurrent.duration._
import scala.concurrent.ExecutionContext.Implicits.global

/** Query builders are pure functions over the session — concurrent
  * construction and execution on one shared SparkSession must be safe
  * (the deployment mode on a multi-tenant cluster driver).
  */
class ConcurrencySpec extends SparkSuite {

  test("eight queries run concurrently on one session with stable results") {
    val names = Seq("q_agg_group", "q_join_inner_bhj", "q_win_rank",
      "q_fn_string", "q_text_tokens", "q_vec_norm", "q_filter_cmp",
      "q_stream_tumbling")
    val expected = names.map(n =>
      n -> SparkEntry.queries(n)(spark, sf).count()).toMap
    val futures = names.map { n =>
      Future(n -> SparkEntry.queries(n)(spark, sf).count())
    }
    val results = Await.result(Future.sequence(futures), 120.seconds).toMap
    assert(results === expected)
  }

  test("sink queries at two scale factors run concurrently without clobbering") {
    // sink paths are scoped by sfDir — the same sink query at different
    // SFs must produce its own (serial-identical) result even when the
    // writes interleave on one session
    val sfA = "/root/testdata/sf0.001"
    val sfB = "/root/testdata/sf0.01"
    val serialA = SparkEntry.queries("q_sink_parquet")(spark, sfA)
      .collect().map(_.toSeq).toSeq
    val serialB = SparkEntry.queries("q_sink_parquet")(spark, sfB)
      .collect().map(_.toSeq).toSeq
    val fa = Future(SparkEntry.queries("q_sink_parquet")(spark, sfA)
      .collect().map(_.toSeq).toSeq)
    val fb = Future(SparkEntry.queries("q_sink_parquet")(spark, sfB)
      .collect().map(_.toSeq).toSeq)
    assert(Await.result(fa, 180.seconds) === serialA)
    assert(Await.result(fb, 180.seconds) === serialB)
    assert(serialA !== serialB) // different SFs genuinely differ
  }
}
