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
}
