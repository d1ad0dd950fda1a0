package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ext.TemporalOps

class TemporalOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("funnel: steps must complete in order, strictly after the prior step") {
    val ev = Seq(
      // user 1 completes a→b→c in order
      (1L, 10L, "a"), (1L, 20L, "b"), (1L, 30L, "c"),
      // user 2 has b before a: b can only count after its a (t=40)
      (2L, 5L, "b"), (2L, 40L, "a"), (2L, 50L, "b"),
      // user 3 never starts
      (3L, 10L, "b"), (3L, 20L, "c")
    ).toDF("user_id", "ts", "event_type")
    val out = TemporalOps.funnel(ev, "user_id", "ts", Seq(
      "a" -> (col("event_type") === "a"),
      "b" -> (col("event_type") === "b"),
      "c" -> (col("event_type") === "c"))).collect()
      .map(r => r.getLong(0) -> r).toMap

    assert(out(1L).getLong(4) == 3L)                 // steps_completed
    assert(out(1L).getLong(1) == 10L && out(1L).getLong(2) == 20L)
    assert(out(2L).getLong(2) == 50L)                // b at 5 ignored (before a)
    assert(out(2L).isNullAt(3) && out(2L).getLong(4) == 2L)
    assert(!out.contains(3L))                        // no step-1 row at all
  }
}
