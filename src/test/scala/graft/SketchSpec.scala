package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.kql.{Kql, Catalog}

/** Accuracy bounds for the approximate aggregates that have no DuckDB
  * oracle (dcount/HLL), plus series fns on pipeline data. */
class SketchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private lazy val cat = Catalog(spark, TestSpark.sfDir)

  test("dcount estimate within 5% of exact count_distinct") {
    val rows = Kql.run(spark,
      """orders | summarize d = dcount(o_custkey), x = count_distinct(o_custkey) by o_orderstatus
        | sort by o_orderstatus asc""", cat).collect()
    rows.foreach { r =>
      val (est, exact) = (r.getLong(1).toDouble, r.getLong(2).toDouble)
      assert(math.abs(est - exact) / exact <= 0.05, s"dcount $est vs $exact")
    }
  }

  test("hll -> hll_merge -> dcount_hll estimates total distinct users") {
    val est = Kql.run(spark,
      """events | summarize h = hll(user_id) by event_type
        | summarize d = dcount_hll(hll_merge(h))""", cat).head.getLong(0).toDouble
    val exact = Kql.run(spark,
      "events | summarize d = count_distinct(user_id)", cat).head.getLong(0).toDouble
    assert(math.abs(est - exact) / exact <= 0.05, s"hll $est vs $exact")
  }

  test("series_fit_line detects a known slope on a generated ramp") {
    val r = Kql.run(spark,
      """range x from 0 to 99 step 1
        | summarize ys = array_sort_asc(make_list(x * 3 + 7))
        | extend f = series_fit_line(ys)
        | project slope = round(f.slope, 6), icpt = round(f.interception, 6)""", cat).head
    assert(r.getDouble(0) == 3.0 && r.getDouble(1) == 7.0)
  }

  test("row_window_session returns session start; splits on idle gap") {
    val rows = Kql.run(spark,
      """datatable(ts:datetime) [datetime(2024-01-01 10:00:00), datetime(2024-01-01 10:10:00),
                                 datetime(2024-01-01 11:30:00), datetime(2024-01-01 11:40:00)]
        | sort by ts asc
        | extend s = row_window_session(ts, 1d, 30m)
        | summarize n = count() by s
        | sort by s asc""", cat).collect()
    assert(rows.length == 2)
    assert(rows.map(_.getLong(1)).toSeq == Seq(2L, 2L))
    assert(rows.head.getTimestamp(0).toString.startsWith("2024-01-01 10:00:00"))
    assert(rows(1).getTimestamp(0).toString.startsWith("2024-01-01 11:30:00"))
  }

  test("series_fir smooths a constant series to itself") {
    val arr = Kql.run(spark,
      "print m = series_fir(pack_array(5.0, 5.0, 5.0, 5.0), pack_array(1.0, 1.0, 1.0))",
      cat).head.getSeq[Double](0)
    assert(arr.forall(v => math.abs(v - 5.0) < 1e-12))
  }
}
