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

  test("tdigest: quantiles of a known uniform distribution within 1% rank error") {
    val t = new graft.sketch.TDigest(100.0)
    // deterministic permutation of 1..100000 (worst case is sorted input,
    // so feed a scrambled order like a shuffle would)
    val n = 100000
    (0 until n).foreach(i => t.add(((i.toLong * 48271) % n).toDouble))
    for (q <- Seq(0.01, 0.05, 0.25, 0.5, 0.75, 0.95, 0.99)) {
      val est = t.quantile(q)
      // uniform on [0, n): value error = rank error · n
      assert(math.abs(est - q * n) <= 0.01 * n, s"q=$q est=$est")
    }
    // bounded size: a 100k-point digest keeps O(compression) centroids
    assert(t.centroidCount < 200, s"centroids=${t.centroidCount}")
    // cdf inverts quantile within the same band
    assert(math.abs(t.cdf(n / 2.0) - 0.5) <= 0.01)
    // serialization round-trips exactly
    val back = graft.sketch.TDigest.deserialize(t.serialize())
    assert(back.quantile(0.5) == t.quantile(0.5))
    assert(back.centroidCount == t.centroidCount)
  }

  test("tdigest edge ranks: duplicated minimum carries mass, empty digest serializes") {
    val t = new graft.sketch.TDigest(100.0)
    Seq(1.0, 1.0, 1.0, 5.0).foreach(t.add(_))
    // pre-fix cdf(min) returned 0.0 regardless of the mass sitting there
    assert(t.cdf(1.0) > 0.2, s"cdf(min)=${t.cdf(1.0)}")
    assert(t.cdf(0.5) == 0.0 && t.cdf(6.0) == 1.0)
    // empty digest: serialize/deserialize round-trips, quantile is NaN
    val e = new graft.sketch.TDigest(100.0)
    val back = graft.sketch.TDigest.deserialize(e.serialize())
    assert(back.centroidCount == 0 && back.quantile(0.5).isNaN)
  }

  test("tdigest extractors null out on malformed binary (invalid-input convention)") {
    // truncated, wrong-length, corrupt-n, and garbage inputs must all
    // parse to None — the extractors are user-callable on ANY binary
    // column, so a BufferUnderflow/huge-allocation crash is a task
    // failure the registry convention forbids
    import graft.sketch.TDigest
    val good = { val t = new TDigest(100.0); t.add(1.0); t.add(2.0); t.serialize() }
    assert(TDigest.tryDeserialize(null).isEmpty)
    assert(TDigest.tryDeserialize(Array[Byte]()).isEmpty)
    assert(TDigest.tryDeserialize(good.take(7)).isEmpty)     // truncated header
    assert(TDigest.tryDeserialize(good.take(25)).isEmpty)    // truncated payload
    assert(TDigest.tryDeserialize(good ++ Array[Byte](1)).isEmpty) // trailing junk
    val corruptN = good.clone(); corruptN(0) = 0x7f.toByte   // n = ~2^31
    assert(TDigest.tryDeserialize(corruptN).isEmpty)
    assert(TDigest.tryDeserialize(good).nonEmpty)
    // round-trip totality: any compression the public constructor
    // accepts must parse back (validation bounds PARSING, not params)
    val big = new TDigest(2e6); big.add(1.0)
    assert(TDigest.tryDeserialize(big.serialize()).nonEmpty)
    // KQL surface: null out, never throw
    val r = Kql.run(spark,
      """print p = percentile_tdigest(substring('abc', 0, 2), 50),
               q = rank_tdigest('garbage-bytes', 1.0)""", cat).head
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("percentiles_array_tdigest: one sketch, many extractions, ordered") {
    val r = Kql.run(spark,
      """lineitem
        | summarize td = tdigest(l_extendedprice)
        | project ps = percentiles_array_tdigest(td, 5, 50, 95)""",
      cat).head.getSeq[Double](0)
    assert(r.length == 3)
    assert(r(0) < r(1) && r(1) < r(2)) // quantile function is monotone
  }

  test("tdigest merge of shard sketches matches the single-digest quantiles") {
    val n = 60000
    val full = new graft.sketch.TDigest(100.0)
    val shards = Array.fill(8)(new graft.sketch.TDigest(100.0))
    (0 until n).foreach { i =>
      val v = ((i.toLong * 16807) % n).toDouble
      full.add(v); shards(i % 8).add(v)
    }
    val merged = new graft.sketch.TDigest(100.0)
    shards.foreach(merged.mergeIn)
    for (q <- Seq(0.05, 0.5, 0.95)) {
      // both within 1% rank of truth ⇒ within 2% of each other; assert
      // each against truth directly (uniform ⇒ value ≈ rank · n)
      assert(math.abs(full.quantile(q) - q * n) <= 0.01 * n)
      assert(math.abs(merged.quantile(q) - q * n) <= 0.01 * n)
    }
  }

  test("tdigest KQL surface: build, merge, extract within 1 exact percentile band") {
    // per-status sketches merged to a global one; p50/p95 vs the exact
    // percentile — rank tolerance 1% of rows translated through the
    // empirical distribution via a two-sided value band from exact
    // neighbor percentiles
    val r = Kql.run(spark,
      """lineitem
        | summarize td = tdigest(l_extendedprice) by l_returnflag
        | summarize m = tdigest_merge(td)
        | project p50 = percentile_tdigest(m, 50), r = rank_tdigest(m, toscalar(
            lineitem | summarize percentile(l_extendedprice, 50)))""",
      cat).head
    val exact = Kql.run(spark,
      """lineitem | summarize lo = percentile(l_extendedprice, 49),
            mid = percentile(l_extendedprice, 50), hi = percentile(l_extendedprice, 51)""",
      cat).head
    val (p50, rank) = (r.getDouble(0), r.getDouble(1))
    assert(p50 >= exact.getDouble(0) && p50 <= exact.getDouble(2),
      s"p50=$p50 not in [${exact.getDouble(0)}, ${exact.getDouble(2)}]")
    assert(math.abs(rank - 50.0) <= 1.5, s"rank of exact median = $rank")
  }
}
