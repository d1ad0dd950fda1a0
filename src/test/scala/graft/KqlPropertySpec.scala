package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.kql.{Kql, Catalog}

/** Property-style tests over the engine (SURVEY.md §5.2-3), driven by
  * ScalaCheck generators sampled with a fixed seed (each case is a full
  * Spark job, so we keep 5 cases per property and stay deterministic —
  * the scalatest+scalacheck bridge artifact isn't in the offline cache).
  */
class KqlPropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private lazy val cat = Catalog(spark, TestSpark.sfDir)

  private val smallList = Gen.nonEmptyListOf(Gen.chooseNum(-100L, 100L))

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  private def dt(vals: Seq[Long]): String =
    s"datatable(x:long) [${vals.mkString(", ")}]"

  test("two-phase global windows ≡ naive single-partition windows (random data)") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    val gen = Gen.listOfN(37, Gen.chooseNum(-50L, 50L))
    for (vals <- samples(gen, 5)) {
      val rows = vals.zipWithIndex.map { case (v, ix) => (ix.toLong, v / 5) }
      val q = s"datatable(id:long, v:long) [${rows.map(r => s"${r._1}, ${r._2}").mkString(", ")}]" +
        " | sort by v desc, id asc" +
        " | extend rn = row_number(), rk = row_rank_min(v), dk = row_rank_dense(v)," +
        "   pv = prev(v), nx = next(v), cs = row_cumsum(v)," +
        "   nt = ntile(3), pr = round(percent_rank(), 8)" +
        " | sort by id asc" +
        " | project id, rn, rk, dk, pv, nx, cs, nt, pr"
      val got = Kql.run(spark, q, cat).collect().map(_.toSeq).toSeq
      val w = Window.orderBy(desc("v"), asc("id"))
      val exp = rows.toDF("id", "v")
        .withColumn("rn", row_number().over(w).cast("long"))
        .withColumn("rk", rank().over(w).cast("long"))
        .withColumn("dk", dense_rank().over(w).cast("long"))
        .withColumn("pv", lag("v", 1).over(w))
        .withColumn("nx", lead("v", 1).over(w))
        .withColumn("cs", sum("v").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("nt", ntile(3).over(w).cast("long"))
        .withColumn("pr", round(percent_rank().over(w), 8))
        .orderBy("id")
        .select("id", "rn", "rk", "dk", "pv", "nx", "cs", "nt", "pr")
        .collect().map(_.toSeq).toSeq
      assert(got == exp, s"vals=$vals")
    }
  }

  test("where p + where !p partitions the table") {
    for ((vals, i) <- samples(smallList, 5).zipWithIndex) {
      val pivot = -100 + 40 * i
      val base = dt(vals)
      val a = Kql.run(spark, s"$base | where x >= $pivot | count", cat).head.getLong(0)
      val b = Kql.run(spark, s"$base | where not(x >= $pivot) | count", cat).head.getLong(0)
      assert(a + b == vals.length, s"vals=$vals pivot=$pivot")
    }
  }

  test("top n is a prefix of full sort") {
    for ((vals, i) <- samples(smallList, 5).zipWithIndex) {
      val n = 1 + i
      val base = dt(vals)
      val top = Kql.run(spark, s"$base | top $n by x desc", cat).collect().map(_.getLong(0)).toSeq
      val sorted = Kql.run(spark, s"$base | sort by x desc", cat).collect().map(_.getLong(0)).toSeq
      assert(top == sorted.take(n), s"vals=$vals n=$n")
    }
  }

  test("bin is idempotent, <= input, within step") {
    for ((vals, i) <- samples(smallList, 5).zipWithIndex) {
      val step = 1 + 2 * i
      val rows = Kql.run(spark,
        s"${dt(vals)} | project b1 = bin(x, $step), b2 = bin(bin(x, $step), $step), x", cat).collect()
      rows.foreach { r =>
        assert(r.getLong(0) == r.getLong(1))
        assert(r.getLong(0) <= r.getLong(2))
        assert(r.getLong(2) - r.getLong(0) < step)
      }
    }
  }

  test("summarize count by key sums to total") {
    for (vals <- samples(smallList, 5)) {
      val total = Kql.run(spark,
        s"${dt(vals)} | summarize n=count() by b=bin(x, 7) | summarize s=sum(n)", cat)
        .head.getLong(0)
      assert(total == vals.length)
    }
  }

  test("mv-expand emits exactly sum(array_length) rows") {
    for (vals <- samples(smallList, 5)) {
      val arr = vals.mkString(", ")
      val q =
        s"""datatable(id:long) [1]
           | extend a = pack_array($arr)
           | mv-expand a
           | count"""
      assert(Kql.run(spark, q, cat).head.getLong(0) == vals.length)
    }
  }

  test("innerunique join result is a subset of inner join (per key, one left row)") {
    for ((vals, i) <- samples(smallList, 5).zipWithIndex) {
      val lhs = s"datatable(k:long, v:long) [${vals.flatMap(v => Seq(v % 5, v)).mkString(", ")}]"
      val rhs = s"datatable(k:long, w:long) [0, 10, 1, 11, 2, 12, 3, 13, 4, 14, -1, 15, -2, 16, -3, 17, -4, 18]"
      val inner = Kql.run(spark, s"$lhs | join kind=inner ($rhs) on k | count", cat).head.getLong(0)
      val iu = Kql.run(spark, s"$lhs | join kind=innerunique ($rhs) on k | count", cat).head.getLong(0)
      assert(iu <= inner)
      // innerunique keeps exactly one left row per matched key
      val keys = Kql.run(spark,
        s"$lhs | join kind=inner ($rhs) on k | distinct k | count", cat).head.getLong(0)
      assert(iu == keys)
    }
  }

  test("make_set equals sorted distinct of make_list") {
    for (vals <- samples(smallList, 5)) {
      val r = Kql.run(spark,
        s"${dt(vals)} | summarize s = make_set(x), l = make_list(x)", cat).head
      val set = r.getSeq[Long](0)
      val list = r.getSeq[Long](1)
      assert(set == list.distinct.sorted)
      assert(list.length == vals.length)
    }
  }

  test("activity_engagement: inner <= outer, ratio in (0, 1]") {
    for ((vals, i) <- samples(smallList, 3).zipWithIndex) {
      val rows = vals.zipWithIndex.map { case (v, j) =>
        f"datetime(2024-01-${1 + math.abs(v % 20) + i}%02d 0${j % 10}:00:00), 'u${v % 7}'"
      }
      val q = s"""datatable(ts:datetime, u:string) [${rows.mkString(", ")}]
                 | evaluate activity_engagement(u, ts, 1d, 4d)"""
      Kql.run(spark, q, cat).collect().foreach { r =>
        val (inner, outer, ratio) = (r.getLong(1), r.getLong(2), r.getDouble(3))
        assert(inner >= 1 && inner <= outer, s"vals=$vals")
        assert(ratio > 0 && ratio <= 1.0, s"vals=$vals")
      }
    }
  }

  test("sliding_window_counts: count >= dcount, window sums >= per-bin rows") {
    for ((vals, i) <- samples(smallList, 3).zipWithIndex) {
      val rows = vals.zipWithIndex.map { case (v, j) =>
        f"datetime(2024-02-${1 + math.abs(v % 15) + i}%02d), 'u${v % 5}'"
      }
      val q = s"""datatable(ts:datetime, u:string) [${rows.mkString(", ")}]
                 | evaluate sliding_window_counts(u, ts, 3d, 1d)"""
      val out = Kql.run(spark, q, cat).collect()
      out.foreach { r => assert(r.getLong(1) >= r.getLong(2), s"vals=$vals") }
      // every event lands in exactly lookback/bin = 3 window rows
      assert(out.map(_.getLong(1)).sum == 3L * vals.length, s"vals=$vals")
    }
  }

  test("reduce by: counts partition the table, representative matches its pattern") {
    for (vals <- samples(smallList, 3)) {
      val lits = vals.map(v => s"'item $v of ${math.abs(v) % 3}'").mkString(", ")
      val out = Kql.run(spark,
        s"datatable(s:string) [$lits] | reduce by s", cat).collect()
      assert(out.map(_.getLong(1)).sum == vals.length, s"vals=$vals")
      out.foreach { r =>
        assert(r.getString(2).replaceAll("[0-9]+", "*") == r.getString(0), s"vals=$vals")
      }
    }
  }

  test("graph-match 2-hop ≡ manual self-join (random edge lists)") {
    import org.apache.spark.sql.functions._
    val gen = Gen.listOfN(40,
      Gen.zip(Gen.chooseNum(0, 9), Gen.chooseNum(0, 9)))
    for (edges <- samples(gen, 5)) {
      val rows = edges.map { case (a, b) => s"'n$a', 'n$b'" }.mkString(", ")
      val q = s"datatable(src:string, dst:string) [$rows]" +
        " | make-graph src --> dst" +
        " | graph-match (a)-[e1]->(b)-[e2]->(c) project aid = a.id, bid = b.id, cid = c.id" +
        " | sort by aid asc, bid asc, cid asc"
      val got = Kql.run(spark, q, cat).collect().map(_.toSeq).toSeq
      val e = edges.map { case (a, b) => (s"n$a", s"n$b") }
      val want = (for {
        (a1, b1) <- e
        (a2, b2) <- e
        if b1 == a2
      } yield Seq(a1, b1, b2)).sortBy(s => (s(0), s(1), s(2)))
      assert(got == want)
    }
  }

  test("sequence_detect ≡ brute force on random event streams") {
    val gen = Gen.listOfN(30, Gen.zip(Gen.chooseNum(0, 3), Gen.chooseNum(0L, 50L), Gen.oneOf("a", "b")))
    for (evs0 <- samples(gen, 5)) {
      // distinct (key, ts) so both sides agree on ties
      val evs = evs0.groupBy(e => (e._1, e._2)).map(_._2.head).toSeq.sortBy(e => (e._1, e._2))
      val rows = evs.map { case (k, t, ty) =>
        s"$k, datetime(2024-01-01 00:00:${"%02d".format(t % 60)}.${"%03d".format(t)}), '$ty'" }
      val q = s"datatable(k:long, ts:datetime, ty:string) [${rows.mkString(", ")}]" +
        " | evaluate sequence_detect(ts, 10s, 20s, ty == 'a', ty == 'b', k)"
      val got = Kql.run(spark, q, cat).collect()
        .map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getTimestamp(2).getTime))
        .toSet
      // brute force: per 'a' event, earliest 'b' in (t, t+10s]; span 20s
      val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
      def ms(t: Long) = base + (t % 60) * 1000 + t // matches the literal above
      val want = (for {
        (k, ta, "a") <- evs
        cands = evs.filter { case (k2, tb, ty2) =>
          k2 == k && ty2 == "b" && ms(tb) > ms(ta) && ms(tb) <= ms(ta) + 10000 }
        if cands.nonEmpty
        tb = cands.map(c => ms(c._2)).min
        if tb - ms(ta) <= 20000
      } yield (k, ms(ta), tb)).toSet
      assert(got == want)
    }
  }

  test("percentilew ≡ reference weighted nearest-rank (random data)") {
    val gen = Gen.listOfN(25, Gen.zip(Gen.chooseNum(-20L, 20L), Gen.chooseNum(1L, 5L)))
    for (pairs <- samples(gen, 5); p <- Seq(25, 50, 90)) {
      val rows = pairs.map { case (x, w) => s"$x, $w" }.mkString(", ")
      val got = Kql.run(spark,
        s"datatable(x:long, w:long) [$rows] | summarize r = percentilew(x, w, $p)", cat)
        .collect().head.getDouble(0)
      val sorted = pairs.sortBy(_._1)
      val total = pairs.map(_._2).sum
      val target = math.ceil(p / 100.0 * total)
      var cum = 0L
      val want = sorted.find { case (_, w) => cum += w; cum >= target }.get._1.toDouble
      assert(got == want, s"p=$p pairs=$pairs")
    }
  }

  test("graph-shortest-paths ≡ Floyd–Warshall hop counts (random graphs)") {
    val gen = Gen.listOfN(25, Gen.zip(Gen.chooseNum(0, 7), Gen.chooseNum(0, 7)))
    for (edges0 <- samples(gen, 5)) {
      val edges = edges0.distinct.filter { case (a, b) => a != b }
      if (edges.nonEmpty) {
        val rows = edges.map { case (a, b) => s"'n$a', 'n$b'" }.mkString(", ")
        val got = Kql.run(spark,
          s"datatable(src:string, dst:string) [$rows]" +
            " | make-graph src --> dst" +
            " | graph-shortest-paths (s)-[e*1..7]->(t) project sid = s.id, tid = t.id, hops = array_length(e)",
          cat).collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
        // Floyd–Warshall over hop counts, capped at 7
        val inf = 99
        val dist = Array.fill(8, 8)(inf)
        edges.foreach { case (a, b) => dist(a)(b) = math.min(dist(a)(b), 1) }
        for (k <- 0 until 8; a <- 0 until 8; b <- 0 until 8)
          if (dist(a)(k) + dist(k)(b) < dist(a)(b)) dist(a)(b) = dist(a)(k) + dist(k)(b)
        val want = (for {
          a <- 0 until 8; b <- 0 until 8
          if dist(a)(b) <= 7
        } yield (s"n$a", s"n$b", dist(a)(b).toLong)).toSet
        assert(got == want)
      }
    }
  }

  test("rolling_percentile ≡ brute-force trailing-window median (random data)") {
    val gen = Gen.listOfN(30, Gen.zip(Gen.chooseNum(0L, 9L), Gen.chooseNum(-50L, 50L)))
    for (evs <- samples(gen, 5)) {
      val rows = evs.map { case (d, v) =>
        s"datetime(2024-01-${"%02d".format(d + 1)} 01:00:00), $v" }.mkString(", ")
      val got = Kql.run(spark,
        s"datatable(ts:datetime, v:long) [$rows] | evaluate rolling_percentile(v, 50, ts, 1d, 3)",
        cat).collect().map(r => (r.getTimestamp(0).toString.take(10), r.getDouble(1))).toMap
      // brute force: for each covered day, exact interpolated median of
      // values in days (day-2 .. day)
      def median(xs: Seq[Long]): Double = {
        val s = xs.sorted.map(_.toDouble)
        val n = s.length
        if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
      }
      val byDay = evs.groupBy(_._1)
      val want = (for {
        day <- 0L to 11L
        window = (day - 2 to day).flatMap(d => byDay.getOrElse(d, Nil)).map(_._2)
        if window.nonEmpty
      } yield (f"2024-01-${day + 1}%02d", median(window))).toMap
      assert(got == want)
    }
  }

  test("chunkDocs covers every token exactly with the declared overlap (random shapes)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val gen = for {
      n <- Gen.chooseNum(1, 60)
      chunk <- Gen.chooseNum(2, 12)
      ov <- Gen.chooseNum(0, chunk - 1)
    } yield (n, chunk, ov)
    for ((n, chunk, ov) <- samples(gen, 8)) {
      val text = (1 to n).map(i => s"t$i").mkString(" ")
      val chunks = graft.ext.LlmOps.chunkDocs(
          Seq((1L, text)).toDF("doc_id", "text"), chunk, ov)
        .orderBy("chunk_idx").collect()
        .map(r => (r.getInt(1), r.getString(3).split(" ").toSeq))
      val stride = chunk - ov
      // chunk k starts at k*stride+1 and is full-size except the tail
      chunks.foreach { case (k, toks) =>
        assert(toks.head == s"t${k * stride + 1}", s"($n,$chunk,$ov) chunk $k start")
        assert(toks.length == math.min(chunk, n - k * stride),
          s"($n,$chunk,$ov) chunk $k length")
      }
      // union of chunk tokens covers 1..n with no gaps
      val covered = chunks.flatMap(_._2).map(_.drop(1).toInt).toSet
      assert(covered == (1 to n).toSet, s"($n,$chunk,$ov) coverage")
      // consecutive chunks share exactly ov tokens (clipped by a short
      // tail: the next chunk can't share more tokens than it has)
      chunks.sliding(2).foreach {
        case Array((_, a), (_, b)) =>
          assert(a.toSet.intersect(b.toSet).size == math.min(ov, b.length),
            s"($n,$chunk,$ov) overlap")
        case _ =>
      }
    }
  }

  test("parser/planner totality: random garbage fails cleanly — message, no NPE/SO/MatchError") {
    val chars = Gen.frequency(
      6 -> Gen.alphaNumChar,
      3 -> Gen.oneOf(Seq(' ', '|', '(', ')', '[', ']', ',', '.', '\'', '"',
        '=', '<', '>', '!', '-', '+', '*', '/', ':')),
      1 -> Gen.oneOf(Seq('\n', '\t')))
    val garbage = Gen.chooseNum(1, 60).flatMap(n =>
      Gen.listOfN(n, chars).map(_.mkString))
    // raw garbage AND garbage grafted onto a valid pipeline head
    val queries = samples(garbage, 40) ++
      samples(garbage, 20).map(g => s"lineitem | where $g") ++
      samples(garbage, 20).map(g => s"lineitem | summarize $g")
    var clean = 0
    for (q <- queries) {
      try { Kql.run(spark, q, cat); clean += 1 }
      catch {
        case e: StackOverflowError => fail(s"stack overflow on: $q")
        case e: NullPointerException => fail(s"NPE on: $q")
        case e: MatchError => fail(s"MatchError on: $q")
        case e: Throwable =>
          assert(e.getMessage != null && e.getMessage.nonEmpty,
            s"messageless ${e.getClass.getSimpleName} on: $q")
      }
    }
    // sanity: the generator is hostile — most inputs must actually fail
    assert(clean < queries.length / 2)
  }

  test("pagerank ≡ exact integer-micro driver replay on random digraphs") {
    import spark.implicits._
    val edgeGen = Gen.listOfN(25, for {
      a <- Gen.chooseNum(0, 9); b <- Gen.chooseNum(0, 9)
    } yield (s"n$a", s"n$b"))
    // iters=20 on the first case crosses THREE localCheckpoint
    // boundaries (cadence 5) — proves the lineage cap changes nothing
    for (((es0, iters), k) <- samples(edgeGen, 5).zip(Seq(20, 4, 4, 4, 4)).zipWithIndex) {
      val es = es0.distinct
      // label propagation: exact driver replay on the same random graph
      // (iters=6 on the first case crosses the checkpoint boundary)
      val lpIters = if (k == 0) 6 else 3
      val gotLp = graft.kql.GraphOps.labelPropagation(
          es.toDF("s", "d"), lpIters, "s", "d")
        .collect().map(r => r.getString(0) -> ((r.getString(1), r.getLong(2)))).toMap
      val undirected = es.filter(p => p._1 != p._2)
        .flatMap(p => Seq(p, p.swap)).distinct
      val adj = undirected.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
        .withDefaultValue(Seq.empty[String])
      val allNodes = (es.map(_._1) ++ es.map(_._2)).distinct
      var lbl = allNodes.map(n => n -> n).toMap
      for (_ <- 1 to lpIters) {
        lbl = allNodes.map { n =>
          val votes = adj(n).map(lbl).groupBy(identity).view.mapValues(_.size)
          if (votes.isEmpty) n -> n
          else n -> votes.toSeq.minBy(t => (-t._2, t._1))._1
        }.toMap
      }
      val szs = lbl.values.groupBy(identity).view.mapValues(_.size.toLong).toMap
      assert(gotLp == allNodes.map(n => n -> ((lbl(n), szs(lbl(n))))).toMap,
        s"lp case $k")
      graft.ext.LlmOps.releaseCaches()
      val got = graft.kql.GraphOps.pageRank(es.toDF("s", "d"), iters, "s", "d")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      // driver replay with the identical integer operations
      val nodes = (es.map(_._1) ++ es.map(_._2)).distinct
      val outdeg = es.groupBy(_._1).view.mapValues(_.size.toLong).toMap
      var r = nodes.map(_ -> 1000000L).toMap
      for (_ <- 1 to iters) {
        val contrib = scala.collection.mutable.Map.empty[String, Long]
          .withDefaultValue(0L)
        es.foreach { case (a, b) => contrib(b) += r(a) / outdeg(a) }
        r = nodes.map(n => n -> (150000L + 85L * contrib(n) / 100L)).toMap
      }
      assert(got == r, s"case $k (iters=$iters)")
      graft.ext.LlmOps.releaseCaches()
    }
  }

  test("hits ≡ exact integer-micro driver replay on random digraphs") {
    import spark.implicits._
    val edgeGen = Gen.listOfN(25, for {
      a <- Gen.chooseNum(0, 9); b <- Gen.chooseNum(0, 9)
    } yield (s"n$a", s"n$b"))
    // iters=6 on the first case crosses a localCheckpoint boundary
    for (((es0, iters), k) <- samples(edgeGen, 4).zip(Seq(6, 2, 2, 3)).zipWithIndex) {
      val es = es0.distinct
      val got = graft.kql.GraphOps.hits(es.toDF("s", "d"), iters, "s", "d")
        .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      val nodes = (es.map(_._1) ++ es.map(_._2)).distinct
      var h = nodes.map(_ -> 1000000L).toMap
      var a = nodes.map(_ -> 1000000L).toMap
      for (_ <- 1 to iters) {
        val ar = scala.collection.mutable.Map.empty[String, Long]
          .withDefaultValue(0L)
        es.foreach { case (u, v) => ar(v) += h(u) }
        val am = ar.values.max
        a = nodes.map(n => n -> ar(n) * 1000000L / am).toMap
        val hr = scala.collection.mutable.Map.empty[String, Long]
          .withDefaultValue(0L)
        es.foreach { case (u, v) => hr(u) += a(v) }
        val hm = hr.values.max
        h = nodes.map(n => n -> hr(n) * 1000000L / hm).toMap
      }
      assert(got == nodes.map(n => n -> ((h(n), a(n)))).toMap,
        s"hits case $k (iters=$iters)")
      graft.ext.LlmOps.releaseCaches()
    }
  }

  test("connected_components plugin ≡ driver union-find on random graphs") {
    import spark.implicits._
    val edgeGen = Gen.listOfN(14, for {
      a <- Gen.chooseNum(0, 11); b <- Gen.chooseNum(0, 11)
    } yield (f"v$a%02d", f"v$b%02d"))
    for ((es0, k) <- samples(edgeGen, 5).zipWithIndex) {
      val es = es0.distinct
      val got = graft.kql.GraphOps.components(es.toDF("s", "d"), "s", "d")
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
      val nodes = (es.map(_._1) ++ es.map(_._2)).distinct
      val parent = scala.collection.mutable.Map(nodes.map(n => n -> n): _*)
      def find(x: String): String =
        if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
      es.foreach { case (a, b) => parent(find(a)) = find(b) }
      val byRoot = nodes.groupBy(find)
      val want = byRoot.values.flatMap { members =>
        val rep = members.min; members.map(m => (m, rep, members.size.toLong))
      }.toSet
      assert(got == want, s"case $k")
      graft.ext.LlmOps.releaseCaches()
    }
  }

  test("triangleCount ≡ driver brute-force triangle enumeration on random graphs") {
    import spark.implicits._
    val edgeGen = Gen.listOfN(30, for {
      a <- Gen.chooseNum(0, 11); b <- Gen.chooseNum(0, 11)
    } yield (f"v$a%02d", f"v$b%02d"))
    for ((es0, k) <- samples(edgeGen, 5).zipWithIndex) {
      val es = es0.distinct
      val got = graft.kql.GraphOps.triangleCount(es.toDF("s", "d"), "s", "d")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val nodes = (es.map(_._1) ++ es.map(_._2)).distinct
      val und = es.filter(p => p._1 != p._2)
        .map(p => if (p._1 < p._2) p else p.swap).distinct.toSet
      def conn(x: String, y: String) =
        und(if (x < y) (x, y) else (y, x))
      val sn = nodes.sorted.toIndexedSeq
      var cnt = nodes.map(_ -> 0L).toMap
      for {
        i <- sn.indices; j <- i + 1 until sn.length; l <- j + 1 until sn.length
        if conn(sn(i), sn(j)) && conn(sn(i), sn(l)) && conn(sn(j), sn(l))
      } Seq(sn(i), sn(j), sn(l)).foreach(v => cnt += v -> (cnt(v) + 1))
      assert(got == cnt, s"case $k")
      graft.ext.LlmOps.releaseCaches()
    }
  }

  test("kCore ≡ driver peeling replay on random graphs") {
    import spark.implicits._
    val edgeGen = Gen.listOfN(26, for {
      a <- Gen.chooseNum(0, 11); b <- Gen.chooseNum(0, 11)
    } yield (f"v$a%02d", f"v$b%02d"))
    for ((es0, k) <- samples(edgeGen, 4).zipWithIndex; kk <- Seq(2, 3)) {
      val es = es0.distinct
      // rounds=6 on the first case crosses the localCheckpoint cadence
      val rounds = if (k == 0) 6 else 3
      val got = graft.kql.GraphOps.kCore(es.toDF("s", "d"), kk, rounds, "s", "d")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      var und = es.filter(p => p._1 != p._2)
        .map(p => if (p._1 < p._2) p else p.swap).distinct
      for (_ <- 1 to rounds) {
        val deg = (und.map(_._1) ++ und.map(_._2))
          .groupBy(x => x).view.mapValues(_.size).toMap
        und = und.filter(p => deg(p._1) >= kk && deg(p._2) >= kk)
      }
      val want = (und.map(_._1) ++ und.map(_._2))
        .groupBy(x => x).view.mapValues(_.size.toLong).toMap
      assert(got == want, s"case $k k=$kk rounds=$rounds")
      graft.ext.LlmOps.releaseCaches()
    }
  }

  test("fuzzyTokenPairs ≡ brute-force lev<=d over random vocabularies (losslessness)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // random words over a 3-letter alphabet concentrate edit-neighbors,
    // exercising substitution/insert/delete collisions hard
    val word = Gen.chooseNum(4, 7).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
    val gen = Gen.listOfN(30, word)
    def lev(a: String, b: String): Int = {
      val dp = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        dp(i)(j) = math.min(math.min(dp(i - 1)(j) + 1, dp(i)(j - 1) + 1),
          dp(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      dp(a.length)(b.length)
    }
    for ((words, k) <- samples(gen, 5).zipWithIndex; maxDist <- Seq(1, 2)) {
      val docs = Seq((k.toLong, words.mkString(" "))).toDF("doc_id", "text")
      val got = graft.ext.LlmOps.fuzzyTokenPairs(docs, minLen = 4,
        maxVocab = 1000, maxDist = maxDist).collect()
        .map(r => (r.getString(0), r.getString(1))).toSet
      val vocab = words.distinct.filter(_.length >= 4)
      val want = (for {
        a <- vocab; b <- vocab if a < b && lev(a, b) <= maxDist
      } yield (a, b)).toSet
      assert(got == want, s"case $k maxDist=$maxDist")
    }
  }

  test("containmentPairs ≡ brute-force shingle containment on random corpora") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val word = Gen.oneOf("aa", "bb", "cc", "dd", "ee", "ff")
    val doc = Gen.chooseNum(3, 12).flatMap(n => Gen.listOfN(n, word))
    val gen = Gen.listOfN(6, doc)
    for ((ds, k) <- samples(gen, 5).zipWithIndex) {
      val docs = ds.zipWithIndex
        .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
        .toDF("doc_id", "text")
      val got = graft.ext.LlmOps.containmentPairs(docs, threshold = 0.3, w = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1),
          r.getAs[Double]("cont_ij"), r.getAs[Double]("cont_ji"))).toSet
      def sh(ws: Seq[String]): Set[Seq[String]] =
        if (ws.length < 3) Set.empty else ws.sliding(3).map(_.toSeq).toSet
      val want = (for {
        i <- ds.indices; j <- ds.indices if i < j
        si = sh(ds(i)); sj = sh(ds(j))
        inter = si.intersect(sj).size if inter > 0
        cij = BigDecimal(inter.toDouble / si.size)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
        cji = BigDecimal(inter.toDouble / sj.size)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
        if cij >= 0.3 || cji >= 0.3
      } yield (i.toLong, j.toLong, cij, cji)).toSet
      assert(got == want, s"case $k")
      graft.ext.LlmOps.releaseCaches()
    }
  }

  test("SortedGramHashes match counts ≡ a string-gram recompute (random docs)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // random token sequences over a tiny alphabet (forces duplicate
    // grams, exercising the multiset min-multiplicity semantics)
    val word = Gen.oneOf("a", "b", "c", "ab", "ba")
    val doc = Gen.listOfN(23, word)
    val pair = for { r <- doc; c <- doc } yield (r, c)
    val cases = samples(Gen.listOfN(8, pair), 3)
    for ((ps, k) <- cases.zipWithIndex) {
      val df = ps.zipWithIndex
        .map { case ((r, c), i) => (i.toLong, r.mkString(" "), c.mkString(" ")) }
        .toDF("doc_id", "ref", "cand")
      val got = graft.ext.LlmOps.bleuScore(df, "ref", "cand")
        .orderBy("doc_id").collect()
        .map(r => (1 to 4).map(n => r.getAs[Long](s"match_$n")))
      def grams(ws: Seq[String], n: Int): Seq[Seq[String]] =
        if (ws.length < n) Seq.empty else ws.sliding(n).map(_.toSeq).toSeq
      val want = ps.map { case (r, c) =>
        (1 to 4).map { n =>
          val rg = grams(r, n).groupBy(identity).view.mapValues(_.size)
          grams(c, n).groupBy(identity).map { case (g, o) =>
            math.min(o.size, rg.getOrElse(g, 0))
          }.sum.toLong
        }
      }
      assert(got.toSeq == want, s"case $k")
    }
  }

  test("two-phase md5 global shuffle ≡ a naive driver-side sort (random ids)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val gen = Gen.listOfN(41, Gen.chooseNum(0L, 5000L)).map(_.distinct)
    for ((ids, k) <- samples(gen, 3).zipWithIndex) {
      val df = ids.map(Tuple1(_)).toDF("doc_id").repartition(5)
      val got = graft.ext.LlmOps.globalShuffle(df, shards = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      def m5(s: String): String = java.security.MessageDigest
        .getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      val want = ids.sortBy(id => (m5(s"42:$id"), id)).zipWithIndex
        .map { case (id, p) => (id, (p % 3).toLong, (p / 3).toLong) }.toSet
      assert(got == want, s"case $k")
    }
  }
}
