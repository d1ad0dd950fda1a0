package graft
import org.scalatest.funsuite.AnyFunSuite
import graft.kql.{Kql, Catalog}

/** Physical-plan shape assertions for the graph operators (SURVEY §4.3 /
  * COVERAGE §2.13): pattern hops must be equi-joins — never a cartesian —
  * and small hop sides must broadcast under AQE. */
class GraphPlanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private lazy val cat = Catalog(spark, "/root/testdata/sf0.001")

  test("graph-match chain: equi-join hops, broadcast-eligible, no cartesian") {
    val q = """let E = union
           (customer | project src = strcat('c', c_custkey), dst = strcat('n', c_nationkey)),
           (nation | project src = strcat('n', n_nationkey), dst = strcat('r', n_regionkey));
         E
         | make-graph src --> dst
         | graph-match (c)-[e1]->(n)-[e2]->(r)
           project nid = n.id, rid = r.id
         | summarize n_customers = count() by rid"""
    val plan = Kql.run(spark, q, cat).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(plan.contains("BroadcastHashJoin"))
  }

  test("var-length edge: unbound edge var takes the reachability path (set semantics)") {
    // diamond a->b1->c, a->b2->c: bound edge var enumerates BOTH 2-hop
    // paths; an unbound one collapses to one (a, c, len=2) row per level
    // — the per-level distinct that keeps dense graphs |V|²-bounded
    // instead of out-degree^len (r2/r3 VERDICT scale-killer guard)
    def q(edge: String) =
      s"""datatable(src:string, dst:string)
            ['a','b1', 'a','b2', 'b1','c', 'b2','c']
         | make-graph src --> dst
         | graph-match (x)-[$edge*2..2]->(y)
           where x.id == 'a'
           project xid = x.id, yid = y.id
         | summarize n = count() by xid, yid"""
    val bound = Kql.run(spark, q("e"), cat).collect()
    assert(bound.map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
      == Seq(("a", "c", 2L)))
    val unbound = Kql.run(spark, q(""), cat).collect()
    assert(unbound.map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
      == Seq(("a", "c", 1L)))
    // and the plan really deduplicates: an aggregate under the hop join
    val plan = Kql.run(spark, q(""), cat).queryExecution.optimizedPlan.toString
    assert(plan.contains("Deduplicate") || plan.contains("Aggregate"))
  }

  test("graph-shortest-paths: frontier joins are equi-joins, no cartesian") {
    val q = """let E = union
           (customer | project src = strcat('c', c_custkey), dst = strcat('n', c_nationkey)),
           (nation | project src = strcat('n', n_nationkey), dst = strcat('r', n_regionkey));
         E
         | make-graph src --> dst
         | graph-shortest-paths (s)-[e*1..3]->(t)
           where s.id == 'c1'
           project tid = t.id, hops = array_length(e)"""
    val plan = Kql.run(spark, q, cat).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
  }

  test("pagerank: hand-computed integer-micro rounds, dangling leak, KQL-reachable") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // A→B, A→C, B→C, C→A; outdeg A=2, B=1, C=1; init 1_000_000 each.
    // Round 1: sums A=1e6 (from C), B=5e5, C=1.5e6 ⇒ ranks 1_000_000 /
    // 575_000 / 1_425_000. Round 2: sums A=1_425_000, B=500_000,
    // C=1_075_000 ⇒ 1_361_250 / 575_000 / 1_063_750.
    val e = Seq(("A", "B"), ("A", "C"), ("B", "C"), ("C", "A")).toDF("s", "d")
    val r2 = graft.kql.GraphOps.pageRank(e, 2, "s", "d").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(r2 == Map("A" -> 1361250L, "B" -> 575000L, "C" -> 1063750L))
    graft.ext.LlmOps.releaseCaches()
    // dangling node: B has no outlinks — its mass leaks (documented
    // simplified variant); A keeps only the teleport term
    val dang = graft.kql.GraphOps.pageRank(
      Seq(("A", "B")).toDF("s", "d"), 1, "s", "d").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(dang == Map("A" -> 150000L, "B" -> 1000000L))
    graft.ext.LlmOps.releaseCaches()
    // KQL-reachable with the declared output shape
    val kql = Kql.run(spark,
      """let E = nation | project src = strcat('n', n_nationkey),
                                  dst = strcat('r', n_regionkey);
         E | evaluate pagerank(3, src, dst)""", "/root/testdata/sf0.001")
    assert(kql.columns.toSeq == Seq("id", "rank_micros", "rank"))
    // every region's rank exceeds every nation's (nations only donate)
    val rows = kql.collect().map(r => (r.getString(0), r.getLong(1)))
    val (regions, nations) = rows.partition(_._1.startsWith("r"))
    assert(regions.map(_._2).min > nations.map(_._2).max)
    graft.ext.LlmOps.releaseCaches()
  }

  test("hits: hand-computed integer-micro rounds, pure hub/authority, KQL-reachable") {
    import spark.implicits._
    // A→B, A→C, B→C. Round 1: ar(B)=1e6, ar(C)=2e6, max 2e6 ⇒ a =
    // (0, 500000, 1e6); hr(A)=1.5e6, hr(B)=1e6, max 1.5e6 ⇒ h =
    // (1e6, 666666, 0). Round 2: ar(B)=1e6, ar(C)=1666666 ⇒ a =
    // (0, 600000, 1e6); hr(A)=1.6e6, hr(B)=1e6 ⇒ h = (1e6, 625000, 0).
    val e = Seq(("A", "B"), ("A", "C"), ("B", "C")).toDF("s", "d")
    val r = graft.kql.GraphOps.hits(e, 2, "s", "d").collect()
      .map(x => x.getString(0) -> ((x.getLong(1), x.getLong(2)))).toMap
    assert(r == Map("A" -> ((1000000L, 0L)), "B" -> ((625000L, 600000L)),
      "C" -> ((0L, 1000000L))))
    graft.ext.LlmOps.releaseCaches()
    // KQL-reachable with the declared output shape; customers are pure
    // hubs (auth 0), regions pure authorities (hub 0), nations both
    val kql = Kql.run(spark,
      """let E = union
           (customer | project src = strcat('c', c_custkey), dst = strcat('n', c_nationkey)),
           (nation | project src = strcat('n', n_nationkey), dst = strcat('r', n_regionkey));
         E | evaluate hits(2, src, dst)""", "/root/testdata/sf0.001")
    assert(kql.columns.toSeq ==
      Seq("id", "hub_micros", "auth_micros", "hub", "auth"))
    val rows = kql.collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2)))
    assert(rows.filter(_._1.startsWith("c")).forall(_._3 == 0L))
    assert(rows.filter(_._1.startsWith("r")).forall(_._2 == 0L))
    // max-normalization pins the top hub and top authority at exactly 1e6
    // (the top authority is a NATION — in-degree ≈ customers/nation > 5)
    assert(rows.exists(_._2 == 1000000L) && rows.exists(_._3 == 1000000L))
    assert(rows.filter(_._1.startsWith("n")).exists(_._3 > 0L))
    graft.ext.LlmOps.releaseCaches()
  }

  test("shortestPathsWeighted: relaxation beats greedy, horizon, parallel edges") {
    import spark.implicits._
    // diamond: A→B w10 (direct, heavy) vs A→C w1, C→B w2 (2-hop, light);
    // B→D w1 extends the light path to 3 hops
    val e = Seq(("A", "B", 10L), ("A", "C", 1L), ("C", "B", 2L),
      ("B", "D", 1L)).toDF("s", "d", "w")
    def run(iters: Int) = graft.kql.GraphOps
      .shortestPathsWeighted(e, "A", iters, "s", "d", "w").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // 1 round: only direct edges relaxed
    assert(run(1) == Map("A" -> 0L, "B" -> 10L, "C" -> 1L))
    graft.ext.LlmOps.releaseCaches()
    // 2 rounds: the 2-hop light path wins; D reached through heavy B
    assert(run(2) == Map("A" -> 0L, "B" -> 3L, "C" -> 1L, "D" -> 11L))
    graft.ext.LlmOps.releaseCaches()
    // 3 rounds: D improves through the light chain
    assert(run(3) == Map("A" -> 0L, "B" -> 3L, "C" -> 1L, "D" -> 4L))
    graft.ext.LlmOps.releaseCaches()
    // parallel edges keep the cheapest
    val pe = Seq(("A", "B", 7L), ("A", "B", 3L)).toDF("s", "d", "w")
    assert(graft.kql.GraphOps.shortestPathsWeighted(pe, "A", 1, "s", "d", "w")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap ==
      Map("A" -> 0L, "B" -> 3L))
    graft.ext.LlmOps.releaseCaches()
    // random digraphs: exact replay of the same synchronous relaxation
    val rnd = new scala.util.Random(11)
    val es = (0 until 30).map(_ =>
      (s"n${rnd.nextInt(8)}", s"n${rnd.nextInt(8)}", rnd.nextInt(9).toLong + 1))
      .distinct
    val iters = 6 // crosses several per-round checkpoints
    val got = graft.kql.GraphOps.shortestPathsWeighted(
        es.toDF("s", "d", "w"), "n0", iters, "s", "d", "w").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val minW = es.groupBy(t => (t._1, t._2)).view
      .mapValues(_.map(_._3).min).toMap
    var dist = Map("n0" -> 0L)
    for (_ <- 1 to iters) {
      val relaxed = minW.toSeq.flatMap { case ((a, b), w) =>
        dist.get(a).map(d => b -> (d + w)) }
      dist = (dist.toSeq ++ relaxed).groupBy(_._1).view
        .mapValues(_.map(_._2).min).toMap
    }
    assert(got == dist)
    graft.ext.LlmOps.releaseCaches()
  }

  test("connected_components plugin: disjoint chains, min-id reps, sizes") {
    import spark.implicits._
    // two chains and one self-loop singleton: {a,b,c}, {x,y}, {s}
    val e = Seq(("b", "a"), ("b", "c"), ("x", "y"), ("s", "s")).toDF("s", "d")
    val got = graft.kql.GraphOps.components(e, "s", "d").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).sortBy(_._1)
    assert(got.toSeq == Seq(("a", "a", 3L), ("b", "a", 3L), ("c", "a", 3L),
      ("s", "s", 1L), ("x", "x", 2L), ("y", "x", 2L)))
    graft.ext.LlmOps.releaseCaches()
  }
}
