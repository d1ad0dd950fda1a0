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
}
