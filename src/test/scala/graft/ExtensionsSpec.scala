package graft

import org.scalatest.funsuite.AnyFunSuite

/** GraftExtensions: the spark.sql.extensions / registerAll integration
  * surface — the codegen kernels become plain SQL functions. */
class ExtensionsSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = TestSpark.spark
    GraftExtensions.registerAll(s)
    s
  }

  test("graft functions register and run in SQL") {
    val r = spark.sql(
      """SELECT graft_dot_product(array(1.0D, 2.0D, 3.0D),
        |                         array(4.0D, 5.0D, 6.0D)) AS dp,
        |       graft_sorted_intersect_count(array(1L, 3L, 5L, 7L),
        |                                    array(3L, 4L, 5L)) AS ic""".stripMargin)
      .head
    assert(r.getDouble(0) == 32.0)
    assert(r.getInt(1) == 2)
  }

  test("sorted gram hashes: sorted, shift-consistent, len<n empty") {
    // the same token subsequence yields the same gram hash wherever it
    // sits, so ["a","b","c"] vs ["x","a","b","c"] share exactly the
    // ("a","b") and ("b","c") bigram identities
    val r = spark.sql(
      """SELECT graft_sorted_gram_hashes(transform(array('a','b','c'), t -> xxhash64(t)), 2) AS g1,
        |       graft_sorted_gram_hashes(transform(array('x','a','b','c'), t -> xxhash64(t)), 2) AS g2,
        |       graft_sorted_gram_hashes(transform(array('a'), t -> xxhash64(t)), 2) AS em""".stripMargin)
      .head
    val g1 = r.getSeq[Long](0); val g2 = r.getSeq[Long](1)
    assert(g1 == g1.sorted && g2 == g2.sorted)
    assert(g1.toSet.subsetOf(g2.toSet) && g2.size == 3 && g1.size == 2)
    assert(r.getSeq[Long](2).isEmpty)
  }

  test("adc score function registers and scores a 1-subspace code") {
    // codes = [1], table = scores for (sub 0: code 0, code 1)
    val r = spark.sql(
      "SELECT graft_adc_score(array(1), array(0.5D, 2.5D), 2) AS sc").head
    assert(r.getDouble(0) == 2.5)
  }

  test("the extensions class injects the same set (builder contract)") {
    // the class delegates to the shared list — a drift guard between
    // the withExtensions path and registerAll
    val ext = new GraftExtensions
    assert(GraftExtensions.functions.map(_._1.funcName).sorted ==
      Seq("graft_adc_score", "graft_dot_product",
        "graft_sorted_gram_hashes", "graft_sorted_intersect_count"))
    assert(ext.isInstanceOf[
      org.apache.spark.sql.SparkSessionExtensions => Unit])
  }
}
