package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ext.LlmOps

/** r16 kernels: the pinned-RDD training loops' streaming fold
  * ([[LlmOps.foldDocRuns]]) and the Scala twin of the Knuth id hash
  * ([[LlmOps.idHashLong]]) that keeps RDD-side k-means seeding ordered
  * exactly as the DataFrame expression did. */
class R16OpsSpec extends AnyFunSuite {

  test("foldDocRuns: empty, one doc, run boundaries, margin math") {
    val w = Array(1.0, 10.0, 100.0, 0.5)
    def run(rows: (Long, Double, Int, Double)*) =
      LlmOps.foldDocRuns[(Long, Double, Double, Int)](rows.iterator, w,
        (id, y, mg, rs) => (id, y, mg, rs.length)).toList

    assert(run() == Nil)
    // one doc, two features: margin = 2.0·w(0) + 3.0·w(2)
    assert(run((7L, 1.0, 0, 2.0), (7L, 1.0, 2, 3.0)) ==
      List((7L, 1.0, 2.0 + 300.0, 2)))
    // three contiguous runs, including adjacent single-row docs — the
    // run boundary must cut exactly on id change, never on count
    val out = run(
      (1L, 0.0, 1, 1.0),
      (2L, 1.0, 0, 4.0), (2L, 1.0, 3, 2.0),
      (3L, 0.0, 2, 1.0))
    assert(out == List(
      (1L, 0.0, 10.0, 1),
      (2L, 1.0, 4.0 + 1.0, 2),
      (3L, 0.0, 100.0, 1)))
  }

  test("foldDocRuns: buffer reuse does not leak rows across docs") {
    // the internal ArrayBuffer is cleared per run; a doc with FEWER
    // features than its predecessor would read stale tail rows if the
    // clear were missing
    val w = Array(1.0, 1.0, 1.0)
    val out = LlmOps.foldDocRuns[Double](Iterator(
        (1L, 0.0, 0, 1.0), (1L, 0.0, 1, 1.0), (1L, 0.0, 2, 1.0),
        (2L, 0.0, 0, 5.0)), w,
      (_, _, mg, _) => mg).toList
    assert(out == List(3.0, 5.0))
  }

  test("connectedComponents: driver union-find path == forced distributed path") {
    val spark = TestSpark.spark
    import spark.implicits._
    // chains (long diameter), a clique, a self-loop, reversed edges,
    // duplicate edges — the shapes that distinguish sloppy CC variants
    val edges =
      (1L to 40L).map(i => (i, i + 1)) ++          // path 1..41
      Seq((100L, 103L), (103L, 101L), (101L, 102L), (102L, 100L)) ++ // cycle
      Seq((200L, 201L), (201L, 200L), (200L, 201L)) ++ // dup + reversed
      Seq((300L, 300L)) ++                          // self-loop
      Seq((41L, 500L))                              // bridge extends the path
    val df = edges.toDF("i", "j")
    val fast = LlmOps.connectedComponents(df)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val dist = LlmOps.connectedComponentsImpl(df, 50, smallLimit = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(fast == dist)
    // and the labels are the component minima
    assert(fast.filter(_._1 <= 41L).forall(_._2 == 1L))
    assert(fast(300L -> 300L) && fast(500L -> 1L) && fast(100L -> 100L))
  }

  test("idHashLong matches (id * 2654435761) mod 2^32 exactly (BigInt)") {
    val k = BigInt(2654435761L)
    val m = BigInt(4294967296L)
    val ids = Seq(0L, 1L, 2L, 65535L, 65536L, 123456789L,
      4294967295L, 4294967296L, 3470000000L, Long.MaxValue) ++
      (1 to 200).map(i => i.toLong * 2654435761L % Long.MaxValue)
    ids.foreach { id =>
      val expect = (BigInt(id).mod(m) * k).mod(m).toLong
      assert(LlmOps.idHashLong(id) == expect, s"id=$id")
    }
  }
}
