package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions._
import graft.expr.SortedIntersectCount

/** The merge-scan intersection-size expression backing the near-dup
  * verifiers. Checked against set semantics (what array_intersect
  * provided) on sorted duplicate-free inputs, through the real Spark
  * plan so the doGenCode path is what executes. */
class SortedIntersectCountSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def viaSpark(a: Seq[Long], b: Seq[Long]): Int = {
    val df = Seq((a, b)).toDF("a", "b")
    df.select(SortedIntersectCount(spark, col("a"), col("b")).as("c"))
      .head.getInt(0)
  }

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(7L + i)))

  test("matches set-intersection size on random sorted long sets") {
    val setGen = Gen.listOf(Gen.chooseNum(-50L, 50L)).map(_.distinct.sorted)
    val pairGen = for { a <- setGen; b <- setGen } yield (a, b)
    for ((a, b) <- samples(pairGen, 8)) {
      assert(viaSpark(a, b) == a.toSet.intersect(b.toSet).size,
        s"a=$a b=$b")
    }
  }

  test("edge shapes: empty, disjoint, identical, containment, extremes") {
    assert(viaSpark(Nil, Nil) == 0)
    assert(viaSpark(Seq(1L, 2L, 3L), Nil) == 0)
    assert(viaSpark(Seq(1L, 3L, 5L), Seq(2L, 4L, 6L)) == 0)
    assert(viaSpark(Seq(1L, 2L, 3L), Seq(1L, 2L, 3L)) == 3)
    assert(viaSpark(Seq(2L), Seq(1L, 2L, 3L)) == 1)
    assert(viaSpark(Seq(Long.MinValue, 0L, Long.MaxValue),
      Seq(Long.MinValue, Long.MaxValue)) == 2)
  }

  test("null array in → null out (BinaryExpression null contract)") {
    val df = Seq((Some(Seq(1L, 2L)), Option.empty[Seq[Long]])).toDF("a", "b")
    val r = df.select(SortedIntersectCount(spark, col("a"), col("b")).as("c")).head
    assert(r.isNullAt(0))
  }

  test("interpreted eval agrees with the codegen path") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, LongType}
    val e = SortedIntersectCount(
      Literal.create(Seq(1L, 4L, 9L), ArrayType(LongType)),
      Literal.create(Seq(2L, 4L, 9L, 11L), ArrayType(LongType)))
    assert(e.eval(null) == 2)
    assert(viaSpark(Seq(1L, 4L, 9L), Seq(2L, 4L, 9L, 11L)) == 2)
  }

  test("wrong input type is a plan-time analysis error") {
    val df = Seq((Seq("x"), Seq(1L))).toDF("a", "b")
    intercept[Exception] {
      df.select(SortedIntersectCount(spark, col("a"), col("b"))).head
    }
  }
}
