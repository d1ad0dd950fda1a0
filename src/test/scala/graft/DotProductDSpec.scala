package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions._
import graft.expr.DotProductD

/** The codegen dot-product expression that replaced the r2–r5
  * `dotKernel` UDF on the cosine-verify hot paths (r6). Checked against
  * a driver-side reference through the real Spark plan so doGenCode is
  * what executes; the sequential-sum order must match the old UDF's
  * exactly (same doubles ⇒ the pair oracles stay bit-identical). */
class DotProductDSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def viaSpark(a: Seq[Double], b: Seq[Double]): Option[Double] = {
    val df = Seq((Option(a), Option(b))).toDF("a", "b")
    val r = df.select(DotProductD(spark, col("a"), col("b")).as("d")).head
    if (r.isNullAt(0)) None else Some(r.getDouble(0))
  }

  private def ref(a: Seq[Double], b: Seq[Double]): Double = {
    var s = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { s += a(i) * b(i); i += 1 }
    s
  }

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(31L + i)))

  test("matches the sequential-sum reference bit-exactly on random vectors") {
    val vecGen = Gen.listOfN(16, Gen.chooseNum(-10.0, 10.0))
    val pairGen = for { a <- vecGen; b <- vecGen } yield (a, b)
    for ((a, b) <- samples(pairGen, 8)) {
      assert(viaSpark(a, b).contains(ref(a, b)), s"a=$a b=$b")
    }
  }

  test("edge shapes: empty, length mismatch (min-n contract), nulls, type check") {
    assert(viaSpark(Nil, Nil).contains(0.0))
    assert(viaSpark(Seq(1.0, 2.0), Nil).contains(0.0))
    // mismatched lengths iterate min(n, m) — the old UDF's contract
    assert(viaSpark(Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0)).contains(14.0))
    // null array propagates null (the >= threshold filter then drops it)
    val withNull = Seq((Some(Seq(1.0)), None: Option[Seq[Double]]))
      .toDF("a", "b")
      .select(DotProductD(spark, col("a"), col("b")).as("d")).head
    assert(withNull.isNullAt(0))
    // wrong element type fails analysis loudly
    val e = intercept[Exception] {
      Seq((Seq(1L), Seq(2L))).toDF("a", "b")
        .select(DotProductD(spark, col("a"), col("b"))).collect()
    }
    assert(e.getMessage.contains("array<double>"))
  }

  test("cosine through the expression equals the HOF formulation on the fixture") {
    val e = spark.read.parquet(s"${TestSpark.sfDir}/embeddings.parquet")
      .limit(50).select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val pairs = e.as("a").crossJoin(e.as("b"))
      .filter(col("a.vec_id") < col("b.vec_id"))
    val viaExpr = pairs.select(
      DotProductD(spark, col("a.v"), col("b.v")).as("d")).collect().map(_.getDouble(0))
    val viaHof = pairs.select(
      aggregate(zip_with(col("a.v"), col("b.v"), (x, y) => x * y),
        lit(0.0), (acc, z) => acc + z).as("d")).collect().map(_.getDouble(0))
    assert(viaExpr.toSeq == viaHof.toSeq)
  }
}
