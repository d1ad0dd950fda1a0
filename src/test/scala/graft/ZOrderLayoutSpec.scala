package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sources.ZOrderLayout

class ZOrderLayoutSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private lazy val docs =
    spark.read.parquet(s"${TestSpark.sfDir}/documents.parquet")

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_z_$tag").toString + "/t"

  // mean per-file (max − min) / global range for column c
  private def meanRangeFrac(path: String, c: String): Double = {
    val df = spark.read.parquet(path)
    val g = df.agg(min(col(c)).cast("double"),
      max(col(c)).cast("double")).head
    val span = g.getDouble(1) - g.getDouble(0)
    val rows = df.groupBy(input_file_name().as("f"))
      .agg(min(col(c)).cast("double").as("lo"),
        max(col(c)).cast("double").as("hi"))
      .collect()
    rows.map(r => (r.getDouble(2) - r.getDouble(1)) / span).sum / rows.length
  }

  test("z-order narrows per-file ranges on BOTH dims; linear sort on one") {
    // two independent dimensions: n_chars and a hash-derived key
    val d = docs.withColumn("h", pmod(xxhash64(col("doc_id")), lit(1000L)))
      .select("doc_id", "n_chars", "h")
    val zdir = tmp("z")
    ZOrderLayout.zorderWrite(d, zdir, Seq("n_chars", "h"), bits = 4,
      files = 8)
    val ldir = tmp("lin")
    d.repartitionByRange(8, col("n_chars")).sortWithinPartitions("n_chars")
      .write.mode("overwrite").parquet(ldir)
    val (zc, zh) = (meanRangeFrac(zdir, "n_chars"), meanRangeFrac(zdir, "h"))
    val (lc, lh) = (meanRangeFrac(ldir, "n_chars"), meanRangeFrac(ldir, "h"))
    // the single-column sort is tight on its key and useless on the other
    assert(lc < 0.35, s"linear sort col frac $lc")
    assert(lh > 0.80, s"linear other col frac $lh")
    // z-order shares locality across BOTH dimensions
    assert(zc < 0.70 && zh < 0.70, s"z fracs $zc / $zh")
    assert(zc + zh < lc + lh, s"combined: z ${zc + zh} vs linear ${lc + lh}")
    // layout changes placement, never content
    assert(spark.read.parquet(zdir).count() == d.count())
    assert(spark.read.parquet(zdir).agg(sum("doc_id")).head.getLong(0) ==
      d.agg(sum("doc_id")).head.getLong(0))
    // a two-sided filter still pushes to the scan (pruning stays usable)
    val plan = spark.read.parquet(zdir)
      .filter(col("n_chars") > 100 && col("h") < 200)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThan"))
  }

  test("morton key: quadrant distinctness, monotonicity, null/bucket-0") {
    import spark.implicits._
    // 4 well-separated value clusters per dim: quadrant corners must
    // map to DISTINCT z values with (low,low) minimal and (high,high)
    // maximal (exact bucket ids depend on approxQuantile's rank
    // convention, so the spec pins order/distinctness, not constants)
    val corners = for (x <- Seq(0, 1000, 2000, 3000);
                       y <- Seq(0, 1000, 2000, 3000)) yield (x, y)
    val d = corners.toDF("x", "y")
    val z = d.withColumn("z", ZOrderLayout.zValue(d, Seq("x", "y"), bits = 2))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getInt(2)).toMap
    assert(z.values.toSet.size == 16) // all 16 quadrants distinct
    assert(z((0, 0)) == z.values.min)
    assert(z((3000, 3000)) == z.values.max)
    // monotone along each axis when the other is pinned
    assert(z((0, 0)) < z((1000, 0)) && z((1000, 0)) < z((2000, 0)))
    assert(z((0, 0)) < z((0, 1000)) && z((0, 1000)) < z((0, 2000)))
    // nulls fail every >= cutoff test → bucket 0 → minimal contribution
    val dn = Seq[(java.lang.Integer, java.lang.Integer)](
      (null, 0), (3000, 0), (null, 3000)).toDF("x", "y")
    val zn = dn.withColumn("z", ZOrderLayout.zValue(dn, Seq("x", "y"), 2))
      .collect().map(r => ((Option(r.get(0)), r.getInt(1)), r.getInt(2))).toMap
    assert(zn((None, 0)) <= zn((Some(3000), 0))) // null x sorts at/under low
    assert(zn((None, 0)) < zn((None, 3000)))     // y still discriminates
  }
}
