package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hilbert-curve at-rest layout — the locality-tightening sibling of
  * [[ZOrderLayout]] (SURVEY §4.3).
  *
  * Z-order (Morton) interleaving is cheap but discontinuous: the curve
  * teleports at power-of-two boundaries (…0111 → …1000 jumps across the
  * grid), so a file owning a contiguous z-range can still straddle a
  * seam and carry a wide min/max on one dimension. The Hilbert curve
  * visits grid cells in a path where CONSECUTIVE indices are always
  * grid-ADJACENT (manhattan distance exactly 1 — spec-proven here by
  * exhaustive replay), which is why Hilbert clustering is the quality
  * step up in lakehouse layouts for 2-D hot filters (e.g. (time,
  * tenant) at 100 TB): contiguous index ranges are compact squares, not
  * seam-straddling stripes.
  *
  * Index computation is the classic per-level rotate-and-flip fold
  * (xy2d), materialized as a withColumn CHAIN — one bound attribute per
  * level — because each level reads the previous level's x/y 3–4 times
  * and an inline recursive Column tree would grow exponentially with
  * `bits` (the r7 media-walk lesson). Buckets come from the same
  * distributed quantile sketch as Z-order (skew-spreading), the fold is
  * all integer bit math in codegen, and the write is
  * range-partition + in-file sort — placement changes, content never
  * does. 2-D only: the rotate-flip construction is specific to two
  * dimensions (d > 2 Hilbert needs Gray-code state tables; Z-order
  * stays the ≥ 3-D fallback).
  */
object HilbertLayout {

  /** Append `outCol` = Hilbert index of the 2 quantile-bucketed
    * columns (2^bits × 2^bits grid). Exposed for the spec. */
  def withHilbert(df: DataFrame, cols: Seq[String], bits: Int,
                  outCol: String): DataFrame = {
    require(cols.size == 2, "hilbert layout is 2-D (use z-order for 3+)")
    require(bits >= 2 && bits <= 8, "need 2 <= bits <= 8")
    val cuts = cols.map(c => ZOrderLayout.quantileCuts(df, c, bits))
    withHilbertBuckets(df,
      ZOrderLayout.bucketOf(col(cols.head), cuts.head),
      ZOrderLayout.bucketOf(col(cols(1)), cuts(1)), bits, outCol)
  }

  /** The xy2d fold over ALREADY-bucKETED 0 ≤ x, y < 2^bits columns. */
  def withHilbertBuckets(df: DataFrame, xc: Column, yc: Column, bits: Int,
                         outCol: String): DataFrame = {
    var out = df
      .withColumn("__hx0", xc.cast("long"))
      .withColumn("__hy0", yc.cast("long"))
      .withColumn("__hd0", lit(0L))
    for (i <- 0 until bits) {
      val lvl = bits - 1 - i
      val s = 1L << lvl
      val x = col(s"__hx$i"); val y = col(s"__hy$i")
      out = out
        .withColumn(s"__hrx$i",
          when(x.bitwiseAND(lit(s)) > 0, 1L).otherwise(0L))
        .withColumn(s"__hry$i",
          when(y.bitwiseAND(lit(s)) > 0, 1L).otherwise(0L))
      val rx = col(s"__hrx$i"); val ry = col(s"__hry$i")
      // flip applies only in the ry == 0 branch, then x/y swap
      val fx = when(rx === 1, lit(s - 1) - x).otherwise(x)
      val fy = when(rx === 1, lit(s - 1) - y).otherwise(y)
      out = out
        .withColumn(s"__hd${i + 1}",
          col(s"__hd$i") + lit(s * s) * (rx * 3).bitwiseXOR(ry))
        .withColumn(s"__hx${i + 1}", when(ry === 0, fy).otherwise(x))
        .withColumn(s"__hy${i + 1}", when(ry === 0, fx).otherwise(y))
    }
    val drops = (0 to bits).flatMap(i => Seq(s"__hx$i", s"__hy$i")) ++
      (0 until bits).flatMap(i => Seq(s"__hrx$i", s"__hry$i")) ++
      (0 until bits).map(i => s"__hd$i")
    out.withColumn(outCol, col(s"__hd$bits")).drop(drops: _*)
  }

  /** Write `df` Hilbert-clustered on the 2 `cols` to `path` as `files`
    * parquet files (one contiguous index range per file). */
  def hilbertWrite(df: DataFrame, path: String, cols: Seq[String],
                   bits: Int = 4, files: Int = 8): Unit = {
    withHilbert(df, cols, bits, "__h")
      .repartitionByRange(files, col("__h"))
      .sortWithinPartitions("__h")
      .drop("__h")
      .write.mode("overwrite").parquet(path)
  }
}
