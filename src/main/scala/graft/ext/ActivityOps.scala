package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Activity/engagement analytics plugins (KQL `evaluate
  * activity_engagement(...)` / `evaluate sliding_window_counts(...)`
  * — public KQL plugin surface; the reference implements nothing,
  * /root/reference/projects/kql-core/src/lib.rs:7-9).
  *
  * Both compute per-bin metrics over a SLIDING window of bins. The
  * scale-safe formulation: a row active in bin `d` contributes to the
  * windows ending at d, d+bin, ..., d+(r−1)·bin, so each (bin, id) row
  * is exploded r = window/bin ways and the sliding distinct-count
  * becomes a plain hash aggregate — one shuffle, replication factor r
  * (bounded, chosen by the caller), no self-join, no O(bins²) frame,
  * no driver state. Bin arithmetic stays in long microseconds
  * (`unix_micros` − `pmod`) — never double division.
  */
object ActivityOps {

  private def binOf(ts: String, binUs: Long) = {
    val us = unix_micros(col(ts))
    us - pmod(us, lit(binUs))
  }

  /** DAU/MAU-style engagement ratio: per inner bin, distinct actors in
    * that bin vs distinct actors in the outer sliding window ending at
    * it; `activity_ratio` = inner/outer. Emits one row per inner bin
    * with activity. */
  def activityEngagement(df: DataFrame, idCol: String, tsCol: String,
                         innerUs: Long, outerUs: Long): DataFrame = {
    require(outerUs % innerUs == 0 && outerUs >= innerUs,
      "outer window must be a positive multiple of the inner bin")
    val r = (outerUs / innerUs).toInt
    val pairs = df.select(binOf(tsCol, innerUs).as("__d"), col(idCol).as("__id"))
      .distinct()
    val inner = pairs.groupBy(col("__d"))
      .agg(count_distinct(col("__id")).as("dcount_activities_inner"))
    val shifts = array((0 until r).map(i => lit(i.toLong * innerUs)): _*)
    val outer = pairs
      .select(col("__d"), col("__id"), explode(shifts).as("__s"))
      .select((col("__d") + col("__s")).as("__d"), col("__id"))
      .groupBy(col("__d"))
      .agg(count_distinct(col("__id")).as("dcount_activities_outer"))
    inner.join(outer, "__d")
      .select(timestamp_micros(col("__d")).as(tsCol),
        col("dcount_activities_inner"), col("dcount_activities_outer"),
        round(col("dcount_activities_inner").cast("double") /
          col("dcount_activities_outer"), 4).as("activity_ratio"))
  }

  /** Per bin: row count and distinct-actor count over the sliding
    * lookback window ending at that bin. Emits every bin some window
    * reaches (activity bins plus their r−1 successors). */
  def slidingWindowCounts(df: DataFrame, idCol: String, tsCol: String,
                          lookbackUs: Long, binUs: Long): DataFrame = {
    require(lookbackUs % binUs == 0 && lookbackUs >= binUs,
      "lookback must be a positive multiple of the bin")
    val r = (lookbackUs / binUs).toInt
    val shifts = array((0 until r).map(i => lit(i.toLong * binUs)): _*)
    df.select(binOf(tsCol, binUs).as("__d"), col(idCol).as("__id"))
      .select(col("__d"), col("__id"), explode(shifts).as("__s"))
      .select((col("__d") + col("__s")).as("__d"), col("__id"))
      .groupBy(col("__d"))
      .agg(count(lit(1)).as("count_"), count_distinct(col("__id")).as("dcount_"))
      .select(timestamp_micros(col("__d")).as(tsCol), col("count_"), col("dcount_"))
  }
}
