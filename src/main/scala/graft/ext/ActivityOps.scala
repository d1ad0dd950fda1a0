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

  /** KQL `evaluate rolling_percentile(value, pct, timeline, bin,
    * binsPerWindow)`: per bin, the exact percentile of the values seen in
    * the trailing `binsPerWindow` bins. Each row fans out to the bins its
    * window covers (replication = binsPerWindow, caller-bounded), one
    * percentile hash aggregate — no self-join, no sort of the full data. */
  def rollingPercentile(df: DataFrame, valCol: String, pct: Double,
                        tsCol: String, binUs: Long, winBins: Int): DataFrame = {
    require(binUs > 0 && winBins >= 1, "bin > 0, binsPerWindow >= 1")
    val shifts = array((0 until winBins).map(i => lit(i.toLong * binUs)): _*)
    df.select(binOf(tsCol, binUs).as("__d"), col(valCol).as("__v"))
      .select(col("__d"), col("__v"), explode(shifts).as("__s"))
      .select((col("__d") + col("__s")).as("__d"), col("__v"))
      .groupBy(col("__d"))
      .agg(call_function("percentile", col("__v"), lit(pct / 100.0))
        .as(s"rolling_${pct.toLong}_percentile"))
      .select(timestamp_micros(col("__d")).as(tsCol),
        col(s"rolling_${pct.toLong}_percentile"))
  }

  /** KQL `evaluate active_users_count(id, timeline, start, end,
    * lookback, period, active_periods, bin)`: per grid bin, the distinct
    * ids active in ≥ `minPeriods` DISTINCT periods within the lookback
    * window ending at the bin. Distributed shape: distinct (id, period)
    * rows fan out to the ≤ lookback/bin grid bins their period covers,
    * then two hash aggregates — per-(bin, id) period count, filter ≥ m,
    * per-bin id count. No self-join, no driver state. */
  def activeUsersCount(df: DataFrame, idCol: String, tsCol: String,
                       startUs: Long, stopUs: Long, lookbackUs: Long,
                       periodUs: Long, minPeriods: Int, binUs: Long): DataFrame = {
    require(binUs > 0 && periodUs > 0 && lookbackUs >= periodUs && minPeriods >= 1,
      "bin/period > 0, lookback >= period, active_periods >= 1")
    val spark = df.sparkSession
    val nBins = ((stopUs - startUs) / binUs).toLong
    val us = unix_micros(col(tsCol))
    val pers = df
      .select(col(idCol).as("__id"), (us - pmod(us, lit(periodUs))).as("__p"))
      .distinct()
    // period start p is live for bins b with p <= b < p + lookback;
    // b_k = start + k*bin ⇒ k in [ceil((p-start)/bin), floor((p+look-1-start)/bin)]
    val delta = col("__p") - startUs
    val kLo = greatest(
      ((delta + pmod(lit(binUs) - pmod(delta, lit(binUs)), lit(binUs))) / binUs).cast("long"),
      lit(0L))
    val kHi = least(floor((delta + lookbackUs - 1).cast("double") / binUs).cast("long"),
      lit(nBins))
    val hits = pers
      .select(col("__id"), col("__p"), kLo.as("__k0"), kHi.as("__k1"))
      .filter(col("__k1") >= col("__k0"))
      .select(col("__id"), col("__p"), explode(sequence(col("__k0"), col("__k1"))).as("__k"))
      .groupBy(col("__k"), col("__id")).agg(count(lit(1)).as("__np"))
      .filter(col("__np") >= minPeriods)
      .groupBy(col("__k")).agg(count(lit(1)).as("dcount"))
    val grid = spark.range(0, nBins + 1L).toDF("__k")
    grid.join(hits, Seq("__k"), "left")
      .select(timestamp_micros(col("__k") * binUs + startUs).as(tsCol),
        coalesce(col("dcount"), lit(0L)).as("dcount"))
  }

  /** KQL `evaluate activity_counts_metrics(id, timeline, start, end,
    * step)`: per step-aligned bin — row count, distinct actors, NEW
    * actors (first appearance in this bin), and the cumulative distinct
    * total. The cumulative distinct is exactly the running sum of
    * new_dcount, so it needs no set union: two hash aggregates plus a
    * running sum over the BIN-level rows (≤ (end−start)/step rows — a
    * bounded frame, not data-sized). */
  def activityCountsMetrics(df: DataFrame, idCol: String, tsCol: String,
                            startUs: Long, stopUs: Long, binUs: Long): DataFrame = {
    require(binUs > 0 && stopUs >= startUs, "end >= start and step > 0")
    val us = unix_micros(col(tsCol))
    val d = lit(startUs) + ((us - startUs) - pmod(us - startUs, lit(binUs)))
    val binned = df.filter(us >= startUs && us <= stopUs)
      .select(d.as("__d"), col(idCol).as("__id"))
    val perBin = binned.groupBy("__d").agg(count(lit(1)).as("count_"),
      count_distinct(col("__id")).as("dcount"))
    val firsts = binned.groupBy("__id").agg(min(col("__d")).as("__d"))
      .groupBy("__d").agg(count(lit(1)).as("new_dcount"))
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("__d"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    perBin.join(firsts, Seq("__d"), "left")
      .withColumn("new_dcount", coalesce(col("new_dcount"), lit(0L)))
      .withColumn("aggregated_dcount", sum(col("new_dcount")).over(w))
      .select(timestamp_micros(col("__d")).as(tsCol), col("count_"),
        col("dcount"), col("new_dcount"), col("aggregated_dcount"))
  }

  /** KQL `evaluate new_activity_metrics(id, timeline, step)` — cohort
    * retention/churn: users are COHORTED by their first-seen bin; for
    * every (from = cohort bin, to ≥ from) pair with activity, how many
    * of the cohort's new users were active in `to` (retained) vs not
    * (churned). The from == to row is the cohort itself (retention
    * 100%). Bins are epoch-aligned step multiples.
    *
    * Rates ship as EXACT integer micros — (retained·10⁶) div cohort —
    * plus the double view micros/10⁶ (identical IEEE division on any
    * engine): the pagerank convention, because a rounded ratio of two
    * small counts can land on a ROUND(x,4) half-way boundary where
    * engines disagree in the last digit.
    *
    * Shape: one distinct (user, bin) projection, one min aggregate
    * (the cohort), one hash join back on user id, one (from, to)
    * aggregate — all shuffle-based hash ops keyed on user/bin; output
    * is ≤ bins² rows (grid-sized, not data-sized). */
  def newActivityMetrics(df: DataFrame, idCol: String, tsCol: String,
                         binUs: Long): DataFrame = {
    require(binUs > 0, "step must be > 0")
    val us = unix_micros(col(tsCol))
    val act = df.select(col(idCol).as("__id"),
      (us - pmod(us, lit(binUs))).as("__b")).distinct()
    val cohort = act.groupBy("__id").agg(min(col("__b")).as("__from"))
    val cohortSize = cohort.groupBy("__from")
      .agg(count(lit(1)).as("dcount_new_values"))
    cohort.join(act, "__id")
      .groupBy(col("__from"), col("__b"))
      .agg(count(lit(1)).as("dcount_retained_values"))
      .join(cohortSize, "__from")
      .select(
        timestamp_micros(col("__from")).as(s"from_$tsCol"),
        timestamp_micros(col("__b")).as(s"to_$tsCol"),
        col("dcount_new_values"),
        col("dcount_retained_values"),
        (col("dcount_new_values") - col("dcount_retained_values"))
          .as("dcount_churn_values"),
        expr("(dcount_retained_values * 1000000L) div dcount_new_values")
          .as("retention_rate_micros"))
      .withColumn("retention_rate",
        col("retention_rate_micros").cast("double") / 1000000.0d)
  }

  /** KQL `evaluate activity_metrics(id, timeline, step)` — per-bin
    * activity with window-over-window retention (the non-cohort
    * sibling of [[newActivityMetrics]]): for each bin b, distinct
    * actors, NEW actors (first appearance), actors retained FROM the
    * previous bin (active in both b−step and b), and the retention
    * rate retained/|active(b−step)| — churn is its complement. Rates
    * in exact integer micros (same convention as newActivityMetrics);
    * bins with no previous-bin activity report null rates.
    *
    * Shape: one distinct (id, bin) projection feeding (a) a per-bin
    * count, (b) a first-seen aggregate, (c) ONE self-equi-join on
    * (id, bin = bin + step) for the retained counts — all hash ops on
    * (id, bin) keys, output grid-sized. */
  def activityMetrics(df: DataFrame, idCol: String, tsCol: String,
                      binUs: Long): DataFrame = {
    require(binUs > 0, "step must be > 0")
    val us = unix_micros(col(tsCol))
    val act = df.select(col(idCol).as("__id"),
      (us - pmod(us, lit(binUs))).as("__b")).distinct()
    val perBin = act.groupBy("__b").agg(count(lit(1)).as("dcount_values"))
    val firsts = act.groupBy("__id").agg(min(col("__b")).as("__b"))
      .groupBy("__b").agg(count(lit(1)).as("dcount_new_values"))
    val retained = act.as("p")
      .join(act.as("c"), col("p.__id") === col("c.__id") &&
        col("p.__b") + binUs === col("c.__b"))
      .groupBy(col("c.__b").as("__b"))
      .agg(count(lit(1)).as("dcount_retained_values"))
    val prev = perBin.select((col("__b") + binUs).as("__b"),
      col("dcount_values").as("__prev_dcount"))
    perBin
      .join(firsts, Seq("__b"), "left_outer")
      .join(retained, Seq("__b"), "left_outer")
      .join(prev, Seq("__b"), "left_outer")
      .select(
        timestamp_micros(col("__b")).as(tsCol),
        col("dcount_values"),
        coalesce(col("dcount_new_values"), lit(0L)).as("dcount_new_values"),
        when(col("__prev_dcount").isNotNull,
          coalesce(col("dcount_retained_values"), lit(0L)))
          .as("dcount_retained_values"),
        col("__prev_dcount"))
      .withColumn("retention_rate_micros",
        expr("(coalesce(dcount_retained_values, 0L) * 1000000L) div __prev_dcount"))
      .withColumn("retention_rate",
        col("retention_rate_micros").cast("double") / 1000000.0d)
      .drop("__prev_dcount")
  }

  /** KQL `evaluate session_count(id, timeline, start, stop, bin,
    * lookback)`: for every grid bin b in [start, stop] step bin, the
    * number of distinct ids with activity in (b − lookback, b] — an id's
    * "session" is alive while its last activity is within the lookback.
    * Same explode-to-bins shape as above: an activity at t covers grid
    * indices k with b_k ≥ t and b_k < t + lookback, so each row fans out
    * ≤ lookback/bin ways into one hash aggregate; the full grid
    * (including zero bins) comes from a broadcast-able range join. */
  def sessionCount(df: DataFrame, idCol: String, tsCol: String,
                   startUs: Long, stopUs: Long, binUs: Long,
                   lookbackUs: Long): DataFrame = {
    require(binUs > 0 && lookbackUs >= binUs, "bin > 0 and lookback >= bin")
    val spark = df.sparkSession
    val nBins = ((stopUs - startUs) / binUs).toInt
    val t = unix_micros(col(tsCol))
    // k0 = ceil((t - start)/bin) — the µs arithmetic stays integral
    val delta = t - lit(startUs)
    def ceilDiv(x: org.apache.spark.sql.Column) =
      ((x + pmod(lit(binUs) - pmod(x, lit(binUs)), lit(binUs))) / binUs).cast("long")
    val k0 = greatest(ceilDiv(delta), lit(0L))
    val k1 = least(ceilDiv(delta + lookbackUs) - 1L, lit(nBins.toLong))
    val counts = df
      .select(col(idCol).as("__id"), k0.as("__k0"), k1.as("__k1"))
      .filter(col("__k1") >= col("__k0"))
      .select(col("__id"), explode(sequence(col("__k0"), col("__k1"))).as("__k"))
      .groupBy(col("__k")).agg(count_distinct(col("__id")).as("count_session"))
    val grid = spark.range(0, nBins + 1L).toDF("__k")
    grid.join(counts, Seq("__k"), "left")
      .select(timestamp_micros(col("__k") * binUs + startUs).as(tsCol),
        coalesce(col("count_session"), lit(0L)).as("count_session"))
  }
}
