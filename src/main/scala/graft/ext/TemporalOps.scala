package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal correlation operators the KQL surface lacks natively
  * (SURVEY.md §2.3: as-of join, range/interval join — both expressed as
  * Spark-composable patterns, not custom execs).
  *
  * Scale notes: both operators partition by the correlation key, so the
  * window/join state is per-key and distributes; neither collects to the
  * driver or builds an O(n²) product.
  */
object TemporalOps {

  /** As-of (nearest-prior-event) attach: for every row, the most recent
    * value of `value` among prior rows (per `key`, ordered by ts, tie)
    * where `marker` held. The classic union+last(ignoreNulls) pattern —
    * one shuffle on `key`, window state is O(1) per row. */
  def asOfLastPrior(df: DataFrame, key: String, ts: String, tie: String,
                    marker: Column, value: Column, out: String): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(ts), col(tie))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn(out, last(when(marker, value), ignoreNulls = true).over(w))
  }

  /** As-of with TOLERANCE: [[asOfLastPrior]] but a match older than
    * `tolUs` microseconds is dropped (null) — the "join to the latest
    * quote, unless it is stale" rule of market-data as-of joins. ONE
    * last(ignoreNulls) pass picks a (ts, value) struct, so the value
    * and its timestamp provably come from the SAME marker row even
    * when the latest marker carries a NULL value (two independent
    * passes would pair an older value with the newer row's timestamp:
    * `when(marker, value)` is null-skipped while `when(marker, ts)`
    * is not). A null-valued latest marker within tolerance yields
    * null — the honest as-of answer. Same single key shuffle, O(1)
    * window state. */
  def asOfLastPriorWithin(df: DataFrame, key: String, ts: String,
                          tie: String, marker: Column, value: Column,
                          out: String, tolUs: Long): DataFrame = {
    require(tolUs > 0, "asOfLastPriorWithin: tolerance must be positive")
    val w = Window.partitionBy(col(key)).orderBy(col(ts), col(tie))
      .rowsBetween(Window.unboundedPreceding, -1)
    // timestamp columns compare in micros; numeric columns as-is
    val tsNum = df.schema(ts).dataType match {
      case org.apache.spark.sql.types.TimestampType |
           org.apache.spark.sql.types.TimestampNTZType =>
        unix_micros(col(ts).cast("timestamp"))
      case _ => col(ts).cast("long")
    }
    df.withColumn("__m", last(when(marker,
        struct(tsNum.as("ts"), value.as("v"))), ignoreNulls = true).over(w))
      .withColumn(out,
        when(tsNum - col("__m").getField("ts") <= tolUs,
          col("__m").getField("v")))
      .drop("__m")
  }

  /** Ordered funnel matching — the batch emulation of KQL `scan` for its
    * dominant use (sequential step predicates, no state assignments;
    * SURVEY §2.10 marks the full step machine P3). Per key, computes the
    * earliest timestamp each step could complete, where step k counts
    * only at rows strictly after step k−1's completion:
    * t₁ = min ts with cond₁;  tₖ = min ts with condₖ and ts > tₖ₋₁.
    *
    * One aggregation pass per step over the SAME key shuffle (Catalyst
    * reuses the partitioning across the chained joins), so cost is
    * K sequential map-side scans — no window over an unpartitioned
    * frame, no state machine, distributes by key. */
  def funnel(df: DataFrame, key: String, ts: String,
             steps: Seq[(String, Column)]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    var acc = df.filter(steps.head._2)
      .groupBy(col(key)).agg(min(col(ts)).as(s"t_${steps.head._1}"))
    steps.tail.zipWithIndex.foreach { case ((name, cond), i) =>
      val prevT = s"t_${steps(i)._1}"
      val nxt = df.filter(cond)
        .select(col(key), col(ts).as("__ts"))
        .join(acc.select(col(key), col(prevT).as("__prev")), Seq(key))
        .filter(col("__ts") > col("__prev"))
        .groupBy(col(key)).agg(min(col("__ts")).as(s"t_$name"))
      acc = acc.join(nxt, Seq(key), "left")
    }
    val doneCols = steps.map { case (n, _) => col(s"t_$n") }
    acc.withColumn("steps_completed",
      doneCols.map(c => when(c.isNotNull, 1).otherwise(0)).reduce(_ + _).cast("long"))
  }

  /** KQL `evaluate funnel_sequence_completion(id, timeline, type, bin,
    * window, steps...)` (simplified): per period bin of the funnel
    * START t₁ and per step, how many ids' EARLIEST funnel chain
    * ([[funnel]]'s recurrence) reached the step within `windowUs` of
    * t₁. Earliest-chain semantics are inherited — a later chain that
    * fits the window when the earliest does not is NOT counted (the
    * documented transparent simplification, same convention class as
    * diffpatterns vs Kusto's heuristic). Output is the zero-filled
    * (start-bin × step) grid — grid-sized, not data-sized.
    * `ts` must be an epoch-µs long column (callers convert datetimes
    * via unix_micros — the [[funnel]] usage convention). */
  def funnelCompletion(df: DataFrame, key: String, ts: String,
                       binUs: Long, windowUs: Long,
                       steps: Seq[(String, Column)]): DataFrame = {
    require(binUs > 0 && windowUs > 0, "bin and window must be > 0")
    val f = funnel(df, key, ts, steps)
    val names = steps.map(_._1)
    val t1 = col(s"t_${names.head}")
    val withBin = f.withColumn("__bin", t1 - pmod(t1, lit(binUs)))
    val counts = names.map { n =>
      withBin.filter(col(s"t_$n").isNotNull && col(s"t_$n") - t1 <= windowUs)
        .groupBy(col("__bin")).agg(count(lit(1)).as("dcount"))
        .withColumn("step", lit(n))
    }.reduce(_ unionByName _)
    val grid = withBin.select(col("__bin")).distinct()
      .select(col("__bin"),
        posexplode(array(names.map(lit): _*)).as(Seq("step_idx", "step")))
    grid.join(counts, Seq("__bin", "step"), "left_outer")
      .select(timestamp_micros(col("__bin")).as("period"),
        col("step_idx").cast("long").as("step_idx"), col("step"),
        coalesce(col("dcount"), lit(0L)).as("dcount"))
  }

  /** KQL `evaluate sequence_detect`-style ordered sequence search: all
    * step-1 occurrences per key, extended greedily — step k completes at
    * the EARLIEST matching event in (t_{k−1}, t_{k−1} + stepWindow]
    * (greedy-after-start is lossless here: only consecutive gaps are
    * constrained, so if any completion exists from a start, the greedy
    * one does) — then the whole chain must fit in `spanUs`. Hash joins
    * and aggregates on the key only; hot keys with many step-1 events
    * are the skew channel (bounded by per-key event counts). */
  def sequenceDetect(df: DataFrame, key: String, ts: String,
                     windowUs: Long, spanUs: Long,
                     steps: Seq[(String, Column)]): DataFrame = {
    require(steps.length >= 2, "sequence_detect needs at least two steps")
    var acc = df.filter(steps.head._2)
      .select(col(key), col(ts).as(s"${steps.head._1}_ts")).distinct()
    steps.tail.zipWithIndex.foreach { case ((nm, cond), i) =>
      val prev = s"${steps(i)._1}_ts"
      val prevCols = acc.columns.toSeq
      val nxt = df.filter(cond).select(col(key), col(ts).as("__nt"))
      acc = acc.join(nxt, Seq(key))
        .filter(unix_micros(col("__nt")) > unix_micros(col(prev)) &&
          unix_micros(col("__nt")) <= unix_micros(col(prev)) + windowUs)
        .groupBy(prevCols.map(col): _*)
        .agg(min(col("__nt")).as(s"${nm}_ts"))
    }
    val first = s"${steps.head._1}_ts"
    val last = s"${steps.last._1}_ts"
    acc.filter(unix_micros(col(last)) - unix_micros(col(first)) <= spanUs)
  }

  /** Range (interval) join: per `key`, all pairs (a, b) with
    * b.ts ∈ (a.ts, a.ts + windowUs]. Implemented with the bucketed
    * equi-join trick: each left row joins only its own and the next
    * time bucket, so the join is equi on (key, bucket) and Catalyst
    * plans a hash join — never a cross product. */
  def rangeJoinPairs(df: DataFrame, key: String, ts: String, id: String,
                     windowUs: Long): DataFrame = {
    val a = df.select(col(key).as("k"), col(ts).as("a_ts"), col(id).as("a_id"))
      .withColumn("bucket", explode(array(
        floor(unix_micros(col("a_ts")) / windowUs),
        floor(unix_micros(col("a_ts")) / windowUs) + 1)))
    val b = df.select(col(key).as("k"), col(ts).as("b_ts"), col(id).as("b_id"))
      .withColumn("bucket", floor(unix_micros(col("b_ts")) / windowUs))
    a.join(b, Seq("k", "bucket"))
      .filter(unix_micros(col("b_ts")) > unix_micros(col("a_ts")) &&
        unix_micros(col("b_ts")) <= unix_micros(col("a_ts")) + windowUs)
      .select(col("k"), col("a_id"), col("b_id"), col("a_ts"), col("b_ts"))
      .distinct()
  }
}
