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
