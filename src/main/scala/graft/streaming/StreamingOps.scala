package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming surface (SURVEY.md §2.10): the same KQL-shaped aggregations
  * run as Structured Streaming jobs. ADX semantics map as:
  *
  *  - streaming ingest → `readStream` source (file/rate/memory)
  *  - `summarize count() by bin(ts, 5m)` → tumbling `window(ts, "5 minutes")`
  *  - late data → `withWatermark` (rows later than the watermark drop)
  *  - materialized view → the continuously-updated sink table
  *  - update policy → per-batch transform before the sink
  *
  * Batch/stream parity: these builders take any DataFrame — static input
  * runs the identical plan in batch, which is how the correctness gate
  * exercises them; the Structured Streaming test drives the stateful path.
  */
object StreamingOps {

  /** Tumbling-window count/sum per group — the KQL
    * `events | summarize n=count(), s=sum(value) by bin(ts, w), event_type`
    * shape, watermarked for state cleanup. */
  def tumblingAgg(events: DataFrame, windowDur: String, watermark: String,
                  tsCol: String = "ts", groupCol: String = "event_type",
                  valCol: String = "value"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowDur), col(groupCol))
      .agg(count(lit(1)).as("n"), sum(col(valCol)).as("s"))
      .select(col("window.start").as("ts"), col(groupCol), col("n"), col("s"))

  /** Sliding-window average (KQL moving aggregate over bins). */
  def slidingAvg(events: DataFrame, windowDur: String, slide: String,
                 watermark: String, tsCol: String = "ts",
                 valCol: String = "value"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowDur, slide))
      .agg(avg(col(valCol)).as("avg_v"))
      .select(col("window.start").as("ts"), col("avg_v"))

  /** Session windows (KQL row_window_session): gap-based sessions per
    * user via Spark's native session_window — stateful, watermarked. */
  def sessionAgg(events: DataFrame, gap: String, watermark: String,
                 tsCol: String = "ts", keyCol: String = "user_id"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(session_window(col(tsCol), gap), col(keyCol))
      .agg(count(lit(1)).as("n_events"))
      .select(col("session_window.start").as("sess_start"),
        col("session_window.end").as("sess_end"), col(keyCol), col("n_events"))

  /** Stateful streaming dedup within the watermark horizon
    * (ADX ingestion dedup policy). */
  def dedupStream(events: DataFrame, idCol: String, watermark: String,
                  tsCol: String = "ts"): DataFrame =
    events.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(idCol)

  /** Wire a streaming DataFrame to an in-memory sink and process all
    * currently-available input (used by tests and the demo). */
  def runToMemory(spark: SparkSession, stream: DataFrame, name: String,
                  outputMode: String): DataFrame = {
    val q = stream.writeStream
      .format("memory")
      .queryName(name)
      .outputMode(outputMode)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
  }
}
