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

  /** Continuous-ingestion near-dup dedup: each micro-batch is deduped
    * against the persisted minhash index (LlmOps.dedupIncremental —
    * index candidates + in-batch self-join, exact-verified), the kept
    * rows are appended to `keptTable`, and their signatures are
    * APPENDED to the index, so later batches dedup against everything
    * kept so far.
    *
    * The cross-batch state is the bucketed index AT REST, not streaming
    * state: unlike dropDuplicatesWithinWatermark (whose state store
    * must hold every key inside the watermark horizon in executor
    * memory), the index is unbounded-corpus-sized on disk, bucket-
    * joined exchange-free, and survives restarts/redeploys — the only
    * viable shape when the dedup horizon is "the whole 100 TB corpus",
    * with near-dup (not just exact-key) matching. foreachBatch runs
    * batches sequentially, so append-then-next-batch ordering is safe.
    * Start from [[graft.ext.LlmOps.buildMinhashIndex]] on the seed
    * corpus (possibly empty). */
  def dedupIncrementalStream(stream: DataFrame, indexTable: String,
                             keptTable: String, threshold: Double = 0.8,
                             textCol: String = "text", idCol: String = "doc_id",
                             checkpoint: Option[String] = None)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val writer = stream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        // checkpoint-replay idempotency: kept rows land in a
        // __batch_id partition via DYNAMIC partition overwrite, so a
        // replayed batch REPLACES its own output instead of appending
        // it twice. The index append is not similarly guarded — a
        // replay can double a batch's signatures there, which costs
        // index space but never correctness (duplicate signatures make
        // duplicate candidates; drops are distinct verified ids).
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        val kept = graft.ext.LlmOps.dedupIncremental(
            batch, indexTable, threshold, textCol = textCol, idCol = idCol)
          .withColumn("__batch_id", lit(batchId)).persist()
        if (!spark.catalog.tableExists(keptTable))
          kept.limit(0).write.format("parquet")
            .partitionBy("__batch_id").saveAsTable(keptTable)
        kept.write.mode("overwrite").insertInto(keptTable)
        graft.ext.LlmOps.appendToMinhashIndex(
          kept.drop("__batch_id"), indexTable, textCol = textCol, idCol = idCol)
        kept.unpersist()
        // dedupIncremental persists its per-batch token/signature frames
        // for within-query reuse; without this they accumulate one pair
        // per micro-batch for the life of the stream. The wrapper
        // assumes it owns the session's SQL cache (a dedicated
        // ingestion job — the deployment shape this runner is for).
        spark.catalog.clearCache()
        ()
      }
    // deploys pass a checkpoint dir so a restart resumes at the next
    // unprocessed offset (finished batches' writes are idempotent per
    // above); tests drive batches via processAllAvailable
    checkpoint.foreach(writer.option("checkpointLocation", _))
    writer.start()
  }

  /** Continuous LINE-level dedup ([[graft.ext.LlmOps.lineDedupIncremental]]
    * per micro-batch): each batch drops lines already in the persisted
    * line index, keeps in-batch first occurrences, COMMITS its cleaned
    * docs to a per-batch partition (dynamic overwrite ⇒ replay-safe),
    * and only THEN grows the index from the committed output — the
    * write-then-append ordering that makes a crash between the two
    * steps harmless: a replay recomputes against the unchanged index
    * (or, after the append, re-derives the append from the same
    * durable kept rows; duplicate index hashes never change the
    * anti-join's answer). */
  def lineDedupIncrementalStream(stream: DataFrame, indexTable: String,
                                 keptTable: String, delim: String = "\n",
                                 textCol: String = "text",
                                 idCol: String = "doc_id",
                                 checkpoint: Option[String] = None)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val writer = stream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        val cleaned = graft.ext.LlmOps.lineDedupIncremental(
            batch, indexTable, delim, textCol, idCol)
          .withColumn("__batch_id", lit(batchId)).persist()
        if (!spark.catalog.tableExists(keptTable))
          cleaned.limit(0).write.format("parquet")
            .partitionBy("__batch_id").saveAsTable(keptTable)
        cleaned.write.mode("overwrite").insertInto(keptTable)
        // kept rows are durable — NOW grow the index, reading the novel
        // lines back out of the cached cleaned output (its cache is
        // only invalidated by the append's own trailing refresh, after
        // the last read)
        graft.ext.LlmOps.appendToLineIndex(
          cleaned.drop("__batch_id"), indexTable, delim, idCol = idCol)
        cleaned.unpersist()
        ()
      }
    checkpoint.foreach(writer.option("checkpointLocation", _))
    writer.start()
  }

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
