package graft.streaming

import graft.api.{Doc, SearchEngine}
import graft.index.IndexBuildConfig
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Structured Streaming surfaces.
  *
  * The reference is purely batch/in-memory (SURVEY §2.6: no streaming), but
  * its mutation API (upsert/remove, `/root/reference/src/search.rs:81-98`)
  * maps naturally onto a streaming ingest: each micro-batch of documents is
  * appended to the engine's delta log (the same exactly-merged delta path
  * queries already use), with periodic compaction folding deltas into the
  * base index.
  */
object StreamingIngest {

  /** Continuously upserts a stream of (id, contents) documents into a
    * SearchEngine via foreachBatch. Searches observe every completed batch
    * exactly (the delta merge recomputes df/N live).
    */
  def ingest(docsStream: Dataset[Doc], engine: SearchEngine,
             checkpointDir: String,
             compactEvery: Int = 0,
             trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    docsStream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: Dataset[Doc], batchId: Long) =>
        // distributed append: the batch is mapped to log rows in executors
        // and written straight to the delta log — no driver funnel, so an
        // arbitrarily large micro-batch cannot OOM the driver
        engine.upsertBatch(batch)
        if (compactEvery > 0 && batchId > 0 && batchId % compactEvery == 0)
          engine.compact(IndexBuildConfig(numShards = 4, shardGroups = 1))
      }
      .start()
  }

  /** Event-stream analytics: watermarked sliding-window aggregation over the
    * events table shape (ts, event_type, value) — the standard
    * readStream → window → writeStream pipeline.
    */
  def windowedEventCounts(spark: SparkSession, events: DataFrame,
                          watermark: String = "10 minutes",
                          window_ : String = "5 minutes"): DataFrame = {
    events
      .withColumn("ts", col("ts").cast("timestamp")) // NTZ → event-time type
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("w_start"), col("event_type"), col("n"), col("sum_value"))
  }
}
