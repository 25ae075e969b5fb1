package graft.streaming

import graft.api.{Doc, SearchEngine}
import graft.index.IndexBuildConfig
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}

/** Open-session state for [[StreamingIngest.sessionize]] (epoch micros). */
case class SessionSt(startUs: Long, lastUs: Long, n: Long, sum: Double)

/** A closed session row — same shape as the batch `evt_sessionize` catalog
  * query minus the (stream-meaningless) per-user session ordinal.
  */
case class SessionRow(user_id: Long, s_start_us: Long, s_end_us: Long,
                      n_events: Long, sum_value: Double)

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

  /** Per-user sessionization over the events stream — CUSTOM streaming
    * state via `flatMapGroupsWithState` with an event-time timeout: a
    * session extends while successive events of the user arrive within
    * `gapMinutes`; it closes (and is emitted exactly once) either inline,
    * when a later event of the same user exceeds the gap, or by watermark
    * timeout when no successor arrives. Identical session boundaries to the
    * batch `evt_sessionize` catalog query (exact epoch-micros gap math);
    * StreamingSpec asserts the equivalence on the closed set.
    *
    * Scale shape: state is one small fixed-size record per ACTIVE user
    * (closed sessions leave state immediately), hash-partitioned by user —
    * the canonical bounded-state streaming aggregation.
    */
  def sessionize(spark: SparkSession, events: DataFrame,
                 gapMinutes: Int = 30): Dataset[SessionRow] = {
    import spark.implicits._
    val gapUs = gapMinutes * 60L * 1000000L
    val gapMs = gapMinutes * 60L * 1000L
    events
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", s"$gapMinutes minutes")
      .select(col("user_id").cast("long"), col("ts"),
        unix_micros(col("ts")), col("value").cast("double"))
      .as[(Long, java.sql.Timestamp, Long, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(
        (user: Long, it: Iterator[(Long, java.sql.Timestamp, Long, Double)],
         state: GroupState[SessionSt]) => {
          val out = scala.collection.mutable.ArrayBuffer.empty[SessionRow]
          def close(s: SessionSt): Unit =
            out += SessionRow(user, s.startUs, s.lastUs, s.n, s.sum)
          if (state.hasTimedOut) {
            state.getOption.foreach(close)
            state.remove()
          } else {
            var cur = state.getOption.orNull
            // in-batch order: by event time (micros), value as a stable
            // tie-break so double accumulation order is deterministic
            val evs = it.toArray.sortBy(e => (e._3, e._4))
            evs.foreach { case (_, _, us, v) =>
              if (cur == null) cur = SessionSt(us, us, 1, v)
              else if (us - cur.lastUs > gapUs) { close(cur); cur = SessionSt(us, us, 1, v) }
              else cur = SessionSt(cur.startUs, math.max(cur.lastUs, us), cur.n + 1, cur.sum + v)
            }
            if (cur != null) {
              val timeoutMs = cur.lastUs / 1000L + gapMs + 1L
              if (timeoutMs <= state.getCurrentWatermarkMs()) {
                // the gap already elapsed behind the watermark — no
                // successor can arrive; close now (a timeout in the past
                // is not representable)
                close(cur)
                state.remove()
              } else {
                state.update(cur)
                state.setTimeoutTimestamp(timeoutMs)
              }
            }
          }
          out.iterator
        })
  }
}
