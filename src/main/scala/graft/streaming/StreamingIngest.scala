package graft.streaming

import graft.api.{Doc, SearchEngine}
import graft.index.IndexBuildConfig
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}

/** Buffered not-yet-sealed events for [[StreamingIngest.sessionize]]
  * (epoch micros; parallel arrays for a stable encoder). Bounded: only
  * events of sessions the watermark has not sealed yet — at most the
  * watermark horizon per user.
  */
case class SessionBuf(us: Seq[Long], value: Seq[Double])

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
      // NTZ → event-time TIMESTAMP via micros + timestamp_micros, the same
      // bijective map sessionize uses — a session-zone cast is lossy around
      // DST transitions and would shift window boundaries by the zone
      // offset for any non-UTC consumer
      .withColumn("ts", expr(
        "timestamp_micros(timestampdiff(MICROSECOND, timestamp_ntz'1970-01-01 00:00:00', ts))"))
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      // invert the map on the way out: window.start is an instant (NTZ
      // wall clock read as UTC), which would RENDER shifted by the zone
      // offset in any non-UTC session; emit the NTZ wall-clock start —
      // the source column's own space — instead
      .select(
        expr("timestampadd(MICROSECOND, unix_micros(window.start), timestamp_ntz'1970-01-01 00:00:00')")
          .as("w_start"),
        col("event_type"), col("n"), col("sum_value"))
  }

  /** Per-user sessionization over the events stream — CUSTOM streaming
    * state via `flatMapGroupsWithState` with an event-time timeout.
    *
    * A session is only emitted once the WATERMARK seals it (its end plus
    * the gap lies behind the watermark): until then an admissible
    * out-of-order event could still extend it, prepend to it, or bridge it
    * with a neighbor, so earlier emission could contradict batch
    * semantics. Events are therefore buffered per user, re-sessionized in
    * sorted order on every invocation, and the sealed prefix emitted —
    * giving session bounds and counts IDENTICAL to the batch
    * `evt_sessionize` catalog query for every admissible input, however
    * disordered across micro-batches (the double sum can differ in
    * low-order bits only: accumulation order at equal-timestamp ties is
    * (us, value) here vs the batch plan's hash-agg order).
    *
    * Scale shape: state per user is bounded by the watermark horizon
    * (sealed sessions leave state immediately), hash-partitioned by user —
    * the canonical bounded-state event-time aggregation.
    */
  def sessionize(spark: SparkSession, events: DataFrame,
                 gapMinutes: Int = 30): Dataset[SessionRow] = {
    import spark.implicits._
    val gapUs = gapMinutes * 60L * 1000000L
    // Event micros come from an NTZ-to-NTZ timestampdiff, so session
    // contents (like the batch twin's) never depend on the session time
    // zone. The watermark column must be TIMESTAMP, so it is REBUILT from
    // those micros via timestamp_micros(us) — a bijective map (NTZ wall
    // clock read as UTC instants) under any session TZ, unlike a session-
    // zone cast, which is lossy around DST transitions (a spring-forward
    // wall time shifts by an hour and sealing would drift). Watermark
    // millis therefore ARE the NTZ epoch millis: no zone conversion exists
    // anywhere in the seal/timeout logic. NOTE: this changes the watermark
    // SPACE — a checkpoint written by the old session-zone cast under a
    // non-UTC TZ is not resumable across this change (its committed
    // watermark would be reinterpreted, shifted by the zone offset); start
    // such streams from a fresh checkpoint.
    events
      .withColumn("us",
        expr("timestampdiff(MICROSECOND, timestamp_ntz'1970-01-01 00:00:00', ts)"))
      .withColumn("ts", expr("timestamp_micros(us)"))
      .withWatermark("ts", s"$gapMinutes minutes")
      .select(col("user_id").cast("long"), col("ts"), col("us"),
        col("value").cast("double"))
      .as[(Long, java.sql.Timestamp, Long, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(
        (user: Long, it: Iterator[(Long, java.sql.Timestamp, Long, Double)],
         state: GroupState[SessionBuf]) => {
          val incoming = it.map(e => (e._3, e._4)).toArray
          val prior = state.getOption
            .map(b => b.us.zip(b.value).toArray).getOrElse(Array.empty[(Long, Double)])
          val all = (prior ++ incoming).sortBy(identity)
          if (all.isEmpty) { state.remove(); Iterator.empty }
          else {
            // maximal gap-delimited sessions over the sorted buffer
            val sessions = scala.collection.mutable.ArrayBuffer(
              scala.collection.mutable.ArrayBuffer(all.head))
            all.iterator.drop(1).foreach { e =>
              if (e._1 - sessions.last.last._1 > gapUs)
                sessions += scala.collection.mutable.ArrayBuffer(e)
              else sessions.last += e
            }
            val wmUs = state.getCurrentWatermarkMs() * 1000L
            val (closed, open) = sessions.span(s => s.last._1 + gapUs < wmUs)
            val out = closed.map { s =>
              SessionRow(user, s.head._1, s.last._1, s.length.toLong, s.iterator.map(_._2).sum)
            }
            if (open.isEmpty) state.remove()
            else {
              val rest = open.flatten
              state.update(SessionBuf(rest.map(_._1).toSeq, rest.map(_._2).toSeq))
              // wake when the earliest retained session could seal
              // (timeout timestamps must be strictly above the watermark)
              val timeoutMs = open.head.last._1 / 1000L + gapUs / 1000L + 1L
              state.setTimeoutTimestamp(
                math.max(timeoutMs, state.getCurrentWatermarkMs() + 1L))
            }
            out.iterator
          }
        })
  }
}
