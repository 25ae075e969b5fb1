package graft.streaming

import graft.SparkTestBase
import graft.api.{Doc, SearchEngine}
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

class StreamingSpec extends SparkTestBase {
  import spark.implicits._

  test("streaming ingest upserts micro-batches into the engine") {
    val srcDir = tmpDir("stream_src")
    val ckDir = tmpDir("stream_ck")
    val engDir = tmpDir("stream_eng")
    // seed two parquet files (two micro-batches with AvailableNow + maxFilesPerTrigger)
    Seq(Doc("a", "spark shuffle join"), Doc("b", "merge sort run"))
      .toDS().coalesce(1).write.parquet(s"$srcDir/batch1")
    Seq(Doc("c", "window state stream"), Doc("a", "spark catalyst optimizer"))
      .toDS().coalesce(1).write.parquet(s"$srcDir/batch2")

    val schema = StructType(Seq(
      StructField("id", StringType), StructField("contents", StringType)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$srcDir/*")
      .as[Doc]

    val engine = SearchEngine.withAvgdl(spark, engDir, 3.0f)
    val q = StreamingIngest.ingest(stream, engine, ckDir, trigger = Trigger.AvailableNow())
    q.awaitTermination(120000)

    assert(engine.count() === 3) // a (updated), b, c
    val r = engine.search("spark", None)
    assert(r.map(_.id) === Seq("a"))
    assert(r.head.contents === "spark catalyst optimizer") // latest version wins
    assert(engine.search("stream", None).map(_.id) === Seq("c"))
  }

  test("watermarked windowed aggregation over the events stream") {
    val events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val srcDir = tmpDir("evt_src")
    events.write.parquet(s"$srcDir/data")
    val stream = spark.readStream.schema(events.schema).parquet(s"$srcDir/data")
    val agg = StreamingIngest.windowedEventCounts(spark, stream)
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("evt_out")
      .option("checkpointLocation", tmpDir("evt_ck"))
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    // append mode emits only watermark-closed windows; with a single batch
    // the final windows stay open, so compare the CLOSED prefix against the
    // batch computation over the same frame.
    val got = spark.sql("select * from evt_out")
    val batch = StreamingIngest.windowedEventCounts(spark, events)
    val gotRows = got.orderBy("w_start", "event_type").collect()
    val batchRows = batch.orderBy("w_start", "event_type").collect()
      .take(gotRows.length)
    assert(gotRows.length > 0, "no closed windows emitted")
    assert(gotRows.map(_.toString).toSeq === batchRows.map(_.toString).toSeq)
  }

  test("flatMapGroupsWithState sessionization ≡ batch evt_sessionize on sealed sessions") {
    import org.apache.spark.sql.functions.{col, unix_micros}
    val sf = "/root/testdata/sf0.001"
    val gapUs = 30L * 60L * 1000000L
    val events = spark.read.parquet(s"$sf/events.parquet")
    // THREE files engineered for cross-batch DISORDER: half the events in
    // the 15-minute band below the median cut are withheld into file p2, so
    // batch 2 delivers admissible LATE events (above batch 1's watermark,
    // below batch 1's max event time) that must prepend to / bridge batch-1
    // sessions; p3 carries the ordered remainder and the final watermark.
    val srcDir = tmpDir("sess_src")
    val mid = events
      .selectExpr("percentile_approx(unix_micros(cast(ts as timestamp)), 0.5, 1000)")
      .head.get(0).asInstanceOf[Number].longValue
    val band = mid - gapUs / 2
    val us = unix_micros(col("ts").cast("timestamp"))
    val late = us > band && us <= mid && col("event_id") % 2 === 0
    events.where(us <= mid && !late).coalesce(1).write.parquet(s"$srcDir/p1")
    events.where(late).coalesce(1).write.parquet(s"$srcDir/p2")
    events.where(us > mid).coalesce(1).write.parquet(s"$srcDir/p3")

    val stream = spark.readStream.schema(events.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$srcDir/*")
    val q = StreamingIngest.sessionize(spark, stream).writeStream
      .outputMode("append").format("memory").queryName("sess_out")
      .option("checkpointLocation", tmpDir("sess_ck"))
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(180000)

    val got = spark.sql("select * from sess_out").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    // batch truth from the catalog query (sum_value pre-rounded there)
    val expected = graft.Queries.all("evt_sessionize")(spark, sf).collect()
      .map(r => ((r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4)), r.getDouble(5)))
    val expByKey = expected.toMap

    assert(got.nonEmpty, "no sessions emitted")
    // every emitted session is exactly a batch session (bounds + count
    // exact; sums compared at the oracle's 2-dp rounding)
    got.foreach { case (u, s, e, n, sum) =>
      val v = expByKey.get((u, s, e, n))
      assert(v.isDefined, s"emitted session ($u,$s,$e,$n) not in batch result")
      assert(math.abs(BigDecimal(sum).setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
        - v.get) < 0.011, s"sum mismatch for ($u,$s,$e)")
    }
    // and the emitted set is EXACTLY the watermark-sealed prefix: every
    // batch session sealed by the final watermark (end + gap behind it,
    // with a 1 s slack for the ms-granularity watermark) must have been
    // emitted — however its events were scattered across batches
    val maxUs = events.select(org.apache.spark.sql.functions.max(us)).head.getLong(0)
    val finalWmUs = maxUs - gapUs
    val gotKeys = got.map { case (u, s, e, n, _) => (u, s, e, n) }.toSet
    val mustEmit = expected.collect {
      case (k @ (_, _, e, _), _) if e + gapUs + 1000000L < finalWmUs => k
    }
    assert(mustEmit.nonEmpty)
    mustEmit.foreach { k =>
      assert(gotKeys.contains(k), s"sealed session $k was never emitted")
    }
  }
}
