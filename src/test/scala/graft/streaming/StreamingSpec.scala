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

  test("flatMapGroupsWithState sessionization ≡ batch evt_sessionize on closed sessions") {
    import org.apache.spark.sql.functions.col
    val sf = "/root/testdata/sf0.001"
    val events = spark.read.parquet(s"$sf/events.parquet")
    // two files split at the median ts: the second batch advances the global
    // watermark over the first's sessions, so tail sessions of batch 1 close
    // by EVENT-TIME TIMEOUT (not only inline by successor events)
    val srcDir = tmpDir("sess_src")
    val mid = events
      .selectExpr("percentile_approx(unix_micros(cast(ts as timestamp)), 0.5, 1000)")
      .head.get(0).asInstanceOf[Number].longValue
    val us = org.apache.spark.sql.functions.unix_micros(col("ts").cast("timestamp"))
    events.where(us <= mid).coalesce(1).write.parquet(s"$srcDir/p1")
    events.where(us > mid).coalesce(1).write.parquet(s"$srcDir/p2")

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
      .map(r => ((r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4)),
        (r.getLong(1), r.getDouble(5))))
    val expByKey = expected.map { case (k, v) => k -> v }.toMap

    assert(got.nonEmpty, "no sessions emitted")
    // every emitted session is exactly a batch session (bounds + count
    // exact; sums compared at the oracle's 2-dp rounding)
    got.foreach { case (u, s, e, n, sum) =>
      val v = expByKey.get((u, s, e, n))
      assert(v.isDefined, s"emitted session ($u,$s,$e,$n) not in batch result")
      assert(math.abs(BigDecimal(sum).setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
        - v.get._2) < 0.011, s"sum mismatch for ($u,$s,$e)")
    }
    // and every NON-LAST session per user must have been emitted (closed
    // inline by its successor event or by the advancing watermark)
    val lastPerUser = expected.groupBy(_._1._1).view
      .mapValues(_.maxBy(_._2._1)._1).toMap
    val gotKeys = got.map { case (u, s, e, n, _) => (u, s, e, n) }.toSet
    expected.foreach { case (k @ (u, _, _, _), (sid, _)) =>
      if (lastPerUser(u) != k)
        assert(gotKeys.contains(k), s"non-last session $k (ordinal $sid) was never emitted")
    }
  }
}
