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
}
