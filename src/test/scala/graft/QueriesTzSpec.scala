package graft

/** Session-time-zone independence of the timestamp-bearing catalog entries:
  * `evt_sessionize` derives epoch micros from the TIMESTAMP_NTZ events
  * column via an NTZ-to-NTZ timestampdiff, so the result must be identical
  * under ANY session TZ (the DuckDB oracle's epoch_us is TZ-free too — a
  * session-TZ-dependent cast would diverge for every non-UTC consumer).
  */
class QueriesTzSpec extends SparkTestBase {
  private val sf = "/root/testdata/sf0.001"

  private def tzInvariant(query: String): Unit = {
    def run(): Array[String] =
      Queries.all(query)(spark, sf).collect().map(_.toString)
    val utc = run()
    assert(utc.nonEmpty)
    val saved = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "America/New_York")
      assert(run().toSeq === utc.toSeq)
      spark.conf.set("spark.sql.session.timeZone", "Asia/Kolkata") // half-hour offset
      assert(run().toSeq === utc.toSeq)
    } finally spark.conf.set("spark.sql.session.timeZone", saved)
  }

  test("evt_sessionize is invariant under the session time zone") {
    tzInvariant("evt_sessionize")
  }

  test("evt_window_agg is invariant under the session time zone") {
    tzInvariant("evt_window_agg")
  }
}
