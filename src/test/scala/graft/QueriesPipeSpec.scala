package graft

/** Pipeline-op invariants beyond the DuckDB value gate:
  * `pipe_pack_bins`' distributed prefix sum must agree with a sequential
  * reference even when one source dominates the corpus (the straggler
  * scenario the two-phase scan exists for), and `pipe_sample_mix` must
  * fail loudly — not silently drop a stratum — on a malformed source id,
  * matching the oracle's raising cast.
  */
class QueriesPipeSpec extends SparkTestBase {
  import spark.implicits._

  private def writeDocs(dir: String, rows: Seq[(Long, String, String)]): String = {
    rows.toDF("doc_id", "source", "text").write.parquet(s"$dir/documents.parquet")
    dir
  }

  test("pack-bins matches the sequential reference on a skew-dominant source") {
    // one source with 4000 docs (spans many range partitions) + two tiny
    // ones; distributed offsets must stitch the slices into the exact
    // per-source running sum
    val rows = (0L until 4000L).map(i =>
      (i, "src0", ("tok " * (1 + (i % 7).toInt)).trim)) ++
      Seq((4000L, "src1", "a b c"), (4001L, "src2", "d e"), (4002L, "src1", "f g h i"))
    val dir = writeDocs(tmpDir("packskew"), rows)
    val got = Queries.all("pipe_pack_bins")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getLong(3)))

    // sequential reference: running token sum per source in doc_id order
    val expected = rows.sortBy(_._1).groupBy(_._2).flatMap { case (_, docs) =>
      var acc = 0L
      docs.sortBy(_._1).map { case (id, src, text) =>
        val n = text.split(" ").count(_.nonEmpty)
        val r = (id, src, n, acc / 2048L); acc += n; r
      }
    }.toSeq.sortBy(_._1)
    assert(got.toSeq === expected)
    // the dominant source must actually have crossed bin boundaries
    assert(got.filter(_._2 == "src0").map(_._4).distinct.length > 3)
  }

  test("sample-mix fails loudly on a malformed source id") {
    val dir = writeDocs(tmpDir("badsrc"), Seq(
      (0L, "src0", "alpha beta"), (1L, "srcX", "gamma delta")))
    val ex = intercept[Exception] {
      Queries.all("pipe_sample_mix")(spark, dir).collect()
    }
    val messages = Iterator.iterate(ex: Throwable)(_.getCause).takeWhile(_ != null)
      .map(e => Option(e.getMessage).getOrElse("")).mkString(" | ")
    assert(messages.contains("malformed source id"),
      s"expected the loud malformed-source error, got: $messages")
  }
}
