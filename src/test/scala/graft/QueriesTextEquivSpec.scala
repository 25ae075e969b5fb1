package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bit-exact equivalence of the r6 typed rewrites of textq_quality,
  * textq_repetition and textq_fingerprint against their former
  * expression forms (the shapes the DuckDB oracles were written against).
  * The expression forms are reconstructed here verbatim as the spec's
  * oracle, over (a) the real sf0.001 corpus and (b) an adversarial
  * in-memory corpus exercising the semantics the closures must replicate:
  * code-point length vs UTF-16 length (multi-byte, surrogate pairs),
  * ascii() of empty words, repeated/empty/single-word texts.
  */
class QueriesTextEquivSpec extends SparkTestBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def advCorpus: DataFrame = Seq(
    (1L, "the quick brown fox the quick"),
    (2L, "a"),
    (3L, ""),
    (4L, "  double  spaces  "),
    (5L, "héllo wörld ünïcode héllo"),
    (6L, "日本語 テスト 日本語"),
    (7L, "😀 emoji 😀 pair"), // surrogate pairs
    (8L, "x x x x x x x x"),
    (9L, "mixed ASCII und ümlaut ß"),
    (10L, "' quoted ' words '"),
    (11L, "Digits 123 and42 UPPER lower MiXeD a1z"),
    (12L, "tab\tchars and:punct,marks! x9y8"),
    (13L, "runsrunsruns zzz q 0 9")
  ).toDF("doc_id", "text")

  private def qualityExprForm(d: DataFrame): DataFrame = {
    val nltkEnSql = graft.text.Stopwords.english.toSeq.sorted
      .map(w => "'" + w.replace("'", "''") + "'").mkString(", ")
    d.withColumn("ws", split($"text", " "))
      .select($"doc_id",
        length($"text").as("n_chars_actual"),
        size($"ws").as("n_ws"),
        round(expr("aggregate(transform(ws, w -> length(w)), cast(0 as bigint), (s, x) -> s + x)").cast("double") / size($"ws"), 4).as("mean_wlen"),
        round(size(expr(s"filter(ws, w -> w IN ($nltkEnSql))")).cast("double") / size($"ws"), 4).as("stop_ratio"),
        round(size(array_distinct($"ws")).cast("double") / size($"ws"), 4).as("distinct_ratio"))
      .orderBy($"doc_id")
  }

  private def repetitionExprForm(d: DataFrame): DataFrame =
    d.select($"doc_id", expr("filter(split(text, ' '), x -> x <> '')").as("ws"))
      .withColumn("n", size($"ws"))
      .withColumn("bg", when($"n" >= 2, expr(
        "transform(sequence(0, size(ws)-2), i -> concat(ws[i], ' ', ws[i+1]))"))
        .otherwise(expr("cast(array() as array<string>)")))
      .select($"doc_id", $"n".as("n_words"),
        round(when($"n" > 0,
          lit(1.0) - size(array_distinct($"ws")).cast("double") / $"n")
          .otherwise(0.0), 4).as("dup_word_frac"),
        round(when($"n" >= 2,
          lit(1.0) - size(array_distinct($"bg")).cast("double") / ($"n" - 1))
          .otherwise(0.0), 4).as("dup_bigram_frac"),
        round(when($"n" > 0, expr(
          """aggregate(array_sort(ws),
            |  named_struct('prev', cast(null as string), 'run', 0, 'best', 0),
            |  (s, x) -> named_struct(
            |    'prev', x,
            |    'run', if(s.prev <=> x, s.run + 1, 1),
            |    'best', greatest(s.best, if(s.prev <=> x, s.run + 1, 1))),
            |  s -> s.best)""".stripMargin)
          .cast("double") / $"n").otherwise(0.0), 4).as("top_word_frac"))
      .orderBy($"doc_id")

  private def fingerprintExprForm(d: DataFrame): DataFrame =
    d.withColumn("ws", split($"text", " "))
      .select($"doc_id", expr(
        "aggregate(ws, cast(7 as bigint), (acc, w) -> (acc * 131 + length(w) * 31 + ascii(w)) % 1000000007)")
        .as("fingerprint"))
      .orderBy($"doc_id")

  private def tokencountExprForm(d: DataFrame): DataFrame =
    d.select($"doc_id",
      size(expr("regexp_extract_all(text, '[a-z]+|[0-9]|[^a-z0-9 ]', 0)")).as("n_bpeish"),
      size(split($"text", " ")).as("n_ws"))
      .orderBy($"doc_id")

  private def assertSame(got: DataFrame, want: DataFrame): Unit = {
    assert(got.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      want.schema.fields.map(f => (f.name, f.dataType)).toSeq)
    val g = got.collect().toSeq
    val w = want.collect().toSeq
    assert(g == w, s"rows differ:\n got=${g.take(5)}\nwant=${w.take(5)}")
  }

  test("textq_quality typed pass ≡ expression form on the sf0.001 corpus") {
    assertSame(Queries.all("textq_quality")(spark, sf),
      qualityExprForm(spark.read.parquet(s"$sf/documents.parquet")))
  }

  test("textq_repetition typed pass ≡ expression form on the sf0.001 corpus") {
    assertSame(Queries.all("textq_repetition")(spark, sf),
      repetitionExprForm(spark.read.parquet(s"$sf/documents.parquet")))
  }

  test("textq_fingerprint typed pass ≡ expression form on the sf0.001 corpus") {
    assertSame(Queries.all("textq_fingerprint")(spark, sf),
      fingerprintExprForm(spark.read.parquet(s"$sf/documents.parquet")))
  }

  test("textq_tokencount_bpe typed scanner ≡ regex form on the sf0.001 corpus") {
    assertSame(Queries.all("textq_tokencount_bpe")(spark, sf),
      tokencountExprForm(spark.read.parquet(s"$sf/documents.parquet")))
  }

  test("simhash word hash: raw md5 bytes ≡ DigestUtils.md5Hex 8-hex-char slice") {
    // pins the r6 dedup_simhash rewrite (per-partition MessageDigest, first
    // 4 bytes big-endian unsigned) against the original derivation
    for (w <- Seq("hello", "wörld", "日本語", "😀", "a", "don't", "x9y8", "ß"))
      {
        val ref = java.lang.Long.parseLong(
          org.apache.commons.codec.digest.DigestUtils.md5Hex(w).substring(0, 8), 16)
        val b = java.security.MessageDigest.getInstance("MD5")
          .digest(w.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        val h = ((b(0) & 0xffL) << 24) | ((b(1) & 0xffL) << 16) |
          ((b(2) & 0xffL) << 8) | (b(3) & 0xffL)
        assert(h == ref, s"hash mismatch for '$w'")
      }
  }

  test("typed passes ≡ expression forms on adversarial unicode/empty/dup texts") {
    val dir = tmpDir("textequiv")
    advCorpus.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    assertSame(Queries.all("textq_quality")(spark, dir), qualityExprForm(advCorpus))
    assertSame(Queries.all("textq_repetition")(spark, dir), repetitionExprForm(advCorpus))
    assertSame(Queries.all("textq_fingerprint")(spark, dir), fingerprintExprForm(advCorpus))
    assertSame(Queries.all("textq_tokencount_bpe")(spark, dir), tokencountExprForm(advCorpus))
  }
}
