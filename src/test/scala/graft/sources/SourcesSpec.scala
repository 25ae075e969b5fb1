package graft.sources

import graft.SparkTestBase
import graft.fixtures.Fixtures
import graft.index.{Bm25Index, IndexBuildConfig, IndexBuilder}
import graft.text.{Bm25Tokenizer, Language}
import org.apache.spark.sql.functions._

/** Production input shape (input_hint): determinism of the synthetic code
  * corpus, the (repo, path, commit) surrogate-id adapter, the per-row
  * sha256 content invariant, and an end-to-end build+search through the
  * input-shaped table.
  */
class SourcesSpec extends SparkTestBase {
  import spark.implicits._

  test("code corpus is deterministic and Zipf-skewed") {
    val a = CodeCorpus.generate(spark, 500, seed = 42L, partitions = 4)
    val b = CodeCorpus.generate(spark, 500, seed = 42L, partitions = 7) // different partitioning
    val shaA = TableIO.contentSha(a).agg(md5(concat_ws("", collect_list($"sha256")))).head().getString(0)
    // content identical regardless of partitioning; ordered fingerprint:
    val rowsA = TableIO.contentSha(a).orderBy($"path").collect().map(_.toString).toSeq
    val rowsB = TableIO.contentSha(b).orderBy($"path").collect().map(_.toString).toSeq
    assert(rowsA === rowsB)
    assert(shaA.nonEmpty)
    // sizes within 10..2000 tokens; langs cycle
    val stats = a.select(size(split($"content", "[\\s\\n]+")).as("n"), $"lang")
    val mm = stats.agg(min($"n"), max($"n")).head()
    assert(mm.getInt(0) >= 10 && mm.getInt(1) <= 2000)
    assert(stats.select($"lang").distinct().count() === 4)
    // Zipf skew: the most frequent identifier should dominate the median one
    val tf = a.select(explode(split($"content", "[\\s\\n]+")).as("t"))
      .groupBy($"t").count().orderBy($"count".desc).collect()
    assert(tf.head.getLong(1) > 20L * tf(tf.length / 2).getLong(1))
  }

  test("corpus round-trips identically through every shipped source format") {
    val files = CodeCorpus.generate(spark, 200, seed = 7L, partitions = 2)
    val base = tmpDir("fmt_corpus")
    files.write.parquet(s"$base/c_parquet")
    files.write.orc(s"$base/c_orc")
    files.write.json(s"$base/c_json")
    files.write.option("header", "true").option("escape", "\"")
      .option("ignoreLeadingWhiteSpace", "false")
      .option("ignoreTrailingWhiteSpace", "false")
      .csv(s"$base/c_csv")
    def fingerprint(src: String, fmt: String = "auto"): Seq[String] =
      TableIO.contentSha(TableIO.readCorpus(spark, src, fmt))
        .orderBy($"repo", $"path", $"commit").collect().map(_.toString).toSeq
    val expected = fingerprint(s"$base/c_parquet")
    assert(expected.length === 200)
    // suffix-inferred formats
    assert(fingerprint(s"$base/c_orc") === expected)
    assert(fingerprint(s"$base/c_json") === expected)
    assert(fingerprint(s"$base/c_csv") === expected)
    // explicit format override beats inference
    assert(fingerprint(s"$base/c_orc", "orc") === expected)
  }

  test("surrogate ids are unique and stable") {
    val files = CodeCorpus.generate(spark, 2000, seed = 42L)
    val docs = TableIO.toCorpusDocs(files)
    TableIO.assertUniqueIds(docs)
    assert(TableIO.docId("a", "b", "c") === TableIO.docId("a", "b", "c"))
    assert(TableIO.docId("a", "b", "c") !== TableIO.docId("a", "b", "d"))
  }

  test("recipes map into the input shape with sha256 content equality, and search end-to-end") {
    // FIXTURES.md §4 recipes-mapped: the parity corpus in production shape.
    val recipes = Fixtures.recipesEn
    val files = recipes.map(r => CodeFile("recipes_en", r.title, "v2.3.2", "en", r.method)).toDS()
    // per-row invariant: sha256(content) equals sha256 of the CSV field
    // duplicate titles exist in the corpus → compare per-title sha multisets
    val got = TableIO.contentSha(files).select($"path", $"sha256").collect()
      .map(r => r.getString(0) -> r.getString(1)).groupMap(_._1)(_._2)
      .view.mapValues(_.sorted.toSeq).toMap
    val exp = recipes.map(r => r.title -> org.apache.commons.codec.digest.DigestUtils
        .sha256Hex(r.method.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
      .groupMap(_._1)(_._2).view.mapValues(_.sorted.toSeq).toMap
    assert(got === exp, "per-row sha256 content invariant")
    // end-to-end through the production shape: ingest → index → search.
    // Duplicate titles = duplicate (repo, path, commit) keys = same doc id
    // by design; last-wins dedup mirrors the upsert-replacement semantics.
    val docs = TableIO.toCorpusDocs(files)
    val dir = tmpDir("input_shape_idx")
    val lastByTitle = recipes.map(r => r.title -> r.method).toMap
    val deduped = lastByTitle.toSeq.map { case (t, m) =>
      graft.index.CorpusDoc(TableIO.docId("recipes_en", t, "v2.3.2"), m)
    }.toDS()
    TableIO.assertUniqueIds(deduped)
    val avgdl = graft.bm25.Embedder.fitAvgdlLocal(recipes.map(_.method), Bm25Tokenizer(Language.English))
    IndexBuilder.build(spark, deduped, Bm25Tokenizer(Language.English), dir,
      IndexBuildConfig(numShards = 2, shardGroups = 1), Map("input" -> "recipes_en"),
      Some(avgdl))
    val idx = new Bm25Index(spark, dir)
    val hits = idx.search("bake", None).collect()
    assert(hits.length === 16) // same candidate set as the EN search snapshot
    assert(hits.forall(_.score > 0f))
  }
}
