package graft.index

import graft.SparkTestBase
import graft.text.Bm25Tokenizer

/** The multi-way merge compactor must produce an index whose decoded content
  * equals a from-scratch build over the post-mutation corpus (same bounds,
  * same frozen avgdl) — posting multisets, termstats and search results all
  * identical.
  */
class CompactorSpec extends SparkTestBase {
  import spark.implicits._

  test("merge-compacted index ≡ fresh build over the live corpus") {
    val tok = Bm25Tokenizer.default
    val baseDocs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .selectExpr("doc_id", "text as content").as[CorpusDoc]

    val baseDir = tmpDir("cmp_base")
    val cfg = IndexBuildConfig(numShards = 4, shardGroups = 1)
    val baseManifest = IndexBuilder.build(spark, baseDocs, tok, baseDir, cfg)

    // deltas: remove docs 3 and 7, update doc 5, add two new docs
    val superseded = Array(3L, 7L, 5L)
    val deltaDocs = Seq(
      CorpusDoc(5L, "spark merge sort window stream"),
      CorpusDoc(100001L, "hash join broadcast table scan"),
      CorpusDoc(100002L, "filter group agg query row")).toDS()

    val mergedDir = tmpDir("cmp_merged")
    val merged = Compactor.merge(spark, baseDir, mergedDir, deltaDocs, superseded, tok, cfg)
    assert(merged.nDocs === 500L - 3 + 3) // 2 removed, 1 replaced, 2 added
    assert(merged.avgdl === baseManifest.avgdl) // frozen

    // fresh build over the equivalent live corpus with the same bounds+avgdl
    val liveDocs = baseDocs.filter(d => !superseded.contains(d.doc_id)).union(deltaDocs)
    val freshDir = tmpDir("cmp_fresh")
    // carry the base bounds so sharding is identical
    Checkpoints.commit(freshDir, "bounds", Map(
      "bounds" -> baseManifest.shardBounds.mkString(","), "numShards" -> cfg.numShards))
    IndexBuilder.build(spark, liveDocs, tok, freshDir, cfg,
      avgdlOverride = Some(baseManifest.avgdl))

    def postingsSig(dir: String): Seq[String] = {
      val idx = new Bm25Index(spark, dir)
      spark.read.parquet(s"$dir/postings")
        .select($"shard", $"term", $"cnt", $"docs", $"tfs", $"dls")
        .as[(Int, Long, Int, Array[Byte], Array[Byte], Array[Byte])]
        .flatMap { case (s, t, c, d, tf, dl) =>
          val ds = PostingCodec.decodeDeltas(d, c)
          val tfs = PostingCodec.decodeInts(tf, c)
          val dls = PostingCodec.decodeInts(dl, c)
          Iterator.tabulate(c)(i => s"$s|$t|${ds(i)}|${tfs(i)}|${dls(i)}")
        }.collect().sorted.toSeq ++ {
          val _ = idx
          spark.read.parquet(s"$dir/termstats").select($"term", $"df")
            .collect().map(_.toString).sorted.toSeq
        }
    }
    assert(postingsSig(mergedDir) === postingsSig(freshDir))

    // search equivalence, bit-exact
    val qm = new Bm25Index(spark, mergedDir)
    val qf = new Bm25Index(spark, freshDir)
    for (q <- Seq("merge sort", "hash join table", "spark window")) {
      val a = qm.search(q, None).collect().toSeq
      val b = qf.search(q, None).collect().toSeq
      assert(a.map(_.doc_id) === b.map(_.doc_id), s"q='$q'")
      a.zip(b).foreach { case (x, y) =>
        assert(java.lang.Float.floatToRawIntBits(x.score) ===
          java.lang.Float.floatToRawIntBits(y.score), s"q='$q' doc ${x.doc_id}")
      }
    }
  }
}
