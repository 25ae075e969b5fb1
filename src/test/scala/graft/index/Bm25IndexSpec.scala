package graft.index

import graft.SparkTestBase
import graft.text.Bm25Tokenizer

/** Distributed-index tests over the driver-provided documents table
  * (sf0.001, 500 docs): WAND ≡ exhaustive (rank- and bit-identical top-k),
  * point-score consistency, pruning-friendly stats.
  */
class Bm25IndexSpec extends SparkTestBase {
  import spark.implicits._

  lazy val indexDir: String = {
    val dir = tmpDir("idx_sf0001")
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .selectExpr("doc_id", "text as content").as[CorpusDoc]
    IndexBuilder.build(spark, docs, Bm25Tokenizer.default, dir,
      IndexBuildConfig(numShards = 4, shardGroups = 2),
      Map("input" -> "/root/testdata/sf0.001/documents.parquet"))
    dir
  }

  lazy val index = new Bm25Index(spark, indexDir)

  test("index builds with sane stats") {
    val m = index.manifest
    assert(m.nDocs === 500L)
    assert(m.avgdl > 0f)
    assert(m.metrics("postings") > 0)
    assert(m.metrics("bytesPerPosting") < 8.0,
      s"varbyte blocks should beat 8B/posting, got ${m.metrics("bytesPerPosting")}")
  }

  test("WAND top-k is rank- and score-identical to exhaustive") {
    for (q <- Seq("merge join sort", "spark window batch stream", "the fast key"); k <- Seq(5, 20)) {
      val ex = index.search(q, Some(k), mode = "exhaustive").collect()
      val wd = index.search(q, Some(k), mode = "wand").collect()
      assert(wd.map(_.doc_id).toSeq === ex.map(_.doc_id).toSeq, s"q='$q' k=$k ids")
      wd.zip(ex).foreach { case (w, e) =>
        assert(java.lang.Float.floatToRawIntBits(w.score) ===
          java.lang.Float.floatToRawIntBits(e.score), s"q='$q' k=$k doc ${w.doc_id}")
      }
    }
  }

  test("WAND ≡ exhaustive with repeated query tokens (multiplicity-scaled bounds)") {
    // A token repeated in the query contributes mult·idf·weight to the fold
    // (scorer.rs:109-123); WAND block bounds must scale by mult or they
    // under-estimate and skip blocks holding true top-k docs.
    // "keys key" stems to the same token twice — the post-stemming duplicate case.
    for (q <- Seq("merge merge join sort sort sort", "keys key", "batch batch batch stream");
         k <- Seq(3, 10)) {
      val ex = index.search(q, Some(k), mode = "exhaustive").collect()
      val wd = index.search(q, Some(k), mode = "wand").collect()
      assert(wd.map(_.doc_id).toSeq === ex.map(_.doc_id).toSeq, s"q='$q' k=$k ids")
      wd.zip(ex).foreach { case (w, e) =>
        assert(java.lang.Float.floatToRawIntBits(w.score) ===
          java.lang.Float.floatToRawIntBits(e.score), s"q='$q' k=$k doc ${w.doc_id}")
      }
    }
  }

  test("WAND fan-out exceeds numShards and stays rank/bit-identical (range split)") {
    // 4 sub-ranges per shard on a 4-shard index → 16 groups > 4 shards:
    // query parallelism is no longer capped by the shard count.
    val fanned = new Bm25Index(spark, indexDir, wandRangesPerShard = 4)
    assert(fanned.wandFanoutRangesPerShard === 4)
    assert(fanned.manifest.numShards * fanned.wandFanoutRangesPerShard >
      fanned.manifest.numShards)
    for (q <- Seq("merge join sort", "the fast key", "keys key"); k <- Seq(5, 20)) {
      val ex = index.search(q, Some(k), mode = "exhaustive").collect()
      val wd = fanned.search(q, Some(k), mode = "wand").collect()
      assert(wd.map(_.doc_id).toSeq === ex.map(_.doc_id).toSeq, s"q='$q' k=$k ids")
      wd.zip(ex).foreach { case (w, e) =>
        assert(java.lang.Float.floatToRawIntBits(w.score) ===
          java.lang.Float.floatToRawIntBits(e.score), s"q='$q' k=$k doc ${w.doc_id}")
      }
    }
  }

  test("scoreDoc matches the search score for a hit, None for absent doc") {
    val q = "merge join sort"
    val top = index.search(q, Some(3)).collect()
    assert(top.nonEmpty)
    top.foreach { h =>
      val s = index.scoreDoc(h.doc_id, q)
      assert(s.isDefined)
      assert(java.lang.Float.floatToRawIntBits(s.get) ===
        java.lang.Float.floatToRawIntBits(h.score))
    }
    assert(index.scoreDoc(999999999L, q).isEmpty)
  }

  test("empty query and unknown terms yield empty results") {
    assert(index.search("", Some(5)).isEmpty)
    assert(index.search("zzzunseenwordzzz", Some(5)).isEmpty)
  }

  test("empty and single-doc corpora build queryable indexes") {
    val emptyDir = tmpDir("idx_empty")
    IndexBuilder.build(spark, spark.emptyDataset[CorpusDoc], Bm25Tokenizer.default,
      emptyDir, IndexBuildConfig(numShards = 2, shardGroups = 1, uniformIdSpace = true))
    val emptyIdx = new Bm25Index(spark, emptyDir)
    assert(emptyIdx.nDocs === 0L)
    assert(emptyIdx.manifest.avgdl === 256.0f) // fallback, embedder.rs:129
    assert(emptyIdx.search("anything", Some(5)).isEmpty)

    val oneDir = tmpDir("idx_one")
    IndexBuilder.build(spark, Seq(CorpusDoc(1L, "solitary spark document")).toDS(),
      Bm25Tokenizer.default, oneDir, IndexBuildConfig(numShards = 2, shardGroups = 1))
    val oneIdx = new Bm25Index(spark, oneDir)
    val hits = oneIdx.search("spark", None).collect()
    assert(hits.length === 1 && hits.head.doc_id === 1L && hits.head.score > 0f)
  }

  test("doc-range-sliced merge (buildRangeBits) ≡ unsliced build, bit-exact") {
    // The hot-term escape valve: slicing each merge group by doc-id top bits
    // means no reduce task holds a whole posting list; blocks are then
    // emitted per slice and readers order by min_doc. Ids must span the id
    // space for slices to actually split.
    val words = Seq("merge", "join", "sort", "spark", "key", "fast", "scan", "row")
    val docs0 = (0 until 400).map { i =>
      val rnd = new scala.util.Random(i)
      CorpusDoc(i.toLong * (Long.MaxValue / 401),
        Seq.fill(6 + rnd.nextInt(10))(words(rnd.nextInt(words.length))).mkString(" "))
    }
    val plain = tmpDir("rb_plain")
    val sliced = tmpDir("rb_sliced")
    IndexBuilder.build(spark, spark.createDataset(docs0), Bm25Tokenizer.default, plain,
      IndexBuildConfig(numShards = 4, shardGroups = 1, uniformIdSpace = true))
    IndexBuilder.build(spark, spark.createDataset(docs0), Bm25Tokenizer.default, sliced,
      IndexBuildConfig(numShards = 4, shardGroups = 1, uniformIdSpace = true, buildRangeBits = 3))

    def decoded(dir: String): Seq[(Int, Long, Long, Int, Int)] =
      spark.read.parquet(s"$dir/postings")
        .select($"shard", $"term", $"cnt", $"docs", $"tfs", $"dls")
        .as[(Int, Long, Int, Array[Byte], Array[Byte], Array[Byte])]
        .flatMap { case (s, t, c, d, tf, dl) =>
          val ds = PostingCodec.decodeDeltas(d, c)
          val tfs = PostingCodec.decodeInts(tf, c)
          val dls = PostingCodec.decodeInts(dl, c)
          Iterator.tabulate(c)(i => (s, t, ds(i), tfs(i), dls(i)))
        }.collect().sorted.toSeq
    assert(decoded(sliced) === decoded(plain))

    val ip = new Bm25Index(spark, plain)
    val is = new Bm25Index(spark, sliced)
    for (q <- Seq("merge join", "spark fast key", "sort sort row"); k <- Seq(5, 20)) {
      val a = ip.search(q, Some(k), "wand").collect()
      val b = is.search(q, Some(k), "wand").collect()
      assert(a.map(_.doc_id).toSeq === b.map(_.doc_id).toSeq, s"q='$q'")
      a.zip(b).foreach { case (x, y) =>
        assert(java.lang.Float.floatToRawIntBits(x.score) ===
          java.lang.Float.floatToRawIntBits(y.score), s"q='$q' doc ${x.doc_id}")
      }
    }
  }

  test("64-bit term hashes (fx64) survive build + search, identical ranks to fx32") {
    // Round-2's run format packed skey = shard<<32 + term, silently
    // truncating 64-bit hashes; this gates the fixed format end-to-end.
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .selectExpr("doc_id", "text as content").as[CorpusDoc]
    val dir = tmpDir("idx_fx64")
    IndexBuilder.build(spark, docs, Bm25Tokenizer.default, dir,
      IndexBuildConfig(numShards = 4, shardGroups = 2),
      hasher = graft.bm25.Fx64Hasher)
    // the index must actually contain terms above the 32-bit range
    val wide = spark.read.parquet(s"$dir/postings")
      .where($"term" > (1L << 32)).count()
    assert(wide > 0L, "fx64 index should hold terms > 2^32")
    val idx64 = new Bm25Index(spark, dir)
    for (q <- Seq("merge join sort", "the fast key", "spark window batch stream");
         k <- Seq(5, 20)) {
      // same tokenizer + same corpus ⇒ identical tf/dl/df per matched doc:
      // scores and ranks must be bit-identical across hash spaces (the hash
      // only names the term), and WAND must agree with exhaustive.
      val h32 = index.search(q, Some(k), "exhaustive").collect()
      val ex64 = idx64.search(q, Some(k), "exhaustive").collect()
      val wd64 = idx64.search(q, Some(k), "wand").collect()
      assert(ex64.map(_.doc_id).toSeq === h32.map(_.doc_id).toSeq, s"q='$q' k=$k vs fx32")
      ex64.zip(h32).foreach { case (a, b) =>
        assert(java.lang.Float.floatToRawIntBits(a.score) ===
          java.lang.Float.floatToRawIntBits(b.score), s"q='$q' doc ${a.doc_id}")
      }
      assert(wd64.map(_.doc_id).toSeq === ex64.map(_.doc_id).toSeq, s"q='$q' k=$k wand")
      wd64.zip(ex64).foreach { case (a, b) =>
        assert(java.lang.Float.floatToRawIntBits(a.score) ===
          java.lang.Float.floatToRawIntBits(b.score), s"q='$q' doc ${a.doc_id} wand")
      }
    }
  }

  test("negative custom-hasher terms route to the builder's termstats bucket") {
    // manifest.bucketOf must agree with the builder's pmod for terms < 0
    val m = index.manifest
    assert(m.bucketOf(-1L) === ((-1L % m.termBuckets) + m.termBuckets) % m.termBuckets)
    assert(m.bucketOf(-1L) >= 0 && m.bucketOf(Long.MinValue) >= 0)
    assert(m.bucketOf(7L) === 7 % m.termBuckets)
  }

  test("df from termstats equals live distinct count from postings") {
    val terms = index.queryTerms("merge join").distinct
    val dfs = index.termDfs(terms)
    val live = index.postingsFor(terms).groupByKey(_.term).count().collect().toMap
    terms.foreach { t =>
      assert(dfs.get(t) === live.get(t), s"term $t df mismatch")
    }
  }
}
