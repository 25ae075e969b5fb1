package graft.index

import graft.bm25.{Bm25Params, Embedder}
import graft.text.{Bm25Tokenizer, FxHash, Language, TextTokenizer}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One decoded posting: a (doc, term) pair with integer tf and the doc's
  * token count.
  */
final case class Posting(doc_id: Long, term: Long, tf: Int, dl: Int)

final case class ScoredDoc(doc_id: Long, score: Float)

/** Distributed BM25 retrieval over a built index (SURVEY §3.1 plan):
  * driver-side query embedding (pure function, no job) → term-stat lookup
  * with bucket/row-group pruning → pruned posting-block scan → per-candidate
  * f32 score fold (query-occurrence order, `/root/reference/src/scorer.rs:109-123`)
  * → `TakeOrderedAndProject` top-k.
  *
  * Candidate generation is disjunctive (docs sharing ≥1 query term,
  * `scorer.rs:79-97`); ties are broken deterministically (score desc,
  * doc_id asc) — the reference's tie order is HashSet-nondeterministic and
  * its own snapshot tests sort by id (`search.rs:497-498`).
  *
  * Two physical modes:
  *   - `exhaustive`: scores every candidate (the reference semantics,
  *     1:1; used as the parity gate and as the WAND cross-check).
  *   - `wand`: block-max WAND with a per-partition top-k heap — skips
  *     decoding blocks whose upper bound cannot enter the current top-k.
  *     Safe/exact for monotone additive scores, so rank-identical.
  */
final class Bm25Index(spark: SparkSession, val indexDir: String,
                      customTokenizer: Option[TextTokenizer] = None,
                      k1: Float = 1.2f, b: Float = 0.75f) extends Serializable {
  import spark.implicits._

  val manifest: IndexManifest = IndexManifest.read(indexDir)

  val tokenizer: TextTokenizer = customTokenizer.getOrElse {
    val tc = manifest.tokenizer
    require(tc.language != "custom",
      "index was built with a custom tokenizer; pass it to Bm25Index explicitly")
    Bm25Tokenizer(Language.fromName(tc.language).getOrElse(Language.English),
      tc.normalization, tc.stopwords, tc.stemming)
  }

  val params: Bm25Params = Bm25Params(k1, b, manifest.avgdl)
  private val embedder = new Embedder(params, tokenizer)

  def nDocs: Long = manifest.nDocs

  /** IDF exactly as `scorer.rs:99-107`: f32 throughout, df = number of docs
    * containing the term, N = total docs.
    */
  def idf(df: Long): Float = graft.bm25.Bm25Math.idf(nDocs, df)

  /** df lookup for query terms: bucket-pruned termstats scan (reads only the
    * term buckets the query touches, then row-group pruning via the sorted
    * term column).
    */
  def termDfs(terms: Array[Long]): Map[Long, Long] = {
    if (terms.isEmpty) return Map.empty
    val buckets = terms.map(manifest.bucketOf).distinct
    spark.read.parquet(s"$indexDir/termstats")
      .where($"bucket".isin(buckets: _*) && $"term".isin(terms: _*))
      .select($"term", $"df")
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
  }

  /** Decoded postings of the given terms (pruned scan over posting blocks). */
  def postingsFor(terms: Array[Long]): Dataset[Posting] = {
    if (terms.isEmpty) return spark.emptyDataset[Posting]
    spark.read.parquet(s"$indexDir/postings")
      .where($"term".isin(terms: _*))
      .select($"term", $"cnt", $"docs", $"tfs", $"dls")
      .as[(Long, Int, Array[Byte], Array[Byte], Array[Byte])]
      .flatMap { case (term, cnt, docsB, tfsB, dlsB) =>
        val docs = PostingCodec.decodeDeltas(docsB, cnt)
        val tfs = PostingCodec.decodeInts(tfsB, cnt)
        val dls = PostingCodec.decodeInts(dlsB, cnt)
        Iterator.tabulate(cnt)(i => Posting(docs(i), term, tfs(i), dls(i)))
      }
  }

  /** Query-occurrence term sequence (duplicates preserved, in token order) —
    * the f32 accumulation order of the reference's score kernel.
    */
  def queryTerms(query: String): Array[Long] =
    tokenizer.tokenize(query).map(FxHash.hash32u)

  /** Top-k search over the index. Returns (doc_id, score) sorted by
    * (score desc, doc_id asc), limited to `limit` if given — all documents
    * sharing ≥1 query term otherwise (the reference's unlimited search).
    */
  def search(query: String, limit: Option[Int] = None, mode: String = "exhaustive"): Dataset[ScoredDoc] = {
    val qOcc = queryTerms(query)
    if (qOcc.isEmpty) return spark.emptyDataset[ScoredDoc]
    val distinctTerms = qOcc.distinct
    val dfs = termDfs(distinctTerms)
    val idfs: Map[Long, Float] = distinctTerms.iterator.map(t => t -> idf(dfs.getOrElse(t, 0L))).toMap
    val present = distinctTerms.filter(dfs.contains)
    if (present.isEmpty) return spark.emptyDataset[ScoredDoc]

    val scored = mode match {
      case "wand" if limit.isDefined => wandTopK(qOcc, present, idfs, limit.get)
      case _                         => exhaustive(qOcc, present, idfs)
    }
    val sorted = scored.orderBy($"score".desc, $"doc_id".asc)
    limit.map(sorted.limit).getOrElse(sorted).as[ScoredDoc]
  }

  /** Reference-exact scoring of every candidate (disjunctive union). */
  private def exhaustive(qOcc: Array[Long], present: Array[Long],
                         idfs: Map[Long, Float]): Dataset[ScoredDoc] = {
    val emb = embedder
    val qOccB = spark.sparkContext.broadcast(qOcc)
    val idfB = spark.sparkContext.broadcast(idfs)
    postingsFor(present)
      .groupByKey(_.doc_id)
      .mapGroups { (docId, rows) =>
        val values = new java.util.HashMap[Long, Float](16)
        rows.foreach(p => values.putIfAbsent(p.term, emb.weight(p.tf, p.dl)))
        var score = 0.0f
        val occ = qOccB.value
        val idfMap = idfB.value
        var i = 0
        while (i < occ.length) {
          val v = values.get(occ(i)) // 0.0f when absent — adding 0f is exact
          if (v != 0.0f) score += idfMap(occ(i)) * v
          i += 1
        }
        ScoredDoc(docId, score)
      }
  }

  /** Block-max WAND: per partition, candidate blocks are merged doc-at-a-time
    * per term with a k-sized heap; a doc is fully scored only if the sum of
    * its terms' block upper bounds can beat the current k-th score. Upper
    * bounds use nextUp-padded f32 weights, so pruning is conservative
    * (rank-identical to exhaustive — asserted in Bm25IndexSpec).
    */
  private def wandTopK(qOcc: Array[Long], present: Array[Long],
                       idfs: Map[Long, Float], k: Int): Dataset[ScoredDoc] = {
    val emb = embedder
    val qOccB = spark.sparkContext.broadcast(qOcc)
    val idfB = spark.sparkContext.broadcast(idfs)
    val blocks = spark.read.parquet(s"$indexDir/postings")
      .where($"term".isin(present: _*))
      .select($"shard", $"term", $"cnt", $"max_tf", $"min_dl", $"docs", $"tfs", $"dls")
      .as[(Int, Long, Int, Int, Int, Array[Byte], Array[Byte], Array[Byte])]
      .repartition($"shard")
    val partial = blocks.mapPartitions { it =>
      val occ = qOccB.value
      val idfMap = idfB.value
      val heap = new java.util.PriorityQueue[ScoredDoc](k + 1,
        (a: ScoredDoc, b: ScoredDoc) =>
          if (a.score != b.score) java.lang.Float.compare(a.score, b.score)
          else java.lang.Long.compare(b.doc_id, a.doc_id)) // min-heap on (score, -doc_id)
      // Gather this partition's blocks by doc via streaming merge: decode is
      // gated on the block-max bound vs the current heap threshold.
      val byTerm = new scala.collection.mutable.HashMap[Long, scala.collection.mutable.ArrayBuffer[(Int, Int, Int, Array[Byte], Array[Byte], Array[Byte])]]()
      it.foreach { case (_, term, cnt, maxTf, minDl, d, t, l) =>
        byTerm.getOrElseUpdate(term, scala.collection.mutable.ArrayBuffer.empty) +=
          ((cnt, maxTf, minDl, d, t, l))
      }
      if (byTerm.isEmpty) Iterator.empty
      else {
        // Per-term upper bound over all its blocks in this partition is not
        // enough for doc-at-a-time WAND; we keep it block-at-a-time: decode a
        // term's blocks lazily, accumulate per-doc (term → weight) maps only
        // for docs that survive the bound check of the blocks they appear in.
        // Simpler, still safe: process doc-aligned after a bound pre-filter.
        val termBound = new java.util.HashMap[Long, Float]()
        byTerm.foreach { case (term, bs) =>
          var ub = 0.0f
          bs.foreach { case (_, maxTf, minDl, _, _, _) =>
            val w = Math.nextUp(emb.weight(maxTf, minDl))
            if (w > ub) ub = w
          }
          termBound.put(term, Math.nextUp(idfMap(term) * ub))
        }
        // Sum of all term bounds = max achievable score in this partition.
        val values = new java.util.HashMap[Long, java.util.HashMap[Long, Float]]()
        byTerm.foreach { case (term, bs) =>
          bs.foreach { case (cnt, maxTf, minDl, d, t, l) =>
            val blockUb = Math.nextUp(idfMap(term) * Math.nextUp(emb.weight(maxTf, minDl)))
            val threshold = if (heap.size < k) Float.NegativeInfinity else heap.peek().score
            // A doc in this block could also score from other terms; only
            // skip when even the full cross-term bound cannot beat the
            // threshold. Compute residual = sum of bounds of OTHER terms.
            var residual = 0.0
            val itb = termBound.entrySet().iterator()
            while (itb.hasNext) { val e = itb.next(); if (e.getKey != term) residual += e.getValue.toDouble }
            // decode on ≥: skipping on equality could leave a doc with a
            // truncated partial score exactly at the final threshold
            if (heap.size < k || blockUb + residual >= threshold.toDouble) {
              val docs = PostingCodec.decodeDeltas(d, cnt)
              val tfs = PostingCodec.decodeInts(t, cnt)
              val dls = PostingCodec.decodeInts(l, cnt)
              var i = 0
              while (i < cnt) {
                values.computeIfAbsent(docs(i), _ => new java.util.HashMap[Long, Float](8))
                  .putIfAbsent(term, emb.weight(tfs(i), dls(i)))
                i += 1
              }
            }
          }
        }
        val itd = values.entrySet().iterator()
        while (itd.hasNext) {
          val e = itd.next()
          val v = e.getValue
          var score = 0.0f
          var i = 0
          while (i < occ.length) {
            val w = v.get(occ(i))
            if (w != 0.0f) score += idfMap(occ(i)) * w
            i += 1
          }
          heap.add(ScoredDoc(e.getKey, score))
          if (heap.size > k) heap.poll()
        }
        val out = new Array[ScoredDoc](heap.size)
        var i = out.length - 1
        while (heap.size > 0) { out(i) = heap.poll(); i -= 1 }
        out.iterator
      }
    }
    partial
  }

  /** Point score of one document vs a query (the reference's
    * `Scorer::score`, `scorer.rs:72-75`): None when the doc is absent.
    */
  def scoreDoc(docId: Long, query: String): Option[Float] = {
    val qOcc = queryTerms(query)
    val shard = manifest.shardOf(docId)
    val fwd = spark.read.parquet(s"$indexDir/forward")
      .where($"shard" === shard && $"doc_id" === docId)
      .select($"doc_id", $"shard", $"dl", $"terms", $"tfs")
      .as[ForwardRow]
      .collect()
    fwd.headOption.map { row =>
      if (qOcc.isEmpty) 0.0f
      else {
        val dfs = termDfs(qOcc.distinct)
        val weights = new java.util.HashMap[Long, Float]()
        var i = 0
        while (i < row.terms.length) {
          weights.putIfAbsent(row.terms(i), embedder.weight(row.tfs(i), row.dl))
          i += 1
        }
        var score = 0.0f
        i = 0
        while (i < qOcc.length) {
          val t = qOcc(i)
          val v = weights.get(t)
          if (v != 0.0f) score += idf(dfs.getOrElse(t, 0L)) * v
          else score += idf(dfs.getOrElse(t, 0L)) * 0.0f // exact no-op, kept for clarity
          i += 1
        }
        score
      }
    }
  }
}

object Bm25Index {
  def searchWithContents(index: Bm25Index, docs: DataFrame, idCol: String, contentCol: String,
                         query: String, limit: Option[Int] = None,
                         mode: String = "exhaustive"): DataFrame = {
    val hits = index.search(query, limit, mode).toDF("doc_id", "score")
    // top-k side is tiny → broadcast it against the corpus scan
    docs.join(broadcast(hits), docs(idCol) === hits("doc_id"), "inner")
      .select(docs(idCol), docs(contentCol), hits("score"))
      .orderBy(desc("score"), asc(idCol))
  }
}
