package graft.tools

import graft.sources.CodeCorpus
import graft.text.{Bm25Tokenizer, Transliterate, UnicodeWords}

/** Stage-level tokenizer micro-benchmark over the deterministic synthetic
  * code corpus: isolates normalize / split / stop+stem costs so build-path
  * optimization targets the real bottleneck instead of a guess.
  * Usage: `runMain graft.tools.TokBench [nDocs]` (single-threaded,
  * relative costs are what matters).
  */
object TokBench {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 20000
    val texts = (0L until n.toLong).map(i => CodeCorpus.row(42L, i).content).toArray
    val full = Bm25Tokenizer()
    val noStem = Bm25Tokenizer(stemming = false)
    val noStemStop = Bm25Tokenizer(stemming = false, stopwords = false)
    var sink = 0L
    def time(label: String)(f: => Unit): Unit = {
      f // warm-up
      val t0 = System.nanoTime()
      f
      println(f"$label%-22s ${(System.nanoTime() - t0) / 1e9}%.3f s  (sink=$sink)")
    }
    time("normalize only") { var i = 0; while (i < n) { sink += Transliterate(texts(i)).length; i += 1 } }
    time("normalize+lower+split") { var i = 0; while (i < n) {
      sink += UnicodeWords.split(Transliterate(texts(i)).toLowerCase(java.util.Locale.ROOT)).length; i += 1 } }
    time("full minus stem+stop") { var i = 0; while (i < n) { sink += noStemStop.tokenize(texts(i)).length; i += 1 } }
    time("full minus stem") { var i = 0; while (i < n) { sink += noStem.tokenize(texts(i)).length; i += 1 } }
    time("full pipeline") { var i = 0; while (i < n) { sink += full.tokenize(texts(i)).length; i += 1 } }
    // index-build form: distinct (term, tf) + dl — fused (region-cached,
    // stock hasher) vs generic (tokenize then hash)
    val embFused = new graft.bm25.Embedder(graft.bm25.Bm25Params(), full, graft.bm25.Fx32Hasher)
    val embGeneric = new graft.bm25.Embedder(graft.bm25.Bm25Params(), new graft.text.FnTokenizer(s => full.tokenize(s).toSeq), graft.bm25.Fx32Hasher)
    time("termFreqs generic") { var i = 0; while (i < n) { sink += embGeneric.termFrequencies(texts(i))._3; i += 1 } }
    time("termFreqs fused") { var i = 0; while (i < n) { sink += embFused.termFrequencies(texts(i))._3; i += 1 } }
    // the fused path's claim is ALLOCATION relief, which single-thread
    // numbers understate: measure aggregate throughput with all cores
    // tokenizing concurrently (the forward stage's real shape)
    val nThreads = Runtime.getRuntime.availableProcessors()
    def parTime(label: String)(emb: graft.bm25.Embedder): Unit = {
      val t0 = System.nanoTime()
      val threads = (0 until nThreads).map { t =>
        new Thread(() => {
          var i = t
          while (i < n) { emb.termFrequencies(texts(i)); i += nThreads }
        })
      }
      threads.foreach(_.start()); threads.foreach(_.join())
      println(f"$label%-22s ${(System.nanoTime() - t0) / 1e9}%.3f s  ($nThreads threads)")
    }
    parTime("par generic")(embGeneric)
    parTime("par generic")(embGeneric)
    parTime("par fused")(embFused)
    parTime("par fused")(embFused)
  }
}
