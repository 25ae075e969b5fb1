package graft.text

import graft.bm25.{Embedder, Fx32Hasher, Fx64Hasher, TokenHasher}
import org.scalatest.funsuite.AnyFunSuite

/** The fused tokenize+hash path (TokenHashCache + foreachTermHash) must be
  * observationally identical to the generic tokenize-then-hash path for
  * every tokenizer config and both stock hashers — same terms, same tfs,
  * same insertion order, same dl — including across cache clears and for
  * words longer than the cache's entry-size bound.
  */
class FusedPathSpec extends AnyFunSuite {

  /** Generic-path reference result, computed without the fused branch. */
  private def generic(tok: TextTokenizer, hasher: TokenHasher,
                      text: String): (Seq[Long], Seq[Int], Int) = {
    val tokens = tok.tokenize(text)
    val counts = new graft.bm25.LongIntMap(tokens.length)
    tokens.foreach(t => counts.increment(hasher.hash(t)))
    val terms = Seq.newBuilder[Long]
    val tfs = Seq.newBuilder[Int]
    counts.foreachOrdered { (k, v) => terms += k; tfs += v }
    (terms.result(), tfs.result(), tokens.length)
  }

  private def fused(tok: Bm25Tokenizer, hasher: TokenHasher,
                    text: String): (Seq[Long], Seq[Int], Int) = {
    val emb = new Embedder(graft.bm25.Bm25Params(), tok, hasher)
    val (terms, tfs, dl) = emb.termFrequencies(text)
    (terms.toSeq, tfs.toSeq, dl)
  }

  private val texts = Seq(
    "",
    "the quick brown fox jumps over the lazy dog and the dog sleeps",
    "Баке the Gemüse bei 400°F gießen 🍕 naïve café résumé",
    "merge join sort table merge join merge",
    "a aa aaa the of and to in is was", // stopword-heavy
    ("superduper" * 10) + " normal words here " + ("superduper" * 10), // > 48 chars, repeated
    (1 to 500).map(i => s"tok$i").mkString(" "), // wide vocab
    "running runs ran runner runners easily fairness cats"
  )

  for (hasher <- Seq[TokenHasher](Fx32Hasher, Fx64Hasher)) {
    test(s"fused ≡ generic for the default tokenizer (${hasher.name})") {
      val tok = Bm25Tokenizer.default
      for (t <- texts) assert(fused(tok, hasher, t) === generic(tok, hasher, t), s"text: $t")
    }
  }

  test("fused ≡ generic across languages and config toggles") {
    val configs = Seq(
      Bm25Tokenizer(Language.German),
      Bm25Tokenizer(Language.Russian),
      Bm25Tokenizer(Language.English, stopwords = false),
      Bm25Tokenizer(Language.English, stemming = false),
      Bm25Tokenizer(Language.English, normalization = false),
      Bm25Tokenizer(Language.French, stopwords = false, stemming = false)
    )
    for (tok <- configs; t <- texts)
      assert(fused(tok, Fx32Hasher, t) === generic(tok, Fx32Hasher, t),
        s"config: ${tok.configKey}, text: $t")
  }

  test("fused survives cache clears (vocab far beyond the cache load bound)") {
    val tok = Bm25Tokenizer.default
    // > MaxLoad (32768) distinct words forces at least one wholesale clear;
    // results must stay identical before, across, and after the clear
    val big = (1 to 40000).map(i => s"w${i}x${i % 7}").mkString(" ")
    assert(fused(tok, Fx32Hasher, big) === generic(tok, Fx32Hasher, big))
    // and the hot head still resolves correctly after the clear
    val after = "the quick brown fox jumps over the lazy dog"
    assert(fused(tok, Fx32Hasher, after) === generic(tok, Fx32Hasher, after))
  }
}
