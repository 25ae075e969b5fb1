package graft.text

import graft.bm25.TokenHasher

/** Per-thread word → final-term-hash cache keyed by a char REGION of the
  * source text, for the fused tokenize+hash index-build path
  * ([[Bm25Tokenizer.foreachTermHash]]).
  *
  * The forward build's residual cost after stem memoization is pure
  * allocation traffic — one substring per token occurrence — which is
  * exactly the memory-bandwidth term that limits single-host core scaling.
  * This cache probes by hashing the token's chars in place and compares
  * region-to-string, so a HIT (the Zipf-dominant case) allocates nothing
  * and runs no stopword/stem/hash work: one probe, one long.
  *
  * Open addressing over power-of-two slots; cleared wholesale at half load
  * (the hot head repopulates within a document — cheaper than LRU). Words
  * longer than 48 chars are computed but never stored, bounding entry size.
  * Stopwords are cached with a flag (they ARE the Zipf head) rather than a
  * sentinel hash value, so any hasher output is representable.
  *
  * Correctness: the value stored is exactly
  * `hasher.hash(stemmer.stem(word))` / the stopword flag from the owning
  * tokenizer's own tables, and caching is transparent because both are
  * pure; FusedPathSpec asserts fused ≡ generic term frequencies.
  */
final class TokenHashCache(tok: Bm25Tokenizer, hasher: TokenHasher) {
  private val CapBits = 16
  private val Cap = 1 << CapBits
  private val MaxLoad = Cap / 2
  private val MaxWordLen = 48
  private val keys = new Array[String](Cap)
  private val vals = new Array[Long](Cap)
  private val stopFlag = new Array[Boolean](Cap)
  private var n = 0

  @inline private def regionHash(text: String, s: Int, e: Int): Int = {
    var h = 0
    var i = s
    while (i < e) { h = h * 31 + text.charAt(i); i += 1 }
    // finalize: String.hashCode's raw value clusters for short words
    h ^ (h >>> 16)
  }

  @inline private def regionEq(k: String, text: String, s: Int, e: Int): Boolean = {
    val len = e - s
    if (k.length != len) return false
    var i = 0
    while (i < len) { if (k.charAt(i) != text.charAt(s + i)) return false; i += 1 }
    true
  }

  /** Term hash for the word `text[s, e)`, or `StopSentinel` if the word is
    * a stopword under the owning tokenizer's config.
    */
  def termHash(text: String, s: Int, e: Int): Long = {
    var slot = regionHash(text, s, e) & (Cap - 1)
    while (true) {
      val k = keys(slot)
      if (k == null) {
        val w = text.substring(s, e)
        val isStop = tok.stopwordSetView.contains(w)
        val h = if (isStop) 0L else hasher.hash(tok.stemmerView.stem(w))
        if (w.length <= MaxWordLen) {
          if (n >= MaxLoad) {
            java.util.Arrays.fill(keys.asInstanceOf[Array[AnyRef]], null)
            n = 0
            // probe position is stale after the clear — recompute
            slot = regionHash(text, s, e) & (Cap - 1)
          }
          keys(slot) = w
          vals(slot) = h
          stopFlag(slot) = isStop
          n += 1
        }
        return if (isStop) TokenHashCache.StopSentinel else h
      } else if (regionEq(k, text, s, e)) {
        return if (stopFlag(slot)) TokenHashCache.StopSentinel else vals(slot)
      }
      slot = (slot + 1) & (Cap - 1)
    }
    throw new IllegalStateException("unreachable")
  }
}

object TokenHashCache {

  /** Distinguished "this word is a stopword" return value. Only hashers
    * whose outputs never collide with it are eligible for the fused path
    * ([[supports]]); the stock Fx hashers return non-negative longs.
    */
  val StopSentinel: Long = Long.MinValue

  /** The fused path is enabled only for the stock hashers (non-negative
    * outputs, singleton identity — safe cache keys). Custom hashers take
    * the generic tokenize-then-hash path.
    */
  def supports(hasher: TokenHasher): Boolean =
    (hasher eq graft.bm25.Fx32Hasher) || (hasher eq graft.bm25.Fx64Hasher)

  // One cache per (thread, tokenizer-config, hasher): caches survive across
  // tasks on the same executor thread (Spark reuses pool threads), so the
  // Zipf head stays warm for a whole executor lifetime.
  private val tl = new ThreadLocal[java.util.HashMap[String, TokenHashCache]] {
    override def initialValue() = new java.util.HashMap[String, TokenHashCache](4)
  }

  def forConfig(tok: Bm25Tokenizer, hasher: TokenHasher): TokenHashCache = {
    val key = tok.configKey + "|" + hasher.name
    val m = tl.get()
    var c = m.get(key)
    if (c == null) { c = new TokenHashCache(tok, hasher); m.put(key, c) }
    c
  }
}
