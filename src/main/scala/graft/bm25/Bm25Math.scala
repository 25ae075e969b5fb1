package graft.bm25

/** The BM25 IDF, exactly as the reference computes it
  * (`/root/reference/src/scorer.rs:99-107`): f32 arithmetic throughout,
  * `df` = number of documents containing the term (NOT occurrences — the
  * v2.3.0 regression fix, `scorer.rs:218-234`), `n` = total documents.
  * Always > 0. Pinned vectors: idf(2,1)=0.6931472 (=ln 2), idf(2,2)=0.1823216.
  */
object Bm25Math {
  def idf(nDocs: Long, df: Long): Float = {
    val tf = df.toFloat
    val numerator = nDocs.toFloat - tf + 0.5f
    val denominator = tf + 0.5f
    math.log((1.0f + (numerator / denominator)).toDouble).toFloat
  }
}
