package graft.text.stem

/** A Snowball stemmer for one language. Matches the observable behavior of
  * the reference's stemming stage (`/root/reference/src/default_tokenizer.rs:282-285`,
  * rust-stemmers v1.2.0 — generated from the published Snowball algorithms).
  * Input is expected lowercase (the tokenizer lowercases before stemming,
  * `default_tokenizer.rs:276`).
  */
trait Stemmer extends Serializable {
  def stem(word: String): String
}

/** Identity stemmer for languages without a ported Snowball algorithm (and
  * for `stemming(false)` tokenizer configs).
  */
object NoOpStemmer extends Stemmer {
  def stem(word: String): String = word
}
