package graft.bm25

import graft.text.FxHash

/** The token-embedding hook (reference `TokenEmbedder` trait,
  * `/root/reference/src/embedder.rs:89-115`): token string → index in the
  * embedding space. The crate's concrete spaces are u32 (default, fxhash32),
  * u64 (fxhash64) and usize (= u64 on 64-bit); user types plug in the same
  * way. Indices are carried in a Long; `Fx32` keeps the u32 value
  * zero-extended (non-negative), `Fx64` masks the sign bit so partitioning
  * and ordering stay sane.
  */
trait TokenHasher extends Serializable {
  def name: String
  def hash(token: String): Long
}

object Fx32Hasher extends TokenHasher {
  val name = "fx32"
  def hash(token: String): Long = FxHash.hash32u(token)
}

object Fx64Hasher extends TokenHasher {
  val name = "fx64"
  def hash(token: String): Long = FxHash.hash64(token) & Long.MaxValue
}

final class FnHasher(val name: String, f: String => Long) extends TokenHasher {
  def hash(token: String): Long = f(token)
}

object TokenHasher {
  val default: TokenHasher = Fx32Hasher
  def fromName(name: String): Option[TokenHasher] = name match {
    case "fx32" => Some(Fx32Hasher)
    case "fx64" => Some(Fx64Hasher)
    case _      => None
  }
}
