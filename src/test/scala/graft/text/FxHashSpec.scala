package graft.text

import org.scalatest.funsuite.AnyFunSuite

/** Vectors pinned by the reference: `/root/reference/README.md:201-243` and
  * `/root/reference/src/embedder.rs:357-364,452-460`.
  */
class FxHashSpec extends AnyFunSuite {
  test("hash32 matches the reference vectors") {
    assert(FxHash.hash32u("tea") === 415655421L)
    assert(FxHash.hash32u("cup") === 2070875659L)
    assert(FxHash.hash32u("Cup") === 3568447556L)
    assert(FxHash.hash32u("of") === 3221979461L)
    assert(FxHash.hash32u("space") === 866767497L)
    assert(FxHash.hash32u("station") === 666609503L)
  }

  test("hash64 matches the reference vectors") {
    assert(FxHash.hash64("cup") === 3288102823240002853L)
    assert(FxHash.hash64("tea") === 7123809554392261272L)
  }
}
