package graft.index

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

class PostingCodecSpec extends AnyFunSuite {
  test("delta+varbyte round-trips sorted doc ids (seeded random)") {
    val rnd = new Random(42)
    (0 until 50).foreach { _ =>
      val n = rnd.nextInt(300)
      val sorted = Array.fill(n)(math.abs(rnd.nextLong()) / 2).sorted
      val enc = PostingCodec.encodeDeltas(sorted)
      assert(PostingCodec.decodeDeltas(enc, n).toSeq === sorted.toSeq)
    }
  }

  test("varbyte round-trips int arrays (seeded random)") {
    val rnd = new Random(7)
    (0 until 50).foreach { _ =>
      val n = rnd.nextInt(300)
      val arr = Array.fill(n)(rnd.nextInt(Int.MaxValue))
      val enc = PostingCodec.encodeInts(arr)
      assert(PostingCodec.decodeInts(enc, n).toSeq === arr.toSeq)
    }
  }

  test("empty arrays") {
    assert(PostingCodec.decodeDeltas(PostingCodec.encodeDeltas(Array.empty), 0).isEmpty)
    assert(PostingCodec.decodeInts(PostingCodec.encodeInts(Array.empty), 0).isEmpty)
  }

  test("compression is compact for dense ascending ids") {
    val ids = Array.tabulate(128)(i => 1000000L + i * 3)
    val enc = PostingCodec.encodeDeltas(ids)
    assert(enc.length < 128 * 2 + 4, s"expected ~1 byte/gap, got ${enc.length}")
  }
}
