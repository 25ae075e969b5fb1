package graft.index

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Unit round-trip tests for the map-side run codec behind the distributed
  * multi-way posting merge (PostingRuns): random posting sets must survive
  * buffer → chunk → cursor → k-way merge with exact (skey, doc, tf, dl)
  * fidelity and global ordering.
  */
class PostingRunsSpec extends AnyFunSuite {

  private def roundTrip(postings: Seq[(Long, Long, Int, Int)],
                        capacity: Int, pkeyOf: (Long, Long) => Int): Seq[(Int, Seq[(Long, Long, Int, Int)])] = {
    val buf = new PostingRuns.RunBuffer(capacity, pkeyOf)
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Array[Byte])]
    postings.foreach { case (skey, doc, tf, dl) =>
      buf.add(skey, doc, tf, dl)
      if (buf.isFull) out ++= buf.flush()
    }
    if (buf.nonEmpty) out ++= buf.flush()
    out.toSeq.map { case (pkey, bytes) =>
      val c = new PostingRuns.RunCursor(bytes)
      val decoded = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Int, Int)]
      while (c.advance()) decoded += ((c.skey, c.doc, c.tf, c.dl))
      (pkey, decoded.toSeq)
    }
  }

  test("random postings round-trip chunks exactly, sorted within chunk") {
    val rnd = new Random(7)
    val postings = Seq.fill(5000) {
      ((rnd.nextInt(8).toLong << 32) | rnd.nextInt(1000).toLong,
        rnd.nextLong(1L << 40), 1 + rnd.nextInt(64), 1 + rnd.nextInt(4096))
    }.distinctBy(p => (p._1, p._2)) // one (term, doc) pair per posting
    val pkeyOf = (skey: Long, _: Long) => ((skey >>> 32) % 4).toInt
    val chunks = roundTrip(postings, capacity = 257, pkeyOf)

    // every chunk is internally sorted and routed to its pkey
    chunks.foreach { case (pkey, ps) =>
      assert(ps.map(p => (p._1, p._2)) === ps.map(p => (p._1, p._2)).sorted, "chunk unsorted")
      ps.foreach(p => assert(pkeyOf(p._1, p._2) === pkey, "posting in wrong pkey chunk"))
    }
    // the union of all chunks is exactly the input multiset
    val all = chunks.flatMap(_._2)
    assert(all.sorted === postings.sorted)
  }

  test("k-way merge of cursors reproduces the globally sorted stream") {
    val rnd = new Random(13)
    val postings = Seq.fill(2000) {
      ((rnd.nextInt(2).toLong << 32) | rnd.nextInt(50).toLong,
        rnd.nextLong(1L << 30), 1 + rnd.nextInt(9), 1 + rnd.nextInt(99))
    }.distinctBy(p => (p._1, p._2))
    val chunks = roundTrip(postings, capacity = 64, pkeyOf = (_, _) => 0)
    val pq = new java.util.PriorityQueue[PostingRuns.RunCursor](
      math.max(1, chunks.size),
      (a: PostingRuns.RunCursor, b: PostingRuns.RunCursor) => {
        val c = java.lang.Long.compare(a.skey, b.skey)
        if (c != 0) c else java.lang.Long.compare(a.doc, b.doc)
      })
    chunks.foreach { case (_, ps) =>
      // re-encode each decoded chunk through a fresh buffer to get cursors
      val buf = new PostingRuns.RunBuffer(ps.size, (_, _) => 0)
      ps.foreach(p => buf.add(p._1, p._2, p._3, p._4))
      buf.flush().foreach { case (_, bytes) =>
        val c = new PostingRuns.RunCursor(bytes)
        if (c.advance()) pq.add(c)
      }
    }
    val merged = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Int, Int)]
    while (!pq.isEmpty) {
      val c = pq.poll()
      merged += ((c.skey, c.doc, c.tf, c.dl))
      if (c.advance()) pq.add(c)
    }
    assert(merged.toSeq === postings.sortBy(p => (p._1, p._2)))
  }

  test("empty buffer, single posting, and max-value edges") {
    val one = roundTrip(Seq((5L << 32 | 42L, Long.MaxValue - 1, Int.MaxValue, 1)), 8, (_, _) => 3)
    assert(one === Seq((3, Seq((5L << 32 | 42L, Long.MaxValue - 1, Int.MaxValue, 1)))))
    val buf = new PostingRuns.RunBuffer(4, (_, _) => 0)
    assert(buf.flush().isEmpty)
  }
}
