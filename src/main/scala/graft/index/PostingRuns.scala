package graft.index

/** Map-side posting runs for the distributed multi-way posting merge.
  *
  * Instead of shuffling one 32-byte row per posting and externally sorting
  * each reduce partition (the memory-bandwidth bottleneck of the build at
  * scale), each map task locally sorts bounded buffers of postings and emits
  * delta+varbyte-encoded CHUNKS (~10 B/posting) keyed by a (shard,
  * term-prefix) group. Reduce tasks k-way-merge the sorted chunks straight
  * into posting blocks — the shuffle carries 3× less data and the reduce
  * side needs no sort at all.
  *
  * Chunk format (one chunk = one pkey group from one buffer flush), groups
  * ordered by skey = shard<<32|term:
  *
  *   group := skeyDelta:varlong  cnt:varint  cnt × (docDelta:varlong
  *            tf:varint dl:varint)
  *
  * skeyDelta is from the previous group in the chunk (first absolute);
  * docDelta is from the previous posting in the group (first absolute).
  * A (term, doc) pair exists in exactly one map partition (the forward
  * index holds one row per doc), so merge order is total and the output is
  * deterministic.
  */
private[index] object PostingRuns {

  /** Buffered map-side collector: sort (skey, doc) → split by pkey → encode. */
  final class RunBuffer(capacity: Int, pkeyOf: (Long, Long) => Int) {
    private val skeys = new Array[Long](capacity)
    private val docs = new Array[Long](capacity)
    private val tfdls = new Array[Long](capacity)
    private var n = 0

    def add(skey: Long, doc: Long, tf: Int, dl: Int): Unit = {
      skeys(n) = skey; docs(n) = doc; tfdls(n) = (tf.toLong << 32) | (dl.toLong & 0xFFFFFFFFL)
      n += 1
    }
    def isFull: Boolean = n == capacity
    def nonEmpty: Boolean = n > 0

    def flush(): Iterator[(Int, Array[Byte])] = {
      if (n == 0) return Iterator.empty
      sort3(0, n - 1)
      val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Array[Byte])]
      var i = 0
      while (i < n) {
        val pkey = pkeyOf(skeys(i), docs(i))
        val bos = new java.io.ByteArrayOutputStream(1024)
        var prevSkey = 0L
        // encode all consecutive groups sharing this pkey
        while (i < n && pkeyOf(skeys(i), docs(i)) == pkey) {
          val skey = skeys(i)
          var j = i
          while (j < n && skeys(j) == skey) j += 1
          writeVar(bos, skey - prevSkey)
          writeVar(bos, (j - i).toLong)
          var prevDoc = 0L
          var k = i
          while (k < j) {
            writeVar(bos, if (k == i) docs(k) else docs(k) - prevDoc)
            prevDoc = docs(k)
            writeVar(bos, tfdls(k) >>> 32)
            writeVar(bos, tfdls(k) & 0xFFFFFFFFL)
            k += 1
          }
          prevSkey = skey
          i = j
        }
        out += ((pkey, bos.toByteArray))
      }
      n = 0
      out.iterator
    }

    private def writeVar(out: java.io.ByteArrayOutputStream, v0: Long): Unit = {
      var v = v0
      while ((v & ~0x7fL) != 0L) { out.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
      out.write(v.toInt)
    }

    // quicksort of the parallel arrays by (skey, doc); median-of-3 pivot
    private def sort3(lo0: Int, hi0: Int): Unit = {
      var lo = lo0; var hi = hi0
      while (lo < hi) {
        if (hi - lo < 24) { insertion(lo, hi); return }
        val mid = (lo + hi) >>> 1
        // median-of-three into mid
        if (less(mid, lo)) swap(mid, lo)
        if (less(hi, mid)) { swap(hi, mid); if (less(mid, lo)) swap(mid, lo) }
        val pk = skeys(mid); val pd = docs(mid)
        var i = lo; var j = hi
        while (i <= j) {
          while (skeys(i) < pk || (skeys(i) == pk && docs(i) < pd)) i += 1
          while (skeys(j) > pk || (skeys(j) == pk && docs(j) > pd)) j -= 1
          if (i <= j) { swap(i, j); i += 1; j -= 1 }
        }
        // recurse into the smaller side, loop on the larger
        if (j - lo < hi - i) { sort3(lo, j); lo = i } else { sort3(i, hi); hi = j }
      }
    }
    @inline private def less(a: Int, b: Int): Boolean =
      skeys(a) < skeys(b) || (skeys(a) == skeys(b) && docs(a) < docs(b))
    @inline private def swap(a: Int, b: Int): Unit = {
      var t = skeys(a); skeys(a) = skeys(b); skeys(b) = t
      t = docs(a); docs(a) = docs(b); docs(b) = t
      t = tfdls(a); tfdls(a) = tfdls(b); tfdls(b) = t
    }
    private def insertion(lo: Int, hi: Int): Unit = {
      var i = lo + 1
      while (i <= hi) {
        val sk = skeys(i); val d = docs(i); val t = tfdls(i)
        var j = i - 1
        while (j >= lo && (skeys(j) > sk || (skeys(j) == sk && docs(j) > d))) {
          skeys(j + 1) = skeys(j); docs(j + 1) = docs(j); tfdls(j + 1) = tfdls(j)
          j -= 1
        }
        skeys(j + 1) = sk; docs(j + 1) = d; tfdls(j + 1) = t
        i += 1
      }
    }
  }

  /** Streaming decoder over one chunk: yields (skey, doc, tf, dl) in
    * (skey, doc) order with O(1) state.
    */
  final class RunCursor(bytes: Array[Byte]) {
    private var pos = 0
    private var remaining = 0
    var skey = 0L
    var doc = 0L
    var tf = 0
    var dl = 0

    /** Advance to the next posting; false when exhausted. */
    def advance(): Boolean = {
      var fresh = false
      if (remaining == 0) {
        if (pos >= bytes.length) return false
        skey += readVar()
        remaining = readVar().toInt
        fresh = true
      }
      val delta = readVar()
      doc = if (fresh) delta else doc + delta
      tf = readVar().toInt
      dl = readVar().toInt
      remaining -= 1
      true
    }

    private def readVar(): Long = {
      var shift = 0; var v = 0L; var b = 0
      do {
        b = bytes(pos) & 0xff
        v |= (b & 0x7fL) << shift
        shift += 7
        pos += 1
      } while ((b & 0x80) != 0)
      v
    }
  }
}
