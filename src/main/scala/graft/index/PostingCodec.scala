package graft.index

/** Delta + variable-byte (LEB128) codec for posting blocks.
  *
  * The reference keeps postings as in-memory HashSets
  * (`/root/reference/src/scorer.rs:25-26`); at 10^12-doc scale we persist
  * them as compressed blocks instead (north_star: "delta-encoded +
  * variable-byte compressed posting blocks with block-max metadata").
  * Doc ids are sorted ascending within a block → gaps ≥ 0 (first value
  * stored absolute); tf/dl streams are plain varbyte.
  */
object PostingCodec {

  private def writeVarLong(out: java.io.ByteArrayOutputStream, v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7fL) != 0L) {
      out.write(((v & 0x7f) | 0x80).toInt)
      v >>>= 7
    }
    out.write(v.toInt)
  }

  def encodeDeltas(sorted: Array[Long]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(sorted.length * 2)
    var prev = 0L
    var i = 0
    while (i < sorted.length) {
      val d = if (i == 0) sorted(0) else sorted(i) - prev
      require(d >= 0, s"doc ids not sorted: ${sorted(i)} after $prev")
      writeVarLong(out, d)
      prev = sorted(i)
      i += 1
    }
    out.toByteArray
  }

  def decodeDeltas(bytes: Array[Byte], n: Int): Array[Long] = {
    val out = new Array[Long](n)
    var acc = 0L
    var pos = 0
    var i = 0
    while (i < n) {
      var shift = 0
      var v = 0L
      var b = 0
      do {
        b = bytes(pos) & 0xff
        v |= (b & 0x7fL) << shift
        shift += 7
        pos += 1
      } while ((b & 0x80) != 0)
      acc = if (i == 0) v else acc + v
      out(i) = acc
      i += 1
    }
    out
  }

  def encodeInts(xs: Array[Int]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(xs.length)
    var i = 0
    while (i < xs.length) { writeVarLong(out, xs(i).toLong); i += 1 }
    out.toByteArray
  }

  def decodeInts(bytes: Array[Byte], n: Int): Array[Int] = {
    val out = new Array[Int](n)
    var pos = 0
    var i = 0
    while (i < n) {
      var shift = 0
      var v = 0L
      var b = 0
      do {
        b = bytes(pos) & 0xff
        v |= (b & 0x7fL) << shift
        shift += 7
        pos += 1
      } while ((b & 0x80) != 0)
      out(i) = v.toInt
      i += 1
    }
    out
  }
}
