package graft.bm25

/** Minimal open-addressed long→int counter for the per-document tf fold
  * (`/root/reference/src/embedder.rs:150-154`): avoids a boxed Long + boxed
  * Integer per token occurrence in the index build's hottest loop. Keys must
  * be non-negative (term hashes are); -1 marks empty slots. Insertion order
  * is tracked for the reference's LinkedHashMap-like iteration.
  */
final class LongIntMap(expected: Int) {
  private var cap = Integer.highestOneBit(math.max(8, expected * 2) - 1) << 1
  private var keys = java.util.Arrays.copyOf(Array.emptyLongArray, 0)
  private var vals: Array[Int] = null
  private var order: Array[Int] = null // slot indices in insertion order
  private var n = 0
  allocate()

  private def allocate(): Unit = {
    keys = new Array[Long](cap)
    java.util.Arrays.fill(keys, -1L)
    vals = new Array[Int](cap)
    order = new Array[Int](cap)
  }

  @inline private def slotOf(key: Long): Int = {
    var s = ((key * 0x9e3779b97f4a7c15L) >>> 40).toInt & (cap - 1)
    while (keys(s) != -1L && keys(s) != key) s = (s + 1) & (cap - 1)
    s
  }

  def increment(key: Long): Unit = {
    val s = slotOf(key)
    if (keys(s) == -1L) {
      if ((n + 1) * 2 > cap) { grow(); increment(key); return }
      keys(s) = key
      vals(s) = 1
      order(n) = s
      n += 1
    } else vals(s) += 1
  }

  private def grow(): Unit = {
    val oldKeys = keys; val oldVals = vals; val oldOrder = order; val oldN = n
    cap <<= 1
    allocate()
    n = 0
    var i = 0
    while (i < oldN) {
      val s0 = oldOrder(i)
      val s = slotOf(oldKeys(s0))
      keys(s) = oldKeys(s0); vals(s) = oldVals(s0); order(n) = s; n += 1
      i += 1
    }
  }

  def get(key: Long): Int = {
    val s = slotOf(key)
    if (keys(s) == -1L) 0 else vals(s)
  }

  def size: Int = n

  /** Iterates (key, count) in insertion order. */
  def foreachOrdered(f: (Long, Int) => Unit): Unit = {
    var i = 0
    while (i < n) { val s = order(i); f(keys(s), vals(s)); i += 1 }
  }
}
