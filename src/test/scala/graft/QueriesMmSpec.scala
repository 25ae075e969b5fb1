package graft

/** Multimodal plumbing queries (mm_*): the decode is a documented
  * deterministic stub (no codec libs offline), so these specs pin the
  * plumbing — schema, explode shape, sampling arithmetic, fingerprint
  * bytes — against values independently reproduced by the DuckDB oracle
  * (value-identity at sf0.01 is the driver's gate; these are the sbt-side
  * regression anchors at sf0.001).
  */
class QueriesMmSpec extends SparkTestBase {
  private val sf = "/root/testdata/sf0.001"

  test("mm_frame_sample: ≤4 samples per doc, step = ceil(frames/4), pinned row") {
    val rows = Queries.all("mm_frame_sample")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
    // doc 0 (frames=1) emits exactly frame 0 with the sha256 of "<text>:0"
    val doc0 = rows.filter(_._1 == 0L)
    assert(doc0.length == 1)
    assert(doc0.head._2 == 1 && doc0.head._3 == 0)
    assert(doc0.head._4 ==
      "5b70d716a9ef9d127f39f225443890c7b33fefca0a02241d1d19f2a01afa705e")
    // sampling invariants for every doc: ≤4 frames, indices are multiples of
    // the step, last index < frames
    rows.groupBy(_._1).foreach { case (_, g) =>
      val frames = g.head._2
      val step = (frames + 3) / 4
      assert(g.length <= 4)
      assert(g.map(_._3).toSeq == (0 until frames by step))
    }
  }

  test("mm_resize_meta: aspect-preserving integer fit into 224, pinned row") {
    val rows = Queries.all("mm_resize_meta")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4)))
    assert(rows.find(_._1 == 0L).contains((0L, 408, 288, 224, 158)))
    rows.foreach { case (_, w, h, ow, oh) =>
      val m = math.max(w, h)
      assert(ow == w * 224 / m && oh == h * 224 / m)
      assert(math.max(ow, oh) == 224) // the long edge always lands exactly on 224
    }
  }
}
