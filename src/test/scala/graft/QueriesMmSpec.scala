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

  test("mm_feature_embed: mean-pooled frame features are exact integer-lane means in [0,1]") {
    val rows = Queries.all("mm_feature_embed")(spark, sf).collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      val m = r.getInt(1)
      assert(m >= 1 && m <= 4)
      (2 until 10).foreach { c =>
        val v = r.getDouble(c)
        assert(v >= 0.0 && v <= 1.0, s"lane out of range: $v")
      }
    }
    // doc 0 samples exactly 1 frame, so its f0 is the first 16-bit lane of
    // the pinned frame-0 sha ("5b70" = 23408) / 65535, rounded to 6
    val d0 = rows.find(_.getLong(0) == 0L).get
    assert(d0.getInt(1) == 1)
    assert(d0.getDouble(2) ==
      BigDecimal(0x5b70 / 65535.0).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
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
