package graft

/** The recall gate for the IVF ANN path: with trained centroids (K=16,
  * 5 Lloyd rounds) and nprobe=4, the approximate top-10 must recover ≥ 90%
  * of the exact brute-force top-10 (sim_cosine_topk) for the same query
  * vector. This is the check that distinguishes a real IVF from a stub.
  */
class AnnRecallSpec extends SparkTestBase {

  test("sim_ann_ivf recall@10 ≥ 0.9 vs exact brute-force top-k") {
    val sf = "/root/testdata/sf0.001"
    val exact = Queries.all("sim_cosine_topk")(spark, sf)
      .collect().take(10).map(_.getLong(0)).toSet
    val ann = Queries.all("sim_ann_ivf")(spark, sf)
      .collect().map(_.getLong(0)).toSet
    val recall = exact.intersect(ann).size.toDouble / 10.0
    assert(recall >= 0.9, s"recall@10 = $recall (ann=$ann exact=$exact)")
  }
}
