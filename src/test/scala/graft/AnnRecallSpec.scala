package graft

/** The recall gate for the IVF ANN path: with √n trained centroids
  * (5 Lloyd rounds) and nprobe=⌈K/4⌉, the approximate top-10 must recover
  * ≥ 90% of the exact brute-force top-10 (sim_cosine_topk) for the same
  * query vector — at BOTH test scales, so the K/nprobe scaling rule is
  * exercised, not just one tuned configuration. This is the check that
  * distinguishes a real IVF from a stub. The sparse-id test additionally
  * proves the centroid seeding does not assume dense 0-based vec_ids.
  */
class AnnRecallSpec extends SparkTestBase {

  private def recallAt(sf: String): Double = {
    val exact = Queries.all("sim_cosine_topk")(spark, sf)
      .collect().take(10).map(_.getLong(0)).toSet
    val ann = Queries.all("sim_ann_ivf")(spark, sf)
      .collect().map(_.getLong(0)).toSet
    exact.intersect(ann).size.toDouble / 10.0
  }

  test("sim_ann_ivf recall@10 ≥ 0.9 vs exact brute-force top-k (sf0.001)") {
    val r = recallAt("/root/testdata/sf0.001")
    assert(r >= 0.9, s"recall@10 = $r at sf0.001")
  }

  test("sim_ann_ivf recall@10 ≥ 0.9 vs exact brute-force top-k (sf0.01)") {
    val r = recallAt("/root/testdata/sf0.01")
    assert(r >= 0.9, s"recall@10 = $r at sf0.01")
  }

  test("sim_ann_ivf recall@10 ≥ 0.9 on a SPARSE-id corpus (no dense-id seeding assumption)") {
    import org.apache.spark.sql.functions._
    // remap vec_id -> vec_id*9973 + 101 (collision-free affine map), except
    // the query vector which must stay at id 0 — so ids are sparse,
    // non-contiguous and do not start near 0
    val dir = tmpDir("ann_sparse")
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .withColumn("vec_id",
        when(col("vec_id") === 0, 0L).otherwise(col("vec_id") * 9973L + 101L))
      .write.parquet(s"$dir/embeddings.parquet")
    val exact = Queries.all("sim_cosine_topk")(spark, dir)
      .collect().take(10).map(_.getLong(0)).toSet
    val ann = Queries.all("sim_ann_ivf")(spark, dir)
      .collect().map(_.getLong(0)).toSet
    val r = exact.intersect(ann).size.toDouble / 10.0
    assert(r >= 0.9, s"recall@10 = $r on sparse-id corpus")
  }

  test("K and nprobe scale with n (K=⌈√n⌉, nprobe=⌈K/4⌉ defaults)") {
    import org.apache.spark.sql.functions._
    val n = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
      .agg(count(lit(1))).head().getLong(0)
    val k = math.max(16, math.ceil(math.sqrt(n.toDouble)).toInt)
    assert(k > 16, s"sf0.01 should exceed the K floor (n=$n, k=$k)")
  }
}
