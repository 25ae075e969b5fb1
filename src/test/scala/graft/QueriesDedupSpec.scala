package graft

/** Near-dup clustering invariants (`dedup_clusters`): value-identity vs the
  * DuckDB recursive-closure oracle is the driver's gate; these are the
  * sbt-side structural anchors — the label-propagation fixpoint must be a
  * valid connected-components labeling of the verified-pair graph.
  */
class QueriesDedupSpec extends SparkTestBase {
  private val sf = "/root/testdata/sf0.001"

  test("dedup_clusters is a consistent CC labeling of the verified pairs") {
    val rows = Queries.all("dedup_clusters")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(rows.nonEmpty)
    val cluster = rows.map(r => r._1 -> r._2).toMap

    // node set = exactly the docs appearing in some verified pair
    val pairs = Queries.all("dedup_minhash_verified")(spark, sf)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(cluster.keySet === pairs.flatMap(p => Seq(p._1, p._2)).toSet)

    // every verified pair landed in one cluster (the whole point)
    pairs.foreach { case (a, b) => assert(cluster(a) === cluster(b), s"pair ($a,$b) split") }

    // cluster id is the component MINIMUM and a member of its own cluster
    rows.foreach { case (doc, cl, _) => assert(cl <= doc) }
    rows.groupBy(_._2).foreach { case (cl, members) =>
      assert(members.map(_._1).min === cl, s"cluster $cl id is not its min member")
      // exactly one canonical keeper per cluster, and it is the min
      val keeps = members.filter(_._3 == 1)
      assert(keeps.length === 1 && keeps.head._1 === cl)
    }
  }
}
