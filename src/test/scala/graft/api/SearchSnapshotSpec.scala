package graft.api

import graft.SparkTestBase
import graft.fixtures.Fixtures
import graft.text.Language

/** End-to-end parity gate (SURVEY §7 minimum slice): recipes corpus →
  * distributed index build → search → results rank- and f32-score-identical
  * to `bm25__search__tests__it_matches_snapshot_{en,de}.snap`
  * (compared sorted by doc id, as the reference does at
  * `/root/reference/src/search.rs:493-517`).
  */
class SearchSnapshotSpec extends SparkTestBase {

  private def check(lang: Language, csv: String, snap: String, query: String): Unit = {
    val recipes = Fixtures.recipes(csv)
    val docs = recipes.map(r => Doc(r.title, r.method))
    val eng = SearchEngine.withDocuments(spark, tmpDir(s"snap_$snap"), docs, lang)
    val got = eng.search(query, None).sortBy(_.id)
    val expected = Fixtures.searchSnapshot(snap)
    assert(got.map(_.id) === expected.map(_.id).toList,
      s"result doc-id set/order mismatch")
    got.zip(expected).foreach { case (g, e) =>
      assert(java.lang.Float.floatToRawIntBits(g.score) === java.lang.Float.floatToRawIntBits(e.score),
        s"score mismatch for ${g.id}: got ${g.score}, exp ${e.score}")
    }
    // contents round-trip through the doc store
    val byTitle = recipes.map(r => r.title -> r.method).toMap
    got.foreach(g => assert(g.contents === byTitle(g.id)))
  }

  test("EN search snapshot: query 'bake', 16 results, exact f32 scores") {
    check(Language.English, "recipes_en.csv", "en", "bake")
  }

  test("DE search snapshot: query 'backen', exact f32 scores") {
    check(Language.German, "recipes_de.csv", "de", "backen")
  }
}
