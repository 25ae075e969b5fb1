package graft.text

import graft.fixtures.Fixtures
import org.scalatest.funsuite.AnyFunSuite

/** Token-identity against the reference golden snapshots
  * (`bm25__default_tokenizer__tests__it_matches_snapshot_{en,de}.snap`,
  * produced by `/root/reference/src/default_tokenizer.rs:549-565` over the
  * 50-recipe corpora). On mismatch, prints a per-document diff to make
  * stemmer/stopword debugging direct.
  */
class TokenizerSnapshotSpec extends AnyFunSuite {

  private def check(lang: Language, csv: String, snap: String): Unit = {
    val recipes = Fixtures.recipes(csv)
    val expected = Fixtures.tokenizerSnapshot(snap)
    assert(recipes.length === expected.length, "doc count")
    val tok = Bm25Tokenizer(lang)
    var failures = 0
    val report = new StringBuilder
    recipes.indices.foreach { d =>
      val got = tok.tokenize(recipes(d).method).toVector
      val exp = expected(d)
      if (got != exp) {
        failures += 1
        if (failures <= 5) {
          report ++= s"\ndoc $d (${recipes(d).title}):\n"
          val n = math.max(got.length, exp.length)
          var shown = 0
          (0 until n).foreach { i =>
            val g = got.lift(i).getOrElse("∅")
            val e = exp.lift(i).getOrElse("∅")
            if (g != e && shown < 12) { report ++= f"  [$i%3d] got=$g%-20s exp=$e\n"; shown += 1 }
          }
        }
      }
    }
    assert(failures === 0, s"$failures/${recipes.length} docs mismatched:$report")
  }

  test("tokenizer matches EN snapshot (50 recipes, ~3.6k tokens)") {
    check(Language.English, "recipes_en.csv", "en")
  }

  test("tokenizer matches DE snapshot (50 recipes, ~3.4k tokens)") {
    check(Language.German, "recipes_de.csv", "de")
  }
}
