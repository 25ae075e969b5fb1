package graft.bm25

import graft.fixtures.Fixtures
import graft.text.{Bm25Tokenizer, Language}
import org.scalatest.funsuite.AnyFunSuite

/** Mirrors the reference embedder unit tests (`/root/reference/src/embedder.rs:341-460`)
  * and the golden embedder snapshots (value-identical f32 bits, 3,546 EN +
  * DE TokenEmbeddings).
  */
class EmbedderSpec extends AnyFunSuite {

  test("it weights unique words equally") {
    val e = Embedder(avgdl = 3.0f)
    val emb = e.embed("banana apple orange").entries
    assert(emb.length === 3)
    assert(emb.map(_.value).distinct.length === 1)
  }

  test("it weights repeated words unequally (exact f32)") {
    // embedder.rs:351-365: "space station station", avgdl=3 → 1.0 / 1.375 / 1.375
    val e = Embedder(Bm25Tokenizer(Language.English), avgdl = 3.0f)
    val emb = e.embed("space station station").entries
    assert(emb.toSeq === Seq(
      TokenWeight(866767497L, 1.0f),
      TokenWeight(666609503L, 1.375f),
      TokenWeight(666609503L, 1.375f)))
  }

  test("it constrains avgdl (fallback 256 when avgdl <= 0)") {
    val e = Embedder(avgdl = 0.0f)
    val emb = e.embed("space station").entries
    assert(emb.nonEmpty && emb.forall(_.value > 0.0f))
  }

  test("it handles empty corpus (fit → 256)") {
    assert(Embedder.fitAvgdlLocal(Nil, Bm25Tokenizer.default) === 256.0f)
  }

  test("it handles empty input") {
    assert(Embedder(avgdl = 1.0f).embed("").entries.isEmpty)
  }

  test("README corpus avgdl is exactly 5.75") {
    // /root/reference/README.md:64-76
    val corpus = Seq(
      "The sky blushed pink as the sun dipped below the horizon.",
      "Apples, oranges, papayas, and more papayas.",
      "She found a forgotten letter tucked inside an old book.",
      "A single drop of rain fell, followed by a thousand more.")
    assert(Embedder.fitAvgdlLocal(corpus, Bm25Tokenizer.default) === 5.75f)
  }

  private def checkSnapshot(lang: Language, csv: String, snap: String): Unit = {
    val recipes = Fixtures.recipes(csv)
    val tok = Bm25Tokenizer(lang)
    val avgdl = Embedder.fitAvgdlLocal(recipes.map(_.method), tok)
    val e = Embedder(tok, avgdl = avgdl)
    val expected = Fixtures.embedderSnapshot(snap)
    assert(expected.length === recipes.length)
    var mismatches = 0
    val report = new StringBuilder
    recipes.indices.foreach { d =>
      val got = e.embed(recipes(d).method).entries.toVector
      val exp = expected(d)
      val same = got.length == exp.length && got.indices.forall { i =>
        got(i).index == exp(i).index &&
          java.lang.Float.floatToRawIntBits(got(i).value) == java.lang.Float.floatToRawIntBits(exp(i).value)
      }
      if (!same) {
        mismatches += 1
        if (mismatches <= 3) {
          report ++= s"\ndoc $d: got ${got.length} entries, exp ${exp.length}\n"
          got.zip(exp).zipWithIndex.filter { case ((g, x), _) => g.index != x.index || g.value != x.value }
            .take(8).foreach { case ((g, x), i) =>
              report ++= s"  [$i] got=(${g.index},${g.value}) exp=(${x.index},${x.value})\n"
            }
        }
      }
    }
    assert(mismatches === 0, s"$mismatches docs mismatched:$report")
  }

  test("embedder matches EN snapshot (bit-exact f32)") {
    checkSnapshot(Language.English, "recipes_en.csv", "en")
  }

  test("embedder matches DE snapshot (bit-exact f32)") {
    checkSnapshot(Language.German, "recipes_de.csv", "de")
  }
}
