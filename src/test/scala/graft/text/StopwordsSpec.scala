package graft.text

import org.scalatest.funsuite.AnyFunSuite

/** Stopword-list audit against the NLTK stopwords corpus that Spark MLlib
  * vendors on the test classpath (org/apache/spark/ml/feature/stopwords/ —
  * its README is NLTK's own, same lineage as the reference's stop-words
  * crate `nltk` feature).
  *
  * Two tiers of evidence:
  *   - six languages whose NLTK list never changed across vintages
  *     (da/nl/it/ru/sv/tr) are asserted as EXACT sets;
  *   - the remaining lists changed after the Spark vendoring (e.g. the
  *     English contraction rework, German "dass", Hungarian ő-encoding
  *     fix), so they are pinned by exact SIZE plus spot membership of the
  *     post-vintage additions proven via the reference snapshots.
  */
class StopwordsSpec extends AnyFunSuite {

  private def nltk(lang: String): Set[String] = {
    val in = getClass.getResourceAsStream(s"/org/apache/spark/ml/feature/stopwords/$lang.txt")
    assert(in != null, s"mllib corpus missing $lang")
    scala.io.Source.fromInputStream(in, "UTF-8").getLines().filter(_.nonEmpty).toSet
  }

  private val stable = Map(
    Language.Danish -> "danish", Language.Dutch -> "dutch",
    Language.Italian -> "italian", Language.Russian -> "russian",
    Language.Swedish -> "swedish", Language.Turkish -> "turkish")

  for ((lang, file) <- stable)
    test(s"${lang.name} list is the NLTK list, exactly") {
      assert(Stopwords.forLanguage(lang) === nltk(file))
    }

  test("per-language sizes match the published NLTK list sizes") {
    val expected = Map(
      Language.Arabic -> 230, Language.Danish -> 94, Language.Dutch -> 101,
      Language.English -> 179, Language.French -> 157, Language.German -> 232,
      Language.Greek -> 75, Language.Hungarian -> 198, Language.Italian -> 279,
      Language.Norwegian -> 172, Language.Portuguese -> 208,
      Language.Romanian -> 229, Language.Russian -> 151,
      Language.Spanish -> 313, Language.Swedish -> 114,
      Language.Tamil -> 0, Language.Turkish -> 53)
    for ((lang, n) <- expected)
      assert(Stopwords.forLanguage(lang).size === n, lang.name)
  }

  test("post-vintage changes are present (snapshot- or issue-backed)") {
    val de = Stopwords.forLanguage(Language.German)
    // "dass" proven by the DE tokenizer snapshot (corpus contains it and the
    // reference removes it); the truncated unse-forms are the (in)famous
    // NLTK originals
    assert(de("dass") && de("daß"))
    assert(de("unse") && de("unsem") && de("unsen") && de("unses"))
    assert(!de("unsere"))
    val en = Stopwords.forLanguage(Language.English)
    // the 2017 NLTK English rework (bare auxiliaries + needn't family)
    assert(en("needn't") && en("mightn") && en("should've") && !en("cannot"))
    val es = Stopwords.forLanguage(Language.Spanish)
    assert(es("vosotros") && !es("vosostros")) // NLTK typo fix applied
    assert(es("sentid") && es("sintiendo"))
    val fr = Stopwords.forLanguage(Language.French)
    assert(fr("m") && fr("ils"))
    val hu = Stopwords.forLanguage(Language.Hungarian)
    assert(hu("ő") && !hu("õ")) // encoding fix: o-tilde vintage replaced
    assert(hu("cikk") && hu("keressünk"))
  }

  test("normalized lists are transliterated at load (für → fur)") {
    val de = Stopwords.forLanguage(Language.German).map(Transliterate(_))
    assert(de("fur") && !de("für"))
  }
}
