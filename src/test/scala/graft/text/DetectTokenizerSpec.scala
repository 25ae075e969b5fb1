package graft.text

import org.scalatest.funsuite.AnyFunSuite

/** `LanguageMode::Detect` surface (T6): per-text language routing. The
  * classifier is a documented divergence from whichlang (script ranges +
  * NLTK-stopword hits — see LanguageDetector); these tests pin its
  * routing behavior and the detect-mode tokenizer equivalences.
  */
class DetectTokenizerSpec extends AnyFunSuite {

  test("script detection routes Cyrillic/Greek/Arabic/Tamil") {
    assert(LanguageDetector.detect("привет мир") === Some(Language.Russian))
    assert(LanguageDetector.detect("καλημέρα κόσμε") === Some(Language.Greek))
    assert(LanguageDetector.detect("مرحبا بالعالم") === Some(Language.Arabic))
    assert(LanguageDetector.detect("வணக்கம் உலகம்") === Some(Language.Tamil))
  }

  test("stopword-hit detection separates Latin-script languages") {
    assert(LanguageDetector.detect("the cat sat on the mat and it was happy")
      === Some(Language.English))
    assert(LanguageDetector.detect("der hund und die katze sind nicht hier")
      === Some(Language.German))
    assert(LanguageDetector.detect("le chien et les chats sont dans la maison avec moi")
      === Some(Language.French))
    assert(LanguageDetector.detect("el perro y los gatos están en la casa pero sin él")
      === Some(Language.Spanish))
    assert(LanguageDetector.detect("zxqj qqq vvv") === None)
  }

  test("detect-mode tokenizer matches the fixed-language tokenizer per text") {
    val detect = new DetectTokenizer()
    val en = "The bakers were baking delicious cakes in the morning"
    assert(detect.tokenize(en).toSeq === Bm25Tokenizer(Language.English).tokenize(en).toSeq)
    val de = "Die Bäcker haben das Gemüse und die Kuchen gebacken"
    assert(detect.tokenize(de).toSeq === Bm25Tokenizer(Language.German).tokenize(de).toSeq)
  }

  test("undetected text tokenizes without stemming or stopwords (unsupported-language path)") {
    val detect = new DetectTokenizer()
    // no stopword hits anywhere → fallback: normalized+split only
    assert(detect.tokenize("zxqj runnings waterings").toSeq
      === Seq("zxqj", "runnings", "waterings"))
  }
}
