package graft.text

import org.scalatest.funsuite.AnyFunSuite

/** Mirrors the reference tokenizer unit tests
  * (`/root/reference/src/default_tokenizer.rs:402-608`), same inputs and
  * expected token streams.
  */
class TokenizerSpec extends AnyFunSuite {
  private val en = Bm25Tokenizer(Language.English)

  test("it can tokenize english") {
    assert(en.tokenize("space station").toSeq === Seq("space", "station"))
  }

  test("it converts to lowercase") {
    assert(en.tokenize("SPACE STATION").toSeq === Seq("space", "station"))
  }

  test("it removes whitespace") {
    assert(en.tokenize("\tspace\r\nstation\n space       station").toSeq ===
      Seq("space", "station", "space", "station"))
  }

  test("it removes stopwords") {
    assert(en.tokenize("i me my myself we our ours ourselves you you're you've you'll you'd").isEmpty)
  }

  test("it keeps numbers") {
    assert(en.tokenize("42 1337 3.14").toSeq === Seq("42", "1337", "3.14"))
  }

  test("it keeps contracted words") {
    val t = Bm25Tokenizer(Language.English, stemming = false, stopwords = false)
    assert(t.tokenize("can't you're won't let's couldn't've").toSeq ===
      Seq("can't", "you're", "won't", "let's", "couldn't've"))
  }

  test("it removes punctuation") {
    assert(en.tokenize("space, station!").toSeq === Seq("space", "station"))
    assert(en.tokenize("space,station").toSeq === Seq("space", "station"))
    assert(en.tokenize("!\"#$%&'()*+,-./:;<=>?@[\\]^_`{|}~").isEmpty)
  }

  test("it stems words") {
    assert(en.tokenize("connection connections connective connected connecting connect").toSeq ===
      Seq("connect", "connect", "connect", "connect", "connect", "connect"))
  }

  test("it tokenizes emojis as text") {
    assert(en.tokenize("🍕 🚀 🍋").toSeq === Seq("pizza", "rocket", "lemon"))
  }

  test("it converts unicode to ascii") {
    val t = Bm25Tokenizer(Language.German, stemming = false)
    assert(t.tokenize("gemüse, Gießen").toSeq === Seq("gemuse", "giessen"))
  }

  test("it handles empty input") {
    assert(en.tokenize("").isEmpty)
  }

  test("it does not convert unicode when normalization disabled") {
    val t = Bm25Tokenizer(Language.French, normalization = false, stemming = false)
    assert(t.tokenize("étude").toSeq === Seq("étude"))
  }

  test("it does not remove stopwords when stopwords disabled") {
    val t = Bm25Tokenizer(Language.English, stopwords = false)
    assert(t.tokenize("i my myself we you have").toSeq ===
      Seq("i", "my", "myself", "we", "you", "have"))
  }

  test("it does not stem when stemming disabled") {
    val t = Bm25Tokenizer(Language.English, stemming = false)
    assert(t.tokenize("connection connections connective connect").toSeq ===
      Seq("connection", "connections", "connective", "connect"))
  }
}
