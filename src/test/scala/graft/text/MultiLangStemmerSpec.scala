package graft.text

import graft.text.stem._
import org.scalatest.funsuite.AnyFunSuite

/** Golden vectors for the 15 newly-ported Snowball stemmers, hand-derived
  * by executing the published algorithm definitions step by step (the
  * Snowball sample vocabularies are unreachable offline). Each vector's
  * derivation was traced through R1/R2/RV and the step conditions by hand.
  */
class MultiLangStemmerSpec extends AnyFunSuite {

  private def check(s: Stemmer, cases: (String, String)*): Unit =
    cases.foreach { case (in, out) =>
      assert(s.stem(in) === out, s"stem($in)")
    }

  test("Danish golden vectors") {
    check(DanishStemmer,
      "indtagelse" -> "indtag",   // e → els → consonant checks
      "kendelse" -> "kend",
      "hundene" -> "hund",
      "bakker" -> "bak",          // er + undouble kk
      "hund" -> "hund")
  }

  test("Norwegian golden vectors") {
    check(NorwegianStemmer,
      "bilene" -> "bil",
      "huset" -> "hus",
      "bankene" -> "bank",
      "bil" -> "bil")
  }

  test("Swedish golden vectors") {
    check(SwedishStemmer,
      "bilarna" -> "bil",
      "flickorna" -> "flick",
      "jakten" -> "jakt",
      "huset" -> "huset", // Swedish step 1 has no "et" (unlike Norwegian)
      "bil" -> "bil")
  }

  test("Dutch golden vectors") {
    check(DutchStemmer,
      "bomen" -> "bom",
      "boom" -> "bom",           // step-4 undouble vowel: boom ≡ bomen
      "gekken" -> "gek",
      "lichamelijk" -> "licham")
  }

  test("Spanish golden vectors") {
    check(SpanishStemmer,
      "gatos" -> "gat",
      "canciones" -> "cancion",
      "importante" -> "import",
      "trabajando" -> "trabaj",
      "cantaríamos" -> "cant")          // aríamos verb suffix in RV
  }

  test("French golden vectors") {
    check(FrenchStemmer,
      "continuellement" -> "continuel", // ement in RV + step-5 undouble ell
      "animaux" -> "animal",            // aux → al in R1
      "majestueux" -> "majestu",        // eux deleted in R2
      "donner" -> "don",                // er in RV + step-5 undouble onn
      "donnerions" -> "don",            // erions (2b longest match) + undouble
      "aimerions" -> "aim")             // erions must beat the shorter ions
  }

  test("Italian golden vectors") {
    check(ItalianStemmer,
      "abbandonata" -> "abbandon",
      "pericolosa" -> "pericol",
      "cantava" -> "cant",              // ava verb suffix in RV
      "lavoratore" -> "lavor")          // atore in R2
  }

  test("Portuguese golden vectors") {
    check(PortugueseStemmer,
      "bonita" -> "bonit",              // residual a in RV
      "trabalhadores" -> "trabalh")     // adores in R2
  }

  test("Russian golden vectors (Cyrillic — fires only without normalization)") {
    check(RussianStemmer,
      "книгами" -> "книг",              // noun ами in RV
      "красивые" -> "красив")           // adjective ые
  }

  test("non-Latin stemmers are no-ops on ASCII (the default-normalization path)") {
    for (s <- Seq[Stemmer](RussianStemmer, GreekStemmer, ArabicStemmer, TamilStemmer))
      for (w <- Seq("kniga", "logos", "kitab", "veedu", "random"))
        assert(s.stem(w) === w, s"$s should not touch ASCII '$w'")
  }

  test("robustness sweep: every stemmer is total on adversarial inputs") {
    val stemmers = Seq[Stemmer](DanishStemmer, NorwegianStemmer, SwedishStemmer,
      DutchStemmer, FrenchStemmer, SpanishStemmer, ItalianStemmer,
      PortugueseStemmer, RussianStemmer, RomanianStemmer, HungarianStemmer,
      TurkishStemmer, GreekStemmer, ArabicStemmer, TamilStemmer,
      EnglishStemmer, GermanStemmer)
    val rnd = new scala.util.Random(42)
    val inputs = Seq("", "a", "ab", "ß", "é", "aaaaaaa", "qqqqq", "ement",
      "ions", "ийи", "ώς", "ةة", "ிி", "y", "uu", "x" * 100) ++
      Seq.fill(300)(rnd.alphanumeric.take(1 + rnd.nextInt(15)).mkString.toLowerCase) ++
      Seq.fill(100)((1 to (1 + rnd.nextInt(8))).map(_ =>
        (0x20 + rnd.nextInt(0x2500)).toChar).mkString.toLowerCase)
    for (s <- stemmers; w <- inputs) {
      val out = s.stem(w) // must never throw
      assert(out != null)
      assert(out.length <= w.length + 4, s"$s grew '$w' to '$out'") // heid/iqU rewrites bound
    }
  }

  test("all 17 languages route to a stemmer and stem without error") {
    val words = Seq("continuellement", "abbandonata", "bilarna", "gatos",
      "huset", "boeken", "словами", "βιβλία", "كتابها", "evlerinden",
      "házakban", "cărțile", "புத்தகங்கள்", "palavras", "bøkene", "hunden",
      "running", "läufer")
    Language.all.foreach { lang =>
      val tok = Bm25Tokenizer(lang)
      words.foreach { w =>
        tok.tokenize(w) // must not throw on any script
      }
    }
  }
}
