package graft.tools

import graft.text.Language
import graft.text.stem._

/** Parity harness surface: stem a word list (one word per line, UTF-8) with
  * one of the 17 Snowball stemmers and print `word<TAB>stem` — diffed by
  * scripts/stem_parity.sh against the system libstemmer oracle
  * (scripts/sb_oracle.py) to validate fidelity of the Scala ports.
  *
  * Usage: runMain graft.tools.StemDump <language> <wordfile> [outfile]
  */
object StemDump {
  def stemmerFor(lang: String): Stemmer = Language.fromName(lang) match {
    case Some(Language.Arabic)     => ArabicStemmer
    case Some(Language.Danish)     => DanishStemmer
    case Some(Language.Dutch)      => DutchStemmer
    case Some(Language.English)    => EnglishStemmer
    case Some(Language.French)     => FrenchStemmer
    case Some(Language.German)     => GermanStemmer
    case Some(Language.Greek)      => GreekStemmer
    case Some(Language.Hungarian)  => HungarianStemmer
    case Some(Language.Italian)    => ItalianStemmer
    case Some(Language.Norwegian)  => NorwegianStemmer
    case Some(Language.Portuguese) => PortugueseStemmer
    case Some(Language.Romanian)   => RomanianStemmer
    case Some(Language.Russian)    => RussianStemmer
    case Some(Language.Spanish)    => SpanishStemmer
    case Some(Language.Swedish)    => SwedishStemmer
    case Some(Language.Tamil)      => TamilStemmer
    case Some(Language.Turkish)    => TurkishStemmer
    case _ => throw new IllegalArgumentException(s"unknown language: $lang")
  }

  def main(args: Array[String]): Unit = {
    val stemmer = stemmerFor(args(0))
    val in = java.nio.file.Paths.get(args(1))
    val words = java.nio.file.Files.readAllLines(in, java.nio.charset.StandardCharsets.UTF_8)
    val sb = new StringBuilder(words.size * 16)
    words.forEach { w0 =>
      val w = w0.trim
      if (w.nonEmpty) { sb.append(w).append('\t').append(stemmer.stem(w)).append('\n'): Unit }
    }
    if (args.length > 2)
      java.nio.file.Files.write(java.nio.file.Paths.get(args(2)),
        sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    else print(sb)
  }
}
