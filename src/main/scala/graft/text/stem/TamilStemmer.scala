package graft.text.stem

/** Tamil Snowball stemmer (Damodharan's algorithm as shipped in Snowball
  * and rust-stemmers v1.2.0 `Algorithm::Tamil`, reference
  * `default_tokenizer.rs:102`).
  *
  * FIDELITY NOTE: structural port covering the algorithm's main passes —
  * question clitics, common plural/case/verb suffixes — with the less
  * common sandhi rewrites reduced. Under default normalization Tamil
  * script is transliterated to Latin before stemming, making this a no-op
  * there; it fires for `normalization(false)`.
  */
object TamilStemmer extends Stemmer {

  @inline private def isTamil(c: Char): Boolean = c >= '஀' && c <= '௿'

  // question / emphasis clitics
  private val clitics = Array("ோ", "ே", "ா")
  // plural and case suffixes (longest first)
  private val caseSuffixes = Array(
    "களுக்கு", "களுடைய", "களால்", "களில்", "களின்", "கள்",
    "க்களுக்கு", "க்கள்",
    "உக்கு", "ுக்கு", "ுடைய", "ிடம்", "ோடு", "ுடன்", "ால்", "ில்",
    "ின்", "ை", "ு").sortBy(-_.length)
  // common verb endings
  private val verbSuffixes = Array(
    "கிறேன்", "கிறாய்", "கிறான்", "கிறாள்", "கிறது", "கிறோம்",
    "கிறீர்கள்", "கிறார்கள்", "ந்தேன்", "ந்தான்", "ந்தாள்", "ந்தது",
    "ட்டேன்", "ட்டான்", "வேன்", "வான்", "வாள்", "வோம்", "ும்",
    "ினேன்", "ினான்", "ினாள்", "ினர்", "தல்", "ந்த", "ிய").sortBy(-_.length)

  def stem(word: String): String = {
    if (word.isEmpty || !word.exists(isTamil)) return word
    val sb = new StringBuilder(word)
    def strip(suffixes: Array[String], minStem: Int): Boolean = {
      var i = 0
      while (i < suffixes.length) {
        val s = suffixes(i)
        if (sb.length - s.length >= minStem && Snowball.endsWith(sb, s)) {
          sb.setLength(sb.length - s.length)
          return true
        }
        i += 1
      }
      false
    }
    strip(clitics, 2): Unit
    strip(caseSuffixes, 2): Unit
    strip(verbSuffixes, 2): Unit
    sb.toString
  }
}
