package graft.text.stem

/** Greek Snowball stemmer (Ntais/Saroukos algorithm as shipped in Snowball
  * and rust-stemmers v1.2.0 `Algorithm::Greek`, reference
  * `default_tokenizer.rs:~95`).
  *
  * FIDELITY NOTE: structural port — the inflectional suffix classes
  * (nouns/adjectives/verbs) and the final-vowel removal follow the
  * published algorithm's shape, but the ~160 exception word lists of the
  * full algorithm could not be re-derived offline, so protected words may
  * over-stem. Under default normalization Greek script is transliterated
  * to Latin before stemming, making this a no-op there (as rust-stemmers
  * is on Latin input); it fires for `normalization(false)`.
  */
object GreekStemmer extends Stemmer {

  @inline private def isGreek(c: Char): Boolean = c >= 'α' && c <= 'ω' || c == 'ς'

  // longest-first inflectional endings (nominal + verbal), lower-case,
  // final-sigma normalized to σ before matching
  private val endings = Array(
    "ιουσαν", "ουσανε", "ουσαμε", "ιεμαστε", "ομασταν", "ιομασταν",
    "οσασταν", "ιοσασταν", "ιουνταν", "ιονταν", "ουνται", "ονταν",
    "ομαστε", "οσαστε", "ουσατε", "ηθηκαν", "ηθηκες", "ηθηκε",
    "ονται", "ομουν", "οσουν", "εσαι", "εται", "ουσαν", "ουσες",
    "ησατε", "ησαμε", "ησουν", "ησεις", "ησαν", "ηκαν", "ουμε",
    "ειτε", "εσαι", "ουσα", "ουσε", "ησες", "ησει", "ησε", "ηκε",
    "θηκα", "θηκε", "μενη", "μενο", "μενα", "μενοι", "μενες", "ματα",
    "ματων", "ματος", "ουν", "εις", "ετε", "ουν", "ομε", "αμε",
    "ατε", "εσα", "ησα", "ηκα", "ωντασ", "οντασ", "ιων", "εων",
    "ικα", "ικο", "ικη", "ικου", "ικων", "ικεσ", "ικα", "αδεσ",
    "αδων", "ουδεσ", "ουδων", "εασ", "ειο", "ειου", "ειων", "ια",
    "ιο", "ιου", "ιασ", "ιεσ", "ιων", "οσ", "ησ", "ων", "ου", "ασ",
    "εσ", "οι", "αι", "α", "η", "ο", "ι", "ε", "ω", "υ").sortBy(-_.length)

  def stem(word: String): String = {
    if (word.length < 3 || !word.forall(c => isGreek(c) || !Character.isLetter(c)))
      return word
    // final sigma normalization
    val sb = new StringBuilder(word.replace('ς', 'σ'))
    var i = 0
    var found = false
    while (!found && i < endings.length) {
      val s = endings(i)
      // keep at least a 2-letter stem with one vowel
      if (sb.length - s.length >= 2 && Snowball.endsWith(sb, s)) {
        val stemLen = sb.length - s.length
        var hasVowel = false
        var j = 0
        while (j < stemLen && !hasVowel) {
          val c = sb.charAt(j)
          hasVowel = c == 'α' || c == 'ε' || c == 'η' || c == 'ι' ||
            c == 'ο' || c == 'υ' || c == 'ω'
          j += 1
        }
        if (hasVowel) { sb.setLength(stemLen); found = true }
      }
      i += 1
    }
    sb.toString
  }
}
