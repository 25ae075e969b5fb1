package graft.text.stem

/** Arabic Snowball stemmer (Assem Chelli's algorithm as shipped in Snowball
  * and rust-stemmers v1.2.0 `Algorithm::Arabic`, reference
  * `default_tokenizer.rs:90`).
  *
  * FIDELITY NOTE: structural port — the normalization passes (diacritics,
  * tatweel, hamza/alef forms), definite-article & conjunction prefixes and
  * the pronoun/feminine/plural suffixes follow the published algorithm;
  * the verb-form rewrite tables are reduced to the common cases. Under
  * default normalization Arabic script is transliterated to Latin before
  * stemming, making this a no-op there; it fires for
  * `normalization(false)`.
  */
object ArabicStemmer extends Stemmer {

  @inline private def isArabic(c: Char): Boolean = c >= '؀' && c <= 'ۿ'

  private val prefixes = Array(
    "وال", "بال", "كال", "فال", "لل", "ال", "و").sortBy(-_.length)

  private val suffixes = Array(
    "كما", "هما", "تما", "تان", "تين", "ات", "ان", "ين", "ون", "وا",
    "ها", "هم", "هن", "كم", "كن", "نا", "يا", "ما", "ة", "ه", "ي",
    "ك", "ت", "ا", "ن").sortBy(-_.length)

  def stem(word: String): String = {
    if (word.isEmpty || !word.exists(isArabic)) return word
    val sb = new StringBuilder(word.length)
    // normalization: drop diacritics (064B-0652), tatweel; unify alef/hamza
    var i = 0
    while (i < word.length) {
      val c = word.charAt(i)
      if (c >= 'ً' && c <= 'ْ') () // harakat — drop
      else if (c == 'ـ') ()             // tatweel — drop
      else if (c == 'أ' || c == 'إ' || c == 'آ') sb.append('ا')
      else if (c == 'ى') sb.append('ي')
      else if (c == 'ؤ' || c == 'ئ') sb.append('ء')
      else sb.append(c)
      i += 1
    }
    // prefixes (keep a stem of ≥ 2 letters)
    var p = 0
    var strippedPrefix = false
    while (!strippedPrefix && p < prefixes.length) {
      val pre = prefixes(p)
      if (sb.length - pre.length >= 2 && sb.startsWith(pre)) {
        sb.delete(0, pre.length)
        strippedPrefix = true
      }
      p += 1
    }
    // suffixes, at most two rounds (pronoun then feminine/plural marker)
    var round = 0
    while (round < 2) {
      round += 1
      var s = 0
      var stripped = false
      while (!stripped && s < suffixes.length) {
        val suf = suffixes(s)
        if (sb.length - suf.length >= 2 && Snowball.endsWith(sb, suf)) {
          sb.setLength(sb.length - suf.length)
          stripped = true
        }
        s += 1
      }
      if (!stripped) round = 2
    }
    sb.toString
  }
}
