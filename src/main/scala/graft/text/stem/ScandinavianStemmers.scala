package graft.text.stem

/** Shared machinery for the Snowball stemmer family: R1/R2 region
  * computation and longest-suffix matching. Each stemmer is implemented
  * from the published algorithm definition on snowballstem.org (the same
  * definitions rust-stemmers v1.2.0 is generated from — the stemmers the
  * reference selects per language at
  * `/root/reference/src/default_tokenizer.rs:88-110`). Fidelity is gated by
  * golden vectors generated with the system libstemmer (see
  * scripts/stem_parity.sh and StemGoldenSpec).
  */
private[stem] object Snowball {

  /** Standard region start: after the first non-vowel following a vowel,
    * scanning from `from`; end of word if none.
    */
  def regionAfterVC(w: CharSequence, from: Int, isVowel: Char => Boolean): Int = {
    var i = math.max(from, 1)
    while (i < w.length) {
      if (!isVowel(w.charAt(i)) && isVowel(w.charAt(i - 1))) return i + 1
      i += 1
    }
    w.length
  }

  /** R1 with the Scandinavian/German minimum: at least 3 letters before it. */
  def r1Min3(w: CharSequence, isVowel: Char => Boolean): Int = {
    val p1 = regionAfterVC(w, 0, isVowel)
    math.min(w.length, math.max(3, p1))
  }

  def endsWith(sb: StringBuilder, s: String): Boolean = {
    if (sb.length < s.length) return false
    var k = 0
    val off = sb.length - s.length
    while (k < s.length) {
      if (sb.charAt(off + k) != s.charAt(k)) return false
      k += 1
    }
    true
  }

  /** `setlimit tomark p1 for ([substring]) among(...)` semantics: the
    * longest candidate whose WHOLE match lies inside R1 (candidates that
    * would cross the region boundary are not considered at all — shorter
    * in-region alternatives still match). Returns null when none fits.
    * `cands` must be sorted longest-first.
    */
  def longestWithin(sb: StringBuilder, p1: Int, cands: Array[String]): String = {
    var i = 0
    while (i < cands.length) {
      val s = cands(i)
      if (sb.length - s.length >= p1 && endsWith(sb, s)) return s
      i += 1
    }
    null
  }
}

/** Danish Snowball stemmer (snowballstem.org/algorithms/danish/stemmer.html). */
object DanishStemmer extends Stemmer {
  import Snowball._

  @inline private def isV(c: Char): Boolean =
    c == 'a' || c == 'e' || c == 'i' || c == 'o' || c == 'u' || c == 'y' ||
    c == 'æ' || c == 'å' || c == 'ø'

  // valid s-endings: a b c d f g h j k l m n o p r t v y z å
  @inline private def sEnding(c: Char): Boolean =
    "abcdfghjklmnoprtvyzå".indexOf(c) >= 0

  // main_suffix delete-list ∪ the conditional 's', longest-first
  private val step1 = (Array(
    "erendes", "erende", "hedens", "ethed", "erede", "heden", "heder",
    "endes", "ernes", "erens", "erets", "ered", "ende", "erne", "eren",
    "erer", "heds", "enes", "eres", "eret", "hed", "ene", "ere", "ens",
    "ers", "ets", "en", "er", "es", "et", "e") :+ "s").sortBy(-_.length)

  private val step3 = Array("elig", "løst", "lig", "els", "ig").sortBy(-_.length)

  def stem(word: String): String = {
    if (word.length < 3) return word
    val sb = new StringBuilder(word)
    val p1 = r1Min3(sb, isV)
    def chop(n: Int): Unit = sb.setLength(sb.length - n)

    // step 1 (main_suffix): longest fitting within R1; 's' needs an s-ending
    // char that is itself inside R1 (the grouping test cannot cross the
    // setlimit boundary)
    // the setlimit restricts only the [substring] match; the s_ending test
    // in the among action may look left of R1
    val m = longestWithin(sb, p1, step1)
    if (m != null) {
      if (m != "s") chop(m.length)
      else if (sb.length >= 2 && sEnding(sb.charAt(sb.length - 2))) chop(1)
    }

    // step 2 (consonant_pair): gd dt gt kt fully in R1 → delete last letter
    def consonantPair(): Unit = {
      if (sb.length >= 2 && sb.length - 2 >= p1) {
        val pair = sb.substring(sb.length - 2)
        if (pair == "gd" || pair == "dt" || pair == "gt" || pair == "kt") chop(1)
      }
    }
    consonantPair()

    // step 3 (other_suffix): first `do (['st'] 'ig' delete)` (no region
    // test), then the longest fitting among in R1
    if (endsWith(sb, "igst")) chop(2)
    val m3 = longestWithin(sb, p1, step3)
    if (m3 == "løst") chop(1)
    else if (m3 != null) { chop(m3.length); consonantPair() }

    // step 4 (undouble): final non-vowel inside R1 repeated by the char to
    // its left (which may lie OUTSIDE R1 — only the deleted char is
    // region-bound) → delete one
    if (sb.length >= 2 && sb.length - 1 >= p1 && !isV(sb.charAt(sb.length - 1)) &&
        sb.charAt(sb.length - 2) == sb.charAt(sb.length - 1)) chop(1)
    sb.toString
  }
}

/** Norwegian Snowball stemmer (snowballstem.org/algorithms/norwegian/stemmer.html). */
object NorwegianStemmer extends Stemmer {
  import Snowball._

  @inline private def isV(c: Char): Boolean =
    c == 'a' || c == 'e' || c == 'i' || c == 'o' || c == 'u' || c == 'y' ||
    c == 'æ' || c == 'å' || c == 'ø'

  private val step1 = (Array(
    "hetenes", "hetene", "hetens", "heten", "heter", "endes", "edes",
    "enes", "ende", "ande", "ane", "ene", "ens", "ers", "ets", "ast",
    "ede", "het", "en", "ar", "er", "as", "es", "et", "a", "e") ++
    Array("erte", "ert", "s")).sortBy(-_.length)

  private val step3 = Array("hetslov", "slov", "elov", "elig", "eleg", "eig",
    "lig", "els", "lov", "leg", "ig").sortBy(-_.length)

  def stem(word: String): String = {
    if (word.length < 3) return word
    val sb = new StringBuilder(word)
    val p1 = r1Min3(sb, isV)
    def chop(n: Int): Unit = sb.setLength(sb.length - n)

    // s-ending: b c d f g h j l m n o p r t v y z, or k not preceded by a
    // vowel — the tested chars must stay inside R1 (setlimit)
    // the among action runs outside the setlimit: chars left of R1 are fair
    // game for the s-ending test
    def validS: Boolean = {
      if (sb.length < 2) return false
      val c = sb.charAt(sb.length - 2)
      if ("bcdfghjlmnoprtvyz".indexOf(c) >= 0) return true
      c == 'k' && (sb.length < 3 || !isV(sb.charAt(sb.length - 3)))
    }

    val m = longestWithin(sb, p1, step1)
    if (m == "erte" || m == "ert") chop(m.length - 2) // → 'er'
    else if (m == "s") { if (validS) chop(1) }
    else if (m != null) chop(m.length)

    // step 2: dt vt fully in R1 → delete last letter
    if (sb.length >= 2 && sb.length - 2 >= p1) {
      val pair = sb.substring(sb.length - 2)
      if (pair == "dt" || pair == "vt") chop(1)
    }

    // step 3: longest fitting within R1 → delete
    val m3 = longestWithin(sb, p1, step3)
    if (m3 != null) chop(m3.length)
    sb.toString
  }
}

/** Swedish Snowball stemmer (snowballstem.org/algorithms/swedish/stemmer.html). */
object SwedishStemmer extends Stemmer {
  import Snowball._

  @inline private def isV(c: Char): Boolean =
    c == 'a' || c == 'e' || c == 'i' || c == 'o' || c == 'u' || c == 'y' ||
    c == 'ä' || c == 'å' || c == 'ö'

  // valid s-endings: b c d f g h j k l m n o p r t v y
  @inline private def sEnding(c: Char): Boolean =
    "bcdfghjklmnoprtvy".indexOf(c) >= 0

  private val step1 = (Array(
    "heterna", "hetens", "anden", "heten", "heter", "arnas", "ernas",
    "ornas", "arna", "erna", "orna", "ande", "arne", "aste", "aren",
    "ades", "andes", "andet", "arens", "erns", "ern", "ens", "het",
    "ast", "ade", "are", "ad", "en", "ar", "er", "or", "as", "es", "at",
    "a", "e") :+ "s").sortBy(-_.length)

  private val step3 = Array("fullt", "löst", "lig", "els", "ig").sortBy(-_.length)

  def stem(word: String): String = {
    if (word.length < 3) return word
    val sb = new StringBuilder(word)
    val p1 = r1Min3(sb, isV)
    def chop(n: Int): Unit = sb.setLength(sb.length - n)

    // step 1: longest fitting within R1; the s-ending test is NOT
    // region-restricted (runs outside the setlimit)
    val m = longestWithin(sb, p1, step1)
    if (m != null) {
      if (m != "s") chop(m.length)
      else if (sb.length >= 2 && sEnding(sb.charAt(sb.length - 2))) chop(1)
    }

    // step 2: dd gd nn dt gt kt tt fully in R1 → delete last letter
    if (sb.length >= 2 && sb.length - 2 >= p1) {
      val pair = sb.substring(sb.length - 2)
      if (pair == "dd" || pair == "gd" || pair == "nn" || pair == "dt" ||
          pair == "gt" || pair == "kt" || pair == "tt") chop(1)
    }

    // step 3: longest fitting within R1; fullt/löst drop the final t
    val m3 = longestWithin(sb, p1, step3)
    if (m3 == "fullt" || m3 == "löst") chop(1)
    else if (m3 != null) chop(m3.length)
    sb.toString
  }
}
