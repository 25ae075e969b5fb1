package graft.text.stem

/** Shared machinery for the Snowball stemmer family: R1/R2 region
  * computation and longest-suffix matching. Each stemmer is implemented
  * from the published algorithm definition on snowballstem.org (the same
  * definitions rust-stemmers v1.2.0 is generated from — the stemmers the
  * reference selects per language at
  * `/root/reference/src/default_tokenizer.rs:88-110`).
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

  // step-1 suffixes longest-first ('s' handled via its own rule below)
  private val step1 = Array(
    "erendes", "erende", "hedens", "ethed", "erede", "heden", "heder",
    "endes", "ernes", "erens", "erets", "ered", "ende", "erne", "eren",
    "erer", "heds", "enes", "eres", "eret", "hed", "ene", "ere", "ens",
    "ers", "ets", "en", "er", "es", "et", "e")

  def stem(word: String): String = {
    if (word.length < 3) return word
    val sb = new StringBuilder(word)
    val p1 = r1Min3(sb, isV)
    def inR1(n: Int) = sb.length - n >= p1
    def chop(n: Int): Unit = sb.setLength(sb.length - n)

    // step 1: longest match among suffixes + the conditional 's'
    var matched: String = null
    var i = 0
    while (matched == null && i < step1.length) {
      if (endsWith(sb, step1(i))) matched = step1(i)
      i += 1
    }
    if (matched != null) {
      // 's' is shorter than every listed suffix, so a listed match wins
      if (inR1(matched.length)) chop(matched.length)
    } else if (endsWith(sb, "s") && inR1(1) &&
               sb.length >= 2 && sEnding(sb.charAt(sb.length - 2))) {
      chop(1)
    }

    // step 2 (consonant pair): gd dt gt kt in R1 → delete last letter
    def consonantPair(): Unit = {
      if (sb.length >= 2 && inR1(2)) {
        val pair = sb.substring(sb.length - 2)
        if (pair == "gd" || pair == "dt" || pair == "gt" || pair == "kt") chop(1)
      }
    }
    consonantPair()

    // step 3: igst → remove st; then elig/lig/els/ig delete in R1 (+ step 2
    // again); løst → løs in R1
    if (endsWith(sb, "igst")) chop(2)
    if (endsWith(sb, "elig")) { if (inR1(4)) { chop(4); consonantPair() } }
    else if (endsWith(sb, "løst")) { if (inR1(4)) chop(1) }
    else if (endsWith(sb, "lig")) { if (inR1(3)) { chop(3); consonantPair() } }
    else if (endsWith(sb, "els")) { if (inR1(3)) { chop(3); consonantPair() } }
    else if (endsWith(sb, "ig")) { if (inR1(2)) { chop(2); consonantPair() } }

    // step 4 (undouble): final double non-vowel with last char in R1
    if (sb.length >= 2 && inR1(1)) {
      val c = sb.charAt(sb.length - 1)
      if (!isV(c) && sb.charAt(sb.length - 2) == c) chop(1)
    }
    sb.toString
  }
}

/** Norwegian Snowball stemmer (snowballstem.org/algorithms/norwegian/stemmer.html). */
object NorwegianStemmer extends Stemmer {
  import Snowball._

  @inline private def isV(c: Char): Boolean =
    c == 'a' || c == 'e' || c == 'i' || c == 'o' || c == 'u' || c == 'y' ||
    c == 'æ' || c == 'å' || c == 'ø'

  // s-endings: b c d f g h j l m n o p r t v y z, or k not preceded by vowel
  private def validS(sb: StringBuilder): Boolean = {
    if (sb.length < 2) return false
    val c = sb.charAt(sb.length - 2)
    if ("bcdfghjlmnoprtvyz".indexOf(c) >= 0) return true
    c == 'k' && (sb.length < 3 || !isV(sb.charAt(sb.length - 3)))
  }

  // step-1 suffixes longest-first; erte/ert replace with er; s conditional
  private val step1Delete = Array(
    "hetenes", "hetene", "hetens", "heten", "heter", "endes", "edes",
    "enes", "ende", "ande", "ane", "ene", "ens", "ers", "ets", "ast",
    "ede", "het", "en", "ar", "er", "as", "es", "et", "a", "e")

  def stem(word: String): String = {
    if (word.length < 3) return word
    val sb = new StringBuilder(word)
    val p1 = r1Min3(sb, isV)
    def inR1(n: Int) = sb.length - n >= p1
    def chop(n: Int): Unit = sb.setLength(sb.length - n)

    // step 1: longest among delete-list ∪ {erte, ert → er} ∪ {s}
    var best: String = null
    var kind = 0 // 0 = delete, 1 = →er, 2 = s
    var i = 0
    while (i < step1Delete.length) {
      val s = step1Delete(i)
      if ((best == null || s.length > best.length) && endsWith(sb, s)) { best = s; kind = 0 }
      i += 1
    }
    if ((best == null || best.length < 4) && endsWith(sb, "erte")) { best = "erte"; kind = 1 }
    else if ((best == null || best.length < 3) && endsWith(sb, "ert")) { best = "ert"; kind = 1 }
    if (best == null && endsWith(sb, "s")) { best = "s"; kind = 2 }
    if (best != null) kind match {
      case 0 => if (inR1(best.length)) chop(best.length)
      case 1 => if (inR1(best.length)) chop(best.length - 2) // erte/ert → er
      case 2 => if (inR1(1) && validS(sb)) chop(1)
    }

    // step 2: dt vt in R1 → delete last letter
    if (sb.length >= 2 && inR1(2)) {
      val pair = sb.substring(sb.length - 2)
      if (pair == "dt" || pair == "vt") chop(1)
    }

    // step 3: longest among, delete if in R1
    val step3 = Array("hetslov", "slov", "elov", "elig", "eleg", "eig",
      "lig", "els", "lov", "leg", "ig")
    var j = 0
    var done = false
    while (!done && j < step3.length) {
      if (endsWith(sb, step3(j))) {
        if (inR1(step3(j).length)) chop(step3(j).length)
        done = true
      }
      j += 1
    }
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

  private val step1 = Array(
    "heterna", "hetens", "anden", "heten", "heter", "arnas", "ernas",
    "ornas", "arna", "erna", "orna", "ande", "arne", "aste", "aren",
    "ades", "andes", "andet", "arens", "erns", "ern", "ens", "het",
    "ast", "ade", "are", "ad", "en", "ar", "er", "or", "as", "es", "at",
    "a", "e")

  def stem(word: String): String = {
    if (word.length < 3) return word
    val sb = new StringBuilder(word)
    val p1 = r1Min3(sb, isV)
    def inR1(n: Int) = sb.length - n >= p1
    def chop(n: Int): Unit = sb.setLength(sb.length - n)

    // step 1: longest among delete-list ∪ {s}
    var best: String = null
    var i = 0
    while (i < step1.length) {
      val s = step1(i)
      if ((best == null || s.length > best.length) && endsWith(sb, s)) best = s
      i += 1
    }
    if (best != null) {
      if (inR1(best.length)) chop(best.length)
    } else if (endsWith(sb, "s") && inR1(1) &&
               sb.length >= 2 && sEnding(sb.charAt(sb.length - 2))) {
      chop(1)
    }

    // step 2: dd gd nn dt gt kt tt in R1 → delete last letter
    if (sb.length >= 2 && inR1(2)) {
      val pair = sb.substring(sb.length - 2)
      if (pair == "dd" || pair == "gd" || pair == "nn" || pair == "dt" ||
          pair == "gt" || pair == "kt" || pair == "tt") chop(1)
    }

    // step 3: lig ig els delete in R1; löst → lös; fullt → full
    if (endsWith(sb, "fullt")) { if (inR1(5)) chop(1) }
    else if (endsWith(sb, "löst")) { if (inR1(4)) chop(1) }
    else if (endsWith(sb, "lig")) { if (inR1(3)) chop(3) }
    else if (endsWith(sb, "els")) { if (inR1(3)) chop(3) }
    else if (endsWith(sb, "ig")) { if (inR1(2)) chop(2) }
    sb.toString
  }
}
