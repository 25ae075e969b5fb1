package graft.text.stem

/** Dutch Snowball stemmer, implemented from the published algorithm
  * (snowballstem.org/algorithms/dutch/stemmer.html; rust-stemmers v1.2.0
  * `Algorithm::Dutch`, selected by the reference for `Language::Dutch` at
  * `/root/reference/src/default_tokenizer.rs:93`).
  */
object DutchStemmer extends Stemmer {
  import Snowball._

  @inline private def isV(c: Char): Boolean =
    c == 'a' || c == 'e' || c == 'i' || c == 'o' || c == 'u' || c == 'y' || c == 'è'

  def stem(word: String): String = {
    if (word.isEmpty) return word
    // Prelude: strip umlauts/acutes, then mark consonantal y/i as Y/I.
    val sb = new StringBuilder(word.length)
    var i = 0
    while (i < word.length) {
      sb.append(word.charAt(i) match {
        case 'ä' | 'á' => 'a'
        case 'ë' | 'é' => 'e'
        case 'ï' | 'í' => 'i'
        case 'ö' | 'ó' => 'o'
        case 'ü' | 'ú' => 'u'
        case c => c
      })
      i += 1
    }
    if (sb.nonEmpty && sb.charAt(0) == 'y') sb.setCharAt(0, 'Y')
    i = 1
    while (i < sb.length) {
      val c = sb.charAt(i)
      if (c == 'y' && isV(sb.charAt(i - 1))) sb.setCharAt(i, 'Y')
      else if (c == 'i' && isV(sb.charAt(i - 1)) && i + 1 < sb.length && isV(sb.charAt(i + 1)))
        sb.setCharAt(i, 'I')
      i += 1
    }

    val p1 = r1Min3(sb, isV)
    val p2 = regionAfterVC(sb, regionAfterVC(sb, 0, isV), isV)
    def inR1(n: Int) = sb.length - n >= p1
    def inR2(n: Int) = sb.length - n >= p2
    def chop(n: Int): Unit = sb.setLength(sb.length - n)
    def undouble(): Unit =
      if (sb.length >= 2 &&
          (endsWith(sb, "kk") || endsWith(sb, "dd") || endsWith(sb, "tt"))) chop(1)
    // valid en-ending: preceded by a non-vowel, and not by the string gem
    def validEn(n: Int): Boolean =
      sb.length > n && !isV(sb.charAt(sb.length - n - 1)) && {
        val stemEnd = sb.length - n
        !(stemEnd >= 3 && sb.substring(stemEnd - 3, stemEnd) == "gem")
      }

    // Step 1 (longest among heden | ene, en | se, s)
    if (endsWith(sb, "heden")) {
      if (inR1(5)) { chop(5); sb.append("heid") }
    } else if (endsWith(sb, "ene")) {
      if (inR1(3) && validEn(3)) { chop(3); undouble() }
    } else if (endsWith(sb, "en")) {
      if (inR1(2) && validEn(2)) { chop(2); undouble() }
    } else if (endsWith(sb, "se")) {
      // valid s-ending: a non-vowel other than j
      if (inR1(2) && sb.length > 2 && !isV(sb.charAt(sb.length - 3)) &&
          sb.charAt(sb.length - 3) != 'j') chop(2)
    } else if (endsWith(sb, "s")) {
      if (inR1(1) && sb.length > 1 && !isV(sb.charAt(sb.length - 2)) &&
          sb.charAt(sb.length - 2) != 'j') chop(1)
    }

    // Step 2: delete suffix e if in R1 and preceded by a non-vowel
    var eFound = false
    if (endsWith(sb, "e") && inR1(1) && sb.length > 1 && !isV(sb.charAt(sb.length - 2))) {
      eFound = true
      chop(1); undouble()
    }

    // Step 3a: heid (if in R2, not preceded by c) → delete, then an
    // immediately-following en is treated like step 1(b)
    if (endsWith(sb, "heid") && inR2(4) &&
        (sb.length == 4 || sb.charAt(sb.length - 5) != 'c')) {
      chop(4)
      if (endsWith(sb, "en") && inR1(2) && validEn(2)) { chop(2); undouble() }
    }

    // Step 3b: d-suffixes (longest among end/ing/ig/lijk/baar/bar)
    if (endsWith(sb, "end") || endsWith(sb, "ing")) {
      if (inR2(3)) {
        chop(3)
        if (endsWith(sb, "ig") && inR2(2) &&
            (sb.length == 2 || sb.charAt(sb.length - 3) != 'e')) chop(2)
        else undouble()
      }
    } else if (endsWith(sb, "lijk")) {
      if (inR2(4)) {
        chop(4)
        // repeat step 2
        if (endsWith(sb, "e") && inR1(1) && sb.length > 1 && !isV(sb.charAt(sb.length - 2))) {
          chop(1); undouble()
        }
      }
    } else if (endsWith(sb, "baar")) {
      if (inR2(4)) chop(4)
    } else if (endsWith(sb, "bar")) {
      if (inR2(3) && eFound) chop(3)
    } else if (endsWith(sb, "ig")) {
      if (inR2(2) && (sb.length == 2 || sb.charAt(sb.length - 3) != 'e')) chop(2)
    }

    // Step 4 (undouble vowel): ...C V V D with V ∈ {a,e,o,u}, D a non-vowel
    // other than I → drop one vowel
    if (sb.length >= 4) {
      val d = sb.charAt(sb.length - 1)
      val v2 = sb.charAt(sb.length - 2)
      val v1 = sb.charAt(sb.length - 3)
      val c = sb.charAt(sb.length - 4)
      if (!isV(d) && d != 'I' && v1 == v2 &&
          (v1 == 'a' || v1 == 'e' || v1 == 'o' || v1 == 'u') && !isV(c)) {
        sb.deleteCharAt(sb.length - 2)
      }
    }

    // Postlude: unmark Y/I
    i = 0
    while (i < sb.length) {
      val c = sb.charAt(i)
      if (c == 'Y') sb.setCharAt(i, 'y')
      else if (c == 'I') sb.setCharAt(i, 'i')
      i += 1
    }
    sb.toString
  }
}
