package graft.text.stem

/** The German Snowball stemmer, implemented from the published algorithm
  * definition (snowballstem.org, german.sbl as generated into rust-stemmers
  * v1.2.0 — the stemmer the reference uses for `Language::German`,
  * `/root/reference/src/default_tokenizer.rs:88-110`). Validated
  * token-for-token against the reference tokenizer snapshot
  * (`snapshots/bm25__default_tokenizer__tests__it_matches_snapshot_de.snap`).
  *
  * Note: with the tokenizer's normalization enabled (the default), input is
  * already ASCII (`ß`→`ss`, `ü`→`u`) before stemming; the umlaut handling here
  * matters for `normalization(false)` configurations.
  */
object GermanStemmer extends Stemmer {

  @inline private def isVowel(c: Char): Boolean =
    c == 'a' || c == 'e' || c == 'i' || c == 'o' || c == 'u' || c == 'y' ||
    c == 'ä' || c == 'ö' || c == 'ü'
  // 'U'/'Y' markers are consonants.

  @inline private def sEnding(c: Char): Boolean =
    c == 'b' || c == 'd' || c == 'f' || c == 'g' || c == 'h' || c == 'k' ||
    c == 'l' || c == 'm' || c == 'n' || c == 'r' || c == 't'

  @inline private def stEnding(c: Char): Boolean = // s-ending minus 'r'
    c == 'b' || c == 'd' || c == 'f' || c == 'g' || c == 'h' || c == 'k' ||
    c == 'l' || c == 'm' || c == 'n' || c == 't'

  def stem(word: String): String = {
    // Prelude: ß→ss; u/y between vowels → U/Y markers.
    var w = word.replace("ß", "ss")
    val sb = new StringBuilder(w)
    var i = 1
    while (i < sb.length - 1) {
      val c = sb.charAt(i)
      if ((c == 'u' || c == 'y') && isVowel(sb.charAt(i - 1)) && isVowel(sb.charAt(i + 1)))
        sb.setCharAt(i, if (c == 'u') 'U' else 'Y')
      i += 1
    }

    // mark_regions: p1 moved right to at least position 3 (Snowball:
    // `test(hop 3 setmark x) … try($p1 < x  $p1 = x)`). p2 is scanned from
    // the UNCLAMPED cursor — the clamp adjusts p1 only, the scan goes on
    // from where gopast left off (e.g. "iletheit": raw p1=2 → p1=3, p2=4).
    val rawP1 = regionAfterVC(sb, 0)
    val p2 = regionAfterVC(sb, rawP1)
    var p1 = rawP1
    if (sb.length >= 3 && p1 < 3) p1 = 3

    def inR1(n: Int) = sb.length - n >= p1
    def inR2(n: Int) = sb.length - n >= p2
    def ends(s: String): Boolean = {
      if (sb.length < s.length) return false
      var k = 0; val off = sb.length - s.length
      while (k < s.length) { if (sb.charAt(off + k) != s.charAt(k)) return false; k += 1 }
      true
    }
    def chop(n: Int): Unit = sb.setLength(sb.length - n)

    // Step 1 (longest among): em/ern/er | e/en/es (+niss fixup) | s (s-ending).
    if (ends("ern")) { if (inR1(3)) chop(3) }
    else if (ends("em")) { if (inR1(2)) chop(2) }
    else if (ends("er")) { if (inR1(2)) chop(2) }
    else if (ends("en") || ends("es")) { if (inR1(2)) { chop(2); nissFixup(sb) } }
    else if (ends("e")) { if (inR1(1)) { chop(1); nissFixup(sb) } }
    else if (ends("s")) {
      if (inR1(1) && sb.length >= 2 && sEnding(sb.charAt(sb.length - 2))) chop(1)
    }

    // Step 2 (longest among): en/er/est | st (st-ending, hop 3).
    if (ends("est")) { if (inR1(3)) chop(3) }
    else if (ends("en") || ends("er")) { if (inR1(2)) chop(2) }
    else if (ends("st")) {
      if (inR1(2) && sb.length >= 6 && stEnding(sb.charAt(sb.length - 3))) chop(2)
      // `st_ending hop 3`: the st-ending char must have ≥3 chars before it →
      // total length ≥ 2 (st) + 1 (ending) + 3 = 6.
    }

    // Step 3 (d-suffixes).
    if (ends("isch")) {
      if (inR2(4) && !(sb.length >= 5 && sb.charAt(sb.length - 5) == 'e')) chop(4)
    } else if (ends("lich") || ends("heit")) {
      if (inR2(4)) {
        chop(4)
        if (ends("er") || ends("en")) { if (inR1(2)) chop(2) }
      }
    } else if (ends("keit")) {
      if (inR2(4)) {
        chop(4)
        if (ends("lich")) { if (inR2(4)) chop(4) }
        else if (ends("ig")) { if (inR2(2)) chop(2) }
      }
    } else if (ends("end") || ends("ung")) {
      if (inR2(3)) {
        chop(3)
        if (ends("ig") && !(sb.length >= 3 && sb.charAt(sb.length - 3) == 'e') && inR2(2)) chop(2)
      }
    } else if (ends("ig") || ends("ik")) {
      if (inR2(2) && !(sb.length >= 3 && sb.charAt(sb.length - 3) == 'e')) chop(2)
    }

    // Postlude: unmark U/Y; strip umlaut dots.
    i = 0
    while (i < sb.length) {
      sb.charAt(i) match {
        case 'U' => sb.setCharAt(i, 'u')
        case 'Y' => sb.setCharAt(i, 'y')
        case 'ä' => sb.setCharAt(i, 'a')
        case 'ö' => sb.setCharAt(i, 'o')
        case 'ü' => sb.setCharAt(i, 'u')
        case _ =>
      }
      i += 1
    }
    sb.toString
  }

  /** After deleting e/en/es: if the word now ends 'niss', drop the final s. */
  private def nissFixup(sb: StringBuilder): Unit = {
    if (sb.length >= 4 &&
        sb.charAt(sb.length - 1) == 's' && sb.charAt(sb.length - 2) == 's' &&
        sb.charAt(sb.length - 3) == 'i' && sb.charAt(sb.length - 4) == 'n')
      sb.setLength(sb.length - 1)
  }

  private def regionAfterVC(sb: StringBuilder, from: Int): Int = {
    var j = from
    while (j < sb.length && !isVowel(sb.charAt(j))) j += 1
    while (j < sb.length && isVowel(sb.charAt(j))) j += 1
    if (j < sb.length) j + 1 else sb.length
  }
}
