package graft.text.stem

/** The English (Porter2) Snowball stemmer, implemented from the published
  * algorithm definition (snowballstem.org, english.sbl as generated into
  * rust-stemmers v1.2.0 — the stemmer the reference uses for
  * `Language::English`, `/root/reference/src/default_tokenizer.rs:88-110`).
  * Validated token-for-token against the reference tokenizer snapshot
  * (`snapshots/bm25__default_tokenizer__tests__it_matches_snapshot_en.snap`,
  * ~3.6k tokens) plus the inline unit vectors (`connections`→`connect`, …).
  */
object EnglishStemmer extends Stemmer {

  private val exception1: Map[String, String] = Map(
    "skis" -> "ski", "skies" -> "sky", "dying" -> "die", "lying" -> "lie",
    "tying" -> "tie", "idly" -> "idl", "gently" -> "gentl", "ugly" -> "ugli",
    "early" -> "earli", "only" -> "onli", "singly" -> "singl",
    "sky" -> "sky", "news" -> "news", "howe" -> "howe", "atlas" -> "atlas",
    "cosmos" -> "cosmos", "bias" -> "bias", "andes" -> "andes"
  )

  private val exception2: Set[String] = Set(
    "inning", "outing", "canning", "herring", "earring",
    "proceed", "exceed", "succeed"
  )

  private val doubles = Set("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")

  @inline private def isVowel(c: Char): Boolean =
    c == 'a' || c == 'e' || c == 'i' || c == 'o' || c == 'u' || c == 'y'
  // After the prelude, 'Y' marks a consonant-y; lowercase 'y' counts as vowel.

  @inline private def validLiEnding(c: Char): Boolean =
    c == 'c' || c == 'd' || c == 'e' || c == 'g' || c == 'h' || c == 'k' ||
    c == 'm' || c == 'n' || c == 'r' || c == 't'

  def stem(word: String): String = {
    exception1.get(word) match {
      case Some(s) => return s
      case None    =>
    }
    if (word.length < 3) return word

    // Prelude: strip one leading apostrophe; mark consonant-y as 'Y'.
    var w = if (word.charAt(0) == '\'') word.substring(1) else word
    if (w.length < 3) {
      // snowball gates `hop 3` on the original word; after removing a leading
      // apostrophe the remainder is still processed, but suffix steps need
      // length; keep going with what we have (matches generated code which
      // checks length before the prelude on the raw word).
    }
    val sb = new StringBuilder(w)
    var yFound = false
    if (sb.nonEmpty && sb.charAt(0) == 'y') { sb.setCharAt(0, 'Y'); yFound = true }
    var i = 1
    while (i < sb.length) {
      if (sb.charAt(i) == 'y' && isVowel(sb.charAt(i - 1))) { sb.setCharAt(i, 'Y'); yFound = true }
      i += 1
    }

    // mark_regions: p1/p2, with gener/commun/arsen special-case for p1.
    var p1 = sb.length
    var p2 = sb.length
    val s0 = sb.toString
    val special = List("gener", "commun", "arsen").find(p => s0.startsWith(p))
    special match {
      case Some(p) => p1 = p.length
      case None =>
        var j = 0
        // gopast v; gopast non-v
        while (j < sb.length && !isVowel(sb.charAt(j))) j += 1
        while (j < sb.length && isVowel(sb.charAt(j))) j += 1
        if (j < sb.length) p1 = j + 1 else p1 = sb.length
        // note: gopast v leaves cursor after the first vowel; gopast non-v
        // after the first subsequent non-vowel → p1 = that index + 1.
        // Re-derive precisely below.
        p1 = regionAfterVC(sb, 0)
    }
    p2 = regionAfterVC(sb, p1)

    def inR1(suffixLen: Int): Boolean = sb.length - suffixLen >= p1
    def inR2(suffixLen: Int): Boolean = sb.length - suffixLen >= p2
    def ends(s: String): Boolean = sb.length >= s.length && {
      var k = 0; val off = sb.length - s.length
      var ok = true
      while (k < s.length && ok) { if (sb.charAt(off + k) != s.charAt(k)) ok = false; k += 1 }
      ok
    }
    def chop(n: Int): Unit = sb.setLength(sb.length - n)
    def replaceSuffix(n: Int, repl: String): Unit = { chop(n); sb.append(repl) }

    // Step 0: longest among "'", "'s", "'s'".
    if (ends("'s'")) chop(3)
    else if (ends("'s")) chop(2)
    else if (ends("'")) chop(1)

    // Step 1a.
    if (ends("sses")) replaceSuffix(4, "ss")
    else if (ends("ied") || ends("ies")) {
      if (sb.length - 3 > 1) replaceSuffix(3, "i") else replaceSuffix(3, "ie")
    } else if (ends("us") || ends("ss")) { /* nothing */ }
    else if (ends("s")) {
      // delete if a vowel exists before the char immediately preceding the s
      var k = 0
      var found = false
      while (k < sb.length - 2 && !found) { if (isVowel(sb.charAt(k))) found = true; k += 1 }
      if (found) chop(1)
    }

    if (exception2.contains(sb.toString)) return postlude(sb, yFound)

    // Step 1b.
    var done1b = false
    if (ends("eedly")) { if (inR1(5)) replaceSuffix(5, "ee"); done1b = true }
    else if (ends("eed")) { if (inR1(3)) replaceSuffix(3, "ee"); done1b = true }
    if (!done1b) {
      val suf =
        if (ends("ingly")) 5
        else if (ends("edly")) 4
        else if (ends("ing")) 3
        else if (ends("ed")) 2
        else 0
      if (suf > 0) {
        // `test gopast v` — a vowel must exist in the preceding word part.
        var k = 0
        var hasV = false
        while (k < sb.length - suf && !hasV) { if (isVowel(sb.charAt(k))) hasV = true; k += 1 }
        if (hasV) {
          chop(suf)
          if (ends("at") || ends("bl") || ends("iz")) sb.append('e')
          else if (sb.length >= 2 && doubles.contains(sb.substring(sb.length - 2))) chop(1)
          else if (p1 == sb.length && endsShortSyllable(sb)) sb.append('e')
        }
      }
    }

    // Step 1c: y/Y → i if preceded by a non-vowel which is not the first char.
    if (sb.length >= 3) {
      val last = sb.charAt(sb.length - 1)
      if ((last == 'y' || last == 'Y') && !isVowel(sb.charAt(sb.length - 2)))
        sb.setCharAt(sb.length - 1, 'i')
    } else if (sb.length == 2) {
      // non-v + not atlimit: with len 2 the preceding char IS the first char → no-op.
    }

    // Step 2 (longest among, suffix must be in R1).
    step2(sb, p1)

    // Step 3 (in R1; 'ative' needs R2).
    step3(sb, p1, p2)

    // Step 4 (in R2).
    step4(sb, p2)

    // Step 5.
    if (sb.nonEmpty && sb.charAt(sb.length - 1) == 'e') {
      val lenAfter = sb.length - 1
      if (lenAfter >= p2) chop(1)
      else if (lenAfter >= p1) {
        // not preceded by a short syllable (tested on the word minus the e)
        val tmp = new StringBuilder(sb.substring(0, lenAfter))
        if (!endsShortSyllable(tmp)) chop(1)
      }
    } else if (sb.length >= 2 && sb.charAt(sb.length - 1) == 'l') {
      if (sb.length - 1 >= p2 && sb.charAt(sb.length - 2) == 'l') chop(1)
    }

    postlude(sb, yFound)
  }

  /** Cursor position just past the first non-vowel that follows a vowel,
    * scanning from `from`; length of sb if not found. (Snowball's
    * `gopast v gopast non-v`.)
    */
  private def regionAfterVC(sb: StringBuilder, from: Int): Int = {
    var j = from
    while (j < sb.length && !isVowel(sb.charAt(j))) j += 1
    while (j < sb.length && isVowel(sb.charAt(j))) j += 1
    if (j < sb.length) j + 1 else sb.length
  }

  /** Ends in a short syllable: (non-v, v, non-v other than w/x/Y) at end, or
    * (v, non-v) where the vowel is the first char of the word.
    */
  private def endsShortSyllable(sb: StringBuilder): Boolean = {
    val n = sb.length
    if (n == 2) isVowel(sb.charAt(0)) && !isVowel(sb.charAt(1))
    else if (n >= 3) {
      val c2 = sb.charAt(n - 1); val c1 = sb.charAt(n - 2); val c0 = sb.charAt(n - 3)
      !isVowel(c2) && c2 != 'w' && c2 != 'x' && c2 != 'Y' && isVowel(c1) && !isVowel(c0)
    } else false
  }

  /** Direct suffix compare (lastIndexOf scans the whole builder on a miss —
    * measurable in the index build's hot loop).
    */
  @inline private def endsWith(sb: StringBuilder, s: String): Boolean = {
    val off = sb.length - s.length
    if (off < 0) return false
    var k = 0
    while (k < s.length) {
      if (sb.charAt(off + k) != s.charAt(k)) return false
      k += 1
    }
    true
  }

  private def step2(sb: StringBuilder, p1: Int): Unit = {
    def ends(s: String) = endsWith(sb, s)
    def inR1(n: Int) = sb.length - n >= p1
    def repl(n: Int, r: String): Unit = { sb.setLength(sb.length - n); sb.append(r) }
    // longest-match among; the first matching suffix fires (or does nothing
    // if its R1 condition fails — no fallback to shorter suffixes)
    if (ends("ization")) { if (inR1(7)) repl(7, "ize") }
    else if (ends("ational")) { if (inR1(7)) repl(7, "ate") }
    else if (ends("fulness")) { if (inR1(7)) repl(7, "ful") }
    else if (ends("ousness")) { if (inR1(7)) repl(7, "ous") }
    else if (ends("iveness")) { if (inR1(7)) repl(7, "ive") }
    else if (ends("tional")) { if (inR1(6)) repl(6, "tion") }
    else if (ends("biliti")) { if (inR1(6)) repl(6, "ble") }
    else if (ends("lessli")) { if (inR1(6)) repl(6, "less") }
    else if (ends("entli")) { if (inR1(5)) repl(5, "ent") }
    else if (ends("ation")) { if (inR1(5)) repl(5, "ate") }
    else if (ends("alism")) { if (inR1(5)) repl(5, "al") }
    else if (ends("aliti")) { if (inR1(5)) repl(5, "al") }
    else if (ends("ousli")) { if (inR1(5)) repl(5, "ous") }
    else if (ends("iviti")) { if (inR1(5)) repl(5, "ive") }
    else if (ends("fulli")) { if (inR1(5)) repl(5, "ful") }
    else if (ends("enci")) { if (inR1(4)) repl(4, "ence") }
    else if (ends("anci")) { if (inR1(4)) repl(4, "ance") }
    else if (ends("abli")) { if (inR1(4)) repl(4, "able") }
    else if (ends("izer")) { if (inR1(4)) repl(4, "ize") }
    else if (ends("ator")) { if (inR1(4)) repl(4, "ate") }
    else if (ends("alli")) { if (inR1(4)) repl(4, "al") }
    else if (ends("ogi")) { if (inR1(3) && sb.length >= 4 && sb.charAt(sb.length - 4) == 'l') repl(3, "og") }
    else if (ends("bli")) { if (inR1(3)) repl(3, "ble") }
    else if (ends("li")) { if (inR1(2) && sb.length >= 3 && validLiEnding(sb.charAt(sb.length - 3))) sb.setLength(sb.length - 2) }
  }

  private def step3(sb: StringBuilder, p1: Int, p2: Int): Unit = {
    def ends(s: String) = endsWith(sb, s)
    def inR1(n: Int) = sb.length - n >= p1
    def inR2(n: Int) = sb.length - n >= p2
    def repl(n: Int, r: String): Unit = { sb.setLength(sb.length - n); sb.append(r) }
    if (ends("ational")) { if (inR1(7)) repl(7, "ate") }
    else if (ends("tional")) { if (inR1(6)) repl(6, "tion") }
    else if (ends("alize")) { if (inR1(5)) repl(5, "al") }
    else if (ends("icate") || ends("iciti")) { if (inR1(5)) repl(5, "ic") }
    else if (ends("ative")) { if (inR1(5) && inR2(5)) sb.setLength(sb.length - 5) }
    else if (ends("ical")) { if (inR1(4)) repl(4, "ic") }
    else if (ends("ness")) { if (inR1(4)) sb.setLength(sb.length - 4) }
    else if (ends("ful")) { if (inR1(3)) sb.setLength(sb.length - 3) }
  }

  private def step4(sb: StringBuilder, p2: Int): Unit = {
    def ends(s: String) = endsWith(sb, s)
    def inR2(n: Int) = sb.length - n >= p2
    // longest-match among; note 'ement' > 'ment' > 'ent' ordering.
    val plain = List("ement", "ance", "ence", "able", "ible", "ment",
      "ant", "ent", "ism", "ate", "iti", "ous", "ive", "ize", "al", "er", "ic")
    if (ends("ement")) { if (inR2(5)) sb.setLength(sb.length - 5); return }
    if (ends("ment")) { if (inR2(4)) sb.setLength(sb.length - 4); return }
    // 'ion' competes in the same among with condition (preceded by s/t)
    val four = List("ance", "ence", "able", "ible")
    for (s <- four) if (ends(s)) { if (inR2(4)) sb.setLength(sb.length - 4); return }
    val three = List("ant", "ent", "ism", "ate", "iti", "ous", "ive", "ize")
    for (s <- three) if (ends(s)) { if (inR2(3)) sb.setLength(sb.length - 3); return }
    if (ends("ion")) {
      if (inR2(3) && sb.length >= 4 && { val c = sb.charAt(sb.length - 4); c == 's' || c == 't' })
        sb.setLength(sb.length - 3)
      return
    }
    val two = List("al", "er", "ic")
    for (s <- two) if (ends(s)) { if (inR2(2)) sb.setLength(sb.length - 2); return }
    val _ = plain // (documentation of the among set)
  }

  private def postlude(sb: StringBuilder, yFound: Boolean): String = {
    if (yFound) {
      var i = 0
      while (i < sb.length) { if (sb.charAt(i) == 'Y') sb.setCharAt(i, 'y'); i += 1 }
    }
    sb.toString
  }
}
