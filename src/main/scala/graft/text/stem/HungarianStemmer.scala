package graft.text.stem

/** Hungarian Snowball stemmer, implemented from the published algorithm
  * (snowballstem.org/algorithms/hungarian/stemmer.html; rust-stemmers
  * v1.2.0 `Algorithm::Hungarian`, reference `default_tokenizer.rs:95`).
  *
  * FIDELITY NOTE: the R1 definition (digraph-aware), instrumental/case/
  * factive/plural steps follow the published definition; the possessive
  * tables are a best-effort reconstruction covering the standard forms.
  * Under default normalization the long vowels á/é/ö/ő/ü/ű reach the
  * stemmer as ASCII, so accent branches fire only with
  * `normalization(false)`.
  */
object HungarianStemmer extends Stemmer {
  import Snowball._

  @inline private def isV(c: Char): Boolean =
    c == 'a' || c == 'á' || c == 'e' || c == 'é' || c == 'i' || c == 'í' ||
    c == 'o' || c == 'ó' || c == 'ö' || c == 'ő' || c == 'u' || c == 'ú' ||
    c == 'ü' || c == 'ű'

  private val digraphs = Array("dzs", "cs", "dz", "gy", "ly", "ny", "sz", "ty", "zs")

  /** R1: word starts with a vowel → after the first consonant/digraph;
    * starts with a consonant → after the first vowel.
    */
  private def r1Of(sb: StringBuilder): Int = {
    if (sb.isEmpty) return 0
    if (isV(sb.charAt(0))) {
      var i = 1
      while (i < sb.length) {
        if (!isV(sb.charAt(i))) {
          // skip the whole digraph
          var d = 0
          while (d < digraphs.length) {
            val g = digraphs(d)
            if (i + g.length <= sb.length && sb.substring(i, i + g.length) == g)
              return math.min(sb.length, i + g.length)
            d += 1
          }
          return i + 1
        }
        i += 1
      }
      sb.length
    } else {
      var i = 1
      while (i < sb.length) {
        if (isV(sb.charAt(i))) return i + 1
        i += 1
      }
      sb.length
    }
  }

  private def isDouble(sb: StringBuilder, endOff: Int): Boolean = {
    // does the word (minus endOff suffix chars) end in a doubled consonant
    // (incl. doubled digraphs like ssz/nny)?
    val end = sb.length - endOff
    if (end >= 2 && !isV(sb.charAt(end - 1)) && sb.charAt(end - 1) == sb.charAt(end - 2))
      return true
    var d = 0
    while (d < digraphs.length) {
      val g = digraphs(d)
      // doubled digraph is written as first letter doubled: ssz, nny, tty…
      if (end >= g.length + 1) {
        val tail = sb.substring(end - g.length - 1, end)
        if (tail == g.charAt(0).toString + g) return true
      }
      d += 1
    }
    false
  }

  private def undouble(sb: StringBuilder): Unit = {
    val end = sb.length
    var d = 0
    while (d < digraphs.length) {
      val g = digraphs(d)
      if (end >= g.length + 1 &&
          sb.substring(end - g.length - 1, end) == g.charAt(0).toString + g) {
        sb.delete(end - g.length - 1, end - g.length)
        return
      }
      d += 1
    }
    if (end >= 2 && sb.charAt(end - 1) == sb.charAt(end - 2)) sb.setLength(end - 1)
  }

  private def vEnd(sb: StringBuilder): Unit =
    if (sb.nonEmpty) {
      val c = sb.charAt(sb.length - 1)
      if (c == 'á') sb.setCharAt(sb.length - 1, 'a')
      else if (c == 'é') sb.setCharAt(sb.length - 1, 'e')
    }

  private val caseEndings = Array(
    "képpen", "onként", "enként", "anként", "képp", "ként", "ban", "ben",
    "nak", "nek", "val", "vel", "tól", "től", "ról", "ről", "ból", "ből",
    "hoz", "hez", "höz", "nál", "nél", "ért", "kor", "ba", "be", "ra",
    "re", "ig", "at", "et", "ot", "öt", "ul", "ül", "vá", "vé", "en",
    "on", "an", "ön", "n", "t").sortBy(-_.length)

  private val possessives = Array(
    "ányuk", "ényük", "jaink", "jeink", "jaitok", "jeitek", "jaim",
    "jeim", "jaid", "jeid", "jaik", "jeik", "nyuk", "nyük", "aink",
    "eink", "aitok", "eitek", "áink", "éink", "jai", "jei", "aim",
    "eim", "aid", "eid", "aik", "eik", "ánk", "énk", "unk", "ünk",
    "juk", "jük", "itek", "ink", "aja", "eje", "ja", "je", "nk", "uk",
    "ük", "em", "om", "am", "od", "ed", "ad", "öd", "ai", "ei", "im",
    "id", "ik", "a", "e", "o", "á", "é", "d", "m", "i").sortBy(-_.length)

  def stem(word: String): String = {
    if (word.length < 3) return word
    val sb = new StringBuilder(word)
    val p1 = r1Of(sb)
    def inR1(n: Int) = sb.length - n >= p1
    def ends(s: String) = endsWith(sb, s)
    def chop(n: Int): Unit = sb.setLength(sb.length - n)

    // step 1: instrumental val/vel after doubled consonant
    if ((ends("val") || ends("vel")) && inR1(3) && isDouble(sb, 3)) {
      chop(3); undouble(sb)
    }

    // step 2: case endings
    var i = 0
    var found = false
    while (!found && i < caseEndings.length) {
      val s = caseEndings(i)
      if (ends(s)) {
        found = true
        if (inR1(s.length)) { chop(s.length); vEnd(sb) }
      }
      i += 1
    }

    // step 3: special cases én → e, án/ánként → a
    if (ends("ánként")) { if (inR1(6)) { chop(6); sb.append("a") } }
    else if (ends("án")) { if (inR1(2)) { chop(2); sb.append("a") } }
    else if (ends("én")) { if (inR1(2)) { chop(2); sb.append("e") } }

    // step 4: other suffixes astul/estül/stul/stül, ástul → a, éstül → e
    if (ends("astul") || ends("estül")) { if (inR1(5)) chop(5) }
    else if (ends("ástul")) { if (inR1(5)) { chop(5); sb.append("a") } }
    else if (ends("éstül")) { if (inR1(5)) { chop(5); sb.append("e") } }
    else if (ends("stul") || ends("stül")) { if (inR1(4)) chop(4) }

    // step 5: factive vá/vé after doubled consonant
    if ((ends("vá") || ends("vé")) && inR1(2) && isDouble(sb, 2)) {
      chop(2); undouble(sb)
    }

    // step 6: owned plurals oké/öké/aké/eké/áké/éké/ké/éi/é
    if (ends("áké") || ends("éké") || ends("oké") || ends("öké") ||
        ends("aké") || ends("eké")) { if (inR1(3)) { chop(3); vEnd(sb) } }
    else if (ends("ké") || ends("éi")) { if (inR1(2)) { chop(2); vEnd(sb) } }
    else if (ends("é")) { if (inR1(1)) { chop(1); vEnd(sb) } }

    // step 7: possessives
    i = 0
    found = false
    while (!found && i < possessives.length) {
      val s = possessives(i)
      if (ends(s)) {
        found = true
        if (inR1(s.length)) { chop(s.length); vEnd(sb) }
      }
      i += 1
    }

    // step 9: plural ák/ék/ök/ok/ek/ak/k
    if (ends("ák") || ends("ék")) { if (inR1(2)) { chop(2); vEnd(sb) } }
    else if (ends("ök") || ends("ok") || ends("ek") || ends("ak")) {
      if (inR1(2)) chop(2)
    } else if (ends("k")) { if (inR1(1)) chop(1) }

    sb.toString
  }
}
