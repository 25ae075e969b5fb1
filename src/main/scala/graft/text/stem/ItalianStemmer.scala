package graft.text.stem

/** Italian Snowball stemmer, implemented from the published algorithm
  * (snowballstem.org/algorithms/italian/stemmer.html; rust-stemmers v1.2.0
  * `Algorithm::Italian`, selected by the reference at
  * `/root/reference/src/default_tokenizer.rs:96`).
  */
object ItalianStemmer extends Stemmer {
  import Snowball._

  @inline private def isV(c: Char): Boolean =
    c == 'a' || c == 'e' || c == 'i' || c == 'o' || c == 'u' ||
    c == 'à' || c == 'è' || c == 'ì' || c == 'ò' || c == 'ù'

  private val step2 = Array(
    "irebbero", "erebbero", "assimo", "eranno", "erebbe", "eremmo",
    "ereste", "eresti", "essero", "iranno", "irebbe", "iremmo", "ireste",
    "iresti", "iscano", "iscono", "issero", "arono", "avamo", "avano",
    "avate", "eremo", "erete", "erono", "evamo", "evano", "evate",
    "iremo", "irete", "irono", "ivamo", "ivano", "ivate", "ammo",
    "ando", "asse", "assi", "emmo", "enda", "ende", "endi", "endo",
    "erai", "erei", "Yamo", "iamo", "immo", "irai", "irei", "isca",
    "isce", "isci", "isco", "ano", "are", "ata", "ate", "ati", "ato",
    "ava", "avi", "avo", "erà", "ere", "erò", "ete", "eva", "evi",
    "evo", "irà", "ire", "irò", "ita", "ite", "iti", "ito", "iva",
    "ivi", "ivo", "ono", "uta", "ute", "uti", "uto", "ar", "ir")

  def stem(word: String): String = {
    if (word.length < 2)
      return word.map { // the acute→grave prelude still applies
        case 'á' => 'à'; case 'é' => 'è'; case 'í' => 'ì'; case 'ó' => 'ò'; case 'ú' => 'ù'
        case c => c
      }
    // prelude: acute → grave accents; i/u between vowels → I/U; qu → qU
    val sb = new StringBuilder(word.length)
    var i = 0
    while (i < word.length) {
      sb.append(word.charAt(i) match {
        case 'á' => 'à'; case 'é' => 'è'; case 'í' => 'ì'
        case 'ó' => 'ò'; case 'ú' => 'ù'; case c => c
      })
      i += 1
    }
    // qu → qU first (same among as the accent rewrites in the published
    // prelude), so a u marked this way no longer counts as a vowel for the
    // i/u-between-vowels marking below
    i = 1
    while (i < sb.length) {
      if (sb.charAt(i) == 'u' && sb.charAt(i - 1) == 'q') sb.setCharAt(i, 'U')
      i += 1
    }
    i = 1
    while (i < sb.length - 1) {
      val c = sb.charAt(i)
      if ((c == 'i' || c == 'u') && isV(sb.charAt(i - 1)) && isV(sb.charAt(i + 1)))
        sb.setCharAt(i, if (c == 'i') 'I' else 'U')
      i += 1
    }

    val rv = SpanishStemmer.romanceRV(sb, isV)
    val p1 = regionAfterVC(sb, 0, isV)
    val p2 = regionAfterVC(sb, p1, isV)
    def inRV(n: Int) = sb.length - n >= rv
    def inR1(n: Int) = sb.length - n >= p1
    def inR2(n: Int) = sb.length - n >= p2
    def ends(s: String) = endsWith(sb, s)
    def chop(n: Int): Unit = sb.setLength(sb.length - n)

    // ---- step 0: attached pronoun ----------------------------------------
    val pronouns = Array("gliela", "gliele", "glieli", "glielo", "gliene",
      "sene", "mela", "mele", "meli", "melo", "mene", "tela", "tele",
      "teli", "telo", "tene", "cela", "cele", "celi", "celo", "cene",
      "vela", "vele", "veli", "velo", "vene", "gli", "ci", "la", "le",
      "li", "lo", "mi", "ne", "si", "ti", "vi")
    var pron: String = null
    i = 0
    while (pron == null && i < pronouns.length) {
      if (ends(pronouns(i))) pron = pronouns(i)
      i += 1
    }
    if (pron != null) {
      val stemEnd = sb.length - pron.length
      val head = sb.substring(0, stemEnd)
      def headEndsInRV(s: String) = head.endsWith(s) && stemEnd - s.length >= rv
      if (headEndsInRV("ando") || headEndsInRV("endo")) chop(pron.length)
      else if (headEndsInRV("ar") || headEndsInRV("er") || headEndsInRV("ir")) {
        chop(pron.length); sb.append("e")
      }
    }

    // ---- step 1: standard suffixes ---------------------------------------
    val lenBefore1 = sb.length
    if (ends("amente")) {
      if (inR1(6)) {
        chop(6)
        if (ends("iv") && inR2(2)) {
          chop(2)
          if (ends("at") && inR2(2)) chop(2)
        } else if ((ends("os") || ends("ic") || ends("abil")) &&
                   inR2(if (ends("abil")) 4 else 2))
          chop(if (ends("abil")) 4 else 2)
      }
    } else if (ends("amento") || ends("amenti") || ends("imento") || ends("imenti")) {
      if (inRV(6)) chop(6)
    } else if (ends("azione") || ends("azioni") || ends("atore") || ends("atori")) {
      val n = if (ends("azione") || ends("azioni")) 6 else 5
      if (inR2(n)) {
        chop(n)
        if (ends("ic") && inR2(2)) chop(2)
      }
    } else if (ends("logia") || ends("logie")) {
      if (inR2(5)) { chop(5); sb.append("log") }
    } else if (ends("uzione") || ends("uzioni") || ends("usione") || ends("usioni")) {
      if (inR2(6)) { chop(6); sb.append("u") }
    } else if (ends("enza") || ends("enze")) {
      if (inR2(4)) { chop(4); sb.append("ente") }
    } else if (ends("mente")) {
      if (inR2(5)) chop(5)
    } else if (ends("ità")) {
      if (inR2(3)) {
        chop(3)
        if (ends("abil") && inR2(4)) chop(4)
        else if ((ends("ic") || ends("iv")) && inR2(2)) chop(2)
      }
    } else if (ends("ivo") || ends("ivi") || ends("iva") || ends("ive")) {
      if (inR2(3)) {
        chop(3)
        if (ends("at") && inR2(2)) {
          chop(2)
          if (ends("ic") && inR2(2)) chop(2)
        }
      }
    } else {
      val g1 = Array("abile", "abili", "ibile", "ibili", "atrice", "atrici",
        "anza", "anze", "iche", "ichi", "ismo", "ismi", "ista", "iste",
        "isti", "istà", "istè", "istì", "ante", "anti", "ico", "ici",
        "ica", "ice", "oso", "osi", "osa", "ose")
      val sorted = g1.sortBy(-_.length)
      var j = 0
      var found = false
      while (!found && j < sorted.length) {
        if (ends(sorted(j))) {
          if (inR2(sorted(j).length)) chop(sorted(j).length)
          found = true
        }
        j += 1
      }
    }
    val removed1 = sb.length != lenBefore1

    // ---- step 2: verb suffixes (only if step 1 removed nothing) ----------
    // `setlimit tomark pV for ([substring] among(...))`: the longest
    // candidate FITTING inside RV wins (cavano: avano misses RV, ano fits)
    if (!removed1) {
      var bestLen = 0
      var j = 0
      while (j < step2.length) {
        val c2 = step2(j)
        if (c2.length > bestLen && ends(c2) && inRV(c2.length)) bestLen = c2.length
        j += 1
      }
      if (bestLen > 0) chop(bestLen)
    }

    // ---- step 3a: final vowel (+ preceding i), in RV ---------------------
    val finals = "aeioàèìò"
    if (sb.nonEmpty && finals.indexOf(sb.charAt(sb.length - 1)) >= 0 && inRV(1)) {
      chop(1)
      if (sb.nonEmpty && sb.charAt(sb.length - 1) == 'i' && inRV(1)) chop(1)
    }
    // ---- step 3b: ch → c, gh → g in RV -----------------------------------
    if ((ends("ch") || ends("gh")) && inRV(2)) chop(1)

    // postlude: unmark
    i = 0
    while (i < sb.length) {
      val c = sb.charAt(i)
      if (c == 'I') sb.setCharAt(i, 'i')
      else if (c == 'U') sb.setCharAt(i, 'u')
      else if (c == 'Y') sb.setCharAt(i, 'y')
      i += 1
    }
    sb.toString
  }
}
