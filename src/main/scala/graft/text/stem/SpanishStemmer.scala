package graft.text.stem

/** Spanish Snowball stemmer, implemented from the published algorithm
  * (snowballstem.org/algorithms/spanish/stemmer.html; rust-stemmers v1.2.0
  * `Algorithm::Spanish`, selected by the reference at
  * `/root/reference/src/default_tokenizer.rs:101`).
  */
object SpanishStemmer extends Stemmer {
  import Snowball._

  /** Step-2b verb suffixes, longest first; the boolean marks the
    * en/es/éis/emos group whose removal also strips a preceding gu's u.
    */
  private val step2b: Array[(String, Boolean)] = {
    val plain = Array(
      "aríamos", "eríamos", "iríamos", "iéramos", "iésemos", "aríais",
      "aremos", "eríais", "eremos", "iríais", "iremos", "ierais",
      "ieseis", "asteis", "isteis", "ábamos", "áramos", "ásemos",
      "arían", "arías", "aréis", "erían", "erías", "eréis", "irían",
      "irías", "iréis", "ieran", "iesen", "ieron", "iendo", "ieras",
      "ieses", "abais", "arais", "aseis", "íamos", "arán", "arás",
      "aría", "erán", "erás", "ería", "irán", "irás", "iría", "iera",
      "iese", "aste", "iste", "aban", "aran", "asen", "aron", "ando",
      "abas", "adas", "idas", "aras", "ases", "íais", "ados", "idos",
      "amos", "imos", "ará", "aré", "erá", "eré", "irá", "iré", "aba",
      "ada", "ida", "ara", "ase", "ían", "ado", "ido", "ías", "áis",
      "ía", "ad", "ed", "id", "an", "ió", "ar", "er", "ir", "as", "ís")
    val gu = Array("emos", "éis", "en", "es")
    (plain.map((_, false)) ++ gu.map((_, true))).sortBy(-_._1.length)
  }

  @inline private def isV(c: Char): Boolean =
    c == 'a' || c == 'e' || c == 'i' || c == 'o' || c == 'u' ||
    c == 'á' || c == 'é' || c == 'í' || c == 'ó' || c == 'ú' || c == 'ü'

  /** Romance RV: second letter consonant → after next vowel; first two
    * vowels → after next consonant; else after the third letter.
    */
  private[stem] def romanceRV(w: CharSequence, isVowel: Char => Boolean): Int = {
    val n = w.length
    if (n < 3) return n
    if (!isVowel(w.charAt(1))) {
      var i = 2
      while (i < n && !isVowel(w.charAt(i))) i += 1
      math.min(n, i + 1)
    } else if (isVowel(w.charAt(0)) && isVowel(w.charAt(1))) {
      var i = 2
      while (i < n && isVowel(w.charAt(i))) i += 1
      math.min(n, i + 1)
    } else 3
  }

  private def deaccent(c: Char): Char = c match {
    case 'á' => 'a'; case 'é' => 'e'; case 'í' => 'i'
    case 'ó' => 'o'; case 'ú' => 'u'; case other => other
  }

  def stem(word: String): String = {
    if (word.length < 2)
      return word.map { // the unconditional deaccenting postlude still applies
        case 'á' => 'a'; case 'é' => 'e'; case 'í' => 'i'; case 'ó' => 'o'; case 'ú' => 'u'
        case c => c
      }
    val sb = new StringBuilder(word)
    val rv = romanceRV(sb, isV)
    val p1 = regionAfterVC(sb, 0, isV)
    val p2 = regionAfterVC(sb, p1, isV)
    def inRV(n: Int) = sb.length - n >= rv
    def inR1(n: Int) = sb.length - n >= p1
    def inR2(n: Int) = sb.length - n >= p2
    def ends(s: String) = endsWith(sb, s)
    def chop(n: Int): Unit = sb.setLength(sb.length - n)

    // ---- Step 0: attached pronoun ----------------------------------------
    val pronouns = Array("selas", "selos", "sela", "selo", "las", "les",
      "los", "nos", "me", "se", "la", "le", "lo")
    var pi = 0
    var pron: String = null
    while (pron == null && pi < pronouns.length) {
      if (ends(pronouns(pi))) pron = pronouns(pi)
      pi += 1
    }
    if (pron != null) {
      val stemEnd = sb.length - pron.length
      val head = sb.substring(0, stemEnd)
      def headEndsInRV(s: String): Boolean =
        head.endsWith(s) && stemEnd - s.length >= rv
      if (headEndsInRV("iéndo") || headEndsInRV("ándo") ||
          headEndsInRV("ár") || headEndsInRV("ér") || headEndsInRV("ír")) {
        chop(pron.length)
        // remove the acute accent from the preceding suffix
        var i = 0
        while (i < sb.length) { sb.setCharAt(i, deaccent(sb.charAt(i))); i += 1 }
      } else if (headEndsInRV("ando") || headEndsInRV("iendo") ||
                 headEndsInRV("ar") || headEndsInRV("er") || headEndsInRV("ir")) {
        chop(pron.length)
      } else if (head.endsWith("yendo") && stemEnd - 5 >= rv &&
                 stemEnd >= 6 && head.charAt(stemEnd - 6) == 'u') {
        chop(pron.length)
      }
    }

    // ---- Step 1: standard suffix removal ---------------------------------
    val lenBefore1 = sb.length
    val g1 = Array("amientos", "imientos", "amiento", "imiento", "anzas",
      "ismos", "ables", "ibles", "istas", "anza", "icos", "icas", "ismo",
      "able", "ible", "ista", "osos", "osas", "ico", "ica", "oso", "osa")
    val g2 = Array("adoras", "adores", "aciones", "adora", "ación", "antes",
      "ancias", "ador", "ante", "ancia")
    var done1 = false
    def tryGroup(suffixes: Array[String], cond: Int => Boolean, act: String => Unit): Boolean = {
      var i = 0
      while (i < suffixes.length) {
        if (ends(suffixes(i))) {
          if (cond(suffixes(i).length)) act(suffixes(i))
          return true // longest match found — no other suffix is tried
        }
        i += 1
      }
      false
    }
    // longest-match across ALL step-1 suffixes: check longer special forms first
    if (ends("amente")) {
      done1 = true
      if (inR1(6)) {
        chop(6)
        if (ends("iv") && inR2(2)) {
          chop(2)
          if (ends("at") && inR2(2)) chop(2)
        } else if ((ends("os") || ends("ic") || ends("ad")) && inR2(2)) chop(2)
      }
    } else if (ends("logías") || ends("logía")) {
      done1 = true
      val n = if (ends("logías")) 6 else 5
      if (inR2(n)) { chop(n); sb.append("log") }
    } else if (ends("uciones") || ends("ución")) {
      done1 = true
      val n = if (ends("uciones")) 7 else 5
      if (inR2(n)) { chop(n); sb.append("u") }
    } else if (ends("encias") || ends("encia")) {
      done1 = true
      val n = if (ends("encias")) 6 else 5
      if (inR2(n)) { chop(n); sb.append("ente") }
    } else if (ends("idades") || ends("idad")) {
      done1 = true
      val n = if (ends("idades")) 6 else 4
      if (inR2(n)) {
        chop(n)
        if ((ends("abil") && inR2(4))) chop(4)
        else if ((ends("ic") || ends("iv")) && inR2(2)) chop(2)
      }
    } else if (ends("mente")) {
      done1 = true
      if (inR2(5)) {
        chop(5)
        if ((ends("ante") || ends("able") || ends("ible")) && inR2(4)) chop(4)
      }
    } else if (tryGroup(g2, inR2, s => {
        chop(s.length)
        if (ends("ic") && inR2(2)) chop(2)
      })) {
      done1 = true
    } else if (tryGroup(g1, inR2, s => chop(s.length))) {
      done1 = true
    } else if (ends("ivas") || ends("ivos") || ends("iva") || ends("ivo")) {
      done1 = true
      val n = if (ends("ivas") || ends("ivos")) 4 else 3
      if (inR2(n)) {
        chop(n)
        if (ends("at") && inR2(2)) chop(2)
      }
    }
    val removed1 = sb.length != lenBefore1

    // ---- Step 2a: verb suffixes beginning y (only if step 1 removed nothing)
    // `setlimit tomark pV for ([substring] among(...))`: only candidates
    // fully inside RV compete for longest-match; the preceding-'u' test and
    // the gu-u-drop actions are NOT RV-limited (oracle-verified)
    var removed2a = false
    if (!removed1) {
      val ySuf = Array("yeron", "yendo", "yamos", "yais", "yan", "yen",
        "yas", "yes", "ya", "ye", "yo", "yó")
      var best: String = null
      var i = 0
      while (i < ySuf.length) {
        val s = ySuf(i)
        if ((best == null || s.length > best.length) && ends(s) && inRV(s.length)) best = s
        i += 1
      }
      if (best != null && sb.length > best.length &&
          sb.charAt(sb.length - best.length - 1) == 'u') { // u-test is NOT RV-limited (oracle: fxuya → fxu)
        chop(best.length)
        removed2a = true
      }
    }

    // ---- Step 2b: other verb suffixes (longest match among candidates
    // fitting inside RV; the en/es/éis/emos group additionally strips a
    // preceding gu's u when the u is inside RV) ----------------------------
    if (!removed1 && !removed2a) {
      var best: String = null
      var bestGu = false
      var i = 0
      while (i < SpanishStemmer.step2b.length) {
        val (s, gu) = SpanishStemmer.step2b(i)
        if ((best == null || s.length > best.length) && ends(s) && inRV(s.length)) {
          best = s; bestGu = gu
        }
        i += 1
      }
      if (best != null) {
        chop(best.length)
        if (bestGu && ends("gu")) chop(1) // u-drop not RV-limited (oracle: oguemos → og)
      }
    }

    // ---- Step 3: residual suffix ------------------------------------------
    if (ends("os")) { if (inRV(2)) chop(2) }
    else if (ends("a") || ends("o") || ends("á") || ends("í") || ends("ó")) {
      if (inRV(1)) chop(1)
    } else if (ends("e") || ends("é")) {
      if (inRV(1)) {
        chop(1)
        if (ends("gu") && inRV(1)) chop(1) // the u must be in RV
      }
    }

    // ---- postlude: remove accents -----------------------------------------
    var i = 0
    while (i < sb.length) {
      val c = sb.charAt(i)
      if (c == 'á' || c == 'é' || c == 'í' || c == 'ó' || c == 'ú')
        sb.setCharAt(i, deaccent(c))
      i += 1
    }
    sb.toString
  }
}
