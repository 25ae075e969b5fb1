package graft.text.stem

/** Arabic Snowball stemmer (Assem Chelli / Abdelkrim Aries's algorithm as
  * shipped in Snowball and rust-stemmers v1.2.0 `Algorithm::Arabic`,
  * reference `default_tokenizer.rs:90`).
  *
  * Full sequential port of the published algorithm: Checks1 (definite-
  * article detection setting noun/verb/defined flags), Normalize_pre
  * (tashkeel/tatweel removal, Arabic-Indic digits, presentation-form
  * ligatures), the verb/noun suffix branch (verb tried first: Step1
  * pronouns then Step2a/2c, else Step2b, else Step2a; noun: teh-marbuta,
  * flag-gated pronoun/plural steps, final yeh), alef-maqsura
  * normalization, the prefix steps (hamza pairs, waw/feh conjunction with
  * the not-before-alef guard, article removal, beh/kaf doubles, future-
  * tense seen prefixes, ist- verb forms) and Normalize_post (hamza-carrier
  * folding, word-final carriers to bare hamza). Every among table, length
  * condition, and branch order was validated against the system libstemmer
  * oracle (scripts/stem_parity.sh — 0 probe mismatches); among matching is
  * longest-suffix/prefix with no fallback to shorter entries when the
  * winning entry's condition fails, and partial-branch mutations persist
  * across `or` alternatives, as in the Snowball runtime. Under default
  * normalization Arabic script is transliterated to Latin before stemming,
  * making this a no-op there; it fires for `normalization(false)`.
  */
object ArabicStemmer extends Stemmer {

  // --- Normalize_pre single-char mappings ---------------------------------
  /** Presentation forms U+FE80-U+FEFC to base letters (ligature forms of
    * lam+alef expand to two letters). Index = codepoint - 0xFE80.
    */
  private val presentation: Array[String] = {
    val m = new Array[String](0xFEFD - 0xFE80)
    def put(lo: Int, hi: Int, s: String): Unit = { var c = lo; while (c <= hi) { m(c - 0xFE80) = s; c += 1 } }
    put(0xFE80, 0xFE80, "ء"); put(0xFE81, 0xFE82, "آ"); put(0xFE83, 0xFE84, "أ")
    put(0xFE85, 0xFE86, "ؤ"); put(0xFE87, 0xFE88, "إ"); put(0xFE89, 0xFE8C, "ئ")
    put(0xFE8D, 0xFE8E, "ا"); put(0xFE8F, 0xFE92, "ب"); put(0xFE93, 0xFE94, "ة")
    put(0xFE95, 0xFE98, "ت"); put(0xFE99, 0xFE9C, "ث"); put(0xFE9D, 0xFEA0, "ج")
    put(0xFEA1, 0xFEA4, "ح"); put(0xFEA5, 0xFEA8, "خ"); put(0xFEA9, 0xFEAA, "د")
    put(0xFEAB, 0xFEAC, "ذ"); put(0xFEAD, 0xFEAE, "ر"); put(0xFEAF, 0xFEB0, "ز")
    put(0xFEB1, 0xFEB4, "س"); put(0xFEB5, 0xFEB8, "ش"); put(0xFEB9, 0xFEBC, "ص")
    put(0xFEBD, 0xFEC0, "ض"); put(0xFEC1, 0xFEC4, "ط"); put(0xFEC5, 0xFEC8, "ظ")
    put(0xFEC9, 0xFECC, "ع"); put(0xFECD, 0xFED0, "غ"); put(0xFED1, 0xFED4, "ف")
    put(0xFED5, 0xFED8, "ق"); put(0xFED9, 0xFEDC, "ك"); put(0xFEDD, 0xFEE0, "ل")
    put(0xFEE1, 0xFEE4, "م"); put(0xFEE5, 0xFEE8, "ن"); put(0xFEE9, 0xFEEC, "ه")
    put(0xFEED, 0xFEEE, "و"); put(0xFEEF, 0xFEF0, "ى"); put(0xFEF1, 0xFEF4, "ي")
    put(0xFEF5, 0xFEF6, "لآ"); put(0xFEF7, 0xFEF8, "لأ"); put(0xFEF9, 0xFEFA, "لإ")
    put(0xFEFB, 0xFEFC, "لا")
    m
  }

  def stem(word: String): String = {
    var isNoun = true
    var isVerb = true
    var isDefined = false
    val sb = new StringBuilder(word)

    @inline def len = sb.length
    @inline def endsWith(s: String): Boolean = Snowball.endsWith(sb, s)
    @inline def startsWith(s: String): Boolean =
      sb.length >= s.length && { var i = 0; while (i < s.length && sb.charAt(i) == s.charAt(i)) i += 1; i == s.length }
    @inline def dropSuffix(n: Int): Unit = sb.setLength(sb.length - n)

    // --- Checks1: definite-article prefixes set flags (no mutation) -------
    if (startsWith("بال") || startsWith("كال")) {
      if (len > 4) { isNoun = true; isVerb = false; isDefined = true }
    } else if (startsWith("ال") || startsWith("لل")) {
      if (len > 3) { isNoun = true; isVerb = false; isDefined = true }
    }

    // --- Normalize_pre: per-char rewrite left to right --------------------
    {
      val out = new StringBuilder(sb.length)
      var i = 0
      while (i < sb.length) {
        val c = sb.charAt(i)
        if (c == 'ـ' || (c >= 'ً' && c <= 'ْ')) () // tatweel + tashkeel: drop
        else if (c >= '٠' && c <= '٩') out.append(('0' + (c - '٠')).toChar)
        else if (c >= 0xFE80 && c <= 0xFEFC) out.append(presentation(c - 0xFE80))
        else out.append(c)
        i += 1
      }
      sb.setLength(0); sb.append(out): Unit
    }

    // --- Suffix steps (longest match in table, then condition; no fallback)
    // Suffix_Verb_Step1: object pronouns on verbs
    def suffixVerbStep1(): Boolean = {
      if (endsWith("كما") || endsWith("هما") || endsWith("كمو")) { if (len >= 6) { dropSuffix(3); return true }; return false }
      if (endsWith("ني") || endsWith("نا") || endsWith("ها") || endsWith("هم") ||
          endsWith("هن") || endsWith("كم") || endsWith("كن")) { if (len >= 5) { dropSuffix(2); return true }; return false }
      if (endsWith("ه") || endsWith("ك")) { if (len >= 4) { dropSuffix(1); return true }; return false }
      false
    }
    // Suffix_Verb_Step2a: subject markers
    def suffixVerbStep2a(): Boolean = {
      if (endsWith("تما")) { if (len >= 6) { dropSuffix(3); return true }; return false }
      if (endsWith("ان") || endsWith("ون") || endsWith("ين")) { if (len > 5) { dropSuffix(2); return true }; return false }
      if (endsWith("نا") || endsWith("تا") || endsWith("تن")) { if (len >= 5) { dropSuffix(2); return true }; return false }
      if (endsWith("ت") || endsWith("ا") || endsWith("ي") || endsWith("ن")) { if (len >= 4) { dropSuffix(1); return true }; return false }
      false
    }
    def suffixVerbStep2b(): Boolean = {
      if (endsWith("وا") || endsWith("تم")) { if (len >= 5) { dropSuffix(2); return true }; return false }
      false
    }
    def suffixVerbStep2c(): Boolean = {
      if (endsWith("تمو")) { if (len >= 6) { dropSuffix(3); return true }; return false }
      if (endsWith("و")) { if (len >= 4) { dropSuffix(1); return true }; return false }
      false
    }
    // Suffix_Noun_Step1a: possessive pronouns
    def suffixNounStep1a(): Boolean = {
      if (endsWith("كما") || endsWith("هما")) { if (len >= 6) { dropSuffix(3); return true }; return false }
      if (endsWith("نا") || endsWith("كم") || endsWith("ها") || endsWith("هن") || endsWith("هم")) {
        if (len >= 5) { dropSuffix(2); return true }; return false
      }
      if (endsWith("ي") || endsWith("ك") || endsWith("ه")) { if (len >= 4) { dropSuffix(1); return true }; return false }
      false
    }
    def suffixNounStep1b(): Boolean = {
      if (endsWith("ن")) { if (len > 5) { dropSuffix(1); return true }; return false }
      false
    }
    def suffixNounStep2a(): Boolean = {
      if (endsWith("ا") || endsWith("ي") || endsWith("و")) { if (len > 4) { dropSuffix(1); return true }; return false }
      false
    }
    def suffixNounStep2b(): Boolean = {
      if (endsWith("ات")) { if (len >= 5) { dropSuffix(2); return true }; return false }
      false
    }
    def suffixNounStep2c1(): Boolean = {
      if (endsWith("ت")) { if (len >= 4) { dropSuffix(1); return true }; return false }
      false
    }
    def suffixNounStep2c2(): Boolean = {
      if (endsWith("ة")) { if (len >= 4) { dropSuffix(1); return true }; return false }
      false
    }
    def suffixNounStep3(): Boolean = {
      if (endsWith("ي")) { if (len >= 3) { dropSuffix(1); return true }; return false }
      false
    }
    def suffixAllAlefMaqsura(): Boolean = {
      if (endsWith("ى")) { sb.setCharAt(sb.length - 1, 'ي'); true } else false
    }

    // verb branch first, then noun, then alef maqsura; partial mutations
    // persist when a branch fails part-way (Snowball `or` semantics)
    val verbDone = isVerb && {
      (suffixVerbStep1() && { // atleast 1: strip stacked pronouns
        while (suffixVerbStep1()) ()
        suffixVerbStep2a() || suffixVerbStep2c(); true
      }) ||
      suffixVerbStep2b() ||
      suffixVerbStep2a()
    }
    val nounDone = !verbDone && isNoun && {
      suffixNounStep2c2() ||
        (!isDefined && suffixNounStep1a() && { suffixNounStep2a() || suffixNounStep2b() || suffixNounStep2c1(); true }) ||
        (suffixNounStep1b() && (suffixNounStep2a() || suffixNounStep2b() || suffixNounStep2c1())) ||
        (!isDefined && suffixNounStep2a()) ||
        suffixNounStep2b(): Unit
      suffixNounStep3()
    }
    if (!verbDone && !nounDone) suffixAllAlefMaqsura(): Unit

    // --- Prefix steps -----------------------------------------------------
    // All prefix steps run in ONE `do(...)` with a persistent cursor: after
    // a step's replacement the cursor sits past the replacement and the next
    // step's among matches THERE (e.g. "أآب..." strips أآ then the beh).
    var cur = 0
    @inline def matchAt(s: String): Boolean =
      sb.length - cur >= s.length && { var i = 0; while (i < s.length && sb.charAt(cur + i) == s.charAt(i)) i += 1; i == s.length }

    // try Prefix_Step1: doubled initial hamza forms (cursor past replacement)
    {
      val rep =
        if (matchAt("أأ") || matchAt("أؤ")) "أ"
        else if (matchAt("أآ")) "آ"
        else if (matchAt("أا")) "ا"
        else if (matchAt("أإ")) "إ"
        else null
      if (rep != null && len > 3) { sb.replace(cur, cur + 2, rep); cur += rep.length }
    }
    // try Prefix_Step2: waw/feh conjunction (guard: not before alef); the
    // deleted bracket leaves the cursor at the deletion point
    if (len > 3 && cur + 1 < sb.length && (sb.charAt(cur) == 'و' || sb.charAt(cur) == 'ف') &&
        sb.charAt(cur + 1) != 'ا')
      sb.deleteCharAt(cur): Unit
    // Prefix_Step3a_Noun or (noun) Step3b or (verb) future/ist prefixes
    def prefixStep3aNoun(): Boolean = {
      if (matchAt("بال") || matchAt("كال")) { if (len > 5) { sb.delete(cur, cur + 3); return true }; return false }
      if (matchAt("ال") || matchAt("لل")) { if (len > 4) { sb.delete(cur, cur + 2); return true }; return false }
      false
    }
    def prefixStep3bNoun(): Boolean = {
      if (matchAt("بب")) { if (len > 3) { sb.deleteCharAt(cur); return true }; return false }
      if (matchAt("با")) return true // listed with no action: blocks bare beh removal
      if (matchAt("كك")) { if (len > 3) { sb.deleteCharAt(cur); return true }; return false }
      if (matchAt("ب")) { if (len > 3) { sb.deleteCharAt(cur); return true }; return false }
      false
    }
    def prefixStep3Verb(): Boolean = {
      if (matchAt("سي") || matchAt("ست") || matchAt("سن") || matchAt("سأ")) {
        if (len > 4) { sb.deleteCharAt(cur); return true }; return false
      }
      false
    }
    def prefixStep4Verb(): Boolean = {
      if (matchAt("يست") || matchAt("نست") || matchAt("تست")) {
        if (len > 4) { isVerb = true; isNoun = false; sb.replace(cur, cur + 3, "است"); return true }
        return false
      }
      false
    }
    prefixStep3aNoun() || (isNoun && prefixStep3bNoun()) ||
      (isVerb && (prefixStep3Verb() || prefixStep4Verb())): Unit

    // --- Normalize_post ---------------------------------------------------
    if (sb.nonEmpty) {
      val last = sb.charAt(sb.length - 1)
      if (last == 'آ' || last == 'أ' || last == 'إ' || last == 'ؤ' || last == 'ئ')
        sb.setCharAt(sb.length - 1, 'ء')
    }
    var i = 0
    while (i < sb.length) {
      sb.charAt(i) match {
        case 'آ' | 'أ' | 'إ' => sb.setCharAt(i, 'ا')
        case 'ؤ' => sb.setCharAt(i, 'و')
        case 'ئ' => sb.setCharAt(i, 'ي')
        case _ => ()
      }
      i += 1
    }
    sb.toString
  }
}
