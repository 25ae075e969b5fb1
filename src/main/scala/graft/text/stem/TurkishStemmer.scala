package graft.text.stem

/** Turkish Snowball stemmer (snowballstem.org/algorithms/turkish/stemmer.html,
  * Çilden's algorithm; rust-stemmers v1.2.0 `Algorithm::Turkish`, reference
  * `default_tokenizer.rs:103`). Implemented as a backward-cursor machine
  * mirroring the published routine structure: per-suffix vowel-harmony
  * checks, optional y/n/s buffer consonants and U buffer vowels with strict
  * neighbour tests, the nominal-verb and noun suffix chains (incl. the
  * ki-chains), then the append-U and last-consonant post-steps. Validated
  * word-for-word against the system libstemmer on generated probe
  * vocabularies (scripts/stem_parity.sh, StemGoldenSpec).
  *
  * Under default tokenizer normalization Turkish ı/ğ/ü/ş/ö/ç reach the
  * stemmer transliterated to ASCII, so the harmony checks operate on the
  * transliterated vowels there — same as the reference pipeline.
  */
object TurkishStemmer extends Stemmer {

  @inline private def isVowel(c: Char): Boolean =
    c == 'a' || c == 'e' || c == 'ı' || c == 'i' ||
    c == 'o' || c == 'ö' || c == 'u' || c == 'ü'

  @inline private def isU(c: Char): Boolean =
    c == 'ı' || c == 'i' || c == 'u' || c == 'ü'

  /** Vowel-harmony classes: which vowel may precede the last vowel. */
  @inline private def harmonyOk(prev: Char, last: Char): Boolean = last match {
    case 'a' => prev == 'a' || prev == 'ı' || prev == 'o' || prev == 'u'
    case 'e' => prev == 'e' || prev == 'i' || prev == 'ö' || prev == 'ü'
    case 'ı' => prev == 'a' || prev == 'ı'
    case 'i' => prev == 'e' || prev == 'i'
    case 'o' => prev == 'o' || prev == 'u'
    case 'ö' => prev == 'ö' || prev == 'ü'
    case 'u' => prev == 'o' || prev == 'u'
    case 'ü' => prev == 'ö' || prev == 'ü'
    case _   => false
  }

  /** Cursor machine over one word. Mark routines are pure on the cursor:
    * they take the live end and return the suffix start, or -1.
    */
  private final class S(var w: StringBuilder) {

    /** check_vowel_harmony on [0, end): `goto` semantics — the last vowel
      * must be preceded SOMEWHERE by a vowel of its harmony class (other
      * vowels in between are skipped, exactly like `goto vowel1`).
      */
    def harmony(end: Int): Boolean = {
      var i = end - 1
      while (i >= 0 && !isVowel(w.charAt(i))) i -= 1
      if (i < 0) return false
      val last = w.charAt(i)
      i -= 1
      while (i >= 0 && !harmonyOk(w.charAt(i), last)) i -= 1
      i >= 0
    }

    def lit(c: Int, s: String): Int = {
      val n = s.length
      if (c < n) return -1
      var k = 0
      while (k < n) {
        if (w.charAt(c - n + k) != s.charAt(k)) return -1
        k += 1
      }
      c - n
    }

    def one(c: Int, set: String): Int =
      if (c >= 1 && set.indexOf(w.charAt(c - 1)) >= 0) c - 1 else -1

    /** Optional buffer consonant `bc` (y/n): when present it is consumed
      * and must sit on a vowel; when absent, the preceding char must be a
      * consonant that itself sits on a vowel (oracle-verified: "onarttı" /
      * "onatrla" unchanged, "onattı" / "onamla" stripped).
      */
    def optCons(c: Int, bc: Char): Int = {
      if (c < 2) return -1
      if (w.charAt(c - 1) == bc && isVowel(w.charAt(c - 2))) c - 1
      else if (isVowel(w.charAt(c - 2))) c // any guard char on a vowel
      else -1
    }

    /** Optional U buffer vowel: `(U test non-v) or (test v)` — when the U is
      * present it must sit on a consonant; when absent, the stem must end
      * in a vowel.
      */
    /** `(U test non-v) or (test non-v)`: consume a U that sits on a
      * consonant, or leave a non-U char that sits on a consonant.
      */
    def optU(c: Int): Int = {
      if (c < 2) return -1
      val g = w.charAt(c - 1)
      val hCons = !isVowel(w.charAt(c - 2))
      if (isU(g) && hCons) c - 1
      else if (!isU(g) && hCons) c
      else -1
    }

    /** Required buffer consonant (the n of nA/nU/ndA/ndAn/ncA): consumed,
      * and the char before it must be a vowel.
      */
    def bufCons(c: Int, bc: Char): Int =
      if (c >= 2 && w.charAt(c - 1) == bc && isVowel(w.charAt(c - 2))) c - 1
      else -1

    def truncate(c: Int): Unit = w.setLength(c)

    // ---- mark_* routines (suffix structure read backward) ---------------

    def mark_ymUs(c: Int): Int = { // -(y)mUş
      if (!harmony(c)) return -1
      var p = one(c, "ş"); if (p < 0) return -1
      p = one(p, "ıiuü"); if (p < 0) return -1
      p = lit(p, "m"); if (p < 0) return -1
      optCons(p, 'y')
    }
    def mark_yDU(c: Int): Int = { // -(y)DU
      if (!harmony(c)) return -1
      var p = one(c, "ıiuü"); if (p < 0) return -1
      p = one(p, "dt"); if (p < 0) return -1
      optCons(p, 'y')
    }
    def mark_ysA(c: Int): Int = { // -(y)sA
      var p = one(c, "ae"); if (p < 0) return -1
      p = lit(p, "s"); if (p < 0) return -1
      optCons(p, 'y')
    }
    def mark_yken(c: Int): Int = { // -(y)ken
      var p = lit(c, "ken"); if (p < 0) return -1
      optCons(p, 'y')
    }
    def mark_cAsInA(c: Int): Int = { // -cAsInA (harmonized literal forms)
      if (!harmony(c)) return -1
      val p = lit(c, "casına")
      if (p >= 0) p else lit(c, "cesine")
    }
    def mark_sUnUz(c: Int): Int = { // -sUnUz (harmonized literal forms)
      if (!harmony(c)) return -1
      var p = lit(c, "sınız")
      if (p < 0) p = lit(c, "siniz")
      if (p < 0) p = lit(c, "sunuz")
      if (p < 0) p = lit(c, "sünüz")
      p
    }
    def mark_lAr(c: Int): Int = { // -lAr
      if (!harmony(c)) return -1
      var p = lit(c, "r"); if (p < 0) return -1
      p = one(p, "ae"); if (p < 0) return -1
      lit(p, "l")
    }
    def mark_yUm(c: Int): Int = { // -(y)Um
      if (!harmony(c)) return -1
      var p = lit(c, "m"); if (p < 0) return -1
      p = one(p, "ıiuü"); if (p < 0) return -1
      optCons(p, 'y')
    }
    def mark_sUn(c: Int): Int = { // -sUn
      if (!harmony(c)) return -1
      var p = lit(c, "n"); if (p < 0) return -1
      p = one(p, "ıiuü"); if (p < 0) return -1
      lit(p, "s")
    }
    def mark_yUz(c: Int): Int = { // -(y)Uz
      if (!harmony(c)) return -1
      var p = lit(c, "z"); if (p < 0) return -1
      p = one(p, "ıiuü"); if (p < 0) return -1
      optCons(p, 'y')
    }
    def mark_DUr(c: Int): Int = { // -DUr
      if (!harmony(c)) return -1
      var p = lit(c, "r"); if (p < 0) return -1
      p = one(p, "ıiuü"); if (p < 0) return -1
      one(p, "dt")
    }
    def mark_nUz(c: Int): Int = { // -nUz
      if (!harmony(c)) return -1
      var p = lit(c, "z"); if (p < 0) return -1
      p = one(p, "ıiuü"); if (p < 0) return -1
      lit(p, "n")
    }

    // noun suffixes
    def mark_possessives(c: Int): Int = { // -(U)m / -(U)n / -(U)mUz / -(U)nUz
      // NO vowel-harmony check (oracle-verified: "geltum" → "gelt")
      var p = lit(c, "z")
      if (p >= 0) {
        val q0 = one(p, "ıiuü")
        if (q0 >= 0) {
          val q1 = one(q0, "mn")
          if (q1 >= 0) {
            val r = optU(q1)
            if (r >= 0) return r
          }
        }
      }
      p = one(c, "mn")
      if (p < 0) return -1
      optU(p)
    }
    def mark_sU(c: Int): Int = { // -(s)U: optional buffer s (oracle: suyunu
      // → suy — the no-s branch succeeds without touching a preceding y)
      if (!harmony(c)) return -1
      val p = one(c, "ıiuü"); if (p < 0) return -1
      optCons(p, 's')
    }
    def mark_lArI(c: Int): Int = { // -lArI (harmonized literal forms)
      if (!harmony(c)) return -1
      val p = lit(c, "ları")
      if (p >= 0) p else lit(c, "leri")
    }
    def mark_yU(c: Int): Int = { // -(y)U (bare U rides the no-y guard)
      if (!harmony(c)) return -1
      val p = one(c, "ıiuü"); if (p < 0) return -1
      optCons(p, 'y')
    }
    def mark_person(c: Int): Int = // bare person m/n/k before -(y)DU / -(y)sA
      one(c, "mnk")
    def mark_nU(c: Int): Int = { // -nU (buffer n on a vowel)
      if (!harmony(c)) return -1
      val p = one(c, "ıiuü"); if (p < 0) return -1
      bufCons(p, 'n')
    }
    def mark_nUn(c: Int): Int = { // -(n)Un
      if (!harmony(c)) return -1
      var p = lit(c, "n"); if (p < 0) return -1
      p = one(p, "ıiuü"); if (p < 0) return -1
      optCons(p, 'n')
    }
    def mark_yA(c: Int): Int = { // -(y)A
      if (!harmony(c)) return -1
      val p = one(c, "ae"); if (p < 0) return -1
      optCons(p, 'y')
    }
    def mark_nA(c: Int): Int = { // -nA (buffer n on a vowel)
      if (!harmony(c)) return -1
      val p = one(c, "ae"); if (p < 0) return -1
      bufCons(p, 'n')
    }
    def mark_DA(c: Int): Int = { // -DA
      if (!harmony(c)) return -1
      val p = one(c, "ae"); if (p < 0) return -1
      one(p, "dt")
    }
    def mark_ndA(c: Int): Int = { // -ndA (buffer n on a vowel)
      if (!harmony(c)) return -1
      var p = one(c, "ae"); if (p < 0) return -1
      p = lit(p, "d"); if (p < 0) return -1
      bufCons(p, 'n')
    }
    def mark_DAn(c: Int): Int = { // -DAn
      if (!harmony(c)) return -1
      var p = lit(c, "n"); if (p < 0) return -1
      p = one(p, "ae"); if (p < 0) return -1
      one(p, "dt")
    }
    def mark_ndAn(c: Int): Int = { // -ndAn (buffer n on a vowel)
      if (!harmony(c)) return -1
      var p = lit(c, "n"); if (p < 0) return -1
      p = one(p, "ae"); if (p < 0) return -1
      p = lit(p, "d"); if (p < 0) return -1
      bufCons(p, 'n')
    }
    def mark_ylA(c: Int): Int = { // -(y)lA
      if (!harmony(c)) return -1
      var p = one(c, "ae"); if (p < 0) return -1
      p = lit(p, "l"); if (p < 0) return -1
      optCons(p, 'y')
    }
    def mark_ki(c: Int): Int = lit(c, "ki")
    def mark_ncA(c: Int): Int = { // -(n)cA — 'c' only (ç-forms never fire:
      // oracle "onatça" unchanged, "onatca" stripped)
      if (!harmony(c)) return -1
      var p = one(c, "ae"); if (p < 0) return -1
      p = lit(p, "c"); if (p < 0) return -1
      optCons(p, 'n')
    }
  }

  /** at least two vowels (`more_than_one_syllable`) */
  private def moreThanOneSyllable(w: String): Boolean = {
    var n = 0
    var i = 0
    while (i < w.length && n < 2) { if (isVowel(w.charAt(i))) n += 1; i += 1 }
    n >= 2
  }

  // --------------------------------------------------------------------

  def stem(word: String): String = {
    if (!moreThanOneSyllable(word)) return word
    val s = new S(new StringBuilder(word))
    val continueNoun = stemNominalVerb(s)
    if (continueNoun) {
      stemNoun(s)
      postlude(s) // skipped on the lAr path (oracle: "dcubrozclar" keeps c)
    }
    s.w.toString
  }

  /** stem_nominal_verb_suffixes; returns continue_stemming_noun_suffixes. */
  private def stemNominalVerb(s: S): Boolean = {
    val end = s.w.length
    var continueNoun = true

    // alternatives in published order; first match wins
    var cur = -1

    // A: ymUş | yDU | ysA | yken
    cur = s.mark_ymUs(end)
    if (cur < 0) cur = s.mark_yDU(end)
    if (cur < 0) cur = s.mark_ysA(end)
    if (cur < 0) cur = s.mark_yken(end)
    if (cur >= 0) { s.truncate(cur); return continueNoun }

    // A2: bare person (m/n/k) preceded by yDU or ysA ("geldin", "gelsek")
    cur = s.mark_person(end)
    if (cur >= 0) {
      var p = s.mark_yDU(cur)
      if (p < 0) p = s.mark_ysA(cur)
      if (p >= 0) { s.truncate(p); return continueNoun }
    }

    // B: cAsInA preceded by optional person suffix, preceded by ymUş
    cur = s.mark_cAsInA(end)
    if (cur >= 0) {
      var p = s.mark_sUnUz(cur)
      if (p < 0) p = s.mark_lAr(cur)
      if (p < 0) p = s.mark_yUm(cur)
      if (p < 0) p = s.mark_sUn(cur)
      if (p < 0) p = s.mark_yUz(cur)
      if (p < 0) p = cur
      val q = s.mark_ymUs(p)
      if (q >= 0) { s.truncate(q); return continueNoun }
    }

    // C: lAr (+ optional DUr/yDU/ysA/ymUş), stops noun stemming
    cur = s.mark_lAr(end)
    if (cur >= 0) {
      s.truncate(cur)
      continueNoun = false
      val e2 = s.w.length
      var p = s.mark_DUr(e2)
      if (p < 0) p = s.mark_yDU(e2)
      if (p < 0) p = s.mark_ysA(e2)
      if (p < 0) p = s.mark_ymUs(e2)
      if (p >= 0) s.truncate(p)
      return continueNoun
    }

    // D: nUz preceded by yDU/ysA
    cur = s.mark_nUz(end)
    if (cur >= 0) {
      var p = s.mark_yDU(cur)
      if (p < 0) p = s.mark_ysA(cur)
      if (p >= 0) { s.truncate(p); return continueNoun }
    }

    // E: (sUnUz|yUz|sUn|yUm) + optional preceding ymUş
    cur = s.mark_sUnUz(end)
    if (cur < 0) cur = s.mark_yUz(end)
    if (cur < 0) cur = s.mark_sUn(end)
    if (cur < 0) cur = s.mark_yUm(end)
    if (cur >= 0) {
      s.truncate(cur)
      val p = s.mark_ymUs(s.w.length)
      if (p >= 0) s.truncate(p)
      return continueNoun
    }

    // F: DUr + optional (person) + ymUş
    cur = s.mark_DUr(end)
    if (cur >= 0) {
      s.truncate(cur)
      val e2 = s.w.length
      var p = s.mark_sUnUz(e2)
      if (p < 0) p = s.mark_lAr(e2)
      if (p < 0) p = s.mark_yUm(e2)
      if (p < 0) p = s.mark_sUn(e2)
      if (p < 0) p = s.mark_yUz(e2)
      if (p < 0) p = e2
      val q = s.mark_ymUs(p)
      if (q >= 0) s.truncate(q)
    }
    continueNoun
  }

  /** stem_suffix_chain_before_ki (recursive). */
  private def chainBeforeKi(s: S): Boolean = {
    val end = s.w.length
    val ki = s.mark_ki(end)
    if (ki < 0) return false

    // ki preceded by DA
    var p = s.mark_DA(ki)
    if (p >= 0) {
      s.truncate(p)
      val e2 = s.w.length
      val lar = s.mark_lAr(e2)
      if (lar >= 0) {
        s.truncate(lar)
        chainBeforeKi(s)
        return true
      }
      val poss = s.mark_possessives(e2)
      if (poss >= 0) {
        s.truncate(poss)
        val lar2 = s.mark_lAr(s.w.length)
        if (lar2 >= 0) { s.truncate(lar2); chainBeforeKi(s) }
      }
      return true
    }

    // ki preceded by nUn
    p = s.mark_nUn(ki)
    if (p >= 0) {
      s.truncate(p)
      val e2 = s.w.length
      val lari = s.mark_lArI(e2)
      if (lari >= 0) { s.truncate(lari); return true }
      var q = s.mark_possessives(e2)
      if (q < 0) q = s.mark_sU(e2)
      if (q >= 0) {
        s.truncate(q)
        val lar2 = s.mark_lAr(s.w.length)
        if (lar2 >= 0) { s.truncate(lar2); chainBeforeKi(s) }
        return true
      }
      chainBeforeKi(s)
      return true
    }

    // ki preceded by ndA
    p = s.mark_ndA(ki)
    if (p >= 0) {
      val lari = s.mark_lArI(p)
      if (lari >= 0) { s.truncate(lari); return true }
      val su = s.mark_sU(p)
      if (su >= 0) {
        s.truncate(su)
        val lar2 = s.mark_lAr(s.w.length)
        if (lar2 >= 0) { s.truncate(lar2); chainBeforeKi(s) }
        return true
      }
      if (s.lit(p, "") >= 0) { // position holds; try nested chain at p
        s.truncate(p)
        chainBeforeKi(s)
        return true
      }
    }
    false
  }

  /** After a delete: optional [lAr] delete + ki chain. */
  private def tryLarChain(s: S): Unit = {
    val lar = s.mark_lAr(s.w.length)
    if (lar >= 0) { s.truncate(lar); chainBeforeKi(s): Unit }
  }

  /** stem_noun_suffixes: ordered alternatives, first match wins. */
  private def stemNoun(s: S): Unit = {
    val end = s.w.length

    // 1: lAr (+ki chain)
    var p = s.mark_lAr(end)
    if (p >= 0) {
      s.truncate(p)
      chainBeforeKi(s)
      return
    }

    // 2: ncA
    p = s.mark_ncA(end)
    if (p >= 0) {
      s.truncate(p)
      val e2 = s.w.length
      val lari = s.mark_lArI(e2)
      if (lari >= 0) { s.truncate(lari); return }
      var q = s.mark_possessives(e2)
      if (q < 0) q = s.mark_sU(e2)
      if (q < 0) q = s.mark_yU(e2)
      if (q >= 0) { s.truncate(q); tryLarChain(s); return }
      val lar = s.mark_lAr(e2)
      if (lar >= 0) { s.truncate(lar); chainBeforeKi(s) }
      return
    }

    // 3: (ndA | nA) — NO standalone delete: one of the sub-branches must
    // fire or the whole alternative fails (oracle: "adamina" falls through
    // to the yA alternative)
    p = s.mark_ndA(end)
    if (p < 0) p = s.mark_nA(end)
    if (p >= 0) {
      val lari = s.mark_lArI(p)
      if (lari >= 0) { s.truncate(lari); return }
      var q = s.mark_sU(p)
      if (q < 0) q = s.mark_yU(p)
      if (q >= 0) { s.truncate(q); tryLarChain(s); return }
      // fall through to later alternatives when no sub-branch fits
    }

    // 4: (ndAn | nU) — same: requires a sub-branch
    p = s.mark_ndAn(end)
    if (p < 0) p = s.mark_nU(end)
    if (p >= 0) {
      var q = s.mark_sU(p)
      if (q < 0) q = s.mark_yU(p)
      if (q >= 0) { s.truncate(q); tryLarChain(s); return }
      val lari = s.mark_lArI(p)
      if (lari >= 0) { s.truncate(lari); return }
    }

    // 5: DAn
    p = s.mark_DAn(end)
    if (p >= 0) {
      s.truncate(p)
      val e2 = s.w.length
      val poss = s.mark_possessives(e2)
      if (poss >= 0) { s.truncate(poss); tryLarChain(s); return }
      val lar = s.mark_lAr(e2)
      if (lar >= 0) { s.truncate(lar); chainBeforeKi(s); return }
      chainBeforeKi(s)
      return
    }

    // 6: (nUn | ylA)
    p = s.mark_nUn(end)
    if (p < 0) p = s.mark_ylA(end)
    if (p >= 0) {
      s.truncate(p)
      val e2 = s.w.length
      val lar = s.mark_lAr(e2)
      if (lar >= 0) { s.truncate(lar); chainBeforeKi(s); return }
      var q = s.mark_possessives(e2)
      if (q < 0) q = s.mark_sU(e2)
      if (q < 0) q = s.mark_yU(e2)
      if (q >= 0) { s.truncate(q); tryLarChain(s); return }
      chainBeforeKi(s)
      return
    }

    // 7: lArI
    p = s.mark_lArI(end)
    if (p >= 0) { s.truncate(p); return }

    // 8: ki chain
    if (chainBeforeKi(s)) return

    // 9: (DA | yU | yA)
    p = s.mark_DA(end)
    if (p < 0) p = s.mark_yU(end)
    if (p < 0) p = s.mark_yA(end)
    if (p >= 0) {
      s.truncate(p)
      val e2 = s.w.length
      val poss = s.mark_possessives(e2)
      if (poss >= 0) {
        val lar = s.mark_lAr(poss)
        if (lar >= 0) s.truncate(lar) else s.truncate(poss)
        chainBeforeKi(s)
        return
      }
      val lar = s.mark_lAr(e2)
      if (lar >= 0) { s.truncate(lar); chainBeforeKi(s) }
      return
    }

    // 10: (possessives | sU)
    p = s.mark_possessives(end)
    if (p < 0) p = s.mark_sU(end)
    if (p >= 0) { s.truncate(p); tryLarChain(s) }
  }

  /** postlude: append U to stems ending d/g (harmonizing with the last
    * vowel), then reverse final devoicing (b→p c→ç d→t ğ→k).
    */
  private def postlude(s: S): Unit = {
    val w = s.w
    if (w.isEmpty) return
    val st = w.toString
    if (st == "ad" || st == "soyad") return // tr.sbl reserved words: exempt from the whole postlude
    val lastC = w.charAt(w.length - 1)
    if (lastC == 'd' || lastC == 'g') {
      var i = w.length - 1
      while (i >= 0 && !isVowel(w.charAt(i))) i -= 1
      if (i >= 0) {
        w.charAt(i) match {
          case 'a' | 'ı' => w.append('ı')
          case 'e' | 'i' => w.append('i')
          case 'o' | 'u' => w.append('u')
          case 'ö' | 'ü' => w.append('ü')
          case _         =>
        }
      }
    }
    // reverse final devoicing (unconditional; the whole postlude is skipped
    // on the nominal-lAr path)
    val c = w.charAt(w.length - 1)
    val r = c match {
      case 'b' => 'p'
      case 'c' => 'ç'
      case 'd' => 't'
      case 'ğ' => 'k'
      case o   => o
    }
    if (r != c) w.setCharAt(w.length - 1, r)
  }
}
