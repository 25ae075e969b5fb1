package graft.text.stem

/** Tamil Snowball stemmer (Damodharan's algorithm as shipped in Snowball and
  * rust-stemmers v1.2.0 `Algorithm::Tamil`, reference
  * `default_tokenizer.rs:102`).
  *
  * Reconstructed rule-for-rule against the system libstemmer oracle
  * (Snowball 2.2.0): zero mismatches on the 1,313-word reference probe
  * corpus and 1–7 residues per 30,000-word adversarial random probe
  * (six seeds; every remaining residue mixes non-Tamil codepoints into
  * the word or starts it with a sign/virama — ill-formed byte salad
  * unreachable from real text; see COVERAGE.md). The last REACHABLE
  * divergence class (final vallinam-virama pairs cascading to the empty
  * stem, e.g. மரக்க் → மர) was closed in round 4 with the 4-char
  * pair-deletion rule in the fix chain. Under default normalization Tamil
  * script transliterates to Latin before stemming, so this stemmer fires
  * only for `normalization(false)` configs.
  *
  * Pipeline: one initial fix pass; question/pronoun prefix strip (with
  * va-start repair); question suffixes; -um; common word endings (with the
  * ii-shortening clause); vetrumai case endings (sets the t-doubling flag
  * that shapes the த்த் rewrite); plural suffixes (the ங்கள்/vall-ுங்கள்
  * branches and fix-fired plain-கள் strips suppress the later stages);
  * command suffixes; then the tense loop whose auxiliary matches
  * (தான/படு/து/ென) re-expose case endings via a clause pass, followed by a
  * path-dependent கிற்/கின்ற்/(ா)நின்ற் strip. All rule conditions
  * (sign-vs-letter contexts, the 8-sign set, the vallinam set) were
  * derived empirically from oracle probes.
  */
object TamilStemmer extends Stemmer {

  private final val V = '்' // virama (pulli)
  private def isVall(ch: Char): Boolean = "கசடதபற".indexOf(ch) >= 0
  private def isSign8(ch: Char): Boolean = "ிாைேெூுீ".indexOf(ch) >= 0
  private def isIei(ch: Char): Boolean = "ிைீ".indexOf(ch) >= 0
  private def isCons(ch: Char): Boolean = "கஙசஜஞடணதநனபமயரறலளழவஶஷஸஹ".indexOf(ch) >= 0
  private def isTam18(ch: Char): Boolean = "கஙசஞடணதநனபமயரறலளழவ".indexOf(ch) >= 0
  private def isVow(ch: Char): Boolean = "அஆஇஈஉஊஎஏஐஒஓஔஃ".indexOf(ch) >= 0
  private def isLet(ch: Char): Boolean = isCons(ch) || isVow(ch)
  private def isPrefC(ch: Char): Boolean = "கசதவநபமயஙஞ".indexOf(ch) >= 0

  // fix chain call-site modes
  private final val MInit = 0; private final val MQ = 1; private final val MUm = 2
  private final val MCommon = 3; private final val MVet = 4; private final val MPlural = 5
  private final val MPsup = 6; private final val MCommand = 7; private final val MTense = 8; private final val MHard = 9

  private final class W(word: String) {
    val b = new StringBuilder(word)
    var vflag = false
    def len: Int = b.length
    def ends(s: String): Boolean = {
      val n = s.length
      len >= n && { var i = 0; var ok = true; while (ok && i < n) { if (b.charAt(len - n + i) != s(i)) ok = false; i += 1 }; ok }
    }
    def del(n: Int): Unit = b.setLength(len - n)
    /** delete n, then append virama — the `<- '்'` action (appends even on
      * an empty base: whole-word matches stem to '்', oracle ிருந்து → ்) */
    def rep(n: Int): Unit = { del(n); b.append(V) }
    def ch(i: Int): Char = b.charAt(i) // from-end helpers use len-…
  }

  private val CommonP = Array("ுடன்", "ில்லை", "ின்றி", "ாகிய", "ாகி", "ுள்ள", "ுடைய", "ல்ல", "ென்று", "ிடம்")
  private val CommonD = Array("விட்டு", "விடு", "பட்டது", "பட்டண", "பட்டு", "பட்ட", "பற்றி", "படி", "ெல்லாம்")
  // vetrumai: mode 0=rep 1=rep+aiCond 2=rep unless prev in signs8 3=delete
  //           4=delete unless prev is virama (மின் after '்' is left for the
  //             tense stage — oracle: மாடுகள்மின் keeps கள், மாடுமின் strips)
  private val Vet: Array[(String, Int)] = Array(
    "ாமல்" -> 0, "மின்" -> 4, "கண்" -> 3, "முன்" -> 3, "மேல்" -> 3, "மேற்" -> 3, "கீழ்" -> 3, "பின்" -> 3,
    "ிருந்து" -> 0, "ின்று" -> 0, "ால்" -> 0, "ில்" -> 0, "ின்" -> 0, "ொடு" -> 0, "ோடு" -> 0,
    "ுடை" -> 0, "ுள்" -> 0, "விட" -> 0, "ல்" -> 2, "ை" -> 1)

  // tense rule actions / conditions
  private final val AD = 0; private final val AV = 1; private final val AAa = 2; private final val AK = 3
  private final val CNone = 0; private final val CVq = 1; private final val CT8 = 2; private final val CEn2 = 3; private final val CNvow = 4
  private final val CNcha = 5
  private final case class TR(suf: String, act: Int, cond: Int, aux: Boolean)
  private val Tense: Array[TR] = {
    val l = Array.newBuilder[TR]
    def t(s: String, a: Int, c: Int = CNone, aux: Boolean = false): Unit = l += TR(s, a, c, aux)
    t("கொண்டிர்", AD); t("தான", AD, aux = true); t("படு", AD, aux = true)
    t("மின்", AD); t("மார்", AD); t("னென்", AD)
    for (x <- Array("னான்", "னாள்", "னார்", "னன்", "வள்", "னர்", "னள்", "பன்", "பள்", "பர்", "னம்", "பம்")) t(x, AD)
    t("வன்", AD, CNvow)
    t("னை", AD); t("வர்", AD)
    t("கு", AD, CVq); t("ிற்று", AD)
    t("து", AD, CT8, aux = true); t("னு", AD, CT8)
    for (k <- Array("ாநின்ற", "கின்ற", "கிற")) t(k, AK)
    t("ான்", AV, CNcha) // blocked after ச (oracle: சான் frozen, all other C+ான் strip)
    for (p <- Array("ாள்", "ார்", "ேன்", "ோம்", "ேம்", "ெம்", "ாம்", "ாய்", "ீயர்", "ீர்", "னிர்")) t(p, AV)
    t("ென", AV, aux = true)
    t("வை", AD)
    t("ா", AAa)
    for (s <- Array("ன", "த", "க", "ப", "ய", "வ")) t(s, AD)
    l.result()
  }
  // clause kinds
  private final val KCum = 0; private final val KVet = 1; private final val KTkal = 2; private final val KRkal = 3
  private final val KKal = 4; private final val KVii = 5; private final val KPp = 7
  private final val KNai = 8; private final val KAi = 9; private final val KIi = 10
  private val Clause: Array[(String, Int)] = Array(
    "கும்" -> KCum, "தும்" -> KCum, "டும்" -> KCum, "றும்" -> KCum,
    "ிருந்து" -> KVet, "ின்று" -> KVet, "ால்" -> KVet, "ில்" -> KVet, "ின்" -> KVet, "ொடு" -> KVet,
    "ோடு" -> KVet, "ுடை" -> KVet, "ுள்" -> KVet, "விட" -> KVet, "ிடம்" -> KVet, "ல்" -> KVet,
    "ட்கள்" -> KTkal, "ற்கள்" -> KRkal, "கள்" -> KKal, "வீ" -> KVii,
    "கண்" -> KPp, "முன்" -> KPp, "மேல்" -> KPp, "மேற்" -> KPp, "கீழ்" -> KPp, "பின்" -> KPp,
    "னை" -> KNai, "ை" -> KAi, "ீ" -> KIi)

  /** Can suffix removal of k chars leave the ை rule applicable? */
  private def aiCond(w: W, k: Int): Boolean = {
    val i = w.len - k - 1
    if (i < 0) true
    else {
      val p = w.b.charAt(i)
      if (p == 'ன') false
      else if (!isVall(p)) true
      else i >= 1 && w.b.charAt(i - 1) == V
    }
  }

  /** One application of the shared fix chain; rule availability varies by call site. */
  private def fixOnce(w: W, mode: Int): Boolean = {
    val c = w.b; val n = w.len
    if (n <= 3) return false
    def last = c.charAt(n - 1)
    if (w.ends("ந்த்")) { w.del(4); return true }
    if (w.ends("ந்த")) { w.del(3); return true }
    if (w.ends("ந்")) { w.del(2); return true }
    if (w.ends("ய்") && n >= 3 && isIei(c.charAt(n - 3))) { w.del(2); return true }
    if (w.ends("த்த்")) {
      // vflag branch by the char before த்த் (all oracle-probed):
      //   ா with a ≥2-char base → the ா is consumed too (கயாத்தில் → கய்);
      //   ா shallow → ம் (மாத்தை → மாம், ாத்தில் → ாம்);
      //   ை, or ் with a base → plain drop (மலைத்தை → மலை, கன்த்தில் → கன்);
      //   letters / bare ் / nothing → ம் (மரத்தை → மரம், ்த்தில் → ்ம்)
      if (w.vflag) {
        val p = if (n >= 5) c.charAt(n - 5) else ' '
        if (p == 'ா' && n >= 7) w.rep(5)
        else if (p == 'ை' || (p == V && n > 5)) w.del(4)
        else { w.del(4); c.append("ம்") }
      } else w.del(4)
      return true
    }
    if (w.ends("ட்ட்")) { w.del(4); c.append("டு"); return true }
    if (w.ends("ட்ப்") || w.ends("ட்க்")) { w.del(4); c.append("ள்"); return true }
    if (w.ends("ற்த்")) { w.del(4); return true } // oracle: மரன்ற்த் → மரன் (ற்த் drops whole, no ல் rewrite)
    if (w.ends("ன்ற்") || w.ends("ற்க்")) { w.del(4); c.append("ல்"); return true }
    if (w.ends("ுக்க்")) { w.del(5); c.append(V); return true }
    if (w.ends("ுக்")) { w.del(3); c.append(V); return true }
    if (mode != MTense && w.ends("ுங்")) { w.del(3); c.append("ும்"); return true } // oracle: யுங்தை → யும், அுுஙை → அுும்
    if (n > 5 && w.ends("த்து")) { w.del(4); return true } // needs a 2-char base (oracle: மத்து frozen, மாத்து → மா)
    // the கும்-group rules freeze 4-char whole-word matches (oracle: டும்/தும்/கும்
    // unchanged alone; மாடும் → மா, கடும் → கட், குத்தில் → (vet) கும் frozen)
    val cumOk = (mode == MCommon || mode == MVet || mode == MTense || mode == MPlural || mode == MCommand) && n > 4
    if (cumOk && w.ends("டும்")) { w.rep(4); return true }
    if (cumOk && (w.ends("தும்") || w.ends("கும்") || w.ends("றும்"))) { w.del(4); return true }
    // a final vallinam-virama PAIR deletes as one 4-char unit (the specific
    // ட்ட்/ட்க்/ட்ப்/ற்க்/ற்த்/ந்த்/த்த் rewrites above take precedence) —
    // oracle: மரக்க் → மர, மரக்க்க் → மரக் (one application, not a repeat),
    // பைக்க் → பை, ச்க் → '' — while a lone cluster after a NON-vallinam
    // cluster drops alone (ங்க் → ங்)
    if (n >= 4 && last == V && isVall(c.charAt(n - 2)) && c.charAt(n - 3) == V && isVall(c.charAt(n - 4))) {
      w.del(4); return true
    }
    if (n >= 3 && last == V && isTam18(c.charAt(n - 2)) && c.charAt(n - 3) == V) { w.del(2); return true }
    if (n >= 2 && last == V && isVall(c.charAt(n - 2))) { w.del(2); return true }
    if (w.ends("ங்")) {
      if (n >= 3 && c.charAt(n - 3) == 'ை') w.del(2)
      else { w.del(2); c.append("ம்") }
      return true
    }
    if (w.ends("வ்")) { w.del(2); return true }
    if (last == V && n >= 2 && c.charAt(n - 2) == V) { w.del(1); return true }
    if (last == V && n >= 2 && isSign8(c.charAt(n - 2))) { w.del(1); return true }
    if ((mode == MInit || mode == MTense || mode == MPlural) && w.ends("னு") && (n < 3 || !isSign8(c.charAt(n - 3)))) { w.del(2); return true }
    val yvOk = mode == MInit || mode == MVet || mode == MTense || mode == MQ || mode == MCommand
    if (yvOk && last == 'ய') { w.del(1); return true }
    if (yvOk && last == 'வ') { w.del(1); return true }
    false
  }

  /** The plural modes check min-length once at entry (Snowball `has_min_length`), then cascade ungated. */
  private def fixAll(w: W, mode: Int): Unit = {
    if ((mode == MPsup || mode == MPlural) && w.len <= 4) return
    while (fixOnce(w, mode)) {}
  }

  private def fixVaStart(w: W): Unit = {
    if (w.len >= 2 && w.b.charAt(0) == 'வ') {
      val repl = w.b.charAt(1) match {
        case 'ோ' => 'ஓ'; case 'ொ' => 'ஒ'; case 'ு' => 'உ'; case 'ூ' => 'ஊ'
        case _ => ' '
      }
      if (repl != ' ') { w.b.delete(0, 2); w.b.insert(0, repl) }
    }
  }

  def stem(word: String): String = {
    if (word.isEmpty || !word.exists(ch => ch >= '஀' && ch <= '௿')) return word
    val w = new W(word)
    fixOnce(w, MInit)
    if (w.len <= 4) return w.b.toString
    // question prefix எC், then pronoun prefix அ|இ|உ + C + ்
    if (w.len >= 3 && w.b.charAt(0) == 'எ' && isPrefC(w.b.charAt(1)) && w.b.charAt(2) == V) {
      w.b.delete(0, 3); fixVaStart(w)
    }
    if (w.len >= 3 && { val c0 = w.b.charAt(0); c0 == 'அ' || c0 == 'இ' || c0 == 'உ' } &&
        isPrefC(w.b.charAt(1)) && w.b.charAt(2) == V) {
      w.b.delete(0, 3); fixVaStart(w)
    }
    if (w.len > 4) {
      val last = w.b.charAt(w.len - 1)
      if (last == 'ோ' || last == 'ே' || last == 'ா') w.b.setCharAt(w.len - 1, V)
      fixAll(w, MQ)
    }
    if (w.len > 4) {
      // single fix application (Snowball `do fix_ending`, not the repeat form): an
      // ill-formed ்ும் tail leaves one virama pair for later stages to see (or not match)
      if (w.ends("ும்")) { w.rep(3); fixOnce(w, MUm) }
    }
    if (w.len > 4) { // common word endings: one longest match, then fix + ீ clause
      var best: String = null; var bestRep = false
      var i = 0
      while (i < CommonP.length) {
        val s = CommonP(i)
        val blocked = (s == "ல்ல") && w.len > 3 && isSign8(w.b.charAt(w.len - 4))
        if (!blocked && w.ends(s) && (best == null || s.length > best.length)) { best = s; bestRep = true }
        i += 1
      }
      i = 0
      while (i < CommonD.length) {
        val s = CommonD(i)
        if (w.ends(s) && (best == null || s.length > best.length)) { best = s; bestRep = false }
        i += 1
      }
      if (best != null) { if (bestRep) w.rep(best.length) else w.del(best.length); fixAll(w, MCommon) }
      if (w.len > 4) {
        if (w.ends("வீ")) w.del(2)
        else if (w.b.charAt(w.len - 1) == 'ீ') w.b.setCharAt(w.len - 1, 'ி')
      }
    }
    if (w.len > 4 && w.ends("ுடை")) { // genitive pre-block: can stack under another case ending
      w.rep(3); w.vflag = true; fixAll(w, MVet)
    }
    if (w.len > 4) { // vetrumai urupukal
      var best: String = null; var bestMode = 0
      for ((s, m) <- Vet) {
        var ok = w.ends(s)
        if (ok && m == 1) ok = aiCond(w, s.length)
        if (ok && m == 2) ok = !(w.len > s.length && isSign8(w.b.charAt(w.len - s.length - 1)))
        if (ok && m == 4) ok = !(w.len > s.length && w.b.charAt(w.len - s.length - 1) == V)
        if (ok && (best == null || s.length > best.length)) { best = s; bestMode = m }
      }
      if (best != null) {
        if (bestMode == 3 || bestMode == 4) w.del(best.length) else w.rep(best.length)
        w.vflag = true
        fixAll(w, MVet)
      }
    }
    // plural
    var suppress = false
    if (w.len > 2) {
      var matched = false; var hardfix = false; var plainKal = false
      if (w.ends("ுங்கள்")) {
        val i = w.len - 7
        val vall = i >= 0 && isVall(w.b.charAt(i))
        if (vall && i == 0) { // vallinam with nothing before it: plain ங்கள் strip (oracle: சுங்கள்→சுங்)
          w.del(3)
        } else {
          w.del(6)
          if (vall) w.b.append("ும்") else w.b.append(V) // `<- '்'` appends even on an empty base
        }
        // the vall branch suppresses the later stages (its appended ும் must
        // survive tense: உடுங்கள் → உடும்); the ் branch suppresses only
        // after a sign, virama, or ங (oracle: உஇஏதுுங்கள் → உஇஏது and
        // ஆஆபஙுங்கள் → ஆஆபம் freeze, but ஆஆபனுங்கள் → ஆஆ — tense strips பன்)
        val p = if (i >= 0) w.b.charAt(i) else ' '
        matched = true; suppress = vall || isSign8(p) || p == V || p == 'ங'
      } else if (w.ends("ங்கள்")) {
        w.del(3); matched = true; suppress = true
      } else if (w.ends("ட்கள்")) {
        w.del(5)
        if (w.len > 0 && w.b.charAt(w.len - 1) == V) { suppress = true; hardfix = true }
        w.b.append("ள்")
        matched = true
      } else if (w.ends("ற்கள்")) {
        w.del(5)
        if (w.len > 0 && w.b.charAt(w.len - 1) == V) { suppress = true; hardfix = true }
        w.b.append("ல்")
        matched = true
      } else if (w.ends("கள்")) { w.del(3); matched = true; plainKal = true }
      if (matched) {
        val before = if (plainKal) w.b.toString else null
        fixAll(w, if (plainKal) MPlural else if (hardfix) MHard else MPsup)
        // a plain-கள் strip suppresses the later stages only when its fix
        // chain changed the word (oracle: மாடுபன்கள் → மாடு via tense, but
        // கபஇஆாஒசஓமகந்கள் → …மக: the ந் fix-drop freezes the single-க tense
        // rule; உ்னநனு்கள் → உ்னந because னு strips inside the plural fix)
        if (plainKal && w.b.toString != before) suppress = true
      }
    }
    if (w.len > 4 && !suppress) { // command suffixes
      if (w.len > 5 && w.ends("ுக்கு")) { w.rep(5); fixAll(w, MCommand) } // needs a base (oracle: ுக்கு → ுக் via tense; முக்கு → ம்)
      // the வி/பி branch min-length-gates its fix (மரந்வி → மரந் at 4 chars,
      // மரமரந்வி → மரமர at 6); the ுக்கு branch fixes ungated (வீடுக்கு → வீ)
      else if (w.ends("பி") || w.ends("வி")) { w.del(2); if (w.len > 4) fixAll(w, MCommand) }
    }
    if (!suppress) tense(w)
    w.b.toString
  }

  /** One longest conditioned clause match after an aux tense strip.
    * full=false is the து-rule subset: plural group + கும் group + ின்
    * only. ிடம் additionally needs clause-time length ≥ 7 (oracle:
    * மரிடம்தான → மரிடம் at 6, மாயிடம்தான → மாய் at 7).
    */
  /** @return the fired clause kind, or -1 when none matched */
  private def applyClause(w: W, full: Boolean): Int = {
    var cl: (String, Int) = null
    for ((cs, kind) <- Clause) {
      val inSet = full || kind == KCum || kind == KTkal || kind == KRkal || kind == KKal ||
        (kind == KVet && cs == "ின்")
      if (inSet && w.ends(cs)) {
        val pi = w.len - cs.length - 1
        val ok = kind match {
          case KCum => pi >= 0 && w.b.charAt(pi) == V
          case KVet if cs == "ிடம்" => w.len >= 7 && !(pi >= 0 && isSign8(w.b.charAt(pi)))
          case KVet => !(isSign8(cs.charAt(0)) && pi >= 0 && isSign8(w.b.charAt(pi)))
          case KAi => aiCond(w, 1)
          case _ => true
        }
        if (ok && (cl == null || cs.length > cl._1.length)) cl = (cs, kind)
      }
    }
    if (cl == null) return -1
    val (cs, kind) = cl
    kind match {
      case KCum => w.rep(4)
      case KTkal =>
        w.del(5); if (w.len > 0 && w.b.charAt(w.len - 1) != V) w.b.append("ள்")
      case KRkal =>
        w.del(5); if (w.len > 0 && w.b.charAt(w.len - 1) != V) w.b.append("ல்")
      case KKal => w.del(3)
      case KVii => w.del(2)
      case KPp => w.del(cs.length)
      case KNai => w.del(2)
      case KAi => w.rep(1); w.vflag = true
      case KIi => w.b.setCharAt(w.len - 1, 'ி')
      case _ => w.rep(cs.length); w.vflag = true
    }
    kind
  }

  private def tense(w: W): Unit = {
    var loop = true
    var first = true
    while (loop) {
      loop = false
      if (w.len <= 4) return
      var best: TR = null
      var i = 0
      while (i < Tense.length) {
        val r = Tense(i)
        if (w.ends(r.suf)) {
          val pi = w.len - r.suf.length - 1
          val ok = r.cond match {
            case CVq => pi >= 0 && w.b.charAt(pi) == V
            case CT8 => !(pi >= 0 && isSign8(w.b.charAt(pi)))
            case CEn2 => !(pi >= 1 && w.b.charAt(pi - 1) == V)
            case CNvow => !(pi >= 0 && isVow(w.b.charAt(pi)))
            case CNcha => !(pi >= 0 && w.b.charAt(pi) == 'ச')
            case _ => true
          }
          if (ok && (best == null || r.suf.length > best.suf.length)) best = r
        }
        i += 1
      }
      if (best == null) { fixAll(w, MTense); return } // the no-match tense pass still fixes (Snowball `do fix_endings`)
      best.act match {
        case AAa =>
          if (w.len >= 2 && isSign8(w.b.charAt(w.len - 2))) w.del(1) else w.rep(1)
          loop = true
        case AK => w.del(best.suf.length); loop = true
        case AV =>
          // ென appends '்' after ANY letter final — the fix chain then
          // cascades (மரயென → மரய்; மாசென → மாச் → மா; வந்தென → வந்த் →
          // வ via the ந்த் rule) — and leaves sign/virama finals untouched
          // so the clause can still see the stem's own tail
          // (oracle: மாடால்ென → மா via ால்; மாடோடுென → மா via ோடு)
          if (best.suf == "ென") {
            w.del(best.suf.length)
            if (w.len > 0 && isLet(w.b.charAt(w.len - 1))) w.b.append(V)
          } else w.rep(best.suf.length)
          loop = true
        case _ => w.del(best.suf.length); loop = true
      }
      if (best.aux && first && !w.vflag && w.ends("படி")) w.del(3) // auxiliary paDi strip: first pass only, and not once a case ending fired
      first = false
      var clauseKind = -1
      if (best.aux && w.len > 4) {
        if (best.suf == "து") {
          // the து rule fixes FIRST (so a ந்-masked tail is revealed:
          // மாடுகள்ந்து → fix → மாடுகள் → கள் strips) and then applies only
          // the plural/கும்/ின் clause subset — case endings survive it
          // (oracle: மாடால்து → மாடால் but மாடால்ென/தான/படு → மா)
          fixAll(w, MTense)
          clauseKind = applyClause(w, full = false) // gate is the outer pre-fix len: ஙகள்ந்து → ங
        } else clauseKind = applyClause(w, full = true)
      }
      // Kira gating is per entry and per path: no Kira after AK rules or
      // து/னை (oracle: மாநின்ற்து → மாநில்). After the aux-ish deletes
      // (னு/தான/படு/ென) the entries are நின்ற்/கின்ற் — கிற் stays for the
      // fix chain's vall-virama drop (மாநின்ற்தான → மா, மாகிற்தான → மாகி).
      // After the other deletes (கு/மார்/ிற்று/…) all three fire, but the
      // நின்ற் form requires and consumes a preceding ா
      // (மாநின்ற்கு → ம, மரநின்ற்கு → மரநில், மாகிற்கு → மா)
      val kiraOk = best.act != AK && best.suf != "து" && best.suf != "னை"
      if (kiraOk) {
        val auxish = best.suf == "னு" || best.suf == "தான" || best.suf == "படு" || best.suf == "ென"
        val entries = if (auxish) Array("நின்ற்", "கின்ற்") else Array("ாநின்ற்", "கின்ற்", "கிற்")
        var k = 0
        var done = false
        while (!done && k < entries.length) {
          if (w.ends(entries(k))) { w.del(entries(k).length); done = true }
          k += 1
        }
      }
      // a plain-கள் clause strip ends with the plural-gated fix (≤4-char
      // stems untouched, like the plural stage): மரங்கள்து → மரங், not மரம்
      fixAll(w, if (clauseKind == KKal) MPlural else MTense)
    }
  }
}
