package graft.text.stem

/** Romanian Snowball stemmer, implemented from the published algorithm
  * (snowballstem.org/algorithms/romanian/stemmer.html; rust-stemmers v1.2.0
  * `Algorithm::Romanian`, reference `default_tokenizer.rs:99`). Validated
  * word-for-word against the system libstemmer on a 7.5k-word probe corpus
  * (scripts/stem_parity.sh — zero mismatches; golden vectors in
  * StemGoldenSpec). Cedilla forms (ş U+015F / ţ U+0163) are the table
  * alphabet, matching the pinned Snowball generation; comma-below ș/ț pass
  * through untouched. Under default normalization the diacritics are
  * transliterated to ASCII before stemming, so the diacritic branches are
  * exercised only in `normalization(false)` configurations.
  */
object RomanianStemmer extends Stemmer {
  import Snowball._

  @inline private def isV(c: Char): Boolean =
    c == 'a' || c == 'e' || c == 'i' || c == 'o' || c == 'u' ||
    c == 'ă' || c == 'â' || c == 'î'

  private val step2Delete = Array(
    "abilă", "abila", "abile", "abili", "abil", "ibilă", "ibila",
    "ibile", "ibili", "ibil", "itate", "itati", "ităţi", "ităi",
    "atori", "ator", "oasă", "oasa", "oase", "antă", "anta", "ante",
    "anti", "ant", "ată", "ata", "ate", "ati", "at", "ută", "uta",
    "ute", "uti", "ut", "ită", "ita", "ite", "iti", "it", "ică", "ica",
    "ice", "ici", "ic", "ivă", "iva", "ive", "ivi", "iv", "oşi", "osi",
    "os").sortBy(-_.length)

  // verb suffixes (romanian.sbl verb_suffix, one among under `setlimit
  // tomark pV`): group A deletes if the preceding char is inside RV and a
  // consonant or 'u'; group B deletes outright. Longest candidate fitting
  // inside RV wins; a failed group-A condition fails the whole step.
  private val step3a = Array(
    "are", "ere", "ire", "âre", "ind", "ând", "indu", "ându", "eze",
    "ează", "ezi", "ez", "ească", "esc", "eşti", "eşte", "ăsc", "ăşti",
    "ăşte", "am", "ai", "au", "eam", "eai", "eau", "eaţi", "ia", "iam", "iai",
    "iau", "iaţi", "ui", "âi", "aşi", "uşi", "işi", "âşi",
    "ară", "iră", "ură", "âră", "arăm",
    "irăm", "urăm", "ârăm", "arăţi", "irăţi", "urăţi", "ârăţi", "asem",
    "aseşi", "ase", "aserăm", "aserăţi", "aseră", "isem", "iseşi",
    "ise", "iserăm", "iserăţi", "iseră", "âsem", "âseşi", "âse",
    "âserăm", "âserăţi", "âseră", "usem", "useşi", "use", "userăm",
    "userăţi", "useră")
  private val step3b = Array(
    "ăm", "aţi", "em", "eţi", "im", "iţi", "âm", "âţi", "seşi", "serăm",
    "serăţi", "seră", "sei", "se", "sesem", "seseşi", "sese", "seserăm",
    "seserăţi", "seseră")

  def stem(word: String): String = {
    if (word.length < 3) return word
    val sb = new StringBuilder(word)
    var i = 1
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
    def repl(n: Int, w: String): Unit = { chop(n); sb.append(w) }

    // ---- step 0: removal of plurals / articles (R1) ----------------------
    if (ends("ului")) { if (inR1(4)) chop(4) }
    else if (ends("aua")) { if (inR1(3)) repl(3, "a") }
    else if (ends("elor")) { if (inR1(4)) repl(4, "e") }
    else if (ends("iilor")) { if (inR1(5)) repl(5, "i") }
    else if (ends("ilor")) { if (inR1(4)) repl(4, "i") }
    else if (ends("iile")) { if (inR1(4)) repl(4, "i") }
    else if (ends("atei")) { if (inR1(4)) repl(4, "at") }
    else if (ends("aţie") || ends("aţia")) { if (inR1(4)) repl(4, "aţi") }
    else if (ends("ele")) { if (inR1(3)) repl(3, "e") }
    else if (ends("iua")) { if (inR1(3)) repl(3, "i") }
    else if (ends("iei")) { if (inR1(3)) repl(3, "i") }
    else if (ends("ile")) {
      // → i unless preceded by ab
      if (inR1(3) && !(sb.length >= 5 && sb.substring(sb.length - 5, sb.length - 3) == "ab"))
        repl(3, "i")
    }
    else if (ends("ul")) { if (inR1(2)) chop(2) }
    else if (ends("ea")) { if (inR1(2)) repl(2, "e") }
    else if (ends("ii")) { if (inR1(2)) repl(2, "i") }

    // ---- step 1: combining suffixes, repeated (R1) -----------------------
    var changed1 = false
    var loop = true
    while (loop) {
      loop = false
      if (ends("abilitate") || ends("abilitati") || ends("abilităi") || ends("abilităţi")) {
        val n = Seq("abilitate", "abilitati", "abilităţi", "abilităi").find(ends).get.length
        if (inR1(n)) { repl(n, "abil"); loop = true; changed1 = true }
      } else if (ends("ibilitate")) {
        if (inR1(9)) { repl(9, "ibil"); loop = true; changed1 = true }
      } else if (ends("ivitate") || ends("ivitati") || ends("ivităi") || ends("ivităţi")) {
        val n = if (ends("ivitate") || ends("ivitati")) 7 else if (ends("ivităţi")) 7 else 6
        if (inR1(n)) { repl(n, "iv"); loop = true; changed1 = true }
      } else if (ends("icitate") || ends("icitati") || ends("icităi") || ends("icităţi") ||
                 ends("icatori") || ends("icator") || ends("icala") || ends("icale") ||
                 ends("icali") || ends("icală") || ends("iciva") || ends("icive") ||
                 ends("icivi") || ends("icivă") || ends("ical") || ends("iciv")) {
        val n = Seq("icitate", "icitati", "icităţi", "icatori", "icităi",
          "icator", "icala", "icale", "icali", "icală", "iciva", "icive",
          "icivi", "icivă", "ical", "iciv").find(ends).get.length
        if (inR1(n)) { repl(n, "ic"); loop = true; changed1 = true }
      } else if (ends("aţiune") || ends("atoare") || ends("ătoare") || ends("ativa") ||
                 ends("ative") || ends("ativi") || ends("ativă") || ends("atori") ||
                 ends("ători") || ends("ativ") || ends("ator") || ends("ător")) {
        val n = Seq("aţiune", "atoare", "ătoare", "ativa", "ative", "ativi",
          "ativă", "atori", "ători", "ativ", "ator", "ător").find(ends).get.length
        if (inR1(n)) { repl(n, "at"); loop = true; changed1 = true }
      } else if (ends("iţiune") || ends("itoare") || ends("itiva") || ends("itive") ||
                 ends("itivi") || ends("itivă") || ends("itori") || ends("itiv") ||
                 ends("itor")) {
        val n = Seq("iţiune", "itoare", "itiva", "itive", "itivi", "itivă",
          "itori", "itiv", "itor").find(ends).get.length
        if (inR1(n)) { repl(n, "it"); loop = true; changed1 = true }
      }
    }

    // ---- step 2: standard suffixes (R2) ----------------------------------
    var changed2 = false
    if (ends("iune") || ends("iuni")) {
      if (inR2(4) && sb.length >= 5 && sb.charAt(sb.length - 5) == 'ţ') {
        chop(4)
        sb.setCharAt(sb.length - 1, 't')
        changed2 = true
      }
    } else if (ends("ismе") || ends("isme") || ends("ista") || ends("iste") ||
               ends("isti") || ends("istă") || ends("işti") || ends("ism") ||
               ends("ist")) {
      val n = Seq("isme", "ista", "iste", "isti", "istă", "işti", "ism",
        "ist").find(ends).get.length
      if (inR2(n)) { repl(n, "ist"); changed2 = true }
    } else {
      var j = 0
      var found = false
      while (!found && j < step2Delete.length) {
        val s = step2Delete(j)
        if (ends(s)) {
          found = true
          if (inR2(s.length)) { chop(s.length); changed2 = true }
        }
        j += 1
      }
    }

    // ---- step 3: verb suffixes — only if the step-2 among removed nothing
    // (combo replacements alone do NOT block this step). One among over
    // groups A+B under `setlimit tomark pV`: longest candidate fitting
    // inside RV; group-A's consonant-or-u char must itself be inside RV.
    if (!changed2) {
      var best: String = null
      var bestA = false
      var j = 0
      while (j < step3a.length) {
        val s = step3a(j)
        if ((best == null || s.length > best.length) && ends(s) && inRV(s.length)) {
          best = s; bestA = true
        }
        j += 1
      }
      j = 0
      while (j < step3b.length) {
        val s = step3b(j)
        if ((best == null || s.length > best.length) && ends(s) && inRV(s.length)) {
          best = s; bestA = false
        }
        j += 1
      }
      if (best != null) {
        if (!bestA) chop(best.length)
        else if (sb.length > best.length && sb.length - best.length - 1 >= rv) {
          val p = sb.charAt(sb.length - best.length - 1)
          if (!isV(p) || p == 'u') chop(best.length)
        }
      }
    }

    // ---- step 4: residual vowel (RV) -------------------------------------
    if (ends("ie")) { if (inRV(2)) chop(2) }
    else if (ends("a") || ends("e") || ends("i") || ends("ă")) {
      if (inRV(1)) chop(1)
    }

    i = 0
    while (i < sb.length) {
      val c = sb.charAt(i)
      if (c == 'I') sb.setCharAt(i, 'i') else if (c == 'U') sb.setCharAt(i, 'u')
      i += 1
    }
    sb.toString
  }
}
