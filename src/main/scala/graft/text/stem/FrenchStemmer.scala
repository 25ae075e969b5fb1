package graft.text.stem

/** French Snowball stemmer, implemented from the published algorithm
  * (snowballstem.org/algorithms/french/stemmer.html; rust-stemmers v1.2.0
  * `Algorithm::French`, selected by the reference at
  * `/root/reference/src/default_tokenizer.rs:94`).
  */
object FrenchStemmer extends Stemmer {
  import Snowball._

  @inline private def isV(c: Char): Boolean =
    c == 'a' || c == 'e' || c == 'i' || c == 'o' || c == 'u' || c == 'y' ||
    c == 'â' || c == 'à' || c == 'ë' || c == 'é' || c == 'ê' || c == 'è' ||
    c == 'ï' || c == 'î' || c == 'ô' || c == 'û' || c == 'ù'

  private val step2a = Array(
    "issaIent", "issantes", "iraIent", "issante", "issants", "issions",
    "irions", "issais", "issait", "issant", "issent", "issiez", "issons",
    "irais", "irait", "irent", "iriez", "irons", "iront", "isses",
    "issez", "îmes", "îtes", "irai", "iras", "irez", "isse", "ies",
    "ira", "ît", "ie", "ir", "is", "it", "i")

  private val step2bRV = Array( // delete if in RV (group b)
    "eraIent", "erions", "èrent", "erais", "erait", "eriez", "erons",
    "eront", "erai", "eras", "erez", "ées", "era", "iez", "ée", "és",
    "er", "ez", "é")
  private val step2bE = Array( // delete if in RV; then a preceding e in RV too
    "assions", "assent", "assiez", "aIent", "antes", "asses", "âmes",
    "âtes", "ante", "ants", "asse", "ais", "ait", "ant", "ât", "ai",
    "as", "a")

  def stem(word: String): String = {
    if (word.length < 2) return word
    val sb = new StringBuilder(word)
    // prelude: u after q → U; u/i between vowels → U/I; y next to vowel → Y
    var i = 0
    while (i < sb.length) {
      val c = sb.charAt(i)
      if (c == 'u' && i > 0 && sb.charAt(i - 1) == 'q') sb.setCharAt(i, 'U')
      else if ((c == 'u' || c == 'i') && i > 0 && i + 1 < sb.length &&
               isV(sb.charAt(i - 1)) && isV(sb.charAt(i + 1)))
        sb.setCharAt(i, if (c == 'u') 'U' else 'I')
      else if (c == 'y' && ((i > 0 && isV(sb.charAt(i - 1))) ||
               (i + 1 < sb.length && isV(sb.charAt(i + 1)))))
        sb.setCharAt(i, 'Y')
      i += 1
    }

    // RV: par/col/tap prefix → after 3rd letter; two initial vowels → after
    // 3rd letter; else after the first vowel not at the beginning
    val rv: Int = {
      val s = sb
      if (s.length < 3) s.length
      else if (s.substring(0, 3) == "par" || s.substring(0, 3) == "col" ||
               s.substring(0, 3) == "tap") 3
      else if (isV(s.charAt(0)) && isV(s.charAt(1))) 3
      else {
        var j = 1
        while (j < s.length && !isV(s.charAt(j))) j += 1
        math.min(s.length, j + 1)
      }
    }
    val p1 = regionAfterVC(sb, 0, isV)
    val p2 = regionAfterVC(sb, p1, isV)
    def inRV(n: Int) = sb.length - n >= rv
    def inR1(n: Int) = sb.length - n >= p1
    def inR2(n: Int) = sb.length - n >= p2
    def ends(s: String) = endsWith(sb, s)
    def chop(n: Int): Unit = sb.setLength(sb.length - n)

    // ---- step 1: standard suffixes (longest match) -----------------------
    val preStep1 = sb.toString
    var mentFound = false
    var step1Applied = false // a step-1 suffix matched (even if unremoved)

    def step1(): Unit = {
      if (ends("issements") || ends("issement")) {
        step1Applied = true
        val n = if (ends("issements")) 9 else 8
        if (inR1(n) && sb.length > n && !isV(sb.charAt(sb.length - n - 1))) chop(n)
      } else if (ends("atrices") || ends("atrice") || ends("ateurs") ||
                 ends("ations") || ends("ateur") || ends("ation")) {
        step1Applied = true
        val n = if (ends("atrices")) 7
                else if (ends("atrice") || ends("ateurs") || ends("ations")) 6
                else 5
        if (inR2(n)) {
          chop(n)
          if (ends("ic")) {
            if (inR2(2)) chop(2) else { chop(2); sb.append("iqU") }
          }
        }
      } else if (ends("logies") || ends("logie")) {
        step1Applied = true
        val n = if (ends("logies")) 6 else 5
        if (inR2(n)) { chop(n); sb.append("log") }
      } else if (ends("usions") || ends("utions") || ends("usion") || ends("ution")) {
        step1Applied = true
        val n = if (ends("usions") || ends("utions")) 6 else 5
        if (inR2(n)) { chop(n); sb.append("u") }
      } else if (ends("ences") || ends("ence")) {
        step1Applied = true
        val n = if (ends("ences")) 5 else 4
        if (inR2(n)) { chop(n); sb.append("ent") }
      } else if (ends("ements") || ends("ement")) {
        step1Applied = true
        val n = if (ends("ements")) 6 else 5
        if (inRV(n)) {
          chop(n)
          if (ends("iv") && inR2(2)) {
            chop(2)
            if (ends("at") && inR2(2)) chop(2)
          } else if (ends("eus")) {
            if (inR2(3)) chop(3)
            else if (inR1(3)) { chop(3); sb.append("eux") }
          } else if ((ends("abl") || ends("iqU")) && inR2(3)) chop(3)
          else if ((ends("ièr") || ends("Ièr")) && inRV(3)) { chop(3); sb.append("i") }
        }
      } else if (ends("ités") || ends("ité")) {
        step1Applied = true
        val n = if (ends("ités")) 4 else 3
        if (inR2(n)) {
          chop(n)
          if (ends("abil")) {
            if (inR2(4)) chop(4) else { chop(4); sb.append("abl") }
          } else if (ends("ic")) {
            if (inR2(2)) chop(2) else { chop(2); sb.append("iqU") }
          } else if (ends("iv") && inR2(2)) chop(2)
        }
      } else if (ends("amment")) {
        step1Applied = true; mentFound = true
        if (inRV(6)) { chop(6); sb.append("ant") }
      } else if (ends("emment")) {
        step1Applied = true; mentFound = true
        if (inRV(6)) { chop(6); sb.append("ent") }
      } else if (ends("ments") || ends("ment")) {
        step1Applied = true; mentFound = true
        val n = if (ends("ments")) 5 else 4
        // delete if preceded by a vowel in RV
        if (sb.length > n && isV(sb.charAt(sb.length - n - 1)) &&
            sb.length - n - 1 >= rv) chop(n)
      } else if (ends("euses") || ends("euse")) {
        step1Applied = true
        val n = if (ends("euses")) 5 else 4
        if (inR2(n)) chop(n)
        else if (inR1(n)) { chop(n); sb.append("eux") }
      } else if (ends("ances") || ends("iqUes") || ends("ismes") ||
                 ends("ables") || ends("istes")) {
        step1Applied = true
        if (inR2(5)) chop(5)
      } else if (ends("ance") || ends("iqUe") || ends("isme") ||
                 ends("able") || ends("iste")) {
        step1Applied = true
        if (inR2(4)) chop(4)
      } else if (ends("ives") || ends("ifs") || ends("ive") || ends("if")) {
        step1Applied = true
        val n = if (ends("ives")) 4 else if (ends("ifs") || ends("ive")) 3 else 2
        if (inR2(n)) {
          chop(n)
          if (ends("at") && inR2(2)) {
            chop(2)
            if (ends("ic")) {
              if (inR2(2)) chop(2) else { chop(2); sb.append("iqU") }
            }
          }
        }
      } else if (ends("eaux")) {
        step1Applied = true
        chop(4); sb.append("eau")
      } else if (ends("aux")) {
        step1Applied = true
        if (inR1(3)) { chop(3); sb.append("al") }
      } else if (ends("eux")) {
        step1Applied = true
        if (inR2(3)) chop(3)
      }
    }
    step1()
    val _ = step1Applied
    var lastAltered = sb.toString != preStep1

    // ---- step 2a: verb suffixes beginning i ------------------------------
    var did2 = false
    if (!lastAltered || mentFound) {
      did2 = true
      var j = 0
      var found = false
      val before = sb.length
      while (!found && j < step2a.length) {
        val s = step2a(j)
        if (ends(s)) {
          found = true
          if (inRV(s.length) && sb.length > s.length &&
              !isV(sb.charAt(sb.length - s.length - 1)) &&
              sb.length - s.length - 1 >= rv) chop(s.length)
        }
        j += 1
      }
      val removed2a = sb.length != before
      // ---- step 2b (only if 2a removed nothing): LONGEST match across the
      // three suffix classes (ions ∈ R2-delete; group b ∈ RV-delete;
      // group c ∈ RV-delete + preceding e) ---------------------------------
      if (!removed2a) {
        val before2b = sb.length
        var best: String = null
        var kind = 0 // 0 = ions, 1 = RV-delete, 2 = RV-delete + e
        if (ends("ions")) { best = "ions"; kind = 0 }
        var m = 0
        while (m < step2bRV.length) {
          val s = step2bRV(m)
          if ((best == null || s.length > best.length) && ends(s)) { best = s; kind = 1 }
          m += 1
        }
        m = 0
        while (m < step2bE.length) {
          val s = step2bE(m)
          if ((best == null || s.length > best.length) && ends(s)) { best = s; kind = 2 }
          m += 1
        }
        if (best != null) kind match {
          case 0 => if (inR2(4)) chop(4)
          case 1 => if (inRV(best.length)) chop(best.length)
          case 2 => if (inRV(best.length)) {
            chop(best.length)
            if (ends("e") && inRV(1)) chop(1)
          }
        }
        lastAltered = sb.length != before2b
      } else lastAltered = true
    }

    if (lastAltered) {
      // ---- step 3: final Y → i, final ç → c ------------------------------
      if (sb.nonEmpty && sb.charAt(sb.length - 1) == 'Y') sb.setCharAt(sb.length - 1, 'i')
      else if (sb.nonEmpty && sb.charAt(sb.length - 1) == 'ç') sb.setCharAt(sb.length - 1, 'c')
    } else {
      // ---- step 4: residual -----------------------------------------------
      if (ends("s") && sb.length >= 2 &&
          "aiouès".indexOf(sb.charAt(sb.length - 2)) < 0) chop(1)
      if (ends("Ière") || ends("ière")) {
        if (inRV(4)) { chop(4); sb.append("i") }
      } else if (ends("Ier") || ends("ier")) {
        if (inRV(3)) { chop(3); sb.append("i") }
      } else if (ends("ion")) {
        if (inR2(3) && sb.length >= 4 && sb.length - 4 >= rv &&
            (sb.charAt(sb.length - 4) == 's' || sb.charAt(sb.length - 4) == 't'))
          chop(3)
      } else if (ends("ë")) {
        if (inRV(1) && sb.length >= 3 &&
            sb.charAt(sb.length - 2) == 'u' && sb.charAt(sb.length - 3) == 'g') chop(1)
      } else if (ends("e")) {
        if (inRV(1)) chop(1)
      }
    }

    // ---- step 5: undouble enn onn ett ell eill ---------------------------
    if (ends("enn") || ends("onn") || ends("ett") || ends("ell")) chop(1)
    else if (ends("eill")) chop(1)

    // ---- step 6: é/è before final non-vowel run → e ----------------------
    var k = sb.length - 1
    var sawNonVowel = false
    while (k >= 0 && !isV(sb.charAt(k))) { sawNonVowel = true; k -= 1 }
    if (sawNonVowel && k >= 0 && (sb.charAt(k) == 'é' || sb.charAt(k) == 'è'))
      sb.setCharAt(k, 'e')

    // postlude
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
