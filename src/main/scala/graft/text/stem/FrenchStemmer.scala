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
    if (word.length < 2)
      return word.map { // the postlude unmarks stray U/I/Y even on 1-char input
        case 'U' => 'u'; case 'I' => 'i'; case 'Y' => 'y'; case c => c
      }
    val sb = new StringBuilder(word)
    // prelude — `repeat goto(...)`, alternatives tried IN ORDER at each
    // position (so in "yia" the leading y acts as the v-prefix and the i is
    // marked, not the y):
    //   v [u] v → U | v [i] v → I | v [y] → Y | [y] v → Y | q [u] → U
    var i = 0
    while (i < sb.length) {
      val c = sb.charAt(i)
      var jumped = false
      if (isV(c) && i + 1 < sb.length) {
        val n = sb.charAt(i + 1)
        if ((n == 'u' || n == 'i') && i + 2 < sb.length && isV(sb.charAt(i + 2))) {
          // the trailing vowel is NOT consumed: a following y can still be marked (xaiyez → xaIYez)
          sb.setCharAt(i + 1, if (n == 'u') 'U' else 'I'); i += 2; jumped = true
        } else if (n == 'y') { sb.setCharAt(i + 1, 'Y'); i += 2; jumped = true }
      }
      if (!jumped) {
        if (c == 'y' && i + 1 < sb.length && isV(sb.charAt(i + 1))) {
          sb.setCharAt(i, 'Y'); i += 1 // cursor lands after the y: the following vowel can still host a mark
        } else if (c == 'q' && i + 1 < sb.length && sb.charAt(i + 1) == 'u') {
          sb.setCharAt(i + 1, 'U'); i += 2
        } else i += 1
      }
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

    // `setlimit tomark pV for ([substring] among(...))`: only candidates
    // whose whole match fits inside RV compete for longest-match; the chosen
    // candidate's action either fires or the whole step fails (no backtrack)
    def longestFittingRV(cands: Array[String]*): String = {
      var best: String = null
      cands.foreach(_.foreach { s =>
        if ((best == null || s.length > best.length) && ends(s) && inRV(s.length))
          best = s
      })
      best
    }

    // ---- step 2a: verb suffixes beginning i ------------------------------
    if (!lastAltered || mentFound) {
      val before = sb.length
      val m2a = longestFittingRV(step2a)
      if (m2a != null) {
        // delete if preceded by a non-vowel that is itself inside RV (the
        // grouping test runs inside the setlimit)
        if (sb.length > m2a.length && sb.length - m2a.length - 1 >= rv &&
            !isV(sb.charAt(sb.length - m2a.length - 1))) chop(m2a.length)
      }
      val removed2a = sb.length != before
      // ---- step 2b (only if 2a deleted nothing): one among across the
      // three classes (ions → R2-delete; group b → delete; group c →
      // delete + optional preceding e, all RV-limited) ----------------------
      if (!removed2a) {
        val before2b = sb.length
        val best = longestFittingRV(Array("ions"), step2bRV, step2bE)
        if (best != null) {
          if (best == "ions") { if (inR2(4)) chop(4) }
          else if (step2bRV.contains(best)) chop(best.length)
          else {
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
      // RV-limited among: longest candidate fitting inside RV
      val res = longestFittingRV(Array("Ière", "ière", "Ier", "ier", "ion", "e", "ë"))
      if (res == "Ière" || res == "ière") { chop(4); sb.append("i") }
      else if (res == "Ier" || res == "ier") { chop(3); sb.append("i") }
      else if (res == "ion") {
        if (inR2(3) && sb.length >= 4 && sb.length - 4 >= rv &&
            (sb.charAt(sb.length - 4) == 's' || sb.charAt(sb.length - 4) == 't'))
          chop(3)
      } else if (res == "ë") {
        if (sb.length >= 3 &&
            sb.charAt(sb.length - 2) == 'u' && sb.charAt(sb.length - 3) == 'g') chop(1)
      } else if (res == "e") chop(1)
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
