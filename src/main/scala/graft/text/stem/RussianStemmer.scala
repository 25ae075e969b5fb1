package graft.text.stem

/** Russian Snowball stemmer, implemented from the published algorithm
  * (snowballstem.org/algorithms/russian/stemmer.html; rust-stemmers v1.2.0
  * `Algorithm::Russian`, selected by the reference at
  * `/root/reference/src/default_tokenizer.rs:100`).
  *
  * Operates on Cyrillic. Note that under the tokenizer's DEFAULT
  * normalization, Russian text is transliterated to ASCII before stemming,
  * so this stemmer is a no-op there (exactly as rust-stemmers is on ASCII
  * input); it fires for `normalization(false)` configurations.
  */
object RussianStemmer extends Stemmer {
  import Snowball._

  @inline private def isV(c: Char): Boolean =
    c == 'а' || c == 'е' || c == 'и' || c == 'о' || c == 'у' ||
    c == 'ы' || c == 'э' || c == 'ю' || c == 'я'

  // suffix groups (longest-first within each array)
  private val perfGerund1 = Array("вшись", "вши", "в") // require preceding а/я
  private val perfGerund2 = Array("ившись", "ывшись", "ивши", "ывши", "ив", "ыв")
  private val adjective = Array(
    "ими", "ыми", "его", "ого", "ему", "ому", "ее", "ие", "ые", "ое",
    "ей", "ий", "ый", "ой", "ем", "им", "ым", "ом", "их", "ых", "ую",
    "юю", "ая", "яя", "ою", "ею")
  private val participle1 = Array("ем", "нн", "вш", "ющ", "щ") // require а/я
  private val participle2 = Array("ивш", "ывш", "ующ")
  private val reflexive = Array("ся", "сь")
  private val verb1 = Array( // require preceding а/я
    "ешь", "нно", "ете", "йте", "ла", "на", "ли", "ем", "ло", "но",
    "ет", "ют", "ны", "ть", "й", "л", "н")
  private val verb2 = Array(
    "ейте", "уйте", "ила", "ыла", "ена", "ите", "или", "ыли", "ило",
    "ыло", "ено", "ует", "уют", "ены", "ить", "ыть", "ишь", "ей", "уй",
    "ил", "ыл", "им", "ым", "ен", "ят", "ит", "ыт", "ую", "ю")
  private val noun = Array(
    "иями", "ями", "ами", "ией", "иям", "ием", "иях", "ам", "ем", "ом",
    "ах", "ях", "ев", "ов", "ие", "ье", "еи", "ии", "ей", "ой", "ий",
    "ям", "ию", "ью", "ия", "ья", "а", "е", "и", "й", "о", "у", "ы",
    "ь", "ю", "я")

  def stem(word: String): String = {
    if (word.length < 2) return word
    val sb = new StringBuilder(word.length)
    var i = 0
    while (i < word.length) {
      val c = word.charAt(i)
      sb.append(if (c == 'ё') 'е' else c)
      i += 1
    }
    // RV: after the first vowel; R2 standard
    var rv = sb.length
    i = 0
    var seen = false
    while (i < sb.length && !seen) {
      if (isV(sb.charAt(i))) { rv = i + 1; seen = true }
      i += 1
    }
    val p1 = regionAfterVC(sb, 0, isV)
    val p2 = regionAfterVC(sb, p1, isV)
    def inRV(n: Int) = sb.length - n >= rv
    def inR2(n: Int) = sb.length - n >= p2
    def ends(s: String) = endsWith(sb, s)
    def chop(n: Int): Unit = sb.setLength(sb.length - n)

    /** match the longest suffix of `group` in RV; those in `needAYa` keep
      * the preceding а/я (which must be present) — returns true if removed.
      */
    def removeGroup(needAYa: Array[String], plain: Array[String]): Boolean = {
      // longest across both groups
      var best: String = null
      var bestAYa = false
      var j = 0
      while (j < plain.length) {
        if ((best == null || plain(j).length > best.length) && ends(plain(j)) &&
            inRV(plain(j).length)) { best = plain(j); bestAYa = false }
        j += 1
      }
      j = 0
      while (j < needAYa.length) {
        val s = needAYa(j)
        if ((best == null || s.length > best.length) && ends(s) &&
            sb.length > s.length && inRV(s.length) && {
              val p = sb.charAt(sb.length - s.length - 1)
              (p == 'а' || p == 'я') && sb.length - s.length - 1 >= rv
            }) { best = s; bestAYa = true }
        j += 1
      }
      val _ = bestAYa
      if (best != null) { chop(best.length); true } else false
    }

    // ---- step 1 ----------------------------------------------------------
    if (!removeGroup(perfGerund1, perfGerund2)) {
      // reflexive (optional)
      var j = 0
      var rfl = false
      while (!rfl && j < reflexive.length) {
        if (ends(reflexive(j)) && inRV(reflexive(j).length)) {
          chop(reflexive(j).length); rfl = true
        }
        j += 1
      }
      // adjectival | verb | noun (first that matches wins)
      val adjRemoved = {
        var bestA: String = null
        var k = 0
        while (k < adjective.length) {
          if ((bestA == null || adjective(k).length > bestA.length) &&
              ends(adjective(k)) && inRV(adjective(k).length)) bestA = adjective(k)
          k += 1
        }
        if (bestA != null) {
          chop(bestA.length)
          // optional preceding participle
          removeGroup(participle1, participle2): Unit
          true
        } else false
      }
      if (!adjRemoved) {
        if (!removeGroup(verb1, verb2)) {
          var bestN: String = null
          var k = 0
          while (k < noun.length) {
            if ((bestN == null || noun(k).length > bestN.length) &&
                ends(noun(k)) && inRV(noun(k).length)) bestN = noun(k)
            k += 1
          }
          if (bestN != null) chop(bestN.length)
        }
      }
    }

    // ---- step 2: final и -------------------------------------------------
    if (ends("и") && inRV(1)) chop(1)

    // ---- step 3: derivational ость/ост in R2 -----------------------------
    if (ends("ость") && inR2(4)) chop(4)
    else if (ends("ост") && inR2(3)) chop(3)

    // ---- step 4: superlative / double н / final ь ------------------------
    // every backward step runs under `setlimit tomark pV` in russian.sbl, so
    // the matched characters must lie inside RV (vowel-less words: RV empty)
    if (ends("нн") && inRV(2)) chop(1)
    else if (ends("ейше") || ends("ейш")) {
      if (inRV(if (ends("ейше")) 4 else 3)) {
        chop(if (ends("ейше")) 4 else 3)
        if (ends("нн") && inRV(2)) chop(1)
      }
    } else if (ends("ь") && inRV(1)) chop(1)

    sb.toString
  }
}
