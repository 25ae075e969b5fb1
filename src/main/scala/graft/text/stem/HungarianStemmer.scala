package graft.text.stem

/** Hungarian Snowball stemmer, implemented from the published algorithm
  * (snowballstem.org/algorithms/hungarian/stemmer.html; rust-stemmers
  * v1.2.0 `Algorithm::Hungarian`, reference `default_tokenizer.rs:95`).
  * Validated against the system libstemmer on generated probe vocabularies
  * (scripts/stem_parity.sh; golden vectors in StemGoldenSpec).
  *
  * Each step is one `[substring] R1 among(...)`: longest match overall,
  * then the R1 test — a failed test does NOT fall back to a shorter
  * suffix. The nine steps run in sequence (instrumental, case, special
  * cases, other cases, factive, owned, singular owner, plural owner,
  * plural), so several suffixes can strip from one word.
  */
object HungarianStemmer extends Stemmer {
  import Snowball._

  @inline private def isV(c: Char): Boolean =
    c == 'a' || c == 'á' || c == 'e' || c == 'é' || c == 'i' || c == 'í' ||
    c == 'o' || c == 'ó' || c == 'ö' || c == 'ő' || c == 'u' || c == 'ú' ||
    c == 'ü' || c == 'ű'

  private val digraphs = Array("dzs", "cs", "dz", "gy", "ly", "ny", "sz", "ty", "zs")

  /** mark_regions: vowel start → after the first non-vowel (consuming a
    * whole digraph); consonant start → after the first vowel.
    */
  private def r1Of(sb: StringBuilder): Int = {
    if (sb.isEmpty) return 0
    if (isV(sb.charAt(0))) {
      var i = 1
      while (i < sb.length) {
        if (!isV(sb.charAt(i))) {
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

  // doubled consonants incl. doubled digraphs (bb cc ccs dd ff gg ggy jj kk
  // ll lly mm nn nny pp rr ss ssz tt tty vv zz zzs)
  private val doubles = Array("ccs", "ggy", "lly", "nny", "ssz", "tty", "zzs",
    "bb", "cc", "dd", "ff", "gg", "jj", "kk", "ll", "mm", "nn", "pp", "rr",
    "ss", "tt", "vv", "zz").sortBy(-_.length)

  private def endsDouble(sb: StringBuilder): Boolean = {
    var d = 0
    while (d < doubles.length) {
      if (endsWith(sb, doubles(d))) return true
      d += 1
    }
    false
  }

  /** `undouble`: delete the second-to-last character ("ssz" → "sz",
    * "tt" → "t") — the generated code's `next [hop 1] delete`.
    */
  private def undouble(sb: StringBuilder): Unit =
    if (sb.length >= 2) { sb.deleteCharAt(sb.length - 2): Unit }

  /** One `[substring] R1 among(...)` step: longest match over `table`
    * (suffix → replacement, null = delete), R1-tested, no fallback.
    */
  private def amongStep(sb: StringBuilder, p1: Int,
                        table: Array[(String, String)]): Boolean = {
    var best: (String, String) = null
    var i = 0
    while (i < table.length) {
      val t = table(i)
      if ((best == null || t._1.length > best._1.length) && endsWith(sb, t._1))
        best = t
      i += 1
    }
    if (best == null) return false
    if (sb.length - best._1.length < p1) return false
    sb.setLength(sb.length - best._1.length)
    if (best._2 != null) sb.append(best._2)
    true
  }

  private val D: String = null // delete marker

  // step 2 (case endings): delete, then final á→a / é→e (v_ending, R1)
  private val caseTable: Array[(String, String)] = Array(
    "ban", "ben", "ba", "be", "ra", "re", "nak", "nek", "val", "vel",
    "tól", "től", "ról", "ről", "ból", "ből", "hoz", "hez", "höz",
    "nál", "nél", "ig", "at", "et", "ot", "öt", "ért", "képp", "képpen",
    "kor", "ul", "ül", "vá", "vé", "onként", "enként", "anként", "ként",
    "en", "on", "an", "ön", "n", "t").map((_, D))

  private val caseSpecial: Array[(String, String)] = Array(
    ("ánként", "a"), ("án", "a"), ("én", "e"))

  private val caseOther: Array[(String, String)] = Array(
    ("astul", D), ("estül", D), ("ástul", "a"), ("éstül", "e"),
    ("stul", D), ("stül", D))

  // owned step (oracle-derived): longest-then-R1; the bare é/éi rules also
  // absorb a preceding a/e/o/é (delete) or á (→ a) when that char is in R1
  private val ownedTable: Array[(String, String)] = Array(
    ("oké", D), ("öké", D), ("aké", D), ("eké", D), ("áké", "a"),
    ("éké", "e"), ("ké", D), ("ééi", "e"), ("áéi", "a"), ("éé", "e"),
    ("éi", D), ("é", D))

  private val singOwner: Array[(String, String)] = Array(
    ("ünk", D), ("unk", D), ("ánk", "a"), ("énk", "e"), ("nk", D),
    ("ájuk", "a"), ("éjük", "e"), ("juk", D), ("jük", D), ("uk", D),
    ("ük", D), ("em", D), ("om", D), ("am", D), ("ám", "a"), ("ém", "e"),
    ("m", D), ("od", D), ("ed", D), ("ad", D), ("öd", D), ("ád", "a"),
    ("éd", "e"), ("d", D), ("ja", D), ("je", D), ("a", D), ("e", D),
    ("o", D), ("á", "a"), ("é", "e")) // reached only when `owned` failed

  private val plurOwner: Array[(String, String)] = Array(
    ("jaim", D), ("jeim", D), ("aim", D), ("eim", D), ("áim", "a"),
    ("éim", "e"), ("im", D), ("jaid", D), ("jeid", D), ("aid", D),
    ("eid", D), ("áid", "a"), ("éid", "e"), ("id", D), ("jai", D),
    ("jei", D), ("ai", D), ("ei", D), ("ái", "a"), ("éi", "e"), ("i", D),
    ("jaink", D), ("jeink", D), ("aink", D), ("eink", D), ("áink", "a"),
    ("éink", "e"), ("ink", D), ("jaitok", D), ("jeitek", D),
    ("aitok", D), ("eitek", D), ("áitok", "a"), ("éitek", "e"),
    ("itek", D), ("jeik", D), ("jaik", D), ("aik", D), ("eik", D),
    ("áik", "a"), ("éik", "e"), ("ik", D))

  private val pluralTable: Array[(String, String)] = Array(
    ("ák", "a"), ("ék", "e"), ("ök", D), ("ok", D), ("ek", D), ("ak", D),
    ("k", D))

  def stem(word: String): String = {
    if (word.length < 3) return word
    val sb = new StringBuilder(word)
    val p1 = r1Of(sb)
    def ends(s: String) = endsWith(sb, s)
    def chop(n: Int): Unit = sb.setLength(sb.length - n)

    // step 1 (instrumental): al/el in R1 after a doubled consonant →
    // delete + undouble
    if ((ends("al") || ends("el")) && sb.length - 2 >= p1) {
      val t = new StringBuilder(sb.substring(0, sb.length - 2))
      if (endsDouble(t)) { chop(2); undouble(sb) }
    }

    // step 2 (case) + v_ending
    if (amongStep(sb, p1, caseTable)) {
      if (ends("á") && sb.length - 1 >= p1) sb.setCharAt(sb.length - 1, 'a')
      else if (ends("é") && sb.length - 1 >= p1) sb.setCharAt(sb.length - 1, 'e')
    }

    // step 3 (case_special), step 4 (case_other)
    amongStep(sb, p1, caseSpecial)
    amongStep(sb, p1, caseOther)

    // step 5 (factive): á/é in R1 after a doubled consonant → delete +
    // undouble
    if ((ends("á") || ends("é")) && sb.length - 1 >= p1) {
      val t = new StringBuilder(sb.substring(0, sb.length - 1))
      if (endsDouble(t)) { chop(1); undouble(sb) }
    }

    // steps 6-9: (owned OR singular owner) — sing_owner is tried only when
    // the owned among fails (no match or R1 miss) — then plural owner, then
    // plural, each its own step
    amongStep(sb, p1, ownedTable)
    amongStep(sb, p1, singOwner) // runs after owned unconditionally (oracle: almajmé → almaj)
    amongStep(sb, p1, plurOwner)
    amongStep(sb, p1, pluralTable)

    sb.toString
  }
}
