package graft.text.stem

/** Portuguese Snowball stemmer, implemented from the published algorithm
  * (snowballstem.org/algorithms/portuguese/stemmer.html; rust-stemmers
  * v1.2.0 `Algorithm::Portuguese`, selected by the reference at
  * `/root/reference/src/default_tokenizer.rs:98`).
  *
  * The ã/õ nasal vowels are handled via the algorithm's a~/o~ two-character
  * markers so suffix tests see only one-char vowels.
  */
object PortugueseStemmer extends Stemmer {
  import Snowball._

  @inline private def isV(c: Char): Boolean =
    c == 'a' || c == 'e' || c == 'i' || c == 'o' || c == 'u' ||
    c == 'á' || c == 'é' || c == 'í' || c == 'ó' || c == 'ú' ||
    c == 'â' || c == 'ê' || c == 'ô'

  private val step2 = Array(
    "aríamos", "eríamos", "iríamos", "ássemos", "êssemos", "íssemos",
    "aríeis", "eríeis", "iríeis", "ásseis", "ésseis", "ísseis", "áramos",
    "éramos", "íramos", "ávamos", "aremos", "eremos", "iremos", "ariam",
    "eriam", "iriam", "assem", "essem", "issem", "arias", "erias",
    "irias", "ardes", "erdes", "irdes", "asses", "esses", "isses",
    "astes", "estes", "istes", "áreis", "areis", "éreis", "ereis",
    "íreis", "ireis", "áveis", "íamos", "armos", "ermos", "irmos",
    "aria", "eria", "iria", "asse", "esse", "isse", "aste", "este",
    "iste", "arei", "erei", "irei", "aram", "eram", "iram", "avam",
    "arem", "erem", "irem", "ando", "endo", "indo", "adas", "idas",
    "ara~o", "era~o", "ira~o", // future 3pl (ã as the a~ marker)
    "arás", "aras", "erás", "eras", "irás", "avas", "ares", "eres",
    "ires", "íeis", "ados", "idos", "ámos", "amos", "emos", "imos",
    "iras", "ada", "ida", "ará", "ara", "erá", "era", "irá", "ava",
    "iam", "ado", "ido", "ias", "ais", "eis", "ira", "ia", "ei", "am",
    "em", "ar", "er", "ir", "as", "es", "is", "eu", "iu", "ou")

  def stem(word: String): String = {
    if (word.length < 2)
      return if (word == "ç") "c" else word // final-ç → c applies unconditionally
    // prelude: ã → a~, õ → o~
    val sb = new StringBuilder(word.length + 2)
    var i = 0
    while (i < word.length) {
      word.charAt(i) match {
        case 'ã' => sb.append("a~")
        case 'õ' => sb.append("o~")
        case c   => sb.append(c)
      }
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

    // ---- step 1: standard suffixes ---------------------------------------
    val lenBefore1 = sb.length
    if (ends("amente")) {
      if (inR1(6)) {
        chop(6)
        if (ends("iv") && inR2(2)) {
          chop(2)
          if (ends("at") && inR2(2)) chop(2)
        } else if ((ends("os") || ends("ic") || ends("ad")) && inR2(2)) chop(2)
      }
    } else if (ends("logias") || ends("logia")) {
      val n = if (ends("logias")) 6 else 5
      if (inR2(n)) { chop(n); sb.append("log") }
    } else if (ends("uço~es") || ends("uça~o")) {
      if (inR2(5)) { chop(5); sb.append("u") }
    } else if (ends("ências") || ends("ência")) {
      val n = if (ends("ências")) 6 else 5
      if (inR2(n)) { chop(n); sb.append("ente") }
    } else if (ends("idades") || ends("idade")) {
      val n = if (ends("idades")) 6 else 5
      if (inR2(n)) {
        chop(n)
        if (ends("abil") && inR2(4)) chop(4)
        else if ((ends("ic") || ends("iv")) && inR2(2)) chop(2)
      }
    } else if (ends("mente")) {
      if (inR2(5)) {
        chop(5)
        if (ends("ante") && inR2(4)) chop(4)
        else if (ends("avel") && inR2(4)) chop(4)
        else if (ends("ível") && inR2(4)) chop(4)
      }
    } else if (ends("ivas") || ends("ivos") || ends("iva") || ends("ivo")) {
      val n = if (ends("ivas") || ends("ivos")) 4 else 3
      if (inR2(n)) {
        chop(n)
        if (ends("at") && inR2(2)) chop(2)
      }
    } else if (ends("eiras") || ends("eira")) {
      // ira/iras preceded by e → replace with ir, if in RV
      val n = if (ends("eiras")) 4 else 3 // the ira(s) part
      if (sb.length - n >= rv) { chop(n); sb.append("ir") }
    } else {
      val g = Array("amentos", "imentos", "aço~es", "amento", "imento",
        "adoras", "adores", "ância", "antes", "adora", "aça~o", "ezas",
        "icos", "icas", "ismos", "áveis", "íveis", "istas", "osos",
        "osas", "eza", "ico", "ica", "ismo", "ável", "ível", "ista",
        "oso", "osa", "ador", "ante").sortBy(-_.length)
      var j = 0
      var found = false
      while (!found && j < g.length) {
        if (ends(g(j))) {
          if (inR2(g(j).length)) {
            chop(g(j).length)
            if ((g(j).startsWith("ador") || g(j).startsWith("aça") ||
                 g(j).startsWith("aço") || g(j).startsWith("ante") ||
                 g(j).startsWith("ânc")) && ends("ic") && inR2(2)) chop(2)
          }
          found = true
        }
        j += 1
      }
    }
    var removed = sb.length != lenBefore1

    // ---- step 2: verb suffixes (only if step 1 removed nothing) ----------
    // `setlimit tomark pV for ([substring] among(...))`: the longest
    // candidate whose whole match fits inside RV wins (suffixes crossing
    // the RV boundary are not considered — shorter ones still match)
    if (!removed) {
      var best: String = null
      var j = 0
      while (j < step2.length) {
        val s = step2(j)
        if ((best == null || s.length > best.length) && ends(s) && inRV(s.length)) best = s
        j += 1
      }
      if (best != null) { chop(best.length); removed = true }
    }

    // ---- step 3 (if 1 or 2 removed): delete i after c, in RV -------------
    if (removed) {
      if (ends("i") && inRV(1) && sb.length >= 2 && sb.charAt(sb.length - 2) == 'c')
        chop(1)
    } else {
      // ---- step 4 (residual suffix): os a i o á í ó, in RV ---------------
      if (ends("os")) { if (inRV(2)) chop(2) }
      else if (ends("a") || ends("i") || ends("o") || ends("á") ||
               ends("í") || ends("ó")) {
        if (inRV(1)) chop(1)
      }
    }

    // ---- step 5: final e/é/ê in RV; gu/ci undouble; ç → c ----------------
    if (ends("e") || ends("é") || ends("ê")) {
      if (inRV(1)) {
        chop(1)
        if ((ends("gu") || ends("ci")) && inRV(1)) chop(1)
      }
    } else if (ends("ç")) {
      sb.setCharAt(sb.length - 1, 'c')
    }

    // postlude: restore nasal vowels
    val out = new StringBuilder(sb.length)
    i = 0
    while (i < sb.length) {
      val c = sb.charAt(i)
      if (i + 1 < sb.length && sb.charAt(i + 1) == '~' && (c == 'a' || c == 'o')) {
        out.append(if (c == 'a') 'ã' else 'õ')
        i += 2
      } else { out.append(c); i += 1 }
    }
    out.toString
  }
}
