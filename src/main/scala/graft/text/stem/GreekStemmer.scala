package graft.text.stem

/** Greek Snowball stemmer (Ntais/Saroukos algorithm as shipped in Snowball
  * and rust-stemmers v1.2.0 `Algorithm::Greek`, reference
  * `default_tokenizer.rs:~95`).
  *
  * Rebuilt (round 4) as the algorithm's true SEQUENTIAL step pipeline —
  * irregulars, the Ι-family special steps (ΙΖ/ΩΘΗΚ/ΙΣ/ΙΣΤ/ΙΣΜ/ΑΡΑΚ/
  * ΑΚ-ΙΤΣ/ΙΔΙ/ΙΣΚ), the nominal steps (ΑΔ/ΕΔ/ΟΥΔ/ΕΩ, ΙΑ, ΙΚ), the verbal
  * steps (ΑΜΕ/ΑΝΕ/ΕΤΕ/ΟΝΤΑΣ/ΟΜΑΣΤΕ/ΕΣΤΕ/ΗΚ/ΟΥΣ/ΑΓ/ΗΣ/ΗΣΤ/ΟΥΝ/ΟΥΜ), the
  * conditional generic-ending removal (gated on `test1`, i.e. only when no
  * structural step fired), and the comparative step — instead of the
  * round-3 single-pass longest-suffix approximation, which could not chain
  * suffixes (ΙΤΣΑ+ΑΓΕ, ΙΖΕΙΣ+ΙΑ, ...). Every exception-fragment list is
  * oracle-verified against the system libstemmer; whole-stem ("atlimit")
  * vs ends-with conditions follow the probe evidence.
  *
  * Under default normalization Greek script is transliterated to Latin
  * before stemming, making this a no-op there (as rust-stemmers is on
  * Latin input); it fires for `normalization(false)`.
  */
object GreekStemmer extends Stemmer {

  @inline private def isGreek(c: Char): Boolean = c >= 'α' && c <= 'ω' || c == 'ς'

  /** Prelude: strip tonos/dialytika accents and normalize final sigma. */
  @inline private def deaccent(c: Char): Char = c match {
    case 'ά' => 'α'; case 'έ' => 'ε'; case 'ή' => 'η'; case 'ί' => 'ι'
    case 'ό' => 'ο'; case 'ύ' => 'υ'; case 'ώ' => 'ω'
    case 'ϊ' | 'ΐ' => 'ι'; case 'ϋ' | 'ΰ' => 'υ'; case 'ς' => 'σ'
    case o => o
  }

  private val Vowels = "αεηιουω"

  def stem(word: String): String = {
    val folded = word.map(deaccent)
    if (folded.length < 3 || !folded.forall(c => isGreek(c) || !Character.isLetter(c)))
      return folded
    val sb = new StringBuilder(folded)
    var test1 = true

    def ends(s: String): Boolean = Snowball.endsWith(sb, s)
    def cut(sufs: Seq[String]): String = {
      var best: String = null
      var i = 0
      while (i < sufs.length) {
        val s = sufs(i)
        if ((best == null || s.length > best.length) && ends(s)) best = s
        i += 1
      }
      if (best != null) sb.setLength(sb.length - best.length)
      best
    }
    def whole(l: Seq[String]): Boolean = l.contains(sb.toString)
    def endAny(l: Seq[String]): Boolean = l.exists(ends)
    def vowelEnd: Boolean = sb.nonEmpty && Vowels.indexOf(sb.charAt(sb.length - 1)) >= 0

    // ---- step 1: irregular nouns — a backwards [substring] among, so the
    //      longest matching SUFFIX is replaced (…μφως → …μφω), not only the
    //      whole word
    locally {
      val w = sb.toString
      var bk: String = null
      Step1.keysIterator.foreach { k =>
        if (w.endsWith(k) && (bk == null || k.length > bk.length)) bk = k
      }
      if (bk != null) {
        sb.setLength(sb.length - bk.length); sb.append(Step1(bk)); test1 = false
      }
    }

    // ---- ΙΖ verbs: ιζα/ιζες/ιζε/ιζαμε/ιζατε/ιζαν/ιζανε/ιζω/ιζεις/ιζει/
    //      ιζουμε/ιζετε/ιζουν
    if (cut(Seq("ιζα", "ιζεσ", "ιζε", "ιζαμε", "ιζατε", "ιζαν", "ιζανε",
                "ιζω", "ιζεισ", "ιζει", "ιζουμε", "ιζετε", "ιζουν", "ιζουνε")) != null) {
      test1 = false
      if (whole(Seq("αναμπα", "εμπα", "επα", "ξαναπα", "πα", "περιπα",
                    "αθρο", "συναθρο", "δανε"))) sb.append("ι")
      else if (whole(Seq("μαρκ", "κορν", "αμπαρ", "αρρ", "βαθυρι", "βαρκ",
                         "β", "βολβορ", "γκρ", "γλυκορ", "γλυκυρ", "ιμπ",
                         "λ", "λου", "μαρ", "μ", "πρ", "μπρ", "πολυρ", "π",
                         "ρ", "πιπερορ"))) sb.append("ιζ")
    }

    // ---- ΩΘΗΚ passives
    if (cut(Seq("ωθηκα", "ωθηκεσ", "ωθηκε", "ωθηκαμε", "ωθηκατε", "ωθηκαν",
                "ωθηκανε")) != null) {
      test1 = false
      if (whole(Seq("αλ", "βι", "εν", "υψ", "λι", "ζω", "σ", "χ"))) sb.append("ων")
    }

    // ---- ΙΣ aorists (ισα/ισες/ισε/...)
    if (cut(Seq("ισα", "ισεσ", "ισε", "ισαμε", "ισατε", "ισαν", "ισανε")) != null) {
      test1 = false
      if (whole(Seq("αναμπα", "αθρο", "εμπα", "εσε", "εσωκλε", "επα",
                    "ξαναπα", "επε", "περιπα", "συναθρο", "δανε", "κλε",
                    "χαρτοπα", "εξαρχα", "μετεπε", "αποκλε", "απεκλε",
                    "εκλε", "πε"))) sb.append("ι")
      else if (whole(Seq("αν", "αφ", "γε", "γιγαντοαφ", "γκε", "δημοκρατ",
                         "κομ", "γκ", "μ", "π", "πουκαμ", "ολο", "λαρ"))) sb.append("ισ")
    }

    // ---- ΙΣ futures/presents (ισω/ισεις/...)
    if (cut(Seq("ισω", "ισεισ", "ισει", "ισουμε", "ισετε", "ισουν", "ισουνε")) != null) {
      test1 = false
      if (whole(Seq("αναμπα", "αθρο", "εμπα", "εσε", "εσωκλε", "επα",
                    "ξαναπα", "επε", "περιπα", "συναθρο", "δανε", "κλε",
                    "χαρτοπα", "εξαρχα", "μετεπε", "αποκλε", "απεκλε",
                    "εκλε", "πε"))) sb.append("ι")
    }

    // ---- ΙΣΤ adjectives (oracle: κλειστοι → κλειστ, πλειστοι → πλει,
    //      δανειστης → δανει; all other probed stems plain-delete)
    if (cut(Seq("ιστε")) != null) { // oracle: κλειστε → κλει (unlike ιστοι!)
      test1 = false
      if (whole(Seq("κλε", "δανε", "σε", "ασε", "εσωκλε", "συναθρο", "πλε")))
        sb.append("ι")
    } else if (cut(Seq("ιστοσ", "ιστου", "ιστο", "ιστα", "ιστοι", "ιστων",
                "ιστουσ", "ιστη", "ιστησ", "ιστεσ")) != null) {
      test1 = false
      if (whole(Seq("κλε"))) sb.append("ιστ")
      else if (whole(Seq("δανε", "σε", "ασε", "εσωκλε", "συναθρο", "πλε")))
        sb.append("ι")
    }

    // ---- ΙΣΜ nominalizations (oracle: σεισμος → σεισμ, αποκλεισμος →
    //      αποκλεισμ, δανεισμος → δανει, γνωστικισμος → γνωστ)
    if (cut(Seq("ισμο", "ισμοι", "ισμοσ", "ισμου", "ισμουσ", "ισμων")) != null) {
      test1 = false
      if (whole(Seq("σε", "αποκλε", "μεταμφιε"))) sb.append("ισμ")
      else if (whole(Seq("δανε"))) sb.append("ι")
      else if (whole(Seq("αγνωστικ", "ατομικ", "γνωστικ", "εθνικ",
                         "εκλεκτικ", "σκεπτικ", "τοπικ")) && ends("ικ"))
        sb.setLength(sb.length - 2)
    }

    // ---- ΑΡΑΚ diminutives
    if (cut(Seq("αρακι", "αρακια", "ουδακι", "ουδακια")) != null) {
      test1 = false
      if (whole(Seq("σ"))) sb.append("αρακ")
    }

    // ---- ΑΚ / ΙΤΣ diminutives: the re-add lists apply regardless of
    //      which of the two suffix families was removed (oracle: ζακι →
    //      ζιτσ, κιτσα → κακ, φιτσα → φακ)
    if (cut(Seq("ακι", "ακια", "ιτσα", "ιτσασ", "ιτσεσ", "ιτσων")) != null) {
      test1 = false
      if (whole(Seq("ανθρ", "βαμβ", "βρ", "καιμ", "κον", "κορ", "λαβρ",
                    "λουλ", "μερ", "μουστ", "ναγκασ", "πλ", "ρ", "ρυ",
                    "σ", "σκ", "σοκ", "σπαν", "τζ", "φαρμ", "χ", "κ", "φ",
                    "καπακ", "αλισφ", "αμβρ"))) sb.append("ακ")
      else if (whole(Seq("β", "ζ", "π"))) sb.append("ιτσ")
    }

    // ---- ΙΔΙ (re-add ιδ after a stem-final ε — πουγειδια → πουγειδ —
    //      or for the listed whole stems)
    if (cut(Seq("ιδιο", "ιδια", "ιδιων")) != null) {
      test1 = false
      if (ends("ε") || whole(Seq("αιφν", "ιρ", "ολο", "ψαλ"))) sb.append("ιδ")
    }

    // ---- ΙΣΚ (whole-stem re-adds only: δισκος → δισκ but χρισκος → χρ)
    if (cut(Seq("ισκοσ", "ισκου", "ισκο", "ισκε")) != null) {
      test1 = false
      if (whole(Seq("δ", "ιβ", "μην", "ρ", "φραγκ", "λυκ", "οβελ")))
        sb.append("ισκ")
    }

    // ---- ΑΔ / ΕΔ / ΟΥΔ plurals: these do NOT gate the generic ending
    //      step (oracle: πουγαουδες → πουγ — the trailing vowel still goes)
    if (cut(Seq("αδεσ", "αδων")) != null) {
      if (!endAny(Seq("οκ", "μαμ", "μαν", "μπαμπ", "πατερ", "γιαγι",
                      "νταντ", "κυρ", "θει", "πεθερ"))) sb.append("αδ")
    }

    if (cut(Seq("εδεσ", "εδων")) != null) {
      if (endAny(Seq("οπ", "ιπ", "εμπ", "υπ", "γηπ", "δαπ", "κρασπ", "μιλ")))
        sb.append("εδ")
    }

    if (cut(Seq("ουδεσ", "ουδων")) != null) {
      if (endAny(Seq("αρκ", "καλιακ", "πεταλ", "λιχ", "πλεξ", "σκ", "σ",
                     "φλ", "φρ", "βελ", "λουλ", "χν", "σπ", "τραγ", "φε")))
        sb.append("ουδ")
    }

    // ---- ΕΩΣ/ΕΩΝ
    if (cut(Seq("εωσ", "εων")) != null) {
      test1 = false
      if (whole(Seq("θ", "δ", "ελ", "γαλ", "ν", "π", "ιδ", "παρ"))) sb.append("ε")
    }

    // ---- ΙΑ/ΙΟΥ/ΙΩΝ (re-add ι after a vowel)
    if (cut(Seq("ια", "ιου", "ιων")) != null) {
      test1 = false
      if (vowelEnd) sb.append("ι")
    }

    // ---- ΙΚ adjectives (re-add ικ after a vowel or for listed stems)
    if (cut(Seq("ικα", "ικο", "ικου", "ικων")) != null) {
      test1 = false
      if (vowelEnd || whole(Seq("αλ", "αδ", "ενδ", "αμαν", "αμμοχαλ", "ηθ",
                                "ανηθ", "αντιδ", "φυσ", "βρωμ", "γερ",
                                "εξωδ", "καλπ", "καλλιν", "καταδ", "μουλ",
                                "μπαν", "μπαγιατ", "μπολ", "μποσ", "νιτ",
                                "ξικ", "συνομηλ", "πετσ", "πιτσ", "πικαντ",
                                "πλιατσ", "ποστελν", "πρωτοδ", "σερτ",
                                "συναδ", "τσαμ", "υποδ", "φιλον", "φυλοδ",
                                "χασ"))) sb.append("ικ")
    }

    // ---- verbal steps ------------------------------------------------
    // 5a: ΑΜΕ family
    if (sb.toString == "αγαμε") { sb.setLength(4); test1 = false } // αγαμ
    else {
      if (cut(Seq("αγαμε", "ησαμε", "ουσαμε", "ηκαμε", "ηθηκαμε")) != null)
        test1 = false
      if (ends("αμε")) {
        sb.setLength(sb.length - 3); test1 = false
        if (whole(Seq("αναπ", "αποθ", "αποκ", "αποστ", "βουβ", "ξεθ", "ουλ",
                      "πεθ", "πικρ", "ποτ", "σιχ", "χ"))) sb.append("αμ")
      }
    }

    // The ΑΝΕ/ΕΤΕ re-adds mirror libstemmer's observed semantics exactly,
    // including its whole-stem-plus-trailing-vowel DOUBLING (oracle:
    // ουλαανε → ουλαναν, αβαραετε → αβαρετετ — the trailing vowel is
    // replaced by the re-add string and the string appended again).
    def readdV2(re: String, atlimit: Seq[String], frags: Seq[String]): Unit = {
      val v2End = sb.nonEmpty && {
        val c = sb.charAt(sb.length - 1)
        c != 'υ' && Vowels.indexOf(c) >= 0
      }
      if (v2End && atlimit.contains(sb.substring(0, sb.length - 1))) {
        sb.setLength(sb.length - 1); sb.append(re); sb.append(re)
      } else if (v2End || whole(atlimit) || frags.exists(ends)) sb.append(re)
    }

    // 5b: ΑΝΕ family
    locally {
      if (cut(Seq("αγανε", "ησανε", "ουσανε", "ιοντανε", "ιοτανε",
                  "ιουντανε", "οντανε", "οτανε", "ουντανε", "ηθηκανε",
                  "ηκανε")) != null) {
        test1 = false
        if (endAny(Seq("τρ", "τσ"))) sb.append("αγαν")
      }
      if (ends("ανε")) {
        sb.setLength(sb.length - 3); test1 = false
        readdV2("αν", Seq("βετερ", "βουλκ", "βραχμ", "γ", "δραδουμ", "θ",
                "καλπουζ", "καστελ", "κορμορ", "λαοπλ", "μωαμεθ", "μ",
                "μουσουλμ", "ν", "ουλ", "π", "πελεκ", "πλ", "πολισ",
                "πορτολ", "σαρακατσ", "σουλτ", "τσαρλατ", "ορφ", "τσιγγ",
                "τσοπ", "φωτοστεφ", "χ", "ψυχοπλ", "γαλ", "γερ", "δεκ",
                "διπλ", "αμερικαν", "ουρ", "πιθ", "πουριτ", "σ", "ζωντ",
                "ικ", "καστ", "κοπ", "λιχ", "λουθηρ", "μαιντ", "μελ",
                "σιγ", "σπ", "στεγ", "τραγ", "τσαγ", "φ", "ερ"), Seq.empty)
      }
    }

    // 5c: ΕΤΕ family (ΗΣΕΤΕ plain-deletes with no re-add)
    locally {
      if (cut(Seq("ησετε")) != null) test1 = false
      if (ends("ετε")) {
        sb.setLength(sb.length - 3); test1 = false
        readdV2("ετ",
          Seq("αβαρ", "βεν", "εναρ", "αβρ", "αδ", "αθ", "αν", "απλ",
              "βαρον", "ντρ", "σκ", "κοπ", "μπορ", "νιφ", "παγ", "δ", "θ",
              "παρακαλ", "ευρ", "υ", "εμ", "θαρρ"),
          Seq("οδ", "αιρ", "φορ", "ταθ", "διαθ", "σχ", "ενδ", "ευρ",
              "τιθ", "υπερθ", "ραθ", "ενθ", "ροθ", "σθ", "πυρ", "αιν",
              "συνδ", "συν", "συνθ", "χωρ", "πον", "βρ", "καθ", "ευθ",
              "εκθ", "νετ", "ρον", "αρκ", "βαρ", "βολ", "ωφελ"))
      }
    }

    // 5d: ΟΝΤΑΣ/ΩΝΤΑΣ
    locally {
      val c = cut(Seq("οντασ", "ωντασ"))
      if (c != null) {
        test1 = false
        if (sb.toString == "αρχ") sb.append("οντ")
        else if (ends("κρε")) sb.append("ωντ")
      }
    }

    // 5e: ΟΜΑΣΤΕ/ΙΟΜΑΣΤΕ
    if (cut(Seq("ομαστε", "ιομαστε")) != null) {
      test1 = false
      if (sb.toString == "ον") sb.append("ομαστ")
    }

    // 5f: ΙΕΣΤΕ then ΕΣΤΕ — sequential, both may fire (oracle:
    //     δεστειεστε → δ)
    locally {
      if (ends("ιεστε")) {
        sb.setLength(sb.length - 5); test1 = false
        if (whole(Seq("π", "απ", "συμπ", "ασυμπ", "ακαταπ", "αμεταμφ")))
          sb.append("ιεστ")
      }
      if (ends("εστε")) {
        sb.setLength(sb.length - 4); test1 = false
        if (whole(Seq("αλ", "αρ", "εκτελ", "ζ", "μ", "ξ", "παρακαλ", "προ", "νισ")))
          sb.append("εστ")
      }
    }

    // 5g: ΗΘΗΚ / ΗΚ pasts
    locally {
      if (cut(Seq("ηθηκα", "ηθηκεσ", "ηθηκε")) != null) test1 = false
      val c = cut(Seq("ηκα", "ηκεσ", "ηκε"))
      if (c != null) {
        test1 = false
        if (endAny(Seq("σκωλ", "σκουλ", "ναρθ", "σφ", "οθ", "πιθ")) ||
            whole(Seq("διαθ", "θ", "παρακαταθ", "προσθ", "συνθ"))) sb.append("ηκ")
      }
    }

    // 5h: ΟΥΣΑ imperfects
    if (cut(Seq("ουσα", "ουσεσ", "ουσε")) != null) {
      test1 = false
      if (endAny(Seq("ποδαρ", "βλεπ", "πανταχ", "φρυδ", "μαντιλ", "μαλλ",
                     "κυματ", "λαχ", "ληγ", "φαγ", "ομ", "πρωτ")) ||
          whole(Seq("φαρμακ", "χαδ", "αγκ", "αναρρ", "βρομ", "εκλιπ",
                    "λαμπιδ", "λεχ", "μ", "πατ", "ρ", "λ", "μεδ", "μεσαζ",
                    "υποτειν", "αμ", "αιθ", "ανηκ", "δεσποζ", "ενδιαφερ",
                    "δε", "δευτερευ", "καθαρευ", "πλε", "τσα"))) sb.append("ουσ")
    }

    // 5i: ΑΓ aorists
    if (cut(Seq("αγα", "αγεσ", "αγε")) != null) {
      test1 = false
      if (ends("κολλ")) sb.append("αγ")
      else if (!whole(Seq("ψοφ", "ναυλοχ")) &&
               (endAny(Seq("οφ", "πελ", "χορτ", "λλ", "σφ", "ρπ", "φρ",
                           "πρ", "λοχ", "σμην")) ||
                whole(Seq("αβαστ", "πολυφ", "αδηφ", "παμφ", "ρ", "ασπ",
                          "αφ", "αμαλ", "αμαλλι", "ανυστ", "απερ", "ασπαρ",
                          "αχαρ", "δερβεν", "δροσοπ", "ξεφ", "νεοπ",
                          "νομοτ", "ολοπ", "ομοτ", "προστ", "προσωποπ",
                          "συμπ", "συντ", "τ", "υποτ", "χαρ", "αειπ",
                          "αιμοστ", "ανυπ", "αποτ", "αρτιπ", "διατ", "εν",
                          "επιτ", "κροκαλοπ", "σιδηροπ", "λ", "ναυ",
                          "ουλαμ", "ουρ", "π", "τρ", "μ")))) sb.append("αγ")
    }

    // 5j: ΗΣΕ/ΗΣΟΥ/ΗΣΑ
    if (cut(Seq("ησε", "ησου", "ησα")) != null) {
      test1 = false
      if (whole(Seq("ν", "χερσον", "δωδεκαν", "ερημον", "μεγαλον", "επταν")))
        sb.append("ησ")
    }

    // 5k: ΗΣΤΕ
    if (ends("ηστε")) {
      sb.setLength(sb.length - 4); test1 = false
      if (endAny(Seq("ασβ", "σβ", "αχρ", "χρ", "απλ", "αειμν", "δυσχρ",
                     "ευχρ", "κοινοχρ", "παλιμψ"))) sb.append("ηστ")
    }

    // 5l: ΟΥΝΕ family
    if (cut(Seq("ουνε", "ησουνε", "ηθουνε")) != null) {
      test1 = false
      if (whole(Seq("ν", "ρ", "σπι", "στραβομουτσ", "κακομουτσ", "εξων")))
        sb.append("ουν")
    }

    // 5m: ΟΥΜΕ family
    if (cut(Seq("ουμε", "ησουμε", "ηθουμε")) != null) {
      test1 = false
      if (whole(Seq("παρασουσ", "φ", "χ", "ωριοπλ", "αζ", "αλλοσουσ", "ασουσ")))
        sb.append("ουμ")
    }

    // ---- step 6: ΜΑΤ nouns, then the generic ending (only if no
    //      structural step fired — `test1` still set)
    locally {
      if (cut(Seq("ματα", "ματων", "ματοσ")) != null) sb.append("μα")
      if (test1) cut(Step6Endings)
    }

    // ---- step 7: comparatives / superlatives
    cut(Seq("εστερ", "εστατ", "οτερ", "οτατ", "υτερ", "υτατ", "ωτερ", "ωτατ"))

    sb.toString
  }

  /** Irregular stems (step 1 of the published algorithm). */
  private val Step1: Map[String, String] = Map(
    "φαγια" -> "φα", "φαγιου" -> "φα", "φαγιων" -> "φα",  // suffix-matched
    "σκαγια" -> "σκα", "σκαγιου" -> "σκα", "σκαγιων" -> "σκα",
    "ολογιου" -> "ολο", "ολογια" -> "ολο", "ολογιων" -> "ολο",
    "σογιου" -> "σο", "σογια" -> "σο", "σογιων" -> "σο",
    "τατογια" -> "τατο", "τατογιου" -> "τατο", "τατογιων" -> "τατο",
    "κρεασ" -> "κρε", "κρεατοσ" -> "κρε", "κρεατα" -> "κρε", "κρεατων" -> "κρε",
    "περασ" -> "περ", "περατοσ" -> "περ", "περατα" -> "περ", "περατων" -> "περ",
    "τερασ" -> "τερ", "τερατοσ" -> "τερ", "τερατα" -> "τερ", "τερατων" -> "τερ",
    "φωσ" -> "φω", "φωτοσ" -> "φω", "φωτα" -> "φω", "φωτων" -> "φω",
    "καθεστωσ" -> "καθεστ", "καθεστωτοσ" -> "καθεστ",
    "καθεστωτα" -> "καθεστ", "καθεστωτων" -> "καθεστ",
    "γεγονοσ" -> "γεγον", "γεγονοτοσ" -> "γεγον",
    "γεγονοτα" -> "γεγον", "γεγονοτων" -> "γεγον")

  /** The generic inflectional endings removed only when `test1` holds. */
  private val Step6Endings: Seq[String] = Seq(
    "α", "αγατε", "αγαν", "αει", "αμαι", "αν", "ασ", "ασαι", "αται", "αω",
    "ε", "ει", "εισ", "ειτε", "εσαι", "εσ", "εται", "ι", "ιεμαι",
    "ιεμαστε", "ιεται", "ιεσαι", "ιεσαστε", "ιομασταν", "ιομουν",
    "ιομουνα", "ιονταν", "ιοντουσαν", "ιοσασταν", "ιοσαστε", "ιοσουν",
    "ιοσουνα", "ιοταν", "ιουμα", "ιουμαστε", "ιουνται", "ιουνταν", "η",
    "ηδεσ", "ηδων", "ηθει", "ηθεισ", "ηθειτε", "ηθηκατε", "ηθηκαν",
    "ηθουν", "ηθω", "ηκατε", "ηκαν", "ησ", "ησαν", "ησατε", "ησει",
    "ησεσ", "ησουν", "ησω", "ο", "οι", "ομουν", "ονται", "ονταν",
    "οντουσαν", "οσ", "οσασταν", "οσαστε", "οσουν", "οταν", "ου", "ουμαι",
    "ουμαστε", "ουν", "ουνται", "ουνταν", "ουσ", "ουσαν", "ουσατε", "υ",
    "υσ", "ω", "ων", "ομασταν", "ομαι",
    "αγα", "αγε", "αγεσ", "εστε", "εων", "ηθηκα", "ηθηκε", "ηθουνε",
    "ηκα", "ηκε", "ηκεσ", "ησα", "ησε", "ησουνε", "ηστε", "ια",
    "ιομαστε", "ιου", "ισουν", "ιων", "ομαστε", "ομουνα", "οσουνα",
    "ουνε")
}
