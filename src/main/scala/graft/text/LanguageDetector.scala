package graft.text

/** Language detection for `LanguageMode::Detect`
  * (`/root/reference/src/default_tokenizer.rs:42-54`, `:262-301`).
  *
  * The reference feature-gates detection behind the whichlang crate (a
  * trained feature-hash classifier whose weight tables are not
  * reconstructible offline), so this is a DOCUMENTED DIVERGENCE: the same
  * API surface backed by a deterministic two-stage classifier —
  *
  *   1. script detection for the non-Latin languages the reference
  *      supports (Cyrillic → Russian, Greek → Greek, Arabic → Arabic,
  *      Tamil → Tamil);
  *   2. for Latin script, full vendored-NLTK-stopword hit counting across
  *      the 13 Latin-script languages, first-maximum-wins in a fixed
  *      priority order; no hits → None (treated like whichlang's
  *      unsupported languages: tokenize without stemming/stopwords,
  *      `default_tokenizer.rs:73-80`).
  *
  * The rule is intentionally simple enough to restate in SQL — the driver
  * oracle for `textq_langid` re-implements it verbatim in DuckDB.
  */
object LanguageDetector extends Serializable {

  /** Latin-script candidates in tie-break priority order. */
  val latinOrder: Seq[Language] = Seq(
    Language.English, Language.German, Language.French, Language.Spanish,
    Language.Italian, Language.Portuguese, Language.Dutch, Language.Danish,
    Language.Norwegian, Language.Swedish, Language.Romanian,
    Language.Hungarian, Language.Turkish)

  @inline private def inRange(c: Char, lo: Int, hi: Int): Boolean = c >= lo && c <= hi

  /** ISO-639-1-style short codes (whichlang's `DetectedLanguage` naming). */
  val shortCode: Map[Language, String] = Map(
    Language.English -> "en", Language.German -> "de", Language.French -> "fr",
    Language.Spanish -> "es", Language.Italian -> "it",
    Language.Portuguese -> "pt", Language.Dutch -> "nl",
    Language.Danish -> "da", Language.Norwegian -> "no",
    Language.Swedish -> "sv", Language.Romanian -> "ro",
    Language.Hungarian -> "hu", Language.Turkish -> "tr",
    Language.Russian -> "ru", Language.Greek -> "el",
    Language.Arabic -> "ar", Language.Tamil -> "ta")

  def detect(text: String): Option[Language] = {
    // fixed script priority (not first-occurrence) so the SQL oracle's CASE
    // chain is exactly equivalent
    if (text.exists(inRange(_, 0x0400, 0x04FF))) return Some(Language.Russian)
    if (text.exists(inRange(_, 0x0370, 0x03FF))) return Some(Language.Greek)
    if (text.exists(inRange(_, 0x0600, 0x06FF))) return Some(Language.Arabic)
    if (text.exists(inRange(_, 0x0B80, 0x0BFF))) return Some(Language.Tamil)
    // Latin script: whitespace-split lowercased words vs the NLTK lists
    val words = text.toLowerCase(java.util.Locale.ROOT).split(' ')
    var best: Language = null
    var bestHits = 0
    latinOrder.foreach { lang =>
      val set = Stopwords.forLanguage(lang)
      var hits = 0
      var w = 0
      while (w < words.length) {
        if (words(w).nonEmpty && set.contains(words(w))) hits += 1
        w += 1
      }
      if (hits > bestHits) { best = lang; bestHits = hits } // first max wins
    }
    Option(best)
  }
}

/** `LanguageMode::Detect` tokenizer: detects the language of each input
  * text, then tokenizes with that language's stopwords + stemmer;
  * undetected text tokenizes with stemming and stopwords disabled —
  * mirroring the reference's treatment of whichlang's unsupported
  * languages (`default_tokenizer.rs:73-80`, `:293-301`).
  */
final class DetectTokenizer(
    val normalization: Boolean = true,
    val stopwords: Boolean = true,
    val stemming: Boolean = true
) extends TextTokenizer {

  private val perLanguage: Map[Language, Bm25Tokenizer] =
    Language.all.map(l => l -> Bm25Tokenizer(l, normalization, stopwords, stemming)).toMap
  private val fallback = Bm25Tokenizer(Language.English, normalization,
    stopwords = false, stemming = false)

  def tokenize(text: String): Array[String] =
    LanguageDetector.detect(text) match {
      case Some(lang) => perLanguage(lang).tokenize(text)
      case None       => fallback.tokenize(text)
    }
}
