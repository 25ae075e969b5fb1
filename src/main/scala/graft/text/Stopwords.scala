package graft.text

/** NLTK stopword lists, vendored to match the reference's stopword stage
  * (`/root/reference/src/default_tokenizer.rs:142-154`: stop-words crate
  * v0.9.0, `nltk` feature — `Cargo.toml:40`). Do NOT substitute MLlib's
  * `StopWordsRemover` defaults — different list.
  *
  * When the tokenizer has normalization enabled, the set itself is
  * transliterated at load, mirroring `default_tokenizer.rs:148-152`
  * (`für`→`fur`). Tamil has no NLTK list → empty set
  * (`default_tokenizer.rs:112-136`).
  *
  * Lists validated against the reference tokenizer snapshots: every corpus
  * word absent from snapshot output (and not punctuation) must be in the
  * list, and every surviving token must not be.
  */
object Stopwords {

  val english: Set[String] = Set(
    "i", "me", "my", "myself", "we", "our", "ours", "ourselves",
    "you", "you're", "you've", "you'll", "you'd", "your", "yours",
    "yourself", "yourselves", "he", "him", "his", "himself",
    "she", "she's", "her", "hers", "herself", "it", "it's", "its", "itself",
    "they", "them", "their", "theirs", "themselves",
    "what", "which", "who", "whom", "this", "that", "that'll", "these", "those",
    "am", "is", "are", "was", "were", "be", "been", "being",
    "have", "has", "had", "having", "do", "does", "did", "doing",
    "a", "an", "the", "and", "but", "if", "or", "because", "as",
    "until", "while", "of", "at", "by", "for", "with", "about", "against",
    "between", "into", "through", "during", "before", "after",
    "above", "below", "to", "from", "up", "down", "in", "out", "on", "off",
    "over", "under", "again", "further", "then", "once",
    "here", "there", "when", "where", "why", "how",
    "all", "any", "both", "each", "few", "more", "most", "other", "some", "such",
    "no", "nor", "not", "only", "own", "same", "so", "than", "too", "very",
    "s", "t", "can", "will", "just", "don", "don't", "should", "should've", "now",
    "d", "ll", "m", "o", "re", "ve", "y",
    "ain", "aren", "aren't", "couldn", "couldn't", "didn", "didn't",
    "doesn", "doesn't", "hadn", "hadn't", "hasn", "hasn't", "haven", "haven't",
    "isn", "isn't", "ma", "mightn", "mightn't", "mustn", "mustn't",
    "needn", "needn't", "shan", "shan't", "shouldn", "shouldn't",
    "wasn", "wasn't", "weren", "weren't", "won", "won't", "wouldn", "wouldn't"
  )

  val german: Set[String] = Set(
    "aber", "alle", "allem", "allen", "aller", "alles", "als", "also", "am",
    "an", "ander", "andere", "anderem", "anderen", "anderer", "anderes",
    "anderm", "andern", "anderr", "anders", "auch", "auf", "aus", "bei",
    "bin", "bis", "bist", "da", "damit", "dann", "der", "den", "des", "dem",
    "die", "das", "dass", "daß", "derselbe", "derselben", "denselben",
    "desselben", "demselben", "dieselbe", "dieselben", "dasselbe", "dazu",
    "dein", "deine", "deinem", "deinen", "deiner", "deines", "denn", "derer",
    "dessen", "dich", "dir", "du", "dies", "diese", "diesem", "diesen",
    "dieser", "dieses", "doch", "dort", "durch", "ein", "eine", "einem",
    "einen", "einer", "eines", "einig", "einige", "einigem", "einigen",
    "einiger", "einiges", "einmal", "er", "ihn", "ihm", "es", "etwas",
    "euer", "eure", "eurem", "euren", "eurer", "eures", "für", "gegen",
    "gewesen", "hab", "habe", "haben", "hat", "hatte", "hatten", "hier",
    "hin", "hinter", "ich", "mich", "mir", "ihr", "ihre", "ihrem", "ihren",
    "ihrer", "ihres", "euch", "im", "in", "indem", "ins", "ist", "jede",
    "jedem", "jeden", "jeder", "jedes", "jene", "jenem", "jenen", "jener",
    "jenes", "jetzt", "kann", "kein", "keine", "keinem", "keinen", "keiner",
    "keines", "können", "könnte", "machen", "man", "manche", "manchem",
    "manchen", "mancher", "manches", "mein", "meine", "meinem", "meinen",
    "meiner", "meines", "mit", "muss", "musste", "nach", "nicht", "nichts",
    "noch", "nun", "nur", "ob", "oder", "ohne", "sehr", "sein", "seine",
    "seinem", "seinen", "seiner", "seines", "selbst", "sich", "sie", "ihnen",
    "sind", "so", "solche", "solchem", "solchen", "solcher", "solches",
    "soll", "sollte", "sondern", "sonst", "über", "um", "und", "uns",
    "unse", "unsem", "unsen", "unser", "unses", "unter", "viel",
    "vom", "von", "vor", "während", "war", "waren", "warst", "was", "weg",
    "weil", "weiter", "welche", "welchem", "welchen", "welcher", "welches",
    "wenn", "werde", "werden", "wie", "wieder", "will", "wir", "wird",
    "wirst", "wo", "wollen", "wollte", "würde", "würden", "zu", "zum",
    "zur", "zwar", "zwischen"
  )

  /** Stopword set for a language; languages without a vendored NLTK list
    * (incl. Tamil, per the reference) get the empty set.
    */
  def forLanguage(lang: Language): Set[String] = lang match {
    case Language.Arabic     => StopwordLists.arabic
    case Language.Danish     => StopwordLists.danish
    case Language.Dutch      => StopwordLists.dutch
    case Language.English    => english
    case Language.French     => StopwordLists.french
    case Language.German     => german
    case Language.Greek      => StopwordLists.greek
    case Language.Hungarian  => StopwordLists.hungarian
    case Language.Italian    => StopwordLists.italian
    case Language.Norwegian  => StopwordLists.norwegian
    case Language.Portuguese => StopwordLists.portuguese
    case Language.Romanian   => StopwordLists.romanian
    case Language.Russian    => StopwordLists.russian
    case Language.Spanish    => StopwordLists.spanish
    case Language.Swedish    => StopwordLists.swedish
    case Language.Tamil      => Set.empty // the reference: no NLTK Tamil list
    case Language.Turkish    => StopwordLists.turkish
  }
}
