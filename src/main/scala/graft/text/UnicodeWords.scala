package graft.text

import com.ibm.icu.lang.{UCharacter, UProperty}
import com.ibm.icu.text.BreakIterator
import com.ibm.icu.util.ULocale

/** UAX#29 word segmentation, matching the observable behavior of the
  * reference's `unicode_words()` split (unicode-segmentation v1.12.0, used at
  * `/root/reference/src/default_tokenizer.rs:267-270`): split the text on
  * Unicode word boundaries and keep only the segments that contain at least
  * one alphanumeric codepoint (Rust `char::is_alphanumeric` = Alphabetic
  * property or general category Nd/Nl/No).
  *
  * Implemented with ICU4J's `BreakIterator.getWordInstance` (icu4j-77.1 ships
  * in /opt/spark/jars), which implements the same UAX#29 spec. Keeps decimals
  * (`3.14`), contractions (`can't`), digit+letter runs (`400degf`) and
  * underscore-joined identifiers as single tokens; drops all punctuation.
  * Parity is asserted token-for-token against the reference tokenizer
  * snapshots (~7k tokens across 100 documents).
  */
object UnicodeWords {

  // BreakIterator is mutable/not thread-safe: one instance per thread.
  private val iterators = new ThreadLocal[BreakIterator] {
    override def initialValue(): BreakIterator = BreakIterator.getWordInstance(ULocale.ROOT)
  }

  @inline private def isAlphanumeric(cp: Int): Boolean = {
    if (cp < 128) (cp >= 'a' && cp <= 'z') || (cp >= 'A' && cp <= 'Z') || (cp >= '0' && cp <= '9')
    else {
      import com.ibm.icu.lang.UCharacterEnums.ECharacterCategory
      val t = UCharacter.getType(cp)
      UCharacter.hasBinaryProperty(cp, UProperty.ALPHABETIC) ||
      t == ECharacterCategory.DECIMAL_DIGIT_NUMBER || t == ECharacterCategory.LETTER_NUMBER ||
      t == ECharacterCategory.OTHER_NUMBER
    }
  }

  private def hasAlphanumeric(s: String, from: Int, until: Int): Boolean = {
    var i = from
    while (i < until) {
      val cp = s.codePointAt(i)
      if (isAlphanumeric(cp)) return true
      i += Character.charCount(cp)
    }
    false
  }

  /** Word-token boundaries of `text` as a flattened [s0,e0,s1,e1,…] array —
    * the allocation-free form of [[split]] for fused pipelines that look
    * tokens up by char region instead of materializing substrings.
    */
  def splitRanges(text: String): Array[Int] = {
    if (text.isEmpty) return Array.emptyIntArray
    val bi = iterators.get()
    bi.setText(text)
    var buf = new Array[Int](64)
    var n = 0
    var start = bi.first()
    var end = bi.next()
    while (end != BreakIterator.DONE) {
      if (hasAlphanumeric(text, start, end)) {
        if (n + 2 > buf.length) buf = java.util.Arrays.copyOf(buf, buf.length * 2)
        buf(n) = start; buf(n + 1) = end; n += 2
      }
      start = end
      end = bi.next()
    }
    if (n == buf.length) buf else java.util.Arrays.copyOf(buf, n)
  }

  /** Splits `text` into word tokens (order-preserving, no empties). */
  def split(text: String): Array[String] = {
    val r = splitRanges(text)
    val out = new Array[String](r.length / 2)
    var i = 0
    while (i < out.length) { out(i) = text.substring(r(2 * i), r(2 * i + 1)); i += 1 }
    out
  }
}
