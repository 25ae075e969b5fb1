package graft.sources

import graft.text.FxHash
import org.apache.spark.sql.{Dataset, SparkSession}

/** A row of the production input table (BASELINE.json input_hint):
  * an Iceberg-shaped source-code corpus.
  */
final case class CodeFile(repo: String, path: String, commit: String, lang: String, content: String)

/** Deterministic synthetic source-code corpus in the input_hint shape
  * (FIXTURES.md §4 `synth-code`): every row is a pure function of
  * (seed, i) — no wall clock, no RNG state — so any two runs (and any two
  * cluster sizes) generate identical data. Term frequencies are
  * Zipf-distributed over a 50k-identifier vocabulary to exercise
  * posting-list skew; file sizes span 10–2000 tokens; langs cycle
  * {scala, rust, py, go}.
  */
object CodeCorpus {

  private val keywords = Map(
    "scala" -> Array("def", "val", "var", "class", "object", "trait", "extends", "match", "case", "import", "private", "override", "implicit", "new", "return"),
    "rust" -> Array("fn", "let", "mut", "struct", "impl", "trait", "match", "use", "pub", "mod", "return", "enum", "ref", "move", "unsafe"),
    "py" -> Array("def", "class", "import", "from", "return", "if", "else", "for", "while", "lambda", "yield", "with", "try", "except", "pass"),
    "go" -> Array("func", "var", "type", "struct", "interface", "package", "import", "return", "if", "else", "for", "range", "go", "defer", "chan"))
  private val langs = Array("scala", "rust", "py", "go")
  private val vocabSize = 50000

  @inline private def mix(seed: Long, i: Long, k: Long): Long =
    FxHash.hash64Bytes(java.nio.ByteBuffer.allocate(24).putLong(seed).putLong(i).putLong(k).array())

  @inline private def uniform(h: Long): Double = ((h >>> 11).toDouble / (1L << 53).toDouble)

  /** Zipf-ish rank: uniform → log-uniform over [1, vocabSize). */
  @inline private def zipfRank(u: Double): Int =
    math.min(vocabSize - 1, math.exp(u * math.log(vocabSize.toDouble)).toInt)

  private def ident(rank: Int): String = {
    // deterministic identifier for a vocabulary rank
    val sb = new StringBuilder("v")
    var r = rank
    do { sb.append(('a' + (r % 26)).toChar); r /= 26 } while (r > 0)
    sb.toString
  }

  /** Generates row `i` of the corpus for `seed`. Pure. */
  def row(seed: Long, i: Long): CodeFile = {
    val lang = langs((i % 4).toInt)
    val kws = keywords(lang)
    val sizeU = uniform(mix(seed, i, 0))
    val nTokens = 10 + (sizeU * sizeU * sizeU * 1990).toInt // skewed sizes 10..2000
    val sb = new StringBuilder(nTokens * 6)
    var t = 0
    while (t < nTokens) {
      val h = mix(seed, i, t + 1)
      val u = uniform(h)
      val tok =
        if ((h & 7) == 0) kws(((h >>> 3) % kws.length).toInt) // ~1/8 keywords
        else ident(zipfRank(u))
      sb.append(tok)
      t += 1
      if (t % 12 == 0) sb.append('\n') else if (t < nTokens) sb.append(' ')
    }
    val repo = s"org/repo${(mix(seed, i, -1) % 997 + 997) % 997}"
    val path = s"src/${lang}/file_$i.${lang}"
    val commit = f"${mix(seed, i, -2)}%016x"
    CodeFile(repo, path, commit, lang, sb.toString)
  }

  /** The corpus as a distributed Dataset (generation itself scales out). */
  def generate(spark: SparkSession, n: Long, seed: Long = 42L,
               partitions: Int = 0): Dataset[CodeFile] = {
    import spark.implicits._
    val parts = if (partitions > 0) partitions
                else spark.sparkContext.defaultParallelism
    spark.range(0, n, 1, parts).map(i => row(seed, i))
  }
}
