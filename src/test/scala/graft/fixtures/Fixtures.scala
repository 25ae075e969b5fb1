package graft.fixtures

import scala.collection.mutable.ArrayBuffer
import scala.io.Source

/** Loaders for the vendored reference fixtures (see FIXTURES.md):
  * the recipe CSV corpora (reference data dir, loader semantics at
  * `/root/reference/src/test_data_loader.rs:13-28`) and the insta golden
  * snapshots (reference snapshots dir: 4 header lines, then a Rust
  * Debug-printed value).
  */
object Fixtures {
  case class Recipe(title: String, method: String)

  private def resource(name: String): String = {
    val in = getClass.getResourceAsStream(s"/reference/$name")
    require(in != null, s"missing test resource $name")
    val s = Source.fromInputStream(in, "UTF-8").mkString
    in.close()
    s
  }

  /** Minimal RFC-4180 CSV parser (quoted fields, `""` escapes, embedded
    * newlines) — enough for the recipe corpora.
    */
  private def parseCsv(text: String): Vector[Vector[String]] = {
    val rows = Vector.newBuilder[Vector[String]]
    val row = ArrayBuffer.empty[String]
    val field = new StringBuilder
    var inQuotes = false
    var i = 0
    def endField(): Unit = { row += field.toString; field.clear() }
    def endRow(): Unit = { endField(); rows += row.toVector; row.clear() }
    while (i < text.length) {
      val c = text.charAt(i)
      if (inQuotes) {
        if (c == '"') {
          if (i + 1 < text.length && text.charAt(i + 1) == '"') { field += '"'; i += 1 }
          else inQuotes = false
        } else field += c
      } else c match {
        case '"' => inQuotes = true
        case ',' => endField()
        case '\r' => // swallow (CRLF)
        case '\n' => endRow()
        case other => field += other
      }
      i += 1
    }
    if (field.nonEmpty || row.nonEmpty) endRow()
    rows.result().filter(_.exists(_.nonEmpty))
  }

  def recipes(file: String): Vector[Recipe] =
    parseCsv(resource(file)).drop(1).map(r => Recipe(r(0), r(1)))

  def recipesEn: Vector[Recipe] = recipes("recipes_en.csv")
  def recipesDe: Vector[Recipe] = recipes("recipes_de.csv")

  private def snapshotBody(name: String): Vector[String] = {
    val lines = resource(name).linesIterator.toVector
    // insta header: --- / source: … / expression: … / ---
    lines.dropWhile(_ != "---").drop(1).dropWhile(_ != "---").drop(1)
  }

  private val quoted = """^\s*"(.*)",?$""".r

  /** Tokenizer snapshots: Rust Debug `Vec<Vec<String>>`. */
  def tokenizerSnapshot(lang: String): Vector[Vector[String]] = {
    val body = snapshotBody(s"bm25__default_tokenizer__tests__it_matches_snapshot_$lang.snap")
    val docs = Vector.newBuilder[Vector[String]]
    var tokens = Vector.newBuilder[String]
    var depth = 0
    body.foreach { line =>
      val t = line.trim
      if (t == "[" || t == "[],") {
        depth += 1
        if (depth == 2) tokens = Vector.newBuilder[String]
        if (t == "[],") { // empty doc at depth 1
          docs += Vector.empty; depth -= 1
        }
      } else if (t == "]," || t == "]") {
        if (depth == 2) docs += tokens.result()
        depth -= 1
      } else t match {
        case quoted(tok) => tokens += unescapeRust(tok)
        case _ =>
      }
    }
    docs.result()
  }

  case class TokenEmb(index: Long, value: Float)

  /** Embedder snapshots: Rust Debug `Vec<Embedding>` with u32 index + f32
    * value per token occurrence.
    */
  def embedderSnapshot(lang: String): Vector[Vector[TokenEmb]] = {
    val body = snapshotBody(s"bm25__embedder__tests__it_matches_snapshot_$lang.snap")
    val docs = Vector.newBuilder[Vector[TokenEmb]]
    var cur = Vector.newBuilder[TokenEmb]
    var index = 0L
    val idxRe = """^\s*index:\s*(\d+),$""".r
    val valRe = """^\s*value:\s*([-0-9.e]+),$""".r
    body.foreach { line =>
      line.trim match {
        case "Embedding(" => cur = Vector.newBuilder[TokenEmb]
        case ")," | ")" => docs += cur.result()
        case idxRe(i) => index = i.toLong
        case valRe(v) => cur += TokenEmb(index, java.lang.Float.parseFloat(v))
        case _ =>
      }
    }
    docs.result()
  }

  case class SearchHit(id: String, score: Float)

  /** Search snapshots: Rust Debug `Vec<SearchResult<String>>`, sorted by doc
    * id for determinism (`/root/reference/src/search.rs:493-503`).
    */
  def searchSnapshot(lang: String): Vector[SearchHit] = {
    val body = snapshotBody(s"bm25__search__tests__it_matches_snapshot_$lang.snap")
    val hits = Vector.newBuilder[SearchHit]
    var id: String = null
    val idRe = """^\s*id:\s*"(.*)",$""".r
    val scoreRe = """^\s*score:\s*([-0-9.e]+),$""".r
    body.foreach { line =>
      line.trim match {
        case idRe(i) => id = unescapeRust(i)
        case scoreRe(s) => hits += SearchHit(id, java.lang.Float.parseFloat(s))
        case _ =>
      }
    }
    hits.result()
  }

  private def unescapeRust(s: String): String =
    s.replace("\\\"", "\"").replace("\\\\", "\\").replace("\\n", "\n").replace("\\t", "\t")
}
