package graft.tools

import graft.text._

/** Tiny CLI surface over the text core: tokenize stdin/args text and print
  * tokens + FxHash32 indices. Usage:
  *   sbt "runMain graft.tools.TextCli [lang] [--no-stem] [--no-stop] [--no-norm] -- <text...>"
  */
object TextCli {
  def main(args: Array[String]): Unit = {
    val (flags, rest) = args.span(_ != "--")
    val fileArg = flags.sliding(2).collectFirst { case Array("--file", p) => p }
    val text = fileArg match {
      case Some(p) => new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p)), "UTF-8")
      case None => rest.drop(1).mkString(" ") match {
        case "" => scala.io.Source.stdin.mkString
        case s  => s
      }
    }
    val lang = flags.find(a => !a.startsWith("--")).flatMap(Language.fromName).getOrElse(Language.English)
    val tok = Bm25Tokenizer(lang,
      normalization = !flags.contains("--no-norm"),
      stopwords = !flags.contains("--no-stop"),
      stemming = !flags.contains("--no-stem"))
    val tokens = tok.tokenize(text)
    tokens.foreach { t => println(f"${FxHash.hash32u(t)}%12d  $t") }
    System.err.println(s"${tokens.length} tokens (${lang.name})")
  }
}
