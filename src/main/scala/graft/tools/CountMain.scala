package graft.tools

/** Dev harness: dump each language's stopword list (one word per line) to
  * args(0)/<lang>.txt for diffing against external references, or print
  * per-language sizes with no args.
  */
object CountMain {
  def main(args: Array[String]): Unit = {
    import graft.text._
    if (args.isEmpty)
      Language.all.foreach { l =>
        println(f"${l.name}%-12s ${Stopwords.forLanguage(l).size}")
      }
    else {
      val dir = java.nio.file.Paths.get(args(0))
      java.nio.file.Files.createDirectories(dir)
      Language.all.foreach { l =>
        val w = Stopwords.forLanguage(l).toSeq.sorted.mkString("", "\n", "\n")
        java.nio.file.Files.write(dir.resolve(s"${l.name}.txt"),
          w.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      }
    }
  }
}
