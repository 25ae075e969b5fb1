package graft.tools

import org.apache.spark.sql.SparkSession

/** Smoke test for local-cluster mode (multi-executor-JVM evidence runs). */
object SmokeLC {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .appName("bm25spark-lc-smoke")
      .getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    val execs = spark.sparkContext.getExecutorMemoryStatus.size
    val n = spark.range(0, 1000000, 1, 16).map(_ * 2).filter(_ % 6 == 0).count()
    println(s"SMOKELC executors=$execs count=$n hash=${graft.text.FxHash.hash32u("tea")}")
    // exercise a tiny index build end to end across executors
    val docs = graft.sources.TableIO.toCorpusDocs(
      graft.sources.CodeCorpus.generate(spark, 2000, seed = 7L))
    val dir = java.nio.file.Files.createTempDirectory("lc_idx").toString
    val m = graft.index.IndexBuilder.build(spark, docs, graft.text.Bm25Tokenizer.default, dir,
      graft.index.IndexBuildConfig(numShards = 4, shardGroups = 1, uniformIdSpace = true))
    val hits = new graft.index.Bm25Index(spark, dir).search("fn return", Some(5), "wand").collect()
    println(s"SMOKELC nDocs=${m.nDocs} hits=${hits.length}")
    spark.stop()
  }
}
