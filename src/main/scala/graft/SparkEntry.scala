package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * The catalog lives in Queries.all (Spark plans) / OracleSql.all (DuckDB).
  */
object SparkEntry {
  /** Flagship: build the BM25 index over the sf0.001 documents table (real
    * tokenizer: normalize → lowercase → UAX#29 → stopwords → Snowball) and
    * run a block-max-WAND top-k search, contents joined.
    */
  def entry(spark: SparkSession): DataFrame =
    Queries.all("ft_search_real")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2 (+ pipeline ops). */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Queries.all

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on the
    * same parquet tables. Omitted only for the two non-SQL-expressible ops
    * (ft_search_real — Snowball/f32, snapshot-gated in sbt; sim_ann_ivf —
    * centroid state, recall-gated in AnnRecallSpec), which the driver checks
    * rows-only. Everything else — including dedup_simhash (bit-exact via
    * hex-digit parsing in DuckDB) — is value-checked by the oracle.
    */
  def oracleSql: Map[String, String] = OracleSql.all
}
