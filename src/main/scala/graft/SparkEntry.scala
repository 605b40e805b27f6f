package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every implemented operator pack (one pack per SURVEY.md §2
  * group) into the flat `queries`/`oracleSql` maps the driver's Verify and
  * Bench mains consume.
  */
object SparkEntry {

  /** Every implemented operator pack. Order is presentation-only. */
  def packs: Seq[QueryPack] = Seq(Relational, Relational2, Relational3,
    Relational4, Relational5, Relational6, Joins2, Analytics,
    EventWindows, EventWindows2, EventWindows3, TextAnalysis,
    TextAnalysis2, TextAnalysis3, Curation, Curation2, Dedup, Dedup2,
    DedupGraph, DedupHi, Similarity, Similarity2, Multimodal, Sketches,
    Graph)

  /** Flagship query (jaffle-style customers rollup — SURVEY.md §7 step 1)
    * on sf0.001; driver smoke-checks rows>0.
    */
  def entry(spark: SparkSession): DataFrame =
    Relational.c6JoinLeft(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    packs.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (approx sketches, hash-seeded LSH) → driver records a rows-only
    * check.
    */
  def oracleSql: Map[String, String] =
    packs.flatMap(_.oracles).toMap
}
