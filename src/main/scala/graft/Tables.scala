package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * Mirrors the reference's relation-scan operators (SURVEY.md §2a A1/A2:
  * `/root/reference/projects/adapter/src/fal/dbt/integration/project.py:696-755`
  * `ref`/`source` materialize a relation). Here a relation scan is a lazy
  * `spark.read.parquet` — Catalyst pushes filters/column pruning into the
  * scan, so downstream operators never pay for unread columns.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      // The events table stores TIMESTAMP(NANOS) which Spark's vectorized
      // parquet reader rejects; read nanos as long and floor-divide to
      // micros (same truncation DuckDB applies when it narrows ns → µs).
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$dir/$name.parquet")
      raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    } else spark.read.parquet(s"$dir/$name.parquet")
  }

  /** Register every table as a temp view so `spark.sql` queries (the
    * `execute_sql` surface, SURVEY.md §2a A7) can name them directly.
    * Views are lazy (no data motion), but each registration still reads
    * parquet footers for schema inference — so registration is memoized
    * per (session, dir) instead of paying ~10 footer reads per query.
    */
  private val registered =
    new java.util.concurrent.ConcurrentHashMap[SparkSession, String]()

  def registerViews(spark: SparkSession, dir: String): Unit =
    if (registered.put(spark, dir) != dir)
      all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
