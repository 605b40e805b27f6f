package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-up generator: tiles a driver-generated sf dir N× into a larger
  * one (default sf0.1 ×10 → `testdata/sf1` inside the repo, since
  * `/root/testdata` is read-only). Each copy shifts every key column by
  * `copy * (max(key)+1)` with the SAME stride used on both sides of
  * every foreign key, so referential integrity, per-group distributions,
  * duplicate/near-duplicate structure and the time range are preserved
  * exactly — the result is `copies` disjoint shards of the source
  * universe, which is how a 10× day-over-day growth actually looks
  * (more customers/orders/docs, same schema and per-entity shape).
  * Key-embedding name strings (`Customer#%09d`, `Supplier#%09d`) are
  * regenerated from the shifted key so name↔key stay consistent.
  *
  * Content is bit-identical across copies (no float perturbation): the
  * oracle compare is Spark-vs-DuckDB over the same files, and queries
  * are already tie-deterministic (scripts/audit_order_ties.py), so
  * exact cross-copy ties exercise — not break — that property.
  *
  * The events table's `ts` round-trips in whatever encoding the source
  * uses (int64 TIMESTAMP(NANOS) reads as long under nanosAsLong;
  * timestamp[µs] passes through); `Tables.load` branches on the loaded
  * schema and `scripts/check_oracle.py` re-casts its DuckDB view, so
  * both encodings verify identically.
  *
  * `sbt "runMain graft.DataGen [srcDir destDir copies]"`
  */
object DataGen {
  def main(args: Array[String]): Unit = {
    val src = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val dest = if (args.length > 1) args(1) else "testdata/sf1"
    val copies = if (args.length > 2) args(2).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = GraftConf.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftConf.tune(spark)

    def read(name: String): DataFrame =
      spark.read.parquet(s"$src/$name.parquet")

    def stride(df: DataFrame, key: String): Long =
      df.agg(max(col(key))).head.getAs[Number](0).longValue() + 1L

    val customer = read("customer")
    val supplier = read("supplier")
    val part = read("part")
    val orders = read("orders")
    // ts encoding (int64 nanos via nanosAsLong, or timestamp[µs]) is
    // preserved as-read; Tables.load handles either on the way back in
    val events = read("events")
    val documents = read("documents")
    val embeddings = read("embeddings")

    val cStride = stride(customer, "c_custkey")
    val sStride = stride(supplier, "s_suppkey")
    val pStride = stride(part, "p_partkey")
    val oStride = stride(orders, "o_orderkey")
    val eStride = stride(events, "event_id")
    val uStride = stride(events, "user_id")
    val dStride = stride(documents, "doc_id")
    val vStride = stride(embeddings, "vec_id")

    /** `copies` shifted unions of `df` in one scan: broadcast-crossjoin
      * a tiny copy index, add `idx * stride` to each key (cast back to
      * its source type), then re-derive any key-embedding columns.
      */
    def tile(df: DataFrame, shifts: Map[String, Long],
        regen: Map[String, Column] = Map.empty): DataFrame = {
      val withIdx = df.crossJoin(
        broadcast(spark.range(copies).toDF("__copy")))
      val shifted = withIdx.select(df.schema.fields.map { f =>
        shifts.get(f.name) match {
          case Some(s) =>
            (col(f.name) + col("__copy") * lit(s)).cast(f.dataType)
              .as(f.name)
          case None => col(f.name)
        }
      }.toIndexedSeq: _*)
      regen.foldLeft(shifted) { case (d, (name, expr)) =>
        d.withColumn(name, expr)
      }
    }

    def write(df: DataFrame, name: String, files: Int): Unit = {
      df.repartition(files).write.mode("overwrite")
        .parquet(s"$dest/$name.parquet")
      Tables.invalidate(dest, name) // see Tables.schemaCache scaladoc
      // standing models memoized for this dir were built from the
      // pre-rewrite files (ADVICE r11): drop the in-process trust (the
      // durable layer self-heals via the corpus fingerprint)
      graft.operators.Shared.invalidate(dest)
      println(s"[datagen] $name -> $dest/$name.parquet ($files files)")
    }

    // fixed dimensions: nationkey/regionkey domains are not scaled
    // (TPC-H keeps nation/region constant across sf)
    write(read("region"), "region", 1)
    write(read("nation"), "nation", 1)

    write(tile(customer, Map("c_custkey" -> cStride),
      Map("c_name" ->
        format_string("Customer#%09d", col("c_custkey")))),
      "customer", 2)
    write(tile(supplier, Map("s_suppkey" -> sStride),
      Map("s_name" ->
        format_string("Supplier#%09d", col("s_suppkey")))),
      "supplier", 1)
    write(tile(part, Map("p_partkey" -> pStride)), "part", 2)
    write(tile(orders,
      Map("o_orderkey" -> oStride, "o_custkey" -> cStride)), "orders", 4)
    write(tile(read("lineitem"), Map(
      "l_orderkey" -> oStride, "l_partkey" -> pStride,
      "l_suppkey" -> sStride)), "lineitem", 8)
    write(tile(events,
      Map("event_id" -> eStride, "user_id" -> uStride)), "events", 4)
    write(tile(documents, Map("doc_id" -> dStride)), "documents", 2)
    tileEmbeddings(spark, src, dest, copies)

    spark.stop()
  }

  /** Tile ONLY the embeddings table `src` → `dest` — the one table the
    * at-scale clone-pair/recall specs read. ApproxQualitySpec calls
    * this on demand in a fresh checkout (VERDICT r8 #8: the spec used
    * to `assume()`-skip without a pre-generated `testdata/sf1`, so a
    * clean clone silently lost its only at-scale recall evidence);
    * sub-second at 10× sf0.1. The full multi-table fixture is still
    * `sbt "runMain graft.DataGen"`.
    */
  /* Keep the shift rule here in lockstep with main's tile(): both are
   * `key + copy * (max(key)+1)` with the same per-field cast-back; a
   * change to the tiling rule must land in both or the on-demand
   * single-table tiles diverge from the full fixture's copies of the
   * same tables. */
  private def tileOne(spark: SparkSession, src: String, dest: String,
      copies: Int, table: String, key: String, files: Int): Unit = {
    val df = spark.read.parquet(s"$src/$table.parquet")
    val stride = df.agg(max(col(key))).head
      .getAs[Number](0).longValue() + 1L
    val shifted = df
      .crossJoin(broadcast(spark.range(copies).toDF("__copy")))
      .select(df.schema.fields.map { f =>
        if (f.name == key)
          (col(f.name) + col("__copy") * lit(stride)).cast(f.dataType)
            .as(f.name)
        else col(f.name)
      }.toIndexedSeq: _*)
    // match the full fixture's canonical per-table file count (ADVICE
    // r9): an on-demand tile with a different layout would give any
    // timing-sensitive sf1 probe different scan parallelism than a
    // DataGen-generated fixture over the same rows
    shifted.repartition(files).write.mode("overwrite")
      .parquet(s"$dest/$table.parquet")
    // the process-wide schema cache must not serve a pre-rewrite entry
    // for a table this process just (re)generated; same for standing
    // models memoized from the pre-rewrite files (ADVICE r11)
    Tables.invalidate(dest, table)
    graft.operators.Shared.invalidate(dest)
    println(s"[datagen] $table -> $dest/$table.parquet ($files files)")
  }

  def tileEmbeddings(spark: SparkSession, src: String, dest: String,
      copies: Int): Unit =
    tileOne(spark, src, dest, copies, "embeddings", "vec_id", 1)

  /** On-demand tile of the documents table — the dedup twins' at-scale
    * fixture, same never-skip rationale as [[tileEmbeddings]]. */
  def tileDocuments(spark: SparkSession, src: String, dest: String,
      copies: Int): Unit =
    tileOne(spark, src, dest, copies, "documents", "doc_id", 2)
}
