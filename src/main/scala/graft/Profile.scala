package graft

import org.apache.spark.sql.functions._

/** Scratch stage profiler (not part of the library surface). */
object Profile {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = GraftConf.builder("local[4]", 4).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftConf.tune(spark)
    spark.range(1000000).selectExpr("sum(id)", "count(distinct id % 7)")
      .collect()
    def time(label: String)(f: => Long): Unit = {
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        val n = f
        println(f"[pf] $label run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n)")
      }
    }
    if (args.length > 1 && args(1) == "density") {
      import graft.operators.{Dedup, DedupGraph}
      val sigs = Dedup.sigModel(spark, dir)
      time("sig_model") { sigs.count() }
      val sigCols = (1 to 16).map(i => col(s"s$i"))
      val rep = sigs.groupBy(sigCols: _*)
        .agg(min(col("doc_id")).as("doc_id"))
        .select(col("doc_id") +: sigCols: _*)
      time("rep_collapse") { rep.count() }
      val banded = Dedup.bandedOf(rep)
      val cands = banded.as("a").join(banded.as("b").hint("shuffle_hash"),
          col("a.band") === col("b.band") && col("a.bk") === col("b.bk") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .distinct()
      time("cands") { cands.count() }
      val edges = Dedup.scoreAgainst(cands, rep, rep, "doc_a", "doc_b")
        .select(col("doc_a"), col("doc_b"))
      time("edges_scored") { edges.count() }
      time("full_density") {
        spark.sharedState.cacheManager.clearCache()
        DedupGraph.ddClusterDensity(spark, dir).count()
      }
      spark.stop(); return
    }
    val corpus = graft.operators.Dedup.corpus(spark, dir)
    time("corpus_scan") { corpus.count() }
    val toks = graft.operators.TextAnalysis.tokens(col("text"))
    time("tokens_explode") {
      corpus.select(col("doc_id"), explode(toks).as("t")).count()
    }
    val sh = graft.operators.Dedup.shingled(spark, dir)
    time("shingled") { sh.count() }
    time("shingled_md5") {
      sh.select(col("doc_id"),
        expr("CAST(conv(substr(md5(shingle),1,8),16,10) AS BIGINT)").as("b"))
        .filter(col("b") > 0).count()
    }
    time("sigs_groupby") {
      sh.select(col("doc_id"),
          expr("CAST(conv(substr(md5(shingle),1,8),16,10) AS BIGINT)").as("b"))
        .groupBy("doc_id").agg(min(col("b"))).count()
    }
    spark.stop()
  }
}
