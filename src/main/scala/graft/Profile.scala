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
