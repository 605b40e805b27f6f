package graft

/** Dev micro-bench twin of [[QueryTime]] that writes to the noop sink
  * so the FULL plan runs — `count()` lets Catalyst prune final
  * projections (md5/filter stages), which understates rewrite-heavy
  * queries; this is the same methodology ScalingProbe uses.
  *
  * {{{ sbt "runMain graft.NoopTime dd_substring_scrub testdata/sf1 3" }}}
  */
object NoopTime {
  def main(args: Array[String]): Unit = {
    val name = args(0); val dir = args(1)
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val spark = GraftConf.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftConf.tune(spark)
    val fn = SparkEntry.queries(name)
    (1 to reps).foreach { i =>
      spark.sharedState.cacheManager.clearCache()
      val t0 = System.nanoTime()
      fn(spark, dir).write.format("noop").mode("overwrite").save()
      println(f"[nt] $name run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
