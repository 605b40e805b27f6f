package graft

/** Scratch diagnostic: time each query's schema-only construction and
  * count Spark jobs triggered. Not part of the build contract.
  */
object SchemaWalkProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("graft.schemaOnly", "true")
    val dir = "/root/testdata/sf0.001"
    val sc = spark.sparkContext
    val times = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val j0 = sc.statusTracker.getJobIdsForGroup(null).length
      val t0 = System.nanoTime()
      fn(spark, dir).schema
      val dt = (System.nanoTime() - t0) / 1e9
      val j1 = sc.statusTracker.getJobIdsForGroup(null).length
      (name, dt, j1 - j0)
    }
    times.sortBy(-_._2).take(20).foreach { case (n, t, j) =>
      println(f"[walk] $n%-28s ${t}%6.2f s  jobs=$j")
    }
    println(f"[walk] TOTAL ${times.map(_._2).sum}%.2f s, jobs=${times.map(_._3).sum}")
    spark.stop()
  }
}
