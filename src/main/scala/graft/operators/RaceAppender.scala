package graft.operators

import org.apache.spark.sql.functions._

/** Test-support main for CrossJvmCompactionSpec: a SECOND real JVM
  * appending id-tagged batches to a shared bucketed standing model
  * while the spec's JVM compacts it — the cross-process half of the
  * append/compaction race the in-process specs cannot exercise
  * (Registry's swapLocks serialize same-JVM writers; across JVMs only
  * the content-pinned swap + post-commit re-read stand between a
  * compaction and a silently dropped increment).
  *
  * Conflict handling demonstrates the documented re-decide contract
  * (Registry.verifyCommit): on SwapConflictException the appender
  * RE-READS the live model and re-appends ONLY if its batch's id
  * range is absent — never blindly re-applies (a successor compaction
  * may already have consumed the landed commit; a blind retry would
  * double-append).
  *
  * args: corpusDir modelName nBatches rowsPerBatch startId
  * prints APPENDED=<n> on success (the spec's handshake).
  */
object RaceAppender {
  def main(args: Array[String]): Unit = {
    val Array(dir, name, nb, rp, start) = args.take(5)
    val (nBatches, rowsPer, startId) = (nb.toInt, rp.toLong, start.toLong)
    val spark = graft.GraftConf.builder("local[2]", 2).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val reg = Shared.registryOf(spark, dir)
    val api = Shared.api(spark, reg, name, "doc_id",
      (_, _) => throw new IllegalStateException(
        "race model is spec state, never rebuilt"), dir)
    var appended = 0L
    (0 until nBatches).foreach { b =>
      val base = startId + b * rowsPer
      val batch = spark.range(base, base + rowsPer).toDF("doc_id")
        .withColumn("payload", concat(lit("r"), col("doc_id")))
      def landed(): Boolean =
        api.ref(name).filter(col("doc_id") >= base &&
          col("doc_id") < base + rowsPer).count() == rowsPer
      var attempts = 0
      var done = false
      // 50 attempts + linear backoff (capped 1 s): on a loaded host
      // each append attempt runs for seconds while the spec's
      // compactor lands a swap every ~100 ms, so a fixed 20-attempt
      // no-backoff loop can lose the pointer race every single time
      // (reproduced under a 24-core synthetic load: "batch 1 failed
      // to land after 20 attempts"). Backoff yields the swap window
      // to the appender without weakening the re-decide contract.
      while (!done && attempts < 50) {
        if (attempts > 0)
          Thread.sleep(math.min(1000L, 100L * attempts))
        attempts += 1
        try {
          api.appendToBucketedModel(batch, name)
          done = true
        } catch {
          case _: graft.api.SwapConflictException =>
            // re-read and RE-DECIDE: the commit may have landed and
            // been superseded by a compaction that consumed it
            done = try landed() catch { case _: Throwable => false }
          case t: Throwable
              if Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
                .take(8).exists(
                  _.isInstanceOf[java.io.FileNotFoundException]) =>
            // the snapshot this append planned against was compacted
            // away mid-read (vacuum grace window exceeded): re-decide
            // against the fresh current exactly like a swap conflict
            done = try landed() catch { case _: Throwable => false }
        }
      }
      require(done, s"batch $b failed to land after $attempts attempts")
      appended += rowsPer
    }
    println(s"APPENDED=$appended")
    spark.stop()
  }
}
