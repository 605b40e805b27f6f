package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Semantic gates for [[Curation.cuShuffleShard]] — the deterministic
  * epoch-shuffle/shard export. The DuckDB oracle pins the rows bitwise;
  * these pin the properties a training loader actually relies on:
  * the output is a PERMUTATION (every doc exactly once, per-shard
  * positions contiguous from 1), shards are hash-balanced, and a new
  * epoch seed yields a different order while remaining a permutation.
  */
class ShuffleShardSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private lazy val docs = graft.Tables.load(spark, dir, "documents")
    .select(col("doc_id")).cache()
  private lazy val ep1 = Curation.shuffleShard(docs, "ep1", 8).cache()

  test("output is a permutation with contiguous per-shard positions") {
    val n = docs.count()
    assert(ep1.count() === n)
    assert(ep1.select("doc_id").distinct().count() === n)
    // per shard: pos = 1..count(shard), no gaps or dups
    val bad = ep1.groupBy("shard")
      .agg(count(lit(1)).as("n"), min("pos").as("lo"),
        max("pos").as("hi"), countDistinct("pos").as("nd"))
      .filter(col("lo") =!= 1L || col("hi") =!= col("n") ||
        col("nd") =!= col("n"))
      .count()
    assert(bad === 0L, "per-shard positions must be contiguous from 1")
  }

  test("shards are hash-balanced") {
    val sizes = ep1.groupBy("shard").count()
      .collect().map(_.getLong(1))
    assert(sizes.length === 8)
    val mean = sizes.sum.toDouble / sizes.length
    // md5 % 8 on the 500-doc fixture: binomial spread, ±4σ ≈ ±32
    // around the 62.5 mean
    assert(sizes.forall(s => math.abs(s - mean) <= 4 * math.sqrt(mean)),
      s"shard sizes too skewed: ${sizes.mkString(",")}")
  }

  test("a new epoch seed re-permutes deterministically") {
    val ep2 = Curation.shuffleShard(docs, "ep2", 8).cache()
    assert(ep2.count() === docs.count())
    assert(ep2.select("doc_id").distinct().count() === docs.count())
    // the two epochs disagree on (shard, pos) for most docs
    val same = ep1.as("a").join(ep2.as("b"),
        col("a.doc_id") === col("b.doc_id") &&
          col("a.shard") === col("b.shard") &&
          col("a.pos") === col("b.pos"))
      .count()
    assert(same < docs.count() / 2,
      s"epoch reseed left $same docs in identical slots")
    // and each epoch is itself stable across re-evaluation
    val replay = Curation.shuffleShard(docs, "ep2", 8)
    assert(replay.exceptAll(ep2).count() === 0L)
  }

  test("shardToModel materializes a pruned, pos-ordered shard export") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_shard").toString
    val api = new graft.api.FalApi(spark,
      new graft.api.Registry(root), new graft.api.RunLedger)
    val res = Curation.shardToModel(api, dir, "ep1", 8)
    assert(res.rowsAffected === docs.count())
    val back = api.ref("documents_shards")
    assert(back.count() === docs.count())
    // shard filters prune at the directory level — a loader resuming
    // mid-epoch opens only the shards it still needs
    val one = back.filter(col("shard") === 3L)
    val scan = one.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") && scan.contains("shard#"),
      s"expected shard directory pruning:\n$scan")
    // the written shard IS the query's shard, in pos order per file
    val q3 = Curation.shuffleShard(docs, "ep1", 8)
      .filter(col("shard") === 3L).select("doc_id", "pos")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b3 = one.select("doc_id", "pos")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(b3 === q3)
  }
}
