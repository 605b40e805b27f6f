package graft.api

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The catalog's Hadoop-`FileSystem` posture (VERDICT r9 item #1): a
  * scheme'd `file://` root must take the exact API path an `s3a://`
  * root would (Path resolution, `FileSystem.create/rename/listStatus`),
  * with the java.nio shortcut gone. Also pins the pointer-swap
  * semantics on that interface: atomic replace (readers see old or new,
  * never torn), meta carry-forward, and — the ADVICE r9 race — two
  * concurrent swappers must not drop each other's just-committed meta.
  */
class RegistryFsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def schemedRoot(): String =
    "file://" + Files.createTempDirectory("graft-fsreg").toString

  import scala.jdk.CollectionConverters._
  private def df(values: Int*) = {
    val rows = values.map(v =>
      org.apache.spark.sql.Row(v.toLong)).asJava
    spark.createDataFrame(rows,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("my_int",
          org.apache.spark.sql.types.LongType))))
  }

  test("full write/append/compact/vacuum flow works on a file:// root") {
    val api = new FalApi(spark, new Registry(schemedRoot()), new RunLedger)
    api.writeToModel(df(1, 2, 3), "m")
    assert(api.ref("m").count() == 3)
    // append rides the metadata-only chain (_prev_version sidecar goes
    // through the same FS layer)
    api.writeToModel(df(4, 5), "m", mode = "append")
    assert(api.ref("m").count() == 5)
    api.compactModel("m")
    assert(api.ref("m").count() == 5)
    assert(api.registry.listVersions("m").size == 3)
    api.vacuumModel("m", keep = 1)
    assert(api.registry.listVersions("m").size == 1)
    assert(api.ref("m").count() == 5)
    // rename + drop on the FS interface
    api.registry.renameRelation("m", "m2")
    assert(api.ref("m2").count() == 5)
    api.registry.dropRelation("m2")
    assert(!api.registry.relationExists("m2"))
  }

  test("bucketed materialization works on a file:// root") {
    val reg = new Registry(schemedRoot())
    reg.register(ModelDef("bm", ModelKind.Sql("unused"),
      meta = Map("bucket_by" -> "my_int", "buckets" -> "4")))
    val api = new FalApi(spark, reg, new RunLedger)
    api.writeToModel(df(1 to 40: _*), "bm")
    assert(api.ref("bm").count() == 40)
  }

  test("pointer swap replaces atomically and carries meta forward") {
    val reg = new Registry(schemedRoot())
    val v1 = reg.nextVersionDir("p")
    FsIO.writeString(FsIO.child(v1, "marker"), "x")
    reg.swapPointer("p", v1, Map("stream_batch" -> "7"))
    assert(reg.currentPath("p").exists(_.endsWith("v1")))
    assert(reg.pointerMeta("p") == Map("stream_batch" -> "7"))
    // a later swap with NO meta must carry the committed batch forward
    val v2 = reg.nextVersionDir("p")
    reg.swapPointer("p", v2)
    assert(reg.currentPath("p").exists(_.endsWith("v2")))
    assert(reg.pointerMeta("p") == Map("stream_batch" -> "7"))
    // no torn temp pointer left behind after the replace
    val fs = new org.apache.hadoop.fs.Path(reg.root)
      .getFileSystem(FsIO.hadoopConf)
    val leftovers = fs
      .listStatus(new org.apache.hadoop.fs.Path(reg.root + "/p"))
      .map(_.getPath.getName)
      .filter(_.startsWith("_current.tmp"))
    assert(leftovers.isEmpty)
  }

  test("concurrent swappers do not drop each other's meta (RMW race)") {
    val reg = new Registry(schemedRoot())
    val v = reg.nextVersionDir("c")
    reg.swapPointer("c", v)
    // two writers repeatedly committing DISTINCT meta keys: without the
    // per-model serialization, one read-merge-write can overwrite the
    // other's just-committed key (the compaction-vs-stream-append race)
    val rounds = 50
    val t1 = new Thread(() =>
      (1 to rounds).foreach(i =>
        reg.swapPointer("c", v, Map("a" -> i.toString))))
    val t2 = new Thread(() =>
      (1 to rounds).foreach(i =>
        reg.swapPointer("c", v, Map("b" -> i.toString))))
    t1.start(); t2.start(); t1.join(); t2.join()
    val meta = reg.pointerMeta("c")
    assert(meta.get("a").contains(rounds.toString))
    assert(meta.get("b").contains(rounds.toString))
  }

  test("main source tree keeps no java.nio path ops on registry roots") {
    // guard: the catalog and its sidecar IO must stay on the Hadoop FS
    // API — a reintroduced java.nio call would silently break scheme'd
    // roots (it would mkdir a literal 'file:' directory)
    val offenders = Seq("Registry.scala", "FsIO.scala").flatMap { f =>
      val src = new String(Files.readAllBytes(
        java.nio.file.Paths.get(s"src/main/scala/graft/api/$f")))
      if (src.contains("java.nio.file")) Some(f) else None
    }
    assert(offenders.isEmpty,
      s"java.nio path ops back in the FS-only catalog: $offenders")
  }
}
