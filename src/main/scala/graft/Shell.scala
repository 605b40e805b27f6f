package graft

import org.apache.spark.sql.SparkSession

import graft.api.{FalApi, Registry, RunLedger, SourceDef}

/** B15 — the notebook/shell bootstrap (ref: `%init_fal` magic,
  * `/root/reference/projects/adapter/src/fal/dbt/integration/
  * magics.py:8-56`, which injects `ref`/`source`/`execute_sql` globals
  * into a Jupyter session). From spark-shell or Almond:
  *
  * {{{
  *   val fal = graft.Shell.init(spark)          // or init(spark, root)
  *   fal.source("testdata", "orders").show()
  *   fal.executeSql("SELECT count(*) FROM {{ source('testdata','orders') }}")
  * }}}
  */
object Shell {

  /** Wire a FalApi over a registry rooted at `root`, pre-registering the
    * driver testdata tables as sources under the `testdata` source name.
    * (The `events` source reads its `ts` column as stored on disk —
    * use `graft.Tables.load` for the converted view.)
    */
  def init(spark: SparkSession,
      root: String = sys.props("java.io.tmpdir") + "/graft-shell",
      testdataDir: String = "/root/testdata/sf0.001"): FalApi = {
    GraftConf.tune(spark, quietWindowLog = false)
    graft.functions.GraftFunctions.register(spark)
    val registry = new Registry(root)
    Tables.all.foreach(t => registry.register(
      SourceDef("testdata", t, s"$testdataDir/$t.parquet")))
    new FalApi(spark, registry, new RunLedger)
  }
}
