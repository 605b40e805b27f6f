package graft

import graft.api.{FalApi, Project, RunLedger}
import graft.plans.Runner

/** The `fal flow run` CLI analogue (ref: `cli()` →
  * `fal_flow_run`, `/root/reference/projects/adapter/src/fal/dbt/cli/
  * cli.py:14` / `flow_runner.py:49`):
  *
  * {{{
  *   sbt "runMain graft.Cli <projectDir> [--select S]... [--exclude X]...
  *        [--threads N] [--storage DIR] [--chunk] [--vars k=v[,k=v]...]
  *        [--full-refresh]"
  * }}}
  *
  * Runs the project's model DAG, prints per-node statuses, writes
  * `run_results.json` under the storage root, exits non-zero on any
  * failure (ref `executor.py:177-178`).
  */
object Cli {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: graft.Cli <projectDir> [flags]")
    val projectDir = args.head
    var select = Vector.empty[String]
    var exclude = Vector.empty[String]
    var threads = 4
    var storage = sys.props("java.io.tmpdir") + "/graft-cli"
    var chunk = false
    var vars = Map.empty[String, String]
    var fullRefresh = false
    var i = 1
    while (i < args.length) {
      args(i) match {
        case "--select" => select :+= args(i + 1); i += 2
        case "--exclude" => exclude :+= args(i + 1); i += 2
        case "--threads" => threads = args(i + 1).toInt; i += 2
        case "--storage" => storage = args(i + 1); i += 2
        case "--chunk" => chunk = true; i += 1
        case "--vars" => // k=v[,k=v]... (repeatable; ref args.py --vars)
          vars ++= args(i + 1).split(",").iterator.filter(_.nonEmpty)
            .map { kv =>
              kv.split("=", 2) match {
                case Array(k, v) => k.trim -> v.trim
                case _ => throw new IllegalArgumentException(
                  s"--vars expects k=v pairs, got: $kv")
              }
            }
          i += 2
        case "--full-refresh" => fullRefresh = true; i += 1
        case other => throw new IllegalArgumentException(
          s"unknown flag: $other")
      }
    }

    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftConf.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val registry = Project.load(projectDir, storage)
    val api = new FalApi(spark, registry, new RunLedger)
    val tags = registry.listModels.map(m => m.name -> m.tags).toMap
    val status = Runner.run(api, Runner.RunConfig(
      select = select, exclude = exclude, threads = threads,
      enableChunking = chunk, tags = tags, vars = vars,
      fullRefresh = fullRefresh))

    api.listModelIds.toSeq.sortBy(_._1).foreach { case (name, st) =>
      println(f"$name%-30s $st")
    }
    api.ledger.writeJson(s"$storage/run_results.json")
    println(s"RUN_STATUS=$status")
    spark.stop()
    if (status != 0) sys.exit(status)
  }
}
