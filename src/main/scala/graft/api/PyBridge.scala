package graft.api

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files

import org.apache.spark.sql.DataFrame

/** D1 for real: run a reference-style Python model — a `.py` file
  * defining `def model(dbt, fal)` over pandas DataFrames — as a DAG
  * node, in its own interpreter process.
  *
  * This is the reference's teleport execution shape
  * (`/root/reference/projects/adapter/src/dbt/adapters/fal_experimental/
  * teleport.py:43-56` + `utils/environments.py`): instead of sharing a
  * connection, the parent materializes every `ref()` input to parquet,
  * the child reads them with pandas, runs the user function, writes its
  * result parquet, and the parent loads that back through the normal
  * `writeToModel` path. Nothing crosses the boundary except parquet
  * files and a JSON manifest, so a crashing or memory-bombing model
  * cannot harm the driver JVM (the fault-isolation half of B12), and
  * the child needs no Spark — just `pandas` + `pyarrow`.
  *
  * Scale note: the handoff is O(inputs + output) parquet, exactly what
  * the reference pays per teleported model. A 100 TB pipeline keeps
  * Python nodes on REDUCED inputs (aggregates, samples) by
  * construction — same contract as the reference, where a Python model
  * pulls its whole input into pandas memory.
  */
object PyBridge {

  /** Interpreter + deps probe, memoized: the bridge needs a `python3`
    * with pandas and pyarrow on PATH (specs cancel when absent).
    */
  lazy val available: Boolean =
    try {
      val p = new ProcessBuilder(
        "python3", "-c", "import pandas, pyarrow").start()
      p.waitFor() == 0
    } catch { case _: Exception => false }

  /** The child-side runner. Kept dependency-free (stdlib + pandas):
    * builds the `dbt`/`fal` shim objects over the manifest's path maps,
    * imports the user file with the model's project dir on `sys.path`
    * (reference models do `from utils.x import y`), and requires a
    * pandas DataFrame back — the same contract as the reference's
    * Python-model materialization (`table.sql:34-46`).
    */
  private val runnerPy: String =
    """import importlib.util, json, os, sys
      |
      |def main(manifest_path):
      |    with open(manifest_path) as f:
      |        m = json.load(f)
      |    import pandas as pd
      |
      |    class Dbt:
      |        def ref(self, name):
      |            path = m["inputs"].get(name)
      |            if path is None:
      |                raise KeyError(
      |                    "ref(%r): not declared in the model's deps" % name)
      |            return pd.read_parquet(path)
      |        def source(self, source_name, table_name):
      |            path = m["sources"].get(source_name + "." + table_name)
      |            if path is None:
      |                raise KeyError("source(%r, %r): no parquet source"
      |                               % (source_name, table_name))
      |            return pd.read_parquet(path)
      |        def config(self, *args, **kwargs):
      |            pass
      |
      |    class Fal:
      |        def ref(self, name):
      |            return Dbt().ref(name)
      |        def source(self, s, t):
      |            return Dbt().source(s, t)
      |
      |    sys.path.insert(0, os.path.dirname(os.path.abspath(m["model_file"])))
      |    spec = importlib.util.spec_from_file_location(
      |        m["model_name"], m["model_file"])
      |    mod = importlib.util.module_from_spec(spec)
      |    spec.loader.exec_module(mod)
      |    if not hasattr(mod, "model"):
      |        raise AttributeError("%s defines no model(dbt, fal)"
      |                             % m["model_file"])
      |    out = mod.model(Dbt(), Fal())
      |    if not isinstance(out, pd.DataFrame):
      |        raise TypeError("model() must return a pandas DataFrame, got %s"
      |                        % type(out).__name__)
      |    out.to_parquet(m["output"], index=False)
      |
      |main(sys.argv[1])
      |""".stripMargin

  private[api] def jstr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  /** Materialize `deps` refs to parquet, run the Python model in a
    * spawned interpreter, and return its result as a DataFrame (the
    * caller writes it back with `writeToModel`, so versioning /
    * bucketing / tests apply identically to Scala and SQL models).
    * Non-zero exit or a missing output file → exception → the node
    * FAILs and downstream nodes SKIP, the reference's task semantics.
    */
  def runModel(a: FalApi, name: String, deps: Seq[String],
      pyFile: String): DataFrame = {
    require(available,
      "python3 with pandas+pyarrow not found; Python models need it")
    val tmp = Files.createTempDirectory(s"graft_py_$name")
    val inputs = deps.map { d =>
      val p = tmp.resolve(s"in_$d").toString
      a.ref(d).write.mode("overwrite").parquet(p)
      d -> p
    }
    // parquet-format sources hand their paths over directly — the
    // relations already ARE parquet (the A8/A9 teleport property)
    val sources = a.registry.listSources
      .filter(s => s.format == "parquet" && s.path.nonEmpty)
      .map(s => s"${s.sourceName}.${s.tableName}" -> s.path)
    val outPath = tmp.resolve("out.parquet").toString
    val manifest = tmp.resolve("manifest.json")
    def obj(kv: Seq[(String, String)]): String =
      kv.map { case (k, v) => s"${jstr(k)}: ${jstr(v)}" }
        .mkString("{", ", ", "}")
    Files.writeString(manifest,
      s"""{"model_name": ${jstr(name)}, "model_file": ${jstr(pyFile)},""" +
        s""" "output": ${jstr(outPath)}, "inputs": ${obj(inputs)},""" +
        s""" "sources": ${obj(sources)}}""")
    val runner = tmp.resolve("graft_py_runner.py")
    Files.writeString(runner, runnerPy)

    val pb = new ProcessBuilder("python3", runner.toString,
      manifest.toString)
    pb.redirectErrorStream(true)
    val proc = pb.start()
    val log = new String(proc.getInputStream.readAllBytes(), UTF_8)
    val code = proc.waitFor()
    if (code != 0)
      throw new RuntimeException(
        s"python model $name failed (exit $code):\n${log.takeRight(2000)}")
    a.spark.read.parquet(outPath)
  }
}
