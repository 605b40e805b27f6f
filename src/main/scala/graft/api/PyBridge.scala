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

  /** Hung-child deadline for external steps (a child that never exits
    * would otherwise pin an executor thread forever; the reference's
    * process boundary lets its scheduler keep serving other branches).
    */
  private[api] def stepTimeoutSec: Long =
    sys.props.get("graft.step.timeout.sec")
      .orElse(sys.env.get("GRAFT_STEP_TIMEOUT_SEC"))
      .map(_.toLong).getOrElse(600L)

  /** Run a child with stdout+stderr streamed to `logFile` (NOT buffered
    * in driver memory — a stdout-flooding step otherwise pressures the
    * JVM it was isolated from), a hard deadline, and only the log TAIL
    * read back for error messages.
    */
  private[api] def runLogged(pb: ProcessBuilder,
      logFile: java.nio.file.Path, what: String): Unit = {
    pb.redirectErrorStream(true)
    pb.redirectOutput(logFile.toFile)
    val proc = pb.start()
    val deadline = stepTimeoutSec
    val finished =
      proc.waitFor(deadline, java.util.concurrent.TimeUnit.SECONDS)
    if (!finished) {
      proc.destroyForcibly()
      proc.waitFor(10, java.util.concurrent.TimeUnit.SECONDS)
      throw new RuntimeException(
        s"$what timed out after ${deadline}s (killed):\n${tailOf(logFile)}")
    }
    val code = proc.exitValue()
    if (code != 0)
      throw new RuntimeException(
        s"$what failed (exit $code):\n${tailOf(logFile)}")
  }

  /** Last ~2000 bytes of a (possibly huge) log file, without loading it. */
  private def tailOf(p: java.nio.file.Path, n: Int = 2000): String =
    try {
      val raf = new java.io.RandomAccessFile(p.toFile, "r")
      try {
        val len = raf.length()
        raf.seek(math.max(0L, len - n))
        val buf = new Array[Byte](math.min(n.toLong, len).toInt)
        raf.readFully(buf)
        new String(buf, UTF_8)
      } finally raf.close()
    } catch { case _: Exception => "(no output captured)" }

  /** Recursive delete, best-effort (scratch-dir reclamation). */
  private[api] def deleteRec(p: java.nio.file.Path): Unit =
    try {
      val s = Files.walk(p)
      try s.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(f => Files.deleteIfExists(f))
      finally s.close()
    } catch { case _: Exception => () }

  private val envCache =
    scala.collection.concurrent.TrieMap.empty[List[String], String]

  /** B12's dependency-environment half: the interpreter for a model's
    * declared requirement set — a venv cached by the hash of the sorted
    * requirements, the reference's `get_or_create` idea
    * (`/root/reference/projects/fal/src/fal/packages/environments/
    * virtual_env.py:35-60` keys a reusable venv dir on the dependency
    * hash). `--system-site-packages` keeps the bridge's own
    * pandas+pyarrow handoff importable; requirements that are local
    * files/dirs (wheels) install with `--no-index` so declared-offline
    * sets never touch a package index. A `.graft_ok` marker validates
    * the cache across processes; a failed build leaves no marker and is
    * rebuilt on next touch.
    */
  /** Conda executable, resolved like the reference (`conda.py:25-28`:
    * $CONDA_EXE, else `conda` on PATH); None when absent so callers
    * can skip gracefully. */
  private[graft] lazy val condaExe: Option[String] =
    sys.env.get("CONDA_EXE").filter(p => Files.exists(
        java.nio.file.Paths.get(p)))
      .orElse {
        val fromPath = sys.env.getOrElse("PATH", "").split(":")
          .map(d => java.nio.file.Paths.get(d, "conda"))
          .find(Files.exists(_)).map(_.toString)
        fromPath.orElse(Seq(
          sys.props.getOrElse("user.home", "/root") + "/miniconda/bin/conda")
          .find(p => Files.exists(java.nio.file.Paths.get(p))))
      }

  /** B12's conda flavor (ref `conda.py:33-90`): packages key the env by
    * their SHA-256 (the reference's `key` property) and
    * `_get_or_create` materializes `conda create --yes --prefix
    * <cache>/conda_<digest> <packages…>` exactly once, reused across
    * models and processes via the `.graft_ok` marker. Divergences,
    * both deliberate: a bare `python` is appended when the declaration
    * doesn't pin one (the reference pins the host's exact version for
    * pickle compatibility; our handoff is parquet, so any interpreter
    * works), and `--offline` is passed unless GRAFT_CONDA_ONLINE=1 so
    * a zero-egress sandbox draws on the local package cache instead of
    * hanging on a channel fetch.
    */
  /** True when a conda spec's NAME token pins python-the-interpreter:
    * `python`, `python=3.11`, `python==3.11`, `python3`, `Python>=3`…
    * — but not a package that merely starts with the word
    * (`python-dateutil`), hence the name-token regex rather than a
    * bare startsWith.
    */
  private[graft] def pinsPythonInterpreter(spec: String): Boolean =
    spec.takeWhile(c => c != '=' && c != '<' && c != '>').trim
      .toLowerCase(java.util.Locale.ROOT)
      .matches("python[0-9.]*")

  private def condaFor(packages: Seq[String]): String = {
    val conda = condaExe.getOrElse(throw new IllegalStateException(
      "model declares a conda environment but no conda executable found"))
    val pkgs0 = packages.sorted
    val pkgs =
      if (pkgs0.exists(pinsPythonInterpreter)) pkgs0
      else pkgs0 :+ "python"
    val digest = java.security.MessageDigest.getInstance("SHA-256")
      .digest(pkgs.mkString(" ").getBytes(UTF_8))
      .map("%02x".format(_)).mkString.take(16)
    val base = java.nio.file.Paths.get(
      sys.props.getOrElse("graft.env.cache",
        sys.props("java.io.tmpdir") + "/graft_envs"))
    Files.createDirectories(base)
    val envDir = base.resolve(s"conda_$digest")
    val marker = envDir.resolve(".graft_ok")
    if (!Files.exists(marker)) {
      deleteRec(envDir)
      val offline =
        if (sys.env.get("GRAFT_CONDA_ONLINE").contains("1")) Nil
        else Seq("--offline")
      val cmd = Seq(conda, "create", "--yes") ++ offline ++
        Seq("--prefix", envDir.toString) ++ pkgs
      runLogged(new ProcessBuilder(cmd: _*),
        base.resolve(s"conda_$digest.create.log"),
        s"conda create $digest")
      Files.writeString(marker, pkgs.mkString("\n"))
    }
    envDir.resolve("bin").resolve("python").toString
  }

  // cache keys are flavor-namespaced: a pip requirement list that
  // happens to sort to List("conda", ...) must never share an entry
  // with the conda declaration of the same elements
  def pythonFor(requirements: Seq[String]): String =
    if (requirements.isEmpty) "python3"
    else if (requirements.head == "conda")
      envCache.getOrElseUpdate(
        "flavor:conda" :: requirements.tail.sorted.toList,
        condaFor(requirements.tail))
    else envCache.getOrElseUpdate(
      "flavor:venv" :: requirements.sorted.toList, {
      val reqs = requirements.sorted
      val digest = java.security.MessageDigest.getInstance("SHA-256")
        .digest(reqs.mkString("\n").getBytes(UTF_8))
        .map("%02x".format(_)).mkString.take(16)
      val base = java.nio.file.Paths.get(
        sys.props.getOrElse("graft.env.cache",
          sys.props("java.io.tmpdir") + "/graft_envs"))
      Files.createDirectories(base)
      val envDir = base.resolve(s"env_$digest")
      val py = envDir.resolve("bin").resolve("python").toString
      val marker = envDir.resolve(".graft_ok")
      if (!Files.exists(marker)) {
        deleteRec(envDir) // half-built leftovers from a failed attempt
        runLogged(
          new ProcessBuilder("python3", "-m", "venv",
            "--system-site-packages", envDir.toString),
          base.resolve(s"env_$digest.venv.log"), s"venv create $digest")
        val allLocal = requirements.forall(r =>
          Files.exists(java.nio.file.Paths.get(r)))
        val pip = envDir.resolve("bin").resolve("pip").toString
        val cmd = Seq(pip, "install", "--no-input") ++
          (if (allLocal) Seq("--no-index") else Nil) ++ requirements
        runLogged(new ProcessBuilder(cmd: _*),
          base.resolve(s"env_$digest.pip.log"), s"pip install $digest")
        Files.writeString(marker, reqs.mkString("\n"))
      }
      py
    })

  /** Materialize `deps` refs to parquet, run the Python model in a
    * spawned interpreter, and return its result as a DataFrame (the
    * caller writes it back with `writeToModel`, so versioning /
    * bucketing / tests apply identically to Scala and SQL models).
    * Non-zero exit or a missing output file → exception → the node
    * FAILs and downstream nodes SKIP, the reference's task semantics.
    */
  def runModel(a: FalApi, name: String, deps: Seq[String],
      pyFile: String, requirements: Seq[String] = Nil): DataFrame = {
    require(available,
      "python3 with pandas+pyarrow not found; Python models need it")
    val python = pythonFor(requirements)
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

    val logFile = tmp.resolve("model.log")
    try runLogged(
      new ProcessBuilder(python, runner.toString, manifest.toString),
      logFile, s"python model $name")
    catch { case t: Throwable => deleteRec(tmp); throw t }
    // Handoff complete: reclaim the input copies now. out.parquet must
    // outlive this call (the returned DataFrame reads it lazily until
    // writeToModel materializes it), so the rest of tmp is reclaimed at
    // JVM exit.
    inputs.foreach { case (_, p) => deleteRec(java.nio.file.Paths.get(p)) }
    Files.deleteIfExists(manifest)
    Files.deleteIfExists(runner)
    Files.deleteIfExists(logFile)
    sys.addShutdownHook(deleteRec(tmp))
    a.spark.read.parquet(outPath)
  }
}
