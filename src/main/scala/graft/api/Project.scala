package graft.api

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** Project loader: a directory of `.sql` model files becomes the
  * registry — the rebuild of dbt's project parse as consumed by the
  * reference (`FalDbt.__init__` → manifest → `_map_nodes`,
  * `/root/reference/projects/adapter/src/fal/dbt/integration/
  * project.py:443-559`). Dependencies are regex-extracted from
  * `{{ ref('x') }}` / `{{ source('a','b') }}` in the SQL text, the same
  * extraction the reference applies to generated python-model shims
  * (`model_generator.py` / `module_check.py:7-109`).
  *
  * Layout:
  * {{{
  *   project/
  *     models/<name>.sql            one model per file
  *     models/<name>.meta           optional "key=value" lines
  *                                  (tags=a,b  incremental=true
  *                                   incremental_strategy=merge ...)
  *     models/<name>.tests          optional test lines (the schema.yml
  *                                  analogue): `not_null <col>`,
  *                                  `unique <col>`,
  *                                  `relationship <col> <model> <col>`,
  *                                  `accepted_values <col> <v1> <v2> …`
  *     models/<name>.py             pure-python model (`def model(dbt,
  *                                  fal)`); meta `environment=<name>`
  *                                  picks a named isolated env
  *     environments.conf            name = venv|conda [pkg …]
  *     selectors.conf               name = selection-expr …
  *     sources.conf                 srcName table path [format]
  * }}}
  */
object Project {

  private val refPat = raw"\{\{\s*ref\(\s*'([^']+)'\s*\)\s*\}\}".r
  // python-model dep extraction: `dbt.ref("x")` / `dbt.ref('x')` —
  // the reference's source-text scan of generated shims and pure
  // python models (`model_generator.py` / `project.py` `_map_nodes`)
  private val pyRefPat =
    raw"""dbt\.ref\(\s*['"]([^'"]+)['"]\s*\)""".r

  private def extractPyRefs(src: String): Seq[String] =
    pyRefPat.findAllMatchIn(src).map(_.group(1)).toSeq.distinct
  private val srcPat =
    raw"\{\{\s*source\(\s*'([^']+)'\s*,\s*'([^']+)'\s*\)\s*\}\}".r

  def extractRefs(sql: String): Seq[String] =
    refPat.findAllMatchIn(sql).map(_.group(1)).toSeq.distinct

  def extractSources(sql: String): Seq[(String, String)] =
    srcPat.findAllMatchIn(sql).map(m => (m.group(1), m.group(2)))
      .toSeq.distinct

  /** Load model + source definitions from `projectDir` into a fresh
    * registry rooted at `storageRoot`.
    */
  def load(projectDir: String, storageRoot: String): Registry = {
    val registry = new Registry(storageRoot)
    val modelsDir = Paths.get(projectDir, "models")
    require(Files.isDirectory(modelsDir), s"no models/ dir in $projectDir")

    val sqlFiles = scala.util.Using.resource(Files.list(modelsDir)) { s =>
      s.iterator().asScala
        .filter(_.getFileName.toString.endsWith(".sql")).toSeq
    }.sortBy(_.getFileName.toString)
    sqlFiles.foreach { f =>
      val name = f.getFileName.toString.stripSuffix(".sql")
      val sql = Files.readString(f)
      val meta = readMeta(modelsDir.resolve(s"$name.meta"))
      registry.register(ModelDef(
        name,
        ModelKind.Sql(sql),
        deps = extractRefs(sql),
        tags = meta.get("tags")
          .map(_.split(",").map(_.trim).toSet).getOrElse(Set.empty),
        incremental = meta.get("incremental").contains("true"),
        meta = meta -- Seq("tags", "incremental")))
      readTests(modelsDir.resolve(s"$name.tests"), name)
        .foreach(registry.registerTest)
    }

    // models/<name>.py → a reference-style pure-python model (ref
    // `008_pure_python_models`, loaded from `fal-models-paths`,
    // `dbt_project.yml:12`): `def model(dbt, fal)` over pandas, deps
    // regex-extracted from dbt.ref(...)/dbt.source(...) exactly as the
    // reference reads them from the source text; meta
    // `environment=<name>` resolves a requirement set from
    // environments.conf (the fal_project.yml `environments:` list)
    val envs = loadEnvironments(projectDir)
    val pyFiles = scala.util.Using.resource(Files.list(modelsDir)) { s =>
      s.iterator().asScala
        .filter(_.getFileName.toString.endsWith(".py")).toSeq
    }.sortBy(_.getFileName.toString)
    pyFiles.foreach { f =>
      val name = f.getFileName.toString.stripSuffix(".py")
      require(registry.modelOpt(name).isEmpty,
        s"duplicate resource name: python model $name collides")
      val src = Files.readString(f)
      val meta = readMeta(modelsDir.resolve(s"$name.meta"))
      val env = meta.get("environment")
        .map(n => envs.getOrElse(n, throw new IllegalArgumentException(
          s"model $name names unknown environment '$n' — defined: " +
            envs.keys.toSeq.sorted.mkString(", "))))
        .getOrElse(Nil)
      registry.register(ModelDef(
        name,
        ModelKind.Python(f.toString, environment = env),
        deps = extractPyRefs(src),
        tags = meta.get("tags")
          .map(_.split(",").map(_.trim).toSet).getOrElse(Set.empty),
        meta = meta -- Seq("tags", "environment")))
      readTests(modelsDir.resolve(s"$name.tests"), name)
        .foreach(registry.registerTest)
    }

    // seeds/<name>.csv → a seed model (dbt's `seed-paths`; the
    // reference's jaffle fixture ships raw_customers/orders/payments
    // this way). Seeds have no deps — they root the DAG.
    val seedsDir = Paths.get(projectDir, "seeds")
    if (Files.isDirectory(seedsDir)) {
      scala.util.Using.resource(Files.list(seedsDir)) { s =>
        s.iterator().asScala
          .filter(_.getFileName.toString.endsWith(".csv")).toSeq
      }.sortBy(_.getFileName.toString)
        .foreach { f =>
          val name = f.getFileName.toString.stripSuffix(".csv")
          // dbt fails compilation on duplicate resource names; a silent
          // registry overwrite would drop the SQL model (deps, tests)
          require(registry.modelOpt(name).isEmpty,
            s"duplicate resource name: seed $name collides with model $name")
          registry.register(ModelDef(name, ModelKind.Seed(f.toString)))
        }
    }

    val sourcesFile = Paths.get(projectDir, "sources.conf")
    if (Files.exists(sourcesFile)) {
      Files.readAllLines(sourcesFile).asScala
        .map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#"))
        .foreach { line =>
          val parts = line.split("\\s+")
          require(parts.length >= 3, s"bad source line: $line")
          registry.register(SourceDef(parts(0), parts(1), parts(2),
            format = if (parts.length > 3) parts(3) else "parquet"))
        }
    }
    registry
  }

  /** Named isolated environments (`<project>/environments.conf`, the
    * `fal_project.yml environments:` analogue — ref
    * `013_structured_hooks/fal_project.yml`, parsed by
    * `parse.load_environments` via `project.py:894-896`): one
    * `name = venv|conda [pkg …]` line per environment, resolved into
    * the requirement encoding [[ModelKind.Python]] carries (`conda`
    * flavor = a leading "conda" element; an empty venv runs the host
    * interpreter in its own process, the reference's bare-env case).
    */
  def loadEnvironments(projectDir: String): Map[String, Seq[String]] = {
    val p = Paths.get(projectDir, "environments.conf")
    if (!Files.exists(p)) Map.empty
    else Files.readAllLines(p).asScala.toSeq
      .map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#"))
      .map { line =>
        line.split("=", 2) match {
          case Array(name, spec) =>
            spec.trim.split("\\s+").toSeq.filter(_.nonEmpty) match {
              case "venv" +: pkgs => name.trim -> pkgs
              case "conda" +: pkgs => name.trim -> ("conda" +: pkgs)
              case _ => throw new IllegalArgumentException(
                s"bad environment line in $p (need 'name = venv|conda " +
                  s"[pkg …]'): $line")
            }
          case _ => throw new IllegalArgumentException(
            s"bad environment line in $p: $line")
        }
      }.toMap
  }

  /** Named selectors (`<project>/selectors.conf`, the selectors.yml
    * analogue — ref `--selector`, `args.py:134-137`): one `name =
    * expr expr …` line per selector; the expressions are ordinary
    * selection-algebra strings unioned like repeated `--select`s.
    */
  def loadSelectors(projectDir: String): Map[String, Seq[String]] = {
    val p = Paths.get(projectDir, "selectors.conf")
    if (!Files.exists(p)) Map.empty
    else Files.readAllLines(p).asScala.toSeq
      .map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#"))
      .map { line =>
        line.split("=", 2) match {
          case Array(name, exprs)
              if exprs.trim.split("\\s+").exists(_.nonEmpty) =>
            name.trim -> exprs.trim.split("\\s+").toSeq.filter(_.nonEmpty)
          // an EMPTY expression list must be a parse error: empty
          // select means "everything" downstream, so a truncated
          // selector line would silently turn a narrow named selection
          // into a full-project run
          case _ => throw new IllegalArgumentException(
            s"bad selector line in $p (need 'name = expr …'): $line")
        }
      }.toMap
  }

  private def readTests(p: Path, model: String): Seq[TestDef] =
    if (Files.exists(p))
      Files.readAllLines(p).asScala.toSeq
        .map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#"))
        .map { line =>
          line.split("\\s+").toSeq match {
            case Seq("not_null", c) => Tests.notNull(model, c)
            case Seq("unique", c) => Tests.unique(model, c)
            case Seq("relationship", c, refModel, refCol) =>
              Tests.relationship(model, c, refModel, refCol)
            // `accepted_values <col> <v1> <v2> …` — the jaffle
            // fixture's third generic test (ref
            // `002_jaffle_shop/models/schema.yml:75`)
            case "accepted_values" +: c +: vals if vals.nonEmpty =>
              Tests.acceptedValues(model, c, vals)
            case other => throw new IllegalArgumentException(
              s"bad test line in $p: $line")
          }
        }
    else Nil

  /** Project-level config (`<project>/project.meta`, same key=value
    * format as model .meta files) — carries the GLOBAL script lists
    * (`scripts_before` / `scripts_after`), the analogue of the
    * reference's project-level `fal: scripts:` block
    * (`project.py:549` `_global_script_paths` via
    * `parse.get_global_script_configs`).
    */
  def projectMeta(projectDir: String): Map[String, String] =
    readMeta(Paths.get(projectDir, "project.meta"))

  /** Named execution targets — the `--target` profile surface (ref:
    * `args.py:85-93` adds `--target`/`--profiles-dir`;
    * `load_db_profile.py:40-81` resolves the named output from
    * profiles.yml, erroring on an unknown name). A target here is what
    * a warehouse profile collapses to on a Spark-native engine:
    * project.meta lines
    *
    * {{{
    *   target.<name>.storage=<relation storage root>
    *   target.<name>.threads=<runner parallelism>
    *   target.<name>.spark.<conf>=<session conf value>
    * }}}
    *
    * grouped per name. A bare `target.default=<name>` line names the
    * target used when the CLI passes none — profiles.yml's `target:`
    * default key.
    */
  def loadTargets(projectDir: String): Map[String, Map[String, String]] =
    projectMeta(projectDir).toSeq.flatMap { case (k, v) =>
      if (!k.startsWith("target.")) None
      else {
        val rest = k.stripPrefix("target.")
        val dot = rest.indexOf('.')
        if (dot <= 0) None // `target.default=<name>` selector line
        else Some((rest.take(dot), rest.drop(dot + 1), v))
      }
    }.groupBy(_._1)
      .map { case (name, kvs) =>
        name -> kvs.map(t => t._2 -> t._3).toMap
      }

  /** The project's declared default target name, if any. */
  def defaultTarget(projectDir: String): Option[String] =
    projectMeta(projectDir).get("target.default")

  /** Where a project keeps its script files: `<project>/scripts` by
    * default, relocatable via the `fal-scripts-path` project.meta key —
    * the reference's `fal-scripts-path` dbt_project var
    * (`parse.py:143-152`, consumed relative to the project dir at
    * `tasks.py:151-157`). An absolute value is taken as-is.
    */
  def scriptsDir(projectDir: String): Path = {
    val rel = projectMeta(projectDir)
      .getOrElse("fal-scripts-path", "scripts")
    val p = Paths.get(rel)
    if (p.isAbsolute) p else Paths.get(projectDir).resolve(rel)
  }

  private def readMeta(p: Path): Map[String, String] =
    if (Files.exists(p))
      Files.readAllLines(p).asScala
        .map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#"))
        .map { l =>
          val Array(k, v) = l.split("=", 2)
          k.trim -> v.trim
        }.toMap
    else Map.empty
}
