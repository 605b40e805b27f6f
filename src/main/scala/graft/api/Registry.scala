package graft.api

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.collection.concurrent.TrieMap
import scala.jdk.CollectionConverters._

/** Model/source registry + relation catalog: the rebuild's replacement
  * for the dbt manifest and the teleport location cache (SURVEY.md §7
  * architecture item 1; ref: manifest parse `A/fal/dbt/integration/
  * project.py:443-559`, `DataLocation` cache `A/dbt/adapters/
  * fal_experimental/teleport.py:29`).
  *
  * Relation storage is a parquet directory per written version under
  * `root/<model>/v<N>/`, with a `_current` pointer file naming the live
  * version. Overwrite = write new version dir, then atomically swap the
  * pointer (temp file + ATOMIC_MOVE) — the reference's temp-table +
  * rename dance (`lib.py:286-329`) with a metadata pointer instead of a
  * DB rename, so concurrent readers of the old version are never broken
  * (SURVEY.md §7 "hard parts").
  *
  * Thread-safety: definition maps are concurrent; per-relation mutation
  * is serialized by the runner (B7) like the reference's process-wide
  * lock (`lib.py:108-124`).
  */
final class Registry(val root: String) {
  private val models = TrieMap.empty[String, ModelDef]
  private val sources = TrieMap.empty[(String, String), SourceDef]
  private val statuses = TrieMap.empty[String, String]
  private val tests = TrieMap.empty[String, Seq[TestDef]]

  Files.createDirectories(Paths.get(root))

  // ---- definitions -------------------------------------------------------

  def register(m: ModelDef): Unit = { models.put(m.name, m); () }
  def register(s: SourceDef): Unit = {
    sources.put((s.sourceName, s.tableName), s); ()
  }

  def registerTest(t: TestDef): Unit = {
    tests.updateWith(t.model)(prev => Some(prev.getOrElse(Nil) :+ t)); ()
  }
  def testsFor(model: String): Seq[TestDef] =
    tests.getOrElse(model, Nil)
  def listTests: Seq[TestDef] =
    tests.values.flatten.toSeq.sortBy(_.name)

  def model(name: String): ModelDef =
    models.getOrElse(name,
      throw new NoSuchElementException(s"model not found: $name"))
  def modelOpt(name: String): Option[ModelDef] = models.get(name)
  def source(sourceName: String, tableName: String): SourceDef =
    sources.getOrElse((sourceName, tableName),
      throw new NoSuchElementException(
        s"source not found: $sourceName.$tableName"))

  /** B14 listing surface (ref: `project.py:606-641`). */
  def listModels: Seq[ModelDef] = models.values.toSeq.sortBy(_.name)
  def listSources: Seq[SourceDef] =
    sources.values.toSeq.sortBy(s => (s.sourceName, s.tableName))
  def listModelIds: Map[String, String] =
    models.keys.map(n => n -> status(n)).toMap

  def status(name: String): String =
    statuses.getOrElse(name, Status.Pending)
  def setStatus(name: String, s: String): Unit = { statuses.put(name, s); () }

  // ---- relation catalog (A10) -------------------------------------------

  private def modelDir(name: String): Path = Paths.get(root, name)
  private def pointerFile(name: String): Path =
    modelDir(name).resolve("_current")

  /** Live parquet path for a materialized relation, or None. The
    * version name is the pointer file's FIRST line; later `k=v` lines
    * are pointer metadata ([[pointerMeta]]).
    */
  def currentPath(name: String): Option[String] = {
    val p = pointerFile(name)
    if (Files.exists(p))
      Some(modelDir(name).resolve(
        Files.readString(p).linesIterator.next().trim).toString)
    else None
  }

  /** Pointer metadata: the `k=v` lines after the version line. Written
    * atomically WITH the pointer swap (one temp-write + ATOMIC_MOVE),
    * so a record here commits in the same instant as the data it
    * describes — the streaming sink's batch-id log rides this to get
    * exactly-once appends with no marker-file crash window. Carried
    * forward across rewrites (overwrite, compaction) by
    * [[swapPointer]] unless explicitly overridden.
    */
  def pointerMeta(name: String): Map[String, String] = {
    val p = pointerFile(name)
    if (!Files.exists(p)) Map.empty
    else Files.readString(p).linesIterator.drop(1).flatMap { l =>
      l.split("=", 2) match {
        case Array(k, v) => Some(k -> v)
        case _ => None
      }
    }.toMap
  }

  def relationExists(name: String): Boolean = currentPath(name).isDefined

  /** Allocate the next version directory for a write. */
  def nextVersionDir(name: String): String = {
    val dir = modelDir(name)
    Files.createDirectories(dir)
    val existing = if (Files.exists(dir)) {
      scala.util.Using.resource(Files.list(dir)) { stream =>
        stream.iterator().asScala
          .map(_.getFileName.toString)
          .filter(_.startsWith("v"))
          .flatMap(v => v.drop(1).toIntOption)
          .toSeq
      }
    } else Seq.empty
    val next = if (existing.isEmpty) 1 else existing.max + 1
    dir.resolve(s"v$next").toString
  }

  /** All version directories for a model, oldest first. */
  def listVersions(name: String): Seq[String] = {
    val dir = modelDir(name)
    if (!Files.exists(dir)) Seq.empty
    else scala.util.Using.resource(Files.list(dir)) { stream =>
      stream.iterator().asScala
        .map(_.getFileName.toString)
        .filter(v => v.startsWith("v") && v.drop(1).toIntOption.isDefined)
        .toSeq
    }.sortBy(_.drop(1).toInt).map(dir.resolve(_).toString)
  }

  /** Atomically point `name` at `versionDir` (must be under the model's
    * dir). Pointer swap is temp-write + ATOMIC_MOVE — readers see either
    * the old or the new version, never a partial write. `meta` entries
    * commit in the SAME move (merged over the existing [[pointerMeta]],
    * which otherwise carries forward — a compaction or overwrite of a
    * stream-fed model must not erase its committed batch id).
    */
  def swapPointer(name: String, versionDir: String,
      meta: Map[String, String] = Map.empty): Unit = {
    // the pointer file is line-oriented `k=v`: a newline in either
    // side or '=' in a key would silently truncate or shift the
    // parse, so reject malformed meta at the write
    meta.foreach { case (k, v) =>
      require(k.nonEmpty && !k.contains('=') &&
          !k.exists(c => c == '\n' || c == '\r') &&
          !v.exists(c => c == '\n' || c == '\r'),
        s"pointer meta must be newline-free with '='-free keys: $k=$v")
    }
    val version = Paths.get(versionDir).getFileName.toString
    val merged = pointerMeta(name) ++ meta
    val content = (version +: merged.toSeq.sorted
      .map { case (k, v) => s"$k=$v" }).mkString("\n")
    val tmp = modelDir(name).resolve(s"_current.tmp.${System.nanoTime()}")
    Files.writeString(tmp, content)
    Files.move(tmp, pointerFile(name), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** Drop a relation (pointer + data), ref `_drop_relation lib.py:475-484`. */
  def dropRelation(name: String): Unit = {
    val dir = modelDir(name)
    if (Files.exists(dir)) {
      Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(Files.deleteIfExists(_))
    }
  }

  /** Rename a relation: move the whole versioned dir (ref:
    * `rename_relation adapter_support.py:59-127`).
    */
  def renameRelation(from: String, to: String): Unit = {
    require(!relationExists(to), s"rename target exists: $to")
    Files.move(modelDir(from), modelDir(to),
      StandardCopyOption.ATOMIC_MOVE)
  }
}
