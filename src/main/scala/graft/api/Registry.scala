package graft.api

import java.nio.charset.StandardCharsets
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileContext, FileSystem, Options, Path}
import org.apache.spark.sql.SparkSession
import scala.collection.concurrent.TrieMap

/** Model/source registry + relation catalog: the rebuild's replacement
  * for the dbt manifest and the teleport location cache (SURVEY.md §7
  * architecture item 1; ref: manifest parse `A/fal/dbt/integration/
  * project.py:443-559`, `DataLocation` cache `A/dbt/adapters/
  * fal_experimental/teleport.py:29`).
  *
  * Relation storage is a parquet directory per written version under
  * `root/<model>/v<N>/`, with a `_current` pointer file naming the live
  * version. Overwrite = write new version dir, then atomically swap the
  * pointer — the reference's temp-table + rename dance (`lib.py:286-329`)
  * with a metadata pointer instead of a DB rename, so concurrent readers
  * of the old version are never broken (SURVEY.md §7 "hard parts").
  *
  * The catalog rides the Hadoop `FileSystem` API, not `java.nio`, so the
  * root may carry any Hadoop-supported scheme — `file://`, `hdfs://`, or
  * an object store (`s3a://`, `gs://`) — matching the reference's
  * object-store-first teleport layer (`A/dbt/fal/adapters/teleport/
  * info.py:8-73` s3 url scheme, `teleport_support/duckdb.py:95-124` S3
  * creds plumbing). The catalog lives where the data lives: at 100 TB
  * both are on the cluster store, and the same `FalApi` code path works
  * unchanged when `root` is `s3a://bucket/warehouse`.
  *
  * Pointer-swap atomicity per filesystem class:
  *   - rename-atomic stores (local, HDFS): temp-write + rename-OVERWRITE
  *     via `FileContext` (HDFS rename is atomic; readers see old or new
  *     pointer, never a torn one);
  *   - object stores (no atomic rename — a rename is copy+delete): a
  *     direct create-overwrite write of the pointer object. A PUT is
  *     atomic at object granularity on S3/GCS, which is exactly the
  *     "write-new + overwrite-pointer" variant the design calls for.
  *
  * Thread-safety: definition maps are concurrent; per-relation mutation
  * is serialized by the runner (B7) like the reference's process-wide
  * lock (`lib.py:108-124`). [[swapPointer]] additionally serializes its
  * read-merge-write per model name inside this JVM, so a maintenance
  * rewrite (compaction) racing a streaming append cannot rebuild the
  * pointer from a pre-append read and drop the committed batch id.
  * Cross-JVM, the single-writer-per-model invariant still applies.
  */
final class Registry(val root: String) {
  private val models = TrieMap.empty[String, ModelDef]
  private val sources = TrieMap.empty[(String, String), SourceDef]
  private val statuses = TrieMap.empty[String, String]
  private val tests = TrieMap.empty[String, Seq[TestDef]]
  private val swapLocks = TrieMap.empty[String, Object]

  private val hadoopConf: Configuration =
    SparkSession.getActiveSession
      .map(_.sessionState.newHadoopConf())
      .getOrElse(new Configuration())
  private val rootPath = new Path(root)
  private val fs: FileSystem = rootPath.getFileSystem(hadoopConf)

  /** Pointer-file I/O bypasses the checksum layer: on a
    * ChecksumFileSystem (the local fs, and any connector wrapping one)
    * an overwrite-rename is DELETE-dst-then-rename under the hood
    * (ChecksumFs.renameInternal must move the `.crc` sidecar too), so
    * a concurrent PROCESS reading `_current` mid-swap sees either a
    * vanished file or new bytes under the old checksum —
    * CrossJvmCompactionSpec reproduced both (model-not-materialized
    * and ChecksumException). The raw fs gives single-file POSIX
    * rename(2): atomic overwrite, no sidecar, no window. Stale legacy
    * `._current.crc` files are inert — nothing reads pointers through
    * the checksummed layer anymore.
    */
  private val pfs: FileSystem = fs match {
    case c: org.apache.hadoop.fs.ChecksumFileSystem => c.getRawFileSystem
    case other => other
  }

  /** Object stores lack atomic rename (copy+delete); the pointer swap
    * falls back to a direct overwrite-PUT there.
    */
  private val renameIsAtomic: Boolean =
    fs.getScheme match {
      case "s3a" | "s3" | "s3n" | "gs" | "oss" | "cos" | "wasb" |
          "wasbs" | "abfs" | "abfss" | "swift" => false
      case _ => true
    }

  fs.mkdirs(rootPath)

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

  private def modelDir(name: String): Path = new Path(rootPath, name)
  private def pointerFile(name: String): Path =
    new Path(modelDir(name), "_current")

  /** Read a (small) registry file, retrying transient mid-swap states:
    * on a ChecksumFileSystem (local fs, some connectors) another
    * PROCESS's pointer rename replaces the bytes and the `.crc`
    * sidecar non-atomically, so a concurrent reader can observe new
    * bytes against the old checksum (ChecksumException) or a vanished
    * path between its exists() and open() (FileNotFound) —
    * CrossJvmCompactionSpec reproduced both. The window is
    * microseconds and the file is one block, so a short bounded retry
    * converges; persistent failures (real corruption) still surface.
    */
  private def readFile(p: Path): String = {
    var attempt = 0
    while (true) {
      try {
        val in = pfs.open(p)
        try {
          val bytes = new java.io.ByteArrayOutputStream()
          val buf = new Array[Byte](8192)
          var n = in.read(buf)
          while (n >= 0) { bytes.write(buf, 0, n); n = in.read(buf) }
          return new String(bytes.toByteArray, StandardCharsets.UTF_8)
        } finally in.close()
      } catch {
        case e @ (_: org.apache.hadoop.fs.ChecksumException |
            _: java.io.FileNotFoundException) =>
          attempt += 1
          if (attempt >= 5) throw e
          Thread.sleep(10L * attempt)
      }
    }
    throw new IllegalStateException("unreachable")
  }

  private def writeFile(p: Path, content: String): Unit = {
    val out = pfs.create(p, /* overwrite = */ true)
    try out.write(content.getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }

  /** CROSS-PROCESS mutual exclusion for CHECKED pointer swaps on
    * rename-atomic stores. The optimistic protocol alone has a
    * demonstrated lost-update window (CrossJvmCompactionSpec, run with
    * this lock disabled): writer A's full check+write+verify can
    * complete inside writer B's gap between ITS content check and ITS
    * rename — B then renames over A's commit, B's post-commit re-read
    * sees B's own bytes, and A's increment is silently dropped even
    * though A observed success. An atomic-create lock file serializes
    * the check→commit window across processes:
    *   - local fs: `File.createNewFile` = O_CREAT|O_EXCL, atomic at
    *     the OS (the Hadoop create(overwrite=false) is check-then-act);
    *   - HDFS: `create(overwrite = false)` is atomic at the namenode;
    *   - object stores (renameIsAtomic = false): no portable atomic
    *     create — the lock is skipped and the documented
    *     single-maintenance-writer deployment contract stands.
    * Stale locks (a crashed holder) are taken over after
    * [[SwapLockStaleMs]]; a held lock bounds the wait at ~10 s before
    * surfacing an error (a swap holds it for milliseconds).
    */
  private val SwapLockStaleMs = 30000L
  private def swapLockPath(name: String): Path =
    new Path(modelDir(name), "_swap.lock")

  private def acquireSwapLock(name: String): Unit = {
    val p = swapLockPath(name)
    // URI scheme, not getScheme(): RawLocalFileSystem inherits the
    // base FileSystem.getScheme, which throws UnsupportedOperation
    val localFile: Option[java.io.File] =
      if (pfs.getUri.getScheme == "file")
        Some(new java.io.File(p.toUri.getPath))
      else None
    var waited = 0L
    while (true) {
      val acquired = localFile match {
        case Some(f) => try f.createNewFile()
          catch { case _: java.io.IOException => false }
        case None =>
          try { pfs.create(p, /* overwrite = */ false).close(); true }
          catch { case _: java.io.IOException => false }
      }
      if (acquired) return
      // stale-holder takeover: a crashed writer's lock must not wedge
      // every future swap of the model
      try {
        val st = pfs.getFileStatus(p)
        if (System.currentTimeMillis() - st.getModificationTime >
            SwapLockStaleMs) {
          pfs.delete(p, false); ()
        }
      } catch { case _: java.io.IOException => () }
      if (waited > 10000L)
        throw new SwapConflictException(
          s"swap lock on '$name' held for >${waited}ms — another " +
            "writer is wedged mid-swap or the host is stalled")
      Thread.sleep(20L)
      waited += 20L
    }
  }

  private def releaseSwapLock(name: String): Unit = {
    try { pfs.delete(swapLockPath(name), false); () }
    catch { case _: java.io.IOException => () }
  }

  /** Live parquet path for a materialized relation, or None. The
    * version name is the pointer file's FIRST line; later `k=v` lines
    * are pointer metadata ([[pointerMeta]]).
    */
  def currentPath(name: String): Option[String] = {
    val p = pointerFile(name)
    if (fs.exists(p))
      Some(new Path(modelDir(name), pointerVersionLine(p)).toString)
    else None
  }

  /** First (version) line of a pointer file. An empty or torn pointer
    * (plausible on the non-atomic object-store PUT path) fails with a
    * descriptive error instead of NoSuchElementException (ADVICE r11).
    */
  private def pointerVersionLine(p: Path): String =
    readFile(p).linesIterator.toSeq.headOption.map(_.trim)
      .filter(_.nonEmpty)
      .getOrElse(throw new IllegalStateException(
        s"empty or torn pointer file: $p — the pointer names no " +
          "version; restore it from the newest version directory or " +
          "drop and rewrite the relation"))

  /** Pointer metadata: the `k=v` lines after the version line. Written
    * atomically WITH the pointer swap (one atomic pointer replace), so a
    * record here commits in the same instant as the data it describes —
    * the streaming sink's batch-id log rides this to get exactly-once
    * appends with no marker-file crash window. Carried forward across
    * rewrites (overwrite, compaction) by [[swapPointer]] unless
    * explicitly overridden.
    */
  def pointerMeta(name: String): Map[String, String] = {
    val p = pointerFile(name)
    if (!fs.exists(p)) Map.empty
    else readFile(p).linesIterator.drop(1).flatMap { l =>
      l.split("=", 2) match {
        case Array(k, v) => Some(k -> v)
        case _ => None
      }
    }.toMap
  }

  def relationExists(name: String): Boolean = currentPath(name).isDefined

  /** The live pointer file's RAW content (version line + meta lines),
    * or None — the token for [[swapPointer]]'s `expectedContent`
    * check. Strictly stronger than [[currentVersion]]: an in-place
    * append ([[graft.api.FalApi.appendToBucketedModel]]) keeps the
    * version NAME but changes the meta (fingerprint advance /
    * `append_seq`), so only a content comparison can detect one
    * landing inside another writer's read-to-commit window (ADVICE
    * r12: a compaction racing an append must abort, not silently
    * repoint readers at a snapshot missing the increment).
    */
  def pointerContent(name: String): Option[String] = {
    val p = pointerFile(name)
    if (fs.exists(p)) Some(readFile(p)) else None
  }

  /** The live pointer's version NAME ("v3"), or None — the token a
    * caller passes back to [[swapPointer]] as `expectedVersion` for
    * optimistic cross-driver conflict detection.
    */
  def currentVersion(name: String): Option[String] = {
    val p = pointerFile(name)
    if (fs.exists(p)) Some(pointerVersionLine(p))
    else None
  }

  private def versionNames(dir: Path): Seq[String] =
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq
      .map(_.getPath.getName)
      .filter(v => v.startsWith("v") && v.drop(1).toIntOption.isDefined)

  /** Allocate the next version directory for a write — CLAIMED, not
    * just computed: the max+1 scan alone lets two DRIVERS allocating
    * concurrently both pick the same `vN` and write into one directory
    * (in-JVM the swap locks serialize; cross-JVM nothing did). Each
    * candidate is claimed by an exclusive create of a `_alloc` marker
    * (`overwrite = false` — atomic on real filesystems/HDFS,
    * best-effort HEAD-then-PUT on object stores, where the losing
    * driver still almost always observes the winner's marker); a lost
    * claim advances to the next number. The marker's underscore prefix
    * keeps it invisible to Spark's parquet listing, and an overwrite
    * materialization into the dir may delete it — harmless, the claim
    * only needs to cover the allocate window (the dir itself exists
    * from then on and the max+1 scan sees it).
    */
  def nextVersionDir(name: String): String = {
    val dir = modelDir(name)
    fs.mkdirs(dir)
    val existing = versionNames(dir).map(_.drop(1).toInt)
    var next = if (existing.isEmpty) 1 else existing.max + 1
    val giveUp = next + 1000
    while (!claimVersion(new Path(dir, s"v$next"))) {
      next += 1
      // a systemic create failure (permissions, quota) must surface,
      // not spin the counter forever
      if (next > giveUp) throw new IllegalStateException(
        s"cannot claim a version directory under $dir after 1000 " +
          "attempts — check filesystem permissions/quota")
    }
    new Path(dir, s"v$next").toString
  }

  private def claimVersion(versionDir: Path): Boolean =
    try {
      if (fs.exists(versionDir)) false
      else {
        val out = fs.create(new Path(versionDir, "_alloc"),
          /* overwrite = */ false)
        out.close()
        true
      }
    } catch {
      case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
      case _: java.io.IOException => false
    }

  /** All version directories for a model, oldest first. */
  def listVersions(name: String): Seq[String] = {
    val dir = modelDir(name)
    versionNames(dir).sortBy(_.drop(1).toInt)
      .map(new Path(dir, _).toString)
  }

  /** Atomically point `name` at `versionDir` (must be under the model's
    * dir). Readers see either the old or the new pointer, never a
    * partial write: rename-atomic stores get temp-write + rename-
    * OVERWRITE, object stores get a single overwrite-PUT (see class
    * scaladoc). `meta` entries commit in the SAME replace (merged over
    * the existing [[pointerMeta]], which otherwise carries forward — a
    * compaction or overwrite of a stream-fed model must not erase its
    * committed batch id). The read-merge-write is serialized per model
    * name within this JVM so concurrent swaps cannot drop each other's
    * just-committed meta.
    *
    * Cross-driver safety (VERDICT r10 item #3): `expectedVersion`
    * makes the swap optimistic-concurrency-checked — the swap aborts
    * with [[SwapConflictException]] when the live pointer no longer
    * names the version the caller read (another driver swapped in
    * between), instead of silently clobbering its commit. The
    * reference ran its swap inside a warehouse transaction
    * (`lib.py:429-472`); a version check is the object-store
    * equivalent. On BOTH branches the pointer is additionally re-read
    * after our commit: neither a PUT nor a rename-OVERWRITE is
    * conditional, so a racing writer landing inside the
    * check-then-commit window surfaces as a conflict rather than a
    * silent last-writer-wins (the loser retries from a fresh read).
    * `None` preserves the unconditional swap for single-writer flows.
    */
  def swapPointer(name: String, versionDir: String,
      meta: Map[String, String] = Map.empty,
      expectedVersion: Option[String] = None,
      expectedContent: Option[String] = None): Unit = {
    // the pointer file is line-oriented `k=v`: a newline in either
    // side or '=' in a key would silently truncate or shift the
    // parse, so reject malformed meta at the write
    meta.foreach { case (k, v) =>
      require(k.nonEmpty && !k.contains('=') &&
          !k.exists(c => c == '\n' || c == '\r') &&
          !v.exists(c => c == '\n' || c == '\r'),
        s"pointer meta must be newline-free with '='-free keys: $k=$v")
    }
    val lock = swapLocks.getOrElseUpdate(name, new Object)
    lock.synchronized {
      // checked swaps serialize cross-process too (see acquireSwapLock
      // — the optimistic window demonstrably loses updates without it)
      val crossLock = renameIsAtomic &&
        (expectedVersion.isDefined || expectedContent.isDefined)
      if (crossLock) acquireSwapLock(name)
      try {
      expectedVersion.foreach { exp =>
        val live = currentVersion(name)
        if (!live.contains(exp))
          throw new SwapConflictException(
            s"swap conflict on '$name': expected live version $exp " +
              s"but found ${live.getOrElse("(no pointer)")} — " +
              "another writer swapped since this driver's read")
      }
      // content check (ADVICE r12): strictly stronger than the version
      // check — catches meta-only commits (in-place appends) that keep
      // the version name but advance fingerprints/append_seq
      expectedContent.foreach { exp =>
        val live = pointerContent(name)
        if (!live.contains(exp))
          throw new SwapConflictException(
            s"swap conflict on '$name': the live pointer's content " +
              "changed since this driver's read (an append or another " +
              "writer committed in between) — re-read and re-decide")
      }
      val version = new Path(versionDir).getName
      val merged = pointerMeta(name) ++ meta
      val content = (version +: merged.toSeq.sorted
        .map { case (k, v) => s"$k=$v" }).mkString("\n")
      if (renameIsAtomic) {
        val tmp = new Path(modelDir(name),
          s"_current.tmp.${System.nanoTime()}")
        writeFile(tmp, content)
        if (pfs ne fs) {
          // unwrapped checksummed local fs: raw single-file POSIX
          // rename(2) IS the atomic overwrite — the FileContext route
          // would go through ChecksumFs.renameInternal's
          // delete-dst-then-rename (the cross-process vanish window
          // CrossJvmCompactionSpec caught)
          if (!pfs.rename(tmp, pointerFile(name))) {
            pfs.delete(tmp, false)
            throw new IllegalStateException(
              s"pointer rename failed for $name")
          }
        } else try {
          val fc = FileContext.getFileContext(fs.getUri, hadoopConf)
          fc.rename(tmp, pointerFile(name), Options.Rename.OVERWRITE)
        } catch {
          // a scheme with a FileSystem impl but no AbstractFileSystem
          // binding (common for third-party connectors) can't serve
          // FileContext — degrade to the object-store overwrite-PUT
          // rather than fail the swap
          case _: org.apache.hadoop.fs.UnsupportedFileSystemException =>
            fs.delete(tmp, false)
            writeFile(pointerFile(name), content)
        }
      } else {
        writeFile(pointerFile(name), content)
      }
      // BOTH branches: a rename-OVERWRITE is atomic but just as
      // unconditional as a PUT, so the cross-JVM race (two drivers
      // passing the pre-check before either commits) needs the same
      // post-commit re-read on the rename path too — it remains the
      // only guard on stores where the cross-process lock is skipped
      verifyCommit(name, content,
        checked = expectedVersion.isDefined || expectedContent.isDefined)
      } finally { if (crossLock) releaseSwapLock(name) }
    }
  }

  /** Lost-race detection for version-checked swaps: re-read the
    * pointer after OUR commit and require it to still be OUR write —
    * neither an object-store PUT nor a rename-OVERWRITE is
    * conditional, so this post-commit check is the narrowest honest
    * window on both branches. Skipped for unconditional swaps (their
    * documented cross-JVM semantic is single-writer /
    * last-writer-wins).
    *
    * An alarm here is AMBIGUOUS by construction (an unconditional
    * store can't distinguish the two): either this writer lost a
    * same-base race (its commit was clobbered), or its commit LANDED
    * and a later writer legitimately built on it inside the re-read
    * window. The caller must therefore re-read the live state and
    * RE-DECIDE — never blindly re-apply the same version, which in the
    * second case would clobber a successor that already consumed this
    * commit. The exception message carries that instruction.
    */
  private def verifyCommit(name: String, written: String,
      checked: Boolean): Unit =
    if (checked) {
      val live = readFile(pointerFile(name))
      if (live != written)
        throw new SwapConflictException(
          s"swap conflict on '$name': another writer's bytes follow " +
            "this driver's commit — EITHER this swap lost a same-base " +
            "race OR it committed and was already superseded; re-read " +
            "the live version and re-decide (do not blindly re-apply " +
            "the same version)")
    }

  /** Bounded optimistic-concurrency loop over version-checked swaps
    * (VERDICT r11 item #5): every caller of `expectedVersion` swaps
    * used to hand-roll the read → decide → swap → on-conflict-re-read
    * dance; this is that dance as a combinator, so concurrent writers
    * CONVERGE instead of surfacing [[SwapConflictException]] to the
    * user.
    *
    * `decide` receives the LIVE version name (None = no pointer yet)
    * and returns `Some((versionDir, meta))` to commit against that
    * base, or `None` to stop — the re-decide contract `verifyCommit`'s
    * ambiguity demands: after a conflict the live state may already
    * incorporate this writer's intent (its commit landed and was
    * superseded), and only the caller can tell, so each retry decides
    * from a FRESH read rather than re-applying a stale plan. Returns
    * true when a commit landed, false when `decide` declined; throws
    * after `maxAttempts` consecutive conflicts (livelock guard).
    *
    * When the base is None the swap is necessarily unconditional (no
    * version to check against) — a two-driver CREATION race keeps the
    * base API's last-writer-wins semantic; from the first committed
    * version on, every retry is version-checked.
    */
  def retrySwap(name: String, maxAttempts: Int = 5)(
      decide: Option[String] => Option[(String, Map[String, String])])
      : Boolean = {
    var attempt = 0
    while (attempt < maxAttempts) {
      val base = currentVersion(name)
      decide(base) match {
        case None => return false
        case Some((versionDir, meta)) =>
          try {
            swapPointer(name, versionDir, meta, expectedVersion = base)
            return true
          } catch {
            case _: SwapConflictException => attempt += 1
          }
      }
    }
    throw new SwapConflictException(
      s"swap on '$name' still conflicting after $maxAttempts attempts " +
        "— a faster writer is continuously advancing the pointer")
  }

  /** Names of every relation MATERIALIZED under this root (a live
    * pointer exists), independent of in-memory registrations — the
    * discovery surface a fresh maintenance process (compaction,
    * vacuum sweeps) needs. */
  def listRelations: Seq[String] =
    if (!fs.exists(rootPath)) Seq.empty
    else fs.listStatus(rootPath).toSeq
      .filter(_.isDirectory)
      .map(_.getPath.getName)
      .filter(n => fs.exists(pointerFile(n)))
      .sorted

  /** Drop a relation (pointer + data), ref `_drop_relation lib.py:475-484`. */
  def dropRelation(name: String): Unit = {
    val dir = modelDir(name)
    if (fs.exists(dir)) { fs.delete(dir, /* recursive = */ true); () }
  }

  /** Rename a relation: move the whole versioned dir (ref:
    * `rename_relation adapter_support.py:59-127`).
    *
    * Hadoop `FileSystem.rename` reports most failures (existing
    * destination dir, missing source, cross-FS) by returning FALSE, not
    * throwing (ADVICE r10) — so the result is checked, and a leftover
    * destination DIRECTORY (e.g. from a `nextVersionDir` allocation
    * whose pointer was never swapped) is rejected up front: it passes
    * the pointer-based `relationExists` guard but would make the rename
    * fail or nest the source dir inside it.
    */
  def renameRelation(from: String, to: String): Unit = {
    require(!relationExists(to), s"rename target exists: $to")
    require(!fs.exists(modelDir(to)),
      s"rename target directory exists (unswapped leftover versions?): " +
        s"${modelDir(to)}")
    require(fs.rename(modelDir(from), modelDir(to)),
      s"rename failed: $from -> $to")
  }
}

/** A version-checked [[Registry.swapPointer]] found another driver's
  * commit where the caller's read expected its own base version — the
  * multi-writer catalog conflict the reference's warehouse transaction
  * prevented. Callers must re-read the live version and RE-DECIDE (a
  * post-commit alarm can also mean this commit landed and was
  * legitimately superseded — see `verifyCommit`), never blindly
  * re-apply the same version.
  */
final class SwapConflictException(msg: String)
  extends RuntimeException(msg)
