package graft.api

import java.nio.file.{Files, Paths}
import java.time.Instant
import scala.collection.mutable

/** Execution ledger — the rebuild of the reference's merged
  * `run_results.json` / `fal_results.json` artifacts
  * (`A/fal/dbt/cli/flow_runner.py:86-133`, result classes
  * `A/fal/dbt/planner/tasks.py:98-148`): one record per node execution
  * with status + timing, dumped as JSON at the end of a run.
  */
final class RunLedger {
  final case class Record(node: String, status: String, detail: String,
      atEpochMs: Long)

  private val records = mutable.ArrayBuffer.empty[Record]

  def record(node: String, status: String, detail: String = ""): Unit =
    records.synchronized {
      records += Record(node, status, detail, Instant.now.toEpochMilli); ()
    }

  def all: Seq[Record] = records.synchronized(records.toSeq)

  def statusOf(node: String): Option[String] =
    records.synchronized(records.reverseIterator
      .find(_.node == node).map(_.status))

  private def q(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  /** Dump dbt-ish run results JSON (ref format: status, node id, timing). */
  def writeJson(path: String): Unit = {
    val body = all.map(r =>
      s"""{"node":${q(r.node)},"status":${q(r.status)},""" +
        s""""detail":${q(r.detail)},"at_epoch_ms":${r.atEpochMs}}""")
      .mkString("[", ",", "]")
    Files.writeString(Paths.get(path), s"""{"results":$body}""")
    ()
  }
}

object RunLedger {
  /** Load a previous run's `run_results.json` into node → last status —
    * what the standalone script runner (`fal run`) seeds the registry
    * with so scripts observe the PRIOR run's model statuses (ref:
    * `FalDbt` parses `run_results.json` at `integration/parse.py:177-186`
    * and scripts read `context.current_model.status` from it).
    */
  def loadStatuses(path: String): Map[String, String] = {
    if (!Files.exists(Paths.get(path))) return Map.empty
    val text = Files.readString(Paths.get(path))
    val entry =
      raw""""node"\s*:\s*"((?:[^"\\]|\\.)*)"\s*,\s*"status"\s*:\s*"((?:[^"\\]|\\.)*)"""".r
    def unesc(s: String): String =
      raw"\\(.)".r.replaceAllIn(s, m => m.group(1) match {
        case "n" => "\n"
        case "r" => "\r"
        case "t" => "\t"
        case c => java.util.regex.Matcher.quoteReplacement(c)
      })
    // later records win: the ledger is append-ordered, so the last
    // status per node is the run's final word on it
    entry.findAllMatchIn(text)
      .map(m => unesc(m.group(1)) -> unesc(m.group(2)))
      .foldLeft(Map.empty[String, String])(_ + _)
  }
}
