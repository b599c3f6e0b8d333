package graft.run

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** Run lifecycle record (reference: ondine/orchestration/run_registry.py
  * :49-286 — RunRecord + the PENDING → RUNNING → SUCCEEDED / FAILED /
  * PARTIAL state machine, plus SUBMITTED_REMOTE for the provider-batch
  * split). `rowsDone` / `validRows` land from the final metrics; PARTIAL
  * means the run completed but some rows never produced output (the
  * resume CLI can re-drive exactly those through the ledger anti-join). */
final case class RunRecord(
    runId: String,
    runDir: String,
    state: String,
    createdMs: Long,
    updatedMs: Long,
    rows: Long = 0L,
    validRows: Long = 0L,
    calls: Long = 0L,
    cost: String = "0",
    note: String = "")

object RunState {
  val Pending = "PENDING"
  val Running = "RUNNING"
  val Succeeded = "SUCCEEDED"
  val Failed = "FAILED"
  val Partial = "PARTIAL"
  val SubmittedRemote = "SUBMITTED_REMOTE"

  /** Legal transitions (run_registry.py:64-85). */
  val allowed: Map[String, Set[String]] = Map(
    Pending -> Set(Running, SubmittedRemote, Failed),
    Running -> Set(Succeeded, Failed, Partial),
    SubmittedRemote -> Set(Succeeded, Failed),
    // resume re-enters RUNNING from any non-success terminal state
    Failed -> Set(Running),
    Partial -> Set(Running),
    Succeeded -> Set.empty)
}

/** File-backed registry: one JSON file per run under `baseDir`, written
  * atomically (tmp + move) so a crash mid-update never corrupts a record.
  * Driver-side only — run cardinality is human-scale, no Spark needed. */
final class RunRegistry(baseDir: String) {

  private def dir: Path = {
    val p = Paths.get(baseDir)
    Files.createDirectories(p)
    p
  }

  private def fileFor(runId: String): Path =
    dir.resolve(runId.replaceAll("[^A-Za-z0-9._-]", "_") + ".json")

  def register(runId: String, runDir: String): RunRecord = {
    val now = System.currentTimeMillis()
    val rec = RunRecord(runId, runDir, RunState.Pending, now, now)
    save(rec)
    rec
  }

  def transition(runId: String, to: String,
                 update: RunRecord => RunRecord = identity): RunRecord = {
    val cur = get(runId).getOrElse(
      throw new IllegalStateException(s"unknown run: $runId"))
    require(RunState.allowed.getOrElse(cur.state, Set.empty).contains(to),
      s"illegal transition ${cur.state} -> $to for $runId")
    val next = update(cur).copy(state = to,
      updatedMs = System.currentTimeMillis())
    save(next)
    next
  }

  def get(runId: String): Option[RunRecord] = {
    val p = fileFor(runId)
    if (!Files.exists(p)) None else Some(parse(Files.readString(p)))
  }

  def list(): Seq[RunRecord] = {
    val stream = Files.list(dir)
    try stream.iterator().asScala
      .filter { p =>
        val n = p.getFileName.toString
        n.endsWith(".json") && !n.startsWith(".")
      }
      .map(p => parse(Files.readString(p)))
      .toSeq.sortBy(_.createdMs)
    finally stream.close()
  }

  private def save(rec: RunRecord): Unit = {
    // hidden non-.json suffix: a crash-orphaned temp file must never be
    // picked up (or half-read) by list()
    val tmp = Files.createTempFile(dir, ".tmp_", ".part")
    Files.writeString(tmp, render(rec))
    Files.move(tmp, fileFor(rec.runId), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  private def esc(s: String): String =
    s.replace("\\", "\\\\").replace("\"", "\\\"")
      .replace("\n", "\\n").replace("\r", "\\r")

  def render(r: RunRecord): String =
    s"""{"run_id":"${esc(r.runId)}","run_dir":"${esc(r.runDir)}",""" +
    s""""state":"${r.state}","created_ms":${r.createdMs},""" +
    s""""updated_ms":${r.updatedMs},"rows":${r.rows},""" +
    s""""valid_rows":${r.validRows},"calls":${r.calls},""" +
    s""""cost":"${esc(r.cost)}","note":"${esc(r.note)}"}"""

  /** Inverse of esc(): one left-to-right scan consuming an escape pair at
    * a time — sequential global replaces corrupt strings whose ESCAPED form
    * contains backslash-n (e.g. a note holding a regex or Windows path). */
  private def unescape(s: String): String = {
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 'n'   => sb.append('\n')
          case 'r'   => sb.append('\r')
          case '"'   => sb.append('"')
          case '\\'  => sb.append('\\')
          case other => sb.append('\\').append(other)
        }
        i += 2
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  private def parse(txt: String): RunRecord = {
    def str(k: String): String =
      ("\"" + k + "\":\"((?:[^\"\\\\]|\\\\.)*)\"").r
        .findFirstMatchIn(txt).map(m => unescape(m.group(1)))
        .getOrElse("")
    def num(k: String): Long =
      ("\"" + k + "\":(-?[0-9]+)").r
        .findFirstMatchIn(txt).map(_.group(1).toLong).getOrElse(0L)
    RunRecord(str("run_id"), str("run_dir"), str("state"),
      num("created_ms"), num("updated_ms"), num("rows"),
      num("valid_rows"), num("calls"), str("cost"), str("note"))
  }
}

/** Observer wiring the registry into the enrichment lifecycle: RUNNING on
  * start, SUCCEEDED/PARTIAL (some rows without output) on completion,
  * FAILED with the error note on abort. */
final class RegistryObserver(registry: RunRegistry, runDir: String)
    extends Observer {
  def onEvent(e: PipelineEvent): Unit = e match {
    case RunStarted(id, _) =>
      if (registry.get(id).isEmpty) registry.register(id, runDir)
      registry.transition(id, RunState.Running)
    case RunCompleted(id, m, q) =>
      val to = if (q.validRows + m.skippedRows < m.rows) RunState.Partial
        else RunState.Succeeded
      registry.transition(id, to, r => r.copy(rows = m.rows,
        validRows = q.validRows, calls = m.calls, cost = m.cost.toString))
    case RunFailed(id, err) =>
      registry.transition(id, RunState.Failed,
        r => r.copy(note = String.valueOf(err).take(500)))
    case _ => ()
  }
}
