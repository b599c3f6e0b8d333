package graft.run

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardOpenOption}
import java.security.MessageDigest
import java.util.Base64

import scala.collection.mutable

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode

/** Langfuse-flavored exporter over the same dispatcher seam as
  * [[OtelObserver]] (reference:
  * ondine/observability/observers/langfuse_observer.py — pipeline trace,
  * nested generation with usage/cost, final-metrics update). Instead of
  * the SDK this speaks Langfuse's PUBLIC batch-ingestion wire directly:
  * `POST {host}/api/public/ingestion` with
  * `{"batch":[{id,timestamp,type,body},…]}` and Basic `pk:sk` auth —
  * the documented envelope every Langfuse SDK ultimately emits, so the
  * output ingests into a real deployment unchanged.
  *
  * Event mapping (driver-side only — per-call granularity arrives via
  * the post-run ledger REPLAY, never from the executor hot path; same
  * judgment as the OTel adapter):
  *   - LlmCallCompleted → `generation-create` per LLM call with model,
  *                    usage_details, cost and latency — the reference's
  *                    LLMCallEvent grain (unified_litellm_client.py:473-531)
  *                    with ids deterministic from (runId, attempt, callId)
  *                    so a resumed run's re-replay upserts, not duplicates
  *   - RunStarted   → `trace-create` (id deterministic from the runId —
  *                    32-char lowercase hex, the same rule the reference
  *                    applies via `uuid.hex`; a resumed run EXTENDS its
  *                    original trace)
  *   - ChunkCompleted → `span-create` nested under the trace with the
  *                    chunk index + spend so far
  *   - RunCompleted → one aggregate `generation-create` carrying
  *                    usage_details {input, output, total} and cost —
  *                    the reference's generation shape at run grain —
  *                    plus a `trace-create` upsert writing the final
  *                    output metrics (Langfuse upserts by id)
  *   - RunFailed    → `event-create` at level ERROR with the sanitized
  *                    message ([[TraceSanitizer]] — error text can embed
  *                    user data), plus the failure upsert on the trace
  *
  * Sink failures never fail the run (dispatcher guarantee).
  */
final class LangfuseObserver(
    sink: LangfuseSink,
    environment: String = "default",
    clockMs: () => Long = () => System.currentTimeMillis(),
    /** Per-call generations via ledger replay (reference parity:
      * langfuse sees one generation per LLM call). Default ON — the cost
      * is post-run and O(calls); switch off for runs where run-grain
      * aggregates suffice. */
    callGrain: Boolean = true)
  extends Observer {

  override def wantsCallGrain: Boolean = callGrain

  private val mapper = new ObjectMapper()
  private val starts = mutable.Map.empty[String, Long]

  private def hex32(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes(StandardCharsets.UTF_8))
      .map(b => f"$b%02x").mkString
  private def traceId(runId: String): String = hex32(s"graft:$runId")

  private def iso(ms: Long): String =
    java.time.Instant.ofEpochMilli(ms).toString

  private def envelope(eventType: String, idSeed: String,
                       ms: Long): (ObjectNode, ObjectNode) = {
    val root = mapper.createObjectNode()
    val batch = root.putArray("batch")
    val ev = batch.addObject()
    // deterministic event id: Langfuse dedupes replayed ids, so a Spark
    // driver retry cannot double-count a chunk span
    ev.put("id", hex32(s"graft-event:$idSeed"))
    ev.put("timestamp", iso(ms))
    ev.put("type", eventType)
    (root, ev.putObject("body"))
  }

  private def send(root: ObjectNode): Unit =
    sink.ingest(mapper.writeValueAsString(root))

  def onEvent(e: PipelineEvent): Unit = e match {
    case RunStarted(runId, rows) =>
      val now = clockMs()
      starts(runId) = now
      val (root, body) = envelope("trace-create", s"$runId:start", now)
      body.put("id", traceId(runId))
      body.put("timestamp", iso(now))
      body.put("name", "graft-pipeline")
      body.put("environment", environment)
      val md = body.putObject("metadata")
      md.put("run_id", runId)
      rows.foreach(r => md.put("total_rows", r))
      send(root)

    case ChunkCompleted(runId, idx, spent) =>
      val now = clockMs()
      val (root, body) = envelope("span-create", s"$runId:chunk:$idx", now)
      body.put("id", hex32(s"graft-span:$runId:chunk:$idx"))
      body.put("traceId", traceId(runId))
      body.put("name", s"chunk-$idx")
      body.put("startTime", iso(now))
      body.put("endTime", iso(now))
      val md = body.putObject("metadata")
      md.put("chunk_index", idx)
      md.put("cost_spent_usd", spent.doubleValue)
      send(root)

    case LlmCallCompleted(runId, callId, attempt, model, tIn, tOut, cost,
        latMs, callRows, failed) =>
      // one generation per LLM call, replayed from the responses ledger
      // (reference grain: unified_litellm_client.py:473-531 LLMCallEvent
      // → langfuse_observer generation). Ids are deterministic from
      // (runId, attempt, callId): a resumed run re-emits the same ids and
      // Langfuse upserts — never double-counts.
      val now = clockMs()
      val (root, body) = envelope("generation-create",
        s"$runId:call:$attempt:$callId", now)
      body.put("id", hex32(s"graft-gen:$runId:$attempt:$callId"))
      body.put("traceId", traceId(runId))
      body.put("name", s"llm-call-$callId")
      body.put("startTime", iso(now - math.max(0L, latMs.toLong)))
      body.put("endTime", iso(now))
      if (model != null) body.put("model", model)
      if (failed) body.put("level", "ERROR")
      val u = body.putObject("usageDetails")
      u.put("input", tIn)
      u.put("output", tOut)
      u.put("total", tIn + tOut)
      body.putObject("costDetails").put("total", cost.doubleValue)
      val md = body.putObject("metadata")
      md.put("call_id", callId)
      md.put("attempt", attempt)
      md.put("call_rows", callRows)
      md.put("latency_ms", latMs)
      send(root)

    case RunCompleted(runId, m, q) =>
      val now = clockMs()
      val startMs = starts.remove(runId).getOrElse(now)
      // the reference's generation observation, at run grain: model +
      // usage_details + cost (langfuse_observer.py:150-165)
      val (gRoot, g) = envelope("generation-create", s"$runId:gen", now)
      g.put("id", hex32(s"graft-gen:$runId"))
      g.put("traceId", traceId(runId))
      g.put("name", "llm-aggregate")
      g.put("startTime", iso(startMs))
      g.put("endTime", iso(now))
      val usage = g.putObject("usageDetails")
      usage.put("input", m.tokensIn)
      usage.put("output", m.tokensOut)
      usage.put("total", m.tokensIn + m.tokensOut)
      g.putObject("costDetails").put("total", m.cost.doubleValue)
      val gm = g.putObject("metadata")
      gm.put("calls", m.calls)
      gm.put("latency_ms", m.durationMs)
      send(gRoot)
      // final-metrics upsert on the trace (on_pipeline_end semantics)
      val (tRoot, t) = envelope("trace-create", s"$runId:end", now)
      t.put("id", traceId(runId))
      t.put("name", "graft-pipeline")
      t.put("environment", environment)
      val out = t.putObject("output")
      out.put("success", true)
      out.put("rows_processed", m.rows)
      out.put("rows_succeeded", q.validRows)
      out.put("rows_failed", m.rows - q.validRows - m.skippedRows)
      out.put("total_cost", m.cost.doubleValue)
      out.put("total_tokens", m.tokensIn + m.tokensOut)
      out.put("duration_ms", m.durationMs)
      send(tRoot)

    case RunFailed(runId, err) =>
      val now = clockMs()
      starts.remove(runId)
      val msg = TraceSanitizer.sanitizeText(String.valueOf(err))
      val (eRoot, ev) = envelope("event-create", s"$runId:error", now)
      ev.put("id", hex32(s"graft-err:$runId"))
      ev.put("traceId", traceId(runId))
      ev.put("name", "pipeline-error")
      ev.put("level", "ERROR")
      ev.put("statusMessage", msg)
      send(eRoot)
      val (tRoot, t) = envelope("trace-create", s"$runId:end", now)
      t.put("id", traceId(runId))
      t.put("name", "graft-pipeline")
      t.put("environment", environment)
      val out = t.putObject("output")
      out.put("success", false)
      out.put("error", msg)
      send(tRoot)

    case _ => () // live progress is the registry's concern
  }
}

/** Where ingestion batches go. */
trait LangfuseSink {
  def ingest(batchJson: String): Unit
}

/** The real wire: `POST {host}/api/public/ingestion` with HTTP Basic
  * `publicKey:secretKey` (Langfuse's documented server-side auth; keys
  * come from config or the standard LANGFUSE_* environment variables, as
  * in the reference's client init). Non-2xx surfaces to the dispatcher,
  * which logs and never fails the run. */
final class LangfuseHttpSink(
    host: String,
    publicKey: String,
    secretKey: String,
    timeoutMs: Long = 5000) extends LangfuseSink {
  private val client = java.net.http.HttpClient.newBuilder()
    .connectTimeout(java.time.Duration.ofMillis(timeoutMs)).build()
  private val auth = "Basic " + Base64.getEncoder.encodeToString(
    s"$publicKey:$secretKey".getBytes(StandardCharsets.UTF_8))

  def ingest(batchJson: String): Unit = {
    val req = java.net.http.HttpRequest.newBuilder()
      .uri(java.net.URI.create(
        s"${host.stripSuffix("/")}/api/public/ingestion"))
      .timeout(java.time.Duration.ofMillis(timeoutMs))
      .header("Content-Type", "application/json")
      .header("Authorization", auth)
      .POST(java.net.http.HttpRequest.BodyPublishers.ofString(batchJson))
      .build()
    val rsp = client.send(req,
      java.net.http.HttpResponse.BodyHandlers.ofString())
    // 207 = partial success, the documented per-event status envelope
    if (rsp.statusCode() / 100 != 2)
      throw new java.io.IOException(
        s"langfuse ingestion HTTP ${rsp.statusCode()}: ${rsp.body().take(200)}")
  }
}

object LangfuseHttpSink {
  /** Reference-parity env config: LANGFUSE_PUBLIC_KEY / LANGFUSE_SECRET_KEY
    * / LANGFUSE_HOST (cloud default). */
  def fromEnv(env: Map[String, String] = sys.env): LangfuseHttpSink =
    new LangfuseHttpSink(
      env.getOrElse("LANGFUSE_HOST", "https://cloud.langfuse.com"),
      env.getOrElse("LANGFUSE_PUBLIC_KEY",
        throw new IllegalArgumentException("LANGFUSE_PUBLIC_KEY unset")),
      env.getOrElse("LANGFUSE_SECRET_KEY",
        throw new IllegalArgumentException("LANGFUSE_SECRET_KEY unset")))
}

/** NDJSON file sink — one batch per line; the local-disk stand-in. */
final class LangfuseFileSink(path: String) extends LangfuseSink {
  def ingest(batchJson: String): Unit =
    Files.write(Paths.get(path), (batchJson + "\n").getBytes(StandardCharsets.UTF_8),
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)
}
