package graft

import java.math.{BigDecimal => JBigDecimal}
import java.net.InetSocketAddress
import java.nio.file.Files

import scala.collection.mutable.ArrayBuffer

import com.fasterxml.jackson.databind.ObjectMapper
import com.sun.net.httpserver.HttpServer
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.QualityReport
import graft.run._

class OtelSpec extends AnyFunSuite {

  private val mapper = new ObjectMapper()

  private def metrics(rows: Long) = RunMetrics(rows, calls = 4,
    tokensIn = 100, tokensOut = 40, cost = new JBigDecimal("0.012"),
    skippedRows = 0, durationMs = 1234)
  private val quality =
    QualityReport(10, 9, Map("out" -> 1L), 0.9, "good")

  private final class Collecting extends OtelSink {
    val out = ArrayBuffer.empty[(String, String)]
    def export(signal: String, json: String): Unit = out += ((signal, json))
  }

  test("run lifecycle becomes one OTLP trace + one metrics export") {
    val sink = new Collecting
    var now = 1000000000L
    val obs = new OtelObserver(sink, clockNanos = () => now)
    obs.onEvent(RunStarted("run-1", Some(10)))
    now += 5000000L
    obs.onEvent(ChunkCompleted("run-1", 0, new JBigDecimal("0.004")))
    now += 7000000L
    obs.onEvent(ChunkCompleted("run-1", 1, new JBigDecimal("0.012")))
    now += 2000000L
    obs.onEvent(RunCompleted("run-1", metrics(10), quality))

    assert(sink.out.map(_._1) === Seq("traces", "metrics"))
    val trace = mapper.readTree(sink.out(0)._2)
    val spans = trace.at("/resourceSpans/0/scopeSpans/0/spans")
    assert(spans.size() === 3)
    val root = spans.get(0)
    assert(root.get("name").asText === "graft.run")
    assert(root.get("traceId").asText.length === 32)
    assert(root.get("startTimeUnixNano").asText === "1000000000")
    assert(root.get("endTimeUnixNano").asText === "1014000000")
    assert(root.at("/status/code").asInt === 1)
    // chunk spans tile the run window and parent to the root
    val c0 = spans.get(1); val c1 = spans.get(2)
    assert(c0.get("parentSpanId").asText === root.get("spanId").asText)
    assert(c0.get("startTimeUnixNano").asText === "1000000000")
    assert(c0.get("endTimeUnixNano").asText === "1005000000")
    assert(c1.get("startTimeUnixNano").asText === "1005000000")
    assert(c1.get("endTimeUnixNano").asText === "1012000000")

    val m = mapper.readTree(sink.out(1)._2)
    val ms = m.at("/resourceMetrics/0/scopeMetrics/0/metrics")
    val byName = (0 until ms.size()).map(i => ms.get(i))
      .map(n => n.get("name").asText -> n).toMap
    assert(byName("graft.run.rows").at("/sum/dataPoints/0/asInt").asText === "10")
    assert(byName("graft.run.cost_usd").at("/sum/dataPoints/0/asDouble")
      .asDouble === 0.012)
    assert(byName("graft.run.success_rate").at("/gauge/dataPoints/0/asDouble")
      .asDouble === 0.9)
    assert(m.at("/resourceMetrics/0/resource/attributes/0/value/stringValue")
      .asText === "graft")
  }

  test("trace ids are deterministic in the runId — resume extends the trace") {
    val a = new Collecting; val b = new Collecting
    val oa = new OtelObserver(a, clockNanos = () => 1L)
    val ob = new OtelObserver(b, clockNanos = () => 2L)
    oa.onEvent(RunStarted("same-run", None))
    oa.onEvent(RunCompleted("same-run", metrics(1), quality))
    ob.onEvent(RunStarted("same-run", None))
    ob.onEvent(RunCompleted("same-run", metrics(1), quality))
    def tid(s: Collecting) = mapper.readTree(s.out(0)._2)
      .at("/resourceSpans/0/scopeSpans/0/spans/0/traceId").asText
    assert(tid(a) === tid(b))
  }

  test("failure exports an error-status span with the message") {
    val sink = new Collecting
    val obs = new OtelObserver(sink, clockNanos = () => 7L)
    obs.onEvent(RunStarted("run-x", None))
    obs.onEvent(RunFailed("run-x", "boom: budget exceeded"))
    val root = mapper.readTree(sink.out(0)._2)
      .at("/resourceSpans/0/scopeSpans/0/spans/0")
    assert(root.at("/status/code").asInt === 2)
    assert(root.at("/status/message").asText === "boom: budget exceeded")
  }

  test("error messages are PII-scrubbed before export") {
    val sink = new Collecting
    val obs = new OtelObserver(sink, clockNanos = () => 7L)
    obs.onEvent(RunStarted("run-y", None))
    obs.onEvent(RunFailed("run-y",
      "parse failed for user bob@example.com at 10.0.0.7: api_key=sk_abcdef1234567890XY"))
    val msg = mapper.readTree(sink.out(0)._2)
      .at("/resourceSpans/0/scopeSpans/0/spans/0/status/message").asText
    assert(msg == "parse failed for user [REDACTED] at [REDACTED]: [REDACTED]")
  }

  test("file sink appends parsable NDJSON envelopes") {
    val f = Files.createTempFile("graft_otel", ".ndjson")
    val sink = new OtelFileSink(f.toString)
    val obs = new OtelObserver(sink, clockNanos = () => 5L)
    obs.onEvent(RunStarted("r", None))
    obs.onEvent(RunCompleted("r", metrics(2), quality))
    val lines = Files.readAllLines(f)
    assert(lines.size() === 2)
    lines.forEach { l =>
      val n = mapper.readTree(l)
      assert(Set("traces", "metrics").contains(n.get("signal").asText))
      assert(n.get("body").isObject)
    }
  }

  test("OTLP/HTTP sink posts to /v1/traces and surfaces non-2xx") {
    val received = ArrayBuffer.empty[(String, String)]
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/v1/", { ex =>
      val body = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
      received.synchronized { received += ((ex.getRequestURI.getPath, body)) }
      val code = if (ex.getRequestURI.getPath.endsWith("metrics")) 503 else 200
      ex.sendResponseHeaders(code, 0)
      ex.getResponseBody.close()
    })
    server.start()
    try {
      val sink = new OtlpHttpSink(
        s"http://127.0.0.1:${server.getAddress.getPort}")
      val obs = new OtelObserver(sink, clockNanos = () => 5L)
      obs.onEvent(RunStarted("hr", None))
      // metrics leg 503s — route through the dispatcher, which must log
      // and swallow (observer failures never fail the run)
      val dispatcher = new ObserverDispatcher().register(obs)
      dispatcher.emit(RunCompleted("hr", metrics(3), quality))
      assert(received.synchronized(received.map(_._1)) ===
        Seq("/v1/traces", "/v1/metrics"))
      val trace = mapper.readTree(received.synchronized(received.head._2))
      assert(trace.at("/resourceSpans/0/scopeSpans/0/spans/0/name")
        .asText === "graft.run")
    } finally server.stop(0)
  }

  test("per-call spans: deterministic ids, bounded batches, flush at end") {
    val sink = new Collecting
    var now = 2000000000L
    val obs = new OtelObserver(sink, clockNanos = () => now)
    assert(obs.wantsCallGrain) // reference parity: call grain on by default
    obs.onEvent(RunStarted("run-c", Some(10)))
    def call(id: Long) = LlmCallCompleted("run-c", id, attempt = 7L,
      model = "mock-1", tokensIn = 10, tokensOut = 4,
      cost = new JBigDecimal("0.001"), latencyMs = 3.0, callRows = 2,
      failed = id == 1L)
    // one more than a batch: one full flush mid-run + remainder at end
    (0L until (OtelObserver.CallBatch + 1L)).foreach(i => obs.onEvent(call(i)))
    assert(sink.out.count(_._1 == "traces") === 1) // mid-run batch flush
    obs.onEvent(RunCompleted("run-c", metrics(10), quality))
    val traceBatches = sink.out.filter(_._1 == "traces").map(_._2)
    assert(traceBatches.size === 3) // batch + remainder + run trace
    val callSpans = traceBatches.flatMap { t =>
      val spans = mapper.readTree(t).at("/resourceSpans/0/scopeSpans/0/spans")
      (0 until spans.size()).map(spans.get(_))
    }.filter(_.get("name").asText == "graft.llm_call")
    assert(callSpans.size === OtelObserver.CallBatch + 1)
    // deterministic span ids, all distinct, parented to the run root
    assert(callSpans.map(_.get("spanId").asText).distinct.size ===
      callSpans.size)
    val rootId = mapper.readTree(traceBatches.last)
      .at("/resourceSpans/0/scopeSpans/0/spans/0/spanId").asText
    assert(callSpans.forall(_.get("parentSpanId").asText == rootId))
    // failed call carries STATUS_CODE_ERROR; usage attrs ride along
    val failed = callSpans.filter(s => s.at("/status/code").asInt == 2)
    assert(failed.size === 1)
    // replaying the SAME events yields the SAME span ids (resume contract)
    val sink2 = new Collecting
    val obs2 = new OtelObserver(sink2, clockNanos = () => now)
    obs2.onEvent(RunStarted("run-c", Some(10)))
    obs2.onEvent(call(3L))
    obs2.onEvent(RunCompleted("run-c", metrics(10), quality))
    val replayed = sink2.out.filter(_._1 == "traces").map(_._2).flatMap { t =>
      val spans = mapper.readTree(t).at("/resourceSpans/0/scopeSpans/0/spans")
      (0 until spans.size()).map(spans.get(_))
    }.filter(_.get("name").asText == "graft.llm_call")
    assert(replayed.map(_.get("spanId").asText).toSet.subsetOf(
      callSpans.map(_.get("spanId").asText).toSet))
    // opt-out constructs a lifecycle-only observer
    assert(!new OtelObserver(sink, callGrain = false).wantsCallGrain)
  }
}
