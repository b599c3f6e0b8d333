package graft

import java.io.{PipedInputStream, PipedOutputStream, PrintWriter}
import java.nio.charset.StandardCharsets
import java.nio.file.Files

import com.fasterxml.jackson.databind.ObjectMapper

import graft.llm.MockLlmClient
import graft.mcp.McpServer

/** Drives the MCP server through its actual wire protocol (newline-
  * delimited JSON-RPC over piped streams): initialize handshake, tool
  * discovery, estimate, async run → status poll → collect, mandatory
  * budget, and protocol errors.
  */
class McpSpec extends SparkSpec {

  private val mapper = new ObjectMapper()

  private def withServer[A](f: (PrintWriter, () => com.fasterxml.jackson.databind.JsonNode) => A): A = {
    val toServer = new PipedOutputStream()
    val serverIn = new PipedInputStream(toServer, 1 << 16)
    val fromServer = new PipedOutputStream()
    val serverOut = new PipedInputStream(fromServer, 1 << 16)
    val work = Files.createTempDirectory("graft_mcp").toString
    val service = new McpServer.Service(spark, new MockLlmClient(), work)
    val t = new Thread(() => McpServer.serve(serverIn, fromServer, service),
      "mcp-under-test")
    t.setDaemon(true)
    t.start()
    val writer = new PrintWriter(
      new java.io.OutputStreamWriter(toServer, StandardCharsets.UTF_8), true)
    val reader = new java.io.BufferedReader(
      new java.io.InputStreamReader(serverOut, StandardCharsets.UTF_8))
    try f(writer, () => mapper.readTree(reader.readLine()))
    finally { writer.close() }
  }

  private def call(id: Int, tool: String, args: (String, Any)*): String = {
    val a = mapper.createObjectNode()
    args.foreach {
      case (k, v: String) => a.put(k, v)
      case (k, v: Double) => a.put(k, v)
      case (k, v: Int) => a.put(k, v)
      case (k, v) => a.put(k, String.valueOf(v))
    }
    val params = mapper.createObjectNode()
    params.put("name", tool)
    params.set[com.fasterxml.jackson.databind.JsonNode]("arguments", a)
    val req = mapper.createObjectNode()
    req.put("jsonrpc", "2.0"); req.put("id", id); req.put("method", "tools/call")
    req.set[com.fasterxml.jackson.databind.JsonNode]("params", params)
    mapper.writeValueAsString(req)
  }

  /** The tool result's single text block parsed back to JSON. */
  private def toolJson(rsp: com.fasterxml.jackson.databind.JsonNode) =
    mapper.readTree(rsp.path("result").path("content").path(0)
      .path("text").asText())

  test("initialize handshake and tool discovery") {
    withServer { (w, read) =>
      w.println("""{"jsonrpc":"2.0","id":1,"method":"initialize","params":{}}""")
      val init = read()
      assert(init.path("result").path("protocolVersion").asText ==
        McpServer.ProtocolVersion)
      assert(init.path("result").path("serverInfo").path("name").asText == "graft")
      w.println("""{"jsonrpc":"2.0","method":"notifications/initialized"}""")
      w.println("""{"jsonrpc":"2.0","id":2,"method":"tools/list","params":{}}""")
      val tools = read().path("result").path("tools")
      val names = (0 until tools.size).map(tools.get(_).path("name").asText)
      assert(names == Seq("graft_estimate", "graft_run", "graft_status",
        "graft_collect", "graft_validate", "graft_list_providers",
        "graft_list_checkpoints"))
      assert(tools.get(1).path("inputSchema").path("required").toString
        .contains("budget"))
      // unknown method -> -32601
      w.println("""{"jsonrpc":"2.0","id":3,"method":"bogus/thing"}""")
      assert(read().path("error").path("code").asInt == -32601)
    }
  }

  test("estimate -> run -> status poll -> collect, full tool arc") {
    val in = Files.createTempDirectory("graft_mcp_in")
      .resolve("in.csv").toString
    Files.writeString(java.nio.file.Paths.get(in),
      "text\n" + (0 until 40).map(i => s"row $i").mkString("\n"))
    val outPath = Files.createTempDirectory("graft_mcp_out")
      .resolve("out.parquet").toString
    val cfg = "dataset:\n  input_columns: [text]\nprompt:\n  " +
      "template: \"M: {text}\"\noutput:\n  output_columns: [res]"
    withServer { (w, read) =>
      w.println(call(10, "graft_estimate", "config_yaml" -> cfg,
        "input_path" -> in))
      val est = toolJson(read())
      assert(est.path("total_rows").asLong == 40)
      assert(est.path("confidence").asText == "sample-based")

      // budget is mandatory and positive
      w.println(call(11, "graft_run", "config_yaml" -> cfg,
        "input_path" -> in, "output_path" -> outPath, "budget" -> -1.0))
      val denied = read()
      assert(denied.path("result").path("isError").asBoolean)
      assert(toolJson(denied).path("error").asText.contains("positive"))

      w.println(call(12, "graft_run", "config_yaml" -> cfg,
        "input_path" -> in, "output_path" -> outPath, "budget" -> 5.0))
      val runId = toolJson(read()).path("run_id").asText
      assert(runId.startsWith("mcp-"))

      var state = ""
      val deadline = System.nanoTime() + 60L * 1000000000L
      while (state != "SUCCEEDED" && state != "FAILED" &&
        System.nanoTime() < deadline) {
        Thread.sleep(200)
        w.println(call(13, "graft_status", "run_id" -> runId))
        state = toolJson(read()).path("state").asText
      }
      assert(state == "SUCCEEDED", s"run ended $state")

      w.println(call(14, "graft_collect", "run_id" -> runId))
      val coll = toolJson(read())
      assert(coll.path("rows").asLong == 40)
      assert(coll.path("output_path").asText == outPath)
      // the async worker really wrote the output
      val got = spark.read.parquet(outPath)
      assert(got.count() == 40)
      assert(got.columns.contains("res"))

      // unknown run id answers in-band, not with a crash
      w.println(call(15, "graft_collect", "run_id" -> "nope"))
      assert(toolJson(read()).path("error").asText.contains("unknown run"))
    }
  }

  test("graft_validate and graft_list_providers answer over the wire") {
    val good = "dataset:\n  input_columns: [text]\nprompt:\n  " +
      "template: \"W: {text}\"\noutput:\n  output_columns: [res]"
    val bad = "dataset:\n  input_columns: [text]\nprompt:\n  " +
      "template: \"W: {nope}\"\noutput:\n  output_columns: [res]"
    withServer { (w, read) =>
      w.println(call(20, "graft_validate", "config_yaml" -> good))
      val ok = toolJson(read())
      assert(ok.path("valid").asBoolean)
      assert(ok.path("input_columns").asText == "text")
      w.println(call(21, "graft_validate", "config_yaml" -> bad))
      val no = toolJson(read())
      assert(!no.path("valid").asBoolean)
      assert(no.path("error").asText.contains("nope"))
      w.println(call(22, "graft_list_providers"))
      val prov = toolJson(read()).path("providers").asText
      assert(prov.contains("mock") && prov.contains("http") &&
        prov.contains("proc"))
      // list-checkpoints: empty registry -> empty listing, not an error
      w.println(call(23, "graft_list_checkpoints"))
      assert(toolJson(read()).path("checkpoints").asText == "")
    }
  }

  test("graft_status reports live progress while a job is RUNNING") {
    val in = Files.createTempDirectory("graft_mcp_prog_in")
      .resolve("in.csv").toString
    Files.writeString(java.nio.file.Paths.get(in),
      "text\n" + (0 until 40).map(i => s"live $i").mkString("\n"))
    val outPath = Files.createTempDirectory("graft_mcp_prog_out")
      .resolve("out.parquet").toString
    // small chunks + per-call latency so the run spends real time RUNNING
    val cfg = "dataset:\n  input_columns: [text]\nprompt:\n  " +
      "template: \"MP: {text}\"\nprocessing:\n  chunk_rows: 5\n" +
      "output:\n  output_columns: [res]"
    val work = Files.createTempDirectory("graft_mcp_prog").toString
    val service = new McpServer.Service(spark,
      new MockLlmClient(simulatedLatencyMs = 25), work)
    val runId = service.run(cfg, in, outPath, BigDecimal(5))
    val snaps = scala.collection.mutable.ArrayBuffer
      .empty[(String, Long, Long, Long)]
    var state = ""
    val deadline = System.nanoTime() + 120L * 1000000000L
    while (state != "SUCCEEDED" && state != "FAILED" &&
        System.nanoTime() < deadline) {
      val s = service.status(runId)
      state = s("state").toString
      snaps += ((state, s("rows").asInstanceOf[Long],
        s("calls").asInstanceOf[Long], s("total_rows").asInstanceOf[Long]))
      Thread.sleep(20)
    }
    assert(state == "SUCCEEDED", s"run ended $state")
    val mid = snaps.filter(s => s._1 == "RUNNING" && s._2 > 0)
    assert(mid.nonEmpty, "graft_status never showed mid-run progress")
    assert(mid.exists(_._2 < 40), "only end-state counters observed")
    assert(mid.forall(_._4 == 40), "total_rows absent from live status")
    val rows = snaps.filter(_._1 == "RUNNING").map(_._2).toSeq
    assert(rows == rows.sorted, "live counters must be monotone")
    assert(service.status(runId)("rows") == 40L)
  }
}
