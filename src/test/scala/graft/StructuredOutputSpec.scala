package graft

import java.io.OutputStream
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicInteger

import com.fasterxml.jackson.databind.ObjectMapper
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.types._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.llm._

/** Provider-native structured-output modes: layered detection
  * (instructor_mode.py:103-246 semantics), JSON-schema rendering, narrow
  * rejection classification, and the sticky fallback chain driven through
  * a real loopback provider that structurally rejects modes. */
class StructuredOutputSpec extends AnyFunSuite with BeforeAndAfterAll {

  import StructuredMode._

  // ---------------------------------------------------------------- detection

  test("layer 1: explicit user override beats every other signal") {
    assert(StructuredOutput.detect("gpt-4o", Some("json")) == Json)
    assert(StructuredOutput.detect("totally-unknown", Some("tools")) == Tools)
    assert(StructuredOutput.detect("claude-3-5-sonnet", Some("json_schema")) == JsonSchema)
    assert(StructuredOutput.detect("gpt-4o", Some("auto")) == JsonSchema)
    intercept[IllegalArgumentException] {
      StructuredOutput.detect("gpt-4o", Some("yaml"))
    }
  }

  test("layer 2: reasoning effort forces a non-tools mode") {
    assert(StructuredOutput.detect("gpt-4o", None, hasReasoningEffort = true) == Json)
  }

  test("layer 3: model capability table — schema-capable models get JsonSchema") {
    assert(StructuredOutput.detect("gpt-4o") == JsonSchema)
    assert(StructuredOutput.detect("openai/gpt-4o-mini") == JsonSchema)
    assert(StructuredOutput.detect("gpt-4-turbo") == Tools) // function calling, no schema
    assert(StructuredOutput.detect("gpt-3.5-turbo") == Tools)
    assert(StructuredOutput.detect("claude-3-5-sonnet-20241022") == Tools)
  }

  test("layer 3: provider registry vetoes a capability-table tools claim") {
    // llama family has no tools claim; via groq the registry also vetoes.
    assert(StructuredOutput.detect("groq/llama-3.1-70b") == Json)
    assert(StructuredOutput.detect("ollama/llama-3.1-8b") == Json)
  }

  test("layer 4/5: provider registry fallback, then safest default") {
    assert(StructuredOutput.detect("mistral/ministral-nouveau") == Tools)
    assert(StructuredOutput.detect("huggingface/some-community-model") == Json)
    assert(StructuredOutput.detect("never-heard-of-it") == Json)
  }

  test("gateway namespace is not a provider: unregistered prefix falls through") {
    // "myproxy" is not a registered provider; the model behind it is.
    assert(StructuredOutput.detect("myproxy/claude-3-haiku") == Tools)
  }

  // ---------------------------------------------------------------- chain

  test("fallback chain: most to least capable, Plain the universal terminal, no self") {
    assert(StructuredOutput.fallbackChain(JsonSchema, "gpt-4o") == List(Tools, Json, Plain))
    assert(StructuredOutput.fallbackChain(Tools, "gpt-4") == List(JsonSchema, Json, Plain))
    assert(StructuredOutput.fallbackChain(Json, "whatever") == List(JsonSchema, Tools, Plain))
  }

  test("anthropic chain never contains JsonSchema") {
    assert(StructuredOutput.fallbackChain(Tools, "claude-3-opus") == List(Json, Plain))
    assert(StructuredOutput.fallbackChain(Json, "anthropic/claude-3-haiku") == List(Tools, Plain))
  }

  // ---------------------------------------------------------------- rejection

  test("rejection classification is narrow: typed transient/fatal never switch") {
    assert(!StructuredOutput.isModeRejection(new RateLimitError("429")))
    assert(!StructuredOutput.isModeRejection(new NetworkError("conn reset")))
    assert(!StructuredOutput.isModeRejection(new AuthError("bad key")))
    assert(!StructuredOutput.isModeRejection(new QuotaError("billing hard limit")))
    assert(!StructuredOutput.isModeRejection(new ModelNotFoundError("gone")))
    assert(!StructuredOutput.isModeRejection(new RuntimeException("boom")))
    // generic 4xx with a structural wording DOES switch
    assert(StructuredOutput.isModeRejection(
      new LlmError("400: response_format is not supported by this model", false)))
    assert(StructuredOutput.isModeRejection(
      new LlmError("400: tool use is not supported", false)))
    // generic 4xx without one does not
    assert(!StructuredOutput.isModeRejection(
      new LlmError("400: max_tokens too large", false)))
    assert(StructuredOutput.isModeRejection(new ModeRejectionError("2 tool calls")))
  }

  test("real provider wordings with quoted parameter names classify as rejections") {
    assert(StructuredOutput.isModeRejection(new LlmError(
      "400: Invalid parameter: 'response_format' of type 'json_schema' is not supported with this model.",
      false)))
    assert(StructuredOutput.isModeRejection(new LlmError(
      "400: Unsupported parameter: 'response_format' is not supported with this model.",
      false)))
    // strict-mode schema rejection (e.g. a map column) is structural too
    assert(StructuredOutput.isModeRejection(new LlmError(
      "400: Invalid schema for response_format 'output': 'additionalProperties' is required to be supplied and to be false.",
      false)))
  }

  test("fallback chain drops Tools for reasoning models and vetoed providers") {
    assert(StructuredOutput.fallbackChain(Json, "gpt-4o",
      hasReasoningEffort = true) == List(JsonSchema, Plain))
    assert(StructuredOutput.fallbackChain(Json, "groq/llama-3.1-70b") == List(JsonSchema, Plain))
    assert(StructuredOutput.fallbackChain(Json, "ollama/llama-3.1-8b") == List(JsonSchema, Plain))
    // gateway-hosted llama keeps Tools: the gateway may well support it
    assert(StructuredOutput.fallbackChain(Json, "openrouter/llama-3.1-70b") ==
      List(JsonSchema, Tools, Plain))
  }

  test("family no-tools verdict binds through a DIRECT provider, not just bare ids") {
    // o1 served by openai/azure is the model as-is: probing tools is doomed
    assert(StructuredOutput.fallbackChain(Json, "openai/o1-mini") == List(JsonSchema, Plain))
    assert(StructuredOutput.fallbackChain(Json, "o1-mini") == List(JsonSchema, Plain))
    // …but a translating gateway may shim the tool protocol, so keep it
    assert(StructuredOutput.fallbackChain(Json, "openrouter/o1-mini") ==
      List(JsonSchema, Tools, Plain))
  }

  test("family keys match at token boundaries only: no 'o1' inside 'neo1'") {
    // 'gpt-neo1.3b' must not be classified as the o1 reasoning family —
    // Tools would be wrongly vetoed for an unrelated model id.
    assert(StructuredOutput.fallbackChain(Json, "gpt-neo1.3b") ==
      List(JsonSchema, Tools, Plain))
    // digits still glue on: llama3.1 is the llama family (no tools, bare id)
    assert(StructuredOutput.fallbackChain(Json, "llama3.1-8b-instruct") ==
      List(JsonSchema, Plain))
  }

  test("parameter-level tools rejections classify structurally") {
    assert(StructuredOutput.isModeRejection(new LlmError(
      "400: Unsupported parameter: 'parallel_tool_calls' is not supported with this model.",
      false)))
    assert(StructuredOutput.isModeRejection(new LlmError(
      "400: 'tool_choice' is not supported by this server build", false)))
  }

  // ---------------------------------------------------------------- schema

  test("jsonSchema renders a StructType as a strict object schema") {
    val st = StructType(Seq(
      StructField("label", StringType),
      StructField("score", IntegerType),
      StructField("weight", DoubleType),
      StructField("flags", ArrayType(BooleanType)),
      StructField("nested", StructType(Seq(StructField("k", LongType))))))
    val json = StructuredOutput.jsonSchema(st)
    val node = new ObjectMapper().readTree(json)
    assert(node.path("type").asText == "object")
    assert(!node.path("additionalProperties").asBoolean)
    assert(node.path("properties").path("label").path("type").asText == "string")
    assert(node.path("properties").path("score").path("type").asText == "integer")
    assert(node.path("properties").path("weight").path("type").asText == "number")
    assert(node.path("properties").path("flags").path("type").asText == "array")
    assert(node.path("properties").path("flags").path("items").path("type").asText == "boolean")
    assert(node.path("properties").path("nested").path("properties")
      .path("k").path("type").asText == "integer")
    val req = (0 until node.path("required").size).map(node.path("required").get(_).asText)
    assert(req == Seq("label", "score", "weight", "flags", "nested"))
  }

  test("map columns render as additionalProperties value schemas, not bare objects") {
    val st = StructType(Seq(
      StructField("tags", MapType(StringType, IntegerType))))
    val node = new ObjectMapper().readTree(StructuredOutput.jsonSchema(st))
    val tags = node.path("properties").path("tags")
    assert(tags.path("type").asText == "object")
    assert(tags.path("additionalProperties").path("type").asText == "integer")
  }

  test("negotiator handles sharing a scope share ONE negotiation across serialization") {
    val key = s"spec-scope-${System.nanoTime()}"
    val a = new ModeNegotiator(key, JsonSchema, List(Tools, Json))
    // Java round-trip = what a Spark task closure does to the handle.
    val bos = new java.io.ByteArrayOutputStream()
    val oos = new java.io.ObjectOutputStream(bos)
    oos.writeObject(a); oos.close()
    val b = new java.io.ObjectInputStream(
      new java.io.ByteArrayInputStream(bos.toByteArray))
      .readObject().asInstanceOf[ModeNegotiator]
    // drive the ORIGINAL through a rejection…
    val out = a.attempt { m =>
      if (m == JsonSchema) throw new LlmError("json_schema is not supported", false)
      else "ok"
    }
    assert(out == "ok")
    // …and the deserialized copy observes the switch (shared state, so a
    // second task does NOT re-pay the doomed probe).
    assert(b.mode == Tools)
    assert(b.switches == 1)
  }

  // ---------------------------------------------------------------- loopback

  private var server: HttpServer = _
  private var port: Int = _
  private val mapper = new ObjectMapper()

  /** Requests per mode, keyed by path — the negotiation audit trail. */
  private val seen = new java.util.concurrent.ConcurrentHashMap[String, AtomicInteger]()
  private def bump(path: String, mode: String): Int =
    seen.computeIfAbsent(s"$path:$mode", _ => new AtomicInteger).incrementAndGet()
  private def count(path: String, mode: String): Int =
    Option(seen.get(s"$path:$mode")).map(_.get).getOrElse(0)

  /** Mode of an incoming chat-completions body, by its wire shape. */
  private def modeOf(body: String): String = {
    val n = mapper.readTree(body)
    if (n.has("tools")) "tools"
    else if (n.path("response_format").path("type").asText == "json_schema") "json_schema"
    else if (n.path("response_format").path("type").asText == "json_object") "json"
    else "plain"
  }

  private def respond(ex: HttpExchange, status: Int, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.sendResponseHeaders(status, bytes.length)
    val os: OutputStream = ex.getResponseBody
    os.write(bytes); os.close()
  }

  private def toolReply(args: String): String =
    s"""{"choices":[{"message":{"role":"assistant","content":null,
       |"tool_calls":[{"id":"c1","type":"function","function":
       |{"name":"output","arguments":${mapper.writeValueAsString(args)}}}]}}],
       |"usage":{"prompt_tokens":10,"completion_tokens":5}}"""
      .stripMargin.replace("\n", "")

  private def contentReply(content: String): String =
    s"""{"choices":[{"message":{"role":"assistant","content":
       |${mapper.writeValueAsString(content)}}}],
       |"usage":{"prompt_tokens":10,"completion_tokens":5}}"""
      .stripMargin.replace("\n", "")

  private val rejectRF = """{"error":{"message":"response_format is not supported by this model"}}"""
  private val rejectTools = """{"error":{"message":"tool calling is not supported"}}"""

  override def beforeAll(): Unit = {
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)

    // Accepts tools, structurally rejects json_schema — the "gateway lied
    // about capabilities" provider.
    server.createContext("/toolsOnly", (ex: HttpExchange) => {
      val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
      val m = modeOf(body); bump("/toolsOnly", m)
      m match {
        case "json_schema" => respond(ex, 400, rejectRF)
        case "tools" => respond(ex, 200, toolReply("""{"label":"via-tools","score":7}"""))
        case _ => respond(ex, 200, contentReply("""{"label":"via-json","score":1}"""))
      }
    })

    // 429s json_schema — transient, must NOT advance the chain.
    server.createContext("/throttled", (ex: HttpExchange) => {
      val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
      val m = modeOf(body); bump("/throttled", m)
      if (m == "json_schema") respond(ex, 429, """{"error":"slow down"}""")
      else respond(ex, 200, contentReply("{}"))
    })

    // Rejects every structured mode with structural wordings.
    server.createContext("/nothing", (ex: HttpExchange) => {
      val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
      val m = modeOf(body); bump("/nothing", m)
      m match {
        case "tools" => respond(ex, 400, rejectTools)
        case _ => respond(ex, 400, rejectRF)
      }
    })

    // Breaks the tool protocol (two parallel calls) but honors json mode.
    server.createContext("/parallel", (ex: HttpExchange) => {
      val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
      val m = modeOf(body); bump("/parallel", m)
      m match {
        case "json_schema" => respond(ex, 400, rejectRF)
        case "tools" =>
          val one = """{"id":"c1","type":"function","function":{"name":"output","arguments":"{}"}}"""
          respond(ex, 200,
            s"""{"choices":[{"message":{"role":"assistant","content":null,
               |"tool_calls":[$one,$one]}}]}""".stripMargin.replace("\n", ""))
        case _ => respond(ex, 200, contentReply("""{"label":"via-json-fallback","score":3}"""))
      }
    })

    // The pre-negotiation world: a provider with ZERO structured-output
    // support — every structured mode 400s structurally, only a plain
    // request (no response_format at all) succeeds.
    server.createContext("/promptOnly", (ex: HttpExchange) => {
      val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
      val m = modeOf(body); bump("/promptOnly", m)
      m match {
        case "tools" => respond(ex, 400, rejectTools)
        case "json_schema" | "json" => respond(ex, 400, rejectRF)
        case _ => respond(ex, 200, contentReply("""{"label":"via-plain","score":5}"""))
      }
    })

    // Ignores parallel_tool_calls:false and adds a hallucinated sibling
    // call — but the forced call, addressed by name, is present exactly
    // once.
    server.createContext("/multiNamed", (ex: HttpExchange) => {
      val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
      val m = modeOf(body); bump("/multiNamed", m)
      m match {
        case "tools" =>
          val named = """{"id":"c1","type":"function","function":{"name":"output","arguments":"{\"label\":\"named\",\"score\":4}"}}"""
          val stray = """{"id":"c2","type":"function","function":{"name":"web_search","arguments":"{}"}}"""
          respond(ex, 200,
            s"""{"choices":[{"message":{"role":"assistant","content":null,
               |"tool_calls":[$stray,$named]}}]}""".stripMargin.replace("\n", ""))
        case _ => respond(ex, 400, rejectRF)
      }
    })

    // Replies to tools mode with OBJECT-form function.arguments — the
    // shape several OpenAI-compatible servers use instead of the
    // JSON-encoded string.
    server.createContext("/objArgs", (ex: HttpExchange) => {
      val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
      val m = modeOf(body); bump("/objArgs", m)
      m match {
        case "tools" => respond(ex, 200,
          """{"choices":[{"message":{"role":"assistant","content":null,
            |"tool_calls":[{"id":"c1","type":"function","function":
            |{"name":"output","arguments":{"label":"obj-form","score":9}}}]}}]}"""
            .stripMargin.replace("\n", ""))
        case _ => respond(ex, 400, rejectRF)
      }
    })

    // Echoes nothing interesting; records the raw request body.
    server.createContext("/echo", (ex: HttpExchange) => {
      lastEchoBody = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
      respond(ex, 200, contentReply("pong"))
    })

    server.start()
    port = server.getAddress.getPort
  }

  @volatile private var lastEchoBody: String = null

  override def afterAll(): Unit = server.stop(0)

  private val schema = StructType(Seq(
    StructField("label", StringType), StructField("score", IntegerType)))

  private def structuredClient(path: String, model: String = "gpt-4o",
                               overrideMode: Option[String] = None): HttpLlmClient = {
    val mode = StructuredOutput.detect(model, overrideMode)
    new HttpLlmClient(s"http://127.0.0.1:$port$path", model,
      timeoutMs = 5000,
      structured = Some(StructuredCall(StructuredOutput.jsonSchema(schema),
        "output", new ModeNegotiator(mode, StructuredOutput.fallbackChain(mode, model)))))
  }

  test("fallback walk: json_schema rejected -> tools accepted, and the switch is sticky") {
    val c = structuredClient("/toolsOnly")
    val r1 = c.invoke("first", None)
    assert(r1.text == """{"label":"via-tools","score":7}""")
    assert(count("/toolsOnly", "json_schema") == 1)
    assert(count("/toolsOnly", "tools") == 1)
    // second call goes straight to the discovered mode — no re-probe
    val r2 = c.invoke("second", None)
    assert(r2.text == """{"label":"via-tools","score":7}""")
    assert(count("/toolsOnly", "json_schema") == 1)
    assert(count("/toolsOnly", "tools") == 2)
  }

  test("narrow trigger: a 429 in the detected mode propagates, mode unchanged") {
    val neg = {
      val mode = StructuredOutput.detect("gpt-4o", None)
      new ModeNegotiator(mode, StructuredOutput.fallbackChain(mode, "gpt-4o"))
    }
    val c = new HttpLlmClient(s"http://127.0.0.1:$port/throttled", "gpt-4o",
      timeoutMs = 5000,
      structured = Some(StructuredCall(StructuredOutput.jsonSchema(schema), "output", neg)))
    intercept[RateLimitError] { c.invoke("x", None) }
    assert(neg.mode == JsonSchema)
    assert(neg.switches == 0)
    assert(count("/throttled", "tools") == 0)
  }

  test("exhaustion: every mode structurally rejected -> the rejection propagates") {
    val c = structuredClient("/nothing")
    val e = intercept[LlmError] { c.invoke("x", None) }
    assert(!e.retryable)
    assert(count("/nothing", "json_schema") == 1)
    assert(count("/nothing", "tools") == 1)
    assert(count("/nothing", "json") == 1)
    assert(count("/nothing", "plain") == 1) // the terminal was probed too
  }

  test("plain terminal: zero-structured-support provider still serves Typed runs") {
    val c = structuredClient("/promptOnly")
    val r1 = c.invoke("first", None)
    assert(r1.text == """{"label":"via-plain","score":5}""")
    // full walk, once each, then sticky on plain
    assert(count("/promptOnly", "json_schema") == 1)
    assert(count("/promptOnly", "tools") == 1)
    assert(count("/promptOnly", "json") == 1)
    assert(count("/promptOnly", "plain") == 1)
    c.invoke("second", None)
    assert(count("/promptOnly", "plain") == 2)
    assert(count("/promptOnly", "json") == 1) // no re-probe
  }

  test("a stray parallel call does not reject when the forced call is present by name") {
    val c = structuredClient("/multiNamed", overrideMode = Some("tools"))
    val r = c.invoke("x", None)
    assert(r.text == """{"label":"named","score":4}""")
    assert(count("/multiNamed", "json") == 0) // no downgrade happened
  }

  test("tool-protocol violation (parallel calls) is a structural rejection -> json fallback") {
    val c = structuredClient("/parallel")
    val r = c.invoke("x", None)
    assert(r.text == """{"label":"via-json-fallback","score":3}""")
    assert(count("/parallel", "tools") == 1)
    assert(count("/parallel", "json") == 1)
  }

  test("json mode: response_format json_object + schema contract in system message") {
    val c = structuredClient("/toolsOnly", overrideMode = Some("json"))
    val before = count("/toolsOnly", "json")
    val r = c.invoke("x", Some("be terse"))
    assert(r.text == """{"label":"via-json","score":1}""")
    assert(count("/toolsOnly", "json") == before + 1)
  }

  test("concurrent rejection consumes exactly one chain candidate") {
    val mode = StructuredOutput.detect("gpt-4o", None)
    val neg = new ModeNegotiator(mode, StructuredOutput.fallbackChain(mode, "gpt-4o"))
    val c = new HttpLlmClient(s"http://127.0.0.1:$port/toolsOnly", "gpt-4o",
      timeoutMs = 5000,
      structured = Some(StructuredCall(StructuredOutput.jsonSchema(schema), "output", neg)))
    val pool = java.util.concurrent.Executors.newFixedThreadPool(16)
    try {
      val futures = (1 to 16).map(_ => pool.submit(
        new java.util.concurrent.Callable[String] {
          def call(): String = c.invoke("concurrent", None).text
        }))
      futures.foreach(f => assert(f.get() == """{"label":"via-tools","score":7}"""))
    } finally pool.shutdown()
    // 16 threads, ≥1 json_schema rejection each possible — but only ONE
    // candidate may be consumed: first-switcher-wins.
    assert(neg.switches == 1)
    assert(neg.mode == Tools)
  }

  test("negotiator attempts in strict chain order and reuses a peer's switch") {
    val neg = new ModeNegotiator(JsonSchema, List(Tools, Json))
    val tried = scala.collection.mutable.ArrayBuffer[StructuredMode]()
    val out = neg.attempt { m =>
      tried += m
      if (m != Json) throw new LlmError(s"${m.wire} is not supported", false)
      "ok"
    }
    assert(out == "ok")
    assert(tried.toList == List(JsonSchema, Tools, Json))
    assert(neg.switches == 2)
  }

  test("object-form tool arguments are an honest reply, not a protocol violation") {
    val c = structuredClient("/objArgs", overrideMode = Some("tools"))
    val r = c.invoke("x", None)
    assert(r.text == """{"label":"obj-form","score":9}""")
    assert(count("/objArgs", "json") == 0) // no spurious downgrade
  }

  test("reasoning_effort is serialized into the request body, not just consumed") {
    val c = new HttpLlmClient(s"http://127.0.0.1:$port/echo", "o1-mini",
      timeoutMs = 5000, reasoningEffort = Some("high"))
    c.invoke("think hard", None)
    assert(lastEchoBody.contains(""""reasoning_effort":"high""""))
  }

  test("end-to-end: Typed pipeline over a structured endpoint lands typed columns") {
    val spark = SparkSpec.session
    import spark.implicits._
    val df = Seq("alpha", "beta", "gamma").toDF("text")
    val result = graft.run.PipelineBuilder()
      .withTemplate("Q: {text}")
      .withModel("gpt-4o")
      .withEndpoint(s"http://127.0.0.1:$port/toolsOnly")
      .withOutputColumns("label", "score")
      .withTypedSchema("label string, score int")
      .run(df)
    val rows = result.data.select("text", "label", "score").collect()
    assert(rows.length == 3)
    assert(rows.forall(_.getString(1) == "via-tools"))
    assert(rows.forall(_.getInt(2) == 7))
  }
}
