package graft.llm

import java.util.concurrent.atomic.AtomicReference

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode
import org.apache.spark.sql.types._

/** Provider-native structured-output modes with layered detection and a
  * sticky fallback chain (reference: ondine/adapters/instructor_mode.py
  * :103-246 detection layers; unified_litellm_client.py:1190-1248 fallback
  * walk; :60-141 rejection classification).
  *
  * Three wire shapes over the chat-completions dialect:
  *
  *  - [[StructuredMode.Tools]]       — a single forced function call whose
  *    `parameters` is the output schema; the reply arrives in
  *    `tool_calls[0].function.arguments`. `parallel_tool_calls:false` is
  *    set because the protocol needs exactly one call per reply
  *    (unified_litellm_client.py:1135-1166).
  *  - [[StructuredMode.JsonSchema]]  — `response_format:{type:"json_schema",
  *    strict:true}`; server-side schema enforcement, no tool protocol.
  *  - [[StructuredMode.Json]]        — `response_format:{type:"json_object"}`
  *    plus the schema appended to the system message; the most broadly
  *    supported mode and therefore the universal last resort.
  *
  * Detection is a best guess — capability tables are incomplete and
  * gateways front models whose real support differs. A wrong guess fails
  * STRUCTURALLY (the provider can never accept that mode), so the client
  * advances along a fallback chain, at most once per candidate, and keeps
  * the mode that worked: a 100k-row run pays discovery once, not per row.
  * Only structural rejections advance the chain — rate limits, auth
  * failures, quota and network errors say nothing about mode support and
  * must propagate untouched (unified_litellm_client.py:60-97).
  *
  * Deviation from the reference, by design: the reference needs a separate
  * Anthropic mode family because its native SDK adapter rejects the
  * OpenAI-style modes outright. This client speaks one wire dialect, so
  * the Anthropic distinction reduces to "no JSON_SCHEMA in the chain"
  * (Anthropic's API has tools and plain-JSON prompting but no
  * `response_format:json_schema`).
  */
sealed trait StructuredMode extends Serializable { def wire: String }
object StructuredMode {
  case object Tools extends StructuredMode { val wire = "tools" }
  case object JsonSchema extends StructuredMode { val wire = "json_schema" }
  case object Json extends StructuredMode { val wire = "json" }
  /** Terminal fallback, not user-selectable: a plain chat request with the
    * schema asked for in the system message and NO response_format at all —
    * what this client sent before mode negotiation existed, and the only
    * shape a provider with zero structured-output support accepts. The
    * downstream Typed parser's strict→fence→brace chain handles the reply
    * exactly as it always did. */
  case object Plain extends StructuredMode { val wire = "plain" }
}

/** Structural mode rejection raised CLIENT-side (no tool call in a tools-
  * mode reply, more than one tool call). Non-retryable in the same mode by
  * definition; the negotiator consumes it. Provider-side rejections arrive
  * as plain 4xx [[LlmError]]s and are classified by message signature. */
class ModeRejectionError(msg: String) extends LlmError(msg, retryable = false)

object StructuredOutput {

  /** User-facing strategy values (instructor_mode.py:23-30). Defined in
    * core (alias here) so spec validation does not reach into this
    * package — llm already depends on core. */
  val Strategies: Set[String] = graft.core.StructuredModes.Strategies

  /** Per-provider mode support — public facts about public provider APIs
    * (the reference keeps the same registry, instructor_mode.py:33-106:
    * Groq's function calling emits XML, Ollama/HuggingFace-hosted models
    * mostly lack tool support, everyone speaks plain JSON). `toolsOk`
    * false means: even if a capability table claims function calling,
    * don't trust it for this provider. */
  private val ProviderToolsOk: Map[String, Boolean] = Map(
    "openai" -> true, "azure" -> true, "anthropic" -> true,
    "mistral" -> true, "cohere" -> true, "gemini" -> true,
    "together" -> true, "vertex_ai" -> true, "bedrock" -> true,
    "cerebras" -> true, "deepseek" -> true, "openrouter" -> true,
    "groq" -> false, "ollama" -> false, "huggingface" -> false)

  /** Providers with native `response_format:{type:"json_schema"}` support
    * (public: OpenAI structured outputs and OpenAI-compatible surfaces).
    * Anthropic deliberately absent — see the class doc. */
  private val ProviderJsonSchemaOk: Set[String] =
    Set("openai", "azure", "openrouter", "deepseek", "cerebras")

  /** Model-family capability table, the offline analog of the reference's
    * LiteLLM `get_model_info` lookup (instructor_mode.py:171-213):
    * (supportsResponseSchema, supportsFunctionCalling) by family substring,
    * longest-match like [[ModelContextLimits.contextLimit]]. Public
    * provider-documented facts; absence means "unknown", falling through
    * to the provider registry. */
  private val ModelCaps: Map[String, (Boolean, Boolean)] = Map(
    "gpt-4o" -> (true, true),
    "gpt-4.1" -> (true, true),
    "gpt-4-turbo" -> (false, true),
    "gpt-4" -> (false, true),
    "gpt-3.5-turbo" -> (false, true),
    "o1" -> (true, false), // reasoning family: schema yes, tools no
    "claude" -> (false, true),
    "mistral-large" -> (false, true),
    "command-r" -> (false, true),
    "llama" -> (false, false),
    "gemma" -> (false, false),
    "qwen" -> (false, false))

  /** Provider from the model id: an explicit registered `provider/` prefix
    * wins (an unregistered first segment is a gateway namespace, not a
    * transport — instructor_mode.py:88-99 records the bug this avoids),
    * then public name patterns. */
  private[llm] def extractProvider(model: String): Option[String] = {
    val m = model.toLowerCase
    val byPrefix = m.split("/", 2) match {
      case Array(p, _) if ProviderToolsOk.contains(p) => Some(p)
      case _ => None
    }
    byPrefix.orElse {
      if (m.contains("gpt-") || m.startsWith("o1-")) Some("openai")
      else if (m.contains("claude")) Some("anthropic")
      else if (m.contains("gemini")) Some("gemini")
      else if (m.contains("mistral")) Some("mistral")
      else if (m.contains("command")) Some("cohere")
      else None
    }
  }

  /** Family key occurs at a token boundary: no LETTER may touch either end
    * of the match, so "o1" claims "o1-mini" and "openai/o1" but not the
    * "o1" inside "gpt-neo1.3b"; digits stay permissive because real ids
    * glue versions on ("llama3.1", "qwen2.5"). */
  private def familyMatches(m: String, key: String): Boolean = {
    var idx = m.indexOf(key)
    while (idx >= 0) {
      val beforeOk = idx == 0 || !m.charAt(idx - 1).isLetter
      val end = idx + key.length
      val afterOk = end == m.length || !m.charAt(end).isLetter
      if (beforeOk && afterOk) return true
      idx = m.indexOf(key, idx + 1)
    }
    false
  }

  private def longestFamily(model: String): Option[(Boolean, Boolean)] = {
    val m = model.toLowerCase
    val hits = ModelCaps.filter { case (k, _) => familyMatches(m, k) }
    if (hits.isEmpty) None else Some(hits.maxBy(_._1.length)._2)
  }

  private def preferring(tools: Boolean): StructuredMode =
    if (tools) StructuredMode.Tools else StructuredMode.Json

  /** Layered mode detection (instructor_mode.py:103-246):
    *  1. user override;  2. reasoning models → never tools;
    *  3. model-family capability table;  4. provider registry;
    *  5. safe default Json.
    */
  def detect(model: String, userOverride: Option[String] = None,
             hasReasoningEffort: Boolean = false): StructuredMode = {
    val provider = extractProvider(model)

    // Layer 1: explicit user choice wins unconditionally.
    val overridden = userOverride.map(_.toLowerCase).filter(_ != "auto").map {
      case "tools" => StructuredMode.Tools
      case "json" => StructuredMode.Json
      case "json_schema" => StructuredMode.JsonSchema
      case other => throw new IllegalArgumentException(
        s"unknown structured mode '$other' (expected ${Strategies.mkString("/")})")
    }
    if (overridden.isDefined) overridden.get
    // Layer 2: reasoning models reject the tool protocol; plain JSON is
    // the reference's choice here (instructor_mode.py:158-168).
    else if (hasReasoningEffort) StructuredMode.Json
    // Layer 3: model-family capabilities.
    else longestFamily(model) match {
      case Some((schemaOk, toolsOk)) =>
        // (anthropic exclusion is implied: it is absent from
        // ProviderJsonSchemaOk, so the forall rejects it)
        if (schemaOk && provider.forall(ProviderJsonSchemaOk.contains))
          StructuredMode.JsonSchema
        else {
          // Provider registry can veto a capability-table tools claim
          // (Groq "supports" function calling but emits XML).
          val vetoed = provider.exists(p => !ProviderToolsOk.getOrElse(p, true))
          preferring(toolsOk && !vetoed)
        }
      case None =>
        provider match {
          // Layer 4: provider registry.
          case Some(p) => preferring(ProviderToolsOk.getOrElse(p, false))
          // Layer 5: unknown model, safest mode.
          case None => StructuredMode.Json
        }
    }
  }

  /** Ordered candidates after `initial`, most to least capable; Json last
    * everywhere because it needs nothing from the provider. Anthropic
    * never receives JsonSchema (unified_litellm_client.py:144-173), and a
    * mode detection already KNOWS can't work is not worth probing: Tools
    * is excluded for reasoning models and registry-vetoed providers —
    * escalating a reasoning model to the tool protocol its detection
    * layer exists to avoid would burn doomed requests and mask the real
    * rejection. */
  /** Gateway namespaces that TRANSLATE protocols for the models they front:
    * a capability-table "no tools" verdict about the bare model does not
    * bind what the gateway's shim layer accepts, so the chain may still
    * probe Tools there. Direct providers (openai, mistral, …) serve the
    * model as-is — the family verdict binds. */
  private val TranslatingGateways: Set[String] =
    Set("openrouter", "together", "bedrock", "vertex_ai")

  def fallbackChain(initial: StructuredMode, model: String,
                    hasReasoningEffort: Boolean = false): List[StructuredMode] = {
    val provider = extractProvider(model)
    val anthropic = provider.contains("anthropic")
    val toolsVetoed = hasReasoningEffort ||
      provider.exists(p => !ProviderToolsOk.getOrElse(p, true)) ||
      longestFamily(model).exists { case (_, toolsOk) =>
        // Family says no function calling, and no translating gateway sits
        // in front to overrule it (o1 via openai/azure is served as-is —
        // probing the tool protocol there is a doomed request).
        !toolsOk && !provider.exists(TranslatingGateways.contains)
      }
    val all =
      (if (anthropic) List(StructuredMode.Tools, StructuredMode.Json)
       else List(StructuredMode.JsonSchema, StructuredMode.Tools, StructuredMode.Json)) :+
        StructuredMode.Plain // universal terminal: no response_format at all
    all.filterNot(_ == initial)
      .filterNot(m => toolsVetoed && m == StructuredMode.Tools)
  }

  /** Provider wordings that mean "this mode can never work here" —
    * matched against 4xx bodies (unified_litellm_client.py:82-97; the
    * wordings are public provider error messages). Matching strips
    * quotes/apostrophes first: the real OpenAI wordings quote the
    * parameter name ("Invalid parameter: 'response_format' of type
    * 'json_schema' is not supported with this model."), which would
    * defeat plain substring checks. */
  private val RejectionSignatures = Seq(
    "tools is not supported", "tool use is not supported",
    "does not support tool", "tool calling is not supported",
    "function calling is not supported", "functions is not supported",
    "response_format is not supported", "response_format is unsupported",
    "json_schema is not supported", "json_schema is unsupported",
    "response_schema is not supported", "structured output is not supported",
    // parameters the tools-mode request itself carries: a provider that
    // rejects the PARAMETER (o-series: "Unsupported parameter:
    // 'parallel_tool_calls' …"; servers without a tool parser reject
    // 'tool_choice') is rejecting the mode just as structurally as one
    // that rejects "tools".
    "parallel_tool_calls is not supported", "tool_choice is not supported",
    "does not support parallel_tool_calls", "does not support tool_choice",
    // strict-mode schema rejections (e.g. a schema shape strict json_schema
    // cannot express): same structural character — this mode, with this
    // schema, can never succeed; a less demanding mode can.
    "invalid schema for response_format")

  /** True only for structural rejections of the mode. The taxonomy is
    * typed, so the reference's "never-fallback signatures win" precedence
    * (unified_litellm_client.py:100-141) is enforced by construction:
    * retryable errors (rate limit, network) and the typed fatal classes
    * (auth, quota, model-not-found) are excluded before any signature is
    * consulted. Unrecognised errors return false — the default is to
    * propagate, never to silently switch. */
  def isModeRejection(t: Throwable): Boolean = t match {
    case _: ModeRejectionError => true
    case _: AuthError | _: QuotaError | _: ModelNotFoundError => false
    case e: LlmError if e.retryable => false
    case e: LlmError =>
      val s = Option(e.getMessage).getOrElse("")
        .toLowerCase.replace("'", "").replace("\"", "").replace("`", "")
      RejectionSignatures.exists(s.contains)
    case _ => false
  }

  /** JSON Schema for a Spark StructType — the Pydantic `model_json_schema`
    * analog feeding the tools `parameters` / `json_schema.schema` blocks.
    * All fields required, `additionalProperties:false` (the strict-mode
    * contract). */
  def jsonSchema(schema: StructType): String =
    SchemaJsonInternal.mapper.writeValueAsString(
      SchemaJsonInternal.forStruct(schema))

  private[llm] object SchemaJsonInternal {
    val mapper = new ObjectMapper()
    def forStruct(st: StructType): ObjectNode = {
      val root = mapper.createObjectNode()
      root.put("type", "object")
      val props = root.putObject("properties")
      val required = root.putArray("required")
      st.fields.foreach { f =>
        props.set[ObjectNode](f.name, forType(f.dataType))
        required.add(f.name)
      }
      root.put("additionalProperties", false)
      root
    }
    def forType(dt: DataType): ObjectNode = {
      val n = mapper.createObjectNode()
      dt match {
        case _: ByteType | _: ShortType | _: IntegerType | _: LongType =>
          n.put("type", "integer")
        case _: FloatType | _: DoubleType | _: DecimalType =>
          n.put("type", "number")
        case _: BooleanType => n.put("type", "boolean")
        case ArrayType(el, _) =>
          n.put("type", "array"); n.set[ObjectNode]("items", forType(el))
        case st: StructType => return forStruct(st)
        case MapType(_, valueType, _) =>
          // Free-form keys: valid JSON Schema, but OpenAI STRICT mode
          // rejects non-false additionalProperties — that arrives as
          // "Invalid schema for response_format", a structural rejection
          // the negotiator consumes (falls back to tools/json, which
          // carry maps fine).
          n.put("type", "object")
          n.set[ObjectNode]("additionalProperties", forType(valueType))
        case _ => n.put("type", "string")
      }
      n
    }
  }
}

/** Sticky, concurrency-safe mode negotiation
  * (unified_litellm_client.py:1190-1248).
  *
  * Many partition threads share one negotiation; when a wrong mode is
  * discovered they all hit the rejection at once. The first to take the
  * lock performs the switch; the rest observe the mode already moved on
  * from the one they failed with and reuse it — one rejection consumes
  * one candidate, never N. Exhaustion rethrows the rejection itself
  * (more diagnostic than a generic failure).
  *
  * Serialization: the negotiation STATE lives in a per-JVM registry
  * keyed by (scope, initial, chain) — instances are lightweight handles,
  * so the many copies a Spark run deserializes (one per task closure)
  * all resolve to ONE shared negotiation per executor JVM. Each executor
  * pays discovery once per run — not once per task, which on a
  * 200-partition run would burn up to chain-length doomed probes per
  * partition. (In local mode driver and "executors" share the JVM, so
  * `mode`/`switches` observability is exact; on a real cluster the
  * driver-side handle reads driver-local state only.)
  */
final class ModeNegotiator(
    scopeKey: String,
    initial: StructuredMode,
    chain: List[StructuredMode]) extends Serializable {

  /** Instance-scoped negotiation (tests, ad-hoc clients): a unique scope
    * so no other instance shares the state. */
  def this(initial: StructuredMode, chain: List[StructuredMode]) =
    this(java.util.UUID.randomUUID().toString, initial, chain)

  // Full key includes the starting configuration: a changed override or
  // chain must never resurrect a stale negotiation for the same endpoint.
  private val key: String =
    s"$scopeKey|${initial.wire}|${chain.map(_.wire).mkString(",")}"

  @transient private lazy val state: ModeNegotiator.State =
    ModeNegotiator.registry.computeIfAbsent(key,
      _ => new ModeNegotiator.State(key, initial, chain))

  def mode: StructuredMode = state.current.get()
  def switches: Int = state.switchCount.get()

  /** Run `f` in the current mode, walking the chain on structural
    * rejections; all other errors propagate unchanged. */
  def attempt[T](f: StructuredMode => T): T = {
    while (true) {
      // Capture the mode being attempted NOW — reading it back after a
      // failure is wrong under concurrency (another thread may have
      // switched; we'd consume a second candidate for one rejection).
      val attempted = state.current.get()
      try return f(attempted)
      catch {
        case e: Throwable if StructuredOutput.isModeRejection(e) =>
          if (!state.advance(attempted)) throw e
      }
    }
    throw new IllegalStateException("unreachable")
  }
}

object ModeNegotiator {
  private val log = org.slf4j.LoggerFactory.getLogger(classOf[ModeNegotiator])

  private[llm] final class State(
      scope: String, initial: StructuredMode, chain: List[StructuredMode]) {
    val current = new AtomicReference[StructuredMode](initial)
    var remaining: List[StructuredMode] = chain // guarded by this
    val switchCount = new java.util.concurrent.atomic.AtomicInteger(0)

    def advance(failed: StructuredMode): Boolean = synchronized {
      if (current.get() != failed) true // someone already switched away
      else remaining match {
        case next :: rest =>
          remaining = rest
          current.set(next)
          switchCount.incrementAndGet()
          // A downgrade changes what the provider enforces for every later
          // row in this JVM — it must be visible in the executor logs, not
          // only in a driver-local counter nothing consults.
          log.warn("structured-output mode '{}' structurally rejected for " +
            "[{}]; falling back to '{}' (sticky for this JVM)",
            failed.wire, scope, next.wire)
          true
        case Nil =>
          log.error("structured-output fallback chain exhausted for [{}] " +
            "(last mode '{}'); rethrowing the rejection", scope, failed.wire)
          false
      }
    }
  }

  /** Keyed per-JVM states — bounded by distinct (endpoint, model,
    * mode-config) combinations, i.e. a handful per application. */
  private val registry =
    new java.util.concurrent.ConcurrentHashMap[String, State]()
}

/** Everything the HTTP client needs to shape a structured request: the
  * JSON Schema (string — pre-rendered once, serializes cheaply into task
  * closures), a tool/schema name, and the shared negotiator. */
final case class StructuredCall(
    schemaJson: String,
    name: String,
    negotiator: ModeNegotiator) extends Serializable
