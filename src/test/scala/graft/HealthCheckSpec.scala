package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core._
import graft.run.{HealthCheck, PipelineBuilder}

class HealthCheckSpec extends AnyFunSuite {

  private def spec(llm: LlmSpec = LlmSpec()) = PipelineSpec(
    DatasetSpec(inputColumns = Seq("text")),
    PromptSpec(template = "Summarize: {text}"),
    llm,
    ProcessingSpec(),
    OutputSpec(outputColumns = Seq("summary")))

  test("in-process client, no paths: healthy with three ok checks") {
    val s = HealthCheck.check(spec())
    assert(s.isHealthy)
    assert(s.checks.map(_.status) == Seq("ok", "ok", "ok"))
  }

  test("endpoint with unset api key env: unhealthy llm_provider error") {
    val s = HealthCheck.check(spec(LlmSpec(
      endpoint = Some("http://localhost:9/v1/chat"),
      apiKeyEnv = Some("GRAFT_TEST_NO_SUCH_KEY"))))
    assert(!s.isHealthy)
    assert(s.checks.head.name == "llm_provider")
    assert(s.checks.head.status == "error")
  }

  test("endpoint with present api key env: healthy") {
    // PATH is set in any sane environment
    val s = HealthCheck.check(spec(LlmSpec(
      endpoint = Some("http://localhost:9/v1/chat"),
      apiKeyEnv = Some("PATH"))))
    assert(s.isHealthy)
  }

  test("missing source is a warning, not unhealthy (reference parity)") {
    val s = HealthCheck.check(spec(),
      sourcePath = Some("/no/such/input.parquet"))
    assert(s.isHealthy)
    assert(s.checks(1).status == "warning")
  }

  test("run dir: existing ok, creatable ok, unwritable parent warns") {
    val tmp = java.nio.file.Files.createTempDirectory("hc").toString
    assert(HealthCheck.check(spec(), runDir = Some(tmp))
      .checks(2).detail.contains("exists"))
    assert(HealthCheck.check(spec(), runDir = Some(s"$tmp/new_run"))
      .checks(2).detail.contains("creatable"))
    // nested missing levels are still creatable (mkdirs semantics)
    assert(HealthCheck.check(spec(), runDir = Some(s"$tmp/a/b/c"))
      .checks(2).detail.contains("creatable"))
    // nearest existing ancestor is /dev/null — a non-directory, so
    // mkdirs can never succeed underneath it
    val s = HealthCheck.check(spec(), runDir = Some("/dev/null/run"))
    assert(s.checks(2).status == "warning" && s.isHealthy)
  }

  test("run dir occupied by a regular file is an error, not 'creatable'") {
    val f = java.nio.file.Files.createTempFile("hc", ".dat")
    val s = HealthCheck.check(spec(), runDir = Some(f.toString))
    assert(!s.isHealthy)
    assert(s.checks(2).status == "error")
    assert(s.checks(2).detail.contains("not a directory"))
  }

  test("readiness mirrors spec validation") {
    assert(HealthCheck.readiness(spec()).isRight)
    val bad = spec().copy(prompt = PromptSpec(template = "no placeholders"))
    val r = HealthCheck.readiness(bad)
    assert(r.isLeft)
    assert(r.left.toOption.get.head.contains("placeholders"))
  }

  test("toJson is well-formed and escapes details") {
    val s = HealthCheck.Status("healthy", Seq(
      HealthCheck.Check("a", "ok", "path \"x\"\nline")))
    val j = s.toJson
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = om.readTree(j)
    assert(node.get("status").asText == "healthy")
    assert(node.get("checks").get(0).get("detail").asText == "path \"x\"\nline")
  }

  test("CLI validate: exit 0 + summary on a good config, 1 + error on bad") {
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val good = java.nio.file.Files.createTempFile("graft_val_ok", ".yaml")
    java.nio.file.Files.writeString(good,
      "dataset:\n  input_columns: [text]\nprompt:\n  " +
        "template: \"V: {text}\"\n  batch_size: 10\n" +
        "processing:\n  max_budget: 2.5\n" +
        "output:\n  output_columns: [res]")
    val (okCode, okJson) = Main.validateConfig(good.toString)
    assert(okCode == 0)
    val ok = om.readTree(okJson)
    assert(ok.get("valid").asBoolean)
    assert(ok.get("input_columns").get(0).asText == "text")
    assert(ok.get("output_columns").get(0).asText == "res")
    assert(ok.get("batch_size").asInt == 10)
    assert(ok.get("max_budget").asText == "2.5")

    // spec-combination failure: template var not among input columns
    val bad = java.nio.file.Files.createTempFile("graft_val_bad", ".yaml")
    java.nio.file.Files.writeString(bad,
      "dataset:\n  input_columns: [text]\nprompt:\n  " +
        "template: \"V: {missing}\"\noutput:\n  output_columns: [res]")
    val (badCode, badJson) = Main.validateConfig(bad.toString)
    assert(badCode == 1)
    val b = om.readTree(badJson)
    assert(!b.get("valid").asBoolean)
    assert(b.get("error").asText.contains("missing"))

    // unreadable / nonexistent file is invalid, not a crash
    assert(Main.validateConfig("/no/such/config.yaml")._1 == 1)
  }

  test("CLI list-providers registry covers the factory's dispatch arms") {
    val ids = graft.llm.LlmClients.providers.map(_._1)
    assert(ids.contains("mock") && ids.contains("http") &&
      ids.contains("proc"))
    // every selector names a concrete way to pick the provider
    assert(graft.llm.LlmClients.providers.forall { case (_, sel, desc) =>
      sel.nonEmpty && desc.nonEmpty })
  }

  test("builder healthCheck reports on incomplete config without throwing") {
    val s = PipelineBuilder()
      .withTemplate("Q: {q}")
      .withEndpoint("http://localhost:9/v1", apiKeyEnv = Some("NOPE_KEY"))
      .healthCheck()
    assert(!s.isHealthy)
  }
}

class TraceSanitizerSpec extends AnyFunSuite {
  import graft.run.TraceSanitizer._

  test("each PII family redacts; clean text passes through") {
    assert(sanitizeText("mail a.b@x.org now") == "mail [REDACTED] now")
    assert(sanitizeText("ssn 123-45-6789") == "ssn [REDACTED]")
    assert(sanitizeText("card 4111 1111 1111 1111") == "card [REDACTED]")
    assert(sanitizeText("call 415-555-0123") == "call [REDACTED]")
    assert(sanitizeText("host 192.168.0.1") == "host [REDACTED]")
    assert(sanitizeText("api_key: sk_1234567890abcdefgh") == "[REDACTED]")
    assert(sanitizeText("nothing secret here") == "nothing secret here")
  }

  test("custom patterns extend the family") {
    val acct = Seq("account" -> "ACC-\\d{6}".r)
    assert(sanitizeText("see ACC-123456", customPatterns = acct)
      == "see [REDACTED]")
  }

  test("prompt sanitization: stable digest by default, raw on opt-in") {
    val a = sanitizePrompt("my secret prompt")
    assert(a.matches("<sanitized-[0-9a-f]{8}>"))
    assert(a == sanitizePrompt("my secret prompt")) // stable
    assert(a != sanitizePrompt("другой prompt"))
    assert(sanitizePrompt("keep me", includeRaw = true) == "keep me")
  }
}

class ModelContextLimitsSpec extends AnyFunSuite {
  import graft.llm.ModelContextLimits._

  test("lookup: exact, dated-variant fuzzy, provider-prefixed, default") {
    assert(contextLimit("gpt-4o-mini") == 128000)
    assert(contextLimit("claude-3-5-sonnet-20241022") == 200000)
    assert(contextLimit("openai/gpt-4-32k") == 32768)
    assert(contextLimit("some-unknown-model") == DefaultLimit)
  }

  test("ambiguous and empty ids fail SAFE to the conservative default") {
    // "" / bare family prefixes must not resolve to some table entry's
    // (possibly huge) window — that defeats the overflow check
    assert(contextLimit("") == DefaultLimit)
    assert(contextLimit("mixtral") == DefaultLimit)
    assert(contextLimit("qwen") == DefaultLimit)
  }

  test("fuzzy prefers the longest (most specific) family match") {
    // "gpt-4-turbo-2024-04-09" contains both gpt-4 (8k) and gpt-4-turbo (128k)
    assert(contextLimit("gpt-4-turbo-2024-04-09") == 128000)
  }

  test("batch validation: fit passes, overflow gets an actionable message") {
    assert(validateBatchSize("gpt-4o-mini", 100, 500).isRight)
    val r = validateBatchSize("gpt-4o-mini", 1000, 500)
    assert(r.isLeft)
    assert(r.left.toOption.get.contains("reduce batch_size to 204"))
  }

  test("suggested batch fills the margin and respects the cap") {
    assert(suggestBatchSize("gpt-4o-mini", 500) == 204)
    assert(suggestBatchSize("gpt-4o-mini", 10) == 500) // capped
    assert(suggestBatchSize("unknown", 100000) == 1)   // floor
  }

  test("estimator surfaces batch overflow for mega-prompt configs") {
    val spark = SparkSpec.session
    import spark.implicits._
    val df = (0 until 50).map(i => "x" * 4000).toDF("text")
    val spec = graft.core.PipelineSpec(
      DatasetSpec(inputColumns = Seq("text")),
      PromptSpec(template = "Summarize: {text}", batchSize = 50),
      LlmSpec(model = "gpt-4"), // 8k window
      ProcessingSpec(),
      OutputSpec(outputColumns = Seq("s")))
    val e = graft.run.CostEstimator.estimate(df, spec)
    assert(e.batchFit.isDefined)
    assert(e.batchFit.get.contains("batch too large for gpt-4"))
    // same data, batch 1: fits
    val ok = graft.run.CostEstimator.estimate(df,
      spec.copy(prompt = spec.prompt.copy(batchSize = 1)))
    assert(ok.batchFit.isEmpty)
  }
}
