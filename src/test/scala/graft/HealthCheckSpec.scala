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
    val s = HealthCheck.check(spec(), runDir = Some("/proc/graft_no/run"))
    assert(s.checks(2).status == "warning" && s.isHealthy)
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

  test("builder healthCheck reports on incomplete config without throwing") {
    val s = PipelineBuilder()
      .withTemplate("Q: {q}")
      .withEndpoint("http://localhost:9/v1", apiKeyEnv = Some("NOPE_KEY"))
      .healthCheck()
    assert(!s.isHealthy)
  }
}
