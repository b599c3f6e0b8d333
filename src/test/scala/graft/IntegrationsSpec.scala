package graft

import java.nio.file.Files

import graft.integrations.LlmTransform
import graft.llm.MockLlmClient
import graft.run.BudgetExceededException

/** Drives the Airflow/Prefect task body end-to-end on the mock client:
  * config + overrides + both input shapes + file output + metrics JSON.
  */
class IntegrationsSpec extends SparkSpec {

  private def writeCfg(extra: String = ""): String = {
    val p = Files.createTempFile("graft_int", ".yaml")
    Files.writeString(p,
      "dataset:\n  input_columns: [text]\nprompt:\n  " +
        "template: \"IT: {text}\"\n" + extra +
        "output:\n  output_columns: [res]")
    p.toString
  }

  test("frame input (the XCom path): enrich, return data + metrics") {
    val spark = this.spark
    import spark.implicits._
    val df = (0 until 25).map(i => s"task $i").toDF("text")
    val r = LlmTransform.run(spark, writeCfg(), inputData = Some(df),
      client = Some(new MockLlmClient()))
    assert(r.rows == 25 && r.validRows == 25 && r.calls == 25)
    assert(r.data.columns.contains("res"))
    assert(r.outputPath.isEmpty)
    assert(BigDecimal(r.cost) > 0)
    // metrics JSON parses and carries the operator-log fields
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val j = om.readTree(r.toJson)
    assert(j.get("rows").asLong == 25 && j.get("output_path").isNull)
    assert(j.get("quality").asText.nonEmpty)
  }

  test("file input + file output: suffix-dispatched read and write") {
    val in = Files.createTempDirectory("graft_int_in")
      .resolve("in.csv").toString
    Files.writeString(java.nio.file.Paths.get(in),
      "text\n" + (0 until 12).map(i => s"file $i").mkString("\n"))
    val out = Files.createTempDirectory("graft_int_out")
      .resolve("out.parquet").toString
    val r = LlmTransform.run(spark, writeCfg(), inputPath = Some(in),
      outputPath = Some(out), client = Some(new MockLlmClient()))
    assert(r.rows == 12 && r.outputPath.contains(out))
    val back = spark.read.parquet(out)
    assert(back.count() == 12 && back.columns.contains("res"))
  }

  test("overrides: budget caps the run, model override reaches the client") {
    val spark = this.spark
    import spark.implicits._
    val df = (0 until 400).map(i => s"money $i" * 50).toDF("text")
    // tiny budget + small chunks -> the budget controller stops the run
    intercept[BudgetExceededException] {
      LlmTransform.run(spark, writeCfg("processing:\n  chunk_rows: 50\n"),
        inputData = Some(df), maxBudget = Some(BigDecimal("0.000001")),
        client = Some(new MockLlmClient(
          inPer1k = BigDecimal("1.0"), outPer1k = BigDecimal("1.0"))))
    }
    // modelOverride lands in the spec-selected client (mock echoes it)
    val small = (0 until 3).map(i => s"m $i").toDF("text")
    val r = LlmTransform.run(spark, writeCfg(), inputData = Some(small),
      modelOverride = Some("my-model-v2"))
    assert(r.rows == 3) // spec-selected mock ran under the overridden id
  }

  test("durable runDir: a retried task resumes instead of re-spending") {
    val spark = this.spark
    import spark.implicits._
    val runDir = Files.createTempDirectory("graft_int_run").toString
    val df = (0 until 30).map(i => (i.toLong, s"r $i")).toDF("id", "text")
    LlmTransform.run(spark, writeCfg(), inputData = Some(df),
      runDir = Some(runDir), keyColumn = Some("id"),
      client = Some(new MockLlmClient()))
    // Airflow retry: same runDir, fresh task -> ledger anti-join, 0 calls
    val before = MockLlmClient.calls.get()
    val r2 = LlmTransform.run(spark, writeCfg(), inputData = Some(df),
      runDir = Some(runDir), keyColumn = Some("id"),
      client = Some(new MockLlmClient()))
    assert(r2.rows == 30 && r2.validRows == 30)
    assert(MockLlmClient.calls.get() == before,
      "retry must not re-issue completed calls")
  }

  test("no input is an explicit error") {
    intercept[IllegalArgumentException] {
      LlmTransform.run(spark, writeCfg())
    }
  }
}
