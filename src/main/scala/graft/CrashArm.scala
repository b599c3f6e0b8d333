package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core._
import graft.llm.{LlmResponse, MockLlmClient}
import graft.run.Enricher

/** Crash-safety benchmark arm, mirroring the reference's headline
  * experiment (/root/reference/benchmarks/RESULTS.md:38-43: deterministic
  * in-process LLM over 100k rows, hard `os._exit(9)` at 60%, then resume;
  * expected: 0 rows lost, resume re-invokes only missing work).
  *
  *   runMain graft.CrashArm crash  <runDir>   # halts the JVM mid-run
  *   runMain graft.CrashArm resume <runDir>   # completes; prints JSON
  *
  * The crash phase hard-kills via Runtime.halt(9) — no shutdown hooks, no
  * flushing — after 60% of the expected calls. Durability comes solely
  * from the chunked ledger appends.
  */
object CrashArm {

  val Rows = 100000L
  val Batch = 50
  val ExpectedCalls: Long = Rows / Batch
  val HaltAfterCalls: Long = (ExpectedCalls * 0.6).toLong

  /** Halts the whole JVM after N calls — a kill -9 equivalent. */
  private class HaltingClient extends MockLlmClient() {
    override def invoke(p: String, s: Option[String]): LlmResponse = {
      if (MockLlmClient.calls.get() >= HaltAfterCalls) {
        System.err.println(s"[crash-arm] halting JVM at call $HaltAfterCalls")
        Runtime.getRuntime.halt(9)
      }
      super.invoke(p, s)
    }
  }

  def main(args: Array[String]): Unit = {
    val Array(phase, runDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val rows = spark.range(0L, Rows, 1L, 20)
      .select(col("id"), concat(lit("review text number "), col("id"))
        .as("review"))
    val spec = PipelineSpec(
      dataset = DatasetSpec(Seq("review")),
      prompt = PromptSpec("Classify the tone of: {review}", batchSize = Batch),
      llm = LlmSpec(concurrency = 8),
      processing = ProcessingSpec(chunkRows = 10000),
      output = OutputSpec(Seq("sentiment")))

    val t0 = System.nanoTime()
    phase match {
      case "crash" =>
        // never returns: the client halts the JVM at 60%
        new Enricher(spec, new HaltingClient, Some(runDir),
          keyColumn = Some("id")).enrich(rows).data.count()
        System.err.println("[crash-arm] UNEXPECTED: crash phase completed")
        sys.exit(1)
      case "resume" =>
        val before = MockLlmClient.calls.get()
        val r = new Enricher(spec, new MockLlmClient(), Some(runDir),
          keyColumn = Some("id")).enrich(rows)
        val n = r.data.count()
        val invoked = MockLlmClient.calls.get() - before
        val durable = spark.read.parquet(s"$runDir/responses")
          .select("_row_index").distinct().count()
        val wall = (System.nanoTime() - t0) / 1e9
        println(
          f"""{"phase":"resume","rows":$n,"durable_rows":$durable,""" +
          f""""rows_lost":${Rows - durable},"resume_calls":$invoked,""" +
          f""""valid":${r.quality.validRows},"wall_sec":$wall%.2f}""")
    }
    spark.stop()
  }
}
