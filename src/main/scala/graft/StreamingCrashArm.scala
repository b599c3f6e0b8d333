package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core._
import graft.llm.{LlmResponse, MockLlmClient}

/** Streaming crash-safety arm — the [[CrashArm]] experiment shape
  * (reference: /root/reference/benchmarks/RESULTS.md:36-52, kill -9 at
  * 60%, 0 rows lost) applied to the STREAMING path: 100k rows arrive as
  * a file stream in 10 micro-batches, the JVM hard-halts (`Runtime
  * .halt(9)` — no shutdown hooks, no flushing) mid-micro-batch at 60%
  * of the expected LLM calls, and a restarted query must drain the rest
  * with zero rows lost and zero re-invocation of durable work: the
  * engine's checkpoint replays the uncommitted batch, and the
  * per-batch response ledger ([[graft.streaming.StreamingEnrich]]
  * `runDir`) anti-joins away every call whose chunk landed before the
  * halt.
  *
  *   runMain graft.StreamingCrashArm crash  <workDir>  # halts the JVM
  *   runMain graft.StreamingCrashArm resume <workDir>  # prints JSON
  */
object StreamingCrashArm {

  val Rows = 100000L
  val Files = 20           // 2 files per trigger → 10 micro-batches
  val Batch = 50
  val ChunkRows = 2000     // 5 durable ledger chunks per micro-batch
  val ExpectedCalls: Long = Rows / Batch
  val HaltAfterCalls: Long = (ExpectedCalls * 0.6).toLong

  private class HaltingClient extends MockLlmClient() {
    override def invoke(p: String, s: Option[String]): LlmResponse = {
      if (MockLlmClient.calls.get() >= HaltAfterCalls) {
        System.err.println(s"[stream-crash] halting JVM at call $HaltAfterCalls")
        Runtime.getRuntime.halt(9)
      }
      super.invoke(p, s)
    }
  }

  def main(args: Array[String]): Unit = {
    val Array(phase, workDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val srcDir = s"$workDir/input"
    val ckptDir = s"$workDir/ckpt"
    val ledgerDir = s"$workDir/ledger"
    val outDir = s"$workDir/out"
    if (phase == "crash") {
      // fresh input corpus: 20 files × 5000 rows
      spark.range(0L, Rows, 1L, Files)
        .select(col("id"), concat(lit("review text number "), col("id"))
          .as("review"))
        .write.mode("overwrite").parquet(srcDir)
    }

    val spec = PipelineSpec(
      dataset = DatasetSpec(Seq("review")),
      prompt = PromptSpec("Classify the tone of: {review}", batchSize = Batch),
      llm = LlmSpec(concurrency = 8),
      processing = ProcessingSpec(chunkRows = ChunkRows),
      output = OutputSpec(Seq("sentiment")))

    def run(client: MockLlmClient): Unit = {
      // Crash run: 2 files/trigger → 10 micro-batches, the topology the
      // durability experiment needs (committed batches behind the halt, a
      // torn batch at it). Resume: the uncommitted batch replays AT ITS
      // ORIGINAL BOUNDS regardless (the offset log pins its file set —
      // that replay is what exercises the ledger anti-join), and the
      // REMAINDER drains at full width, the production restart setting —
      // r14 profile: each extra micro-batch cost ~20 driver-sequenced
      // jobs plus commit/planning gaps, ~4 s/batch of pure machinery at
      // this data size. Durability gates (rows_lost, reinvoked_durable,
      // min_resume_calls) are computed identically either way.
      val stream = spark.readStream
        .schema("id LONG, review STRING")
        .option("maxFilesPerTrigger",
          if (phase == "resume") Files.toString else "2")
        .parquet(srcDir)
      val q = graft.streaming.StreamingEnrich.start(
        stream, spec, client, ckptDir,
        // idempotent sink: overwrite-by-batchId — a replayed batch
        // rewrites its own slice, never duplicating committed ones
        (data, batchId) => data.select("id", "sentiment")
          .write.mode("overwrite").parquet(f"$outDir/batch_$batchId%06d"),
        runDir = Some(ledgerDir), keyColumn = Some("id"),
        // the arm MEASURES the ledgers after the run (durable rows,
        // re-invocation check); production default deletes committed
        // batches' ledgers as the stream advances
        retainLedgers = true)
      q.awaitTermination()
    }

    val t0 = System.nanoTime()
    phase match {
      case "crash" =>
        run(new HaltingClient) // never returns: the client halts the JVM
        System.err.println("[stream-crash] UNEXPECTED: crash phase completed")
        sys.exit(1)
      case "resume" =>
        // durable calls the halt left behind, across all per-batch ledgers.
        // Fast path: ONE multi-path read + ONE job over the union —
        // micro-batches partition _row_index, so distinct/group counts
        // over the union equal the per-batch sums. Fallback: the per-
        // subdir loop (a torn batch may hold only a _temporary skeleton
        // that breaks the union read) — correctness identical, just one
        // job per directory instead of one in total.
        def batchDirs = Option(new java.io.File(ledgerDir).listFiles())
          .getOrElse(Array.empty).filter(_.getName.startsWith("batch_"))
        def perBatch(f: org.apache.spark.sql.DataFrame => Long): Long = {
          val paths = batchDirs.map(d => s"${d.getPath}/responses").toSeq
          if (paths.isEmpty) 0L
          else (try Some(f(spark.read.parquet(paths: _*)))
          catch { case _: Throwable => None }).getOrElse(
            batchDirs.map { d =>
              try f(spark.read.parquet(s"${d.getPath}/responses"))
              catch { case _: Throwable => 0L }
            }.sum)
        }
        val durableRows = perBatch(_.filter(col("result").isNotNull)
          .select("_row_index").distinct().count())
        val before = MockLlmClient.calls.get()
        run(new MockLlmClient())
        val invoked = MockLlmClient.calls.get() - before
        val out = spark.read.parquet(s"$outDir/batch_*")
        val rows = out.count()
        val distinctIds = out.select("id").distinct().count()
        // floor of the resume bill: one call per full batch of missing
        // rows; partial batches at chunk/partition seams add a few more
        val minResume = (Rows - durableRows + Batch - 1) / Batch
        // THE durability invariant: a row whose result landed before the
        // halt must never be invoked again — any such row would now hold
        // two successful attempts in its batch ledger
        val reinvokedDurable = perBatch(_.filter(col("result").isNotNull)
          .select("_row_index", "_attempt").distinct()
          .groupBy("_row_index").count()
          .filter(col("count") > 1).count())
        val wall = (System.nanoTime() - t0) / 1e9
        println(
          f"""{"phase":"stream_resume","rows":$rows,"distinct_ids":$distinctIds,""" +
          f""""rows_lost":${Rows - distinctIds},"durable_rows_before":$durableRows,""" +
          f""""resume_calls":$invoked,"min_resume_calls":$minResume,""" +
          f""""reinvoked_durable_rows":$reinvokedDurable,"wall_sec":$wall%.2f}""")
    }
    spark.stop()
  }
}
