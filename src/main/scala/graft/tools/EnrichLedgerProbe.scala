package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core._
import graft.llm.MockLlmClient

/** Ad-hoc durable-enrich ledger growth probe (not part of the driver
  * contract): times the DURABLE path's ledger machinery — chunked
  * invoke + per-chunk ledger append, then a full resume (complete
  * ledger, zero re-invocations) — at 1×/10×/100× of the standing
  * 100k-row bench arm, holding chunk SIZE fixed so chunk count grows
  * with rows exactly as a production run's would. The evidence sought
  * for BENCH_NOTES: durable wall ~linear in rows, resume wall ~linear
  * in ledger size, ledger file count ~linear in chunk count (write
  * fan-in bounded), and 0 re-invoked calls on resume at every scale.
  *
  *   runMain graft.tools.EnrichLedgerProbe [baseRows] [multipliers...]
  */
object EnrichLedgerProbe {
  def main(args: Array[String]): Unit = {
    val base = if (args.nonEmpty) args(0).toLong else 100000L
    val mults = if (args.length > 1) args.drop(1).map(_.toInt).toSeq
      else Seq(1, 10, 100)
    val spark = SparkSession.builder()
      .appName("graft-enrich-ledger-probe")
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    mults.foreach { m =>
      val n = base * m
      // partition size 5000 (a multiple of batch 50), as the bench arm
      val rows = spark.range(0L, n, 1L, (n / 5000L).toInt.max(1))
        .select(col("id"), concat(lit("review text number "), col("id"))
          .as("review"))
        .persist()
      rows.count()
      val dir = java.nio.file.Files
        .createTempDirectory(s"graft_enrich_probe_$m").toString + "/run"
      val spec = PipelineSpec(
        dataset = DatasetSpec(Seq("review")),
        prompt = PromptSpec("Classify the tone of: {review}", batchSize = 50),
        processing = ProcessingSpec(chunkRows = base.toInt),
        output = OutputSpec(Seq("sentiment")))

      val t0 = System.nanoTime()
      val r1 = new graft.run.Enricher(spec, new MockLlmClient(),
        runDir = Some(dir), keyColumn = Some("id")).enrich(rows)
      r1.data.count()
      val durableS = (System.nanoTime() - t0) / 1e9

      val ledgerFiles = new java.io.File(s"$dir/responses").listFiles()
        .count(_.getName.endsWith(".parquet"))

      val callsBefore = MockLlmClient.calls.get()
      val t1 = System.nanoTime()
      val r2 = new graft.run.Enricher(spec, new MockLlmClient(),
        runDir = Some(dir), keyColumn = Some("id")).enrich(rows)
      r2.data.count()
      val resumeS = (System.nanoTime() - t1) / 1e9
      val reinvoked = MockLlmClient.calls.get() - callsBefore

      println(f"ENRICH x$m%-3d rows=$n%9d chunks=$m%3d durable=$durableS%7.2fs " +
        f"ledger_files=$ledgerFiles%5d resume=$resumeS%7.2fs " +
        f"reinvoked=$reinvoked (rows=${r1.metrics.rows})")
      rows.unpersist()
    }
    spark.stop()
  }
}
