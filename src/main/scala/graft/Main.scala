package graft

import org.apache.spark.sql.SparkSession

import graft.llm.MockLlmClient
import graft.run.{ConfigLoader, CostEstimator, Enricher, ProviderBatch}
import graft.sources.Sources

/** CLI entry (reference: ondine/cli/main.py:202-1270 — process, estimate,
  * submit, collect). Usage:
  *
  *   graft.Main process  --config cfg.yaml --input in.csv --output out.parquet
  *                       [--run-dir DIR] [--key-column COL]
  *   graft.Main estimate --config cfg.yaml --input in.csv
  *   graft.Main submit   --config cfg.yaml --input in.csv --run-dir DIR
  *   graft.Main collect  --config cfg.yaml --input in.csv --run-dir DIR --output out.parquet
  *
  * The client is the deterministic mock in this zero-egress build; a real
  * HTTP client plugs in through the same LlmClient trait.
  */
object Main {

  def main(args: Array[String]): Unit = {
    if (args.isEmpty) { usage(); sys.exit(2) }
    val cmd = args.head
    val opts = parseOpts(args.tail)
    def need(k: String): String = opts.getOrElse(k,
      { System.err.println(s"missing --$k"); usage(); sys.exit(2) })

    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .appName("graft")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    try {
      val spec = ConfigLoader.fromFile(need("config"))
      val input = Sources.read(spark, need("input"))
      val client = new MockLlmClient()
      cmd match {
        case "process" =>
          val r = new Enricher(spec, client,
            runDir = opts.get("run-dir"),
            keyColumn = opts.get("key-column")).enrich(input)
          Sources.write(r.data, need("output"))
          System.out.println(
            s"""{"rows":${r.metrics.rows},"calls":${r.metrics.calls},""" +
            s""""tokens_in":${r.metrics.tokensIn},"tokens_out":${r.metrics.tokensOut},""" +
            s""""cost":"${r.metrics.cost}","skipped":${r.metrics.skippedRows},""" +
            s""""quality":"${r.quality.rating}","success_rate":${r.quality.successRate}}""")
        case "estimate" =>
          val e = CostEstimator.estimate(input, spec)
          System.out.println(
            s"""{"total_rows":${e.totalRows},"sample_rows":${e.sampleRows},""" +
            s""""est_tokens_in":${e.estTokensIn},"est_tokens_out":${e.estTokensOut},""" +
            s""""est_cost":"${e.estCost}","confidence":"${e.confidence}"}""")
        case "submit" =>
          val dir = need("run-dir")
          val backend = new ProviderBatch.LocalMockBackend(spark, s"$dir/provider")
          val run = ProviderBatch.submit(input, spec, dir, backend,
            opts.get("key-column"))
          System.out.println(
            s"""{"job_id":"${run.jobId}","state":"${run.state}"}""")
        case "collect" =>
          val dir = need("run-dir")
          val backend = new ProviderBatch.LocalMockBackend(spark, s"$dir/provider")
          val out = ProviderBatch.collect(input, spec, dir, backend,
            opts.get("key-column"))
          Sources.write(out, need("output"))
          System.out.println(s"""{"state":"SUCCEEDED","rows":${out.count()}}""")
        case other =>
          System.err.println(s"unknown command: $other"); usage(); sys.exit(2)
      }
    } finally spark.stop()
  }

  private def parseOpts(args: Array[String]): Map[String, String] =
    args.sliding(2, 2).collect {
      case Array(k, v) if k.startsWith("--") => k.stripPrefix("--") -> v
    }.toMap

  private def usage(): Unit =
    System.err.println(
      "usage: graft.Main process|estimate|submit|collect --config cfg.yaml " +
        "--input PATH [--output PATH] [--run-dir DIR] [--key-column COL]")
}
