package graft.run

import java.math.{BigDecimal => JBigDecimal}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.core._
import graft.llm.LlmClient
import graft.ops._

/** Run metrics (reference: ProcessingStats + CostEstimate,
  * ondine/core/models.py:72-82,143-355). Cost is exact Decimal, computed
  * from per-call records deduplicated by (attempt, call) — idempotent under
  * Spark task retry. */
final case class RunMetrics(
    rows: Long,
    calls: Long,
    tokensIn: Long,
    tokensOut: Long,
    cost: JBigDecimal,
    skippedRows: Long,
    durationMs: Long)

final case class EnrichResult(
    data: DataFrame,
    metrics: RunMetrics,
    quality: QualityReport)

/** The pipeline facade — the Spark re-expression of the reference's
  * `enrich()` / `Pipeline.execute()` lifecycle (ondine/api/enrich.py:45-161,
  * ondine/api/pipeline.py:642-927):
  *
  *   filters → _row_index → [preprocess] → prompt expr → chunked
  *   Invoke (batch + disaggregate fused, durable ledger append) →
  *   parse → auto-retry → merge → quality guard
  *
  * Durability (reference headline feature, SURVEY §7.4): when `runDir` is
  * set, every completed call is appended to `runDir/responses` parquet
  * before the run advances; resume = LEFT ANTI JOIN input vs ledger, so a
  * killed run re-invokes nothing already paid for. Task-retry duplicates
  * dedupe at read time by picking one record per `_row_index`.
  */
final class Enricher(
    spec: PipelineSpec,
    client: LlmClient,
    runDir: Option[String] = None,
    keyColumn: Option[String] = None) {

  import RowIndex.ColName

  def enrich(df: DataFrame): EnrichResult = {
    val t0 = System.nanoTime()
    spec.validate()
    val spark = df.sparkSession
    val budget = new BudgetController(spec.processing.maxBudget)
    // salt re-invocations so a retried call's cost counts separately
    val attemptSalt = System.currentTimeMillis()

    // 1. load-time equality filters (pushed to the scan by Catalyst)
    val filtered = spec.dataset.filters.foldLeft(df) { case (d, (c, v)) =>
      d.filter(col(c) === lit(v))
    }
    val indexed = RowIndex.withRowIndex(filtered, keyColumn)

    // 2. optional input preprocessing on the template's input columns
    val pre =
      if (!spec.processing.preprocessInput) indexed
      else TemplateCompiler.variables(spec.prompt.template).foldLeft(indexed) {
        (d, c) => d.withColumn(c, Preprocess.clean(col(c),
          spec.processing.maxInputLength))
      }

    // 3. prompt render — one codegen'd concat, no UDF
    val formatted = pre
      .withColumn("prompt", TemplateCompiler.compileFull(spec.prompt))
      .select(col(ColName), col("prompt"))

    // 4. invoke (chunked when budget/durability demands driver checkpoints)
    val runId = runDir.map(_.replaceAll("[^A-Za-z0-9]", "_"))
      .getOrElse(s"inline_$attemptSalt")
    def invokeRows(rows: DataFrame): DataFrame =
      Invoke(rows, client, spec.prompt, spec.llm, spec.processing, runId)
        .withColumn("_attempt", lit(attemptSalt))

    val chunked = runDir.isDefined || spec.processing.maxBudget.isDefined
    val invoked: DataFrame =
      if (!chunked) {
        val inv = invokeRows(formatted).persist(StorageLevel.MEMORY_AND_DISK)
        inv.count() // materialize exactly one invocation pass
        inv
      } else {
        val ledgerDir = runDir.map(_ + "/responses")
        val total = formatted.agg(max(ColName)).head().getLong(0) + 1
        val chunkRows = spec.processing.chunkRows.toLong
        var chunks = Vector.empty[DataFrame]
        var lo = 0L
        while (lo < total) {
          val hi = lo + chunkRows
          val slice = formatted.filter(col(ColName) >= lo && col(ColName) < hi)
          val missing = ledgerDir.flatMap(readLedger(spark, _)) match {
            case Some(done) =>
              slice.join(done.select(ColName), Seq(ColName), "left_anti")
            case None => slice
          }
          val inv = invokeRows(missing)
          ledgerDir match {
            case Some(dir) => inv.write.mode("append").parquet(dir)
            case None =>
              val p = inv.persist(StorageLevel.MEMORY_AND_DISK)
              p.count()
              chunks :+= p
          }
          val spentSoFar = ledgerDir.flatMap(readLedger(spark, _)) match {
            case Some(l) => callCost(l)
            case None    => chunks.map(callCost).foldLeft(JBigDecimal.ZERO)(_.add(_))
          }
          budget.check(spentSoFar)
          lo = hi
        }
        ledgerDir.flatMap(readLedger(spark, _)) match {
          case Some(l) => l
          case None =>
            if (chunks.isEmpty) invokeRows(formatted.limit(0))
            else chunks.reduce(_ unionByName _)
        }
      }

    // 5. one record per row: prefer non-null results, then latest attempt
    // (dedupes task-retry duplicates and partial-batch re-runs)
    val w = Window.partitionBy(col(ColName))
      .orderBy(col("result").isNotNull.desc, col("_attempt").desc)
    val perRow = invoked
      .withColumn("_rk", row_number().over(w))
      .filter(col("_rk") === 1).drop("_rk")

    // 6. parse to output columns
    var parsed = ResponseParser.parse(perRow, spec.output)
      .persist(StorageLevel.MEMORY_AND_DISK)

    // 7. auto-retry rows whose outputs all came back null/blank
    // (reference: ondine/api/pipeline.py:1741-1879, <=N passes; skipped rows
    // carry the sentinel and are NOT retried)
    val outs = spec.output.outputColumns
    val allBlank = outs.map(c => col(c).isNull || trim(col(c)) === "").reduce(_ && _)
    var attempt = 0
    while (attempt < spec.processing.autoRetryAttempts &&
           !parsed.filter(allBlank).isEmpty) {
      val failedIdx = parsed.filter(allBlank).select(ColName)
      val redo = invokeRows(formatted.join(failedIdx, Seq(ColName), "left_semi"))
      val redoParsed = ResponseParser.parse(redo, spec.output)
        .persist(StorageLevel.MEMORY_AND_DISK)
      redoParsed.count()
      // coalesce-merge: retried values win where the original was blank
      val keepCols = parsed.columns.toSeq
      val renamed = outs.foldLeft(
        redoParsed.select((ColName +: outs).map(col): _*)) {
          (d, c) => d.withColumnRenamed(c, s"_r_$c")
        }
      parsed = parsed.join(renamed, Seq(ColName), "left")
      for (c <- outs)
        parsed = parsed.withColumn(c,
          when(col(c).isNull || trim(col(c)) === "", col(s"_r_$c"))
            .otherwise(col(c))).drop(s"_r_$c")
      parsed = parsed.select(keepCols.map(col): _*)
        .persist(StorageLevel.MEMORY_AND_DISK)
      attempt += 1
    }

    // 8. merge into the original table
    val merged = ResultMerger.merge(indexed, parsed, outs,
      spec.output.mergeStrategy)

    // 9. metrics + quality + no-output guard
    val q = Quality.report(parsed, outs)
    val statsRow = parsed.agg(
      count(lit(1)),
      sum(when(col("skipped"), 1L).otherwise(0L))).head()
    val calls = invoked.select("_attempt", "_call_id").distinct().count()
    val tok = invoked.dropDuplicates("_attempt", "_call_id")
      .agg(sum("tokens_in"), sum("tokens_out")).head()
    val totalCost = callCost(invoked)
    val metrics = RunMetrics(
      rows = statsRow.getLong(0),
      calls = calls,
      tokensIn = if (tok.isNullAt(0)) 0L else tok.getLong(0),
      tokensOut = if (tok.isNullAt(1)) 0L else tok.getLong(1),
      cost = totalCost,
      skippedRows = statsRow.getLong(1),
      durationMs = (System.nanoTime() - t0) / 1000000L)
    Quality.noOutputGuard(q, metrics.skippedRows,
      metrics.tokensIn + metrics.tokensOut)
    EnrichResult(merged, metrics, q)
  }

  private def readLedger(spark: SparkSession, dir: String): Option[DataFrame] =
    if (!new java.io.File(dir).exists()) None
    else try Some(spark.read.parquet(dir))
    catch {
      // a crash can leave the dir with only an uncommitted _temporary
      // subdir — no schema to infer means no durable rows yet
      case _: org.apache.spark.sql.AnalysisException => None
    }

  /** Exact spend: one cost record per (attempt, call). */
  private def callCost(ledger: DataFrame): JBigDecimal = {
    val r = ledger.dropDuplicates("_attempt", "_call_id")
      .agg(sum("cost")).head()
    if (r.isNullAt(0)) JBigDecimal.ZERO else r.getDecimal(0)
  }
}

/** Smart-defaults front door (reference: enrich() one-liner
  * ondine/api/enrich.py:45-161 + QuickPipeline auto-detection
  * ondine/api/quick.py:74-332 — input columns from `{placeholders}`,
  * parser = json iff multi-column).
  */
object Enricher {
  def enrich(df: DataFrame,
             template: String,
             outputColumns: Seq[String],
             client: LlmClient,
             batchSize: Int = 1,
             maxBudget: Option[BigDecimal] = None,
             runDir: Option[String] = None,
             keyColumn: Option[String] = None): EnrichResult = {
    val inputCols = TemplateCompiler.variables(template)
    val format =
      if (outputColumns.size > 1) ResponseFormat.Json else ResponseFormat.Raw
    val spec = PipelineSpec(
      dataset = DatasetSpec(inputColumns = inputCols),
      prompt = PromptSpec(template, batchSize = batchSize),
      llm = LlmSpec(),
      processing = ProcessingSpec(maxBudget = maxBudget),
      output = OutputSpec(outputColumns, responseFormat = format))
    new Enricher(spec, client, runDir, keyColumn).enrich(df)
  }
}
