package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}
import org.apache.spark.sql.Row

import graft.core.PipelineSpec
import graft.llm.LlmClient
import graft.run.{BudgetExceededException, Enricher}

/** Streaming enrichment: Structured Streaming micro-batches through the
  * enrichment pipeline (reference: execute_stream_async,
  * ondine/api/pipeline.py:1326-1497 — bounded-queue chunked execution with
  * cumulative budget; here the stream engine supplies the queueing,
  * backpressure and lookahead, and `foreachBatch` runs the same Enricher
  * used in batch mode).
  *
  * Cumulative budget across micro-batches (reference :1460-1462): spend
  * accumulates driver-side; when the cap trips the query is stopped —
  * rows already enriched are already written (micro-batch durability).
  */
object StreamingEnrich {

  /** Wire a streaming DataFrame through enrichment into `sink`.
    * Returns the started query (AvailableNow when `drainAll`). */
  def start(stream: DataFrame, spec: PipelineSpec, client: LlmClient,
            checkpointDir: String,
            sink: (DataFrame, Long) => Unit,
            maxBudget: Option[BigDecimal] = None,
            drainAll: Boolean = true): StreamingQuery = {
    // strip the budget from the per-batch spec: enforcement is cumulative
    // across batches out here, not per-batch in there
    val batchSpec = spec.copy(processing =
      spec.processing.copy(maxBudget = None))
    var spent = java.math.BigDecimal.ZERO
    val writer: DataStreamWriter[Row] = stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val r = new Enricher(batchSpec, client).enrich(batch)
          sink(r.data, batchId)
          spent = spent.add(r.metrics.cost)
          maxBudget.foreach { cap =>
            if (spent.compareTo(cap.bigDecimal) > 0)
              throw new BudgetExceededException(
                s"cumulative streaming budget exceeded: $spent > $cap")
          }
        }
      }
    (if (drainAll) writer.trigger(Trigger.AvailableNow()) else writer).start()
  }
}
