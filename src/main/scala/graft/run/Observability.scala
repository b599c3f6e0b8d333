package graft.run

import scala.collection.mutable.ArrayBuffer

/** Observer protocol + dispatcher (reference: ondine/observability/ —
  * observer registry, events PipelineStart/End, Error; ~1200 LoC of
  * Langfuse/OTel adapters reduce on Spark to: driver-side lifecycle events
  * here + executor/task metrics from a SparkListener + whatever OTel the
  * cluster config wires in).
  */
sealed trait PipelineEvent { def runId: String }
final case class RunStarted(runId: String, rows: Option[Long]) extends PipelineEvent
final case class ChunkCompleted(runId: String, chunkIndex: Long,
    spentSoFar: java.math.BigDecimal) extends PipelineEvent
final case class RunCompleted(runId: String, metrics: RunMetrics,
    quality: graft.ops.QualityReport) extends PipelineEvent
final case class RunFailed(runId: String, error: String) extends PipelineEvent

trait Observer extends Serializable {
  def onEvent(e: PipelineEvent): Unit
}

final class LoggingObserver extends Observer {
  def onEvent(e: PipelineEvent): Unit =
    System.err.println(s"[graft] $e")
}

/** In-memory collector, handy for tests and programmatic inspection. */
final class CollectingObserver extends Observer {
  val events = new java.util.concurrent.ConcurrentLinkedQueue[PipelineEvent]()
  def onEvent(e: PipelineEvent): Unit = events.add(e)
}

/** Driver-side dispatcher; failures in observers never fail the run
  * (reference dispatcher semantics). */
final class ObserverDispatcher {
  private val observers = ArrayBuffer.empty[Observer]
  def register(o: Observer): this.type = { observers += o; this }
  def emit(e: PipelineEvent): Unit = observers.foreach { o =>
    try o.onEvent(e)
    catch { case ex: Exception =>
      System.err.println(s"[graft] observer failed on $e: ${ex.getMessage}")
    }
  }
}
