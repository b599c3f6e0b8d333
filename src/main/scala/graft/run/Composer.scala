package graft.run

import org.apache.spark.sql.DataFrame

import graft.core.PipelineSpec
import graft.llm.LlmClient

/** Multi-column enrichment DAG — one pipeline per output column, with
  * `dependsOn` edges feeding earlier outputs into later templates
  * (reference: ondine/api/pipeline_composer.py:27-352; Kahn topological
  * sort :111-178, cycle detection, column accumulation :243-265).
  *
  * Execution is a sequential `transform` chain in topological order; Spark
  * fuses the per-column plans lazily, so independent columns still
  * pipeline inside one job where possible.
  */
object Composer {

  final case class ColumnPipeline(
      outputColumn: String,
      spec: PipelineSpec,
      client: LlmClient,
      dependsOn: Seq[String] = Nil)

  /** Kahn topological sort; throws on cycles or missing dependencies. */
  def topoSort(pipelines: Seq[ColumnPipeline]): Seq[ColumnPipeline] = {
    val byName = pipelines.map(p => p.outputColumn -> p).toMap
    pipelines.foreach { p =>
      val missing = p.dependsOn.filterNot(byName.contains)
      require(missing.isEmpty,
        s"${p.outputColumn} depends on undefined columns: ${missing.mkString(",")}")
    }
    val indeg = scala.collection.mutable.Map(
      pipelines.map(p => p.outputColumn -> p.dependsOn.size): _*)
    val out = scala.collection.mutable.ArrayBuffer.empty[ColumnPipeline]
    val ready = scala.collection.mutable.Queue(
      pipelines.filter(_.dependsOn.isEmpty).map(_.outputColumn).sorted: _*)
    while (ready.nonEmpty) {
      val name = ready.dequeue()
      out += byName(name)
      pipelines.filter(_.dependsOn.contains(name)).foreach { dep =>
        indeg(dep.outputColumn) -= 1
        if (indeg(dep.outputColumn) == 0) ready.enqueue(dep.outputColumn)
      }
    }
    require(out.size == pipelines.size,
      s"dependency cycle among: ${
        pipelines.map(_.outputColumn).diff(out.map(_.outputColumn).toSeq)
          .mkString(",")}")
    out.toSeq
  }

  /** Run every column pipeline in dependency order, accumulating output
    * columns into one frame. */
  def run(df: DataFrame, pipelines: Seq[ColumnPipeline],
          keyColumn: Option[String] = None): DataFrame =
    topoSort(pipelines).foldLeft(df) { (acc, p) =>
      new Enricher(p.spec, p.client, runDir = None, keyColumn = keyColumn)
        .enrich(acc).data
    }
}
