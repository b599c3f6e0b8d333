package graft

import org.apache.spark.sql.functions._
import graft.llm.MockLlmClient
import graft.run.Enricher

/** Physical-plan assertions — the "would this survive 100x scale-up"
  * checks: filters and projections must reach the parquet scan, small dims
  * must broadcast, and the enrichment fast path must stay shuffle-free.
  */
class PlanSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("filter + projection push into the parquet scan") {
    val p = plan(graft.queries.RelationalQueries.q02FilterProject(spark, dir))
    assert(p.contains("PushedFilters: ["), s"no pushed filters in:\n$p")
    assert(p.contains("GreaterThan(l_quantity"), "l_quantity filter not pushed")
    // pruned read schema: only the 4 referenced columns, not all 11
    assert(!p.contains("l_returnflag"), "read schema not pruned")
  }

  test("dimension joins broadcast (no fact-table shuffle for the dim side)") {
    val p = plan(graft.queries.RelationalQueries.q03SegmentRevenue(spark, dir))
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast join:\n$p")
  }

  test("enrichment fast path is shuffle-free") {
    import spark.implicits._
    val df = (0 until 100).map(i => s"t$i").toDF("text")
    val r = Enricher.enrich(df, "P:{text}", Seq("out"),
      new MockLlmClient(), batchSize = 10)
    val p = plan(r.data)
    assert(!p.contains("Exchange"),
      s"fast-path enrichment must not shuffle:\n$p")
  }

  test("whole-stage codegen covers the aggregation pipeline") {
    // note: lambda-based array expressions (q30 etc.) are codegen-fallback
    // by design in Spark; the scan->agg pipeline must codegen.
    val df = graft.queries.RelationalQueries.q01PricingSummary(spark, dir)
    df.collect() // finalize THIS df's adaptive plan
    val p = plan(df)
    // "*(n)" prefixes mark WholeStageCodegen stages in plan toString
    assert(p.contains("*("), s"expected codegen spans:\n$p")
    assert(p.contains("partial_sum"),
      "expected map-side partial aggregation before the shuffle")
  }
}
