package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Each entry is one operator/capability from SURVEY §2, implemented
  * Spark-first in graft.* and demonstrated here; `oracleSql` is the
  * DuckDB-equivalent ANSI SQL the driver hash-compares against.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * the full enrichment pipeline end-to-end on the documents table. */
  def entry(spark: SparkSession): DataFrame =
    EnrichQueries.qEnrichBatched(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.all ++ EnrichQueries.all ++ TextQueries.all ++
      CurationQueries.all ++ SimilarityQueries.all ++ EventQueries.all ++
      RagQueries.all ++ VerifyQueries.all ++ SourceQueries.all

  def oracleSql: Map[String, String] =
    RelationalQueries.oracles ++ EnrichQueries.oracles ++
      TextQueries.oracles ++ CurationQueries.oracles ++
      SimilarityQueries.oracles ++ EventQueries.oracles ++
      RagQueries.oracles ++ VerifyQueries.oracles ++ SourceQueries.oracles
}
