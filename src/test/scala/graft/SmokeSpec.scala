package graft

/** Analysis + execution smoke over the ENTIRE declared query inventory.
  *
  * Round-5 lesson: a Spark upgrade (4.1.2 resolving parquet
  * TIMESTAMP(NANOS) as TIMESTAMP_NTZ) broke seven events-table queries,
  * and nothing in `sbt test` noticed — the queries simply vanished from
  * the driver's correctness file and fast-failed in the bench. This suite
  * closes that hole: every `SparkEntry.queries` entry is materialized at
  * sf0.001 through the noop sink (which demands every output column, so
  * analysis AND execution must succeed). A query can no longer silently
  * drop out of the correctness gate — it fails here by name first.
  */
class SmokeSpec extends SparkSpec {
  private val sfDir = "/root/testdata/sf0.001"

  private def materialize(df: org.apache.spark.sql.DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"smoke: $name") {
      materialize(fn(spark, sfDir))
      spark.catalog.clearCache()
    }
  }

  test("every query has an oracle or a documented exemption") {
    // queries without SQL-expressible oracles get a weaker rows-only
    // check from the driver; keep that set explicit so a missing oracle
    // is a decision, not an accident
    // q145: the CMS xxHash64 fast tier — DuckDB has no xxHash64, which
    // is exactly the documented trade of the tier (Spark-reproducible,
    // not any-engine-reproducible). Rows-only from the driver; the
    // tier's correctness is spec-covered (DsirSketchSpec) and the
    // portable q134 twin stays hash-verified.
    // q147: the winnowing fast tier — the rolling k-gram polynomial is
    // Spark-side-only by design (same trade). Rows-only from the driver;
    // spec-covered in CurationSpec, portable q79 twin stays hash-verified.
    val exempt = Set("q145_cms_novelty_fast", "q147_winnowing_fast",
      "q166_stemmed_census") // no Porter stemmer in DuckDB (PorterSpec pins it)
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet -- exempt
    assert(missing.isEmpty, s"queries with no oracle and no exemption: $missing")
  }
}
