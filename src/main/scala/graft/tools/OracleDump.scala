package graft.tools

/** Dump SparkEntry.oracleSql as sorted JSON WITHOUT starting Spark — the
  * cheap half of an oracle-refactor proof: byte-diff the dump before and
  * after, and re-run tools/verify_local.py (DuckDB only) against an
  * existing Verify parquet dump for any arm whose SQL text changed.
  *
  *   runMain graft.tools.OracleDump <outFile>
  */
object OracleDump {
  def main(args: Array[String]): Unit = {
    val json = graft.SparkEntry.oracleSql.toSeq.sortBy(_._1)
      .map { case (k, v) =>
        s"${graft.Verify.jsonQuote(k)}: ${graft.Verify.jsonQuote(v)}" }
      .mkString("{", ",\n", "}")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(args(0)), json.getBytes("UTF-8"))
    println(s"wrote ${args(0)}")
  }
}
