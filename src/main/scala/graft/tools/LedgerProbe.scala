package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc seen-ledger growth probe (not part of the driver contract):
  * times [[graft.operators.SeenLedger.append]] and the pruned probe +
  * dropSeenBefore against standing ledgers at 1x/10x/100x, holding the
  * incoming crawl fixed — the shape evidence for BENCH_NOTES that ledger
  * maintenance tracks the ledger SCAN (linear) and the drop tracks the
  * incoming mass, with no superlinear stage.
  *
  *   runMain graft.tools.LedgerProbe [baseRows] [multipliers...]
  */
object LedgerProbe {
  def main(args: Array[String]): Unit = {
    val base = if (args.nonEmpty) args(0).toLong else 100000L
    val mults = if (args.length > 1) args.drop(1).map(_.toInt).toSeq
      else Seq(1, 10, 100)
    val spark = SparkSession.builder()
      .appName("graft-ledger-probe")
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def docs(n: Long, offset: Long) = spark.range(n)
      .select((col("id") + offset).as("doc_id"),
        concat(lit("synthetic crawl document body "), col("id") + offset)
          .as("text"))

    mults.foreach { m =>
      val ledgerRows = base * m
      val path = java.nio.file.Files
        .createTempDirectory(s"graft_ledger_probe_$m").toString + "/ledger"
      // standing ledger: one bulk append of the full corpus's fingerprints
      val t0 = System.nanoTime()
      graft.operators.SeenLedger.append(
        graft.operators.Dedup.exactGroups(
          docs(ledgerRows, 0L), "doc_id", "text"), path, "crawl-0")
      val buildS = (System.nanoTime() - t0) / 1e9

      // fixed incoming crawl: `base` docs, 50% already seen (ids
      // straddle the ledger's upper boundary)
      val t1 = System.nanoTime()
      val appended = graft.operators.SeenLedger.append(
        graft.operators.Dedup.exactGroups(
          docs(base, ledgerRows - base / 2), "doc_id", "text"),
        path, "crawl-1")
      val appendS = (System.nanoTime() - t1) / 1e9

      // drop probe over a SECOND straddling window (half hits crawl-1's
      // fresh appends, half brand new) against the grown ledger
      val t2 = System.nanoTime()
      val kept = graft.operators.Dedup.dropSeenBefore(
        docs(base, ledgerRows),
        graft.operators.SeenLedger.read(spark, path), "text")
        .count()
      val dropS = (System.nanoTime() - t2) / 1e9

      println(f"LEDGER x$m%-3d rows=$ledgerRows%9d build=$buildS%7.2fs " +
        f"append=$appendS%6.2fs (n=$appended) drop=$dropS%6.2fs (kept=$kept)")
    }
    spark.stop()
  }
}
