package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.core.Sentinels

/** Output quality accounting (reference: ondine/core/models.py:262-355
  * QualityReport + the whole-run output guard ondine/api/pipeline.py:1685-1739).
  *
  * One aggregation pass over the output columns: a cell is invalid when
  * null, blank, or the `[SKIPPED]` sentinel; a row succeeds when every
  * output cell is valid.
  */
final case class QualityReport(
    totalRows: Long,
    validRows: Long,
    invalidCellsPerColumn: Map[String, Long],
    successRate: Double,
    rating: String)

object Quality {

  def invalidCell(c: String) = {
    // compare on a string view: output columns may be typed (Typed format),
    // and ANSI mode rejects int === '[SKIPPED]'
    val s = col(c).cast("string")
    col(c).isNull || trim(s) === "" || s === Sentinels.SkippedOutput
  }

  def report(df: DataFrame, outputCols: Seq[String]): QualityReport = {
    val aggs =
      count(lit(1)).as("_total") +:
      sum(when(outputCols.map(invalidCell).reduce(_ || _), 0L).otherwise(1L)).as("_valid") +:
      outputCols.map(c => sum(when(invalidCell(c), 1L).otherwise(0L)).as(s"_bad_$c"))
    val row: Row = df.agg(aggs.head, aggs.tail: _*).head()
    val total = row.getLong(0)
    val valid = Option(row.get(1)).map(_.asInstanceOf[Long]).getOrElse(0L)
    val perCol = outputCols.zipWithIndex.map { case (c, i) =>
      c -> Option(row.get(i + 2)).map(_.asInstanceOf[Long]).getOrElse(0L)
    }.toMap
    val rate = if (total == 0) 0.0 else valid.toDouble / total
    QualityReport(total, valid, perCol, rate, rating(rate))
  }

  /** success-rate buckets (reference: models.py:283-297). */
  def rating(rate: Double): String =
    if (rate >= 0.95) "excellent"
    else if (rate >= 0.80) "good"
    else if (rate >= 0.50) "poor"
    else "critical"

  /** Fail the run iff it produced ZERO valid outputs AND either something
    * was skipped/failed or no tokens flowed — the two-condition rule
    * (reference: pipeline.py:1685-1739). */
  def noOutputGuard(q: QualityReport, skippedOrFailed: Long, totalTokens: Long): Unit =
    if (q.validRows == 0 && q.totalRows > 0 &&
        (skippedOrFailed > 0 || totalTokens == 0))
      throw new IllegalStateException(
        s"run produced no valid outputs (rows=${q.totalRows}, " +
          s"skipped/failed=$skippedOrFailed, tokens=$totalTokens)")
}
