package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.MergeStrategy

/** Merge parsed result columns back into the original table — the engine's
  * one real join (reference: ondine/stages/result_writer_stage.py:74-125;
  * strategies enum ondine/core/specifications.py:47-52).
  *
  * `results` carries `_row_index` + the output columns; the join is a left
  * join on `_row_index` so unprocessed rows survive with nulls. At scale
  * Catalyst picks SMJ/shuffled-hash on the long key; when the result side is
  * small (auto-retry passes) AQE broadcasts it.
  */
object ResultMerger {

  def merge(original: DataFrame, results: DataFrame,
            outputCols: Seq[String],
            strategy: MergeStrategy.Value): DataFrame = {
    val res = results.select((RowIndex.ColName +: outputCols).map(col): _*)
    strategy match {
      case MergeStrategy.Append =>
        val clash = original.columns.toSet.intersect(outputCols.toSet)
        require(clash.isEmpty,
          s"APPEND merge: output columns already exist: ${clash.mkString(",")}")
        original.join(res, Seq(RowIndex.ColName), "left")

      case MergeStrategy.Replace =>
        val pruned = original.drop(outputCols: _*)
        pruned.join(res, Seq(RowIndex.ColName), "left")

      case MergeStrategy.Update =>
        // non-null new values win; null keeps the original (coalesce)
        val existing = original.columns.toSet
        val renamed = outputCols.foldLeft(res)((d, c) =>
          d.withColumnRenamed(c, s"_new_$c"))
        val joined = original.join(renamed, Seq(RowIndex.ColName), "left")
        outputCols.foldLeft(joined) { (d, c) =>
          val merged =
            if (existing.contains(c)) coalesce(col(s"_new_$c"), col(c))
            else col(s"_new_$c")
          d.withColumn(c, merged).drop(s"_new_$c")
        }
    }
  }
}
