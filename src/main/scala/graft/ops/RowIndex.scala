package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Stable per-row identity — the engine's resume/merge key
  * (reference: RowMetadata.row_index, ondine/core/models.py:97-103; resume
  * contract ondine/adapters/response_cache.py:1-49).
  *
  * Spark reads are unordered, so determinism needs either a user key column
  * (the 100 TB answer: zero extra cost, survives repartitioning) or a
  * zipWithIndex pass (deterministic for a fixed input + partitioning, but
  * forces a row-oriented pass — fine at test scale, discouraged at 100 TB).
  */
object RowIndex {
  val ColName = "_row_index"

  def withRowIndex(df: DataFrame, keyColumn: Option[String] = None): DataFrame =
    if (df.columns.contains(ColName)) df
    else keyColumn match {
      case Some(k) => df.withColumn(ColName, keyExpr(df, k))
      case None    => zipWithIndex(df)
    }

  /** Numeric keys cast to long; any other type hashes deterministically
    * (string ids are the common real-world key — an ANSI cast would crash
    * mid-job). xxhash64 collisions at 64 bits are negligible for resume/
    * merge cardinalities; a collision could only merge two rows' results. */
  def keyExpr(df: DataFrame, k: String): org.apache.spark.sql.Column =
    df.schema(k).dataType match {
      case _: org.apache.spark.sql.types.NumericType => col(k).cast(LongType)
      case _ => xxhash64(col(k))
    }

  /** Contiguous 0-based index preserving the source row order. */
  def zipWithIndex(df: DataFrame): DataFrame = {
    val schema = df.schema.add(ColName, LongType, nullable = false)
    val rdd = df.rdd.zipWithIndex().map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ i)
    }
    df.sparkSession.createDataFrame(rdd, schema)
  }
}
