package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: media as opaque `binary` columns with typed
  * metadata, decoded/feature-extracted in batched partition passes.
  *
  * The image/audio codec libraries are not available in this environment, so
  * `decodeBatch` is a clearly-marked STUB producing a deterministic fake —
  * but the Spark-side contract is real and tested: binary column + schema,
  * partition-local batched iteration (the JVM analogue of `mapInPandas`
  * batch shape), typed struct output, and no shuffle. Swapping the stub for
  * a real decoder (JavaCV / TwelveMonkeys / ffmpeg pipe) changes only the
  * body of `decodeBatch`.
  */
object Multimodal {

  /** Batch size for the vectorized-decode loop — real decoders amortize
    * native-call overhead across a batch, exactly like Arrow batches do for
    * mapInPandas. */
  val DecodeBatchSize = 64

  val metaSchema: StructType = StructType(Seq(
    StructField("n_bytes", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false)))

  /** STUB decoder: deterministic pseudo-metadata from the payload length.
    * A real implementation would parse the container header / decode pixels
    * here, one batch at a time. */
  private def decodeBatch(batch: Seq[Array[Byte]]): Seq[Row] =
    batch.map { bytes =>
      val n = if (bytes == null) 0L else bytes.length.toLong
      Row(n, ((n % 64) * 16 + 16).toInt, ((n % 48) * 16 + 16).toInt,
        (n % 30 + 1).toInt)
    }

  /** Attach decoded media metadata as a `media_meta` struct column.
    * Partition-local, batched, passthrough of all input columns. */
  def withDecodedMeta(df: DataFrame, binaryCol: String): DataFrame = {
    val inSchema = df.schema
    val outSchema = inSchema.add("media_meta", metaSchema, nullable = false)
    val binAt = inSchema.fieldIndex(binaryCol)
    df.mapPartitions { rows =>
      rows.grouped(DecodeBatchSize).flatMap { batch =>
        val metas = decodeBatch(batch.map(r =>
          if (r.isNullAt(binAt)) null else r.getAs[Array[Byte]](binAt)))
        batch.lazyZip(metas).map((r, m) => Row.fromSeq(r.toSeq :+ m))
      }
    }(Encoders.row(outSchema))
  }
}
