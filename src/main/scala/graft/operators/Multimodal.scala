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

  /** Frame sampling plumbing: one output row per sampled frame
    * (`frame_idx`, `frame` binary) — the video frame-sample shape. The
    * stub "frame" is a deterministic 16-byte slice of the payload at
    * idx*16 (a real decoder would seek and decode the keyframe there);
    * the explode happens partition-locally inside the same batched pass,
    * no shuffle. Sampled indices: 0, stride, 2*stride, ... < n_frames. */
  def sampleFrames(df: DataFrame, binaryCol: String,
                   stride: Int = 1): DataFrame = {
    require(stride >= 1, "stride must be >= 1")
    val inSchema = df.schema
    val outSchema = inSchema
      .add("frame_idx", IntegerType, nullable = false)
      .add("frame", BinaryType, nullable = true)
    val binAt = inSchema.fieldIndex(binaryCol)
    df.mapPartitions { rows =>
      rows.grouped(DecodeBatchSize).flatMap { batch =>
        val payloads = batch.map(r =>
          if (r.isNullAt(binAt)) null else r.getAs[Array[Byte]](binAt))
        val metas = decodeBatch(payloads)
        batch.lazyZip(payloads).lazyZip(metas).flatMap { (r, bytes, m) =>
          val nFrames = m.getInt(3)
          (0 until nFrames by stride).map { i =>
            val frame =
              if (bytes == null) null
              else bytes.slice(math.min(i * 16, bytes.length),
                math.min(i * 16 + 16, bytes.length))
            Row.fromSeq(r.toSeq ++ Seq(i, frame))
          }
        }
      }
    }(Encoders.row(outSchema))
  }

  /** Feature-extraction plumbing: a deterministic `dim`-long float
    * embedding per payload (stub: arithmetic on payload length — a real
    * extractor would run the vision/audio model on the decoded batch).
    * Same batched partition pass, embedding lands as array<float>. */
  def extractFeatures(df: DataFrame, binaryCol: String,
                      dim: Int = 16): DataFrame = {
    val inSchema = df.schema
    val outSchema = inSchema
      .add("features", ArrayType(FloatType, containsNull = false))
    val binAt = inSchema.fieldIndex(binaryCol)
    df.mapPartitions { rows =>
      rows.grouped(DecodeBatchSize).flatMap { batch =>
        batch.map { r =>
          val n = if (r.isNullAt(binAt)) 0L
            else r.getAs[Array[Byte]](binAt).length.toLong
          val feats = Array.tabulate(dim)(d =>
            (((n * 31 + d * 7) % 997) / 997.0).toFloat)
          Row.fromSeq(r.toSeq :+ feats.toSeq)
        }
      }
    }(Encoders.row(outSchema))
  }

  /** Resize plumbing: re-encode each payload to a `width*height`-byte
    * buffer (stub: cycle the source bytes — a real implementation decodes,
    * scales, and re-encodes the pixel buffer here). Output replaces the
    * binary column's content and carries a `resized_meta` struct with the
    * target dimensions; same batched partition pass, no shuffle. */
  def resizeTo(df: DataFrame, binaryCol: String,
               width: Int, height: Int): DataFrame = {
    require(width > 0 && height > 0, "target dims must be positive")
    val inSchema = df.schema
    val outSchema = inSchema.add("resized_meta", metaSchema, nullable = false)
    val binAt = inSchema.fieldIndex(binaryCol)
    val outLen = width * height
    df.mapPartitions { rows =>
      rows.grouped(DecodeBatchSize).flatMap { batch =>
        batch.map { r =>
          val bytes =
            if (r.isNullAt(binAt)) Array.emptyByteArray
            else r.getAs[Array[Byte]](binAt)
          val resized =
            if (bytes.isEmpty) new Array[Byte](outLen)
            else Array.tabulate(outLen)(i => bytes(i % bytes.length))
          val meta = Row(outLen.toLong, width, height, 1)
          Row.fromSeq(r.toSeq.updated(binAt, resized) :+ meta)
        }
      }
    }(Encoders.row(outSchema))
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
