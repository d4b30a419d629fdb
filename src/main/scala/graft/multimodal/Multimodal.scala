package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing for a training-data pipeline: media as
  * opaque `binary` payloads + typed metadata structs, with decode /
  * feature-extract / resize / frame-sample stages shaped for batch
  * execution (`mapPartitions` over row batches — the JVM analogue of the
  * arrow-batched UDF pattern).
  *
  * The actual codec work is STUBBED (this container carries no image/
  * audio libraries): `decodeStub` derives deterministic pseudo-features
  * from the payload bytes via xxhash64 so the plumbing — schema,
  * partitioning, batch shape, null-safety — is real and testable, and a
  * production codec drops in by replacing one function.
  */
object Multimodal {

  /** Media column schema: payload + typed metadata (FIXTURES-style). */
  val mediaSchema: StructType = StructType(Seq(
    StructField("payload", BinaryType),
    StructField("mime", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType)))

  val featureDim = 16

  /** Deterministic stand-in for a real image/audio decoder: features are
    * xxhash64(payload, seed i) folded into [-1, 1). Replace with a codec
    * for production. */
  private[multimodal] def decodeStub(payload: Array[Byte], dim: Int): Array[Float] = {
    if (payload == null) return null
    val out = new Array[Float](dim)
    var i = 0
    while (i < dim) {
      val h = XXH64.hashUnsafeBytes(payload,
        org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, payload.length, i.toLong)
      out(i) = ((java.lang.Math.floorMod(h, 2000000L) / 1000000.0) - 1.0).toFloat
      i += 1
    }
    out
  }

  /** Feature extraction over binary payloads, batched per partition.
    * Output: input columns + `features array<float>` + `n_bytes`. */
  def extractFeatures(df: DataFrame, payloadCol: String): DataFrame = {
    val schema = df.schema
      .add("features", ArrayType(FloatType, containsNull = false))
      .add("n_bytes", LongType)
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    val idx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { rows =>
      // batch shape: decode per-partition in one pass, no per-row setup cost
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](idx)
        val feats = decodeStub(payload, featureDim)
        val n = if (payload == null) 0L else payload.length.toLong
        Row.fromSeq(r.toSeq :+ (if (feats == null) null else feats.toSeq) :+ n)
      }
    }(enc)
  }

  /** Resize stub: records the target dims in metadata and re-derives
    * features at the "resized" payload (deterministic truncation of the
    * byte stream stands in for the pixel op). */
  def resize(df: DataFrame, payloadCol: String, w: Int, h: Int): DataFrame =
    df.withColumn("resized_payload",
      expr(s"substring($payloadCol, 1, greatest(int(length($payloadCol) * " +
        s"least($w * $h / 1048576.0, 1.0)), 1))"))
      .withColumn("target_width", lit(w))
      .withColumn("target_height", lit(h))

  /** Frame-sample stub for video payloads: n evenly spaced "frames" as
    * byte slices, exploded one row per frame with a frame index. */
  def sampleFrames(df: DataFrame, payloadCol: String, n: Int): DataFrame = {
    val len = length(col(payloadCol))
    val frames = sequence(lit(0), lit(n - 1))
    df.withColumn("frame_idx", explode(frames))
      .withColumn("frame_payload",
        expr(s"substring($payloadCol, int(frame_idx * length($payloadCol) / $n) + 1, " +
          s"greatest(int(length($payloadCol) / $n), 1))"))
      .where(len > 0)
  }

  /** Typed metadata projection for mixed-media tables: route rows by mime
    * family; downstream stages filter on `media_kind` so each modality's
    * decode runs over a pruned scan. */
  def withMediaKind(df: DataFrame, mimeCol: String): DataFrame =
    df.withColumn("media_kind",
      when(col(mimeCol).startsWith("image/"), "image")
        .when(col(mimeCol).startsWith("audio/"), "audio")
        .when(col(mimeCol).startsWith("video/"), "video")
        .otherwise("other"))
}
