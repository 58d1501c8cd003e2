package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing for training-data
  * pipelines (engine extension).
  *
  * Payloads are opaque `BINARY` columns with typed metadata
  * ([[graft.model.Schemas.multimodalAsset]]). The Spark-side plumbing —
  * schema, partition sizing, per-partition batched decode, feature schema —
  * is real and tested; the codec itself is STUBBED with a deterministic
  * fake (this container ships no image/audio libraries). Swapping
  * `decodeStub` for a real decoder (JNI/ffmpeg/javacv) changes no plan
  * shape: the operator stays a `mapPartitions` over binary batches.
  *
  * Scale posture: binary payloads are large → keep them out of shuffles.
  * Decode/feature-extract runs map-side on the scan partition
  * (`spark.sql.files.maxPartitionBytes` bounds task input); only the small
  * feature vectors flow downstream.
  */
object Multimodal {

  val FeatureDim = 16

  /** Stub codec with per-instance (per-partition) initialization — the
    * shape a real decoder needs: construct once per partition so codec
    * handles / JNI contexts amortize across the partition's rows. */
  private[multimodal] final class StubDecoder {
    def decode(payload: Array[Byte]): Array[Double] =
      Multimodal.decodeStub(payload)
  }

  /** Deterministic fake decode: payload bytes → FeatureDim doubles.
    * Keyed off content so tests are reproducible. Replace with a real
    * decoder at deploy. */
  private[multimodal] def decodeStub(payload: Array[Byte]): Array[Double] = {
    val out = new Array[Double](FeatureDim)
    var h = 0xcbf29ce484222325L // FNV offset basis
    var i = 0
    while (i < payload.length) {
      h = (h ^ (payload(i) & 0xffL)) * 0x100000001b3L
      out(i % FeatureDim) += ((h >>> 11).toDouble / (1L << 53).toDouble)
      i += 1
    }
    val n = math.max(1, payload.length / FeatureDim)
    out.map(v => v / n)
  }

  /** Frame-sample positions for a video payload: every `everyMs`
    * milliseconds across `durationMs`, capped at `maxFrames`. */
  def framePositions(durationMs: Long, everyMs: Long,
                     maxFrames: Int = 32): Seq[Long] =
    (0L until durationMs by math.max(1L, everyMs)).take(maxFrames)

  /** Decode + feature-extract: (asset_id, modality, payload, meta) →
    * (asset_id, modality, n_bytes, features ARRAY<DOUBLE>). The decoder is
    * constructed once per partition (codec-handle init amortizes across the
    * partition's rows); the per-row work is the decode itself. */
  def extractFeatures(assets: DataFrame,
                      payloadCol: String = "payload"): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType),
      StructField("modality", StringType),
      StructField("n_bytes", LongType),
      StructField("features", ArrayType(DoubleType))))
    implicit val enc = RowEncoder.encoderFor(outSchema)
    assets.select(col("asset_id"), col("modality"), col(payloadCol))
      .mapPartitions { rows =>
        val decoder = new StubDecoder() // per-partition init
        rows.map { r =>
          val payload = r.getAs[Array[Byte]](payloadCol)
          val bytes = if (payload == null) Array.emptyByteArray else payload
          Row(r.getAs[Long]("asset_id"), r.getAs[String]("modality"),
            bytes.length.toLong, decoder.decode(bytes).toIndexedSeq)
        }
      }
  }

  /** Video frame sampling: one row per sampled frame with a per-frame
    * feature vector (stub decodes a byte-slice per frame). Explode happens
    * AFTER the map-side decode, so the binary never shuffles. */
  def sampleFrames(assets: DataFrame, everyMs: Long = 1000L,
                   maxFrames: Int = 32): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType),
      StructField("frame_ms", LongType),
      StructField("features", ArrayType(DoubleType))))
    implicit val enc = RowEncoder.encoderFor(outSchema)
    assets
      .filter(col("modality") === "video")
      .select(col("asset_id"), col("payload"),
        col("meta.duration_ms").as("duration_ms"))
      .flatMap { r =>
        val payload = Option(r.getAs[Array[Byte]]("payload"))
          .getOrElse(Array.emptyByteArray)
        val dur = Option(r.getAs[Any]("duration_ms"))
          .map(_.asInstanceOf[Long]).getOrElse(0L)
        framePositions(dur, everyMs, maxFrames).map { ms =>
          // stub "seek": hash a deterministic slice per frame position
          val off = if (payload.isEmpty) 0
            else ((ms * 31) % payload.length).toInt
          val slice = payload.drop(off).take(256)
          Row(r.getAs[Long]("asset_id"), ms, decodeStub(slice).toIndexedSeq)
        }
      }
  }

  /** Build a synthetic asset table from any binary-able column — used by
    * tests and the demo queries (documents.text → utf8 bytes as payload). */
  def assetsFromText(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("asset_id"),
      when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio")
        .otherwise("video").as("modality"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        lit(64).as("width"), lit(64).as("height"),
        lit(16000).as("sample_rate"),
        (length(col("text")) * 10).cast("long").as("duration_ms"),
        lit("stub").as("codec")).as("meta"))
}
