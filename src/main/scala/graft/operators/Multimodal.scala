package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column handling for training-data
  * pipelines.
  *
  * Media is carried as an opaque `binary` column plus a typed metadata
  * struct; decode / feature-extraction / resize / frame-sampling run as
  * partition-local transforms (`mapPartitions` over the typed Dataset — the
  * Scala analog of `mapInPandas`: one iterator per partition, batch-shaped,
  * no driver involvement, no shuffle). The plumbing — schemas, encoders,
  * partition preservation, flatMap fan-out for frames — is real and tested;
  * the codec itself is an injectable [[MediaCodec]] whose sandbox default
  * is a deterministic fake (this environment has no image/audio
  * libraries), clearly marked in [[StubCodec]]. Swapping in a real decoder
  * means implementing the two-method trait — no operator changes.
  */
object Multimodal {

  /** One media blob row. `kind` ∈ image|audio|video. */
  case class MediaBlob(media_id: Long, kind: String, bytes: Array[Byte])

  /** Decoded per-blob features. For audio, width/height are 0 and
    * `durationMs`/`sampleRate` are set; for images the reverse.
    */
  case class MediaFeatures(
      media_id: Long, kind: String, sizeBytes: Int,
      width: Int, height: Int, channels: Int,
      sampleRate: Int, durationMs: Long,
      embedding: Array[Float])

  /** One sampled video frame. */
  case class Frame(media_id: Long, frameIdx: Int, ptsMs: Long,
                   width: Int, height: Int, bytes: Array[Byte])

  /** The codec seam: everything that needs a media library lives behind
    * this trait, and the operators ([[decodeFeatures]], [[sampleFrames]])
    * take an instance — so a real JPEG/PCM/video decoder drops in outside
    * this sandbox by implementing two methods, with zero change to the
    * Spark plumbing (schemas, encoders, partition-local execution, frame
    * fan-out). Implementations must be `Serializable` (they ship inside
    * the task closure to executors) and deterministic per payload (the
    * operators promise partitioning-independent output).
    */
  trait MediaCodec extends Serializable {
    def decode(blob: MediaBlob): MediaFeatures
    def sampleFrames(blob: MediaBlob, n: Int): Seq[Frame]
  }

  /** ======== STUB ========
    * Deterministic fake codec: all "decoded" values derive from a 64-bit
    * FNV-1a hash of the payload, so results are stable across runs,
    * partitionings and executors. A real implementation would call an
    * image/audio library here (and ONLY here). The default [[MediaCodec]]
    * in this environment (no media libraries are installed).
    */
  object StubCodec extends MediaCodec {
    def contentHash(bytes: Array[Byte]): Long = {
      var h = 0xcbf29ce484222325L
      var i = 0
      while (i < bytes.length) { h ^= bytes(i) & 0xffL; h *= 0x100000001b3L; i += 1 }
      h
    }

    def decode(blob: MediaBlob): MediaFeatures = {
      val h = contentHash(blob.bytes)
      def mix(k: Int): Long = { val x = h ^ (k * 0x9e3779b97f4a7c15L); x * 0x2545f4914f6cdd1dL }
      val isAudio = blob.kind == "audio"
      val emb = Array.tabulate(8)(i => ((mix(i + 10) >>> 11).toFloat / (1L << 53).toFloat) - 0.5f)
      MediaFeatures(
        media_id = blob.media_id, kind = blob.kind,
        sizeBytes = blob.bytes.length,
        width = if (isAudio) 0 else 64 + (mix(1) & 0x1ff).toInt,
        height = if (isAudio) 0 else 64 + (mix(2) & 0x1ff).toInt,
        channels = if (isAudio) 1 + (mix(3) & 1).toInt else 3,
        sampleRate = if (isAudio) 16000 else 0,
        durationMs = if (blob.kind != "image") 1000L + (mix(4) & 0xffff) else 0L,
        embedding = emb)
    }

    /** Fake frame extraction: `n` evenly spaced frames with payload slices. */
    override def sampleFrames(blob: MediaBlob, n: Int): Seq[Frame] = {
      val f = decode(blob)
      (0 until n).map { i =>
        val pts = if (n == 1) 0L else f.durationMs * i / (n - 1)
        val sliceLen = math.min(16, blob.bytes.length)
        Frame(blob.media_id, i, pts, f.width, f.height,
          blob.bytes.slice(0, sliceLen))
      }
    }
  }

  val blobSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("bytes", BinaryType, nullable = false)))

  /** Decode a blob table into per-blob features. Partition-local: one task
    * per input partition, no shuffle; columnar batch shape is preserved by
    * the Dataset encoder. At 100 TB, decode parallelism == file split count.
    * The codec is injectable ([[MediaCodec]]); [[StubCodec]] is the sandbox
    * default.
    */
  def decodeFeatures(blobs: DataFrame, codec: MediaCodec = StubCodec)
                    (implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    blobs.select("media_id", "kind", "bytes").as[MediaBlob]
      .mapPartitions(it => it.map(codec.decode))
  }

  /** Sample `n` frames per video blob (fan-out flatMap; images/audio are
    * filtered out before decode so no work is wasted on them). Codec
    * injectable as in [[decodeFeatures]].
    */
  def sampleFrames(blobs: DataFrame, n: Int, codec: MediaCodec = StubCodec)
                  (implicit spark: SparkSession): Dataset[Frame] = {
    import spark.implicits._
    blobs.filter(col("kind") === "video")
      .select("media_id", "kind", "bytes").as[MediaBlob]
      .mapPartitions(it => it.flatMap(b => codec.sampleFrames(b, n)))
  }

  /** "Resize": rewrite the metadata of decoded features to the target box,
    * preserving aspect ratio — a pure column transform (no re-decode).
    */
  def resizeMeta(features: DataFrame, maxDim: Int): DataFrame = {
    val scale = least(
      lit(maxDim.toDouble) / greatest(col("width"), lit(1)),
      lit(maxDim.toDouble) / greatest(col("height"), lit(1)), lit(1.0))
    features
      .withColumn("width", when(col("width") > 0,
        greatest(floor(col("width") * scale), lit(1)).cast("int")).otherwise(col("width")))
      .withColumn("height", when(col("height") > 0,
        greatest(floor(col("height") * scale), lit(1)).cast("int")).otherwise(col("height")))
  }

  /** Build a deterministic demo media table from the `documents` testdata
    * (text bytes as payload, kind assigned round-robin). Lets every media
    * operator run against driver-provided data without fixtures.
    */
  def demoBlobs(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.Tables
    Tables.t(spark, sfDir, "documents")
      .select(
        col("doc_id").as("media_id"),
        element_at(typedLit(Seq("image", "audio", "video")),
          (col("doc_id") % 3).cast("int") + 1).as("kind"),
        encode(col("text"), "UTF-8").as("bytes"))
  }
}
