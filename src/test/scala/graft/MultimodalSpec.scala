package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal

class MultimodalSpec extends AnyFunSuite {
  import TestSpark._

  private implicit def s: org.apache.spark.sql.SparkSession = spark
  private lazy val blobs = Multimodal.demoBlobs(spark, sf).cache()

  test("demo blob table has the declared schema and all kinds") {
    // compare names and types; nullability of derived columns is Spark's call
    assert(blobs.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      Multimodal.blobSchema.fields.map(f => (f.name, f.dataType)).toSeq)
    val kinds = blobs.select("kind").distinct().collect().map(_.getString(0)).toSet
    assert(kinds == Set("image", "audio", "video"))
  }

  test("decode is deterministic and partition-count-independent") {
    val a = Multimodal.decodeFeatures(blobs).collect().sortBy(_.media_id)
    val b = Multimodal.decodeFeatures(blobs.repartition(7)).collect().sortBy(_.media_id)
    assert(a.length == b.length && a.length == blobs.count())
    for ((x, y) <- a.zip(b)) {
      assert(x.media_id == y.media_id && x.width == y.width &&
        x.height == y.height && x.embedding.sameElements(y.embedding))
    }
  }

  test("decoded features respect kind semantics") {
    val feats = Multimodal.decodeFeatures(blobs).collect()
    for (f <- feats) {
      if (f.kind == "audio") {
        assert(f.width == 0 && f.height == 0 && f.sampleRate == 16000)
        assert(f.durationMs > 0)
      } else {
        assert(f.width >= 64 && f.height >= 64 && f.channels == 3)
      }
      assert(f.embedding.length == 8)
      assert(f.sizeBytes > 0)
    }
  }

  test("frame sampling fans out only videos, n frames each, pts monotonic") {
    val n = 4
    val frames = Multimodal.sampleFrames(blobs, n).collect()
    val nVideos = blobs.filter(col("kind") === "video").count()
    assert(frames.length == nVideos * n)
    for ((_, fs) <- frames.groupBy(_.media_id)) {
      val sorted = fs.sortBy(_.frameIdx)
      assert(sorted.map(_.frameIdx).toSeq == (0 until n))
      assert(sorted.map(_.ptsMs).toSeq == sorted.map(_.ptsMs).sorted.toSeq)
    }
  }

  test("codec seam: an alternative codec runs through the same operators") {
    import Multimodal.{Frame, MediaBlob, MediaCodec, MediaFeatures}
    // a second fake codec with recognizably different conventions: fixed
    // 32x32 "thumbnails", 2-dim embeddings of the payload length, one
    // frame regardless of n — if these surface in the output, the
    // operator really delegated everything codec-shaped to the instance
    object AltCodec extends MediaCodec {
      override def decode(b: MediaBlob): MediaFeatures =
        MediaFeatures(b.media_id, b.kind, b.bytes.length, 32, 32, 1,
          8000, 500L, Array(b.bytes.length.toFloat, 1.0f))
      override def sampleFrames(b: MediaBlob, n: Int): Seq[Frame] =
        Seq(Frame(b.media_id, 0, 0L, 32, 32, Array.emptyByteArray))
    }
    val feats = Multimodal.decodeFeatures(blobs, AltCodec).collect()
    assert(feats.length == blobs.count())
    assert(feats.forall(f => f.width == 32 && f.height == 32 &&
      f.embedding.length == 2 && f.embedding(0) == f.sizeBytes.toFloat))
    val frames = Multimodal.sampleFrames(blobs, n = 4, AltCodec).collect()
    assert(frames.length == blobs.filter(col("kind") === "video").count())
    assert(frames.forall(f => f.frameIdx == 0 && f.width == 32))
    // and the default is still the stub — same operator, stub conventions
    val stub = Multimodal.decodeFeatures(blobs).collect()
    assert(stub.forall(_.embedding.length == 8))
  }

  test("resizeMeta caps the longest side and preserves audio rows") {
    val feats = Multimodal.decodeFeatures(blobs).toDF()
    val resized = Multimodal.resizeMeta(feats, maxDim = 128).collect()
    for (r <- resized) {
      val (w, h) = (r.getAs[Int]("width"), r.getAs[Int]("height"))
      if (r.getAs[String]("kind") == "audio") assert(w == 0 && h == 0)
      else assert(w <= 128 && h <= 128 && w >= 1 && h >= 1)
    }
  }
}
