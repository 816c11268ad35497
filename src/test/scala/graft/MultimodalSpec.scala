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

  // ---- BuiltinCodec: REAL decode of real bytes, verified values --------

  test("BuiltinCodec decodes a real 24-bit BMP: geometry and per-pixel luminance") {
    import Multimodal.{BuiltinCodec, Encode, MediaBlob}
    // uniform gray 200: bin 200/32 = 6 holds every pixel
    val gray = BuiltinCodec.decode(
      MediaBlob(1, "image", Encode.bmpGray(3, 2, 200)))
    assert(gray.width == 3 && gray.height == 2 && gray.channels == 3)
    assert(gray.embedding(6) == 1.0f && gray.embedding.sum == 1.0f)
    // hand-edited pixels: a 2x1 BMP, pixel 0 black, pixel 1 white — the
    // histogram must split 50/50 between the darkest and brightest bins,
    // which requires actually reading BGR bytes at the right offsets
    val bytes = Encode.bmpGray(2, 1, 0)
    bytes(54 + 3) = 0xff.toByte // pixel 1: B
    bytes(54 + 4) = 0xff.toByte //          G
    bytes(54 + 5) = 0xff.toByte //          R
    val bw = BuiltinCodec.decode(MediaBlob(2, "image", bytes))
    assert(bw.embedding(0) == 0.5f && bw.embedding(7) == 0.5f,
      bw.embedding.mkString(","))
    // odd width exercises the 4-byte row padding (w=1: 3 data + 1 pad)
    val thin = BuiltinCodec.decode(
      MediaBlob(3, "image", Encode.bmpGray(1, 4, 40)))
    assert(thin.width == 1 && thin.height == 4 && thin.embedding(1) == 1.0f)
  }

  test("BuiltinCodec decodes a real PCM WAV: format chunk and sample amplitudes") {
    import Multimodal.{BuiltinCodec, Encode, MediaBlob}
    val f = BuiltinCodec.decode(MediaBlob(1, "audio",
      Encode.wavPcm16(sampleRate = 8000, channels = 1, nFrames = 4000,
        value = 16384)))
    assert(f.sampleRate == 8000 && f.channels == 1)
    assert(f.durationMs == 500L, s"4000 frames @8kHz = 500ms, got ${f.durationMs}")
    // |16384| * 8 / 32768 = bin 4, for every decoded sample
    assert(f.embedding(4) == 1.0f, f.embedding.mkString(","))
    val stereo = BuiltinCodec.decode(MediaBlob(2, "audio",
      Encode.wavPcm16(44100, channels = 2, nFrames = 44100, value = 0)))
    assert(stereo.channels == 2 && stereo.durationMs == 1000L &&
      stereo.embedding(0) == 1.0f)
  }

  test("BuiltinCodec decodes a real Y4M stream: header, frame count, true pts") {
    import Multimodal.{BuiltinCodec, Encode, MediaBlob}
    val blob = MediaBlob(1, "video",
      Encode.y4m(4, 2, fpsNum = 10, fpsDen = 1, lumas = Seq(10, 100, 250)))
    val f = BuiltinCodec.decode(blob)
    assert(f.width == 4 && f.height == 2 && f.channels == 3)
    assert(f.durationMs == 300L, s"3 frames @10fps = 300ms, got ${f.durationMs}")
    // three constant-luma frames -> thirds in bins 0, 3, 7
    assert(f.embedding(0) == f.embedding(3) && f.embedding(3) == f.embedding(7),
      f.embedding.mkString(","))
    // evenly-spaced REAL frames with true timestamps and raw plane bytes
    val frames = BuiltinCodec.sampleFrames(blob, 2)
    assert(frames.map(_.ptsMs) == Seq(0L, 200L))
    assert(frames.head.bytes.length == 4 * 2 * 3 / 2)
    assert(frames.head.bytes.take(8).forall(_ == 10.toByte),
      "first frame's Y plane must be the first FRAME payload")
    assert(frames(1).bytes.take(8).forall(b => (b & 0xff) == 250),
      "last frame's Y plane must be the last FRAME payload")
    // asking for more frames than exist returns them all
    assert(BuiltinCodec.sampleFrames(blob, 10).size == 3)
  }

  test("BuiltinCodec.resize really resamples pixels (nearest neighbor)") {
    import Multimodal.{BuiltinCodec, Encode, MediaBlob}
    // 2x1 black|white -> 1x1 keeps the floored back-projection (left) pixel
    val bytes = Encode.bmpGray(2, 1, 0)
    bytes(54 + 3) = 0xff.toByte
    bytes(54 + 4) = 0xff.toByte
    bytes(54 + 5) = 0xff.toByte
    val f = BuiltinCodec.decode(BuiltinCodec.resize(MediaBlob(1, "image", bytes), 1))
    assert(f.width == 1 && f.height == 1 && f.embedding(0) == 1.0f,
      s"${f.width}x${f.height} ${f.embedding.mkString(",")}")
    // gray survives the resample exactly; dims follow the resizeMeta formula
    val fg = BuiltinCodec.decode(BuiltinCodec.resize(
      MediaBlob(2, "image", Encode.bmpGray(6, 3, 200)), 3))
    assert(fg.width == 3 && fg.height == 1 && fg.embedding(6) == 1.0f)
    // never upscales; non-BMP passes through untouched
    val same = Encode.bmpGray(2, 2, 10)
    assert(BuiltinCodec.resize(MediaBlob(3, "image", same), 64).bytes eq same)
    val wav = Encode.wavPcm16(8000, 1, 10, 5)
    assert(BuiltinCodec.resize(MediaBlob(4, "audio", wav), 1).bytes eq wav)
  }

  test("BuiltinCodec refuses payloads it cannot really decode, and runs through the Spark operators") {
    import Multimodal.{BuiltinCodec, Encode, MediaBlob}
    import spark.implicits._
    intercept[IllegalArgumentException] {
      BuiltinCodec.decode(MediaBlob(1, "image", "not media".getBytes))
    }
    // truncated payloads refuse cleanly, never index out of bounds
    intercept[IllegalArgumentException] {
      BuiltinCodec.decode(MediaBlob(2, "video",
        "YUV4MPEG2 W4 H2 F10:1".getBytes)) // unterminated header
    }
    intercept[IllegalArgumentException] {
      val cut = Encode.y4m(4, 2, 10, 1, Seq(10, 100))
      BuiltinCodec.decode(MediaBlob(3, "video",
        java.util.Arrays.copyOfRange(cut, 0, cut.length - 4)))
    }
    intercept[IllegalArgumentException] { // truncated BMP pixel data
      val cut = Encode.bmpGray(3, 2, 100)
      BuiltinCodec.decode(MediaBlob(4, "image",
        java.util.Arrays.copyOfRange(cut, 0, 60)))
    }
    intercept[IllegalArgumentException] { // WAV data chunk overruns payload
      val cut = Encode.wavPcm16(8000, 1, 100, 5)
      BuiltinCodec.decode(MediaBlob(5, "audio",
        java.util.Arrays.copyOfRange(cut, 0, cut.length - 10)))
    }
    intercept[IllegalArgumentException] { // corrupt negative chunk size:
      val bad = Encode.wavPcm16(8000, 1, 10, 5) // must refuse, never hang
      bad(40) = 0xf8.toByte; bad(41) = 0xff.toByte
      bad(42) = 0xff.toByte; bad(43) = 0xff.toByte // data size = -8
      BuiltinCodec.decode(MediaBlob(6, "audio", bad))
    }
    intercept[IllegalArgumentException] { // hostile width: 24*width would
      val bad = Encode.bmpGray(3, 2, 100)  // overflow Int and sneak a tiny
      val w = 180000000                    // rowSize past the length bound
      bad(18) = (w & 0xff).toByte; bad(19) = ((w >> 8) & 0xff).toByte
      bad(20) = ((w >> 16) & 0xff).toByte; bad(21) = ((w >> 24) & 0xff).toByte
      BuiltinCodec.decode(MediaBlob(7, "image", bad))
    }
    intercept[IllegalArgumentException] { // zero frame rate must refuse,
      BuiltinCodec.decode(MediaBlob(8, "video", // not divide by zero
        Encode.y4m(2, 2, 10, 0, Seq(30))))
    }
    intercept[IllegalArgumentException] {
      BuiltinCodec.decode(MediaBlob(9, "video",
        Encode.y4m(2, 2, 0, 1, Seq(30))))
    }
    // the same partition-local operator plumbing, real codec injected
    val mixed = Seq(
      MediaBlob(1, "image", Encode.bmpGray(5, 3, 64)),
      MediaBlob(2, "audio", Encode.wavPcm16(16000, 1, 1600, 100)),
      MediaBlob(3, "video", Encode.y4m(2, 2, 25, 1, Seq(30, 60))))
      .toDS().toDF()
    val feats = Multimodal.decodeFeatures(mixed, BuiltinCodec)
      .collect().sortBy(_.media_id)
    assert(feats(0).width == 5 && feats(0).height == 3)
    assert(feats(1).sampleRate == 16000 && feats(1).durationMs == 100L)
    assert(feats(2).durationMs == 80L)
    val frames = Multimodal.sampleFrames(mixed, 2, BuiltinCodec).collect()
    assert(frames.length == 2 && frames.forall(_.media_id == 3))
  }

  test("SniffingCodec default: real formats really decode, alien payloads stub, corrupt magic refuses") {
    import Multimodal.{BuiltinCodec, DefaultCodec, Encode, MediaBlob, StubCodec}
    import spark.implicits._
    val alien = "definitely not media bytes".getBytes
    val mixed = Seq(
      MediaBlob(1, "image", Encode.bmpGray(5, 3, 64)),
      MediaBlob(2, "audio", Encode.wavPcm16(16000, 1, 1600, 100)),
      MediaBlob(3, "video", Encode.y4m(2, 2, 25, 1, Seq(30, 60))),
      MediaBlob(4, "image", alien)).toDS().toDF()
    // DEFAULT codec (no injection): magic-byte payloads hit the REAL parser
    val feats = Multimodal.decodeFeatures(mixed)(spark)
      .collect().sortBy(_.media_id)
    assert(feats(0).width == 5 && feats(0).height == 3) // real BMP header
    assert(feats(1).sampleRate == 16000 && feats(1).durationMs == 100L)
    assert(feats(2).durationMs == 80L) // 2 frames @ 25fps, really counted
    // ...and the alien payload gets exactly StubCodec's deterministic fake
    val stub = StubCodec.decode(MediaBlob(4, "image", alien))
    assert(feats(3).width == stub.width && feats(3).height == stub.height &&
      feats(3).embedding.sameElements(stub.embedding))
    // default frame sampling: real Y4M frames for video, stub for non-Y4M
    val frames = Multimodal.sampleFrames(mixed, 2)(spark).collect()
    assert(frames.count(_.media_id == 3) == 2 &&
      frames.filter(_.media_id == 3).forall(_.width == 2))
    // default resize really downscales the BMP, passes the alien through
    val resized = Multimodal.resizeBlobs(mixed, maxDim = 3)(spark)
      .collect().sortBy(_.media_id)
    assert(BuiltinCodec.decode(resized(0)).width == 3)
    assert(resized(3).bytes.sameElements(alien))
    // a payload CLAIMING a real format but corrupt refuses, never stubs
    intercept[org.apache.spark.SparkException] {
      val lying = Seq(MediaBlob(9, "image",
        java.util.Arrays.copyOfRange(Encode.bmpGray(3, 2, 100), 0, 60)))
        .toDS().toDF()
      Multimodal.decodeFeatures(lying)(spark).collect()
    }
    // sniff predicates are exposed and honest
    assert(BuiltinCodec.canDecode(Encode.bmpGray(1, 1, 0)) &&
      !BuiltinCodec.canDecode(alien) &&
      BuiltinCodec.canSampleFrames(Encode.y4m(2, 2, 1, 1, Seq(0))) &&
      !BuiltinCodec.canSampleFrames(Encode.bmpGray(1, 1, 0)))
    assert(DefaultCodec.isInstanceOf[Multimodal.SniffingCodec])
  }

  test("BMP with a V2/V3/V4/V5 DIB header sniffs as BMP and really decodes") {
    // ADVICE r11: all five published DIB variants keep width/height/bpp/
    // compression at the same offsets — a valid 24-bit V4/V5 file must hit
    // the REAL parser (and a truncated one must refuse), never stub
    import Multimodal.{BuiltinCodec, Encode, MediaBlob}
    val std = Encode.bmpGray(5, 3, 64) // DIB 40, dataOff 54
    def withDib(dibSize: Int): Array[Byte] = {
      val headerLen = 14 + dibSize
      val pixels = java.util.Arrays.copyOfRange(std, 54, std.length)
      val out = java.nio.ByteBuffer.allocate(headerLen + pixels.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      out.put('B'.toByte).put('M'.toByte).putInt(headerLen + pixels.length)
        .putInt(0).putInt(headerLen).putInt(dibSize)
      out.put(java.util.Arrays.copyOfRange(std, 18, 54)) // shared field block
      out.position(headerLen) // extended V4/V5 fields stay zero (unused @24bpp)
      out.put(pixels)
      out.array()
    }
    val ref = BuiltinCodec.decode(MediaBlob(1, "image", std))
    for (dib <- Seq(52, 56, 108, 124)) {
      val b = withDib(dib)
      assert(BuiltinCodec.canDecode(b), s"DIB $dib must sniff as BMP")
      val f = BuiltinCodec.decode(MediaBlob(1, "image", b))
      assert(f.width == 5 && f.height == 3 &&
        f.embedding.sameElements(ref.embedding), s"DIB $dib decode drift")
    }
    // truncated V4 payload claims BMP → routes to the parser and REFUSES
    intercept[IllegalArgumentException] {
      BuiltinCodec.decode(MediaBlob(2, "image",
        java.util.Arrays.copyOfRange(withDib(108), 0, 70)))
    }
    // an unpublished DIB size still fails the structural sniff
    val weird = std.clone(); weird(14) = 41
    assert(!BuiltinCodec.canDecode(weird))
  }
}
