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
  * the codec itself is an injectable [[MediaCodec]]. The default is
  * [[SniffingCodec]]: payloads whose magic bytes name a format
  * [[BuiltinCodec]] really parses (BMP / RIFF-WAVE / YUV4MPEG2) get a REAL
  * pure-JVM decode; anything else falls back to the deterministic fake
  * [[StubCodec]] (this environment has no general image/audio libraries).
  * Swapping in a full decoder means implementing the two-method trait — no
  * operator changes.
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

    /** REAL pixel resize where the codec supports the format; the default
      * passes the payload through unchanged (audio, unsupported formats,
      * already-small images). [[BuiltinCodec]] overrides with a
      * nearest-neighbor BMP downscale; [[resizeMeta]] stays the
      * metadata-only alternative when payloads must not be rewritten.
      */
    def resize(blob: MediaBlob, maxDim: Int): MediaBlob = blob
  }

  /** ======== STUB ========
    * Deterministic fake codec: all "decoded" values derive from a 64-bit
    * FNV-1a hash of the payload, so results are stable across runs,
    * partitionings and executors. A real implementation would call an
    * image/audio library here (and ONLY here). The [[SniffingCodec]]
    * default's FALLBACK for formats [[BuiltinCodec]] cannot really parse
    * (no general media libraries are installed in this environment).
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

  /** REAL pure-JVM codec for three self-describing uncompressed formats —
    * no native libraries, every value parsed from the payload bytes:
    *
    *   - BMP (24-bit uncompressed `BITMAPINFOHEADER`): width/height/
    *     channels from the DIB header, pixels walked bottom-up with
    *     4-byte row padding; the embedding is the real 8-bin luminance
    *     histogram (BT.601 integer luma) over every decoded pixel.
    *   - WAV (RIFF PCM, 8- or 16-bit): channels/sampleRate/bitsPerSample
    *     from the `fmt ` chunk, duration from the `data` chunk length;
    *     the embedding is the 8-bin amplitude-magnitude histogram over
    *     every decoded sample.
    *   - Y4M (YUV4MPEG2, C420/C444/Cmono): geometry and frame rate from
    *     the stream header, frames counted by walking `FRAME` markers;
    *     the embedding is the 8-bin luma histogram over all Y planes, and
    *     [[sampleFrames]] returns n evenly-spaced REAL frames with their
    *     true presentation timestamps and raw plane bytes.
    *
    * Anything else throws `IllegalArgumentException` — this codec never
    * fakes a decode (the [[SniffingCodec]] default routes non-magic
    * payloads to [[StubCodec]] instead of here).
    */
  object BuiltinCodec extends MediaCodec {
    private def u16(b: Array[Byte], o: Int): Int =
      (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
    private def u32(b: Array[Byte], o: Int): Long =
      (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
        ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
    private def i32(b: Array[Byte], o: Int): Int = u32(b, o).toInt
    private def ascii(b: Array[Byte], o: Int, n: Int): String =
      new String(b, o, n, java.nio.charset.StandardCharsets.US_ASCII)
    private def hist8(counts: Array[Long]): Array[Float] = {
      val total = counts.sum.toDouble
      counts.map(c => if (total == 0) 0f else (c / total).toFloat)
    }

    // STRUCTURAL check, not just the 2-char magic: arbitrary text starting
    // with "BM" (a sentence about BMWs) must never sniff as BMP — the
    // reserved words (6..9) are always zero and the DIB header size (14..17)
    // is one of the five published values, and normal text contains no NUL
    // runs, so the false-positive path is closed while truncated/corrupt
    // REAL headers still route here and refuse in parse (never stub).
    // All five DIB variants (BITMAPINFOHEADER 40, V2 52, V3 56, V4 108,
    // V5 124) keep width/height/bpp/compression at the same offsets, so
    // parseBmp reads them identically; only the header LENGTH differs.
    private val BmpDibSizes = Set(40L, 52L, 56L, 108L, 124L)
    private def isBmp(b: Array[Byte]) =
      b.length >= 54 && b(0) == 'B' && b(1) == 'M' &&
        u32(b, 6) == 0L && BmpDibSizes.contains(u32(b, 14))
    private def isWav(b: Array[Byte]) =
      b.length >= 44 && ascii(b, 0, 4) == "RIFF" && ascii(b, 8, 4) == "WAVE"
    private def isY4m(b: Array[Byte]) =
      b.length >= 10 && ascii(b, 0, 9) == "YUV4MPEG2"

    /** Magic-byte sniff: does this payload CLAIM a format this codec
      * really decodes? A true answer is a routing decision, not a
      * validity promise — a payload with a BMP/RIFF/Y4M magic but a
      * corrupt body still refuses with `IllegalArgumentException`
      * (claiming a real format buys a real parse, not a silent stub).
      */
    def canDecode(b: Array[Byte]): Boolean = isBmp(b) || isWav(b) || isY4m(b)

    /** Frame sampling is Y4M-only (images/audio have no frames). */
    def canSampleFrames(b: Array[Byte]): Boolean = isY4m(b)

    def decode(blob: MediaBlob): MediaFeatures = {
      val b = blob.bytes
      if (isBmp(b)) decodeBmp(blob)
      else if (isWav(b)) decodeWav(blob)
      else if (isY4m(b)) decodeY4m(blob)
      else throw new IllegalArgumentException(
        s"media_id=${blob.media_id}: BuiltinCodec decodes BMP/WAV/Y4M " +
          "payloads only; use an injected codec (or StubCodec) for others")
    }

    /** Parsed + bounds-validated 24-bit BMP geometry. Refusing truncated
      * or corrupt payloads here keeps the codec contract — clean
      * `IllegalArgumentException`, never an out-of-bounds pixel walk —
      * in ONE place for decode and resize alike.
      */
    private case class BmpInfo(dataOff: Int, width: Int, height: Int,
                               rowSize: Int)

    private def parseBmp(b: Array[Byte]): BmpInfo = {
      val dataOff = u32(b, 10).toInt
      val width = i32(b, 18)
      val height = math.abs(i32(b, 22))
      val bpp = u16(b, 28)
      val compression = u32(b, 30)
      require(bpp == 24 && compression == 0,
        s"BMP support is 24-bit uncompressed; got bpp=$bpp comp=$compression")
      // Long arithmetic: a hostile header declaring width ~1.8e8 would
      // overflow 24*width in Int, yielding a garbage rowSize that slips
      // past the byte-length bound and walks out of the array later.
      require(width > 0 && height > 0 && dataOff >= 54,
        s"malformed BMP header: ${width}x$height@$dataOff")
      val rowSizeL = ((bpp.toLong * width + 31) / 32) * 4
      require(dataOff.toLong + rowSizeL * height <= b.length,
        s"malformed BMP: ${width}x$height@$dataOff needs " +
          s"${dataOff.toLong + rowSizeL * height} bytes, have ${b.length}")
      BmpInfo(dataOff, width, height, rowSizeL.toInt)
    }

    private def decodeBmp(blob: MediaBlob): MediaFeatures = {
      val b = blob.bytes
      val i = parseBmp(b)
      val bins = new Array[Long](8)
      var y = 0
      while (y < i.height) {
        var x = 0
        val row = i.dataOff + y * i.rowSize
        while (x < i.width) {
          val p = row + x * 3
          val blu = b(p) & 0xff; val grn = b(p + 1) & 0xff
          val red = b(p + 2) & 0xff
          // BT.601 integer luma; exact v for gray pixels (1000v/1000)
          val luma = (299 * red + 587 * grn + 114 * blu) / 1000
          bins(math.min(7, luma / 32)) += 1
          x += 1
        }
        y += 1
      }
      MediaFeatures(blob.media_id, blob.kind, b.length, i.width, i.height,
        channels = 3, sampleRate = 0, durationMs = 0L, embedding = hist8(bins))
    }

    private def decodeWav(blob: MediaBlob): MediaFeatures = {
      val b = blob.bytes
      var off = 12
      var channels = 0; var sampleRate = 0; var bits = 0
      var dataOff = -1; var dataLen = 0
      while (off + 8 <= b.length) {
        val id = ascii(b, off, 4); val size = u32(b, off + 4).toInt
        // a corrupt/negative size field must refuse, not stall the chunk
        // walk (size = -8 would make the offset stop advancing) or read
        // past the payload
        require(size >= 0 && off + 8 + size.toLong <= b.length,
          s"malformed WAV: chunk '$id' declares $size bytes at $off " +
            s"of a ${b.length}-byte payload")
        if (id == "fmt ") {
          require(size >= 16, s"malformed WAV: fmt chunk of $size bytes")
          require(u16(b, off + 8) == 1, "WAV support is PCM (format 1)")
          channels = u16(b, off + 10)
          sampleRate = u32(b, off + 12).toInt
          bits = u16(b, off + 22)
        } else if (id == "data") { dataOff = off + 8; dataLen = size }
        off += 8 + size + (size & 1) // RIFF chunks pad to even length
      }
      require(channels > 0 && sampleRate > 0 && dataOff >= 0 &&
        (bits == 8 || bits == 16), s"malformed WAV (bits=$bits)")
      val bytesPerSample = bits / 8
      val nSamples = dataLen / bytesPerSample
      val frames = nSamples / channels
      val bins = new Array[Long](8)
      var i = 0
      while (i < nSamples) {
        val mag =
          if (bits == 16) math.abs(u16(b, dataOff + i * 2).toShort.toInt)
          else math.abs((b(dataOff + i) & 0xff) - 128) * 256
        bins(math.min(7, mag * 8 / 32768)) += 1
        i += 1
      }
      MediaFeatures(blob.media_id, blob.kind, b.length, width = 0,
        height = 0, channels = channels, sampleRate = sampleRate,
        durationMs = frames * 1000L / sampleRate, embedding = hist8(bins))
    }

    /** Parsed Y4M geometry + the byte offset and true pts of each frame's
      * plane data.
      */
    private case class Y4mStream(width: Int, height: Int, fpsNum: Int,
                                 fpsDen: Int, frameSize: Int, lumaSize: Int,
                                 frameOffsets: Seq[Int])

    private def parseY4m(b: Array[Byte]): Y4mStream = {
      var hdrEnd = 0
      while (hdrEnd < b.length && b(hdrEnd) != '\n') hdrEnd += 1
      require(hdrEnd < b.length, "malformed Y4M: unterminated stream header")
      val tokens = ascii(b, 0, hdrEnd).split(' ')
      var w = 0; var h = 0; var num = 25; var den = 1; var cs = "420"
      tokens.drop(1).foreach { t =>
        if (t.nonEmpty) t.charAt(0) match {
          case 'W' => w = t.drop(1).toInt
          case 'H' => h = t.drop(1).toInt
          case 'F' =>
            val p = t.drop(1).split(':'); num = p(0).toInt; den = p(1).toInt
          case 'C' => cs = t.drop(1)
          case _   => ()
        }
      }
      require(w > 0 && h > 0, s"malformed Y4M header")
      // an F0:1 / F10:0 token would otherwise surface as a divide-by-zero
      // in pts/duration math instead of the contractual clean refusal
      require(num > 0 && den > 0, s"malformed Y4M frame rate $num:$den")
      val luma = w * h
      val frameSize =
        if (cs.startsWith("mono")) luma
        else if (cs.startsWith("444")) luma * 3
        else if (cs.startsWith("422")) luma * 2
        else luma * 3 / 2 // 420 family
      val offsets = Seq.newBuilder[Int]
      var off = hdrEnd + 1
      while (off + 5 <= b.length && ascii(b, off, 5) == "FRAME") {
        var e = off
        while (e < b.length && b(e) != '\n') e += 1
        require(e < b.length && e + 1 + frameSize <= b.length,
          "malformed Y4M: truncated frame")
        offsets += (e + 1)
        off = e + 1 + frameSize
      }
      Y4mStream(w, h, num, den, frameSize, luma, offsets.result())
    }

    private def decodeY4m(blob: MediaBlob): MediaFeatures = {
      val b = blob.bytes
      val s = parseY4m(b)
      val bins = new Array[Long](8)
      s.frameOffsets.foreach { fo =>
        var i = 0
        while (i < s.lumaSize) { bins((b(fo + i) & 0xff) / 32) += 1; i += 1 }
      }
      MediaFeatures(blob.media_id, blob.kind, b.length, s.width, s.height,
        channels = if (s.frameSize == s.lumaSize) 1 else 3, sampleRate = 0,
        durationMs = s.frameOffsets.size * 1000L * s.fpsDen / s.fpsNum,
        embedding = hist8(bins))
    }

    override def sampleFrames(blob: MediaBlob, n: Int): Seq[Frame] = {
      val b = blob.bytes
      require(isY4m(b),
        s"media_id=${blob.media_id}: frame sampling needs a Y4M payload")
      val s = parseY4m(b)
      val total = s.frameOffsets.size
      if (total == 0) return Seq.empty
      val picks =
        if (n >= total) 0 until total
        else if (n == 1) Seq(0)
        else (0 until n).map(i => (total - 1).toLong * i / (n - 1)).map(_.toInt)
      picks.distinct.zipWithIndex.map { case (idx, outIdx) =>
        Frame(blob.media_id, outIdx, idx * 1000L * s.fpsDen / s.fpsNum,
          s.width, s.height,
          java.util.Arrays.copyOfRange(b, s.frameOffsets(idx),
            s.frameOffsets(idx) + s.frameSize))
      }
    }

    /** REAL nearest-neighbor downscale for 24-bit BMP: the payload is
      * re-encoded at `max(1, floor(dim * scale))` per side (the same
      * formula as [[resizeMeta]]), each target pixel sampling the source
      * at the floored back-projection. Non-BMP and already-small payloads
      * pass through unchanged — resize never fakes and never upscales.
      * Sampling and writing both use FILE order; the output always
      * declares bottom-up rows, so a (rare) top-down source — negative
      * DIB height — comes out vertically flipped.
      */
    override def resize(blob: MediaBlob, maxDim: Int): MediaBlob = {
      val b = blob.bytes
      // only 24-bit uncompressed BMPs are resizable; other formats (and
      // other BMP flavors) pass through rather than refuse
      if (!isBmp(b) || u16(b, 28) != 24 || u32(b, 30) != 0) return blob
      val i = parseBmp(b)
      val scale = math.min(math.min(
        maxDim.toDouble / i.width, maxDim.toDouble / i.height), 1.0)
      val tw = math.max(math.floor(i.width * scale).toInt, 1)
      val th = math.max(math.floor(i.height * scale).toInt, 1)
      if (tw == i.width && th == i.height) return blob
      val out = Encode.bmp(tw, th) { (x, y) =>
        val p = i.dataOff + (y * i.height / th) * i.rowSize +
          (x * i.width / tw) * 3
        (b(p), b(p + 1), b(p + 2))
      }
      blob.copy(bytes = out)
    }
  }

  /** Deterministic ENCODERS for the formats [[BuiltinCodec]] decodes —
    * fixture builders for specs and the oracle-gated real-decode queries
    * (the oracle restates header fields in SQL; the engine must recover
    * them by actually parsing the bytes).
    */
  object Encode {
    /** 24-bit uncompressed BMP from a per-pixel BGR supplier. `bgr` takes
      * FILE-ORDER coordinates (row 0 = the first stored row, which BMP
      * renders bottom-up) — a resampler reading and writing file order
      * preserves orientation without flipping.
      */
    def bmp(width: Int, height: Int)
           (bgr: (Int, Int) => (Byte, Byte, Byte)): Array[Byte] = {
      val rowSize = ((24 * width + 31) / 32) * 4
      val dataSize = rowSize * height
      val out = java.nio.ByteBuffer.allocate(54 + dataSize)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      out.put('B'.toByte).put('M'.toByte).putInt(54 + dataSize)
        .putInt(0).putInt(54)
      out.putInt(40).putInt(width).putInt(height).putShort(1).putShort(24)
        .putInt(0).putInt(dataSize).putInt(2835).putInt(2835)
        .putInt(0).putInt(0)
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          val (bb, gg, rr) = bgr(x, y)
          out.put(bb).put(gg).put(rr)
          x += 1
        }
        var pad = rowSize - width * 3
        while (pad > 0) { out.put(0.toByte); pad -= 1 }
        y += 1
      }
      out.array()
    }

    /** 24-bit uncompressed BMP filled with one gray level. */
    def bmpGray(width: Int, height: Int, gray: Int): Array[Byte] = {
      val g = (gray & 0xff).toByte
      bmp(width, height)((_, _) => (g, g, g))
    }

    /** 16-bit PCM WAV with the given constant sample value. */
    def wavPcm16(sampleRate: Int, channels: Int, nFrames: Int,
                 value: Short): Array[Byte] = {
      val dataLen = nFrames * channels * 2
      val out = java.nio.ByteBuffer.allocate(44 + dataLen)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      out.put("RIFF".getBytes).putInt(36 + dataLen).put("WAVE".getBytes)
      out.put("fmt ".getBytes).putInt(16).putShort(1)
        .putShort(channels.toShort).putInt(sampleRate)
        .putInt(sampleRate * channels * 2).putShort((channels * 2).toShort)
        .putShort(16)
      out.put("data".getBytes).putInt(dataLen)
      var i = 0
      while (i < nFrames * channels) { out.putShort(value); i += 1 }
      out.array()
    }

    /** Y4M (C420) stream of constant-luma frames. */
    def y4m(width: Int, height: Int, fpsNum: Int, fpsDen: Int,
            lumas: Seq[Int]): Array[Byte] = {
      val hdr = s"YUV4MPEG2 W$width H$height F$fpsNum:$fpsDen Ip A1:1 C420\n"
        .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      val frameSize = width * height * 3 / 2
      val buf = new java.io.ByteArrayOutputStream(
        hdr.length + lumas.size * (6 + frameSize))
      buf.write(hdr)
      lumas.foreach { l =>
        buf.write("FRAME\n".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
        val f = new Array[Byte](frameSize)
        java.util.Arrays.fill(f, 0, width * height, (l & 0xff).toByte)
        java.util.Arrays.fill(f, width * height, frameSize, 128.toByte)
        buf.write(f)
      }
      buf.toByteArray
    }
  }

  /** The DEFAULT codec: sniffs magic bytes and routes payloads
    * [[BuiltinCodec]] really decodes (BMP / RIFF-WAVE / YUV4MPEG2) to the
    * real parser, everything else to `fallback` ([[StubCodec]] here —
    * this sandbox has no general media libraries). Real decode is the
    * normal path, the stub is the fallback for unknown formats — and a
    * payload that CLAIMS a real format but is corrupt refuses cleanly
    * rather than silently degrading to the stub ([[BuiltinCodec.canDecode]]).
    * Explicit injection of either codec (or a user's own) still works at
    * every operator.
    */
  final case class SniffingCodec(fallback: MediaCodec = StubCodec)
      extends MediaCodec {
    def decode(blob: MediaBlob): MediaFeatures =
      if (BuiltinCodec.canDecode(blob.bytes)) BuiltinCodec.decode(blob)
      else fallback.decode(blob)
    override def sampleFrames(blob: MediaBlob, n: Int): Seq[Frame] =
      if (BuiltinCodec.canSampleFrames(blob.bytes))
        BuiltinCodec.sampleFrames(blob, n)
      else fallback.sampleFrames(blob, n)
    override def resize(blob: MediaBlob, maxDim: Int): MediaBlob =
      if (BuiltinCodec.canDecode(blob.bytes)) BuiltinCodec.resize(blob, maxDim)
      else fallback.resize(blob, maxDim)
  }

  /** Shared default instance for the operator signatures. */
  val DefaultCodec: MediaCodec = SniffingCodec()

  val blobSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("bytes", BinaryType, nullable = false)))

  /** Decode a blob table into per-blob features. Partition-local: one task
    * per input partition, no shuffle; columnar batch shape is preserved by
    * the Dataset encoder. At 100 TB, decode parallelism == file split count.
    * The codec is injectable ([[MediaCodec]]); [[DefaultCodec]] (the
    * magic-byte [[SniffingCodec]]) is the default.
    */
  def decodeFeatures(blobs: DataFrame, codec: MediaCodec = DefaultCodec)
                    (implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    blobs.select("media_id", "kind", "bytes").as[MediaBlob]
      .mapPartitions(it => it.map(codec.decode))
  }

  /** Sample `n` frames per video blob (fan-out flatMap; images/audio are
    * filtered out before decode so no work is wasted on them). Codec
    * injectable as in [[decodeFeatures]].
    */
  def sampleFrames(blobs: DataFrame, n: Int, codec: MediaCodec = DefaultCodec)
                  (implicit spark: SparkSession): Dataset[Frame] = {
    import spark.implicits._
    blobs.filter(col("kind") === "video")
      .select("media_id", "kind", "bytes").as[MediaBlob]
      .mapPartitions(it => it.flatMap(b => codec.sampleFrames(b, n)))
  }

  /** REAL payload resize: rewrite each blob with the codec's pixel
    * resampler ([[MediaCodec.resize]]; pass-through where the codec has
    * none). Partition-local like [[decodeFeatures]] — at 100 TB, resize
    * parallelism == file split count, no shuffle.
    */
  def resizeBlobs(blobs: DataFrame, maxDim: Int,
                  codec: MediaCodec = DefaultCodec)
                 (implicit spark: SparkSession): Dataset[MediaBlob] = {
    import spark.implicits._
    blobs.select("media_id", "kind", "bytes").as[MediaBlob]
      .mapPartitions(it => it.map(b => codec.resize(b, maxDim)))
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
