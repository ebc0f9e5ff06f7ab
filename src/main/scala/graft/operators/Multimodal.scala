package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing for training-data
  * pipelines. Media payloads are opaque `binary` columns with typed metadata;
  * decode/feature-extract run per-partition in bounded batches so a 100 TB
  * corpus streams through fixed executor memory.
  *
  * Images decode for REAL via [[ImageCodec]] (`javax.imageio` ships in every
  * JDK: PNG/JPEG/BMP/GIF/WBMP), audio via [[AudioCodec]]
  * (`javax.sound.sampled`: WAV/AIFF/AU), and MJPEG-in-AVI video via
  * [[VideoCodec]] (a pure-Java RIFF chunk walker — MJPEG frames are
  * standalone JPEGs, so the image codec finishes the job). Other video
  * codecs have no JDK decoder and use the clearly-marked deterministic
  * [[StubCodec]] — which also serves as the fallback for payloads the real
  * codecs cannot parse, so a corrupt file never kills a 100 TB pass; the
  * `decoded` flag / NULL dims route undecodables to quarantine downstream.
  * Swap `StubCodec` for a JNI/FFI codec (ffmpeg) in production for H.264+.
  */
object Multimodal {

  /** Real image codec on `javax.imageio` — decodes the formats every JDK
    * bundles. One call per row inside `mapPartitions`; memory is bounded by
    * one decoded image at a time per task. */
  object ImageCodec {
    // ImageIO defaults to spooling ImageInputStreams through temp FILES —
    // pure overhead for in-memory byte arrays, and a per-row disk write on
    // executors. Static init runs once per JVM at first task use.
    javax.imageio.ImageIO.setUseCache(false)

    /** Decode, or None when the payload is not a parseable image (wrong
      * magic bytes, truncated file, or a non-image modality). */
    def decode(payload: Array[Byte]): Option[java.awt.image.BufferedImage] =
      if (payload == null || payload.length == 0) None
      else
        try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload)))
        catch { case _: java.io.IOException | _: RuntimeException => None }

    /** L1-normalized luminance histogram over `dim` bins — the real-pixel
      * analogue of [[StubCodec.features]], comparable across image sizes. */
    def lumaHistogram(img: java.awt.image.BufferedImage, dim: Int): Array[Float] = {
      val w = img.getWidth; val h = img.getHeight
      // one bulk getRGB: per-pixel getRGB pays a colour-model dispatch per call
      val rgb = img.getRGB(0, 0, w, h, null, 0, w)
      val hist = new Array[Float](dim)
      var i = 0
      while (i < rgb.length) {
        val p = rgb(i)
        // integer Rec.601 luma in [0, 255]
        val luma = (((p >> 16) & 0xFF) * 299 + ((p >> 8) & 0xFF) * 587 + (p & 0xFF) * 114) / 1000
        hist(luma * dim / 256) += 1f
        i += 1
      }
      val total = math.max(rgb.length, 1).toFloat
      var j = 0
      while (j < dim) { hist(j) /= total; j += 1 }
      hist
    }
  }

  /** Real audio codec on `javax.sound.sampled` — WAV/AIFF/AU parse in every
    * JDK (the same "the JDK already ships it" fact that made image decode
    * real; only video genuinely has no JDK codec). Decoding converts to
    * 16-bit signed PCM and STREAMS it in fixed 8 KiB chunks, so memory per
    * task is bounded by the chunk, not the clip. */
  object AudioCodec {
    final case class AudioInfo(sampleRate: Int, channels: Int, frames: Long,
                               durationUs: Long, rms: Double, peak: Double)

    /** Container magic sniff. The JDK's provider lookup behind
      * `AudioSystem.getAudioInputStream` re-walks the synchronized service
      * registry on EVERY call, even to reject — measured ~10.6 s of a
      * 10.9 s decode pass spent rejecting 50k non-audio payloads, with all
      * 32 task threads serializing on the registry lock (ImageIO caches
      * its registry, which is why the identical image pass costs 0.37 s).
      * Routing by magic bytes first makes the not-audio common case free;
      * only payloads that declare a WAV/AIFF/AU container (the formats the
      * JDK parses) reach the parser, and anything this gate skips would
      * have been rejected by that parser anyway. */
    private def looksLikeAudio(p: Array[Byte]): Boolean =
      p.length >= 12 && (
        (p(0) == 'R' && p(1) == 'I' && p(2) == 'F' && p(3) == 'F' &&
          p(8) == 'W' && p(9) == 'A' && p(10) == 'V' && p(11) == 'E') ||
        (p(0) == 'F' && p(1) == 'O' && p(2) == 'R' && p(3) == 'M' &&
          p(8) == 'A' && p(9) == 'I' && p(10) == 'F' &&
          (p(11) == 'F' || p(11) == 'C')) ||
        (p(0) == '.' && p(1) == 's' && p(2) == 'n' && p(3) == 'd'))

    /** Parse + PCM stats, or None when the payload is not a parseable
      * audio container (wrong magic, truncated, or another modality). */
    def decode(payload: Array[Byte]): Option[AudioInfo] = {
      if (payload == null || payload.length == 0 || !looksLikeAudio(payload))
        return None
      try {
        val base = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(payload))
        try {
          val fmt = base.getFormat
          val target = new javax.sound.sampled.AudioFormat(
            javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
            fmt.getSampleRate, 16, fmt.getChannels,
            fmt.getChannels * 2, fmt.getSampleRate, false)
          val pcm = javax.sound.sampled.AudioSystem.getAudioInputStream(target, base)
          val buf = new Array[Byte](8192)
          var sumSq = 0.0; var peakAbs = 0L; var samples = 0L
          var n = pcm.read(buf)
          while (n > 0) {
            var i = 0
            while (i + 1 < n) {
              // little-endian signed 16-bit, as requested in `target`
              val s = ((buf(i + 1) << 8) | (buf(i) & 0xFF)).toLong
              sumSq += (s * s).toDouble
              if (math.abs(s) > peakAbs) peakAbs = math.abs(s)
              samples += 1
              i += 2
            }
            n = pcm.read(buf)
          }
          if (samples == 0) None
          else {
            val frames = samples / fmt.getChannels
            val sr = math.round(fmt.getSampleRate).toInt
            Some(AudioInfo(sr, fmt.getChannels, frames,
              frames * 1000000L / sr,
              math.sqrt(sumSq / samples) / 32768.0, peakAbs / 32768.0))
          }
        } finally base.close()
      } catch {
        case _: javax.sound.sampled.UnsupportedAudioFileException |
             _: java.io.IOException | _: IllegalArgumentException => None
      }
    }
  }

  /** Real video container codec: a pure-Java RIFF/AVI chunk walker. The JDK
    * has no inter-frame video codec, but MJPEG-in-AVI needs none — every
    * frame is a standalone JPEG the JDK's `javax.imageio` decodes — so this
    * is the one video format decodable with zero native dependencies
    * (reference scope: the video-frame extraction the multimodal pipeline
    * stubs behind ffmpeg elsewhere). Parsing is fail-soft: anything that is
    * not a well-formed AVI returns None and the caller falls back to
    * [[StubCodec]], so a corrupt container never kills a 100 TB pass.
    * Memory per task is O(payload): frames are slices of the already-loaded
    * binary column value. */
  object VideoCodec {
    /** `width`/`height`/`declaredFrames` come from the `avih` main header;
      * `frames` are the raw video-data chunk payloads (`##dc`/`##db`) in
      * file order — for MJPEG each one is a complete JPEG. */
    final case class AviVideo(width: Int, height: Int, declaredFrames: Int,
                              frames: Vector[Array[Byte]])

    private def fourcc(b: Array[Byte], off: Int): String =
      new String(b, off, 4, java.nio.charset.StandardCharsets.ISO_8859_1)
    private def u32(b: Array[Byte], off: Int): Long =
      (b(off) & 0xFFL) | ((b(off + 1) & 0xFFL) << 8) |
        ((b(off + 2) & 0xFFL) << 16) | ((b(off + 3) & 0xFFL) << 24)

    /** Walk the RIFF chunk tree; None unless the payload is a structurally
      * valid `RIFF....AVI ` container. Chunk sizes are clamped to the
      * payload and a non-advancing offset aborts the walk (truncated or
      * hostile size fields degrade to "what was parsed so far", never to an
      * infinite loop or OOB read). */
    def parseAvi(payload: Array[Byte]): Option[AviVideo] = {
      if (payload == null || payload.length < 12) return None
      if (fourcc(payload, 0) != "RIFF" || fourcc(payload, 8) != "AVI ") return None
      var width = 0; var height = 0; var declared = 0
      val frames = Vector.newBuilder[Array[Byte]]
      def walk(start: Int, end: Int): Unit = {
        var off = start
        while (off + 8 <= end) {
          val id = fourcc(payload, off)
          val size = u32(payload, off + 4)
          val dataStart = off + 8
          val dataEnd = math.min(dataStart + size, end.toLong).toInt
          if (size < 0 || dataEnd < dataStart) return // hostile size: abort
          if (id == "LIST" && dataEnd - dataStart >= 4)
            walk(dataStart + 4, dataEnd)
          else if (id == "avih" && dataEnd - dataStart >= 40) {
            declared = u32(payload, dataStart + 16).toInt
            width = u32(payload, dataStart + 32).toInt
            height = u32(payload, dataStart + 36).toInt
          } else if (id.length == 4 && id(0).isDigit && id(1).isDigit &&
                     id(2) == 'd' && (id(3) == 'b' || id(3) == 'c'))
            frames += java.util.Arrays.copyOfRange(payload, dataStart, dataEnd)
          off = dataEnd + ((size & 1L).toInt) // chunks pad to even offsets
        }
      }
      val riffEnd = math.min(8L + u32(payload, 4), payload.length.toLong).toInt
      walk(12, riffEnd)
      val fs = frames.result()
      if (fs.isEmpty && width == 0 && height == 0) None
      else Some(AviVideo(width, height, declared, fs))
    }

    /** Minimal MJPEG-AVI writer (the encode direction of [[parseAvi]]):
      * RIFF(hdrl(avih, strl(strh vids/MJPG, strf)) + movi of `00dc` JPEG
      * chunks). Used to plant golden containers in tests/queries; also a
      * legitimate sink for frame sequences. Built bottom-up as byte arrays
      * — container overhead is ~200 bytes, frames dominate. */
    def buildMjpegAvi(frames: Seq[Array[Byte]], width: Int, height: Int,
                      fps: Int = 25): Array[Byte] = {
      def le32(v: Long): Array[Byte] = Array(
        (v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
        ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)
      def tag(s: String): Array[Byte] =
        s.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
      def cat(parts: Array[Byte]*): Array[Byte] = {
        val out = new java.io.ByteArrayOutputStream()
        parts.foreach(out.write)
        out.toByteArray
      }
      def chunk(id: String, body: Array[Byte]): Array[Byte] =
        cat(tag(id), le32(body.length.toLong), body,
          if ((body.length & 1) == 1) Array(0.toByte) else Array.emptyByteArray)
      def list(listType: String, parts: Array[Byte]*): Array[Byte] = {
        val body = cat(parts: _*)
        cat(tag("LIST"), le32(4L + body.length), tag(listType), body)
      }
      val maxFrame = if (frames.isEmpty) 0 else frames.map(_.length).max
      val avih = chunk("avih", cat(
        le32(1000000L / math.max(fps, 1)),              // dwMicroSecPerFrame
        le32(0), le32(0), le32(0),                      // maxBytesPerSec, padding, flags
        le32(frames.length.toLong),                     // dwTotalFrames
        le32(0), le32(1), le32(maxFrame.toLong),        // initialFrames, streams, bufSize
        le32(width.toLong), le32(height.toLong),
        le32(0), le32(0), le32(0), le32(0)))            // reserved
      val strh = chunk("strh", cat(
        tag("vids"), tag("MJPG"),
        le32(0), le32(0), le32(0),                      // flags, prio+lang, initialFrames
        le32(1), le32(fps.toLong),                      // scale, rate → fps
        le32(0), le32(frames.length.toLong),            // start, length
        le32(maxFrame.toLong), le32(0xFFFFFFFFL),       // bufSize, quality=-1
        le32(0),                                        // sampleSize
        le32(0), le32((height.toLong << 16) | width.toLong))) // rcFrame (right,bottom)
      val strf = chunk("strf", cat(                     // BITMAPINFOHEADER
        le32(40), le32(width.toLong), le32(height.toLong),
        le32((24L << 16) | 1L),                         // biBitCount=24, biPlanes=1
        tag("MJPG"),                                    // biCompression
        le32(width.toLong * height * 3), le32(0), le32(0), le32(0), le32(0)))
      val hdrl = list("hdrl", avih, list("strl", strh, strf))
      val movi = list("movi", frames.map(chunk("00dc", _)): _*)
      val riffBody = cat(tag("AVI "), hdrl, movi)
      cat(tag("RIFF"), le32(riffBody.length.toLong), riffBody)
    }
  }

  /** Canonical media schema: payload + typed metadata travel together. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("modality", StringType),   // "image" | "audio" | "video"
    StructField("payload", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("sample_rate", IntegerType),
      StructField("n_frames", IntegerType))))))

  /** STUB codec — deterministic fake in place of ffmpeg (audio/video codecs
    * are not present in this container) and the fallback for undecodable
    * image payloads. Features derive only from payload bytes, so results
    * are reproducible across partitionings. */
  object StubCodec {
    /** "Decode" → (width, height) pretend-parsed from the payload header.
      * Derivation is ENGINE-NEUTRAL (first two bytes of the payload's md5):
      * a stub's fake values are arbitrary, so they may as well be
      * reproducible by the DuckDB oracle — which turns the whole decode
      * plumbing (schema, batching, row fan-out) into a hash-checked path
      * instead of a rows-only one. */
    // one digest instance per thread: getInstance pays a synchronized
    // provider lookup + allocation, too heavy for a per-row call
    private val md5 = ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))
    def imageDims(payload: Array[Byte]): (Int, Int) = {
      // null payload ≡ empty payload (a stub of a real codec fails
      // explicitly downstream, not via NPE from its hash helper)
      val bytes = if (payload == null) Array.empty[Byte] else payload
      val d = md5.get()
      d.reset()
      val h = d.digest(bytes)
      (64 + (h(0) & 0xFF) % 193, 64 + (h(1) & 0xFF) % 193)
    }
    /** "Feature-extract" → fixed-width float vector (byte histogram, L1-normalized). */
    def features(payload: Array[Byte], dim: Int = 16): Array[Float] = {
      val bytes = if (payload == null) Array.empty[Byte] else payload
      val hist = new Array[Float](dim)
      bytes.foreach(b => hist((b & 0xFF) % dim) += 1f)
      val total = math.max(bytes.length, 1).toFloat
      hist.map(_ / total)
    }
    /** "Decode" → fake audio header, engine-neutral like [[imageDims]]
      * (md5-derived sample rate/channels, byte count as the frame count) so
      * an oracle can replay the fallback path; rms/peak are honestly NULL —
      * a stub has no samples to measure. */
    def audioInfo(payload: Array[Byte]): (Int, Int, Long, Long) = {
      val bytes = if (payload == null) Array.empty[Byte] else payload
      val d = md5.get()
      d.reset()
      val h = d.digest(bytes)
      val sampleRate = 8000 * (1 + (h(0) & 0xFF) % 6)   // 8k..48k
      val channels = 1 + (h(1) & 0xFF) % 2
      val frames = bytes.length.toLong
      (sampleRate, channels, frames, frames * 1000000L / sampleRate)
    }
    /** "Frame-sample" → every k-th 256-byte block as a pretend frame. */
    def sampleFrames(payload: Array[Byte], everyK: Int): Seq[Array[Byte]] =
      payload.grouped(256).zipWithIndex.collect {
        case (block, i) if i % everyK == 0 => block
      }.toSeq
  }

  /** Wrap a text/binary source into the canonical media frame (for tests:
    * the container has no real media, so payload = utf-8 of a text column). */
  def asMedia(df: DataFrame, id: Column, payload: Column, modality: String): DataFrame =
    df.select(id.as("media_id"), lit(modality).as("modality"),
      payload.cast("binary").as("payload"),
      struct(lit(null).cast("int").as("width"), lit(null).cast("int").as("height"),
        lit(null).cast("int").as("sample_rate"), lit(null).cast("int").as("n_frames")).as("meta"))

  /** Decode pass: real `javax.imageio` decode first; payloads ImageIO cannot
    * parse fall back to the deterministic [[StubCodec]] dims with
    * `decoded = false` so a corrupt file never fails the pass (quarantine on
    * the flag downstream). Batched per partition — decoder state is
    * per-partition, the DoFn @Setup pattern (reference:
    * SDK/transforms/DoFn.java:492). */
  def decodeImages(spark: SparkSession, media: DataFrame): DataFrame = {
    val out = StructType(Seq(
      StructField("media_id", LongType), StructField("width", IntegerType),
      StructField("height", IntegerType), StructField("n_bytes", LongType),
      StructField("decoded", BooleanType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(out)
    media.select(col("media_id"), col("payload")).mapPartitions { it =>
      it.map { r =>
        val payload = r.getAs[Array[Byte]]("payload")
        ImageCodec.decode(payload) match {
          case Some(img) =>
            Row(r.getLong(0), img.getWidth, img.getHeight, payload.length.toLong, true)
          case None =>
            val (w, h) = StubCodec.imageDims(payload)
            Row(r.getLong(0), w, h,
              (if (payload == null) 0L else payload.length.toLong), false)
        }
      }
    }(enc)
  }

  /** Audio decode pass: real `javax.sound.sampled` parse + streamed PCM
    * stats first; unparseable payloads fall back to the deterministic
    * [[StubCodec.audioInfo]] header with `decoded = false` and NULL pcm
    * stats — same quarantine-on-flag contract as [[decodeImages]]. */
  def decodeAudio(spark: SparkSession, media: DataFrame): DataFrame = {
    val out = StructType(Seq(
      StructField("media_id", LongType), StructField("sample_rate", IntegerType),
      StructField("channels", IntegerType), StructField("n_frames", LongType),
      StructField("duration_us", LongType),
      StructField("rms", DoubleType), StructField("peak", DoubleType),
      StructField("n_bytes", LongType), StructField("decoded", BooleanType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(out)
    media.select(col("media_id"), col("payload")).mapPartitions { it =>
      it.map { r =>
        val payload = r.getAs[Array[Byte]]("payload")
        val nBytes = if (payload == null) 0L else payload.length.toLong
        AudioCodec.decode(payload) match {
          case Some(a) =>
            Row(r.getLong(0), a.sampleRate, a.channels, a.frames, a.durationUs,
              a.rms, a.peak, nBytes, true)
          case None =>
            val (sr, ch, frames, durUs) = StubCodec.audioInfo(payload)
            Row(r.getLong(0), sr, ch, frames, durUs, null, null, nBytes, false)
        }
      }
    }(enc)
  }

  /** Feature extraction → embedding column, ready for graft.operators
    * .Similarity. Decodable images yield a REAL pixel-luminance histogram
    * ([[ImageCodec.lumaHistogram]]); everything else the stub byte
    * histogram — both L1-normalized float vectors of the same width, so the
    * downstream ANN plumbing is identical either way. */
  def extractFeatures(spark: SparkSession, media: DataFrame, dim: Int = 16): DataFrame = {
    val out = StructType(Seq(
      StructField("media_id", LongType),
      StructField("features", ArrayType(FloatType, containsNull = false))))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(out)
    media.select(col("media_id"), col("payload")).mapPartitions { it =>
      it.map { r =>
        val payload = r.getAs[Array[Byte]]("payload")
        val feats = ImageCodec.decode(payload) match {
          case Some(img) => ImageCodec.lumaHistogram(img, dim)
          case None      => StubCodec.features(payload, dim)
        }
        Row(r.getLong(0), feats.toSeq)
      }
    }(enc)
  }

  /** Frame sampling (video): 1:N explode of every k-th frame with indices.
    * Payloads that parse as AVI ([[VideoCodec.parseAvi]]) yield their REAL
    * video-data chunks, each ImageIO-decoded for `frame_w`/`frame_h` (MJPEG
    * frames are standalone JPEGs; undecodable frames keep NULL dims).
    * Everything else falls back to the deterministic [[StubCodec]] 256-byte
    * blocks with NULL dims — same fail-soft contract as the other decode
    * passes. `frame_idx` numbers the SAMPLED frames 0..n on both paths. */
  def sampleFrames(spark: SparkSession, media: DataFrame, everyK: Int = 4): DataFrame = {
    val out = StructType(Seq(
      StructField("media_id", LongType), StructField("frame_idx", IntegerType),
      StructField("frame", BinaryType),
      StructField("frame_w", IntegerType), StructField("frame_h", IntegerType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(out)
    media.select(col("media_id"), col("payload")).mapPartitions { it =>
      it.flatMap { r =>
        val payload = r.getAs[Array[Byte]]("payload")
        VideoCodec.parseAvi(payload) match {
          case Some(v) =>
            v.frames.zipWithIndex.collect { case (f, i) if i % everyK == 0 => f }
              .zipWithIndex.map { case (f, i) =>
                val img = ImageCodec.decode(f)
                Row(r.getLong(0), i, f,
                  img.map(im => Integer.valueOf(im.getWidth)).orNull,
                  img.map(im => Integer.valueOf(im.getHeight)).orNull)
              }
          case None =>
            StubCodec.sampleFrames(if (payload == null) Array.emptyByteArray else payload,
                everyK)
              .zipWithIndex.map { case (f, i) => Row(r.getLong(0), i, f, null, null) }
        }
      }
    }(enc)
  }
}
