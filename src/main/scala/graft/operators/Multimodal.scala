package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing for training-data
  * pipelines. Media payloads are opaque `binary` columns with typed metadata;
  * decode/feature-extract run per-partition in bounded batches so a 100 TB
  * corpus streams through fixed executor memory.
  *
  * The actual codecs are NOT in this container, so the decode kernel is a
  * clearly-marked deterministic stub ([[StubCodec]]); everything around it —
  * schema, batching, partition sizing, the operator signatures — is real and
  * tested. Swap `StubCodec` for a JNI/FFI codec in production.
  */
object Multimodal {

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

  /** STUB codec — deterministic fake in place of libjpeg/ffmpeg (not present
    * in this container). Features derive only from payload bytes, so results
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
      val hist = new Array[Float](dim)
      payload.foreach(b => hist((b & 0xFF) % dim) += 1f)
      val total = math.max(payload.length, 1).toFloat
      hist.map(_ / total)
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

  /** Decode pass: fills meta from the (stub) codec. Batched per partition —
    * the real-codec version would reuse one decoder instance per partition
    * (the DoFn @Setup pattern, reference: SDK/transforms/DoFn.java:492). */
  def decodeImages(spark: SparkSession, media: DataFrame): DataFrame = {
    val out = StructType(Seq(
      StructField("media_id", LongType), StructField("width", IntegerType),
      StructField("height", IntegerType), StructField("n_bytes", LongType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(out)
    media.select(col("media_id"), col("payload")).mapPartitions { it =>
      // per-partition codec init would go here (@Setup)
      it.map { r =>
        val payload = r.getAs[Array[Byte]]("payload")
        val (w, h) = StubCodec.imageDims(payload)
        Row(r.getLong(0), w, h, payload.length.toLong)
      }
    }(enc)
  }

  /** Feature extraction → embedding column, ready for graft.operators.Similarity. */
  def extractFeatures(spark: SparkSession, media: DataFrame, dim: Int = 16): DataFrame = {
    val out = StructType(Seq(
      StructField("media_id", LongType),
      StructField("features", ArrayType(FloatType, containsNull = false))))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(out)
    media.select(col("media_id"), col("payload")).mapPartitions { it =>
      it.map { r =>
        Row(r.getLong(0), StubCodec.features(r.getAs[Array[Byte]]("payload"), dim).toSeq)
      }
    }(enc)
  }

  /** Frame sampling (video): 1:N explode of sampled frames with indices. */
  def sampleFrames(spark: SparkSession, media: DataFrame, everyK: Int = 4): DataFrame = {
    val out = StructType(Seq(
      StructField("media_id", LongType), StructField("frame_idx", IntegerType),
      StructField("frame", BinaryType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(out)
    media.select(col("media_id"), col("payload")).mapPartitions { it =>
      it.flatMap { r =>
        StubCodec.sampleFrames(r.getAs[Array[Byte]]("payload"), everyK)
          .zipWithIndex.map { case (f, i) => Row(r.getLong(0), i, f) }
      }
    }(enc)
  }
}
