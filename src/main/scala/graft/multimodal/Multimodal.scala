package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing for training-data pipelines.
  *
  * Images/audio/video ride through the engine as opaque `binary`
  * columns plus a typed metadata struct; decode / feature-extract /
  * resize / frame-sample run as iterator-to-iterator `mapPartitions`
  * stages (one decoder init per partition, no per-row setup — the
  * Scala-side equivalent of `mapInPandas` batch shape). All three
  * container-decode paths are real: [[ImageCodec]] parses
  * PNG/JPEG/GIF/BMP headers to (format, width, height); [[AvCodec]]
  * parses WAV/FLAC audio headers (sample rate, channels, duration) and
  * MP4/AVI video headers (dimensions, duration) — header-only, no
  * frame decompression, which is the correct 100 TB shape. WAV PCM16
  * payloads additionally get a REAL sample decode (rms/peak features —
  * PCM has no codec). Only compressed FRAME decoding (AAC, H.264, …)
  * falls back to the deterministic byte-hash feature stub: those need
  * codec libraries this environment doesn't ship, and a production
  * deployment swaps that one body.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),        // image | audio | video
    StructField("content", BinaryType, nullable = true),      // opaque payload
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("sample_rate", IntegerType, nullable = true),
      StructField("n_frames", IntegerType, nullable = true))), nullable = true)))

  final case class Media(media_id: Long, kind: String, content: Array[Byte],
      width: Option[Int], height: Option[Int], sample_rate: Option[Int], n_frames: Option[Int])

  final case class MediaFeatures(media_id: Long, kind: String, n_bytes: Long,
      checksum: Long, feature: Array[Float],
      format: Option[String], width: Option[Int], height: Option[Int],
      sample_rate: Option[Int], duration_ms: Option[Long])

  /** Feature stub for payloads whose FRAMES need a codec library
    * (AAC/H.264/… — headers still decode for real via [[ImageCodec]] /
    * [[AvCodec]]; WAV PCM gets real rms/peak) — a production deployment
    * replaces this one body with a codec call; everything around it
    * (batching, schema, distribution) is production-shaped. The fake is
    * deterministic: an 8-dim feature from a rolling byte hash. */
  private[multimodal] def decodeBytes(content: Array[Byte]): Array[Float] = {
    val f = new Array[Float](8)
    if (content != null) {
      var h = 1125899906842597L
      var i = 0
      while (i < content.length) {
        h = 31 * h + content(i)
        f(i % 8) += (content(i) & 0xff) / 255.0f
        i += 1
      }
      f(7) = (h % 1000L).toFloat
    }
    f
  }

  /** Decode/feature-extract stage: iterator-to-iterator mapPartitions,
    * one "decoder" per partition. Null content → null-safe zero row.
    * Every kind gets its real header decode (image dims, audio
    * rate/duration, video dims/duration); WAV PCM additionally gets
    * real rms/peak features; unparseable payloads keep the stub
    * feature with null metadata (row kept — curation filters decide). */
  def extractFeatures(media: Dataset[Media]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition decoder init would happen here (codec handle)
      it.map { m =>
        val bytes = Option(m.content).getOrElse(Array.emptyByteArray)
        val img = if (m.kind == "image") ImageCodec.decode(bytes) else None
        val aud = if (m.kind == "audio") AvCodec.decodeAudio(bytes) else None
        val vid = if (m.kind == "video") AvCodec.decodeVideo(bytes) else None
        val feat = aud match {
          case Some(a) if a.format == "wav" =>
            // PCM is codec-free: the feature pair is real DSP
            val samples = AvCodec.pcm16Samples(bytes)
            val (rms, peak) = AvCodec.pcmRmsPeak(samples)
            Array((rms / 32768.0).toFloat, peak / 32768.0f, a.sampleRate.toFloat,
              a.channels.toFloat, samples.length.toFloat, 0f, 0f, 0f)
          case _ => decodeBytes(bytes)
        }
        MediaFeatures(m.media_id, m.kind, bytes.length.toLong,
          bytes.foldLeft(17L)((a, b) => a * 31 + b), feat,
          img.map(_.format).orElse(aud.map(_.format)).orElse(vid.map(_.format)),
          img.map(_.width).orElse(vid.map(_.width)),
          img.map(_.height).orElse(vid.map(_.height)),
          aud.map(_.sampleRate),
          aud.map(_.durationMs).orElse(vid.map(_.durationMs)))
      }
    }
  }

  /** Resize is a metadata transform at plan level — the binary payload
    * passes through untouched until a compute stage needs it. */
  def resizeMeta(df: DataFrame, width: Int, height: Int): DataFrame =
    df.withColumn("meta", struct(
      lit(width).as("width"), lit(height).as("height"),
      col("meta.sample_rate").as("sample_rate"), col("meta.n_frames").as("n_frames")))

  /** Frame sampling: video rows explode into every k-th frame index
    * (real decode of the sampled frames happens in extractFeatures). */
  def sampleFrames(df: DataFrame, everyK: Int): DataFrame =
    df.filter(col("kind") === "video")
      .withColumn("frame_idx",
        explode(sequence(lit(0), greatest(coalesce(col("n_frames"), lit(1)) - 1, lit(0)), lit(everyK))))

  /** Synthesize a media table from any (id, text) frame — test/dev
    * stand-in for real binary ingestion. */
  def syntheticMedia(spark: SparkSession, df: DataFrame, idCol: String, textCol: String): Dataset[Media] = {
    import spark.implicits._
    df.select(
        col(idCol).cast(LongType).as("media_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (pmod(col(idCol), lit(3)) + 1).cast(IntegerType)).as("kind"),
        encode(col(textCol), "UTF-8").as("content"),
        (pmod(col(idCol), lit(64)) + 1).cast(IntegerType).as("w"))
      .select(col("media_id"), col("kind"), col("content"),
        when(col("kind") === "image", col("w")).otherwise(lit(null).cast(IntegerType)).as("width"),
        when(col("kind") === "image", col("w")).otherwise(lit(null).cast(IntegerType)).as("height"),
        when(col("kind") === "audio", lit(16000)).otherwise(lit(null).cast(IntegerType)).as("sample_rate"),
        when(col("kind") === "video", (pmod(col("media_id"), lit(30)) + 1).cast(IntegerType))
          .otherwise(lit(null).cast(IntegerType)).as("n_frames"))
      .as[Media]
  }
}
