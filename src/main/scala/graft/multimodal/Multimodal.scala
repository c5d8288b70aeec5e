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
  * Scala-side equivalent of `mapInPandas` batch shape). The IMAGE
  * decode path is real: [[ImageCodec]] parses PNG/JPEG/GIF/BMP headers
  * to (format, width, height) — header-only, no pixel decompression.
  * Audio/video decode stays a deterministic STUB (no codec libraries
  * in this environment); the Spark-side contract — schema,
  * partitioning, batch shape, null handling — is real and tested, and
  * a production deployment swaps the stub for a real codec.
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
      format: Option[String], width: Option[Int], height: Option[Int])

  /** Feature stub for AUDIO/VIDEO payloads (images decode for real via
    * [[ImageCodec]]) — a real deployment replaces this body with a
    * codec call; everything around it (batching, schema, distribution)
    * is production-shaped. The fake is deterministic: an 8-dim feature
    * from a rolling byte hash. */
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
    * Image rows get their real header decode (format/width/height);
    * audio/video keep the stub feature with no dimensions. */
  def extractFeatures(media: Dataset[Media]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition decoder init would happen here (codec handle)
      it.map { m =>
        val bytes = Option(m.content).getOrElse(Array.emptyByteArray)
        val feat = decodeBytes(bytes)
        val info = if (m.kind == "image") ImageCodec.decode(bytes) else None
        MediaFeatures(m.media_id, m.kind, bytes.length.toLong,
          bytes.foldLeft(17L)((a, b) => a * 31 + b), feat,
          info.map(_.format), info.map(_.width), info.map(_.height))
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
