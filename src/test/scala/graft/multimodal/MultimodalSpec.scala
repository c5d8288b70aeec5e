package graft.multimodal

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  private lazy val media = Multimodal.syntheticMedia(
    spark, Tables.documents(spark, sf0001), "doc_id", "text")

  test("synthetic media matches the declared schema shape") {
    val kinds = media.groupBy("kind").count().collect().map(_.getString(0)).toSet
    assert(kinds == Set("image", "audio", "video"))
    assert(media.filter(col("kind") === "image").filter(col("width").isNull).count() == 0)
    assert(media.filter(col("kind") === "video").filter(col("n_frames").isNull).count() == 0)
  }

  test("feature extraction is deterministic, distributed, null-safe") {
    val f1 = Multimodal.extractFeatures(media).collect().map(m => m.media_id -> m.checksum).toMap
    val f2 = Multimodal.extractFeatures(media.repartition(7)).collect().map(m => m.media_id -> m.checksum).toMap
    assert(f1 == f2) // partitioning must not change results
    val withNull = media.limit(3).map(m => m.copy(content = null))(media.encoder)
    val nf = Multimodal.extractFeatures(withNull).collect()
    assert(nf.forall(_.n_bytes == 0L))
  }

  test("feature vectors feed the ANN path (8-dim float)") {
    val feats = Multimodal.extractFeatures(media)
    assert(feats.head().feature.length == 8)
  }

  test("frame sampling explodes every k-th frame of videos only") {
    val sampled = Multimodal.sampleFrames(media.toDF(), 5)
    assert(sampled.filter(col("kind") =!= "video").count() == 0)
    val one = sampled.filter(col("media_id") === 5) // media 5: video, n_frames = 6
    assert(one.select("frame_idx").collect().map(_.getInt(0)).toSeq == Seq(0, 5))
  }

  test("image codec: PNG roundtrip — decoder inverts the real encoder") {
    val bytes = ImageCodec.encodePng(37, 21, (x, y) => (x * 7 + y * 3) % 256)
    // a real PNG: javax.imageio (an independent JDK decoder) agrees
    val jdk = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(jdk.getWidth == 37 && jdk.getHeight == 21)
    assert(jdk.getRaster.getSample(5, 4, 0) == (5 * 7 + 4 * 3) % 256)
    assert(ImageCodec.decode(bytes).contains(ImageCodec.ImageInfo("png", 37, 21)))
  }

  test("image codec: JPEG marker walk, GIF and BMP headers, junk rejection") {
    assert(ImageCodec.decode(ImageCodec.jpegHeaderBytes(640, 480))
      .contains(ImageCodec.ImageInfo("jpeg", 640, 480)))
    val gif = "GIF89a".getBytes("US-ASCII") ++
      Array[Byte](10, 0, 7, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
    assert(ImageCodec.decode(gif).contains(ImageCodec.ImageInfo("gif", 10, 7)))
    val bmp = new Array[Byte](30)
    bmp(0) = 'B'; bmp(1) = 'M'; bmp(18) = 12; bmp(22) = (256 - 9).toByte
    bmp(23) = 0xff.toByte; bmp(24) = 0xff.toByte; bmp(25) = 0xff.toByte // height -9 (top-down)
    assert(ImageCodec.decode(bmp).contains(ImageCodec.ImageInfo("bmp", 12, 9)))
    assert(ImageCodec.decode("not an image at all..".getBytes).isEmpty)
    assert(ImageCodec.decode(null).isEmpty)
    assert(ImageCodec.decode(Array[Byte](0xff.toByte, 0xd8.toByte)).isEmpty) // truncated JPEG
  }

  test("extractFeatures decodes real image dimensions distributed; audio/video stay dimensionless") {
    import spark.implicits._
    val rows = Seq(
      Multimodal.Media(1L, "image", ImageCodec.encodePng(64, 32), None, None, None, None),
      Multimodal.Media(2L, "image", ImageCodec.jpegHeaderBytes(320, 200), None, None, None, None),
      Multimodal.Media(3L, "image", "junk".getBytes, None, None, None, None),
      Multimodal.Media(4L, "audio", ImageCodec.encodePng(8, 8), None, None, Some(16000), None))
    val out = Multimodal.extractFeatures(spark.createDataset(rows).repartition(3))
      .collect().map(f => f.media_id -> ((f.format, f.width, f.height))).toMap
    assert(out(1L) == ((Some("png"), Some(64), Some(32))))
    assert(out(2L) == ((Some("jpeg"), Some(320), Some(200))))
    assert(out(3L) == ((None, None, None)))   // undecodable image → nulls, row kept
    assert(out(4L) == ((None, None, None)))   // audio: never image-decoded
  }

  test("resize rewrites metadata without touching payload") {
    val resized = Multimodal.resizeMeta(
      media.toDF().withColumn("meta", struct(col("width"), col("height"), col("sample_rate"), col("n_frames"))),
      224, 224)
    val r = resized.select("meta.width", "meta.height").distinct().collect()
    assert(r.length == 1 && r(0).getInt(0) == 224)
  }
}
