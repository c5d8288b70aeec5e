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

  test("resize rewrites metadata without touching payload") {
    val resized = Multimodal.resizeMeta(
      media.toDF().withColumn("meta", struct(col("width"), col("height"), col("sample_rate"), col("n_frames"))),
      224, 224)
    val r = resized.select("meta.width", "meta.height").distinct().collect()
    assert(r.length == 1 && r(0).getInt(0) == 224)
  }
}
