package graft.operators

import graft.{Q, QueryModule, Tables}
import graft.functions.Exprs._
import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Driver-visible gate for the multimodal binary-column plumbing: the
  * payload rides as opaque bytes with typed metadata, and everything a
  * pipeline does BEFORE a codec touches the bytes — kind dispatch,
  * byte accounting, content digests, frame-sample planning — is
  * relational and oracle-checkable. (The decode stage itself stays a
  * documented stub; see `multimodal/Multimodal.decodeBytes`.)
  */
object MultimodalQueries extends QueryModule {

  private val mm1 = Q(
    "q_mm1_binary_meta",
    "binary media columns: kind dispatch, byte length, content md5, frame-sample plan",
    (s, d) => {
      val doc = Tables.documents(s, d)
      val media = Multimodal.syntheticMedia(s, doc, "doc_id", "text").toDF()
      val sampled = Multimodal.sampleFrames(media, 2)
        .groupBy(col("media_id")).agg(cnt.as("n_sampled"))
      media.join(sampled, Seq("media_id"), "left")
        .select(col("media_id"), col("kind"),
          length(col("content")).cast(LongType).as("n_bytes"),
          md5(col("content")).as("content_md5"),
          col("n_sampled"))
        .orderBy(col("media_id"))
    },
    Some("""
      SELECT doc_id AS media_id,
             ['image','audio','video'][(doc_id % 3) + 1] AS kind,
             CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
             md5(text) AS content_md5,
             CASE WHEN ['image','audio','video'][(doc_id % 3) + 1] = 'video'
                  THEN CAST((doc_id % 30) // 2 + 1 AS BIGINT) END AS n_sampled
      FROM documents ORDER BY media_id"""))

  private val mm2 = Q(
    "q_mm2_image_decode",
    "real image header decode: per-row PNG/JPEG synthesis → distributed ImageCodec parse",
    (s, d) => {
      import s.implicits._
      // the bytes are REAL containers (spec-conformant PNG via the
      // deflate encoder; JPEG SOI+APP0+SOF0 markers) with dimensions
      // derived from the id, so the oracle can verify the full
      // encode→decode roundtrip arithmetically without a codec
      val decoded = Tables.documents(s, d)
        .select(col("doc_id").cast(LongType)).as[Long]
        .mapPartitions { it =>
          it.map { id =>
            val w = (id % 64 + 1).toInt
            val h = (id % 48 + 1).toInt
            val bytes =
              if (id % 2 == 0) graft.multimodal.ImageCodec.encodePng(w, h,
                (x, y) => ((x + y + id) % 256).toInt)
              else graft.multimodal.ImageCodec.jpegHeaderBytes(w, h)
            val info = graft.multimodal.ImageCodec.decode(bytes)
              .getOrElse(sys.error(s"undecodable synthesized image for id $id"))
            (id, info.format, info.width, info.height)
          }
        }.toDF("media_id", "format", "width", "height")
      decoded.orderBy(col("media_id"))
    },
    Some("""
      SELECT doc_id AS media_id,
             CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'jpeg' END AS format,
             CAST(doc_id % 64 + 1 AS INT) AS width,
             CAST(doc_id % 48 + 1 AS INT) AS height
      FROM documents ORDER BY media_id"""))

  override val all: Seq[Q] = Seq(mm1, mm2)
}
