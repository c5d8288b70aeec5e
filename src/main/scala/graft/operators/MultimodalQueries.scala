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

  override val all: Seq[Q] = Seq(mm1)
}
