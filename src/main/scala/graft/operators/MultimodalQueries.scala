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

  private val mm3 = Q(
    "q_mm3_av_decode",
    "real audio/video header decode: per-row WAV/FLAC/MP4/AVI synthesis → distributed AvCodec parse",
    (s, d) => {
      import s.implicits._
      // REAL containers (RIFF chunk layout, FLAC STREAMINFO bit-fields,
      // ISO-BMFF box tree, AVI hdrl) with parameters derived from the
      // id, so the oracle verifies the encode→decode roundtrip
      // arithmetically without any codec. All durations are integer
      // math on both sides.
      val decoded = Tables.documents(s, d)
        .select(col("doc_id").cast(LongType)).as[Long]
        .mapPartitions { it =>
          it.map { id =>
            val av = graft.multimodal.AvCodec
            id % 4 match {
              case 0 =>
                val sr = (8000 + (id % 8) * 1000).toInt
                val ch = (id % 2 + 1).toInt
                val frames = ((id % 50 + 1) * 100).toInt
                val samples = Array.tabulate(frames * ch)(k => ((k * 31 + id) % 65536 - 32768).toShort)
                val a = av.decodeAudio(av.encodeWav(sr, ch, samples))
                  .getOrElse(sys.error(s"undecodable wav for id $id"))
                (id, a.format, None: Option[Int], None: Option[Int],
                  Some(a.sampleRate), Some(a.channels), a.durationMs)
              case 1 =>
                val sr = (16000 + (id % 10) * 100).toInt
                val a = av.decodeAudio(av.encodeFlacHeader(sr, (id % 3 + 1).toInt, 16, id * 100 + 1))
                  .getOrElse(sys.error(s"undecodable flac for id $id"))
                (id, a.format, None: Option[Int], None: Option[Int],
                  Some(a.sampleRate), Some(a.channels), a.durationMs)
              case 2 =>
                val v = av.decodeVideo(av.encodeMp4Header(
                    ((id % 32 + 1) * 16).toInt, ((id % 18 + 1) * 16).toInt, 1000, id % 10000))
                  .getOrElse(sys.error(s"undecodable mp4 for id $id"))
                (id, v.format, Some(v.width), Some(v.height),
                  None: Option[Int], None: Option[Int], v.durationMs)
              case _ =>
                val v = av.decodeVideo(av.encodeAviHeader(
                    ((id % 40 + 1) * 8).toInt, ((id % 30 + 1) * 8).toInt, id % 300 + 1, 33333L))
                  .getOrElse(sys.error(s"undecodable avi for id $id"))
                (id, v.format, Some(v.width), Some(v.height),
                  None: Option[Int], None: Option[Int], v.durationMs)
            }
          }
        }.toDF("media_id", "format", "width", "height", "sample_rate", "channels", "duration_ms")
      decoded.orderBy(col("media_id"))
    },
    Some("""
      SELECT doc_id AS media_id,
             CASE doc_id % 4 WHEN 0 THEN 'wav' WHEN 1 THEN 'flac'
                             WHEN 2 THEN 'mp4' ELSE 'avi' END AS format,
             CASE doc_id % 4 WHEN 2 THEN CAST((doc_id % 32 + 1) * 16 AS INT)
                             WHEN 3 THEN CAST((doc_id % 40 + 1) * 8 AS INT) END AS width,
             CASE doc_id % 4 WHEN 2 THEN CAST((doc_id % 18 + 1) * 16 AS INT)
                             WHEN 3 THEN CAST((doc_id % 30 + 1) * 8 AS INT) END AS height,
             CASE doc_id % 4 WHEN 0 THEN CAST(8000 + (doc_id % 8) * 1000 AS INT)
                             WHEN 1 THEN CAST(16000 + (doc_id % 10) * 100 AS INT) END AS sample_rate,
             CASE doc_id % 4 WHEN 0 THEN CAST(doc_id % 2 + 1 AS INT)
                             WHEN 1 THEN CAST(doc_id % 3 + 1 AS INT) END AS channels,
             CAST(CASE doc_id % 4
               WHEN 0 THEN ((doc_id % 50 + 1) * 100 * 1000) // (8000 + (doc_id % 8) * 1000)
               WHEN 1 THEN ((doc_id * 100 + 1) * 1000) // (16000 + (doc_id % 10) * 100)
               WHEN 2 THEN doc_id % 10000
               ELSE ((doc_id % 300 + 1) * 33333) // 1000
             END AS BIGINT) AS duration_ms
      FROM documents ORDER BY media_id"""))

  // ViT patch planning — the preprocessing arithmetic a vision-language
  // pipeline runs between decode and the model: pad each surface up to
  // the 16-px patch grid, count patches, sample video frames on a 2 s
  // stride, and derive the visual token budget (n_frames · patches
  // + 1 CLS). The decode is the REAL header roundtrip (mm2/mm3's
  // synthesized PNG / MP4 bytes through ImageCodec/AvCodec in
  // mapPartitions); the PLAN is pure Catalyst column math on the
  // decoded metadata — the part that must be relational, because at
  // 100 TB the planner's output (token budgets per shard) feeds
  // packing and batching long before any pixel decode runs.
  private val mm4 = {
    val patch = 16
    val strideMs = 2000L
    Q(
      "q_mm4_vision_plan",
      s"ViT patch plan: $patch-px grid, ${strideMs}ms frame stride, visual token budget",
      (s, d) => {
        import s.implicits._
        val decoded = Tables.documents(s, d)
          .select(col("doc_id").cast(LongType)).as[Long]
          .mapPartitions { it =>
            it.map { id =>
              if (id % 2 == 0) {
                val w = (id % 64 + 1).toInt
                val h = (id % 48 + 1).toInt
                val info = graft.multimodal.ImageCodec.decode(
                  graft.multimodal.ImageCodec.encodePng(w, h,
                    (x, y) => ((x + y + id) % 256).toInt))
                  .getOrElse(sys.error(s"undecodable synthesized png for id $id"))
                (id, "image", info.width, info.height, 0L)
              } else {
                val av = graft.multimodal.AvCodec
                val v = av.decodeVideo(av.encodeMp4Header(
                    ((id % 32 + 1) * 16).toInt, ((id % 18 + 1) * 16).toInt,
                    1000, id % 10000 + 1000))
                  .getOrElse(sys.error(s"undecodable synthesized mp4 for id $id"))
                (id, "video", v.width, v.height, v.durationMs)
              }
            }
          }.toDF("media_id", "kind", "width", "height", "duration_ms")
        decoded
          .withColumn("grid_x", expr(s"(width + ${patch - 1}) div $patch").cast(LongType))
          .withColumn("grid_y", expr(s"(height + ${patch - 1}) div $patch").cast(LongType))
          .withColumn("n_frames",
            when(col("kind") === "image", lit(1L))
              .otherwise(expr(s"duration_ms div $strideMs") + 1L))
          .select(col("media_id"), col("kind"), col("grid_x"), col("grid_y"),
            col("n_frames"),
            (col("n_frames") * col("grid_x") * col("grid_y") + 1L).as("n_tokens"))
          .orderBy(col("media_id"))
      },
      Some(s"""
        WITH m AS (
          SELECT doc_id AS media_id,
                 CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'video' END AS kind,
                 CASE WHEN doc_id % 2 = 0 THEN doc_id % 64 + 1
                      ELSE (doc_id % 32 + 1) * 16 END AS width,
                 CASE WHEN doc_id % 2 = 0 THEN doc_id % 48 + 1
                      ELSE (doc_id % 18 + 1) * 16 END AS height,
                 CASE WHEN doc_id % 2 = 0 THEN 0
                      ELSE doc_id % 10000 + 1000 END AS duration_ms
          FROM documents),
        p AS (
          SELECT media_id, kind,
                 (width + ${patch - 1}) // $patch AS grid_x,
                 (height + ${patch - 1}) // $patch AS grid_y,
                 CASE WHEN kind = 'image' THEN 1
                      ELSE duration_ms // $strideMs + 1 END AS n_frames
          FROM m)
        SELECT media_id, kind, CAST(grid_x AS BIGINT) AS grid_x,
               CAST(grid_y AS BIGINT) AS grid_y,
               CAST(n_frames AS BIGINT) AS n_frames,
               CAST(n_frames * grid_x * grid_y + 1 AS BIGINT) AS n_tokens
        FROM p ORDER BY media_id"""))
  }

  // Perceptual (pixel-level) image dedup — the dedup modality the
  // header-only codecs left open. The rasters are REAL: each doc_id
  // renders a cell-aligned grayscale PNG (4×4-px cells over a 9×8
  // grid, so W=36 H=32) through the deflate encoder, and the Spark
  // side runs the full pipeline — PNG decode (inflate + unfilter) →
  // integer 9×8 average-pool → dHash → 16-bit band fingerprints →
  // LSH band equi-join → exact Hamming verify on candidates only.
  // Groups of four consecutive ids share an md5-mixed base pattern
  // (PerceptualHash.synthCellValue — a polynomial base made every
  // image a near-dup of every other and the probe went quadratic in
  // the synthetic duplication); members m=1..3 re-map the first m
  // cells of row 0, flipping ≤ 4 dHash bits — planted near-dups, all
  // confined to band 0 so bands 1–3 still collide (the q_dd2 banding
  // guarantee). The oracle reconstructs the SAME fingerprints
  // arithmetically from the cell generator (pooling is exact on
  // cell-aligned rasters; the hash is the shared md5Long56) and
  // replicates the band-candidate ∧ Hamming≤t discovery rule.
  private val mm5 = {
    val t = 6 // Hamming threshold (planted near-dups differ by ≤ 3)
    Q(
      "q_mm5_perceptual_dedup",
      "pixel-level image dedup: real PNG rasters → dHash bands → LSH band join → Hamming verify",
      (s, d) => {
        import s.implicits._
        val fp = Tables.documents(s, d)
          .select(col("doc_id").cast(LongType)).as[Long]
          .mapPartitions { it =>
            val ph = graft.multimodal.PerceptualHash
            it.map { id =>
              val png = graft.multimodal.ImageCodec.encodePng(36, 32,
                ph.synthCellGrid(id / 4, id % 4))
              val raster = ph.decodePngGray(png)
                .getOrElse(sys.error(s"undecodable synthesized png for id $id"))
              val b = ph.dHashBands(raster)
              (id, b(0), b(1), b(2), b(3))
            }
          }.toDF("media_id", "b0", "b1", "b2", "b3")
        perceptualPairs(fp, t, wideBlocks = false)
          .orderBy(col("id_a"), col("id_b"))
      },
      Some(s"""
        WITH cells AS (
          SELECT d.doc_id AS media_id, cx.range AS cx, cy.range AS cy,
                 ((${Sketches.md5Long56Sql("'pc:' || CAST(d.doc_id // 4 AS VARCHAR) || ':' || CAST(cx.range AS VARCHAR) || ':' || CAST(cy.range AS VARCHAR)")}) % 241 +
                  CASE WHEN cy.range = 0 AND cx.range < d.doc_id % 4 THEN 101 ELSE 0 END) % 241 AS v
          FROM documents d, range(0, 9) cx, range(0, 8) cy),
        bits AS (
          SELECT a.media_id, (a.cy // 2) AS band, (a.cy % 2)*8 + a.cx AS loc,
                 CASE WHEN b.v > a.v THEN 1 ELSE 0 END AS bit
          FROM cells a JOIN cells b
            ON b.media_id = a.media_id AND b.cy = a.cy AND b.cx = a.cx + 1
          WHERE a.cx < 8),
        bands AS (
          SELECT media_id, band, CAST(sum(bit * (1 << loc)) AS BIGINT) AS bv
          FROM bits GROUP BY media_id, band),
        fp AS (
          SELECT media_id,
                 max(CASE WHEN band = 0 THEN bv END) AS b0,
                 max(CASE WHEN band = 1 THEN bv END) AS b1,
                 max(CASE WHEN band = 2 THEN bv END) AS b2,
                 max(CASE WHEN band = 3 THEN bv END) AS b3
          FROM bands GROUP BY media_id)
        SELECT DISTINCT a.media_id AS id_a, b.media_id AS id_b,
               CAST(bit_count(xor(a.b0, b.b0)) + bit_count(xor(a.b1, b.b1)) +
                    bit_count(xor(a.b2, b.b2)) + bit_count(xor(a.b3, b.b3)) AS BIGINT) AS hamming
        FROM fp a JOIN fp b
          ON a.media_id < b.media_id
         AND (a.b0 = b.b0 OR a.b1 = b.b1 OR a.b2 = b.b2 OR a.b3 = b.b3)
        WHERE bit_count(xor(a.b0, b.b0)) + bit_count(xor(a.b1, b.b1)) +
              bit_count(xor(a.b2, b.b2)) + bit_count(xor(a.b3, b.b3)) <= $t
        ORDER BY id_a, id_b"""))
  }


  // q_mm5b — the wide-block knob's recall contract as a gate: the
  // SPANNING fixture perturbs row 0 (band 0, low half) AND row 4
  // (band 2, high half), so planted near-dup pairs differ in BOTH
  // 32-bit halves. The narrow 4×16-bit blocking's pigeonhole still
  // finds them (bands 1/3 untouched); the wide 2×32-bit production
  // blocking — guarantee limited to one-half-confined pairs — misses
  // exactly this class. The gate output is the traded recall
  // (narrow − wide), computed identically in both engines.
  private val mm5b = {
    val t = 6
    Q(
      "q_mm5b_wide_recall",
      "wide-block recall contract: near-dup pairs found by 4×16-bit banding but " +
        "missed by the 2×32-bit production blocking — the documented trade, cross-engine",
      (s, d) => {
        import s.implicits._
        val fp = Tables.documents(s, d)
          .select(col("doc_id").cast(LongType)).as[Long]
          .mapPartitions { it =>
            val ph = graft.multimodal.PerceptualHash
            it.map { id =>
              val png = graft.multimodal.ImageCodec.encodePng(36, 32,
                ph.synthCellGridSpan(id / 4, id % 4))
              val raster = ph.decodePngGray(png)
                .getOrElse(sys.error(s"undecodable synthesized png for id $id"))
              val b = ph.dHashBands(raster)
              (id, b(0), b(1), b(2), b(3))
            }
          }.toDF("media_id", "b0", "b1", "b2", "b3")
        val narrow = perceptualPairs(fp, t, wideBlocks = false)
        val wide = perceptualPairs(fp, t, wideBlocks = true)
        narrow.join(wide.select(col("id_a"), col("id_b")), Seq("id_a", "id_b"), "left_anti")
          .orderBy(col("id_a"), col("id_b"))
      },
      Some(s"""
        WITH cells AS (
          SELECT d.doc_id AS media_id, cx.range AS cx, cy.range AS cy,
                 ((${Sketches.md5Long56Sql("'pc:' || CAST(d.doc_id // 4 AS VARCHAR) || ':' || CAST(cx.range AS VARCHAR) || ':' || CAST(cy.range AS VARCHAR)")}) % 241 +
                  CASE WHEN cy.range IN (0, 4) AND cx.range < d.doc_id % 4 THEN 101 ELSE 0 END) % 241 AS v
          FROM documents d, range(0, 9) cx, range(0, 8) cy),
        bits AS (
          SELECT a.media_id, (a.cy // 2) AS band, (a.cy % 2)*8 + a.cx AS loc,
                 CASE WHEN b.v > a.v THEN 1 ELSE 0 END AS bit
          FROM cells a JOIN cells b
            ON b.media_id = a.media_id AND b.cy = a.cy AND b.cx = a.cx + 1
          WHERE a.cx < 8),
        bands AS (
          SELECT media_id, band, CAST(sum(bit * (1 << loc)) AS BIGINT) AS bv
          FROM bits GROUP BY media_id, band),
        fp AS MATERIALIZED (
          SELECT media_id,
                 max(CASE WHEN band = 0 THEN bv END) AS b0,
                 max(CASE WHEN band = 1 THEN bv END) AS b1,
                 max(CASE WHEN band = 2 THEN bv END) AS b2,
                 max(CASE WHEN band = 3 THEN bv END) AS b3
          FROM bands GROUP BY media_id),
        narrow AS (
          SELECT DISTINCT a.media_id AS id_a, b.media_id AS id_b,
                 CAST(bit_count(xor(a.b0, b.b0)) + bit_count(xor(a.b1, b.b1)) +
                      bit_count(xor(a.b2, b.b2)) + bit_count(xor(a.b3, b.b3)) AS BIGINT) AS hamming
          FROM fp a JOIN fp b
            ON a.media_id < b.media_id
           AND (a.b0 = b.b0 OR a.b1 = b.b1 OR a.b2 = b.b2 OR a.b3 = b.b3)
          WHERE bit_count(xor(a.b0, b.b0)) + bit_count(xor(a.b1, b.b1)) +
                bit_count(xor(a.b2, b.b2)) + bit_count(xor(a.b3, b.b3)) <= $t),
        wide AS (
          SELECT DISTINCT a.media_id AS id_a, b.media_id AS id_b,
                 CAST(bit_count(xor(a.b0, b.b0)) + bit_count(xor(a.b1, b.b1)) +
                      bit_count(xor(a.b2, b.b2)) + bit_count(xor(a.b3, b.b3)) AS BIGINT) AS hamming
          FROM fp a JOIN fp b
            ON a.media_id < b.media_id
           AND ((a.b0 = b.b0 AND a.b1 = b.b1) OR (a.b2 = b.b2 AND a.b3 = b.b3))
          WHERE bit_count(xor(a.b0, b.b0)) + bit_count(xor(a.b1, b.b1)) +
                bit_count(xor(a.b2, b.b2)) + bit_count(xor(a.b3, b.b3)) <= $t)
        SELECT id_a, id_b, hamming FROM
          (SELECT * FROM narrow EXCEPT SELECT * FROM wide)
        ORDER BY id_a, id_b"""))
  }

  /** Perceptual near-dup pair search over a (media_id, b0..b3) dHash
    * fingerprint frame: LSH block equi-joins (never a cartesian),
    * exact Hamming on candidates only, distinct-pair reduction.
    *
    * `wideBlocks = false` (the gate config): four 16-bit blocks, one
    * per band — the classic pigeonhole (any pair with Hamming ≤ 3 is
    * GUARANTEED a candidate). `wideBlocks = true` (the ≥10⁷-image
    * production knob, SCALING.md round-9): two 32-bit blocks of
    * adjacent band pairs — accidental candidates drop from N²/2¹⁶ to
    * N²/2³² per block, at the cost of narrowing the recall guarantee
    * to pairs whose differing bits are confined to one half (which
    * both the planted class and typical localized perceptual edits
    * satisfy; PerceptualHashSpec proves recall equality on the
    * planted fixture). */
  private[graft] def perceptualPairs(fp: org.apache.spark.sql.DataFrame,
      t: Int, wideBlocks: Boolean): org.apache.spark.sql.DataFrame = {
    val blocks: Seq[Seq[Int]] =
      if (wideBlocks) Seq(Seq(0, 1), Seq(2, 3)) else Seq(Seq(0), Seq(1), Seq(2), Seq(3))
    blocks.map { group =>
      val l = fp.select(col("media_id").as("id_a"), col("b0").as("a0"),
        col("b1").as("a1"), col("b2").as("a2"), col("b3").as("a3"))
      val r = fp.select(col("media_id").as("id_b"), col("b0").as("c0"),
        col("b1").as("c1"), col("b2").as("c2"), col("b3").as("c3"))
      val cond = group.map(bi => col(s"a$bi") === col(s"c$bi")).reduce(_ && _)
      l.join(r, cond && col("id_a") < col("id_b"))
    }.reduce(_ unionByName _)
      .select(col("id_a"), col("id_b"),
        (bit_count(col("a0").bitwiseXOR(col("c0"))) +
          bit_count(col("a1").bitwiseXOR(col("c1"))) +
          bit_count(col("a2").bitwiseXOR(col("c2"))) +
          bit_count(col("a3").bitwiseXOR(col("c3")))).cast(LongType).as("hamming"))
      .filter(col("hamming") <= t)
      .distinct()
  }

  override val all: Seq[Q] = Seq(mm1, mm2, mm3, mm4, mm5, mm5b)
}
