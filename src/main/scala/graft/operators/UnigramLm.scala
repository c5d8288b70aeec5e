package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Unigram-LM (SentencePiece-style) subword tokenizer, as the
  * INTEGER-EXACT Viterbi hard-EM variant (Kudo 2018 trains with soft
  * EM over float piece probabilities; the hard-EM/Viterbi variant is
  * the standard decoding-time form and the strongest formulation that
  * can be gate-exact — floats are never hash-compared in this repo).
  * The deviation from Kudo's soft EM is MEASURED, not hand-waved:
  * UnigramSoftEmSpec runs the expected-count M-step in exact rational
  * arithmetic against this module's Viterbi counts on the real unit
  * table — top-10 piece ranks overlap 7/10 and the deviation is
  * one-sided (every hard-EM prune survivor also carries ≥-threshold
  * soft mass; hard-EM over-prunes, it never mis-keeps).
  *
  * The true Viterbi objective maximizes Σ log P(piece); the integer
  * surrogate used here scores a segmentation by the tuple
  *
  *   (piece count ASC,  Σ bitlength(freq(piece)) DESC,  seg-string ASC)
  *
  * — fewest pieces first (the dominant term of Σ log p − n·log total
  * when the corpus total is large), log-frequency tie-break at
  * floor-log2 granularity via `length(bin(freq))` (exact in both
  * engines — no ln/exp anywhere), and a final lexicographic tie-break
  * that makes the WINNING SEGMENTATION unique, not just its score.
  * The tuple order is preserved under suffix addition (piece count
  * and score are additive; the seg comparison only arbitrates between
  * equal-count prefixes at the same position, which have equal string
  * lengths), so keeping one best state per position is a correct DP.
  *
  * Segmentation units are adjacent word PAIRS with the space removed
  * — the no-whitespace-script case unigram LM exists for; on this
  * corpus it forces real multi-piece splits (whole words are seeds,
  * pairs are not).
  *
  * Hard-EM round: E-step = Viterbi-segment every unit; M-step =
  * piece usage counts (weighted by unit frequency); prune multi-char
  * pieces below the usage threshold (chars always survive —
  * feasibility), re-score by bitlength(usage), re-segment. All counts
  * stay integers, so the whole EM loop is oracle-replayable.
  *
  * Scale shape: the unit table is top-N (model-sized, like the BPE
  * word table) and the vocab re-enters as a LITERAL map (bounded
  * model, ≤ alphabet + TopPieces entries); the whole Viterbi DP is a
  * single map-side `aggregate` higher-order expression — no joins, no
  * shuffles, no iterative rounds — so the same operator tokenizes a
  * 100 TB corpus at O(len·MaxPiece) column math per row.
  */
object UnigramLm {

  /** Max piece length — bounds each DP round's lookback. */
  val MaxPiece = 5

  /** Units longer than this are excluded on BOTH sides (bounds the DP
    * round count; a contract, not an assumption about the data). */
  val MaxUnitLen = 16

  val TopUnits = 800
  val TopPieces = 120

  /** M-step prune: multi-char pieces used fewer times than this are
    * dropped from the round-2 vocabulary. */
  val PruneThreshold = 50L

  /** (unit, ucount, ulen): adjacent lowercase word pairs, space
    * removed, top-N by (count desc, unit asc). */
  def units(docs: DataFrame, textCol: String, topN: Int = TopUnits): DataFrame = {
    val toks = filter(
      split(regexp_replace(lower(col(textCol)), "[^a-z ]", " "), " "),
      t => t =!= "")
    // greatest(…, 0): a document with no [a-z ] content tokenizes to an
    // empty array, and slice with length -1 is a runtime error (the
    // DuckDB range(1, len-1) analog is safe); clamping yields an empty
    // pair array for the degenerate doc instead of failing the scan
    val pairs = zip_with(
      slice(toks, lit(1), greatest(size(toks) - 1, lit(0))),
      slice(toks, lit(2), greatest(size(toks) - 1, lit(0))),
      (a, b) => concat(a, b))
    docs.select(explode(pairs).as("unit"))
      .filter(length(col("unit")) <= MaxUnitLen)
      .groupBy(col("unit"))
      .agg(count(lit(1)).cast(LongType).as("ucount"))
      .withColumn("ulen", length(col("unit")))
      .orderBy(col("ucount").desc, col("unit").asc)
      .limit(topN)
  }

  /** Seed vocabulary: every single char, plus the top-M multi-char
    * substrings (length ≤ MaxPiece) by unit-count-weighted frequency.
    * (piece, freq, bl) where bl = bitlength(freq) — the integer
    * log2-granularity score. */
  def seedVocab(unitsDf: DataFrame, topM: Int = TopPieces): DataFrame = {
    val pieces = flatten(transform(sequence(lit(1), col("ulen")), i =>
      transform(sequence(lit(1), least(lit(MaxPiece), col("ulen") - i + lit(1))),
        l => col("unit").substr(i, l))))
    val subs = unitsDf.select(col("ucount"), explode(pieces).as("piece"))
      .groupBy(col("piece")).agg(sum(col("ucount")).as("freq"))
    val singles = subs.filter(length(col("piece")) === 1)
    val multi = subs.filter(length(col("piece")) > 1)
      .orderBy(col("freq").desc, col("piece").asc).limit(topM)
    withBitScore(singles.unionByName(multi))
  }

  private def withBitScore(v: DataFrame): DataFrame =
    v.withColumn("bl", length(bin(col("freq"))).cast(LongType))

  /** Sentinel piece count for an unreachable DP state (propagates and
    * never beats a real candidate under the struct-min order). */
  private val Inf = 1000000L

  /** Viterbi-segment every unit against `vocab` as ONE map-side
    * projection: the vocab (model-sized by construction — alphabet +
    * top-M pieces) collects into a literal map (the bounded-model
    * re-entry contract), and the whole per-unit DP runs inside an
    * `aggregate` higher-order function over positions 1..ulen, each
    * step taking the struct-min over the last MaxPiece states
    * (pieces asc, −score asc, seg asc — the documented total order).
    * No joins, no shuffles, no per-round jobs: segmentation cost is
    * O(ulen·MaxPiece) column math per row, embarrassingly parallel —
    * the shape that lets the SAME operator tokenize a 100 TB corpus
    * (apply to raw units directly; nothing here is bounded by the
    * top-N training cap except the vocab itself). Returns (unit,
    * pieces, score, seg). */
  def viterbiSegment(unitsDf: DataFrame, vocab: DataFrame): DataFrame = {
    val entries = vocab.select(col("piece"), col("bl")).collect()
    val blMap = map(entries.flatMap(r =>
      Seq(lit(r.getString(0)), lit(r.getLong(1)))).toIndexedSeq: _*)
    val unreachable = struct(lit(Inf).as("pieces"), lit(0L).as("negs"),
      lit("").as("seg"))
    val dp = aggregate(
      sequence(lit(1), col("ulen")),
      array(struct(lit(0L).as("pieces"), lit(0L).as("negs"), lit("").as("seg"))),
      (acc, j) => concat(acc, array(array_min(transform(
        sequence(greatest(j - lit(MaxPiece), lit(0)), j - lit(1)),
        i => {
          val st = element_at(acc, (i + lit(1)).cast("int"))
          val piece = col("unit").substr(i + lit(1), j - i)
          val b = element_at(blMap, piece)
          when(b.isNull || st.getField("pieces") >= Inf, unreachable)
            .otherwise(struct(
              (st.getField("pieces") + lit(1L)).as("pieces"),
              (st.getField("negs") - b).as("negs"),
              when(st.getField("seg") === "", piece)
                .otherwise(concat(st.getField("seg"), lit("|"), piece)).as("seg")))
        })))),
      acc => element_at(acc, lit(-1)))
    unitsDf
      .select(col("unit"), dp.as("d"))
      .filter(col("d.pieces") < Inf)
      .select(col("unit"), col("d.pieces").as("pieces"),
        (-col("d.negs")).as("score"), col("d.seg").as("seg"))
  }

  /** M-step: usage count per piece over the segmentations, weighted
    * by unit frequency. */
  def pieceUsage(segs: DataFrame, unitsDf: DataFrame): DataFrame =
    segs.join(unitsDf.select(col("unit"), col("ucount")), Seq("unit"))
      .select(explode(split(col("seg"), "\\|")).as("piece"), col("ucount"))
      .groupBy(col("piece")).agg(sum(col("ucount")).as("used"))

  /** Prune + re-score: multi-char pieces below the usage threshold
    * drop out; chars always survive (segmentation feasibility, as in
    * SentencePiece); surviving pieces are re-scored by
    * bitlength(max(used, 1)). */
  def pruneVocab(vocab: DataFrame, usage: DataFrame,
      threshold: Long = PruneThreshold): DataFrame =
    withBitScore(vocab.select(col("piece"))
      .join(usage, Seq("piece"), "left")
      .withColumn("used", coalesce(col("used"), lit(0L)))
      .filter(length(col("piece")) === 1 || col("used") >= threshold)
      .select(col("piece"), greatest(col("used"), lit(1L)).as("freq")))

  /** The trained (post-EM-prune) vocabulary as a persisted TrainOnce
    * artifact keyed by the source dir's content fingerprint — fresh
    * JVMs, bench forks and downstream pipeline stages READ the KB-size
    * table instead of retraining (the artifact-tier discipline the LM
    * / k-means / quality models follow). */
  def trainedVocab(spark: org.apache.spark.sql.SparkSession, docs: DataFrame,
      srcDir: String): DataFrame =
    graft.core.TrainOnce.cachedOnDisk(spark,
      s"unigram-vocab|$MaxPiece|$MaxUnitLen|$TopUnits|$TopPieces|$PruneThreshold",
      srcDir,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("piece", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("freq", LongType),
        org.apache.spark.sql.types.StructField("bl", LongType)))) {
      val u = units(docs, "text")
      val v = seedVocab(u)
      pruneVocab(v, pieceUsage(viterbiSegment(u, v), u))
    }

  // ---------------- DuckDB oracle ----------------

  /** CTEs `units`, `subs`, `vocab` — the seed phase. */
  def seedSqlCtes: String = s"""
    units AS MATERIALIZED (
      SELECT unit, CAST(count(*) AS BIGINT) AS ucount, length(unit) AS ulen
      FROM (
        SELECT w[i] || w[i+1] AS unit
        FROM (SELECT list_filter(string_split(regexp_replace(lower(text), '[^a-z ]', ' ', 'g'), ' '), x -> x <> '') AS w
              FROM documents),
             LATERAL (SELECT unnest(range(1, len(w))) AS i) pos)
      WHERE length(unit) <= $MaxUnitLen
      GROUP BY unit ORDER BY ucount DESC, unit ASC LIMIT $TopUnits),
    subs AS MATERIALIZED (
      SELECT piece, CAST(sum(ucount) AS BIGINT) AS freq
      FROM (
        SELECT u.ucount, substring(u.unit, i, l) AS piece
        FROM units u,
             LATERAL (SELECT unnest(range(1, u.ulen + 1)) AS i) pos,
             LATERAL (SELECT unnest(range(1, ${MaxPiece + 1})) AS l) ln
        WHERE i + l - 1 <= u.ulen)
      GROUP BY piece),
    vocab AS MATERIALIZED (
      SELECT piece, freq, CAST(length(bin(freq)) AS BIGINT) AS bl FROM (
        SELECT piece, freq FROM subs WHERE length(piece) = 1
        UNION ALL
        SELECT piece, freq FROM (
          SELECT piece, freq FROM subs WHERE length(piece) > 1
          ORDER BY freq DESC, piece ASC LIMIT $TopPieces)))"""

  /** The unrolled DP over `vocabCte`, with round CTEs named
    * `<p>0..<p>$MaxUnitLen` and a final `<p>fin` (unit, pieces, score,
    * seg). Mirrors [[viterbiSegment]] exactly (row_number rn=1 ==
    * struct-min under the same total order). */
  def viterbiSqlCtes(p: String, vocabCte: String): String = {
    val rounds = (1 to MaxUnitLen).map { j =>
      val prev = (math.max(0, j - MaxPiece) until j)
        .map(i => s"SELECT *, $i AS pos FROM $p$i").mkString(" UNION ALL ")
      s"""$p$j AS MATERIALIZED (
         |  SELECT unit, ulen, pieces, score, seg FROM (
         |    SELECT s.unit, s.ulen, s.pieces + 1 AS pieces, s.score + v.bl AS score,
         |           CASE WHEN s.seg = '' THEN v.piece ELSE s.seg || '|' || v.piece END AS seg,
         |           row_number() OVER (PARTITION BY s.unit
         |             ORDER BY s.pieces + 1 ASC, s.score + v.bl DESC,
         |                      CASE WHEN s.seg = '' THEN v.piece ELSE s.seg || '|' || v.piece END ASC) AS rn
         |    FROM ($prev) s
         |    JOIN $vocabCte v ON v.piece = substring(s.unit, s.pos + 1, $j - s.pos)
         |    WHERE s.ulen >= $j)
         |  WHERE rn = 1)""".stripMargin
    }
    val init = s"""${p}0 AS MATERIALIZED (
                  |  SELECT unit, ulen, CAST(0 AS BIGINT) AS pieces,
                  |         CAST(0 AS BIGINT) AS score, '' AS seg FROM units)""".stripMargin
    val fin = s"""${p}fin AS MATERIALIZED (
                 |  SELECT unit, pieces, score, seg FROM (
                 |    ${(1 to MaxUnitLen).map(j => s"SELECT * FROM $p$j WHERE ulen = $j").mkString(" UNION ALL ")}))""".stripMargin
    (init +: rounds :+ fin).mkString(",\n")
  }

  /** CTEs for the hard-EM round: usage, pruned vocab. Expects `dfin`
    * + `units` + `vocab` in scope. */
  def emSqlCtes: String = s"""
    usage AS MATERIALIZED (
      SELECT piece, CAST(sum(ucount) AS BIGINT) AS used
      FROM (
        SELECT unnest(string_split(f.seg, '|')) AS piece, u.ucount
        FROM dfin f JOIN units u ON u.unit = f.unit)
      GROUP BY piece),
    vocab2 AS MATERIALIZED (
      SELECT v.piece,
             CAST(length(bin(greatest(coalesce(g.used, 0), 1))) AS BIGINT) AS bl
      FROM vocab v LEFT JOIN usage g ON g.piece = v.piece
      WHERE length(v.piece) = 1 OR coalesce(g.used, 0) >= $PruneThreshold)"""
}

/** Gates: round-1 Viterbi segmentation and the full hard-EM round,
  * both replayed exactly by DuckDB from the same integer objective. */
object UnigramLmQueries extends graft.QueryModule {
  import graft.{Q, Tables}

  private val ul1 = Q(
    "q_ul1_unigram_viterbi",
    "unigram-LM (SentencePiece-style) Viterbi segmentation, integer surrogate objective",
    (s, d) => {
      val u = UnigramLm.units(Tables.documents(s, d), "text")
      UnigramLm.viterbiSegment(u, UnigramLm.seedVocab(u))
        .orderBy(col("unit"))
    },
    Some(s"""
      WITH ${UnigramLm.seedSqlCtes},
      ${UnigramLm.viterbiSqlCtes("d", "vocab")}
      SELECT unit, pieces, score, seg FROM dfin ORDER BY unit"""))

  private val ul2 = Q(
    "q_ul2_unigram_em_round",
    "unigram-LM hard-EM round: usage M-step, prune, re-scored Viterbi re-segmentation",
    (s, d) => {
      val u = UnigramLm.units(Tables.documents(s, d), "text")
      val v = UnigramLm.seedVocab(u)
      val seg1 = UnigramLm.viterbiSegment(u, v)
      val v2 = UnigramLm.pruneVocab(v, UnigramLm.pieceUsage(seg1, u))
      UnigramLm.viterbiSegment(u, v2).orderBy(col("unit"))
    },
    Some(s"""
      WITH ${UnigramLm.seedSqlCtes},
      ${UnigramLm.viterbiSqlCtes("d", "vocab")},
      ${UnigramLm.emSqlCtes},
      ${UnigramLm.viterbiSqlCtes("e", "vocab2")}
      SELECT unit, pieces, score, seg FROM efin ORDER BY unit"""))

  override val all: Seq[Q] = Seq(ul1, ul2)
}
