package graft.operators

import graft.{Q, QueryModule, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Greedy longest-match-first ("MaxMatch") segmentation — the
  * INFERENCE-time tokenizer family member beside BPE's merge-order
  * application: WordPiece tokenization applies exactly this rule over
  * its vocabulary (Devlin et al. 2019 §(WordPiece); Song et al. 2021
  * study its linear-time variants). Given a piece vocabulary, each
  * word is consumed left to right, always taking the LONGEST
  * vocabulary piece that prefixes the remaining suffix.
  *
  * Scale shape (the [[Bpe]] discipline): segmentation runs on the
  * DISTINCT-WORD table — vocab-sized under Zipf, never O(corpus) —
  * and the piece vocabulary broadcasts into every round. The greedy
  * loop is inherently sequential PER WORD but embarrassingly parallel
  * ACROSS words: each round consumes one piece from every unfinished
  * word (explode ≤ Lmax candidate prefixes → broadcast-join the piece
  * set → per-word argmax), so the round count is bounded by the
  * longest word, and every frame in flight is vocab-sized. Corpus
  * application is then the bpe3 move: broadcast the word→pieces map
  * and scan the corpus once.
  *
  * The gate's vocabulary is the corpus's own top-`topK` words plus
  * every single character that occurs (so the greedy step can never
  * fail — a char piece always matches; real WordPiece vocabularies
  * satisfy the same property via byte/char fallback pieces, which is
  * why [UNK] handling stays out of this operator).
  */
object MaxMatch {

  /** Piece vocabulary: the `topK` most frequent words (ties to the
    * lexicographically smaller) plus every distinct character. */
  def pieces(words: DataFrame, topK: Int): DataFrame =
    words.orderBy(col("freq").desc, col("word").asc).limit(topK)
      .select(col("word").as("piece"))
      // the Bpe.charTokens per-character idiom
      .unionAll(words.select(explode(split(col("word"), "")).as("piece")))
      .distinct()

  /** Greedy segmentation of every word in `words` (one row per
    * DISTINCT word — the [[Bpe.wordFrequencies]] shape; duplicate
    * word rows would trip the coverage check) against `piecesDf`:
    * (word, pos, piece) rows, pos 0-based in emission order. Fails
    * loudly if a remainder cannot be consumed (piece set must contain
    * every character — see [[pieces]]). */
  def segment(words: DataFrame, piecesDf: DataFrame): DataFrame = {
    if (words.isEmpty)
      return words.select(col("word"), lit(0L).as("pos"),
        col("word").as("piece"))
    val pcs = piecesDf.localCheckpoint()
    require(!pcs.isEmpty,
      "MaxMatch: empty piece set — the piece set must cover every character")
    val lmax = pcs.agg(max(length(col("piece")))).head().getInt(0)
    val maxRounds =
      words.agg(max(length(col("word")))).head().getInt(0).max(1)
    var state = words.select(col("word"), col("word").as("rem"),
      lit(0L).as("pos")).localCheckpoint()
    val emitted = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    var round = 0
    var pending = state.count()
    while (round < maxRounds && pending > 0) {
      // candidate prefixes of every length up to Lmax, kept only when
      // they are vocabulary pieces; the best match per word is the
      // longest (greedy), recovered as substring(rem, 1, max l)
      val best = state
        .withColumn("l", explode(expr(s"sequence(1, least($lmax, length(rem)))")))
        .withColumn("piece", expr("substring(rem, 1, l)"))
        .join(broadcast(pcs), Seq("piece"))
        .groupBy(col("word"), col("rem"), col("pos"))
        .agg(max(col("l")).as("bl"))
        .localCheckpoint()
      // a remainder with NO matching piece drops out of the inner join
      // silently — its word would simply lose its tail; fail loudly
      // instead (the pieces() vocabulary makes this impossible, but a
      // caller-supplied piece set might not cover the alphabet)
      require(best.count() == pending,
        "MaxMatch: unconsumed remainders — the piece set must cover every character")
      emitted += best.select(col("word"), col("pos"),
        expr("substring(rem, 1, bl)").as("piece"))
      state = best.select(col("word"),
          expr("substring(rem, bl + 1)").as("rem"),
          (col("pos") + 1).as("pos"))
        .filter(col("rem") =!= "")
        .localCheckpoint()
      pending = state.count()
      round += 1
    }
    require(pending == 0,
      "MaxMatch: round budget exhausted before every word was consumed")
    emitted.reduce(_ unionAll _)
  }

  /** (word, n_pieces, pieces-joined-by-'|') summary of [[segment]]. */
  def segmentation(words: DataFrame, piecesDf: DataFrame): DataFrame =
    segment(words, piecesDf)
      .groupBy(col("word"))
      .agg(count(lit(1)).as("n_pieces"),
        array_join(sort_array(collect_list(struct(col("pos"), col("piece"))))
          .getField("piece"), "|").as("pieces"))
}

/** MaxMatch gate. q_bpe6: every distinct corpus word greedily
  * segmented against (top-64 words ∪ chars); the oracle replays the
  * greedy rule with a recursive CTE whose step picks
  * substring(rem, 1, max matching length). */
object MaxMatchQueries extends QueryModule {

  private val TopK = 64

  private val bpe6 = Q(
    "q_bpe6_maxmatch",
    s"greedy longest-match (WordPiece-style) segmentation: top-$TopK-word + char vocabulary",
    (s, d) => {
      val words = Bpe.wordFrequencies(Tables.documents(s, d), "text")
        .localCheckpoint() // three consumers: top-K, chars, segmentation
      MaxMatch.segmentation(words, MaxMatch.pieces(words, TopK))
        .orderBy(col("word"))
    },
    Some(s"""
      WITH ${Bpe.wordsSqlCte()},
      top_words AS (
        SELECT word AS piece FROM words ORDER BY freq DESC, word LIMIT $TopK),
      chars AS (
        SELECT DISTINCT substring(word, i, 1) AS piece
        FROM (SELECT word, unnest(range(1, length(word) + 1)) AS i FROM words)),
      -- NOT "AS MATERIALIZED": DuckDB 1.0 silently evaluates the
      -- recursive step's correlated subquery against a MATERIALIZED
      -- outer CTE as NULL (no match ever), emptying the segmentation
      pieces AS (
        SELECT piece FROM top_words UNION SELECT piece FROM chars),
      seg AS (
        WITH RECURSIVE s(word, rem, pos, piece) AS (
          SELECT word, word, -1, CAST(NULL AS VARCHAR) FROM words
          UNION ALL
          SELECT s.word, substring(s.rem, bl + 1), s.pos + 1, substring(s.rem, 1, bl)
          FROM (SELECT s.*, (SELECT max(length(p.piece)) FROM pieces p
                             WHERE p.piece = substring(s.rem, 1, length(p.piece))) AS bl
                FROM s WHERE s.rem <> '') s)
        SELECT word, pos, piece FROM s WHERE piece IS NOT NULL)
      SELECT word, CAST(count(*) AS BIGINT) AS n_pieces,
             string_agg(piece, '|' ORDER BY pos) AS pieces
      FROM seg GROUP BY word ORDER BY word"""))

  override val all: Seq[Q] = Seq(bpe6)
}
