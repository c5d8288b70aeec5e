package graft.operators

import graft.{Q, QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Distributed byte-pair-encoding vocabulary training (Sennrich et al.
  * 2016, "Neural Machine Translation of Rare Words with Subword Units",
  * arXiv:1508.07909) — the tokenizer-learning step of a training-data
  * pipeline. Classic BPE is a sequential loop: count adjacent symbol
  * pairs over the word-frequency table, merge the most frequent pair
  * everywhere, repeat. This operator keeps that loop but makes every
  * round fully relational:
  *
  *   - pair counting is a lead()-window + two-phase groupBy over the
  *     token table (map-side combinable — the Zipf head never lands on
  *     one task);
  *   - the winning pair (count desc, pair asc — deterministic) is a
  *     single collected row (the KMeans-centroid move: only KBs ever
  *     reach the driver);
  *   - greedy left-to-right merge application — the part that looks
  *     inherently sequential — is expressed as a RUN-PARITY window:
  *     within every maximal run of consecutive match positions, exactly
  *     the 1st, 3rd, 5th … matches merge. That is precisely what the
  *     sequential scan (merge, skip consumed symbol, continue) does, so
  *     the relational form is bit-equal to the textbook algorithm
  *     (BpeSpec pins this against a sequential fold reference).
  *
  * Scale shape: the corpus is touched ONCE (whitespace tokenize +
  * groupBy word). Every training round runs over the word-frequency
  * token table — vocabulary-sized, orders of magnitude smaller than a
  * 100 TB corpus and independent of corpus growth once the vocabulary
  * saturates. Rounds localCheckpoint the (small) token table so K
  * rounds never stack K windows into one Catalyst plan.
  *
  * The whole procedure — pair counts, argmax, run-parity application —
  * unrolls into the DuckDB oracle as a CTE chain ([[trainSqlCtes]]), so
  * the q_bpe1/q_bpe2 gates verify the TRAINING round by round, not just
  * a final artifact (the q_ann7 pattern).
  */
object Bpe {

  /** One learned merge: at `step`, (left, right) was the most frequent
    * adjacent pair with `pair_count` weighted occurrences. */
  final case class BpeMerge(step: Long, pair_left: String, pair_right: String,
      pair_count: Long)

  /** Corpus → (word, freq): the single corpus-wide pass. Whitespace
    * tokens, exact counts (two-phase groupBy). */
  def wordFrequencies(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(filter(split(col(textCol), " "), t => t =!= "")).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))

  /** (word, freq) → initial token table (word, freq, pos, tok): one
    * single-character token per position, 1-based. */
  def charTokens(words: DataFrame): DataFrame =
    words.select(col("word"), col("freq"),
        posexplode(split(col("word"), "")).as(Seq("__p", "tok")))
      .select(col("word"), col("freq"),
        (col("__p") + 1).cast(LongType).as("pos"), col("tok"))

  private val byWord = Window.partitionBy(col("word")).orderBy(col("pos"))

  /** Most frequent adjacent pair of the current token table, ties to
    * the lexicographically smallest (left, right); None when no
    * adjacent pairs remain. */
  private def bestPair(toks: DataFrame): Option[BpeMerge] = {
    val paired = toks.withColumn("__nxt", lead(col("tok"), 1).over(byWord))
    paired.filter(col("__nxt").isNotNull)
      .select(col("tok").as("l"), col("__nxt").as("r"), col("freq"))
      .groupBy(col("l"), col("r")).agg(sum(col("freq")).as("cnt"))
      .orderBy(col("cnt").desc, col("l").asc, col("r").asc)
      .limit(1).collect().headOption
      .map(row => BpeMerge(0L, row.getString(0), row.getString(1), row.getLong(2)))
  }

  /** Greedy application of one merge to the token table — the
    * run-parity form of the sequential left-to-right scan. */
  private[operators] def applyMerge(toks: DataFrame, l: String, r: String): DataFrame = {
    val paired = toks.withColumn("__nxt", lead(col("tok"), 1).over(byWord))
    val matches = paired
      .filter(col("tok") === lit(l) && col("__nxt") === lit(r))
      .select(col("word"), col("pos"))
    // run-parity: group consecutive match positions (pos - row_number
    // is constant within a run), keep odd ranks — exactly the matches
    // the sequential scan merges
    val chosen = matches
      .withColumn("__grp", col("pos") - row_number().over(byWord))
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("word"), col("__grp")).orderBy(col("pos"))))
      .filter(col("__rn") % 2 === 1)
      .select(col("word"), col("pos"))
    val merged = chosen.select(col("word"), col("pos"), lit(true).as("__m"))
    val dropped = chosen.select(col("word"), (col("pos") + 1).as("pos"), lit(true).as("__d"))
    toks.join(merged, Seq("word", "pos"), "left")
      .join(dropped, Seq("word", "pos"), "left")
      .filter(col("__d").isNull)
      .select(col("word"), col("freq"), col("pos").as("__opos"),
        when(col("__m"), concat(col("tok"), lit(r))).otherwise(col("tok")).as("tok"))
      .withColumn("pos", row_number().over(
        Window.partitionBy(col("word")).orderBy(col("__opos"))).cast(LongType))
      .select(col("word"), col("freq"), col("pos"), col("tok"))
  }

  /** Train `nMerges` BPE merges over the word-frequency table. Returns
    * the learned merge list (ordered) and the final token table
    * (word, freq, pos, tok). Stops early if no adjacent pair remains. */
  def train(words: DataFrame, nMerges: Int): (Seq[BpeMerge], DataFrame) = {
    require(nMerges > 0, "need at least one merge")
    var toks = charTokens(words).localCheckpoint()
    val merges = Seq.newBuilder[BpeMerge]
    var step = 1
    var exhausted = false
    while (step <= nMerges && !exhausted) {
      bestPair(toks) match {
        case Some(m) =>
          merges += m.copy(step = step.toLong)
          toks = applyMerge(toks, m.pair_left, m.pair_right).localCheckpoint()
          step += 1
        case None => exhausted = true
      }
    }
    (merges.result(), toks)
  }

  /** Segment NEW words with an already-learned merge list (tokenizer
    * application): the same greedy run-parity rounds, one per merge, in
    * merge order. */
  def segment(words: DataFrame, merges: Seq[BpeMerge]): DataFrame =
    merges.foldLeft(charTokens(words).localCheckpoint()) { (t, m) =>
      applyMerge(t, m.pair_left, m.pair_right).localCheckpoint()
    }

  /** Final token table → (word, freq, toks) with toks '|'-joined in
    * position order — the gate/report shape. */
  def segmentation(toks: DataFrame): DataFrame =
    toks.groupBy(col("word"), col("freq"))
      .agg(array_join(transform(array_sort(collect_list(struct(col("pos"), col("tok")))),
        x => x.getField("tok")), "|").as("toks"))

  // ---- persisted tokenizer artifact ------------------------------------

  /** Persist a learned merge list — the IvfIndex move (train → write →
    * apply): tokenizers are ARTIFACTS, not per-query computations. The
    * merge list is vocabulary-bounded (KBs), so one file. */
  def writeMerges(spark: SparkSession, merges: Seq[BpeMerge], path: String): Unit = {
    import spark.implicits._
    merges.toDS().coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Load a persisted merge list, in training order. Bounded by the
    * merge count, so collecting to the driver is the right shape —
    * the merges then drive [[segment]] / broadcast joins. */
  def readMerges(spark: SparkSession, path: String): Seq[BpeMerge] = {
    import spark.implicits._
    spark.read.parquet(path).as[BpeMerge].collect().sortBy(_.step).toSeq
  }

  /** Persist the trained vocabulary segmentation (word, freq, pos,
    * tok) — the second half of the artifact: corpus tokenization only
    * needs the per-word subword table, and reading it back replaces
    * re-running the merge rounds entirely. */
  def writeVocabToks(toks: DataFrame, path: String): Unit =
    toks.write.mode("overwrite").parquet(path)

  // ---- oracle (DuckDB) twins -------------------------------------------

  /** words CTE over `documents`: (word, freq). */
  def wordsSqlCte(name: String = "words"): String =
    s"""$name AS MATERIALIZED (
       |  SELECT w AS word, count(*) AS freq
       |  FROM (SELECT unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS w
       |        FROM documents)
       |  GROUP BY w)""".stripMargin

  /** The full training chain as CTEs: toks0 (char split) then, per
    * round k, pair counting (pairs_k/pc_k), the argmax (best_k), match
    * positions (m_k), run-parity selection (chosen_k) and the rebuilt
    * token table (toks_k) — a bit-exact replay of [[train]].
    *
    * Multiply-referenced CTEs are AS MATERIALIZED: each round
    * references the previous one several times, and default inlining
    * re-evaluates the whole prefix per reference — exponential in the
    * round count (measured: minutes at 6 rounds vs 0.6 s materialized).
    *
    * best_k joins into toks_k as `LEFT JOIN ... ON true`, NOT a cross
    * join: when the vocabulary fully merges before round k, best_k is
    * EMPTY and a cross join would wipe the token table — the left join
    * passes toks through unchanged, mirroring [[train]]'s early stop
    * (both sides then also emit fewer than nMerges merge rows). */
  def trainSqlCtes(wordsCte: String, nMerges: Int): String = {
    def round(k: Int): String = {
      val p = k - 1
      s"""pairs$k AS MATERIALIZED (
         |  SELECT word, freq, pos, tok, lead(tok) OVER (PARTITION BY word ORDER BY pos) AS nxt
         |  FROM toks$p),
         |pc$k AS (
         |  SELECT tok AS l, nxt AS r, sum(freq) AS cnt
         |  FROM pairs$k WHERE nxt IS NOT NULL GROUP BY 1, 2),
         |best$k AS MATERIALIZED (
         |  SELECT l, r, cnt FROM pc$k ORDER BY cnt DESC, l ASC, r ASC LIMIT 1),
         |m$k AS (
         |  SELECT p.word, p.pos FROM pairs$k p, best$k b
         |  WHERE p.tok = b.l AND p.nxt = b.r),
         |chosen$k AS MATERIALIZED (
         |  SELECT word, pos FROM (
         |    SELECT word, pos, row_number() OVER (PARTITION BY word, grp ORDER BY pos) AS rn
         |    FROM (SELECT word, pos,
         |                 pos - row_number() OVER (PARTITION BY word ORDER BY pos) AS grp
         |          FROM m$k))
         |  WHERE rn % 2 = 1),
         |toks$k AS MATERIALIZED (
         |  SELECT word, freq, row_number() OVER (PARTITION BY word ORDER BY pos) AS pos, tok
         |  FROM (
         |    SELECT t.word, t.freq, t.pos,
         |           CASE WHEN c1.pos IS NOT NULL THEN t.tok || b.r ELSE t.tok END AS tok,
         |           c2.pos AS dropped
         |    FROM toks$p t
         |    LEFT JOIN best$k b ON true
         |    LEFT JOIN chosen$k c1 ON c1.word = t.word AND c1.pos = t.pos
         |    LEFT JOIN chosen$k c2 ON c2.word = t.word AND c2.pos = t.pos - 1)
         |  WHERE dropped IS NULL)""".stripMargin
    }
    s"""toks0 AS MATERIALIZED (
       |  SELECT word, freq, i AS pos, substring(word, CAST(i AS INT), 1) AS tok
       |  FROM $wordsCte, unnest(range(1, len(word) + 1)) AS t(i)),
       |${(1 to nMerges).map(round).mkString(",\n")}""".stripMargin
  }

  /** Final select over the chain: the learned merge table. */
  def mergesSelectSql(nMerges: Int): String =
    s"""SELECT * FROM (
       |  ${(1 to nMerges).map(k =>
            s"SELECT CAST($k AS BIGINT) AS step, l AS pair_left, r AS pair_right, " +
            s"CAST(cnt AS BIGINT) AS pair_count FROM best$k").mkString("\n  UNION ALL ")}
       |) ORDER BY step""".stripMargin
}

/** BPE gates: q_bpe1 verifies the learned merges (the training), q_bpe2
  * the resulting segmentation of every vocabulary word (the
  * application) — both against a full round-by-round oracle replay. */
object BpeQueries extends QueryModule {

  private[operators] val NMerges = 6

  // Persisted tokenizer artifact, per sf dir (the TrainOnce disk
  // tier): the gates share ONE training run whose outputs (merge list
  // + vocabulary segmentation) live as parquet under the shared
  // artifact root, keyed by the source dir's content fingerprint — a
  // fresh JVM (bench fork, later production run) READS the tokenizer
  // instead of retraining, which is the production shape (a tokenizer
  // is trained once and shipped). Regenerating the dataset in place
  // changes the fingerprint and retrains; distinct sf dirs and spec
  // fixtures never collide (the dir is part of the key).
  private def artifact(s: SparkSession, d: String): (String, String) = {
    val key = s"bpe:$NMerges:$d@${graft.core.TrainOnce.sourceFingerprint(s, d)}"
    val base = graft.core.TrainOnce.artifactDir(key) { tmp =>
      val (merges, toks) =
        Bpe.train(Bpe.wordFrequencies(Tables.documents(s, d), "text"), NMerges)
      Bpe.writeMerges(s, merges, s"$tmp/merges")
      Bpe.writeVocabToks(toks, s"$tmp/toks")
    }
    (s"$base/merges", s"$base/toks")
  }

  private def mergesOf(s: SparkSession, d: String): Seq[Bpe.BpeMerge] =
    Bpe.readMerges(s, artifact(s, d)._1)

  private def vocabToksOf(s: SparkSession, d: String): DataFrame =
    s.read.parquet(artifact(s, d)._2)

  private val bpe1 = Q(
    "q_bpe1_merges",
    s"distributed BPE training: $NMerges greedy pair merges over the word-frequency table",
    (s, d) => {
      import s.implicits._
      mergesOf(s, d).toDF().orderBy(col("step"))
    },
    Some(s"""
      WITH ${Bpe.wordsSqlCte()},
      ${Bpe.trainSqlCtes("words", NMerges)}
      ${Bpe.mergesSelectSql(NMerges)}"""))

  private val bpe2 = Q(
    "q_bpe2_segment",
    s"BPE segmentation: every vocabulary word tokenized with the $NMerges learned merges",
    (s, d) => Bpe.segmentation(vocabToksOf(s, d)).orderBy(col("word")),
    Some(s"""
      WITH ${Bpe.wordsSqlCte()},
      ${Bpe.trainSqlCtes("words", NMerges)}
      SELECT word, freq, array_to_string(list(tok ORDER BY pos), '|') AS toks
      FROM toks$NMerges GROUP BY word, freq ORDER BY word"""))

  // Corpus tokenization with the learned merges — the operator a
  // training pipeline actually runs after BPE training: the vocabulary
  // segmentation (word → subword count) is corpus-vocab-sized and
  // BROADCASTS; the corpus is one scan + word explode + broadcast join
  // + groupBy. The corpus text is never re-segmented per occurrence —
  // each distinct word is segmented once, in the (small) vocab table.
  private val bpe3 = Q(
    "q_bpe3_corpus_tokens",
    "corpus tokenization with learned BPE: per-doc subword counts via broadcast vocab map",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val vocab = vocabToksOf(s, d).groupBy(col("word")).agg(count(lit(1)).as("n_sub"))
      docs.select(col("doc_id"),
          explode(filter(split(col("text"), " "), t => t =!= "")).as("word"))
        .join(broadcast(vocab), Seq("word"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_words"), sum(col("n_sub")).as("n_bpe_tokens"))
        .orderBy(col("doc_id"))
    },
    Some(s"""
      WITH ${Bpe.wordsSqlCte()},
      ${Bpe.trainSqlCtes("words", NMerges)},
      vocab AS (SELECT word, count(*) AS n_sub FROM toks$NMerges GROUP BY word),
      occ AS (
        SELECT doc_id, unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS word
        FROM documents)
      SELECT o.doc_id, count(*) AS n_words,
             CAST(sum(v.n_sub) AS BIGINT) AS n_bpe_tokens
      FROM occ o JOIN vocab v USING (word)
      GROUP BY o.doc_id ORDER BY o.doc_id"""))

  // Tokenizer-coverage report (the OOV-rate twin of bpe3): per doc,
  // how many subword tokens are LEARNED merges (multi-char) vs
  // single-char fallbacks. A high fallback share marks text the
  // tokenizer compresses badly (foreign scripts, noise, code) — the
  // standard signal for re-training or filtering. Same plan as bpe3:
  // the per-word (n_single, n_multi) vocab table broadcasts.
  private val bpe4 = Q(
    "q_bpe4_oov_coverage",
    "tokenizer coverage: per-doc single-char-fallback vs merged subword counts",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val vocab = vocabToksOf(s, d).groupBy(col("word")).agg(
        sum(when(length(col("tok")) === 1, 1L).otherwise(0L)).as("n1"),
        sum(when(length(col("tok")) > 1, 1L).otherwise(0L)).as("nm"))
      docs.select(col("doc_id"),
          explode(filter(split(col("text"), " "), t => t =!= "")).as("word"))
        .join(broadcast(vocab), Seq("word"))
        .groupBy(col("doc_id"))
        .agg(sum(col("n1")).as("n_fallback"), sum(col("nm")).as("n_merged"))
        .orderBy(col("doc_id"))
    },
    Some(s"""
      WITH ${Bpe.wordsSqlCte()},
      ${Bpe.trainSqlCtes("words", NMerges)},
      vocab AS (
        SELECT word,
               sum(CASE WHEN length(tok) = 1 THEN 1 ELSE 0 END) AS n1,
               sum(CASE WHEN length(tok) > 1 THEN 1 ELSE 0 END) AS nm
        FROM toks$NMerges GROUP BY word),
      occ AS (
        SELECT doc_id, unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS word
        FROM documents)
      SELECT o.doc_id, CAST(sum(v.n1) AS BIGINT) AS n_fallback,
             CAST(sum(v.nm) AS BIGINT) AS n_merged
      FROM occ o JOIN vocab v USING (word)
      GROUP BY o.doc_id ORDER BY o.doc_id"""))

  // Tokenizer fertility report — the per-language health metric
  // tokenizer papers track (tokens/word "fertility" and chars/token
  // compression; e.g. the XLM-R and NLLB tokenizer analyses): a
  // language whose fertility is far above the corpus mean is being
  // shredded into fallback pieces and will dominate sequence length.
  // Same scale shape as bpe3 (broadcast vocab, one corpus scan), one
  // more groupBy key; ratios are integer-scaled (×1000 floor) so the
  // gate is exact.
  private val bpe5 = Q(
    "q_bpe5_fertility",
    "tokenizer fertility by language: BPE tokens/word and chars/token (x1000) from the persisted artifact",
    (s, d) => {
      import org.apache.spark.sql.types.LongType
      val docs = Tables.documents(s, d)
      val vocab = vocabToksOf(s, d).groupBy(col("word")).agg(count(lit(1)).as("n_sub"))
      docs.select(col("lang"),
          explode(filter(split(col("text"), " "), t => t =!= "")).as("word"))
        .join(broadcast(vocab), Seq("word"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_words"),
          sum(col("n_sub")).as("n_bpe_tokens"),
          sum(length(col("word")).cast(LongType)).as("n_chars"))
        .withColumn("fertility_x1000", expr("(1000 * n_bpe_tokens) div n_words"))
        .withColumn("chars_per_tok_x1000", expr("(1000 * n_chars) div n_bpe_tokens"))
        .orderBy(col("lang"))
    },
    Some(s"""
      WITH ${Bpe.wordsSqlCte()},
      ${Bpe.trainSqlCtes("words", NMerges)},
      vocab AS (SELECT word, count(*) AS n_sub FROM toks$NMerges GROUP BY word),
      occ AS (
        SELECT lang, unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS word
        FROM documents),
      agg AS (
        SELECT o.lang, CAST(count(*) AS BIGINT) AS n_words,
               CAST(sum(v.n_sub) AS BIGINT) AS n_bpe_tokens,
               CAST(sum(length(o.word)) AS BIGINT) AS n_chars
        FROM occ o JOIN vocab v USING (word) GROUP BY o.lang)
      SELECT lang, n_words, n_bpe_tokens, n_chars,
             CAST((1000 * n_bpe_tokens) // n_words AS BIGINT) AS fertility_x1000,
             CAST((1000 * n_chars) // n_bpe_tokens AS BIGINT) AS chars_per_tok_x1000
      FROM agg ORDER BY lang"""))

  // Vocabulary coverage curve — "how big must the vocab be": corpus
  // token coverage as a function of piece rank. The persisted artifact
  // is self-sufficient (each (word, pos, tok) row carries the word's
  // corpus frequency), so piece mass = one vocab-sized groupBy and the
  // curve is a window over the ≤|pieces| frequency table — bounded by
  // construction, so the unpartitioned window is a few-hundred-row
  // seam, not a corpus scan.
  private val bpe7 = {
    import org.apache.spark.sql.expressions.Window
    Q(
      "q_bpe7_vocab_coverage",
      "cumulative corpus coverage by BPE piece rank (the vocab-budget curve), from the artifact",
      (s, d) => {
        val pc = vocabToksOf(s, d).groupBy(col("tok"))
          .agg(sum(col("freq")).as("c"))
        val w = Window.orderBy(col("c").desc, col("tok").asc)
        pc.withColumn("rk", row_number().over(w).cast(org.apache.spark.sql.types.LongType))
          .withColumn("__cum", sum(col("c")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .crossJoin(broadcast(pc.agg(sum(col("c")).as("__n"))))
          .select(col("rk"), col("tok"), col("c"),
            expr("(1000000 * __cum) div __n").as("cum_cov_ppm"))
          .orderBy(col("rk"))
      },
      Some(s"""
        WITH ${Bpe.wordsSqlCte()},
        ${Bpe.trainSqlCtes("words", NMerges)},
        pc AS (SELECT tok, CAST(sum(freq) AS BIGINT) AS c
               FROM toks$NMerges GROUP BY tok),
        nn AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM pc),
        r AS (
          SELECT tok, c,
                 CAST(row_number() OVER (ORDER BY c DESC, tok ASC) AS BIGINT) AS rk,
                 CAST(sum(c) OVER (ORDER BY c DESC, tok ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
          FROM pc)
        SELECT rk, tok, c, (1000000 * cum) // nn.n AS cum_cov_ppm
        FROM r, nn ORDER BY rk"""))
  }

  override val all: Seq[Q] = Seq(bpe1, bpe2, bpe3, bpe4, bpe5, bpe7)
}
