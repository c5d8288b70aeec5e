package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Text-analysis building blocks for large-scale training-data
  * pipelines: tokenization, shingling, MinHash signatures, SimHash,
  * language-ID heuristics, quality scoring, fingerprinting.
  *
  * Everything here is built from codegen'd built-in expressions (no
  * UDFs): at 100 TB these run inside whole-stage codegen directly over
  * the parquet scan. Hash family = md5 (deterministic, portable to any
  * SQL oracle); "min over k salted md5s" is a valid MinHash family
  * because lexicographic min over a uniform hex hash is
  * permutation-equivalent.
  */
object TextFunctions {

  /** Whitespace tokens, empties dropped. */
  def tokens(text: Column): Column =
    filter(split(text, " "), t => t =!= "")

  /** PII scrub: emails and phone-shaped numbers replaced with typed
    * redaction tokens. Deliberately simple patterns (no lookaround) so
    * any regex engine agrees; production pipelines extend the list. */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhonePattern = "\\+[0-9]{2} [0-9]{2} [0-9]{3} [0-9]{2} [0-9]{2}"

  def scrubPii(text: Column): Column =
    regexp_replace(regexp_replace(text, EmailPattern, "<EMAIL>"),
      PhonePattern, "<PHONE>")

  /** Count of tokens (from a materialized token array) in a marker
    * set. Callers hot at scale should project [[tokens]] ONCE and feed
    * it here — Catalyst's CollapseProject keeps a multiply-referenced
    * non-cheap alias in its own projection, so the text is split a
    * single time per row instead of once per marker set. */
  def markerCountFromTokens(toks: Column, markers: Seq[String]): Column =
    size(filter(toks, t => t.isin(markers.map(lit): _*))).cast(LongType)

  /** Count of tokens that appear in a fixed marker set. */
  def markerCount(text: Column, markers: Seq[String]): Column =
    markerCountFromTokens(split(text, " "), markers)

  /** Language-ID marker sets (alphabetical tie-break, 'und' if no hits). */
  val langMarkers: Map[String, Seq[String]] = Map(
    "de" -> Seq("der", "und", "die", "das", "ein"),
    "en" -> Seq("the", "and", "of", "to", "a"),
    "es" -> Seq("el", "los", "y", "las", "una"),
    "fr" -> Seq("le", "la", "et", "les", "une"))

  /** Deterministic heuristic language id over a shared token array. */
  def langIdFromTokens(toks: Column): Column = {
    val scores = langMarkers.toSeq.sortBy(_._1)
      .map { case (l, m) => l -> markerCountFromTokens(toks, m) }
    val top = greatest(scores.map(_._2): _*)
    scores.foldRight(lit("und")) { case ((l, sc), acc) =>
      when(top > 0 && sc === top, lit(l)).otherwise(acc)
    }
  }

  /** Deterministic heuristic language id over the marker sets. */
  def langId(text: Column): Column = langIdFromTokens(split(text, " "))

  private val stopwords = Seq("the", "a", "and", "of", "to", "in")

  /** Deterministic [0,1] quality score: token-count score (50-token
    * saturation), non-stopword ratio, average-word-length score.
    * Pure double arithmetic in a fixed op order → bit-reproducible in
    * any IEEE engine. `toks` is the shared raw split (empties kept —
    * they're filtered here, matching the historical op order).
    */
  def qualityScoreFromTokens(text: Column, toks: Column): Column = {
    val nTok = size(filter(toks, t => t =!= "")).cast(DoubleType)
    val nStop = size(filter(toks, t => t.isin(stopwords.map(lit): _*))).cast(DoubleType)
    val nChars = length(text).cast(DoubleType)
    val lenScore = least(lit(1.0), nTok / lit(50.0))
    val stopPenalty = lit(1.0) - least(nStop / nTok * lit(2.0), lit(1.0))
    val awl = nChars / nTok
    val awlScore = least(awl / lit(8.0), lit(1.0))
    when(nTok === 0, lit(0.0))
      .otherwise(lenScore * lit(0.5) + stopPenalty * lit(0.3) + awlScore * lit(0.2))
  }

  def qualityScore(text: Column): Column =
    qualityScoreFromTokens(text, split(text, " "))

  /** The same score as DuckDB SQL (kept textually in sync with
    * qualityScore — same op order for bit equality). */
  def qualityScoreSql(text: String): String = {
    val stop = stopwords.map(s => s"'$s'").mkString(", ")
    s"""CASE WHEN len(list_filter(string_split($text, ' '), t -> t <> '')) = 0 THEN 0.0
       |ELSE least(1.0, CAST(len(list_filter(string_split($text, ' '), t -> t <> '')) AS DOUBLE) / 50.0) * 0.5
       |   + (1.0 - least(CAST(len(list_filter(string_split($text, ' '), t -> t IN ($stop))) AS DOUBLE)
       |                  / CAST(len(list_filter(string_split($text, ' '), t -> t <> '')) AS DOUBLE) * 2.0, 1.0)) * 0.3
       |   + least(CAST(length($text) AS DOUBLE) / CAST(len(list_filter(string_split($text, ' '), t -> t <> '')) AS DOUBLE) / 8.0, 1.0) * 0.2
       |END""".stripMargin
  }

  /** BPE-ish token count: letter runs, digit runs, single punctuation. */
  val bpeishPattern = "[a-z]+|[0-9]+|[^a-z0-9 ]"

  /** Canonical form of a document — lowercase, punctuation stripped,
    * whitespace collapsed. The single normalization every dedup
    * fingerprint derives from (exact dd1, bag dd13/dd15): one
    * definition, so the fingerprints cannot drift apart. */
  def canonicalForm(text: Column): Column =
    trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9 ]", ""), " +", " "))

  /** Canonical-form md5 fingerprint (lowercase, punctuation stripped,
    * whitespace collapsed) — document identity for exact dedup. */
  def fingerprint(text: Column): Column = md5(canonicalForm(text))

  /** Order-insensitive bag fingerprint: md5 over the SORTED DISTINCT
    * token set of the canonical form — one rung looser than
    * [[fingerprint]], identifying shuffled and repeated-word copies
    * that share a vocabulary (the dd13/dd15 dedup key). Pure map-side
    * column math: split → filter empties → distinct → sort → md5. */
  def bagFingerprint(text: Column): Column =
    md5(concat_ws(" ", array_sort(array_distinct(
      filter(split(canonicalForm(text), " "), t => t =!= "")))))

  /** Long-form deterministic content hash for a column (engine-portable). */
  def contentHash(c: Column): Column = md5(c.cast("string"))

  // ---------------- MinHash / shingles ----------------

  /** (id, shingle) rows: distinct character n-grams of lower(text).
    * Short texts (< n chars) yield their whole text as one shingle. */
  def charShingles(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    df.select(col(idCol), lower(col(textCol)).as("t"))
      .select(col(idCol), col("t"),
        explode(sequence(lit(1), greatest(length(col("t")) - (n - 1), lit(1)))).as("i"))
      .select(col(idCol), expr(s"substring(t, i, $n)").as("shingle"))
      .distinct()
  }

  /** (id, shingle) rows: word n-grams WITH multiplicity (repetition
    * metrics need the raw counts). */
  def rawWordShingles(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    df.select(col(idCol), filter(split(col(textCol), " "), t => t =!= "").as("toks"))
      .filter(size(col("toks")) >= n)
      .select(col(idCol),
        explode(expr(s"transform(sequence(0, size(toks) - $n), i -> " +
          (0 until n).map(j => s"toks[i + $j]").mkString("concat_ws(' ', ", ", ", ")") + ")"))
          .as("shingle"))

  /** (id, shingle) rows: distinct word n-grams. */
  def wordShingles(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    rawWordShingles(df, idCol, textCol, n).distinct()

  /** MinHash signature: k salted-md5 minima per id, columns h0..h{k-1},
    * plus the shingle-set size `n` in the same aggregation pass (one
    * shuffle covers both the signature and the Jaccard denominator). */
  def minhashSignature(shingles: DataFrame, idCol: String, k: Int): DataFrame =
    shingles.groupBy(col(idCol))
      .agg(
        min(md5(concat(lit("0:"), col("shingle")))).as("h0"),
        (1 until k).map(i => min(md5(concat(lit(s"$i:"), col("shingle")))).as(s"h$i"))
          :+ count(lit(1)).cast("long").as("n"): _*)

  /** LSH band keys from a signature: bands of `rowsPerBand` hashes,
    * each hashed to one key column → exploded (id, band, band_key). */
  def lshBands(sig: DataFrame, idCol: String, k: Int, rowsPerBand: Int): DataFrame = {
    val nBands = k / rowsPerBand
    val bandCols = (0 until nBands).map { b =>
      val hs = (b * rowsPerBand until (b + 1) * rowsPerBand).map(i => col(s"h$i"))
      struct(lit(b).as("band"), md5(concat_ws("|", hs: _*)).as("band_key"))
    }
    sig.select(col(idCol), explode(array(bandCols: _*)).as("bk"))
      .select(col(idCol), col("bk.band").as("band"), col("bk.band_key").as("band_key"))
  }

  /** 16-bit SimHash from whitespace tokens: bit j votes +1/-1 by the
    * j-th hex digit of md5(token); bit set iff the vote sum is
    * positive. Integer arithmetic only → exact. */
  def simhash16(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = df.select(col(idCol),
      explode(filter(split(col(textCol), " "), t => t =!= "")).as("tok"))
      .withColumn("h", md5(col("tok")))
    val votes = tok.groupBy(col(idCol)).agg(
      sum(when(substring(col("h"), 1, 1).rlike("[89a-f]"), 1L).otherwise(-1L)).as("v0"),
      (1 until 16).map(j =>
        sum(when(substring(col("h"), j + 1, 1).rlike("[89a-f]"), 1L).otherwise(-1L)).as(s"v$j")): _*)
    votes.select(col(idCol),
      (0 until 16).map(j => when(col(s"v$j") > 0, lit(1L << j)).otherwise(lit(0L)))
        .reduce(_ + _).cast(LongType).as("simhash"))
  }
}
