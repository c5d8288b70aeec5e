package graft.operators

import graft.{Q, QueryModule, Tables}
import graft.functions.Exprs._
import graft.functions.TextFunctions._
import graft.functions.VectorFunctions._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Deduplication operators for training-data pipelines: exact
  * (fingerprint groupBy), MinHash+LSH banding, SimHash signatures,
  * n-gram Jaccard via inverted-index join, embedding-cosine near-dup.
  *
  * Scale shape: every variant avoids the O(N²) all-pairs comparison —
  * candidates come from equality joins on band keys / shared shingles /
  * LSH buckets, which shuffle-partition by key and scale linearly in
  * candidate count. Only verified candidates pay the full similarity
  * computation.
  */
object DedupQueries extends QueryModule {

  // Exact dedup: canonical-form fingerprint → group, keep min id.
  private val dd1 = Q(
    "q_dd1_dedup_exact",
    "exact dedup via canonical md5 fingerprint groupBy (hash-groupBy dedup)",
    (s, d) => {
      val doc = Tables.documents(s, d)
      doc.select(col("doc_id"), fingerprint(col("text")).as("fp"))
        .groupBy(col("fp"))
        .agg(min(col("doc_id")).as("keep_id"), cnt.as("n_docs"))
        .select(col("keep_id"), col("n_docs"))
        .orderBy(col("keep_id"))
    },
    Some("""
      SELECT min(doc_id) AS keep_id, count(*) AS n_docs
      FROM (SELECT doc_id,
              md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))) AS fp
            FROM documents)
      GROUP BY fp ORDER BY keep_id"""))

  // Bag-canonical dedup: fingerprint = md5 over the SORTED DISTINCT
  // token set of the canonical form — one rung looser than dd1's exact
  // fingerprint, catching shuffled and repeated-word copies that share
  // a vocabulary (the cheap order-insensitive pass pipelines run before
  // paying MinHash). Same scale shape as dd1: map-side fingerprint →
  // hash groupBy (two-phase partial agg), no joins.
  private val dd13 = Q(
    "q_dd13_bag_dedup",
    "order-insensitive dedup: sorted distinct-token-set md5 fingerprint groupBy",
    (s, d) => {
      Tables.documents(s, d)
        .select(col("doc_id"), bagFingerprint(col("text")).as("fp"))
        .groupBy(col("fp"))
        .agg(min(col("doc_id")).as("keep_id"), cnt.as("n_docs"))
        .select(col("keep_id"), col("n_docs"))
        .orderBy(col("keep_id"))
    },
    Some("""
      SELECT min(doc_id) AS keep_id, count(*) AS n_docs
      FROM (SELECT doc_id,
              md5(array_to_string(list_sort(list_distinct(list_filter(
                string_split(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')), ' '),
                x -> x <> ''))), ' ')) AS fp
            FROM documents)
      GROUP BY fp ORDER BY keep_id"""))

  // Best-keeper dedup: same bag groups as dd13, but the survivor is
  // the BEST document (longest canonical form, id tie-break) instead
  // of the first — the policy real pipelines use (RefinedWeb keeps the
  // longest of a duplicate cluster; min-id merely keeps the oldest).
  // Plan: one keyed shuffle on the fingerprint, rank-1 via window →
  // Spark plans WindowGroupLimit (per-partition top-1 before the
  // exchange, the j6 discipline).
  private val dd15 = {
    import org.apache.spark.sql.expressions.Window
    Q(
      "q_dd15_best_keeper",
      "bag-group dedup keeping the BEST (longest) member, not the first",
      (s, d) => {
        val keyed = Tables.documents(s, d)
          .select(col("doc_id"),
            bagFingerprint(col("text")).as("fp"),
            length(canonicalForm(col("text"))).cast(LongType).as("canon_len"))
        val w = Window.partitionBy(col("fp"))
          .orderBy(col("canon_len").desc, col("doc_id").asc)
        keyed.withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1)
          .select(col("fp"), col("doc_id").as("keep_id"), col("canon_len"))
          .orderBy(col("keep_id"))
      },
      Some("""
        WITH k AS (
          SELECT doc_id,
                 md5(array_to_string(list_sort(list_distinct(list_filter(
                   string_split(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')), ' '),
                   x -> x <> ''))), ' ')) AS fp,
                 CAST(length(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))) AS BIGINT) AS canon_len
          FROM documents)
        SELECT fp, doc_id AS keep_id, canon_len FROM (
          SELECT fp, doc_id, canon_len, row_number() OVER (
            PARTITION BY fp ORDER BY canon_len DESC, doc_id ASC) AS rn
          FROM k)
        WHERE rn = 1 ORDER BY keep_id"""))
  }

  /** dd2's verified MinHash+LSH near-dup pairs (doc_a, doc_b, jaccard),
    * factored out so the cluster gate (dd10) composes the identical
    * pipeline. Plan notes inline. */
  private[operators] def minhashJaccardPairs(doc: org.apache.spark.sql.DataFrame,
      threshold: Double): org.apache.spark.sql.DataFrame = {
    // one cached pass builds signatures AND set sizes; the shingle
    // table is cached separately for the verification join
    val sh = wordShingles(doc, "doc_id", "text", 2).cache()
    val sig = minhashSignature(sh, "doc_id", 8).cache()
    val bands = lshBands(sig, "doc_id", 8, 2)
    val a = bands.select(col("doc_id").as("da"), col("band"), col("band_key"))
    val b = bands.select(col("doc_id").as("db"), col("band"), col("band_key"))
    // candidate generation = self shuffle-join partitioned by
    // (band, band_key) — the standard LSH plan: every frame here is
    // O(corpus), so nothing carries a broadcast hint (at 1 B docs a
    // broadcast band table is a driver OOM). AQE may still pick a
    // runtime broadcast when a side is actually small — a runtime
    // size decision, not a plan commitment.
    val cand = a.join(b, Seq("band", "band_key"))
      .filter(col("da") < col("db"))
      .select(col("da"), col("db")).distinct()
    // verification joins shuffle-keyed by doc id / (doc id, shingle);
    // candidate count is O(near-dup pairs), not O(N²)
    val sa = sh.select(col("doc_id").as("da"), col("shingle"))
    val sb = sh.select(col("doc_id").as("db"), col("shingle"))
    val inter = cand
      .join(sa, "da")
      .join(sb, Seq("db", "shingle"))
      .groupBy(col("da"), col("db")).agg(cnt.as("ninter"))
    inter
      .join(sig.select(col("doc_id").as("da"), col("n").as("na")), "da")
      .join(sig.select(col("doc_id").as("db"), col("n").as("nb")), "db")
      .select(col("da").as("doc_a"), col("db").as("doc_b"),
        (col("ninter").cast(DoubleType) / (col("na") + col("nb") - col("ninter"))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** dd2's oracle CTE chain up to `pairs` (da, db) — shared with dd10. */
  private val minhashPairCtes = """toks AS (
        SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS w
        FROM documents),
      sh AS (
        SELECT DISTINCT doc_id, list_extract(w, i) || ' ' || list_extract(w, i + 1) AS shingle
        FROM (SELECT doc_id, w, unnest(range(1, len(w))) AS i
              FROM toks WHERE len(w) >= 2)),
      sig AS (
        SELECT doc_id,
          min(md5('0:' || shingle)) AS h0, min(md5('1:' || shingle)) AS h1,
          min(md5('2:' || shingle)) AS h2, min(md5('3:' || shingle)) AS h3,
          min(md5('4:' || shingle)) AS h4, min(md5('5:' || shingle)) AS h5,
          min(md5('6:' || shingle)) AS h6, min(md5('7:' || shingle)) AS h7
        FROM sh GROUP BY doc_id),
      bands AS (
        SELECT doc_id, 0 AS band, md5(h0 || '|' || h1) AS band_key FROM sig
        UNION ALL SELECT doc_id, 1, md5(h2 || '|' || h3) FROM sig
        UNION ALL SELECT doc_id, 2, md5(h4 || '|' || h5) FROM sig
        UNION ALL SELECT doc_id, 3, md5(h6 || '|' || h7) FROM sig),
      cand AS (
        SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id),
      sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
      inter AS (
        SELECT c.da, c.db, count(*) AS ninter
        FROM cand c
        JOIN sh sa ON sa.doc_id = c.da
        JOIN sh sb ON sb.doc_id = c.db AND sb.shingle = sa.shingle
        GROUP BY c.da, c.db),
      jac AS (
        SELECT i.da, i.db,
               CAST(i.ninter AS DOUBLE) / (sa.n + sb.n - i.ninter) AS jaccard
        FROM inter i
        JOIN sizes sa ON sa.doc_id = i.da
        JOIN sizes sb ON sb.doc_id = i.db
        WHERE CAST(i.ninter AS DOUBLE) / (sa.n + sb.n - i.ninter) >= 0.7)"""

  // Sketch-accuracy audit — the "is k=8 hashes enough?" question every
  // LSH deployment answers before trusting the estimate: per candidate
  // pair, the SIGNATURE-estimated Jaccard (matching minhash fraction —
  // the unbiased MinHash estimator) against the exact shingle Jaccard,
  // in integer ppm with the absolute error alongside. Same plan bones
  // as dd2 (banded candidates, exact verify on candidates only) plus
  // one broadcast-free signature self-join keyed by doc id.
  private val dd14 = Q(
    "q_dd14_minhash_audit",
    "MinHash estimator audit: signature-estimated vs exact Jaccard per candidate pair (ppm)",
    (s, d) => {
      val doc = Tables.documents(s, d)
      val sh = wordShingles(doc, "doc_id", "text", 2).cache()
      val sig = minhashSignature(sh, "doc_id", 8).cache()
      val bands = lshBands(sig, "doc_id", 8, 2)
      val a = bands.select(col("doc_id").as("da"), col("band"), col("band_key"))
      val b = bands.select(col("doc_id").as("db"), col("band"), col("band_key"))
      val cand = a.join(b, Seq("band", "band_key"))
        .filter(col("da") < col("db"))
        .select(col("da"), col("db")).distinct()
      val sa = sh.select(col("doc_id").as("da"), col("shingle"))
      val sb = sh.select(col("doc_id").as("db"), col("shingle"))
      val inter = cand
        .join(sa, "da")
        .join(sb, Seq("db", "shingle"))
        .groupBy(col("da"), col("db")).agg(cnt.as("ninter"))
      val sigA = sig.select(col("doc_id").as("da") +:
        ((0 until 8).map(i => col(s"h$i").as(s"ha$i")) :+ col("n").as("na")): _*)
      val sigB = sig.select(col("doc_id").as("db") +:
        ((0 until 8).map(i => col(s"h$i").as(s"hb$i")) :+ col("n").as("nb")): _*)
      val matches = (0 until 8)
        .map(i => when(col(s"ha$i") === col(s"hb$i"), 1L).otherwise(0L))
        .reduce(_ + _)
      inter.join(sigA, "da").join(sigB, "db")
        .withColumn("__m", matches)
        .select(col("da").as("doc_a"), col("db").as("doc_b"),
          expr("(1000000 * __m) div 8").as("est_jacc_ppm"),
          expr("(1000000 * ninter) div (na + nb - ninter)").as("exact_jacc_ppm"))
        .withColumn("abs_err_ppm", abs(col("est_jacc_ppm") - col("exact_jacc_ppm")))
        .orderBy(col("doc_a"), col("doc_b"))
    },
    Some(s"""
      WITH $minhashPairCtes,
      m AS (
        SELECT c.da, c.db,
               (${(0 until 8).map(i => s"CASE WHEN a.h$i = b.h$i THEN 1 ELSE 0 END").mkString(" + ")}) AS matches
        FROM cand c
        JOIN sig a ON a.doc_id = c.da
        JOIN sig b ON b.doc_id = c.db)
      SELECT i.da AS doc_a, i.db AS doc_b,
             (1000000 * m.matches) // 8 AS est_jacc_ppm,
             (1000000 * i.ninter) // (sa.n + sb.n - i.ninter) AS exact_jacc_ppm,
             abs((1000000 * m.matches) // 8
               - (1000000 * i.ninter) // (sa.n + sb.n - i.ninter)) AS abs_err_ppm
      FROM inter i
      JOIN m ON m.da = i.da AND m.db = i.db
      JOIN sizes sa ON sa.doc_id = i.da
      JOIN sizes sb ON sb.doc_id = i.db
      ORDER BY doc_a, doc_b"""))

  // MinHash + LSH: word-bigram shingles, k=8 salted-md5 minima,
  // 4 bands × 2 rows, Jaccard-verified at ≥ 0.7. (Char n-grams are
  // degenerate on a small-vocab corpus — nearly all pairs collide;
  // word shingles keep the banded candidate set near the true-dup set.)
  private val dd2 = Q(
    "q_dd2_minhash_lsh",
    "MinHash+LSH near-dup: shingle → 8-perm signature → banded candidates → Jaccard verify",
    (s, d) => minhashJaccardPairs(Tables.documents(s, d), 0.7)
      .orderBy(col("doc_a"), col("doc_b")),
    Some(s"""
      WITH $minhashPairCtes
      SELECT da AS doc_a, db AS doc_b, jaccard FROM jac ORDER BY 1, 2"""))

  // Near-dup CLUSTERS (dd2 composed with connected components): pair
  // logic alone over-drops — a~b, b~c, a!~c keeps only a with greedy
  // pair rules even though b would survive as c's representative. The
  // cluster form closes the pair graph transitively and keeps exactly
  // one representative (the min doc id) per component. The oracle
  // replays the ENTIRE chain — shingles, signatures, bands, verified
  // pairs, then a recursive-CTE closure — so the gate checks the
  // composition end to end (candidate generation included), not the
  // closure in isolation like q_cc1. Scale shape: CC input is the
  // verified PAIR list (O(near-dups), corpus-free); rounds are
  // O(cluster diameter) ≈ 2-3 for near-clique dup graphs.
  private val dd10 = Q(
    "q_dd10_dup_clusters",
    "near-dup clusters: LSH-verified pairs closed into components, min-id representative kept",
    (s, d) => {
      // materialize the pair list before the closure: components()
      // references its edge input twice (symmetric union), which would
      // execute the whole LSH chain twice inside one job
      val pairs = minhashJaccardPairs(Tables.documents(s, d), 0.7)
        .select(col("doc_a"), col("doc_b")).localCheckpoint()
      ConnectedComponents.components(pairs, "doc_a", "doc_b")
        .select(col("vertex").as("doc_id"), col("component").as("cluster_id"),
          (col("vertex") === col("component")).cast(LongType).as("kept"))
        .orderBy(col("doc_id"))
    },
    Some(s"""
      WITH RECURSIVE $minhashPairCtes,
      sym AS (SELECT da AS a, db AS b FROM jac UNION SELECT db, da FROM jac),
      reach(v, label) AS (
        SELECT a, a FROM sym
        UNION
        SELECT s.a, r.label FROM sym s JOIN reach r ON r.v = s.b)
      SELECT v AS doc_id, CAST(min(label) AS BIGINT) AS cluster_id,
             CAST(CASE WHEN v = min(label) THEN 1 ELSE 0 END AS BIGINT) AS kept
      FROM reach GROUP BY v ORDER BY doc_id"""))

  // SimHash 16-bit signatures (integer-exact, oracle-checkable).
  private val dd3 = {
    val hexHigh = "('8','9','a','b','c','d','e','f')"
    val voteCols = (0 until 16).map(j =>
      s"sum(CASE WHEN substring(md5(tok), ${j + 1}, 1) IN $hexHigh THEN 1 ELSE -1 END) AS v$j").mkString(", ")
    val packed = (0 until 16).map(j => s"CASE WHEN v$j > 0 THEN ${1L << j} ELSE 0 END").mkString(" + ")
    Q(
      "q_dd3_simhash",
      "16-bit SimHash signature per document (token votes from md5 hex digits)",
      (s, d) => simhash16(Tables.documents(s, d), "doc_id", "text")
        .orderBy(col("doc_id")),
      Some(s"""
        WITH tok AS (
          SELECT doc_id, unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS tok
          FROM documents),
        votes AS (SELECT doc_id, $voteCols FROM tok GROUP BY doc_id)
        SELECT doc_id, $packed AS simhash FROM votes ORDER BY doc_id"""))
  }

  /** Document-frequency cap for dd4's inverted index (SCALING.md): a
    * shingle shared by more than this many docs of a (lang, source)
    * bucket generates no candidate pairs — one hot stopword bigram
    * would otherwise emit O(df²) pairs. Pairs that share ONLY hot
    * shingles are missed (their Jaccard is dominated by stopwords
    * anyway); surviving pairs are verified against the FULL shingle
    * sets, so reported Jaccard values stay exact. */
  private[operators] val Dd4MaxDf = 50L

  // n-gram Jaccard near-dup: word bigrams, DF-capped inverted-index
  // candidate join bucketed by (lang, source), verified at ≥ 0.3.
  private val dd4 = Q(
    "q_dd4_ngram_jaccard",
    "word-bigram Jaccard via DF-capped shared-shingle inverted-index join",
    (s, d) => {
      val doc = Tables.documents(s, d)
      // shingles carry (lang, source) straight out of the explode —
      // they're functionally dependent on doc_id, so re-attaching them
      // with a join would shuffle the biggest frame in the query for
      // nothing
      val bg = doc.select(col("doc_id"), col("lang"), col("source"),
          filter(split(col("text"), " "), t => t =!= "").as("toks"))
        .filter(size(col("toks")) >= 2)
        .select(col("doc_id"), col("lang"), col("source"),
          explode(expr("transform(sequence(0, size(toks) - 2), " +
            "i -> concat_ws(' ', toks[i], toks[i + 1]))")).as("shingle"))
        .distinct()
        .cache()
      val sizes = bg.groupBy(col("doc_id")).agg(cnt.as("n"))
      // DF via two-phase aggregation, NOT a window: a whole-partition
      // window has no partial aggregation, so every occurrence of the
      // hottest shingle ("of the" in a 1 B-doc English bucket — exactly
      // the key the cap exists to neutralize) would land on ONE task
      // before the cap filter runs. groupBy's map-side combine shrinks
      // each hot key to one row per input partition; the surviving
      // over-cap key set is tiny by construction (it's the stopword
      // bigrams), so it broadcast-anti-joins against the shingle table
      // with no skewed shuffle at all.
      val hot = bg.groupBy(col("lang"), col("source"), col("shingle"))
        .agg(cnt.as("df"))
        .filter(col("df") > Dd4MaxDf)
        .select(col("lang"), col("source"), col("shingle"))
      val rare = bg.join(broadcast(hot), Seq("lang", "source", "shingle"), "left_anti")
      val ra = rare.select(col("doc_id").as("da"), col("lang"), col("source"), col("shingle"))
      val rb = rare.select(col("doc_id").as("db"), col("lang"), col("source"), col("shingle"))
      val cand = ra.join(rb, Seq("lang", "source", "shingle"))
        .filter(col("da") < col("db"))
        .select(col("da"), col("db")).distinct()
      // exact intersection over the uncapped shingle sets
      val sa = bg.select(col("doc_id").as("da"), col("shingle"))
      val sb = bg.select(col("doc_id").as("db"), col("shingle"))
      val inter = cand
        .join(sa, "da")
        .join(sb, Seq("db", "shingle"))
        .groupBy(col("da"), col("db")).agg(cnt.as("ninter"))
      inter
        .join(sizes.select(col("doc_id").as("da"), col("n").as("na")), "da")
        .join(sizes.select(col("doc_id").as("db"), col("n").as("nb")), "db")
        .select(col("da").as("doc_a"), col("db").as("doc_b"),
          (col("ninter").cast(DoubleType) / (col("na") + col("nb") - col("ninter"))).as("jaccard"))
        .filter(col("jaccard") >= 0.3)
        .orderBy(col("doc_a"), col("doc_b"))
    },
    Some(s"""
      WITH toks AS (
        SELECT doc_id, lang, source, list_filter(string_split(text, ' '), t -> t <> '') AS w
        FROM documents),
      bg AS (
        SELECT DISTINCT doc_id, lang, source,
               list_extract(w, i) || ' ' || list_extract(w, i + 1) AS shingle
        FROM (SELECT doc_id, lang, source, w, unnest(range(1, len(w))) AS i
              FROM toks WHERE len(w) >= 2)),
      sizes AS (SELECT doc_id, count(*) AS n FROM bg GROUP BY doc_id),
      rare AS (
        SELECT bg.* FROM bg
        JOIN (SELECT lang, source, shingle FROM bg
              GROUP BY 1, 2, 3 HAVING count(*) <= $Dd4MaxDf) r
          USING (lang, source, shingle)),
      cand AS (
        SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
        FROM rare a JOIN rare b
          ON a.lang = b.lang AND a.source = b.source
         AND a.shingle = b.shingle AND a.doc_id < b.doc_id),
      inter AS (
        SELECT c.da, c.db, count(*) AS ninter
        FROM cand c
        JOIN bg sa ON sa.doc_id = c.da
        JOIN bg sb ON sb.doc_id = c.db AND sb.shingle = sa.shingle
        GROUP BY 1, 2)
      SELECT i.da AS doc_a, i.db AS doc_b,
             CAST(i.ninter AS DOUBLE) / (sa.n + sb.n - i.ninter) AS jaccard
      FROM inter i
      JOIN sizes sa ON sa.doc_id = i.da
      JOIN sizes sb ON sb.doc_id = i.db
      WHERE CAST(i.ninter AS DOUBLE) / (sa.n + sb.n - i.ninter) >= 0.3
      ORDER BY 1, 2"""))

  // Embedding-cosine near-dup at threshold 0.8, LSH-bucketed: pairs are
  // generated only within a hyperplane sign bucket (equi-join on the
  // bucket id — a shuffle join, NOT a cartesian), then verified with an
  // exact cosine. Cosine-similar vectors collide with high probability
  // (4 Rademacher planes ⇒ P[same bucket | cos=0.8] ≈ (1-acos(.8)/π)⁴
  // ≈ 0.38 per table; at scale run multiple plane sets and union, same
  // plan shape). The oracle buckets identically (integer-exact bucket
  // ids), so results match bit-for-bit.
  private val dd5 = Q(
    "q_dd5_embedding_dup",
    "embedding cosine near-dup pairs via LSH buckets (threshold 0.8)",
    (s, d) => {
      graft.functions.VecExpressions.register(s)
      val e = Tables.embeddings(s, d)
      // precompute norm + bucket once per vector; the pair loop is then
      // a single codegen'd dot product per same-bucket candidate
      val withB = e.select(col("vec_id"), col("embedding"),
        norm(col("embedding")).as("nrm"),
        intHyperplaneBucket(col("embedding"), AnnQueries.lshSigns).as("bucket"))
      val a = withB.select(col("vec_id").as("va"), col("embedding").as("ea"),
        col("nrm").as("na"), col("bucket"))
      val b = withB.select(col("vec_id").as("vb"), col("embedding").as("eb"),
        col("nrm").as("nb"), col("bucket"))
      a.join(b, Seq("bucket"))
        .filter(col("va") < col("vb"))
        .select(col("va"), col("vb"),
          (dot(col("ea"), col("eb")) / (col("na") * col("nb"))).as("cos"))
        .filter(col("cos") >= 0.8)
        .select(col("va").as("vec_a"), col("vb").as("vec_b"))
        .orderBy(col("vec_a"), col("vec_b"))
    },
    Some(s"""
      WITH b AS (
        SELECT vec_id, embedding,
               ${intHyperplaneBucketSql("embedding", AnnQueries.lshSigns)} AS bucket
        FROM embeddings)
      SELECT a.vec_id AS vec_a, b2.vec_id AS vec_b
      FROM b a JOIN b b2 ON a.bucket = b2.bucket AND a.vec_id < b2.vec_id
      WHERE list_cosine_similarity(a.embedding, b2.embedding) >= 0.8
      ORDER BY 1, 2"""))

  // Multi-table LSH near-dup (the recall-scaling path): candidates from
  // the UNION of 2 independent md5-plane families, verified with the
  // integer-exact quantized cosine (threshold 7/20 = 0.35 — the
  // synthetic corpus tops out near cos 0.51, so 0.35 exercises real
  // verification; production thresholds pass through the same rational
  // form). Both the buckets and the verify are BIGINT-exact, so the
  // DuckDB twin reproduces the result bit-for-bit.
  private val dd6 = {
    val planes = 4; val tables = 2; val dim = 64
    val planeSets = (0 until tables).map(t =>
      planeFamily(t, planes, dim))
    Q(
      "q_dd6_multitable_lsh",
      "multi-table LSH embedding near-dup: 2 plane families, integer-exact verify",
      (s, d) => EmbeddingDedup.nearDupPairsExact(
          Tables.embeddings(s, d), tNum = 7, tDen = 20, planes = planes,
          tables = tables, dim = dim)
        .orderBy(col("vec_a"), col("vec_b")),
      Some(s"""
        WITH q AS (
          SELECT vec_id,
                 ${intHyperplaneBucketSql("embedding", planeSets(0))} AS b0,
                 ${intHyperplaneBucketSql("embedding", planeSets(1))} AS b1,
                 list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv
          FROM embeddings),
        qq AS (
          SELECT vec_id, b0, b1, qv,
                 list_sum(list_transform(qv, x -> x * x)) AS qn
          FROM q),
        cand AS (
          SELECT DISTINCT a.vec_id AS va, b.vec_id AS vb
          FROM qq a JOIN qq b
            ON a.vec_id < b.vec_id AND (a.b0 = b.b0 OR a.b1 = b.b1)),
        v AS (
          SELECT c.va, c.vb,
                 list_sum(list_transform(a.qv, (x, j) -> x * b.qv[j])) AS qdot,
                 a.qn AS qna, b.qn AS qnb
          FROM cand c
          JOIN qq a ON a.vec_id = c.va
          JOIN qq b ON b.vec_id = c.vb)
        SELECT va AS vec_a, vb AS vec_b FROM v
        WHERE qdot > 0 AND 400 * qdot * qdot >= 49 * qna * qnb
        ORDER BY 1, 2"""))
  }

  // Benchmark decontamination: docs whose 5-grams overlap the (small,
  // broadcast) benchmark slice — doc_id % 11 stands in for an eval set.
  // At sf0.01 this surfaces exactly the planted near-dups of benchmark
  // docs, so the gate discriminates rather than passing vacuously.
  private val dc1 = Q(
    "q_dc1_decontaminate",
    "benchmark decontamination: word 5-gram overlap vs broadcast eval-set grams",
    (s, d) => {
      val doc = Tables.documents(s, d)
      Decontamination.contaminationHits(
          doc.filter(col("doc_id") % 11 =!= 0),
          doc.filter(col("doc_id") % 11 === 0),
          "doc_id", "text", n = 5, minHits = 1L)
        .orderBy(col("doc_id"))
    },
    Some("""
      WITH toks AS (
        SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS w
        FROM documents),
      sh AS (
        SELECT DISTINCT doc_id,
               list_extract(w, i) || ' ' || list_extract(w, i + 1) || ' ' ||
               list_extract(w, i + 2) || ' ' || list_extract(w, i + 3) || ' ' ||
               list_extract(w, i + 4) AS shingle
        FROM (SELECT doc_id, w, unnest(range(1, len(w) - 3)) AS i
              FROM toks WHERE len(w) >= 5)),
      bench AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 11 = 0)
      SELECT doc_id, count(*) AS n_hits
      FROM sh
      WHERE doc_id % 11 <> 0 AND shingle IN (SELECT shingle FROM bench)
      GROUP BY doc_id
      HAVING count(*) >= 1
      ORDER BY doc_id"""))

  // Span-level contamination coverage (dc1's token-fraction twin): the
  // same %11 eval split, but measuring HOW MUCH of each corpus doc the
  // benchmark covers — flagged 5-gram spans merge into distinct token
  // positions. Benchmark grams broadcast; the span fan-out is a bounded
  // 5-explode on flagged occurrences only.
  private val dc2 = {
    val k = 5
    Q(
      "q_dc2_contamination_coverage",
      s"span-level decontamination: per-doc token coverage of benchmark $k-grams",
      (s, d) => {
        val doc = Tables.documents(s, d)
        Decontamination.spanContamination(
            doc.filter(col("doc_id") % 11 =!= 0),
            doc.filter(col("doc_id") % 11 === 0),
            "doc_id", "text", n = k)
          .orderBy(col("doc_id"))
      },
      Some(s"""
        WITH ${SubstringDedup.toksGramsSqlCtes(k)},
        bench AS (SELECT DISTINCT gram FROM grams WHERE doc_id % 11 = 0),
        flagged AS (
          SELECT doc_id, pos FROM grams
          WHERE doc_id % 11 <> 0 AND gram IN (SELECT gram FROM bench)),
        ${SubstringDedup.covSqlCte(k)},
        c AS (SELECT doc_id, count(*) AS contam_tokens FROM cov GROUP BY doc_id)
        SELECT t.doc_id, len(t.w) AS n_tokens,
               coalesce(c.contam_tokens, 0) AS contam_tokens
        FROM toksq t LEFT JOIN c ON c.doc_id = t.doc_id
        WHERE t.doc_id % 11 <> 0
        ORDER BY t.doc_id"""))
  }

  // Incremental ingest dedup: the doc_id % 10 == 7 slice plays the
  // arriving batch, the rest the existing corpus; batch bands broadcast
  // into the corpus band scan (no corpus×corpus pairs, no corpus
  // shuffle at candidate time). Same MinHash family as dd2.
  private val dd7 = Q(
    "q_dd7_incremental_lsh",
    "incremental batch-vs-corpus near-dup: broadcast batch bands, exact Jaccard verify",
    (s, d) => {
      val doc = Tables.documents(s, d)
      val state = IncrementalDedup.corpusState(
        doc.filter(col("doc_id") % 10 =!= 7), "doc_id", "text")
      IncrementalDedup.pairsAgainstCorpus(
          doc.filter(col("doc_id") % 10 === 7), state, "doc_id", "text", 0.7)
        .orderBy(col("batch_id"), col("corpus_id"))
    },
    Some("""
      WITH toks AS (
        SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS w
        FROM documents),
      sh AS (
        SELECT DISTINCT doc_id, list_extract(w, i) || ' ' || list_extract(w, i + 1) AS shingle
        FROM (SELECT doc_id, w, unnest(range(1, len(w))) AS i
              FROM toks WHERE len(w) >= 2)),
      sig AS (
        SELECT doc_id,
          min(md5('0:' || shingle)) AS h0, min(md5('1:' || shingle)) AS h1,
          min(md5('2:' || shingle)) AS h2, min(md5('3:' || shingle)) AS h3,
          min(md5('4:' || shingle)) AS h4, min(md5('5:' || shingle)) AS h5,
          min(md5('6:' || shingle)) AS h6, min(md5('7:' || shingle)) AS h7,
          count(*) AS n
        FROM sh GROUP BY doc_id),
      bands AS (
        SELECT doc_id, 0 AS band, md5(h0 || '|' || h1) AS band_key FROM sig
        UNION ALL SELECT doc_id, 1, md5(h2 || '|' || h3) FROM sig
        UNION ALL SELECT doc_id, 2, md5(h4 || '|' || h5) FROM sig
        UNION ALL SELECT doc_id, 3, md5(h6 || '|' || h7) FROM sig),
      cand AS (
        SELECT DISTINCT b.doc_id AS batch_id, c.doc_id AS corpus_id
        FROM bands b JOIN bands c
          ON b.band = c.band AND b.band_key = c.band_key
        WHERE b.doc_id % 10 = 7 AND c.doc_id % 10 <> 7),
      inter AS (
        SELECT cand.batch_id, cand.corpus_id, count(*) AS ninter
        FROM cand
        JOIN sh sa ON sa.doc_id = cand.batch_id
        JOIN sh sb ON sb.doc_id = cand.corpus_id AND sb.shingle = sa.shingle
        GROUP BY 1, 2)
      SELECT i.batch_id, i.corpus_id,
             CAST(i.ninter AS DOUBLE) / (sb.n + sc.n - i.ninter) AS jaccard
      FROM inter i
      JOIN sig sb ON sb.doc_id = i.batch_id
      JOIN sig sc ON sc.doc_id = i.corpus_id
      WHERE CAST(i.ninter AS DOUBLE) / (sb.n + sc.n - i.ninter) >= 0.7
      ORDER BY 1, 2"""))

  // Incremental batch-vs-corpus EMBEDDING near-dup (dd7's vector twin,
  // dd6's incremental form): the vec_id % 10 == 7 slice plays the
  // arriving batch; its bucket tables broadcast into the corpus bucket
  // scan (2 plane families), candidates verify with the BIGINT-exact
  // quantized cosine. No corpus shuffle at candidate time, no
  // corpus×corpus pair ever formed.
  private val dd11 = {
    val planes = 4; val tables = 2; val dim = 64
    val planeSets = (0 until tables).map(t =>
      planeFamily(t, planes, dim))
    Q(
      "q_dd11_incremental_embedding",
      "incremental embedding near-dup: broadcast batch buckets vs corpus, BIGINT-exact verify",
      (s, d) => {
        val e = Tables.embeddings(s, d)
        EmbeddingDedup.nearDupAgainstCorpusExact(
            e.filter(col("vec_id") % 10 === 7), e.filter(col("vec_id") % 10 =!= 7),
            tNum = 7, tDen = 20, planes = planes, tables = tables, dim = dim)
          .orderBy(col("batch_id"), col("corpus_id"))
      },
      Some(s"""
        WITH q AS (
          SELECT vec_id,
                 ${intHyperplaneBucketSql("embedding", planeSets(0))} AS b0,
                 ${intHyperplaneBucketSql("embedding", planeSets(1))} AS b1,
                 list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv
          FROM embeddings),
        qq AS (
          SELECT vec_id, b0, b1, qv,
                 list_sum(list_transform(qv, x -> x * x)) AS qn
          FROM q),
        cand AS (
          SELECT DISTINCT b.vec_id AS batch_id, c.vec_id AS corpus_id
          FROM qq b JOIN qq c
            ON (b.b0 = c.b0 OR b.b1 = c.b1)
          WHERE b.vec_id % 10 = 7 AND c.vec_id % 10 <> 7),
        v AS (
          SELECT cand.batch_id, cand.corpus_id,
                 list_sum(list_transform(b.qv, (x, j) -> x * c.qv[j])) AS qdot,
                 b.qn AS qna, c.qn AS qnb
          FROM cand
          JOIN qq b ON b.vec_id = cand.batch_id
          JOIN qq c ON c.vec_id = cand.corpus_id)
        SELECT batch_id, corpus_id FROM v
        WHERE qdot > 0 AND 400 * qdot * qdot >= 49 * qna * qnb
        ORDER BY 1, 2"""))
  }

  // SEMANTIC decontamination — dc1's n-gram benchmark check misses
  // paraphrased eval leakage; this flags training vectors whose
  // embedding sits within cosine 7/20 of ANY eval-set embedding (the
  // vec_id % 10 == 3 slice plays the benchmark). Same plan bones as
  // dd11: the eval set is SMALL BY DEFINITION, so its bucket tables
  // broadcast into the corpus scan (zero corpus shuffle at candidate
  // time) and only candidates pay the BIGINT-exact quantized-cosine
  // verify. Output = per contaminated training vector, how many eval
  // items it matches (the removal list with evidence counts).
  private val dc4 = {
    val planes = 4; val tables = 2; val dim = 64
    val planeSets = (0 until tables).map(t => planeFamily(t, planes, dim))
    Q(
      "q_dc4_semantic_decontamination",
      "semantic decontamination: corpus vectors within cosine 7/20 of any eval embedding",
      (s, d) => {
        val e = Tables.embeddings(s, d)
        EmbeddingDedup.nearDupAgainstCorpusExact(
            e.filter(col("vec_id") % 10 === 3), e.filter(col("vec_id") % 10 =!= 3),
            tNum = 7, tDen = 20, planes = planes, tables = tables, dim = dim)
          .groupBy(col("corpus_id"))
          .agg(count(lit(1)).cast(LongType).as("n_eval_hits"))
          .orderBy(col("corpus_id"))
      },
      Some(s"""
        WITH q AS (
          SELECT vec_id,
                 ${intHyperplaneBucketSql("embedding", planeSets(0))} AS b0,
                 ${intHyperplaneBucketSql("embedding", planeSets(1))} AS b1,
                 list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv
          FROM embeddings),
        qq AS (
          SELECT vec_id, b0, b1, qv,
                 list_sum(list_transform(qv, x -> x * x)) AS qn
          FROM q),
        cand AS (
          SELECT DISTINCT b.vec_id AS batch_id, c.vec_id AS corpus_id
          FROM qq b JOIN qq c
            ON (b.b0 = c.b0 OR b.b1 = c.b1)
          WHERE b.vec_id % 10 = 3 AND c.vec_id % 10 <> 3),
        v AS (
          SELECT cand.batch_id, cand.corpus_id,
                 list_sum(list_transform(b.qv, (x, j) -> x * c.qv[j])) AS qdot,
                 b.qn AS qna, c.qn AS qnb
          FROM cand
          JOIN qq b ON b.vec_id = cand.batch_id
          JOIN qq c ON c.vec_id = cand.corpus_id)
        SELECT corpus_id, CAST(count(*) AS BIGINT) AS n_eval_hits FROM v
        WHERE qdot > 0 AND 400 * qdot * qdot >= 49 * qna * qnb
        GROUP BY corpus_id
        ORDER BY corpus_id"""))
  }

  // Semantic dedup (SemDeDup): trained k-means cells bound the pair
  // search — near-dup pairs are only sought within a cell, never across
  // the corpus. 8 cells keep the planted near-dup pairs mostly
  // co-celled at sf0.01; threshold 7/20 as in dd6 (the corpus tops out
  // near cos 0.51). The oracle replays the ENTIRE pipeline — Lloyd
  // training included — so the gate checks training, assignment and the
  // BIGINT-exact within-cell verify end to end.
  private val dd8 = {
    val k = 8; val iters = 2; val rate = 0.5
    Q(
      "q_dd8_semantic_dedup",
      s"SemDeDup: trained $k-cell k-means clustering, within-cell BIGINT-exact cosine dedup (7/20)",
      (s, d) => SemanticDedup.dedup(s, Tables.embeddings(s, d),
          k = k, iters = iters, sampleRate = rate, tNum = 7, tDen = 20,
          codebookKey = Some(s"semdedup|$k|$iters|$rate|$d"), codebookSrcDir = d)
        .orderBy(col("vec_id")),
      Some(s"""
        WITH samp AS (
          SELECT 0 AS grp, vec_id, ${KMeans.quantizeSql("embedding")} AS qv
          FROM embeddings
          WHERE substring(md5(CAST(vec_id AS VARCHAR)), 1, 8) < '${Sampling.hexThreshold(rate)}'),
        ${KMeans.trainSqlCtes("samp", k, iters, 64)},
        pts AS (
          SELECT vec_id, ${KMeans.quantizeSql("embedding")} AS qv FROM embeddings),
        cells AS (
          SELECT vec_id, qv, cell FROM (
            SELECT p.vec_id, p.qv, c.cent_id AS cell,
                   row_number() OVER (PARTITION BY p.vec_id ORDER BY
                     ${KMeans.sqDistQSql("p.qv", "c.cvec")} ASC, c.cent_id ASC) AS rn
            FROM pts p CROSS JOIN cent$iters c) WHERE rn = 1),
        qq AS (
          SELECT vec_id, cell, qv,
                 list_sum(list_transform(qv, x -> x * x)) AS qn
          FROM cells),
        v AS (
          SELECT b.vec_id,
                 list_sum(list_transform(a.qv, (x, j) -> x * b.qv[j])) AS qdot,
                 a.qn AS qna, b.qn AS qnb
          FROM qq a JOIN qq b ON a.cell = b.cell AND a.vec_id < b.vec_id),
        dropped AS (
          SELECT DISTINCT vec_id FROM v
          WHERE qdot > 0 AND 400 * qdot * qdot >= 49 * qna * qnb)
        SELECT q.vec_id, q.cell,
               CAST(CASE WHEN d.vec_id IS NULL THEN 1 ELSE 0 END AS BIGINT) AS kept
        FROM qq q LEFT JOIN dropped d ON d.vec_id = q.vec_id
        ORDER BY q.vec_id"""))
  }

  // Exact substring-span dedup (Lee et al.): per-document coverage of
  // 5-token spans whose text occurred earlier in the corpus. The
  // oracle's single rank-by-gram window is the semantic definition; the
  // implementation first drops single-occurrence grams with a
  // map-side-combinable count (the dd4 two-phase move), so the window
  // only ever sees the duplicated slice.
  private val dd9 = {
    val k = 5
    Q(
      "q_dd9_substring_spans",
      s"exact substring dedup: per-doc coverage of duplicated $k-token spans",
      (s, d) => SubstringDedup.spanCoverage(Tables.documents(s, d), "doc_id", "text", k)
        .orderBy(col("doc_id")),
      Some(s"""
        WITH ${SubstringDedup.toksGramsSqlCtes(k)},
        ${SubstringDedup.dupFlaggedSqlCte},
        ${SubstringDedup.covSqlCte(k)},
        dup AS (SELECT doc_id, count(*) AS dup_tokens FROM cov GROUP BY doc_id)
        SELECT t.doc_id, len(t.w) AS n_tokens,
               coalesce(d.dup_tokens, 0) AS dup_tokens
        FROM toksq t LEFT JOIN dup d ON d.doc_id = t.doc_id
        ORDER BY t.doc_id"""))
  }

  // The CUT step of Lee et al. (dd9 measures coverage; this REWRITES):
  // every 5-token span whose text occurred earlier in the corpus is
  // deleted, keeping the first occurrence corpus-wide. The oracle
  // reconstructs the cleaned text from surviving token positions the
  // same way.
  private val dd12 = {
    val k = 5
    Q(
      "q_dd12_span_removal",
      s"exact substring dedup, cut step: duplicated $k-token spans removed from the text",
      (s, d) => SubstringDedup.cutSpans(Tables.documents(s, d), "doc_id", "text", k)
        .orderBy(col("doc_id")),
      Some(s"""
        WITH ${SubstringDedup.toksGramsSqlCtes(k)},
        ${SubstringDedup.dupFlaggedSqlCte},
        ${SubstringDedup.covSqlCte(k)},
        ${SubstringDedup.cutRebuildSqlCtes("")}
        SELECT t.doc_id, len(t.w) AS n_tokens,
               coalesce(r.n_kept, 0) AS n_kept,
               coalesce(r.clean_text, '') AS clean_text
        FROM toksq t LEFT JOIN r ON r.doc_id = t.doc_id
        ORDER BY t.doc_id"""))
  }

  // The CUT step of span decontamination (dc2 measures coverage; this
  // REWRITES): benchmark-matching n-gram spans removed from every
  // corpus doc, rest of the text kept — the surgical alternative to
  // dc1's whole-document drop. dc2's flagged set feeding dd12's
  // positional rebuild; all CTEs shared.
  private val dc3 = {
    val k = 5
    Q(
      "q_dc3_contamination_cut",
      s"span-level decontamination cut: benchmark $k-gram spans removed from corpus docs",
      (s, d) => {
        val doc = Tables.documents(s, d)
        Decontamination.cutContaminated(
            doc.filter(col("doc_id") % 11 =!= 0),
            doc.filter(col("doc_id") % 11 === 0),
            "doc_id", "text", n = k)
          .orderBy(col("doc_id"))
      },
      Some(s"""
        WITH ${SubstringDedup.toksGramsSqlCtes(k)},
        bench AS (SELECT DISTINCT gram FROM grams WHERE doc_id % 11 = 0),
        flagged AS (
          SELECT doc_id, pos FROM grams
          WHERE doc_id % 11 <> 0 AND gram IN (SELECT gram FROM bench)),
        ${SubstringDedup.covSqlCte(k)},
        ${SubstringDedup.cutRebuildSqlCtes("WHERE doc_id % 11 <> 0")}
        SELECT t.doc_id, len(t.w) AS n_tokens,
               coalesce(r.n_kept, 0) AS n_kept,
               coalesce(r.clean_text, '') AS clean_text
        FROM toksq t LEFT JOIN r ON r.doc_id = t.doc_id
        WHERE t.doc_id % 11 <> 0
        ORDER BY t.doc_id"""))
  }

  override val all: Seq[Q] =
    Seq(dd1, dd2, dd3, dd4, dd5, dd6, dc1, dc2, dc3, dc4, dd7, dd8, dd9, dd10, dd11,
      dd12, dd13, dd14, dd15)
}
