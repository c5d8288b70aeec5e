package graft.operators

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** Dedup-family behavior tests beyond the DuckDB gate: the DF cap that
  * keeps dd4's inverted index from going quadratic on hot shingles, and
  * bucket agreement between dd5's LSH pre-filter and its oracle twin.
  */
class DedupSpec extends SparkSpec {

  private def writeDocs(rows: Seq[(Long, String, String, String)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("dedupspec").toString
    rows.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("dd4 DF cap: an all-identical corpus generates zero candidate pairs") {
    // 200 identical docs: every shingle has df=200 > Dd4MaxDf=50, so the
    // capped inverted index emits NO candidates — without the cap this
    // corpus is O(N²) = 19 900 pairs through the self-join. Exact dups
    // are dd1's job (hash-groupBy), not the similarity join's.
    val dir = writeDocs((0L until 200L).map(i =>
      (i, "the quick brown fox jumps over the lazy dog", "en", "web")))
    val out = SparkEntry.queries("q_dd4_ngram_jaccard")(spark, dir)
    assert(out.count() == 0)
  }

  test("dd4 DF cap: rare-shingle near-dups still found; hot shingles still count in Jaccard") {
    // 60 copies of a filler doc (df=60 > cap for its shingles) plus two
    // docs sharing rare shingles AND one hot shingle ("common filler"):
    // the pair must surface via its rare shingles, and its Jaccard must
    // count the hot shingle too (verification is against FULL sets).
    val filler = (0L until 60L).map(i => (100 + i, "common filler text block", "en", "web"))
    val docs = filler ++ Seq(
      (1L, "unique alpha beta gamma delta epsilon common filler", "en", "web"),
      (2L, "unique alpha beta gamma delta zeta common filler", "en", "web"))
    val dir = writeDocs(docs)
    val out = SparkEntry.queries("q_dd4_ngram_jaccard")(spark, dir)
      .filter(col("doc_a") === 1 && col("doc_b") === 2).collect()
    assert(out.length == 1)
    // doc1 bigrams: 7, doc2 bigrams: 7, shared: {unique alpha, alpha
    // beta, beta gamma, gamma delta, common filler} = 5 → 5/9
    assert(math.abs(out.head.getAs[Double]("jaccard") - 5.0 / 9.0) < 1e-12)
  }

  test("decontamination: n-gram overlap with the benchmark flags exactly the leaked docs") {
    import spark.implicits._
    val bench = Seq((1000L, "the capital of france is paris and the capital of italy is rome"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "we know the capital of france is paris since school days"), // shares 5-grams → leaked
      (2L, "completely unrelated text about gardening tools and soil quality here"),
      (3L, "of italy is rome they say")                                  // only a 4-gram run → clean at n=5
    ).toDF("doc_id", "text")
    val hits = Decontamination.contaminationHits(corpus, bench, "doc_id", "text", n = 5, minHits = 1L)
      .as[(Long, Long)].collect().toMap
    // doc 1: "the capital of france is" + "capital of france is paris" = 2 distinct 5-grams
    assert(hits == Map(1L -> 2L))
    val clean = Decontamination.decontaminate(corpus, bench, "doc_id", "text", n = 5)
      .select("doc_id").as[Long].collect().toSet
    assert(clean == Set(2L, 3L))
  }

  test("incremental dedup: batch-vs-corpus pairs only, survivors pass through") {
    import spark.implicits._
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val corpus = Seq(
      (1L, base),
      (2L, "totally different corpus content about something else entirely here"))
      .toDF("doc_id", "text")
    val batch = Seq(
      (100L, base.replace("kappa", "lambda")), // near-dup of corpus 1
      (101L, base.replace("kappa", "lambda")), // batch-internal dup of 100 — NOT this op's job
      (102L, "fresh unseen content with no overlap at all whatsoever today"))
      .toDF("doc_id", "text")
    val state = IncrementalDedup.corpusState(corpus, "doc_id", "text")
    val pairs = IncrementalDedup.pairsAgainstCorpus(batch, state, "doc_id", "text", 0.7)
      .select("batch_id", "corpus_id").as[(Long, Long)].collect().toSet
    assert(pairs == Set((100L, 1L), (101L, 1L)), s"got $pairs")
    val fresh = IncrementalDedup.newDocs(batch, state, "doc_id", "text", 0.7)
      .select("doc_id").as[Long].collect().toSet
    assert(fresh == Set(102L))
  }

  test("dd10 clusters: pair graph closes into components with one representative each") {
    // a 3-clique of exact dups (pairwise jaccard 1 → banding cannot
    // miss them) plus a 2-cluster and a singleton: greedy pair logic
    // would drop 2,3,5 by inspecting pairs independently — the cluster
    // form must produce components {1,2,3} and {4,5}, keep the min id
    // of each, and leave the pairless doc 7 out entirely
    val t1 = (0 until 30).map(i => s"w$i").mkString(" ")
    val t2 = (50 until 80).map(i => s"w$i").mkString(" ")
    val dir = writeDocs(Seq(
      (1L, t1, "en", "s"), (2L, t1, "en", "s"), (3L, t1, "en", "s"),
      (4L, t2, "en", "s"), (5L, t2, "en", "s"),
      (7L, "totally different text here now", "en", "s")))
    val out = SparkEntry.queries("q_dd10_dup_clusters")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.map(t => (t._1, t._2)).toSet ==
      Set((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L), (5L, 4L)))
    // kept iff the doc IS its component's min id — one keeper per cluster
    assert(out.forall { case (v, c, k) => (k == 1L) == (v == c) })
    assert(!out.exists(_._1 == 7L))
  }

  test("PQ encode: every sub-centroid vector encodes to its own id in all subspaces") {
    // vec i < 16 IS the i-th sub-centroid in every subspace, so its
    // nearest sub-centroid is itself (distance 0) unless another
    // centroid shares the exact quantized subvector — in which case
    // the lowest id wins; either way the code must be ≤ i everywhere
    val out = graft.SparkEntry.queries("q_ann4_pq_encode")(spark, sf0001)
      .filter(org.apache.spark.sql.functions.col("vec_id") < 16)
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[String]("pq_code"))
    assert(out.length == 16)
    out.foreach { case (id, code) =>
      val parts = code.split("-").map(_.toLong)
      assert(parts.length == 8, s"vec $id: $code")
      assert(parts.forall(_ <= id), s"vec $id must encode to ids <= itself, got $code")
    }
  }

  test("dd5/ann2 bucket: Spark intHyperplaneBucket equals the generated DuckDB SQL literal form") {
    import graft.functions.VectorFunctions._
    import spark.implicits._
    // integer-exactness: recompute the bucket in pure Scala integer
    // arithmetic from the same signs and compare
    val signs = AnnQueries.lshSigns
    val vecs = (0 until 50).map { i =>
      (i.toLong, (0 until 64).map(j => ((i * 31 + j * 7) % 17 - 8) / 8.0f).toArray)
    }
    val df = vecs.toDF("vec_id", "embedding")
    val got = df.select(col("vec_id"), intHyperplaneBucket(col("embedding"), signs).as("b"))
      .as[(Long, Long)].collect().toMap
    vecs.foreach { case (id, v) =>
      val expected = signs.zipWithIndex.map { case (p, i) =>
        val d = v.zip(p).map { case (x, s) => math.floor(x.toDouble * 1000.0).toLong * s }.sum
        if (d > 0) 1L << i else 0L
      }.sum
      assert(got(id) == expected, s"bucket mismatch for vec $id")
    }
  }
}
