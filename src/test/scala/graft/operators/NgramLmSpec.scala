package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Hashed bigram-LM guarantees: hand-computed likelihoods on a tiny
  * corpus, model boundedness, degenerate-document handling, and the
  * discrimination property the CCNet perplexity filter exists for —
  * reference-distribution text outscores out-of-domain text. */
class NgramLmSpec extends SparkSpec {
  import NgramLm._

  private def df(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("hand-computed score: repeated bigram vs unseen bigram") {
    // reference = "a b a b": pairs (a,b) (b,a) (a,b) → c1: a=2, b=1;
    // c2: (a,b)=2, (b,a)=1  (distinct md5 buckets — collision odds
    // ~1e-4 and deterministic, the suite would fail loudly)
    val docs = df(0L -> "a b a b", 1L -> "a b", 2L -> "x y")
    val model = train(docs, "text", col("doc_id") === 0L)
    val out = scoreExact(docs.filter(col("doc_id") > 0L), "doc_id", "text", model, 40L)
      .orderBy(col("doc_id")).collect()
    // doc 1: one pair (a,b): q = 1e6·(2+1) div (2+65536) = 45
    assert(out(0).getAs[Long]("n_bigrams") == 1L)
    assert(out(0).getAs[Long]("lm_score") == 1000000L * 3 / 65538)
    assert(out(0).getAs[Long]("ref_like") == 1L)
    // doc 2: unseen context and bigram: q = 1e6·1 div 65536 = 15
    assert(out(1).getAs[Long]("lm_score") == 1000000L / 65536)
    assert(out(1).getAs[Long]("ref_like") == 0L)
  }

  test("documents with fewer than 2 tokens survive with score 0, never ref-like") {
    val docs = df(0L -> "a b", 1L -> "only", 2L -> "", 3L -> "a b c")
    val model = train(docs, "text", col("doc_id") === 0L)
    val out = scoreExact(docs, "doc_id", "text", model, 1L)
      .orderBy(col("doc_id")).collect()
    assert(out.length == 4, "every document must appear in the scored frame")
    assert(out(1).getAs[Long]("n_bigrams") == 0L && out(1).getAs[Long]("lm_score") == 0L)
    assert(out(2).getAs[Long]("n_bigrams") == 0L && out(2).getAs[Long]("ref_like") == 0L)
    assert(out(3).getAs[Long]("n_bigrams") == 2L)
  }

  test("model is bounded by the bucket space and balanced (Σc1 = Σc2)") {
    val docs = df((0L until 50L).map(i => i -> s"w${i % 7} w${(i * 3) % 7} w${(i * 5) % 7} tail$i"): _*)
    val model = train(docs, "text", lit(true))
    val kinds = model.groupBy(col("kind")).agg(sum(col("cnt")).as("s"), count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(kinds(0L)._1 == kinds(1L)._1, "unigram-context mass must equal bigram mass")
    assert(kinds(0L)._2 <= Buckets && kinds(1L)._2 <= Buckets)
  }

  test("KN hand-computed: discounted seen mass + continuation backoff") {
    // reference "a b a b": pairs (a,b) (b,a) (a,b) →
    //   c1: a=2, b=1; c2: ab=2, ba=1; N1+(a,·)=1, N1+(b,·)=1;
    //   N1+(·,a)=1 ({b}), N1+(·,b)=1 ({a}); Nt=2 types
    val docs = df(0L -> "a b a b", 1L -> "a b", 2L -> "b a", 3L -> "x y")
    val model = trainKn(docs, "text", col("doc_id") === 0L)
    val out = scoreKnExact(docs.filter(col("doc_id") > 0L), "doc_id", "text", model)
      .orderBy(col("doc_id")).collect()
    // "a b": q = (1e6·max(4·2−3,0)) div (4·2) + (1e6·3·1·1) div (4·2·2)
    assert(out(0).getAs[Long]("kn_score") == 1000000L * 5 / 8 + 3000000L / 16)
    // "b a": q = (1e6·1) div 4 + (1e6·3) div (4·1·2)
    assert(out(1).getAs[Long]("kn_score") == 250000L + 3000000L / 8)
    // "x y": unseen context AND unseen continuation → 0
    assert(out(2).getAs[Long]("kn_score") == 0L)
  }

  test("KN: unseen context with a SEEN continuation still gets backoff mass") {
    // reference teaches (a,b); probe "z b" has unseen context z but b
    // has continuation count 1 of Nt=1 types → q = 1e6·1 div 1
    val docs = df(0L -> "a b", 1L -> "z b")
    val model = trainKn(docs, "text", col("doc_id") === 0L)
    val out = scoreKnExact(docs.filter(col("doc_id") === 1L), "doc_id", "text", model)
      .collect()
    assert(out.head.getAs[Long]("kn_score") == 1000000L)
  }

  test("KN model: bounded rows, single type-total row, degenerate docs score 0") {
    val docs = df((0L until 40L).map(i =>
      i -> s"w${i % 6} w${(i * 5) % 6} w${(i * 7) % 6}"): _*)
    val model = trainKn(docs, "text", lit(true))
    val byKind = model.groupBy(col("kind")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byKind.keySet == Set(0L, 1L, 2L, 3L, 4L))
    assert(byKind(0L) == byKind(2L), "every context has both a raw and a type count")
    assert(byKind.values.forall(_ <= Buckets))
    assert(byKind(4L) == 1L)
    val deg = scoreKnExact(df(100L -> "solo", 101L -> ""), "doc_id", "text", model)
      .orderBy(col("doc_id")).collect()
    assert(deg.forall(r => r.getAs[Long]("kn_score") == 0L &&
      r.getAs[Long]("n_bigrams") == 0L))
  }

  test("trigram KN hand-computed: three-level discount recursion") {
    // reference "a b c a b c": trigrams (a,b,c) (b,c,a) (c,a,b) (a,b,c)
    //   c12: ab=2, bc=1, ca=1;  c123: abc=2, bca=1, cab=1
    //   N2 per context = 1 everywhere; pair types (w2,w3): bc=2,ca=1,ab=1
    //   na = 1 everywhere; nm = nf = 1 per middle; nu = 1 per last; Nt = 3
    val docs = df(0L -> "a b c a b c", 1L -> "a b c", 2L -> "x b c", 3L -> "x y z")
    val model = trainKn3(docs, "text", col("doc_id") === 0L)
    val out = scoreKn3Exact(docs.filter(col("doc_id") > 0L), "doc_id", "text", model)
      .orderBy(col("doc_id")).collect()
    // "a b c": seen context — (1e6·max(8−3,0)) div (4·2) = 625000
    //   + (1e6·3·1·max(4−3,0)) div (16·2·1) = 93750
    //   + (((1e6·9·1·1) div (16·2·1)) · 1) div 3 = 281250 div 3 = 93750
    assert(out(0).getAs[Long]("n_trigrams") == 1L)
    assert(out(0).getAs[Long]("kn3_score") == 625000L + 93750L + 93750L)
    // "x b c": unseen context, seen middle — (1e6·max(4−3,0)) div 4
    //   + (1e6·3·1·1) div (4·1·3) = 250000 + 250000
    assert(out(1).getAs[Long]("kn3_score") == 500000L)
    // "x y z": everything unseen → 0
    assert(out(2).getAs[Long]("kn3_score") == 0L)
  }

  test("trigram KN model: 8 kinds, bounded rows, one total row; short docs score 0") {
    val docs = df((0L until 40L).map(i =>
      i -> s"w${i % 5} w${(i * 3) % 5} w${(i * 7) % 5} w${(i * 11) % 5}"): _*)
    val model = trainKn3(docs, "text", lit(true))
    val byKind = model.groupBy(col("kind")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byKind.keySet == Set(0L, 1L, 2L, 3L, 4L, 5L, 6L, 7L))
    assert(byKind(0L) == byKind(2L) && byKind(4L) == byKind(5L))
    assert(byKind.values.forall(_ <= Buckets))
    assert(byKind(7L) == 1L)
    val deg = scoreKn3Exact(df(100L -> "a b", 101L -> ""), "doc_id", "text", model)
      .orderBy(col("doc_id")).collect()
    assert(deg.forall(r => r.getAs[Long]("kn3_score") == 0L &&
      r.getAs[Long]("n_trigrams") == 0L))
  }

  test("trigram KN rejects a reference slice with no trigrams (named require, not div-0)") {
    val docs = df(0L -> "a b", 1L -> "c d e")
    val model = trainKn3(docs, "text", col("doc_id") === 0L) // ref doc has 2 tokens
    val e = intercept[IllegalArgumentException] {
      scoreKn3Exact(docs.filter(col("doc_id") === 1L), "doc_id", "text", model)
    }
    assert(e.getMessage.contains("no trigrams"))
  }

  test("discrimination: reference-like text outscores out-of-domain text") {
    // reference: bigrams drawn from a tight 5-word loop; in-domain doc
    // repeats those bigrams, out-of-domain doc shares zero vocabulary
    val loop = (0 until 60).map(i => s"t${i % 5}").mkString(" ")
    val docs = df(0L -> loop, 1L -> loop, 2L -> "t0 t1 t2 t3 t4 t0 t1 t2",
      3L -> "zz qq rr ss tt uu vv ww")
    val model = train(docs, "text", col("doc_id") < 2L)
    val out = scoreExact(docs.filter(col("doc_id") >= 2L), "doc_id", "text", model, 1L)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("lm_score")).toMap
    assert(out(2L) > out(3L),
      s"in-domain ${out(2L)} must outscore out-of-domain ${out(3L)}")
    // float twin agrees on the ranking (lower log-ppl = more ref-like)
    val ppl = scoreLogPpl(docs.filter(col("doc_id") >= 2L), "doc_id", "text", model)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("log_ppl")).toMap
    assert(ppl(2L) < ppl(3L))
    // the KN scorer agrees on the ranking
    val kn = scoreKnExact(docs.filter(col("doc_id") >= 2L), "doc_id", "text",
      trainKn(docs, "text", col("doc_id") < 2L))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("kn_score")).toMap
    assert(kn(2L) > kn(3L))
  }

  test("DSIR hand-computed: per-feature target/raw ratio, mean, threshold") {
    // target = doc 0 ("a b a b"): ct(a,b)=2, ct(b,a)=1
    // raw = all docs:             cr(a,b)=3, cr(b,a)=1, cr(x,y)=1
    val docs = df(0L -> "a b a b", 1L -> "a b", 2L -> "x y", 3L -> "solo")
    val target = train(docs, "text", col("doc_id") === 0L)
    val raw = train(docs, "text", lit(true))
    val out = scoreDsir(docs, "doc_id", "text", target, raw, 600000L)
      .orderBy(col("doc_id")).collect()
    // doc 0: q(a,b) = 1e6·3 div 4 = 750000, q(b,a) = 1e6·2 div 2 = 1e6
    //        mean = (750000 + 1000000 + 750000) div 3 = 833333
    assert(out(0).getAs[Long]("dsir_score") == 833333L)
    assert(out(0).getAs[Long]("selected") == 1L)
    // doc 1: one (a,b) pair → 750000, selected
    assert(out(1).getAs[Long]("dsir_score") == 750000L)
    assert(out(1).getAs[Long]("selected") == 1L)
    // doc 2: (x,y) unseen in target → 1e6·1 div 2 = 500000 < threshold
    assert(out(2).getAs[Long]("dsir_score") == 500000L)
    assert(out(2).getAs[Long]("selected") == 0L)
    // doc 3: no bigram → score 0, never selected
    assert(out(3).getAs[Long]("n_bigrams") == 0L)
    assert(out(3).getAs[Long]("dsir_score") == 0L && out(3).getAs[Long]("selected") == 0L)
  }

  test("DSIR discrimination: target-like docs outweigh out-of-domain docs") {
    val loop = (0 until 60).map(i => s"t${i % 5}").mkString(" ")
    val docs = df(0L -> loop, 1L -> loop, 2L -> "t0 t1 t2 t3 t4 t0 t1 t2",
      3L -> "zz qq rr ss tt uu vv ww")
    val target = train(docs, "text", col("doc_id") < 2L)
    val raw = train(docs, "text", lit(true))
    val w = scoreDsir(docs.filter(col("doc_id") >= 2L), "doc_id", "text",
      target, raw, 1L)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("dsir_score")).toMap
    assert(w(2L) > w(3L),
      s"target-like ${w(2L)} must outweigh out-of-domain ${w(3L)}")
  }
}
