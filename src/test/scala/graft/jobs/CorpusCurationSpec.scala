package graft.jobs

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** End-to-end corpus curation: each stage must drop exactly the doc it
  * exists to drop. */
class CorpusCurationSpec extends SparkSpec {

  test("funnel drops low-quality, unknown-lang, exact-dup and near-dup docs") {
    import spark.implicits._
    val good = "the quick brown fox jumps over the lazy dog and runs far " +
      "away into the green forest while the sun shines bright over distant hills today"
    val nearDup = good.replace("today", "tonight")
    val docs = Seq(
      (1L, good, "en", "web"),                         // keeper (lowest id of the dup set)
      (2L, good, "en", "web"),                         // exact dup of 1 → dropped at stage 3
      (3L, nearDup, "en", "web"),                      // near dup of 1 → dropped at stage 4
      (4L, "zzz qqq xxx", "und", "web"),               // no lang markers → gated
      (5L, "the the the the the the the the", "en", "web"), // all stopwords → low quality → gated
      (6L, "der schnelle braune fuchs springt über den faulen hund und läuft weit " +
        "in den grünen wald während die sonne hell über fernen hügeln scheint", "de", "web")
    ).toDF("doc_id", "text", "lang", "source")

    val (curated, report) = CorpusCuration.run(docs)
    val ids = curated.select("doc_id").as[Long].collect().toSet
    assert(ids == Set(1L, 6L), s"got $ids")
    val r = report.head()
    assert(r.getAs[Long]("n_input") == 6)
    assert(r.getAs[Long]("n_gated") == 4)        // 4,5 gated out
    assert(r.getAs[Long]("n_exact_unique") == 3) // 2 deduped
    assert(r.getAs[Long]("n_curated") == 2)      // 3 near-deduped
    // stats columns survive into the curated output
    assert(curated.columns.toSet.contains("quality") && curated.columns.contains("pred_lang"))
    assert(curated.filter(col("doc_id") === 6).head().getAs[String]("pred_lang") == "de")
  }

  test("cluster dedup keeps one doc per near-dup component") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog and runs far " +
      "away into the green forest while the sun shines bright over distant hills"
    // 1~2 and 2~3 are near-dups (one word differs from 2 each); with
    // cluster dedup only doc 1 survives the component {1,2,3}
    val docs = Seq(
      (1L, base + " today", "en", "web"),
      (2L, base + " now", "en", "web"),
      (3L, base + " soon", "en", "web")
    ).toDF("doc_id", "text", "lang", "source")
    val (curated, _) = CorpusCuration.run(docs,
      CorpusCuration.Config(jaccardThreshold = 0.6, clusterDedup = true))
    assert(curated.select("doc_id").as[Long].collect().toSet == Set(1L))
  }

  test("optional stages: repetition gate and decontamination compose into the funnel") {
    import spark.implicits._
    val good = "the quick brown fox jumps over the lazy dog and runs far " +
      "away into the green forest while the sun shines bright over distant hills today"
    val repetitive = "the spark engine " + ("spark " * 40).trim // top token 'spark' ≈ 41/43
    val leaky = "we know the quick brown fox jumps over the lazy dog quite well indeed"
    val docs = Seq(
      (1L, good, "en", "web"),
      (2L, repetitive, "en", "web"),
      (3L, leaky, "en", "web")
    ).toDF("doc_id", "text", "lang", "source")
    val bench = Seq((99L, good)).toDF("doc_id", "text")

    // base config keeps all three (they pass quality/lang and differ)
    val (base, _) = CorpusCuration.run(docs)
    assert(base.select("doc_id").as[Long].collect().toSet == Set(1L, 2L, 3L))

    // repetition cap drops doc 2; decontamination vs `good` drops 1 and 3
    val (curated, report) = CorpusCuration.run(docs, CorpusCuration.Config(
      maxTopTokenFrac = Some(0.5), benchmark = Some(bench)))
    assert(curated.select("doc_id").as[Long].collect().toSet == Set.empty[Long])
    val r = report.head()
    assert(r.getAs[Long]("n_input") == 3 && r.getAs[Long]("n_gated") == 0)

    // decontamination alone: doc 2 survives
    val (dc, _) = CorpusCuration.run(docs, CorpusCuration.Config(
      benchmark = Some(bench)))
    assert(dc.select("doc_id").as[Long].collect().toSet == Set(2L))
  }

  test("optional substring-span gate drops heavy quoters, keeps originals") {
    import spark.implicits._
    val original = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"
    // doc 2 = a fresh half + a verbatim half of doc 1 → ~50% coverage
    val quoter = "one two three four five six seven eight nine ten " +
      "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq(
      (1L, original, "en", "web"),
      (2L, quoter, "en", "web")
    ).toDF("doc_id", "text", "lang", "source")
    // cap above the quoter's coverage: both survive
    val (loose, _) = CorpusCuration.run(docs, CorpusCuration.Config(
      minQuality = 0.0, langs = Seq("en", "und"), maxDupSpanFrac = Some(0.6)))
    assert(loose.select("doc_id").as[Long].collect().toSet == Set(1L, 2L))
    // cap below it: the quoter drops, the original (earlier occurrence) stays
    val (strict, report) = CorpusCuration.run(docs, CorpusCuration.Config(
      minQuality = 0.0, langs = Seq("en", "und"), maxDupSpanFrac = Some(0.3)))
    assert(strict.select("doc_id").as[Long].collect().toSet == Set(1L))
    assert(report.head().getAs[Long]("n_gated") == 1)
  }

  test("optional LM gate keeps reference-like docs, drops out-of-domain") {
    import spark.implicits._
    // reference domain: a tight loop of English function words, so its
    // bigrams are all the LM knows; the off-domain doc shares none
    val refText = (0 until 30).map(i => Seq("the", "cat", "sat", "on", "mat")(i % 5))
      .mkString(" ")
    val inDomain = "the cat sat on mat the cat sat on mat the cat sat on mat"
    val offDomain = "quasar nebula pulsar quark gluon meson lepton boson photon axion " +
      "quasar nebula pulsar quark gluon"
    val docs = Seq(
      (1L, inDomain, "en", "web"),
      (2L, offDomain, "en", "web")
    ).toDF("doc_id", "text", "lang", "source")
    val ref = Seq((99L, refText)).toDF("doc_id", "text")

    // without the stage both survive (quality/lang relaxed)
    val relaxed = CorpusCuration.Config(minQuality = 0.0, langs = Seq("en", "und"))
    val (base, _) = CorpusCuration.run(docs, relaxed)
    assert(base.select("doc_id").as[Long].collect().toSet == Set(1L, 2L))

    // with it, the out-of-domain doc is gated; the funnel reflects it
    val (curated, report) = CorpusCuration.run(docs, relaxed.copy(
      lmReference = Some(ref), lmMinScore = 100L))
    assert(curated.select("doc_id").as[Long].collect().toSet == Set(1L))
    assert(report.head().getAs[Long]("n_gated") == 1)
  }

  test("runs clean over the sf0.001 documents table") {
    val docs = graft.Tables.documents(spark, sf0001)
    val (curated, report) = CorpusCuration.run(docs)
    val r = report.head()
    assert(r.getAs[Long]("n_curated") > 0)
    assert(r.getAs[Long]("n_curated") <= r.getAs[Long]("n_input"))
    assert(curated.count() == r.getAs[Long]("n_curated"))
  }
}
