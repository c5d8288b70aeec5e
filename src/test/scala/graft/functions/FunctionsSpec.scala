package graft.functions

import graft.SparkSpec
import graft.functions.TextFunctions._
import graft.functions.VectorFunctions._
import org.apache.spark.sql.functions._

class FunctionsSpec extends SparkSpec {

  test("scrubPii redacts emails and phone numbers, leaves clean text alone") {
    import spark.implicits._
    import graft.functions.TextFunctions._
    val rows = Seq(
      ("mail me at jane.doe+spam@sub.example.co.uk today",
        "mail me at <EMAIL> today"),
      ("call +41 79 123 45 67 or +41 44 555 66 77 now",
        "call <PHONE> or <PHONE> now"),
      ("two leaks: a@b.ch and c.d@e-f.org done",
        "two leaks: <EMAIL> and <EMAIL> done"),
      ("nothing sensitive here at all", "nothing sensitive here at all"))
    val out = rows.map(_._1).toDF("text")
      .select(scrubPii($"text").as("s")).as[String].collect()
    assert(out.toSeq == rows.map(_._2))
  }

  test("vec_dot matches the higher-order-function dot product") {
    import spark.implicits._
    VecExpressions.register(spark)
    val df = Seq((Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f))).toDF("a", "b")
    val Array(fast, slow) = df.select(
      dot(col("a"), col("b")), dotHof(col("a"), col("b"))).head().toSeq.toArray
    assert(fast == slow && fast == 32.0)
  }

  test("vec_dot treats null ELEMENTS as 0 in both codegen and interpreted paths") {
    VecExpressions.register(spark)
    // array() with a null literal gives containsNull=true arrays
    val viaSql = spark.sql(
      "SELECT vec_dot(array(CAST(1.0 AS FLOAT), CAST(NULL AS FLOAT), CAST(3.0 AS FLOAT)), " +
        "array(CAST(4.0 AS FLOAT), CAST(5.0 AS FLOAT), CAST(6.0 AS FLOAT))) AS d")
      .head().getDouble(0)
    assert(viaSql == 1.0 * 4.0 + 3.0 * 6.0, s"null element must contribute 0, got $viaSql")
  }

  test("cosine of identical vectors is 1.0") {
    import spark.implicits._
    VecExpressions.register(spark)
    val df = Seq(Tuple1(Array(0.5f, -0.25f, 1.5f))).toDF("v")
    val c = df.select(cosine(col("v"), col("v"))).as[Double].head()
    assert(math.abs(c - 1.0) < 1e-12)
  }

  test("langId picks marker-dominant language; und when none") {
    import spark.implicits._
    val df = Seq(
      "the cat and the dog of the house",
      "der hund und die katze und das haus",
      "zzz qqq xxx").toDF("text")
    val out = df.select(langId(col("text"))).as[String].collect()
    assert(out.toSeq == Seq("en", "de", "und"))
  }

  test("fingerprint canonicalizes case/punct/whitespace") {
    import spark.implicits._
    val df = Seq("Hello,  World!", "hello world").toDF("t")
    val fps = df.select(fingerprint(col("t"))).as[String].collect()
    assert(fps(0) == fps(1))
  }

  test("simhash: identical docs share signature; disjoint docs differ") {
    import spark.implicits._
    val df = Seq((1L, "alpha beta gamma"), (2L, "alpha beta gamma"), (3L, "delta epsilon zeta"))
      .toDF("id", "text")
    val sh = simhash16(df, "id", "text").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sh(1L) == sh(2L))
    assert(sh(1L) != sh(3L))
  }

  test("minhash signature: near-identical docs collide on bands") {
    import spark.implicits._
    val df = Seq(
      (1L, "a b c d e f g h i j"),
      (2L, "a b c d e f g h i j"),
      (3L, "q r s t u v w x y z")).toDF("id", "text")
    val sh = wordShingles(df, "id", "text", 2)
    val sig = minhashSignature(sh, "id", 8)
    val bands = lshBands(sig, "id", 8, 2)
      .collect().groupBy(_.getLong(0)).view.mapValues(_.map(r => (r.getInt(1), r.getString(2))).toSet).toMap
    assert(bands(1L) == bands(2L))
    assert(bands(1L).intersect(bands(3L)).isEmpty)
  }

  test("wordShingles builds n-grams in order") {
    import spark.implicits._
    val df = Seq((1L, "a b c")).toDF("id", "text")
    val out = wordShingles(df, "id", "text", 2).select("shingle").as[String].collect().toSet
    assert(out == Set("a b", "b c"))
  }

  test("qualityScore is in [0,1] and 0 for empty") {
    import spark.implicits._
    val df = Seq("", "a reasonable length sentence with several plain words here").toDF("t")
    val out = df.select(qualityScore(col("t"))).as[Double].collect()
    assert(out(0) == 0.0 && out(1) > 0.0 && out(1) <= 1.0)
  }

  test("extract_sites: one-pass multi-site extraction matches substring semantics") {
    import spark.implicits._
    graft.functions.SeqExpressions.register(spark)
    val df = Seq(("ACGTN", "ascii"), ("ÄCGT", "multibyte"), ("", "empty"))
      .toDF("seq", "kind")
    val sites = df.select(col("kind"),
      call_function("extract_sites", col("seq"),
        array(lit(1), lit(3), lit(5), lit(99))).as("s"))
      .as[(String, Seq[String])].collect().toMap
    assert(sites("ascii") == Seq("A", "G", "N", ""))
    assert(sites("multibyte") == Seq("Ä", "G", "", ""))   // code-point indexing, not bytes
    assert(sites("empty") == Seq("", "", "", ""))
    // parity with substring() on the same inputs
    val sub = df.select(col("kind"), expr("substring(seq, 3, 1)")).as[(String, String)].collect().toMap
    assert(sub("multibyte") == sites("multibyte")(1))
  }

  test("intProject: hand-computed Rademacher sketch; longSqDist exact") {
    import spark.implicits._
    // quantized (1000, -2000); planes (+1,-1) and (-1,-1)
    val signs = Seq(Seq(1, -1), Seq(-1, -1))
    val df = Seq(Tuple1(Array(1.0f, -2.0f)), Tuple1(Array(1.0f, -2.0f)),
      Tuple1(Array(0.5f, 0.5f))).toDF("v")
    val out = df.select(intProject(col("v"), signs).as("p")).as[Seq[Long]].collect()
    assert(out(0) == Seq(3000L, 1000L))
    assert(out(0) == out(1), "projection is deterministic")
    // longSqDist: identical sketches → 0; hand value vs (500,-1000)-quantized
    val d = df.select(longSqDist(intProject(col("v"), signs),
      intProject(lit(Array(1.0f, -2.0f)).cast("array<float>"), signs)).as("d"))
      .as[Long].collect()
    assert(d(0) == 0L && d(1) == 0L && d(2) > 0L)
  }

  test("hyperplaneBucket groups identical vectors") {
    import spark.implicits._
    val planes = Seq(Seq(1.0, 0.0), Seq(0.0, 1.0))
    val df = Seq(Tuple1(Array(1.0f, 1.0f)), Tuple1(Array(1.0f, 1.0f)), Tuple1(Array(-1.0f, -1.0f)))
      .toDF("v")
    val out = df.select(hyperplaneBucket(col("v"), planes)).as[Long].collect()
    assert(out(0) == out(1) && out(0) != out(2))
  }
}
