package graft.operators

import graft.SparkSpec

/** The variant-fuzz in-JVM half: rule-family invariance plus the
  * population pins, including the probed hatch/mismatch guards. */
class VariantFuzzSpec extends SparkSpec {

  private def ruleKeys = Seq(
    graft.plans.TailFrameRewrite.ConfKey,
    graft.plans.TopKProjectInline.ConfKey)

  private def withRules[T](on: Boolean)(body: => T): T = {
    ruleKeys.foreach(k => spark.conf.set(k, on.toString))
    try body finally ruleKeys.foreach(k => spark.conf.set(k, "true"))
  }

  test("same seed generates the identical population") {
    val a = VariantFuzz.queries().map(_.sparkSql)
    assert(a == VariantFuzz.queries().map(_.sparkSql))
    assert(a != VariantFuzz.queries(seed = 9L).map(_.sparkSql))
  }

  test("population pins every variant shape and the probed guards") {
    val qs = VariantFuzz.queries()
    val sql = qs.map(_.sparkSql).mkString("\n")
    Seq(
      "parse_json(", "variant_get(", "try_variant_get(", "try_parse_json(",
      "'$.a'", "'$.n.d'", "'$.s'", // scalar + nested paths
      "'$.b[", "'$.b[2]'", "'$.zz'", // array, OOB, missing key
      "'bigint'", "'string'", "'decimal(10,2)'", "'double'", "'boolean'",
      "'not json'" // the invalid-document hatch arm
    ).foreach { op =>
      assert(sql.contains(op), s"population never generated: $op")
    }
    // a TYPE-MISMATCHED get must always ride the hatch: variant_get
    // on '$.s' (the sometimes-alphabetic key) as a numeric type
    // ERRORS in Spark — only try_variant_get may touch it numerically
    qs.foreach { q =>
      assert(!q.sparkSql.contains("variant_get(parse_json") ||
        !"(?<!try_)variant_get\\([^)]*'\\$\\.s', 'bigint'".r.findFirstIn(q.sparkSql).isDefined,
        s"q${q.id}: numeric get of the mismatch key must use try_variant_get")
    }
    // negative variant array indexes error in Spark — never generated
    assert(!sql.contains("[-"), "negative variant indexes are not portable")
  }

  test(s"property: all ${VariantFuzz.NQueries} queries — rule-ON ≡ rule-OFF values") {
    VariantFuzz.registerViews(spark, sf0001)
    for (q <- VariantFuzz.queries()) {
      val on = withRules(on = true)(VariantFuzz.fingerprint(spark, q))
      val off = withRules(on = false)(VariantFuzz.fingerprint(spark, q))
      assert(on == off,
        s"q${q.id} diverges rule-ON vs rule-OFF:\nON=$on OFF=$off\n${q.sparkSql}")
    }
  }
}
