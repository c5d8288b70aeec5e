package graft.genomics

import graft.SparkSpec
import graft.genomics.GeoRules._

class GeoRulesSpec extends SparkSpec {

  private def rules(lines: String*) = parseRules(lines)

  test("exact match rewrites all four levels") {
    val r = rules("europe/germany/bavaria/munich\tEurope/Germany/Bavaria/Munich")
    assert(resolve(r, GeoLocation("Europe", "germany", "bavaria", "munich")) ==
      GeoLocation("Europe", "Germany", "Bavaria", "Munich"))
  }

  test("wildcard LHS matches any value at that level") {
    val r = rules("*/usa/*/*\t*/USA/*/*")
    assert(resolve(r, GeoLocation("North America", "usa", "CA", "LA")) ==
      GeoLocation("North America", "USA", "CA", "LA"))
  }

  test("RHS * passes the input value through") {
    val r = rules("europe/ch/*/*\tEurope/Switzerland/*/*")
    assert(resolve(r, GeoLocation("europe", "ch", "Zurich", "")) ==
      GeoLocation("Europe", "Switzerland", "Zurich", null))
  }

  test("full match shadows wildcard when both exist") {
    val r = rules(
      "europe/*/*/*\tEurope/Unknown/*/*",
      "europe/france/*/*\tEurope/France/*/*")
    assert(resolve(r, GeoLocation("europe", "france", "", "")) ==
      GeoLocation("Europe", "France", null, null))
    assert(resolve(r, GeoLocation("europe", "italy", "", "")) ==
      GeoLocation("Europe", "Unknown", null, null))
  }

  test("rules chain to fixpoint") {
    val r = rules(
      "europe/helvetia/*/*\tEurope/ch/*/*",
      "europe/ch/*/*\tEurope/Switzerland/*/*")
    assert(resolve(r, GeoLocation("europe", "helvetia", "", "")).country == "Switzerland")
  }

  test("cyclic rules throw after guard") {
    val r = rules(
      "e/a/*/*\te/b/*/*",
      "e/b/*/*\te/a/*/*")
    assertThrows[RuntimeException](resolve(r, GeoLocation("e", "a", "", "")))
  }

  test("no matching rule returns trimmed input (empty → null)") {
    val r = rules("x/y/z/w\tX/Y/Z/W")
    assert(resolve(r, GeoLocation(" Asia ", "Japan", "", null)) ==
      GeoLocation("Asia", "Japan", null, null))
  }

  test("malformed rule lines are skipped") {
    val r = rules("not a rule", "a/b\tc/d", "e/f/g/h\tE/F/G/H")
    assert(resolve(r, GeoLocation("e", "f", "g", "h")).region == "E")
  }

  test("spark UDF application resolves on a DataFrame") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val r = rules("europe/ch/*/*\tEurope/Switzerland/*/*")
    val f = resolveUdf(spark, r)
    val out = Seq(("europe", "ch", "ZH", "")).toDF("r", "c", "d", "l")
      .select(f(col("r"), col("c"), col("d"), col("l")).as("g"))
      .select("g.country").as[String].head()
    assert(out == "Switzerland")
  }
}
