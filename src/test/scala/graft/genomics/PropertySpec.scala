package graft.genomics

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.genomics.MutationCaller._
import graft.genomics.GeoRules._

/** Property tests for the pure genomics kernels (SURVEY §5: the
  * reference ships no tests; we property-test the pure functions).
  * Raw ScalaCheck (no scalatest bridge in the offline cache). */
class PropertySpec extends AnyFunSuite {

  private def check(name: String, prop: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, s"$name: $res")
  }

  private val baseGen = Gen.oneOf('A', 'C', 'G', 'T')
  private val seqCharGen = Gen.frequency(
    (8, baseGen), (1, Gen.const('N')), (1, Gen.const('-')), (1, Gen.oneOf('Y', 'R', 'W')))
  private def seqGen(n: Int) = Gen.listOfN(n, seqCharGen).map(_.mkString)
  private def refGen(n: Int) = Gen.listOfN(n, baseGen).map(_.mkString)

  test("D1: calls differ from reference, are ACGT/-, in range, deterministic") {
    check("d1-basic", Prop.forAll(refGen(40), seqGen(40)) { (ref, s) =>
      val muts = callMutations(ref, Set.empty)(s)
      muts == callMutations(ref, Set.empty)(s) &&
        muts.forall(m => m.position >= 1 && m.position <= 40 &&
          "ACGT-".contains(m.mutation) && m.mutation.head != ref(m.position - 1))
    })
  }

  test("D1: masked sites never emitted; identity sequence calls nothing") {
    check("d1-masked", Prop.forAll(refGen(40), seqGen(40), Gen.someOf(1 to 40)) {
      (ref, s, masked) =>
        !callMutations(ref, masked.toSet)(s).exists(m => masked.contains(m.position))
    })
    check("d1-identity", Prop.forAll(refGen(40)) { ref =>
      callMutations(ref, Set.empty)(ref).isEmpty
    })
  }

  test("D1: leading/trailing gap runs never produce deletion calls") {
    check("d1-gapruns", Prop.forAll(refGen(30), Gen.chooseNum(0, 10), Gen.chooseNum(0, 10)) {
      (ref, lead, trail) =>
        val coreLen = 30 - lead - trail
        coreLen < 0 || {
          val s = "-" * lead + ref.substring(lead, lead + coreLen) + "-" * trail
          !callMutations(ref, Set.empty)(s)
            .exists(m => m.position <= lead || m.position > 30 - trail)
        }
    })
  }

  test("D4: pairsnp distance is symmetric, zero on self, triangle-ish bounded") {
    import graft.similarity.Priorities
    check("d4-sym", Prop.forAll(refGen(30), seqGen(30), seqGen(30)) { (ref, a, b) =>
      val sa = Priorities.encode("a", ref, a)
      val sb = Priorities.encode("b", ref, b)
      Priorities.distance(sa, sb) == Priorities.distance(sb, sa) &&
        Priorities.distance(sa, sa) == 0 &&
        Priorities.distance(sa, sb) <= sa.positions.length + sb.positions.length
    })
  }

  test("D5: resolve reaches a fixpoint (or the cycle guard fires)") {
    val short = Gen.choose('a', 'e').map(_.toString) // tiny alphabet → chains/cycles likely
    val rulesGen = Gen.listOf(for { c1 <- short; c2 <- short }
      yield s"europe/$c1/*/*\tEurope/$c2/*/*")
    check("d5-fixpoint", Prop.forAll(rulesGen, short) { (lines, country) =>
      val r = parseRules(lines)
      try {
        val once = resolve(r, GeoLocation("europe", country, "", ""))
        resolve(r, once) == once
      } catch {
        case e: RuntimeException => e.getMessage.contains("1000") // cycle guard is the accepted outcome
      }
    })
  }

  test("D7: frameshift expression agrees with direct gap arithmetic") {
    val gapsGen = Gen.nonEmptyListOf(for {
      s <- Gen.chooseNum(1, 1000); len <- Gen.chooseNum(1, 30)
    } yield (s, s + len))
    val spark = graft.TestSession.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // evaluate in one Spark pass over many generated rows (per-row
    // spark jobs would be prohibitively slow under forAll)
    val samples = Gen.listOfN(300, gapsGen).sample.get
    val rows = samples.map(g => g.map { case (s, e) => s"$s-$e" }.mkString(","))
    val got = rows.toDF("gaps").select(Annotations.hasFrameshift(col("gaps")))
      .collect().map(_.getBoolean(0))
    samples.zip(got).foreach { case (gaps, actual) =>
      assert(actual == gaps.exists { case (s, e) => (e - s) % 3 != 0 })
    }
  }
}
