package graft.operators

import graft.SparkSpec
import graft.multimodal.ImageCodec
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property tests for the round-3 operators' pure/relational kernels:
  * the as-of window trick against a brute-force reference model, and
  * the image codec against its own encoder over random dimensions. */
class OperatorPropertySpec extends SparkSpec {

  private def check(name: String, prop: Prop, n: Int = 100): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(res.passed, s"$name: $res")
  }

  test("ImageCodec: PNG encode→decode roundtrips any dimensions") {
    check("png-roundtrip", Prop.forAll(Gen.choose(1, 200), Gen.choose(1, 200)) { (w, h) =>
      ImageCodec.decode(ImageCodec.encodePng(w, h, (x, y) => (x * 31 + y * 17) % 256))
        .contains(ImageCodec.ImageInfo("png", w, h))
    }, n = 50)
  }

  test("ImageCodec: JPEG header roundtrips any dimensions") {
    check("jpeg-roundtrip", Prop.forAll(Gen.choose(1, 65535), Gen.choose(1, 65535)) { (w, h) =>
      ImageCodec.decode(ImageCodec.jpegHeaderBytes(w, h))
        .contains(ImageCodec.ImageInfo("jpeg", w, h))
    }, n = 50)
  }

  test("AsofJoin.backward matches the brute-force model on random event sets") {
    import spark.implicits._
    // a handful of random instances through the full Spark plan (not
    // per-sample — a Spark job per ScalaCheck case would take minutes)
    val gen = for {
      nl <- Gen.choose(1, 25)
      nr <- Gen.choose(0, 25)
      lefts <- Gen.listOfN(nl, Gen.zip(Gen.choose(1, 3), Gen.choose(0L, 20L)))
      rights <- Gen.listOfN(nr, Gen.zip(Gen.choose(1, 3), Gen.zip(Gen.choose(0L, 20L), Gen.choose(0, 999))))
    } yield (lefts, rights)
    val seed = org.scalacheck.rng.Seed(42L)
    val cases = Iterator.iterate(seed)(_.next).take(8)
      .flatMap(s => gen.apply(Gen.Parameters.default, s)).toSeq
    cases.zipWithIndex.foreach { case ((lefts, rights0), i) =>
      val rights = rights0.map { case (k, (t, v)) => (k, t, v) }
      val lDf = lefts.zipWithIndex.map { case ((k, t), id) => (k, t, id) }
        .toDF("k", "t", "lid")
      val rDf = rights.toDF("k", "t", "v")
      val got = AsofJoin.backward(lDf, rDf, Seq("k"), "t", "t", Seq("v"))
        .select("lid", "asof_v").as[(Int, Option[Int])].collect().toMap
      val expected = lefts.zipWithIndex.map { case ((k, t), id) =>
        // model: latest rt wins; peers at the same (k, rt) resolve to
        // the MAX payload (the operator's documented struct tiebreak)
        val matches = rights.filter { case (rk, rt, _) => rk == k && rt <= t }
        id -> (if (matches.isEmpty) None
               else Some(matches.maxBy { case (_, rt, v) => (rt, v) }._3))
      }.toMap
      assert(got == expected, s"case $i: lefts=$lefts rights=$rights")
    }
  }

  test("KCore.peelUntil matches the brute-force model on random graphs") {
    import spark.implicits._
    // in-JVM reference: iterative set-peel until fixpoint
    def brute(edges: Seq[(Long, Long)], k: Int): Map[Long, Long] = {
      val adj = scala.collection.mutable.Map.empty[Long, Set[Long]].withDefaultValue(Set.empty)
      edges.foreach { case (a, b) =>
        if (a != b) { adj(a) += b; adj(b) += a }
      }
      var alive = adj.keySet.toSet
      var changed = true
      while (changed) {
        val next = alive.filter(v => (adj(v) & alive).size >= k)
        changed = next != alive
        alive = next
      }
      alive.map(v => v -> (adj(v) & alive).size.toLong).toMap
    }
    val gen = for {
      n <- Gen.choose(1, 30)
      k <- Gen.choose(1, 4)
      edges <- Gen.listOfN(n, Gen.zip(Gen.choose(0L, 11L), Gen.choose(0L, 11L)))
    } yield (edges.filter(e => e._1 != e._2), k)
    // a handful of random instances through the full Spark plan
    val cases = Gen.listOfN(8, gen).sample.get
    cases.foreach { case (edges, k) =>
      if (edges.nonEmpty) {
        val df = edges.toDF("a", "b")
        val (core, _) = KCore.peelUntil(df, "a", "b", k)
        val got = core.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        val want = brute(edges, k)
        assert(got == want, s"k=$k edges=$edges: got $got want $want")
      }
    }
  }
}
