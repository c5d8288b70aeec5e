package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Greedy longest-match guarantees: the hand-traced WordPiece rule,
  * the concatenation invariant (pieces rebuild the word), determinism,
  * and the fail-loud contract when the piece set cannot cover a word. */
class MaxMatchSpec extends SparkSpec {

  private def wordsDf(ws: (String, Long)*) = {
    import spark.implicits._
    ws.toDF("word", "freq")
  }

  private def piecesDf(ps: String*) = {
    import spark.implicits._
    ps.toDF("piece")
  }

  test("hand-traced greedy: longest prefix wins at every step") {
    val words = wordsDf("sparkly" -> 1L, "spark" -> 5L, "cat" -> 2L)
    val out = MaxMatch.segmentation(words,
      piecesDf("spark", "sparkl", "c", "a", "t", "l", "y", "s", "p", "r", "k"))
      .collect().map(r => r.getString(0) -> r.getString(2)).toMap
    // "sparkly": "sparkl" (6) beats "spark" (5); then l is consumed, y remains
    assert(out("sparkly") == "sparkl|y")
    assert(out("spark") == "spark")
    assert(out("cat") == "c|a|t")
  }

  test("pieces concatenate back to the word; counts agree") {
    val words = wordsDf("interleaved" -> 1L, "leave" -> 3L, "inter" -> 2L, "d" -> 1L)
    val pcs = MaxMatch.pieces(words, topK = 2)
    val seg = MaxMatch.segment(words, pcs)
    val rebuilt = seg.orderBy(col("word"), col("pos"))
      .groupBy(col("word"))
      .agg(concat_ws("", collect_list(col("piece"))).as("re"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    words.collect().foreach { r =>
      val w = r.getString(0)
      assert(rebuilt(w) == w, s"pieces of $w must concatenate to it")
    }
  }

  test("top-K + chars vocabulary: frequent words stay whole, rare words shred") {
    val words = wordsDf("common" -> 100L, "commonly" -> 1L, "zq" -> 1L)
    val out = MaxMatch.segmentation(words, MaxMatch.pieces(words, topK = 1))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(out("common") == (1L, "common"))
    assert(out("commonly") == (3L, "common|l|y"))
    assert(out("zq") == (2L, "z|q"))
  }

  test("fail-loud when the piece set cannot consume a word") {
    val words = wordsDf("abc" -> 1L)
    val err = intercept[IllegalArgumentException] {
      MaxMatch.segment(words, piecesDf("a", "b")).collect()
    }
    assert(err.getMessage.contains("unconsumed"))
  }

  test("segmentation is deterministic across runs") {
    val words = wordsDf((for (a <- 0 until 7; b <- 0 until 5)
      yield s"w${a}x$b" -> (a * 5 + b + 1).toLong): _*)
    val pcs = MaxMatch.pieces(words, topK = 4)
    val a = MaxMatch.segmentation(words, pcs).orderBy(col("word")).collect().toSeq
    val b = MaxMatch.segmentation(words, pcs).orderBy(col("word")).collect().toSeq
    assert(a == b)
  }
}
