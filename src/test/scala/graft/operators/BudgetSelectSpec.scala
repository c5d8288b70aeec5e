package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Budget-selection guarantees: the two-level banded prefix sum is
  * bit-identical to the naive global window it replaces, the
  * fill-until-full boundary rule holds, and ties break by id. */
class BudgetSelectSpec extends SparkSpec {

  private def docs(n: Int) = {
    import spark.implicits._
    // scores collide across docs (bands + in-band ties), token counts vary
    (0 until n).map(i => (i.toLong, (i * 7 % 40).toLong, (i % 13 + 1).toLong))
      .toDF("doc_id", "score", "n_tokens")
  }

  test("two-level banded cumsum equals the naive single-window cumsum") {
    val d = docs(500)
    val w = Window.orderBy(col("score").desc, col("doc_id").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val naive = d.withColumn("cum_before", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .select(col("doc_id"), col("cum_before"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val banded = BudgetSelect.select(d, "doc_id", "score", "n_tokens", 1000L)
      .select(col("doc_id"), col("cum_before"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(banded == naive)
  }

  test("fill-until-full: straddler admitted, everything after rejected, budget respected") {
    val out = BudgetSelect.select(docs(100), "doc_id", "score", "n_tokens", 150L)
      .orderBy(col("cum_before")).collect()
    val sel = out.filter(_.getAs[Long]("selected") == 1L)
    val rej = out.filter(_.getAs[Long]("selected") == 0L)
    assert(sel.nonEmpty && rej.nonEmpty)
    // every selected doc started below budget; every rejected one at/after
    assert(sel.forall(_.getAs[Long]("cum_before") < 150L))
    assert(rej.forall(_.getAs[Long]("cum_before") >= 150L))
    // the selected set is exactly a prefix of the quality order
    val lastSel = sel.map(_.getAs[Long]("cum_before")).max
    assert(rej.forall(_.getAs[Long]("cum_before") > lastSel))
    // tokens before the straddler stay under budget
    val straddler = sel.maxBy(_.getAs[Long]("cum_before"))
    assert(straddler.getAs[Long]("cum_before") < 150L)
  }

  test("budget 0 selects nothing; budget ≥ total selects everything") {
    val d = docs(50)
    assert(BudgetSelect.select(d, "doc_id", "score", "n_tokens", 0L)
      .agg(sum(col("selected"))).head().getLong(0) == 0L)
    assert(BudgetSelect.select(d, "doc_id", "score", "n_tokens", 1000000L)
      .agg(sum(col("selected"))).head().getLong(0) == 50L)
  }

  test("equal scores order by doc_id: selection is deterministic under ties") {
    import spark.implicits._
    val tied = Seq((10L, 5L, 4L), (2L, 5L, 4L), (7L, 5L, 4L))
      .toDF("doc_id", "score", "n_tokens")
    val out = BudgetSelect.select(tied, "doc_id", "score", "n_tokens", 8L)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("selected")).toMap
    assert(out == Map(2L -> 1L, 7L -> 1L, 10L -> 0L))
  }
}
