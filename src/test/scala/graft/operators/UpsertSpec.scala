package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class UpsertSpec extends SparkSpec {

  test("M1 upsert: updates win, existing fills, new keys appended") {
    import spark.implicits._
    val existing = Seq((1, "a", 10), (2, "b", 20)).toDF("k", "s", "v")
    val updates = Seq((2, null.asInstanceOf[String], 99), (3, "c", 30)).toDF("k", "s", "v")
    val out = Upsert.upsert(existing, updates, Seq("k")).orderBy("k")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getInt(2)))
    // k=2: v updated to 99, s falls back to existing 'b' (null update)
    assert(out.toSeq == Seq((1, "a", 10), (2, "b", 99), (3, "c", 30)))
  }

  test("M8 upsertKeepExisting: existing non-null wins, holes filled, new keys appended") {
    import spark.implicits._
    val existing = Seq((1, "EPI_OLD"), (2, null.asInstanceOf[String])).toDF("k", "gid")
    val updates = Seq((1, "EPI_NEW"), (2, "EPI_FILL"), (3, "EPI_3")).toDF("k", "gid")
    val out = Upsert.upsertKeepExisting(existing, updates, Seq("k")).orderBy("k")
      .collect().map(r => (r.getInt(0), r.getString(1)))
    assert(out.toSeq == Seq((1, "EPI_OLD"), (2, "EPI_FILL"), (3, "EPI_3")))
  }

  test("M2 insertIfAbsent keeps existing rows on conflict") {
    import spark.implicits._
    val existing = Seq((1, "keep")).toDF("k", "s")
    val incoming = Seq((1, "clobber"), (2, "new")).toDF("k", "s")
    val out = Upsert.insertIfAbsent(existing, incoming, Seq("k")).orderBy("k")
      .collect().map(r => (r.getInt(0), r.getString(1)))
    assert(out.toSeq == Seq((1, "keep"), (2, "new")))
  }

  test("M4 deleteMissing keeps only incoming keys") {
    import spark.implicits._
    val existing = Seq((1, "a"), (2, "b"), (3, "c")).toDF("k", "s")
    val incoming = Seq(Tuple1(1), Tuple1(3)).toDF("k")
    val out = Upsert.deleteMissing(existing, incoming, Seq("k")).orderBy("k")
      .collect().map(_.getInt(0))
    assert(out.toSeq == Seq(1, 3))
  }

  test("M3 changeKinds classifies new/changed/unchanged, null-safe") {
    import spark.implicits._
    val existing = Seq((1, "same"), (2, "old"), (4, null.asInstanceOf[String])).toDF("k", "s")
    val incoming = Seq((1, "same"), (2, "new"), (3, "brand"), (4, null.asInstanceOf[String])).toDF("k", "s")
    val out = Upsert.changeKinds(existing, incoming, Seq("k"), Seq("s"))
      .orderBy("k").collect().map(r => (r.getInt(0), r.getString(2)))
    assert(out.toSeq == Seq((1, "unchanged"), (2, "changed"), (3, "new"), (4, "unchanged")))
  }
}
