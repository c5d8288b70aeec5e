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

  test("SCD2: changed keys close+reopen, new keys open, history and unchanged pass through") {
    import spark.implicits._
    def row(k: Long, s: String, f: Long, t: java.lang.Long) = (k, s, f, t)
    val versioned = Seq(
      row(1L, "a0", 0L, 1L), row(1L, "a1", 1L, null), // key 1: one closed + one open
      row(2L, "b0", 0L, null),                         // key 2: open, will change
      row(3L, "c0", 0L, null))                         // key 3: open, unchanged
      .toDF("k", "s", "vfrom", "vto")
    val batch = Seq((2L, "b1"), (3L, "c0"), (9L, "fresh")).toDF("k", "s")
    val out = Upsert.scd2Apply(versioned, batch, Seq("k"), Seq("s"), batchId = 2L)
      .orderBy("k", "vfrom")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) null else java.lang.Long.valueOf(r.getLong(3))))
    assert(out.toSeq == Seq(
      row(1L, "a0", 0L, 1L),   // closed history untouched
      row(1L, "a1", 1L, null), // open, absent from batch → untouched
      row(2L, "b0", 0L, 2L),   // changed → closed at batch 2
      row(2L, "b1", 2L, null), // …and reopened with the new value
      row(3L, "c0", 0L, null), // in batch but unchanged → single open row
      row(9L, "fresh", 2L, null))) // brand new key
  }

  test("SCD2: a versioned table with an extra passthrough column fails fast with the fix named") {
    import spark.implicits._
    val versioned = Seq((1L, "a", "extra", 0L, null.asInstanceOf[java.lang.Long]))
      .toDF("k", "s", "note", "vfrom", "vto")
    val e = intercept[IllegalArgumentException] {
      Upsert.scd2Apply(versioned, Seq((1L, "a2")).toDF("k", "s"), Seq("k"), Seq("s"), 1L)
    }
    assert(e.getMessage.contains("keys++compareCols++(vfrom,vto)"), e.getMessage)
    assert(e.getMessage.contains("note"), e.getMessage)
  }

  test("SCD2: current-view query (vto IS NULL) returns exactly one row per live key") {
    import spark.implicits._
    val v0 = Seq((1L, "x", 0L, null.asInstanceOf[java.lang.Long]),
      (2L, "y", 0L, null.asInstanceOf[java.lang.Long])).toDF("k", "s", "vfrom", "vto")
    val v1 = Upsert.scd2Apply(v0, Seq((1L, "x2")).toDF("k", "s"), Seq("k"), Seq("s"), 1L)
    val v2 = Upsert.scd2Apply(v1, Seq((1L, "x3"), (2L, "y")).toDF("k", "s"), Seq("k"), Seq("s"), 2L)
    val current = v2.filter(col("vto").isNull).orderBy("k")
      .collect().map(r => r.getLong(0) -> r.getString(1))
    assert(current.toSeq == Seq(1L -> "x3", 2L -> "y"))
    assert(v2.count() == 4, "full history: x, x2, x3, y")
  }
}
