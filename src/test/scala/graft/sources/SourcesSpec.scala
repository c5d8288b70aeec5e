package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

class SourcesSpec extends SparkSpec {

  private def tmp(): String = Files.createTempDirectory("srcspec").toString

  test("S2 validated CSV: encoding, delimiter, header sets") {
    val dir = tmp()
    // Windows-1252 ';' CSV with an umlaut and mixed date formats
    val content = "Sample number;Order date;Zip code;Extra\n123;01.03.2021;8001;x\n124;2021-03-02;Zürich;y\n"
    Files.write(java.nio.file.Paths.get(s"$dir/in.csv"),
      content.getBytes(java.nio.charset.Charset.forName("windows-1252")))
    val (df, v) = Sources.readValidatedCsv(spark, s"$dir/in.csv", ";", "windows-1252",
      required = Set("Sample number", "Order date"), tolerated = Set("Zip code"))
    assert(v.missingRequired.isEmpty && v.unexpected == Seq("Extra"))
    val dates = df.select(Sources.sniffDate(col("Order date")).cast("string")).collect().map(_.getString(0))
    assert(dates.toSeq == Seq("2021-03-01", "2021-03-02"))
    val zip = df.select(col("Zip code")).collect().map(_.getString(0))
    assert(zip(1) == "Zürich") // encoding survived
  }

  test("S2 missing required column is reported") {
    val dir = tmp()
    Files.write(java.nio.file.Paths.get(s"$dir/in.csv"), "a;b\n1;2\n".getBytes)
    val (_, v) = Sources.readValidatedCsv(spark, s"$dir/in.csv", ";", "UTF-8",
      required = Set("a", "Sample number"))
    assert(v.missingRequired == Seq("Sample number"))
  }

  test("well normalization A01 -> A1 and sort key is column-major") {
    import spark.implicits._
    val df = Seq("A01", "H12", "B1", "a03").toDF("w")
    val norm = df.select(Sources.normalizeWell(col("w"))).as[String].collect()
    assert(norm.toSeq == Seq("A1", "H12", "B1", "a3"))
    // malformed wells must normalize to "" (the reject marker), not
    // throw under ANSI or leak a partial value
    val bad = Seq("A", "12", "", "Z9").toDF("w")
      .select(Sources.normalizeWell(col("w"))).as[String].collect()
    assert(bad.toSeq == Seq("", "", "", ""))
    val sorted = Seq("B1", "A2", "A1", "H1").toDF("w")
      .orderBy(Sources.wellSortKey(col("w"))).as[String].collect()
    assert(sorted.toSeq == Seq("A1", "B1", "H1", "A2"))
  }

  test("S5 JSON drift check: required fatal, expected/unexpected reported") {
    val dir = tmp()
    Files.write(java.nio.file.Paths.get(s"$dir/feed.json"),
      """{"covv_accession_id":"EPI_1","covv_virus_name":"x","surprise":1}
        |{"covv_accession_id":"EPI_2","covv_virus_name":"y","surprise":2}
        |""".stripMargin.getBytes)
    val (df, report) = Sources.readJsonWithDriftCheck(spark, s"$dir/feed.json",
      required = Set("covv_accession_id"),
      expected = Set("covv_virus_name", "covv_collection_date"))
    assert(!report.fatal)
    assert(report.missingExpected == Seq("covv_collection_date"))
    assert(report.unexpected == Seq("surprise"))
    assert(df.count() == 2)
    val (_, fatal) = Sources.readJsonWithDriftCheck(spark, s"$dir/feed.json",
      required = Set("covv_accession_id", "sequence"), expected = Set.empty)
    assert(fatal.fatal && fatal.missingRequired == Seq("sequence"))
  }

  test("S8 TSV rules load") {
    val dir = tmp()
    Files.write(java.nio.file.Paths.get(s"$dir/rules.tsv"),
      "europe/ch/*/*\tEurope/Switzerland/*/*\n".getBytes)
    val df = Sources.readTsvRules(spark, s"$dir/rules.tsv", Seq("lhs", "rhs"))
    assert(df.collect()(0).getString(1) == "Europe/Switzerland/*/*")
  }

  test("M9 state store: atomic set/get/delete") {
    val st = new StateStore(tmp())
    assert(st.get("prog").isEmpty)
    st.set("prog", """{"processed":["a.csv"]}""")
    assert(st.get("prog").get.contains("a.csv"))
    st.set("prog", """{"processed":["a.csv","b.csv"]}""")
    assert(st.get("prog").get.contains("b.csv"))
    st.delete("prog")
    assert(st.get("prog").isEmpty)
    assertThrows[IllegalArgumentException](st.set("../evil", "x"))
  }

  test("S9 chunked export: exactly-once, <=N rows per chunk, drains") {
    import spark.implicits._
    val dir = tmp()
    val ex = new ChunkedExport(spark, s"$dir/log", s"$dir/out")
    val pending = (1 to 23).map(i => (i.toLong, s"row$i")).toDF("k", "payload")
    val chunks = ex.exportAll(pending, "k", 10)
    assert(chunks.map(_._2).toSeq == Seq(10L, 10L, 3L))
    // re-export: nothing pending anymore
    assert(ex.exportAll(pending, "k", 10).isEmpty)
    // log holds each key exactly once
    val log = spark.read.parquet(s"$dir/log")
    assert(log.count() == 23 && log.select("k").distinct().count() == 23)
  }
}
