package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.io.FileOutputStream
import java.util.zip.{ZipEntry, ZipOutputStream}

/** S3: the xlsx fixture here mimics what Excel actually writes — full
  * OPC container (content types, rels, styles), shared strings with a
  * rich-text run, sparse rows with A1 cell refs, a serial date column,
  * a boolean cell — and must ingest byte-for-byte equal to its csv
  * twin through the S2-style validation + typing path.
  */
class XlsxSourceSpec extends SparkSpec {

  private def entry(z: ZipOutputStream, name: String, content: String): Unit = {
    z.putNextEntry(new ZipEntry(name))
    z.write(content.getBytes("UTF-8"))
    z.closeEntry()
  }

  /** Meldeformular-shaped workbook: sample_number, fall_dt (serial
    * dates), ktn, comment, auftraggeber_armee; row 4 has a hole in
    * ktn; row 5 is all-empty (Excel pads trailing rows). */
  private def writeFixtureXlsx(path: String): Unit = {
    val z = new ZipOutputStream(new FileOutputStream(path))
    entry(z, "[Content_Types].xml",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
        |<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
        |<Default Extension="xml" ContentType="application/xml"/>
        |<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
        |<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
        |<Override PartName="/xl/sharedStrings.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sharedStrings+xml"/>
        |</Types>""".stripMargin)
    entry(z, "_rels/.rels",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
        |</Relationships>""".stripMargin)
    entry(z, "xl/workbook.xml",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
        |<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets>
        |</workbook>""".stripMargin)
    entry(z, "xl/_rels/workbook.xml.rels",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
        |</Relationships>""".stripMargin)
    // rich-text run in si[3]: "ZH" split across two runs
    entry(z, "xl/sharedStrings.xml",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="6" uniqueCount="6">
        |<si><t>sample_number</t></si>
        |<si><t>fall_dt</t></si>
        |<si><t>ktn</t></si>
        |<si><r><rPr><b/></rPr><t>Z</t></r><r><t>H</t></r></si>
        |<si><t>comment</t></si>
        |<si><t>auftraggeber_armee</t></si>
        |</sst>""".stripMargin)
    // serial 44256 = 2021-03-01, 44257 = 2021-03-02
    entry(z, "xl/worksheets/sheet1.xml",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
        |<sheetData>
        |<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c><c r="C1" t="s"><v>2</v></c><c r="D1" t="s"><v>4</v></c><c r="E1" t="s"><v>5</v></c></row>
        |<row r="2"><c r="A2"><v>1001</v></c><c r="B2" s="1"><v>44256</v></c><c r="C2" t="s"><v>3</v></c><c r="D2" t="inlineStr"><is><t>routine sample</t></is></c><c r="E2" t="b"><v>0</v></c></row>
        |<row r="3"><c r="A3"><v>1002</v></c><c r="B3" s="1"><v>44257</v></c><c r="C3" t="str"><v>BE</v></c><c r="E3" t="b"><v>1</v></c></row>
        |<row r="4"><c r="A4"><v>1003</v></c><c r="C4" t="s"><v>3</v></c></row>
        |<row r="5"></row>
        |</sheetData>
        |</worksheet>""".stripMargin)
    z.close()
  }

  private def writeTwinCsv(path: String): Unit = {
    val w = new java.io.PrintWriter(path, "UTF-8")
    w.println("sample_number,fall_dt,ktn,comment,auftraggeber_armee")
    w.println("1001,2021-03-01,ZH,routine sample,FALSE")
    w.println("1002,2021-03-02,BE,,TRUE")
    w.println("1003,,ZH,,")
    w.close()
  }

  test("S3: xlsx fixture ingests byte-for-byte equal to its csv twin") {
    val dir = java.nio.file.Files.createTempDirectory("xlsx").toString
    writeFixtureXlsx(s"$dir/meldeformular.xlsx")
    writeTwinCsv(s"$dir/meldeformular.csv")
    val required = Set("sample_number", "fall_dt", "ktn")
    val tolerated = Set("comment", "auftraggeber_armee")

    val (xdf, xv) = XlsxSource.readValidated(spark, s"$dir/meldeformular.xlsx", required, tolerated)
    assert(xv.ok, s"header validation failed: $xv")
    val (cdf, cv) = Sources.readValidatedCsv(spark, s"$dir/meldeformular.csv", ",", "UTF-8", required, tolerated)
    assert(cv.ok)

    val norm = (df: org.apache.spark.sql.DataFrame) =>
      XlsxSource.typed(df)
        .select(col("sample_number"), col("fall_dt").cast("string"), col("ktn"),
          col("comment"), col("auftraggeber_armee"))
        .collect().map(_.toSeq).toSet
    assert(norm(xdf) == norm(cdf))
    // content spot-checks: serial date conversion + rich-text shared string
    val r = XlsxSource.typed(xdf).filter(col("sample_number") === "1001").head()
    assert(r.getAs[java.sql.Date]("fall_dt").toString == "2021-03-01")
    assert(r.getAs[String]("ktn") == "ZH")
  }

  test("S3: header validation reports missing/unexpected columns") {
    val dir = java.nio.file.Files.createTempDirectory("xlsx2").toString
    writeFixtureXlsx(s"$dir/m.xlsx")
    val (_, v) = XlsxSource.readValidated(spark, s"$dir/m.xlsx",
      required = Set("sample_number", "nonexistent_col"), tolerated = Set("fall_dt", "ktn", "comment"))
    assert(v.missingRequired == Seq("nonexistent_col"))
    assert(v.unexpected == Seq("auftraggeber_armee"))
  }

  test("S3: armee marker merges into the comment column per the reference case_when") {
    import spark.implicits._
    val df = Seq(
      ("1", "TRUE", null.asInstanceOf[String]),
      ("2", "TRUE", "pre-existing"),
      ("3", "FALSE", "kept"),
      ("4", null.asInstanceOf[String], null.asInstanceOf[String])
    ).toDF("sample_number", "auftraggeber_armee", "comment")
    val out = XlsxSource.mergeArmeeComment(df)
      .select("sample_number", "comment").as[(String, String)].collect().toMap
    assert(out == Map(
      "1" -> "auftraggeber_armee=TRUE",
      "2" -> "pre-existing;auftraggeber_armee=TRUE",
      "3" -> "kept",
      "4" -> null))
    assert(!XlsxSource.mergeArmeeComment(df).columns.contains("auftraggeber_armee"))
  }

  test("S3: first sheet resolves through workbook rels, not a sheet1.xml name convention") {
    // a workbook whose first (and only) sheet part is sheet7.xml — what
    // Excel leaves behind after sheet deletions; also an empty shared
    // string, which must survive as "" rather than collapse to absent
    val dir = java.nio.file.Files.createTempDirectory("xlsx3").toString
    val z = new ZipOutputStream(new FileOutputStream(s"$dir/odd.xlsx"))
    entry(z, "xl/workbook.xml",
      """<workbook xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
        |<sheets><sheet name="Data" sheetId="7" r:id="rId9"/></sheets></workbook>""".stripMargin)
    entry(z, "xl/_rels/workbook.xml.rels",
      """<Relationships>
        |<Relationship Id="rId3" Type="styles" Target="styles.xml"/>
        |<Relationship Id="rId9" Type="worksheet" Target="worksheets/sheet7.xml"/>
        |</Relationships>""".stripMargin)
    entry(z, "xl/sharedStrings.xml",
      """<sst><si><t>a</t></si><si><t>b</t></si><si><t></t></si></sst>""")
    entry(z, "xl/worksheets/sheet7.xml",
      """<worksheet><sheetData>
        |<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c></row>
        |<row r="2"><c r="A2" t="s"><v>2</v></c><c r="B2"><v>7</v></c></row>
        |</sheetData></worksheet>""".stripMargin)
    z.close()
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(s"$dir/odd.xlsx"))
    val (header, data) = XlsxSource.parseWorkbook(bytes)
    assert(header == Seq("a", "b"))
    assert(data == Seq(Seq("", "7")))
  }

  test("S3: missing rels falls back to the lexicographically first worksheet entry") {
    val dir = java.nio.file.Files.createTempDirectory("xlsx4").toString
    val z = new ZipOutputStream(new FileOutputStream(s"$dir/bare.xlsx"))
    entry(z, "xl/worksheets/sheet3.xml",
      """<worksheet><sheetData>
        |<row r="1"><c r="A1" t="inlineStr"><is><t>h</t></is></c></row>
        |<row r="2"><c r="A2"><v>1</v></c></row>
        |</sheetData></worksheet>""".stripMargin)
    z.close()
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(s"$dir/bare.xlsx"))
    val (header, data) = XlsxSource.parseWorkbook(bytes)
    assert(header == Seq("h"))
    assert(data == Seq(Seq("1")))
  }

  test("S3: a DOCTYPE in any workbook part is rejected outright") {
    val dir = java.nio.file.Files.createTempDirectory("xlsx5").toString
    val z = new ZipOutputStream(new FileOutputStream(s"$dir/evil.xlsx"))
    entry(z, "xl/worksheets/sheet1.xml",
      """<?xml version="1.0"?>
        |<!DOCTYPE lolz [<!ENTITY lol "lol"><!ENTITY lol2 "&lol;&lol;&lol;&lol;">]>
        |<worksheet><sheetData><row r="1"><c r="A1" t="inlineStr"><is><t>&lol2;</t></is></c></row></sheetData></worksheet>""".stripMargin)
    z.close()
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(s"$dir/evil.xlsx"))
    intercept[org.xml.sax.SAXParseException] { XlsxSource.parseWorkbook(bytes) }
  }

  test("S3: date typing accepts both serials and formatted strings") {
    import spark.implicits._
    val df = Seq(("44256", "x"), ("2021-03-05", "y"), ("05.03.2021", "z"), ("garbage", "w"))
      .toDF("fall_dt", "k")
    val out = XlsxSource.typed(df).select(col("fall_dt").cast("string")).as[String].collect()
    assert(out.toSeq == Seq("2021-03-01", "2021-03-05", "2021-03-05", null))
  }
}
