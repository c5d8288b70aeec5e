package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.io.{ByteArrayInputStream, InputStream}
import java.util.zip.ZipInputStream
import javax.xml.parsers.SAXParserFactory
import org.xml.sax.Attributes
import org.xml.sax.helpers.DefaultHandler

/** S3 — chunk-free XLSX ingestion (BAG Meldeformular path).
  *
  * The reference reads the Meldeformular xlsx in 10k-row chunks with
  * all-text column types and name-regex date detection
  * (`database/R/import_bag_meldeformular.R:128-169`); chunking exists
  * only because readxl is memory-bound — in Spark the file distributes
  * via binaryFiles (one task per file; the BAG drop is many daily
  * files, so file-level parallelism is the right grain) and every cell
  * is read as text, with [[typed]] applying the reference's date/
  * numeric name patterns afterwards.
  *
  * The container is parsed with the JDK only: the zip via
  * ZipInputStream (entry order is arbitrary, so both wanted entries are
  * collected in one streaming pass), `xl/sharedStrings.xml` and the
  * first worksheet via SAX (same collector discipline as
  * [[XmlSource]]). Cell handling: `t="s"` shared-string index,
  * `t="inlineStr"` inline text, `t="b"` booleans as TRUE/FALSE (what
  * readxl's text mode yields), anything else the raw `<v>` text.
  * Sparse rows resolve column position from the `r="B3"` cell
  * reference, falling back to sequential when absent.
  */
object XlsxSource {

  /** A1-style reference → 0-based column index ("B3" → 1). */
  def colIndex(ref: String): Int = {
    var i = 0; var acc = 0
    while (i < ref.length && ref.charAt(i).isLetter) {
      acc = acc * 26 + (ref.charAt(i).toUpper - 'A' + 1); i += 1
    }
    acc - 1
  }

  private def saxParser() = {
    val f = SAXParserFactory.newInstance()
    // xlsx parts never legitimately carry a DOCTYPE; disallowing it
    // outright blocks internal-entity expansion (billion-laughs) DoS
    // from untrusted workbooks, not just external-entity reads
    f.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
    f.setFeature("http://xml.org/sax/features/external-general-entities", false)
    f.setFeature("http://xml.org/sax/features/external-parameter-entities", false)
    f.newSAXParser()
  }

  /** `xl/sharedStrings.xml` → indexed strings; rich-text runs
    * (`<si><r><t>..`) concatenate like a plain `<si><t>`. */
  def parseSharedStrings(in: InputStream): IndexedSeq[String] = {
    val out = IndexedSeq.newBuilder[String]
    val handler = new DefaultHandler {
      private var inT = false
      private var cur: StringBuilder = _
      override def startElement(u: String, l: String, q: String, a: Attributes): Unit = q match {
        case "si" => cur = new StringBuilder
        case "t" => inT = true
        case _ =>
      }
      override def endElement(u: String, l: String, q: String): Unit = q match {
        case "si" => out += cur.toString
        case "t" => inT = false
        case _ =>
      }
      override def characters(ch: Array[Char], s: Int, len: Int): Unit =
        if (inT && cur != null) cur.appendAll(ch, s, len)
    }
    saxParser().parse(in, handler)
    out.result()
  }

  /** Worksheet XML → (rowNumber, colIndex → cellText) per row. */
  def parseSheet(in: InputStream, shared: IndexedSeq[String]): Seq[(Int, Map[Int, String])] = {
    val rows = Seq.newBuilder[(Int, Map[Int, String])]
    val handler = new DefaultHandler {
      private var rowNum = 0
      private var cells: scala.collection.mutable.Map[Int, String] = _
      private var cellCol = -1
      private var cellType = ""
      private var inV = false
      private var inIsT = false
      private var hasValue = false
      private var buf: StringBuilder = _
      override def startElement(u: String, l: String, q: String, a: Attributes): Unit = q match {
        case "row" =>
          rowNum = Option(a.getValue("r")).map(_.toInt).getOrElse(rowNum + 1)
          cells = scala.collection.mutable.Map.empty
          cellCol = -1
        case "c" =>
          cellCol = Option(a.getValue("r")).map(colIndex).getOrElse(cellCol + 1)
          cellType = Option(a.getValue("t")).getOrElse("")
          hasValue = false
          buf = new StringBuilder
        case "v" => inV = true; hasValue = true
        case "t" if cellType == "inlineStr" => inIsT = true; hasValue = true
        case _ =>
      }
      override def endElement(u: String, l: String, q: String): Unit = q match {
        case "row" => rows += ((rowNum, cells.toMap))
        case "c" =>
          // present-but-empty values (e.g. an empty shared string) are
          // kept as "" — only cells with NO value child stay absent
          if (hasValue) {
            val raw = buf.toString
            cells(cellCol) = cellType match {
              case "s" => shared(raw.trim.toInt)
              case "b" => if (raw.trim == "1") "TRUE" else "FALSE"
              case _ => raw // "inlineStr", "str", numbers, dates-as-serials
            }
          }
        case "v" => inV = false
        case "t" => inIsT = false
        case _ =>
      }
      override def characters(ch: Array[Char], s: Int, len: Int): Unit =
        if ((inV || inIsT) && buf != null) buf.appendAll(ch, s, len)
    }
    saxParser().parse(in, handler)
    rows.result()
  }

  /** `xl/workbook.xml` → the first `<sheet>`'s relationship id. */
  private def firstSheetRid(bytes: Array[Byte]): Option[String] = {
    var rid: Option[String] = None
    val handler = new DefaultHandler {
      override def startElement(u: String, l: String, q: String, a: Attributes): Unit =
        if (q == "sheet" && rid.isEmpty)
          rid = Option(a.getValue("r:id")).orElse(Option(a.getValue("id")))
    }
    saxParser().parse(new ByteArrayInputStream(bytes), handler)
    rid
  }

  /** `xl/_rels/workbook.xml.rels` → Id → zip entry name (targets are
    * workbook-relative, e.g. "worksheets/sheet2.xml", or absolute
    * "/xl/worksheets/sheet2.xml"). */
  private def relTargets(bytes: Array[Byte]): Map[String, String] = {
    val out = Map.newBuilder[String, String]
    val handler = new DefaultHandler {
      override def startElement(u: String, l: String, q: String, a: Attributes): Unit =
        if (q == "Relationship")
          (Option(a.getValue("Id")), Option(a.getValue("Target"))) match {
            case (Some(id), Some(t)) =>
              out += id -> (if (t.startsWith("/")) t.drop(1) else s"xl/$t")
            case _ =>
          }
    }
    saxParser().parse(new ByteArrayInputStream(bytes), handler)
    out.result()
  }

  /** One xlsx byte blob → header + data rows (all text, all-empty data
    * rows dropped, like the reference's `filter(if_any(..., !is.na))`).
    * The FIRST sheet is resolved through workbook.xml + its rels (sheet
    * parts keep their original names after deletions/reorders, so
    * "sheet1.xml" is a convention, not a contract); workbooks missing
    * either part fall back to the lexicographically first worksheet
    * entry. */
  def parseWorkbook(bytes: Array[Byte]): (Seq[String], Seq[Seq[String]]) = {
    val wanted = scala.collection.mutable.Map[String, Array[Byte]]()
    val zin = new ZipInputStream(new ByteArrayInputStream(bytes))
    var e = zin.getNextEntry
    while (e != null) {
      if (e.getName == "xl/sharedStrings.xml" || e.getName == "xl/workbook.xml" ||
          e.getName == "xl/_rels/workbook.xml.rels" || e.getName.startsWith("xl/worksheets/"))
        wanted(e.getName) = zin.readAllBytes()
      e = zin.getNextEntry
    }
    val shared = wanted.get("xl/sharedStrings.xml")
      .map(b => parseSharedStrings(new ByteArrayInputStream(b)))
      .getOrElse(IndexedSeq.empty)
    val viaRels = for {
      wb <- wanted.get("xl/workbook.xml")
      rels <- wanted.get("xl/_rels/workbook.xml.rels")
      rid <- firstSheetRid(wb)
      target <- relTargets(rels).get(rid)
      b <- wanted.get(target)
    } yield b
    val sheetBytes = viaRels.getOrElse {
      val names = wanted.keys.filter(n =>
        n.startsWith("xl/worksheets/") && n.endsWith(".xml")).toSeq.sorted
      names.headOption.map(wanted).getOrElse(
        throw new IllegalArgumentException("no worksheet entry found"))
    }
    val all = parseSheet(new ByteArrayInputStream(sheetBytes), shared).sortBy(_._1)
    require(all.nonEmpty, "empty worksheet")
    val (_, headerCells) = all.head
    val width = headerCells.keys.max + 1
    val header = (0 until width).map(i => headerCells.getOrElse(i, s"_c$i"))
    val data = all.tail
      .map { case (_, cs) => (0 until width).map(i => cs.get(i).orNull) }
      // readxl maps empty cells to NA, so a row of only absent/empty
      // cells is the trailing padding Excel writes — dropped like the
      // reference's filter(if_any(..., !is.na)); "" inside MIXED rows
      // still survives (present-but-empty ≠ absent)
      .filter(_.exists(v => v != null && v.nonEmpty))
    (header, data.map(_.toSeq))
  }

  /** Distributed read of a path/glob of xlsx files; all columns text. */
  def read(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val parsed = spark.sparkContext.binaryFiles(path)
      .map { case (_, pds) => parseWorkbook(pds.toArray()) }
    val header = parsed.map(_._1).first()
    val rows = parsed.flatMap { case (h, data) =>
      require(h == header, s"xlsx header drift: $h vs $header")
      data
    }
    rows.toDF("__vals").selectExpr(
      header.zipWithIndex.map { case (c, i) => s"__vals[$i] AS `$c`" }: _*)
  }

  /** The reference's date-column name pattern
    * (`import_bag_meldeformular.R:133`) and numeric pattern (:139). */
  val BagDateColPattern = "_dt|hospdatin|pttoddat|exp_von|exp_bis|exp_ausland_von|exp_ausland_bis|impfdatum_dose1|impfdatum_dose2"
  val BagNumericColPattern = "dosen_anzahl"

  /** Excel serial day → date (base 1899-12-30 absorbs the Lotus 1900
    * leap-year bug for all post-1900-03-01 dates). */
  def serialToDate(c: Column): Column =
    date_add(to_date(lit("1899-12-30")), c.cast("double").cast("int"))

  /** Name-regex typing pass over an all-text frame: date columns accept
    * either a serial number or a formatted date string; numeric columns
    * cast to double. Mirrors the reference's bm_col_types assembly. */
  def typed(df: DataFrame, dateColPattern: String = BagDateColPattern,
      numericColPattern: String = BagNumericColPattern): DataFrame = {
    val dateRe = dateColPattern.r
    val numRe = numericColPattern.r
    df.columns.foldLeft(df) { (acc, c) =>
      if (dateRe.findFirstIn(c).isDefined)
        acc.withColumn(c,
          when(col(c).rlike("^[0-9]+(\\.[0-9]+)?$"), serialToDate(col(c)))
            .otherwise(Sources.sniffDate(col(c))))
      else if (numRe.findFirstIn(c).isDefined)
        // readxl yields NA for unparseable numerics; the ANSI cast
        // would throw on a stray "n/a" cell instead
        acc.withColumn(c, when(col(c).rlike("^-?[0-9]+(\\.[0-9]+)?$"),
          col(c).cast("double")).otherwise(lit(null).cast("double")))
      else acc
    }
  }

  /** The reference's armee marker merge
    * (`import_bag_meldeformular.R:179-192`): fold the
    * `auftraggeber_armee` column into the free-text comment as
    * `auftraggeber_armee=TRUE` (appended with ';' when a comment
    * already exists), then drop the column — downstream views test the
    * comment with LIKE (`bag_sequence_report.sql:14`). */
  def mergeArmeeComment(df: DataFrame): DataFrame = {
    val hasArmee = df.columns.contains("auftraggeber_armee")
    val hasComment = df.columns.contains("comment")
    if (hasArmee && hasComment)
      df.withColumn("comment",
        when(col("auftraggeber_armee") === "TRUE" &&
            (col("comment").isNull || col("comment") === ""), lit("auftraggeber_armee=TRUE"))
          .when(col("auftraggeber_armee") === "TRUE",
            concat(col("comment"), lit(";auftraggeber_armee=TRUE")))
          .otherwise(col("comment")))
        .drop("auftraggeber_armee")
    else if (hasArmee)
      df.withColumn("comment",
        when(col("auftraggeber_armee") === "TRUE", lit("auftraggeber_armee=TRUE")))
        .drop("auftraggeber_armee")
    else df
  }

  /** S3 entry point mirroring [[Sources.readValidatedCsv]]: xlsx →
    * all-text frame + header validation against required/tolerated. */
  def readValidated(spark: SparkSession, path: String, required: Set[String],
      tolerated: Set[String] = Set.empty): (DataFrame, Sources.HeaderValidation) = {
    val df = read(spark, path)
    val cols = df.columns.toSet
    (df, Sources.HeaderValidation(
      missingRequired = (required -- cols).toSeq.sorted,
      unexpected = (cols -- required -- tolerated).toSeq.sorted))
  }
}
