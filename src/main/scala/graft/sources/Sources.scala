package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ingest-side sources and validators — SURVEY §2.1.
  *
  * The reference validates inputs operationally (no tests): required/
  * tolerated column sets, date-format sniffing, well normalization
  * (`viollier/ViollierMetadataReceiver.java:129-213, 327-344`), JSON
  * schema-drift detection on the GISAID feed
  * (`gisaid/GisaidApiImporter.java:165-223`). Here those guards are
  * first-class: validation errors become return values (reports /
  * rejected-row side outputs), not emails.
  */
object Sources {

  final case class HeaderValidation(missingRequired: Seq[String], unexpected: Seq[String]) {
    def ok: Boolean = missingRequired.isEmpty && unexpected.isEmpty
  }

  /** S2: delimited CSV with declared encoding + header validation.
    * `required` columns must all be present; columns outside
    * `required ++ tolerated` are reported as unexpected. */
  def readValidatedCsv(spark: SparkSession, path: String, delimiter: String,
      encoding: String, required: Set[String], tolerated: Set[String] = Set.empty)
      : (DataFrame, HeaderValidation) = {
    val df = spark.read
      .option("header", "true")
      .option("delimiter", delimiter)
      .option("encoding", encoding)
      .csv(path)
    val cols = df.columns.toSet
    val v = HeaderValidation(
      missingRequired = (required -- cols).toSeq.sorted,
      unexpected = (cols -- required -- tolerated).toSeq.sorted)
    (df, v)
  }

  /** S2 row-normalizer: date sniffing — `dd.MM.yyyy` vs `yyyy-MM-dd`
    * (ViollierMetadataReceiver.java:204-210). Unparseable → null. */
  def sniffDate(c: Column): Column =
    coalesce(
      try_to_timestamp(c, lit("yyyy-MM-dd")).cast("date"),
      try_to_timestamp(c, lit("dd.MM.yyyy")).cast("date"))

  /** S2/S11 well normalization `A01` → `A1` (receiver :339-344). A
    * value missing its row letter or digit suffix normalizes to ""
    * (the caller's missing-well reject) — and the empty extract must
    * never reach the int cast, which throws under ANSI. */
  def normalizeWell(c: Column): Column = {
    val row = regexp_extract(c, "^([A-Ha-h])", 1)
    val digits = regexp_extract(c, "0*([0-9]+)$", 1)
    when(row === "" || digits === "", lit(""))
      .otherwise(concat(row, digits.cast("int").cast("string")))
  }

  /** S11: well sort key for the per-center CSV reports — plate order,
    * then column-major wells (A1,B1,...,H1,A2,...) per
    * ViollierMetadataReceiver.java:372-416. Digit-less wells sort
    * first on a null number (the ANSI cast would throw on ''). */
  def wellSortKey(well: Column): Column = {
    val digits = regexp_extract(well, "([0-9]+)$", 1)
    struct(
      when(digits === "", lit(null).cast("int")).otherwise(digits.cast("int"))
        .as("well_number"),
      regexp_extract(well, "^([A-Ha-h])", 1).as("well_row"))
  }

  final case class DriftReport(missingRequired: Seq[String], missingExpected: Seq[String],
      unexpected: Seq[String]) {
    def fatal: Boolean = missingRequired.nonEmpty
  }

  /** S5: JSON-lines reader with schema-drift detection (GISAID feed
    * semantics, GisaidApiImporter.java:165-223): missing required
    * fields are fatal; missing expected / new unexpected fields are
    * reported but not fatal. */
  def readJsonWithDriftCheck(spark: SparkSession, path: String,
      required: Set[String], expected: Set[String]): (DataFrame, DriftReport) = {
    val df = spark.read.json(path)
    val fields = df.schema.fieldNames.toSet
    (df, driftReport(fields, required, expected))
  }

  private def driftReport(fields: Set[String], required: Set[String],
      expected: Set[String]): DriftReport = DriftReport(
    missingRequired = (required -- fields).toSeq.sorted,
    missingExpected = (expected -- fields -- required).toSeq.sorted,
    unexpected = (fields -- required -- expected).toSeq.sorted)

  /** Schema + drift report from a bounded SAMPLE of JSON lines — the
    * reference's own contract (it drift-checks the first 10 lines of
    * the feed, GisaidApiImporter.java:165-223), and the escape from
    * full-feed schema inference: inferring over a 400 GB feed costs a
    * complete extra decode pass; inferring over the head costs
    * milliseconds, and the explicit schema makes the real read the
    * ONLY full pass. Fields that first appear past the sample are
    * out-of-contract drift by the reference's definition. */
  def driftFromSample(spark: SparkSession, sample: Seq[String],
      required: Set[String], expected: Set[String])
      : (org.apache.spark.sql.types.StructType, DriftReport) = {
    import spark.implicits._
    val schema =
      if (sample.isEmpty) new org.apache.spark.sql.types.StructType()
      else spark.read.json(spark.createDataset(sample)).schema
    (schema, driftReport(schema.fieldNames.toSet, required, expected))
  }

  /** S8: TSV rule file → broadcast-ready key/value frame. */
  def readTsvRules(spark: SparkSession, path: String, cols: Seq[String]): DataFrame =
    spark.read.option("delimiter", "\t").option("header", "false")
      .csv(path).toDF(cols: _*)
}
