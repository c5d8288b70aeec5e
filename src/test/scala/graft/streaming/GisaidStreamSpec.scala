package graft.streaming

import graft.SparkSpec
import graft.core.TableIO
import java.nio.file.{Files, Paths}

/** Streaming GISAID import: drops land as files → micro-batches merge
  * into the live table; stream result ≡ running the batch kernel. */
class GisaidStreamSpec extends SparkSpec {

  private def rec(id: String, strain: String, date: String, lineage: String): String =
    s"""{"covv_accession_id":"$id","covv_virus_name":"$strain","covv_collection_date":"$date","covv_location":"Europe / Switzerland / Zurich","covv_patient_age":"42","covv_gender":"Male","covv_lineage":"$lineage","covv_subm_date":"$date","sequence":"ACGTACGTTCGTACGT"}"""

  test("two file drops: second upserts over the first; result matches batch kernel") {
    val dir = Files.createTempDirectory("gstream").toString
    val feed = s"$dir/feed"; Files.createDirectories(Paths.get(feed))
    val table = s"$dir/gisaid_api_sequence"
    val ckpt = s"$dir/ckpt"

    // drop 1: two records
    Files.writeString(Paths.get(s"$feed/drop1.jsonl"),
      rec("EPI_1", "Switzerland/ZH-ETHZ-160001/2021", "2021-03-01", "B.1.1.7") + "\n" +
      rec("EPI_2", "Germany/BY-2/2021", "2021-03-02", "BA.1") + "\n")
    GisaidStream.start(spark, feed, table, ckpt).awaitTermination()
    val after1 = TableIO.read(spark, table).collect()
      .map(r => r.getAs[String]("gisaid_epi_isl") -> r.getAs[String]("pango_lineage")).toMap
    assert(after1 == Map("EPI_1" -> "B.1.1.7", "EPI_2" -> "BA.1"))

    // drop 2: EPI_2 updated (new lineage call), EPI_3 new
    Files.writeString(Paths.get(s"$feed/drop2.jsonl"),
      rec("EPI_2", "Germany/BY-2/2021", "2021-03-02", "BA.1.1") + "\n" +
      rec("EPI_3", "France/IDF-3/2021", "2021-03-03", "B.1.617.2") + "\n")
    GisaidStream.start(spark, feed, table, ckpt).awaitTermination()
    val after2 = TableIO.read(spark, table).collect()
      .map(r => r.getAs[String]("gisaid_epi_isl") -> r.getAs[String]("pango_lineage")).toMap
    assert(after2 == Map("EPI_1" -> "B.1.1.7", "EPI_2" -> "BA.1.1", "EPI_3" -> "B.1.617.2"))

    // checkpoint = exactly-once per file: restarting with no new files merges nothing new
    GisaidStream.start(spark, feed, table, ckpt).awaitTermination()
    assert(TableIO.read(spark, table).count() == 3)

    // normalization parity with the batch kernel (D5/D6/D10 applied)
    val row = TableIO.read(spark, table).filter(org.apache.spark.sql.functions.col(
      "gisaid_epi_isl") === "EPI_1").head()
    assert(row.getAs[String]("country") == "Switzerland")
    assert(row.getAs[Boolean]("is_ours"))
    assert(row.getAs[Int]("ethid") == 160001)
  }
}
