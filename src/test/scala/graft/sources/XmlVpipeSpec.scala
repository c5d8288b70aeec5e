package graft.sources

import graft.SparkSpec
import java.io.ByteArrayInputStream
import java.nio.file.{Files, Paths}
import java.util.zip.GZIPOutputStream

class XmlVpipeSpec extends SparkSpec {

  private val pubmedXml =
    """<?xml version="1.0"?>
      |<PubmedArticleSet>
      |  <PubmedArticle>
      |    <MedlineCitation><PMID>111</PMID>
      |      <Article>
      |        <ArticleTitle>COVID-19 and B.1.1.7 spread</ArticleTitle>
      |        <Language>eng</Language>
      |        <AuthorList><Author><LastName>Doe</LastName></Author>
      |          <Author><LastName>Smith</LastName></Author></AuthorList>
      |      </Article>
      |    </MedlineCitation>
      |  </PubmedArticle>
      |  <PubmedArticle>
      |    <MedlineCitation><PMID>222</PMID>
      |      <Article><ArticleTitle>Influenza</ArticleTitle><Language>ger</Language></Article>
      |    </MedlineCitation>
      |  </PubmedArticle>
      |</PubmedArticleSet>""".stripMargin

  private val fields = Seq(
    "MedlineCitation/PMID",
    "MedlineCitation/Article/ArticleTitle",
    "MedlineCitation/Article/Language",
    "MedlineCitation/Article/AuthorList/Author/LastName")

  test("S6 SAX record parse: rowTag subtrees, path fields, first-occurrence wins") {
    val recs = XmlSource.parseRecords(
      new ByteArrayInputStream(pubmedXml.getBytes), "PubmedArticle", fields)
    assert(recs.length == 2)
    assert(recs(0)("MedlineCitation/PMID") == "111")
    assert(recs(0)("MedlineCitation/Article/AuthorList/Author/LastName") == "Doe") // first author
    assert(recs(1)("MedlineCitation/Article/Language") == "ger")
  }

  test("S6 distributed read incl. gzip") {
    val dir = Files.createTempDirectory("xmlsrc")
    Files.writeString(dir.resolve("plain.xml"), pubmedXml)
    val gz = new GZIPOutputStream(Files.newOutputStream(dir.resolve("compressed.xml.gz")))
    gz.write(pubmedXml.getBytes); gz.close()
    val df = XmlSource.read(spark, s"$dir/*", "PubmedArticle", fields)
    assert(df.count() == 4) // 2 records × 2 files
    val titles = df.select("MedlineCitation_Article_ArticleTitle")
      .collect().map(_.getString(0)).toSet
    assert(titles == Set("COVID-19 and B.1.1.7 spread", "Influenza"))
  }

  test("S12 V-pipe tree scan extracts sample/batch from paths") {
    val root = Files.createTempDirectory("vpipe").toString
    def put(sample: String, batch: String, file: String, fasta: String): Unit = {
      val d = Paths.get(s"$root/samples/$sample/$batch/references")
      Files.createDirectories(d)
      Files.writeString(d.resolve(file), fasta)
    }
    put("160001", "20210101_B1", VpipeScan.MajorityFasta, ">ref\nACGT\n")
    put("160001", "20210101_B1", VpipeScan.AmbigFasta, ">ref\nACGN\n")
    put("160002", "20210202_B2", VpipeScan.MajorityFasta, ">ref\nTTTT\n")
    val out = VpipeScan.scan(spark, root)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(4))).toSet
    assert(out == Set(
      ("160001", "20210101_B1", "majority", "ACGT"),
      ("160001", "20210101_B1", "ambig", "ACGN"),
      ("160002", "20210202_B2", "majority", "TTTT")))
  }
}
