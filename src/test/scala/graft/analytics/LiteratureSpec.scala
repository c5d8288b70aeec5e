package graft.analytics

import graft.SparkSpec
import graft.sources.XmlSource
import org.apache.spark.sql.functions._

/** Literature cross-link (`pubmed_init.sql:43-58`) + rxiv ingest
  * composition (`RxivDownloader.java:58-130`). */
class LiteratureSpec extends SparkSpec {

  test("pubmed cross-link: XML → mention extraction → distinct-lineage join") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("lit").toString
    // B.1.1.7 must NOT also link B.1.1 (the reference's regex-over-LIKE
    // rationale); P.1 in article 2; article 3 mentions no known lineage
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/pubmed.xml"),
      """<PubmedArticleSet>
        |<PubmedArticle><MedlineCitation><PMID>101</PMID>
        |  <Article><ArticleTitle>Emergence of B.1.1.7 in the UK</ArticleTitle>
        |  <Abstract><AbstractText>We analyse the alpha variant B.1.1.7 spread.</AbstractText></Abstract></Article>
        |</MedlineCitation></PubmedArticle>
        |<PubmedArticle><MedlineCitation><PMID>102</PMID>
        |  <Article><ArticleTitle>P.1 in Manaus</ArticleTitle>
        |  <Abstract><AbstractText>Gamma lineage P.1 and unknown X.9.9 run.</AbstractText></Abstract></Article>
        |</MedlineCitation></PubmedArticle>
        |<PubmedArticle><MedlineCitation><PMID>103</PMID>
        |  <Article><ArticleTitle>A covid study</ArticleTitle>
        |  <Abstract><AbstractText>No lineage here.</AbstractText></Abstract></Article>
        |</MedlineCitation></PubmedArticle>
        |</PubmedArticleSet>""".stripMargin)
    val articles = XmlSource.read(spark, s"$dir/pubmed.xml", "PubmedArticle",
      Seq("MedlineCitation/PMID", "MedlineCitation/Article/ArticleTitle",
        "MedlineCitation/Article/Abstract/AbstractText"))
      .toDF("pmid", "article_title", "abstract")
    val lineages = Seq("B.1.1.7", "B.1.1", "P.1", "B.1.617.2").toDF("pangolin_lineage")
    val out = Literature.lineageCrossLink(articles, "pmid",
        Seq("article_title", "abstract"), lineages)
      .as[(String, String)].collect().toSet
    assert(out == Set(("B.1.1.7", "101"), ("P.1", "102")))
  }

  test("rxiv ingest: paged fetch → parse → covid filter → version upsert") {
    import spark.implicits._
    def page(i: Int): Option[String] = i match {
      case 0 => Some("""{"collection":[
        {"doi":"10.1/a","title":"SARS-CoV-2 spike study","authors":"Doe, J; Roe, R","date":"2021-03-01","version":"2","type":"new","license":"cc_by","category":"microbiology","jatsxml":"http://x/a.xml","abstract":"We study covid-19 antibodies.","published":"NA","server":"biorxiv"},
        {"doi":"10.1/b","title":"Unrelated plant biology","authors":"Moe, M","date":"2021-03-02","version":"1","type":"new","license":"cc_by","category":"botany","jatsxml":"http://x/b.xml","abstract":"Chlorophyll dynamics.","published":"NA","server":"biorxiv"}]}""")
      case 1 => Some("""{"collection":[
        {"doi":"10.1/c","title":"","authors":"Empty, T","date":"2021-03-03","version":"1","type":"new","license":"cc_by","category":"micro","jatsxml":"http://x/c.xml","abstract":"covid19 but blank title.","published":"10.99/journal","server":"medrxiv"}]}""")
      case _ => None
    }
    val parsed = Literature.pagedCollectionIngest(spark, page)
    assert(parsed.count() == 3)
    val a = parsed.filter(col("doi") === "10.1/a").head()
    assert(a.getAs[scala.collection.Seq[String]]("authors").toSeq == Seq("Doe, J", "Roe, R"))
    assert(a.getAs[Int]("version") == 2)
    assert(a.getAs[String]("published") == null)

    val covid = Literature.covidFilter(parsed)
    assert(covid.select("doi").as[String].collect().toSet == Set("10.1/a")) // b: no keyword, c: blank title

    // version upsert: existing v2 beats incoming v2 (tie → existing),
    // incoming v3 replaces, new doi inserts
    val existing = Seq(("10.1/a", 2, "old-row"), ("10.1/x", 1, "keep-x"))
      .toDF("doi", "version", "payload")
    val incoming = Seq(("10.1/a", 2, "same-version-skip"), ("10.1/a", 3, "newer-wins"),
      ("10.1/y", 1, "new-doi")).toDF("doi", "version", "payload")
    val merged = Literature.versionUpsert(existing, incoming)
      .select("doi", "payload").as[(String, String)].collect().toMap
    assert(merged == Map("10.1/a" -> "newer-wins", "10.1/x" -> "keep-x", "10.1/y" -> "new-doi"))
  }
}
