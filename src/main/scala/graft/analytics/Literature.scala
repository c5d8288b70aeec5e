package graft.analytics

import graft.genomics.Annotations
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Literature cross-link views + the rxiv ingest composition.
  *
  * Re-expresses `database/sql/pubmed_init.sql:43-58, 89-105`
  * (`pangolin_lineage__pubmed_article` / `__rxiv_article`) and the
  * rxiv REST pipeline (`rxiv/RxivDownloader.java:58-130`): candidate
  * lineage mentions are extracted with the reference's regex (all
  * matches, G4) rather than a LIKE scan — the reference comments that
  * LIKE O(N·M) also matches prefixes ("B.1.1.7" → "B.1.1"); the regex
  * takes the longest dotted run, then equality-joins against the
  * distinct known-lineage set.
  */
object Literature {

  /** `pubmed_init.sql:50` — a lineage-looking dotted run. */
  val LineageMentionPattern = "[VMDWBSNLZGPUKAYRC](\\.[0-9]+)+"

  /** `pangolin_lineage__*_article`: distinct (lineage, article) pairs
    * where a known lineage appears verbatim in the article text.
    * Plan shape: the mention side is O(articles × few mentions); the
    * distinct-lineage side is small → broadcast equality join, no
    * O(N·M) scan. */
  def lineageCrossLink(articles: DataFrame, idCol: String, textCols: Seq[String],
      lineages: DataFrame, lineageCol: String = "pangolin_lineage"): DataFrame = {
    val text = s"concat_ws(' ', ${textCols.map(c => s"coalesce($c, '')").mkString(", ")})"
    val mentions = articles
      .select(col(idCol), explode(
        expr(s"regexp_extract_all($text, '(${LineageMentionPattern})', 0)"))
        .as("maybe_pangolin_lineage"))
      .distinct()
    val known = lineages.select(col(lineageCol).as("pangolin_lineage")).distinct()
    mentions.join(broadcast(known),
        mentions("maybe_pangolin_lineage") === known("pangolin_lineage"))
      .select(col("pangolin_lineage"), col(idCol))
  }

  /** S7 — paged REST collection ingest. The page loop is driver-side
    * I/O exactly as in the reference (`RxivDownloader.java:62-66`
    * fetches page by page on one node); `fetchPage(i)` returns the raw
    * JSON body of page i or None past the end. Pages parse distributed
    * via spark.read.json over a Dataset[String]; the `collection`
    * array explodes into one row per article with the reference's
    * field handling (authors ';'-split+trim, version int,
    * published "NA" → null). */
  def pagedCollectionIngest(spark: SparkSession, fetchPage: Int => Option[String]): DataFrame = {
    import spark.implicits._
    val pages = Iterator.from(0).map(fetchPage).takeWhile(_.isDefined).map(_.get).toSeq
    if (pages.isEmpty) return spark.emptyDataFrame
    val ds: Dataset[String] = spark.createDataset(pages)
    spark.read.json(ds)
      .select(explode(col("collection")).as("a"))
      .select(
        col("a.doi").as("doi"),
        col("a.title").as("title"),
        transform(split(col("a.authors"), ";"), a => trim(a)).as("authors"),
        // REST feed values are untrusted: ANSI to_date/cast throw on
        // malformed input, so both parse defensively to null
        try_to_timestamp(col("a.date"), lit("yyyy-MM-dd")).cast("date").as("date"),
        when(col("a.version").rlike("^[0-9]+$"), col("a.version").cast("int"))
          .otherwise(lit(null).cast("int")).as("version"),
        col("a.type").as("type"),
        col("a.license").as("license"),
        col("a.category").as("category"),
        col("a.jatsxml").as("jatsxml"),
        col("a.abstract").as("abstract"),
        when(col("a.published") === "NA", lit(null)).otherwise(col("a.published")).as("published"),
        col("a.server").as("server"))
  }

  /** The reference's COVID relevance filter
    * (`RxivDownloader.java:96-104`): title and abstract non-blank and
    * a covid keyword present. */
  def covidFilter(articles: DataFrame): DataFrame =
    articles.filter(
      col("title").isNotNull && trim(col("title")) =!= "" &&
      col("abstract").isNotNull && trim(col("abstract")) =!= "" &&
      Annotations.covidRelated(col("title"), col("abstract")))

  /** D14 version upsert (`RxivDownloader.java:107-130` delete+reinsert
    * on strictly newer version): per doi keep the max version; on a
    * version tie the EXISTING row wins (the reference skips incoming
    * rows whose version is <= the stored one). */
  def versionUpsert(existing: DataFrame, incoming: DataFrame): DataFrame = {
    val tagged = existing.withColumn("__is_existing", lit(1))
      .unionByName(incoming.withColumn("__is_existing", lit(0)))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("doi"))
      .orderBy(col("version").desc, col("__is_existing").desc)
    tagged.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn", "__is_existing")
  }
}
