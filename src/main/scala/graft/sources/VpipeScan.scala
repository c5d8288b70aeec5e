package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.genomics.Fasta

/** S12 — V-pipe working-directory scan.
  *
  * The reference walks `samples/<sample>/<batch>/references/` for
  * `ref_majority_dels.fasta` / `consensus_ambig.bcftools.fasta`
  * (`python/import_sequences.py:74-211`). Spark-native: a recursive
  * wholeTextFiles glob; sample and batch fall out of the PATH (not the
  * file payload) via regex on the file name, then the FASTA payload is
  * parsed per file. One task per file — the per-sample directory tree
  * maps naturally onto file-level parallelism.
  */
object VpipeScan {

  val MajorityFasta = "ref_majority_dels.fasta"
  val AmbigFasta = "consensus_ambig.bcftools.fasta"

  /** (sample, batch, kind, header, seq) for every consensus FASTA under
    * `root/samples/<sample>/<batch>/references/`. */
  def scan(spark: SparkSession, root: String): DataFrame = {
    import spark.implicits._
    val files = spark.sparkContext
      .wholeTextFiles(s"$root/samples/*/*/references/*.fasta")
      .flatMap { case (path, content) =>
        Fasta.parseString(content).map { case (header, seq) => (path, header, seq) }
      }
      .toDF("path", "header", "seq")
    files
      .withColumn("sample",
        regexp_extract(col("path"), "samples/([^/]+)/[^/]+/references/", 1))
      .withColumn("batch",
        regexp_extract(col("path"), "samples/[^/]+/([^/]+)/references/", 1))
      .withColumn("kind",
        when(col("path").endsWith(MajorityFasta), "majority")
          .when(col("path").endsWith(AmbigFasta), "ambig")
          .otherwise("other"))
      .select(col("sample"), col("batch"), col("kind"), col("header"), col("seq"))
  }
}
