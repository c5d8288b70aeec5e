package graft.operators

import graft.{SparkEntry, SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Persisted IVF index: the cell-partitioned layout must make probes
  * partition-pruned, and the pruned probe must return exactly what the
  * in-memory IVF query (q_ann3) returns. */
class IvfIndexSpec extends SparkSpec {

  test("cell-partitioned index + pruned probe ≡ q_ann3") {
    val e = Tables.embeddings(spark, sf0001)
    val cent = e.filter(col("vec_id") < 16)
      .select(col("vec_id").as("cent_id"), col("embedding").as("cvec"))
    val dir = java.nio.file.Files.createTempDirectory("ivf").toString + "/index"
    IvfIndex.writeIndex(e, cent, dir)

    // layout: one directory per cell
    val cellDirs = new java.io.File(dir).listFiles().filter(_.getName.startsWith("cell="))
    assert(cellDirs.length > 4, s"expected many cell dirs, got ${cellDirs.length}")

    val queries = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val res = IvfIndex.probe(spark, dir, queries, cent, nprobe = 2, k = 3)
      .orderBy(col("query_id"), col("rnk"))

    // the scan must carry a partition filter on cell (directory pruning)
    val pf = res.queryExecution.executedPlan.toString.linesIterator
      .filter(_.contains("PartitionFilters")).toSeq
    assert(pf.exists(l => l.contains("cell#") && (l.contains("INSET") || l.contains("IN ("))),
      s"the index scan must be partition-pruned:\n${pf.mkString("\n")}")

    // same answer as the in-memory IVF gate query (same centroids,
    // nprobe, k): the persisted layout changes the plan, not the result
    val expected = SparkEntry.queries("q_ann3_ivf")(spark, sf0001)
      .collect().map(_.toSeq).toSeq
    assert(res.collect().map(_.toSeq).toSeq == expected)
  }
}
