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

  test("IVF-PQ index: pruned float-free probe ≡ q_ann8") {
    val e = Tables.embeddings(spark, sf0001)
    val pts = e.select(lit(0L).as("grp"), col("vec_id"),
      KMeans.quantize(col("embedding")).as("qv"))
    val coarse = KMeans.train(spark,
      Sampling.deterministicSample(pts, "vec_id", AnnQueries.KmRate),
      AnnQueries.KmK, AnnQueries.KmIters)
    val slices = array((0 until AnnQueries.PqSub).map(i =>
      slice(col("embedding"), i * AnnQueries.PqDsub + 1, AnnQueries.PqDsub)): _*)
    val subPts = e.select(col("vec_id"), posexplode(slices).as(Seq("sub", "subvec")))
      .select(col("sub").cast(org.apache.spark.sql.types.LongType).as("grp"),
        col("vec_id"), KMeans.quantize(col("subvec")).as("qv"))
    val pqCents = KMeans.train(spark,
      Sampling.deterministicSample(subPts, "vec_id", AnnQueries.KmRate),
      AnnQueries.PqCent, AnnQueries.KmIters)

    val dir = java.nio.file.Files.createTempDirectory("ivfpq").toString + "/index"
    IvfIndex.writeIndexPq(e, coarse, pqCents, dir)

    // the persisted index holds codes only — no float column on disk
    val onDisk = spark.read.parquet(dir)
    assert(!onDisk.schema.fieldNames.exists(f => f.contains("embedding") || f.contains("qv")),
      s"index must not store floats: ${onDisk.schema.treeString}")

    val queries = e.filter(col("vec_id") < 4)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val res = IvfIndex.probePq(spark, dir, queries, coarse, pqCents,
      nprobe = 2, k = 3, excludeSelf = true)
      .orderBy(col("query_id"), col("rnk"))

    val plan = res.queryExecution.executedPlan.toString
    val pf = plan.linesIterator.filter(_.contains("PartitionFilters")).toSeq
    assert(pf.exists(l => l.contains("cell#") && (l.contains("INSET") || l.contains("IN ("))),
      s"the code scan must be partition-pruned:\n${pf.mkString("\n")}")
    // the probe never reads a float column from the index
    val readSchemas = plan.linesIterator.filter(_.contains("ReadSchema"))
      .filter(_.contains(dir)).mkString("\n")
    assert(!readSchemas.contains("embedding"),
      s"probe must not read floats from the index:\n$readSchemas")

    val expected = SparkEntry.queries("q_ann8_ivfpq")(spark, sf0001)
      .collect().map(_.toSeq).toSeq
    assert(res.collect().map(_.toSeq).toSeq == expected)
  }

  test("IVF-PQ serving path: persisted shortlist + float re-rank ≡ q_ann11") {
    val e = Tables.embeddings(spark, sf0001)
    val pts = e.select(lit(0L).as("grp"), col("vec_id"),
      KMeans.quantize(col("embedding")).as("qv"))
    val coarse = KMeans.train(spark,
      Sampling.deterministicSample(pts, "vec_id", AnnQueries.KmRate),
      AnnQueries.KmK, AnnQueries.KmIters)
    val slices = array((0 until AnnQueries.PqSub).map(i =>
      slice(col("embedding"), i * AnnQueries.PqDsub + 1, AnnQueries.PqDsub)): _*)
    val subPts = e.select(col("vec_id"), posexplode(slices).as(Seq("sub", "subvec")))
      .select(col("sub").cast(org.apache.spark.sql.types.LongType).as("grp"),
        col("vec_id"), KMeans.quantize(col("subvec")).as("qv"))
    val pqCents = KMeans.train(spark,
      Sampling.deterministicSample(subPts, "vec_id", AnnQueries.KmRate),
      AnnQueries.PqCent, AnnQueries.KmIters)
    val dir = java.nio.file.Files.createTempDirectory("ivfpqrr").toString + "/index"
    IvfIndex.writeIndexPq(e, coarse, pqCents, dir)

    val queries = e.filter(col("vec_id") < 4)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val res = IvfIndex.probePqRerank(spark, dir, queries, coarse, pqCents,
      floats = e, nprobe = 2, shortlist = 10, k = 3, excludeSelf = true)
      .orderBy(col("query_id"), col("rnk"))

    // the float fetch is a keyed join on the broadcast shortlist —
    // never a cartesian over the vector store
    val plan = res.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"shortlist must broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"re-rank must stay keyed:\n$plan")

    val expected = SparkEntry.queries("q_ann11_ivfpq_rerank")(spark, sf0001)
      .collect().map(_.toSeq).toSeq
    assert(res.collect().map(_.toSeq).toSeq == expected)
  }

  test("residual IVF-PQ index: pruned float-free probe ≡ q_ann10") {
    val e = Tables.embeddings(spark, sf0001)
    val pts = e.select(lit(0L).as("grp"), col("vec_id"),
      KMeans.quantize(col("embedding")).as("qv"))
    val coarse = KMeans.train(spark,
      Sampling.deterministicSample(pts, "vec_id", AnnQueries.KmRate),
      AnnQueries.KmK, AnnQueries.KmIters)
    // codebooks trained on the residual sub-points of the SAME coarse set
    val subPts = IvfIndex.residualSubPoints(e, coarse)
    val pqCents = KMeans.train(spark,
      Sampling.deterministicSample(subPts, "vec_id", AnnQueries.KmRate),
      AnnQueries.PqCent, AnnQueries.KmIters)

    val dir = java.nio.file.Files.createTempDirectory("ivfpqr").toString + "/index"
    IvfIndex.writeIndexPqResidual(e, coarse, pqCents, dir)

    val onDisk = spark.read.parquet(dir)
    assert(!onDisk.schema.fieldNames.exists(f => f.contains("embedding") || f.contains("qv")),
      s"index must not store floats: ${onDisk.schema.treeString}")

    val queries = e.filter(col("vec_id") < 4)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val res = IvfIndex.probePqResidual(spark, dir, queries, coarse, pqCents,
      nprobe = 2, k = 3, excludeSelf = true)
      .orderBy(col("query_id"), col("rnk"))

    val plan = res.queryExecution.executedPlan.toString
    val pf = plan.linesIterator.filter(_.contains("PartitionFilters")).toSeq
    assert(pf.exists(l => l.contains("cell#") && (l.contains("INSET") || l.contains("IN ("))),
      s"the code scan must be partition-pruned:\n${pf.mkString("\n")}")
    val readSchemas = plan.linesIterator.filter(_.contains("ReadSchema"))
      .filter(_.contains(dir)).mkString("\n")
    assert(!readSchemas.contains("embedding"),
      s"probe must not read floats from the index:\n$readSchemas")

    val expected = SparkEntry.queries("q_ann10_ivfpq_residual")(spark, sf0001)
      .collect().map(_.toSeq).toSeq
    assert(res.collect().map(_.toSeq).toSeq == expected)
  }

  test("incremental append ≡ full rebuild; only the batch's cells gain files") {
    val e = Tables.embeddings(spark, sf0001)
    val cent = e.filter(col("vec_id") < 16)
      .select(col("vec_id").as("cent_id"), col("embedding").as("cvec"))
    val old = e.filter(col("vec_id") < 400)
    val batch = e.filter(col("vec_id") >= 400)
    val base = java.nio.file.Files.createTempDirectory("ivfadd").toString
    val (incDir, rebuildDir) = (s"$base/inc", s"$base/rebuild")

    IvfIndex.writeIndex(old, cent, incDir)
    def filesPerCell(dir: String): Map[String, Set[String]] =
      new java.io.File(dir).listFiles().filter(_.getName.startsWith("cell="))
        .map(d => d.getName -> d.listFiles().map(_.getName)
          .filter(_.endsWith(".parquet")).toSet).toMap
    val before = filesPerCell(incDir)
    IvfIndex.appendToIndex(batch, cent, incDir)
    val after = filesPerCell(incDir)

    // directories gaining files are exactly the batch's assigned cells
    val touched = after.filter { case (d, fs) => before.getOrElse(d, Set.empty) != fs }.keySet
    val batchCells = IvfIndex.assign(batch, cent).select(col("cell")).distinct()
      .collect().map(r => s"cell=${r.getLong(0)}").toSet
    assert(touched == batchCells,
      s"append must touch exactly the batch cells: $touched vs $batchCells")
    // untouched cells keep their byte-identical file sets
    assert(before.forall { case (d, fs) => batchCells.contains(d) || after(d) == fs })

    IvfIndex.writeIndex(e, cent, rebuildDir)
    val queries = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    def run(dir: String) = IvfIndex.probe(spark, dir, queries, cent, nprobe = 2, k = 3)
      .orderBy(col("query_id"), col("rnk")).collect().map(_.toSeq).toSeq
    assert(run(incDir) == run(rebuildDir),
      "probe over the appended index must equal probe over a full rebuild")
  }

  test("IVF-PQ incremental append ≡ full rebuild under frozen codebooks") {
    val e = Tables.embeddings(spark, sf0001)
    val pts = e.select(lit(0L).as("grp"), col("vec_id"),
      KMeans.quantize(col("embedding")).as("qv"))
    val coarse = KMeans.train(spark,
      Sampling.deterministicSample(pts, "vec_id", AnnQueries.KmRate),
      AnnQueries.KmK, AnnQueries.KmIters)
    val slices = array((0 until AnnQueries.PqSub).map(i =>
      slice(col("embedding"), i * AnnQueries.PqDsub + 1, AnnQueries.PqDsub)): _*)
    val subPts = e.select(col("vec_id"), posexplode(slices).as(Seq("sub", "subvec")))
      .select(col("sub").cast(org.apache.spark.sql.types.LongType).as("grp"),
        col("vec_id"), KMeans.quantize(col("subvec")).as("qv"))
    val pqCents = KMeans.train(spark,
      Sampling.deterministicSample(subPts, "vec_id", AnnQueries.KmRate),
      AnnQueries.PqCent, AnnQueries.KmIters)
    val base = java.nio.file.Files.createTempDirectory("ivfpqadd").toString
    val (incDir, rebuildDir) = (s"$base/inc", s"$base/rebuild")

    IvfIndex.writeIndexPq(e.filter(col("vec_id") < 400), coarse, pqCents, incDir)
    IvfIndex.appendToIndexPq(e.filter(col("vec_id") >= 400), coarse, pqCents, incDir)
    IvfIndex.writeIndexPq(e, coarse, pqCents, rebuildDir)

    val queries = e.filter(col("vec_id") < 4)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    def run(dir: String) = IvfIndex.probePq(spark, dir, queries, coarse, pqCents,
        nprobe = 2, k = 3, excludeSelf = true)
      .orderBy(col("query_id"), col("rnk")).collect().map(_.toSeq).toSeq
    assert(run(incDir) == run(rebuildDir))
  }

  test("SQ8 index: code-only layout, stored-grid probe ≡ q_ann14") {
    val e = Tables.embeddings(spark, sf0001)
    val dir = java.nio.file.Files.createTempDirectory("sq8").toString + "/index"
    IvfIndex.writeIndexSq(e, dir)

    // the stored codes carry NO float column — the compression claim
    val codes = spark.read.parquet(s"$dir/codes")
    assert(codes.columns.toSet == Set("vec_id", "cv"),
      s"codes table must be (vec_id, cv) only, got ${codes.columns.mkString(",")}")
    assert(spark.read.parquet(s"$dir/grid").count() == 64L)

    val queries = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val res = IvfIndex.probeSq(spark, dir, queries, e, shortlist = 12, k = 3)
      .orderBy(col("query_id"), col("rnk"))
    val expected = SparkEntry.queries("q_ann14_sq8")(spark, sf0001)
      .collect().map(_.toSeq).toSeq
    assert(res.collect().map(_.toSeq).toSeq == expected,
      "persisted SQ8 probe must equal the in-memory gate")
  }

  test("fused IVF+SQ8: pruned code-only cells, probe ≡ in-memory reference") {
    val e = Tables.embeddings(spark, sf0001)
    val cent = e.filter(col("vec_id") < 16)
      .select(col("vec_id").as("cent_id"), col("embedding").as("cvec"))
    val dir = java.nio.file.Files.createTempDirectory("ivfsq").toString + "/index"
    IvfIndex.writeIndexIvfSq(e, cent, dir)

    // layout: cell directories hold code-only rows
    val cellDirs = new java.io.File(s"$dir/codes").listFiles()
      .filter(_.getName.startsWith("cell="))
    assert(cellDirs.length > 4)
    val codes = spark.read.parquet(s"$dir/codes")
    assert(codes.columns.toSet == Set("vec_id", "cv", "cell"),
      s"cells must store codes only, got ${codes.columns.mkString(",")}")

    val queries = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val res = IvfIndex.probeIvfSq(spark, dir, queries, cent, e,
      nprobe = 2, shortlist = 12, k = 3)
      .orderBy(col("query_id"), col("rnk"))

    // the codes scan must be partition-pruned to the probed cells
    val pf = res.queryExecution.executedPlan.toString.linesIterator
      .filter(_.contains("PartitionFilters")).toSeq
    assert(pf.exists(l => l.contains("cell#") && (l.contains("INSET") || l.contains("IN ("))),
      s"the codes scan must be partition-pruned:\n${pf.mkString("\n")}")

    // in-memory reference: same cells, same SQ8 shortlist, same rerank —
    // computed without the persisted layout
    val (mns, mxs) = IvfIndex.sqGrid(e)
    val assigned = IvfIndex.assign(e, cent)
      .select(col("vec_id"), col("cell"),
        graft.functions.VectorFunctions.sq8Code(col("embedding"), mns, mxs).as("cv"))
    import org.apache.spark.sql.expressions.Window
    val wProbe = Window.partitionBy(col("query_id")).orderBy(col("cd").asc, col("cent_id").asc)
    val probes = queries.crossJoin(broadcast(cent))
      .select(col("query_id"), col("qv"), col("cent_id"),
        graft.functions.VectorFunctions.intSqDist(col("qv"), col("cvec")).as("cd"))
      .withColumn("pr", row_number().over(wProbe)).filter(col("pr") <= 2)
      .select(col("query_id"), col("qv"), col("cent_id").as("cell"),
        graft.functions.VectorFunctions.sq8Code(col("qv"), mns, mxs).as("qcv"))
    val wShort = Window.partitionBy(col("query_id")).orderBy(col("cd").asc, col("vec_id").asc)
    val wRank = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("vec_id").asc)
    val ref = probes.join(assigned, Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("qv"), col("vec_id"),
        graft.functions.VectorFunctions.longSqDist(col("qcv"), col("cv")).as("cd"))
      .withColumn("s", row_number().over(wShort)).filter(col("s") <= 12)
      .join(e, Seq("vec_id"))
      .select(col("query_id"), col("vec_id"),
        graft.functions.VectorFunctions.cosine(col("qv"), col("embedding")).as("cos"))
      .withColumn("rnk", row_number().over(wRank).cast(org.apache.spark.sql.types.LongType))
      .filter(col("rnk") <= 3)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("rnk"))
      .orderBy(col("query_id"), col("rnk"))
    assert(res.collect().map(_.toSeq).toSeq == ref.collect().map(_.toSeq).toSeq,
      "persisted fused probe must equal the in-memory reference")
  }
}
