package graft.operators

import graft.functions.VectorFunctions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Persisted IVF index — q_ann3's production layout (its scaladoc's
  * "write bucketed by cell" note made real): the corpus is assigned to
  * its nearest centroid cell ONCE and written `partitionBy("cell")`,
  * so every later probe is a PARTITION-PRUNED scan of nprobe/nlist of
  * the data — the scan never lists, opens, or reads the other cells'
  * files. Probe cells are computed driver-side from the (tiny,
  * queries × nlist) centroid distance table and pushed as a literal
  * `cell IN (...)` filter, which Spark turns into directory-level
  * partition pruning; IvfIndexSpec asserts the pruned file set.
  *
  * Assignment uses the integer-exact quantized L2
  * ([[graft.functions.VectorFunctions.intSqDist]]) so the cell a
  * vector lands in is deterministic across engines and rebuilds;
  * ranking inside probed cells uses the exact cosine.
  */
object IvfIndex {

  /** (vec_id, embedding, cell): nearest-centroid assignment; ties break
    * to the lowest centroid id. Map-side only (centroids broadcast). */
  def assign(embeddings: DataFrame, centroids: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("vec_id")).orderBy(col("cd").asc, col("cent_id").asc)
    embeddings.crossJoin(broadcast(centroids))
      .select(col("vec_id"), col("embedding"), col("cent_id"),
        intSqDist(col("embedding"), col("cvec")).as("cd"))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("vec_id"), col("embedding"), col("cent_id").as("cell"))
  }

  /** Build and persist the index, one directory per cell. */
  def writeIndex(embeddings: DataFrame, centroids: DataFrame, path: String): Unit =
    assign(embeddings, centroids)
      .write.mode("overwrite").partitionBy("cell").parquet(path)

  /** Incremental maintenance: add a vector batch to a persisted index
    * WITHOUT retraining or rewriting — the arrival path of a growing
    * corpus (the codebook is a frozen artifact; only assignments grow,
    * cf. FAISS's add-after-train contract). Cell assignment is a pure
    * per-vector function of the stored centroids, so appended rows land
    * in exactly the directories a full rebuild would put them in:
    * probe(index ∪ batch) ≡ probe(rebuild(old ∪ batch)) — IvfIndexSpec
    * pins both that equivalence and that only the batch's own cell
    * directories receive new files. Batch-level idempotence/replay is
    * the caller's seam ([[IncrementalDedup]] dedups re-deliveries;
    * `TableIO.writeAtomicSwap` gives transactional cutover when a
    * reader must never see a half-appended batch). */
  def appendToIndex(batch: DataFrame, centroids: DataFrame, path: String): Unit =
    assign(batch, centroids)
      .write.mode("append").partitionBy("cell").parquet(path)

  /** Probe: top-k exact-cosine neighbors per query over its `nprobe`
    * nearest cells only. The index scan carries a literal cell filter →
    * partition pruning. `queries` = (query_id, qv). */
  def probe(spark: SparkSession, indexPath: String, queries: DataFrame,
      centroids: DataFrame, nprobe: Int, k: Int): DataFrame = {
    graft.functions.VecExpressions.register(spark)
    val wProbe = Window.partitionBy(col("query_id")).orderBy(col("cd").asc, col("cent_id").asc)
    // queries × nlist is tiny by contract — compute probe cells and
    // collect them; the literal IN list is what enables static pruning
    val probes = queries.crossJoin(broadcast(centroids))
      .select(col("query_id"), col("qv"), col("cent_id"),
        intSqDist(col("qv"), col("cvec")).as("cd"))
      .withColumn("__pr", row_number().over(wProbe))
      .filter(col("__pr") <= nprobe)
      .select(col("query_id"), col("qv"), col("cent_id").as("cell"))
    val cells = probes.select(col("cell")).distinct()
      .collect().map(_.get(0).asInstanceOf[Number].longValue()).toSeq.sorted
    // partition-type inference reads cell=N directories as int — match
    // the literal type so the IN filter stays a plain partition
    // predicate (a cast on the column side would defeat pruning)
    val raw = spark.read.parquet(indexPath)
    val cellType = raw.schema("cell").dataType
    val lits = if (cellType == org.apache.spark.sql.types.IntegerType)
      cells.map(c => lit(c.toInt)) else cells.map(lit(_))
    val index = raw.filter(col("cell").isin(lits: _*))
    val wRank = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("vec_id").asc)
    broadcast(probes.withColumn("cell", col("cell").cast(cellType))).join(index, Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"), cosine(col("qv"), col("embedding")).as("cos"))
      .withColumn("rnk", row_number().over(wRank).cast(LongType))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("rnk"))
  }

  /** [[appendToIndex]] for the float-free IVF-PQ layout: encode the
    * batch with the SAME frozen coarse + PQ codebooks and append its
    * (vec_id, sub, code) rows. Rebuild-equivalent for the same reason —
    * both assignment and encoding are pure per-vector functions of the
    * stored centroid sets. */
  def appendToIndexPq(batch: DataFrame, coarse: DataFrame, pqCents: DataFrame,
      path: String, nSub: Int = 8, dSub: Int = 8): Unit =
    encodePq(batch, coarse, pqCents, nSub, dSub)
      .write.mode("append").partitionBy("cell").parquet(path)

  // ------------------------------------------------------------- IVF-PQ

  /** Build and persist the IVF-PQ index (q_ann8's production layout):
    * each vector's trained-coarse cell assignment plus its `nSub`
    * per-subspace PQ codes, stored as (vec_id, sub, code) rows
    * partitioned by cell — the EMBEDDING FLOATS ARE NOT WRITTEN, so
    * after encode the index holds ~nSub small ints per vector and a
    * probe never reads a float. Cell is assigned first and carried
    * through the subspace explode, so the build is a single map-side
    * pass (both centroid sets broadcast), no self-join. */
  def writeIndexPq(embeddings: DataFrame, coarse: DataFrame, pqCents: DataFrame,
      path: String, nSub: Int = 8, dSub: Int = 8): Unit =
    encodePq(embeddings, coarse, pqCents, nSub, dSub)
      .write.mode("overwrite").partitionBy("cell").parquet(path)

  /** (vec_id, sub, code, cell) PQ encoding of `embeddings` under frozen
    * codebooks — the single map-side pass shared by the full build and
    * the incremental append. */
  private def encodePq(embeddings: DataFrame, coarse: DataFrame, pqCents: DataFrame,
      nSub: Int, dSub: Int): DataFrame = {
    val pts = embeddings.select(lit(0L).as("grp"), col("vec_id"),
      KMeans.quantize(col("embedding")).as("qv"), col("embedding"))
    val slices = array((0 until nSub).map(i =>
      slice(col("embedding"), i * dSub + 1, dSub)): _*)
    val subPts = KMeans.assign(pts, coarse)
      .select(col("vec_id"), col("cell"), posexplode(slices).as(Seq("sub", "subvec")))
      .select(col("sub").cast(LongType).as("grp"), col("vec_id"), col("cell"),
        KMeans.quantize(col("subvec")).as("qv"))
    KMeans.assign(subPts.withColumnRenamed("cell", "ivf_cell"), pqCents)
      .select(col("vec_id"), col("grp").as("sub"), col("cell").as("code"),
        col("ivf_cell").as("cell"))
  }

  /** ADC probe over the persisted IVF-PQ index: probe cells come from
    * the broadcast coarse centroids and are pushed as a literal
    * `cell IN (...)` partition filter; the query's 8×k distance table
    * broadcasts into the pruned code scan; approximate distance is the
    * sum of `nSub` table lookups. `queries` = (query_id, qv). */
  def probePq(spark: SparkSession, indexPath: String, queries: DataFrame,
      coarse: DataFrame, pqCents: DataFrame, nprobe: Int, k: Int,
      nSub: Int = 8, dSub: Int = 8, excludeSelf: Boolean = false): DataFrame = {
    val qpts = queries.select(col("query_id"),
      KMeans.quantize(col("qv")).as("qq"), col("qv"))
    val wProbe = Window.partitionBy(col("query_id")).orderBy(col("cd").asc, col("cent_id").asc)
    val probes = qpts.crossJoin(broadcast(coarse))
      .select(col("query_id"), col("cent_id"),
        KMeans.sqDistQ(col("qq"), col("cvec")).as("cd"))
      .withColumn("__pr", row_number().over(wProbe))
      .filter(col("__pr") <= nprobe)
      .select(col("query_id"), col("cent_id").as("cell"))
    val slices = array((0 until nSub).map(i =>
      slice(col("qv"), i * dSub + 1, dSub)): _*)
    val dt = qpts.select(col("query_id"), posexplode(slices).as(Seq("sub", "subvec")))
      .select(col("sub").cast(LongType).as("grp"), col("query_id"),
        KMeans.quantize(col("subvec")).as("qsub"))
      .join(broadcast(pqCents), Seq("grp"))
      .select(col("query_id"), col("grp").as("sub"), col("cent_id").as("code"),
        KMeans.sqDistQ(col("qsub"), col("cvec")).as("qd"))
    // literal IN list from the (queries × nlist — tiny) probe table →
    // directory-level partition pruning on the code scan
    val cells = probes.select(col("cell")).distinct()
      .collect().map(_.get(0).asInstanceOf[Number].longValue()).toSeq.sorted
    val raw = spark.read.parquet(indexPath)
    val cellType = raw.schema("cell").dataType
    val lits = if (cellType == org.apache.spark.sql.types.IntegerType)
      cells.map(c => lit(c.toInt)) else cells.map(lit(_))
    val index = raw.filter(col("cell").isin(lits: _*))
    val wRank = Window.partitionBy(col("query_id")).orderBy(col("adist").asc, col("vec_id").asc)
    val cand = broadcast(probes.withColumn("cell", col("cell").cast(cellType)))
      .join(index, Seq("cell"))
    (if (excludeSelf) cand.filter(col("vec_id") =!= col("query_id")) else cand)
      .join(broadcast(dt), Seq("query_id", "sub", "code"))
      .groupBy(col("query_id"), col("vec_id"))
      .agg(sum(col("qd")).as("adist"))
      .withColumn("rnk", row_number().over(wRank).cast(LongType))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("rnk"))
  }

  /** ADC shortlist + exact re-rank over the persisted index — the
    * serving path (q_ann11's production twin): [[probePq]] ranks a
    * top-`shortlist` float-free, then ONLY those O(queries·shortlist)
    * ids fetch their floats from `floats` (the bucketed vector store)
    * through a keyed join for the exact-cosine top-`k`. Quantized
    * recall, exact precision at the top; the float table is never
    * scanned corpus-wide. `queries` = (query_id, qv);
    * `floats` = (vec_id, embedding). */
  def probePqRerank(spark: SparkSession, indexPath: String, queries: DataFrame,
      coarse: DataFrame, pqCents: DataFrame, floats: DataFrame,
      nprobe: Int, shortlist: Int, k: Int,
      nSub: Int = 8, dSub: Int = 8, excludeSelf: Boolean = false): DataFrame = {
    require(shortlist >= k, "shortlist must be at least k")
    graft.functions.VecExpressions.register(spark)
    val short = probePq(spark, indexPath, queries, coarse, pqCents,
        nprobe, shortlist, nSub, dSub, excludeSelf)
      .select(col("query_id"), col("neighbor_id").as("vec_id"))
    val wRank = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    broadcast(short).join(floats, Seq("vec_id"))
      .join(broadcast(queries), Seq("query_id"))
      .select(col("query_id"), col("vec_id"),
        cosine(col("qv"), col("embedding")).as("cos"))
      .withColumn("rnk", row_number().over(wRank).cast(LongType))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("rnk"))
  }

  // --------------------------------------------------- residual IVF-PQ

  /** Per-subspace RESIDUAL points (grp=sub, vec_id, cell, qv): the
    * vector's quantized displacement from its assigned coarse centroid,
    * sliced into `nSub` subvectors — the training AND encode input of
    * the residual form (q_ann10 / IVFADC). Shared so the index build
    * encodes with exactly the frame the codebooks were trained on. */
  def residualSubPoints(embeddings: DataFrame, coarse: DataFrame,
      nSub: Int = 8, dSub: Int = 8): DataFrame = {
    val pts = embeddings.select(lit(0L).as("grp"), col("vec_id"),
      KMeans.quantize(col("embedding")).as("qv"))
    val rSlices = array((0 until nSub).map(i =>
      slice(col("rv"), i * dSub + 1, dSub)): _*)
    KMeans.assign(pts, coarse)
      .join(broadcast(coarse.select(col("cent_id").as("cell"), col("cvec"))), Seq("cell"))
      .select(col("vec_id"), col("cell"),
        zip_with(col("qv"), col("cvec"), (x, y) => x - y).as("rv"))
      .select(col("vec_id"), col("cell"), posexplode(rSlices).as(Seq("sub", "sv")))
      .select(col("sub").cast(LongType).as("grp"), col("vec_id"), col("cell"),
        col("sv").as("qv"))
  }

  /** Persist the RESIDUAL IVF-PQ index: same (vec_id, sub, code)
    * cell-partitioned float-free layout as [[writeIndexPq]], but codes
    * quantize the residual to the assigned coarse centroid — the
    * codebooks describe within-cell displacement, which is what remains
    * after coarse pruning (IVFADC, Jégou et al. PAMI'11 §IV).
    * `pqCents` must be trained on [[residualSubPoints]] of the same
    * coarse set. */
  def writeIndexPqResidual(embeddings: DataFrame, coarse: DataFrame,
      pqCents: DataFrame, path: String, nSub: Int = 8, dSub: Int = 8): Unit =
    KMeans.assign(
        residualSubPoints(embeddings, coarse, nSub, dSub)
          .withColumnRenamed("cell", "ivf_cell"), pqCents)
      .select(col("vec_id"), col("grp").as("sub"), col("cell").as("code"),
        col("ivf_cell").as("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(path)

  /** ADC probe over the residual index. Identical pruning/broadcast
    * shape to [[probePq]]; the one structural change is that the
    * distance table is keyed by (query, PROBED CELL, sub, code) — the
    * query's residual differs per probed cell — and joins on the cell
    * as well. Still queries·nprobe·nSub·k rows: tiny, broadcast. */
  def probePqResidual(spark: SparkSession, indexPath: String, queries: DataFrame,
      coarse: DataFrame, pqCents: DataFrame, nprobe: Int, k: Int,
      nSub: Int = 8, dSub: Int = 8, excludeSelf: Boolean = false): DataFrame = {
    val qpts = queries.select(col("query_id"), KMeans.quantize(col("qv")).as("qq"))
    val wProbe = Window.partitionBy(col("query_id")).orderBy(col("cd").asc, col("cent_id").asc)
    val probes = qpts.crossJoin(broadcast(coarse))
      .select(col("query_id"), col("cent_id"),
        KMeans.sqDistQ(col("qq"), col("cvec")).as("cd"))
      .withColumn("__pr", row_number().over(wProbe))
      .filter(col("__pr") <= nprobe)
      .select(col("query_id"), col("cent_id").as("cell"))
    val rSlices = array((0 until nSub).map(i =>
      slice(col("rv"), i * dSub + 1, dSub)): _*)
    val dt = qpts.join(broadcast(probes), Seq("query_id"))
      .join(broadcast(coarse.select(col("cent_id").as("cell"), col("cvec"))), Seq("cell"))
      .select(col("query_id"), col("cell"),
        zip_with(col("qq"), col("cvec"), (x, y) => x - y).as("rv"))
      .select(col("query_id"), col("cell"), posexplode(rSlices).as(Seq("sub", "qsub")))
      .select(col("query_id"), col("cell"), col("sub").cast(LongType).as("grp"), col("qsub"))
      .join(broadcast(pqCents), Seq("grp"))
      .select(col("query_id"), col("cell"), col("grp").as("sub"),
        col("cent_id").as("code"), KMeans.sqDistQ(col("qsub"), col("cvec")).as("qd"))
    val cells = probes.select(col("cell")).distinct()
      .collect().map(_.get(0).asInstanceOf[Number].longValue()).toSeq.sorted
    val raw = spark.read.parquet(indexPath)
    val cellType = raw.schema("cell").dataType
    val lits = if (cellType == org.apache.spark.sql.types.IntegerType)
      cells.map(c => lit(c.toInt)) else cells.map(lit(_))
    val index = raw.filter(col("cell").isin(lits: _*))
    val wRank = Window.partitionBy(col("query_id")).orderBy(col("adist").asc, col("vec_id").asc)
    val cand = broadcast(probes.withColumn("cell", col("cell").cast(cellType)))
      .join(index, Seq("cell"))
    (if (excludeSelf) cand.filter(col("vec_id") =!= col("query_id")) else cand)
      .join(broadcast(dt.withColumn("cell", col("cell").cast(cellType))),
        Seq("query_id", "cell", "sub", "code"))
      .groupBy(col("query_id"), col("vec_id"))
      .agg(sum(col("qd")).as("adist"))
      .withColumn("rnk", row_number().over(wRank).cast(LongType))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("rnk"))
  }

  // ------------------------------------------------------------------
  // Persisted SQ8 layout (q_ann14's production form): the stored index
  // is ONLY (vec_id, cv) — one byte-range long per component instead
  // of a float, the 4× compression that is the point of scalar
  // quantization — plus the 64-row grid. The shortlist scans codes
  // alone; floats are touched only for the top-R rerank, via a KEYED
  // join back to the source embeddings (the probePqRerank discipline).
  // ------------------------------------------------------------------

  /** Per-dimension (min, max) grid of the corpus — the SQ8 trained
    * artifact. One two-phase agg collapsing to dim rows, collected
    * (bounded by contract) to re-enter plans as literal arrays. */
  def sqGrid(embeddings: DataFrame): (Seq[Double], Seq[Double]) = {
    val stats = embeddings
      .select(posexplode(col("embedding")).as(Seq("i", "x")))
      .groupBy(col("i"))
      .agg(min(col("x").cast("double")).as("mn"), max(col("x").cast("double")).as("mx"))
      .orderBy(col("i")).collect()
    (stats.toSeq.map(_.getDouble(1)), stats.toSeq.map(_.getDouble(2)))
  }

  /** Build and persist the SQ8 index: codes under `path`/codes, the
    * grid under `path`/grid. */
  def writeIndexSq(embeddings: DataFrame, path: String): Unit = {
    val (mns, mxs) = sqGrid(embeddings)
    val spark = embeddings.sparkSession
    import spark.implicits._
    mns.indices.map(i => (i, mns(i), mxs(i))).toDF("i", "mn", "mx")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/grid")
    embeddings
      .select(col("vec_id"), sq8Code(col("embedding"), mns, mxs).as("cv"))
      .write.mode("overwrite").parquet(s"$path/codes")
  }

  // ------------------------------------------------------------------
  // Fused IVF + SQ8 (the FAISS "IVF,SQ8" factory string): coarse cells
  // give partition pruning (only nprobe/nlist of the files are ever
  // listed), SQ8 codes inside the cells give the 4× storage cut and a
  // float-free shortlist — the two layouts above composed into the one
  // production serving shape. Stored per cell: (vec_id, cv) only; the
  // grid rides beside the codes; floats appear exclusively in the
  // keyed top-R rerank join against the source embeddings.
  // ------------------------------------------------------------------

  /** Build: assign to cells under `centroids`, encode on the corpus
    * grid, write codes partitioned by cell + the grid. */
  def writeIndexIvfSq(embeddings: DataFrame, centroids: DataFrame,
      path: String): Unit = {
    val (mns, mxs) = sqGrid(embeddings)
    val spark = embeddings.sparkSession
    import spark.implicits._
    mns.indices.map(i => (i, mns(i), mxs(i))).toDF("i", "mn", "mx")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/grid")
    assign(embeddings, centroids)
      .select(col("vec_id"), sq8Code(col("embedding"), mns, mxs).as("cv"),
        col("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(s"$path/codes")
  }

  /** Probe: nprobe nearest cells per query (literal IN pushdown →
    * directory pruning), code-L2 shortlist WITHIN the probed cells,
    * exact cosine rerank via a keyed join. */
  def probeIvfSq(spark: SparkSession, indexPath: String, queries: DataFrame,
      centroids: DataFrame, embeddings: DataFrame,
      nprobe: Int, shortlist: Int, k: Int): DataFrame = {
    graft.functions.VecExpressions.register(spark)
    val g = spark.read.parquet(s"$indexPath/grid").orderBy(col("i")).collect()
    val mns = g.toSeq.map(_.getDouble(1))
    val mxs = g.toSeq.map(_.getDouble(2))
    val wProbe = Window.partitionBy(col("query_id")).orderBy(col("cd").asc, col("cent_id").asc)
    val probes = queries.crossJoin(broadcast(centroids))
      .select(col("query_id"), col("qv"), col("cent_id"),
        intSqDist(col("qv"), col("cvec")).as("cd"))
      .withColumn("__pr", row_number().over(wProbe))
      .filter(col("__pr") <= nprobe)
      .select(col("query_id"), col("qv"), col("cent_id").as("cell"))
      .withColumn("qcv", sq8Code(col("qv"), mns, mxs))
    val cells = probes.select(col("cell")).distinct()
      .collect().map(_.get(0).asInstanceOf[Number].longValue()).toSeq.sorted
    val raw = spark.read.parquet(s"$indexPath/codes")
    val cellType = raw.schema("cell").dataType
    val lits = if (cellType == org.apache.spark.sql.types.IntegerType)
      cells.map(c => lit(c.toInt)) else cells.map(lit(_))
    val index = raw.filter(col("cell").isin(lits: _*))
    val wShort = Window.partitionBy(col("query_id")).orderBy(col("cd").asc, col("vec_id").asc)
    val short = broadcast(probes.withColumn("cell", col("cell").cast(cellType)))
      .join(index, Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("qv"), col("vec_id"),
        longSqDist(col("qcv"), col("cv")).as("cd"))
      .withColumn("__s", row_number().over(wShort))
      .filter(col("__s") <= shortlist)
      .select(col("query_id"), col("qv"), col("vec_id"))
    val wRank = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("vec_id").asc)
    short.join(embeddings, Seq("vec_id"))
      .select(col("query_id"), col("vec_id"),
        cosine(col("qv"), col("embedding")).as("cos"))
      .withColumn("rnk", row_number().over(wRank).cast(LongType))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("rnk"))
  }

  /** Probe the SQ8 index: encode queries on the STORED grid (an index
    * must answer with the grid it was built with, even after the
    * corpus drifts), code-L2 shortlist over the codes table, exact
    * cosine rerank for the shortlist only — floats enter through a
    * keyed join of the shortlisted ids against `embeddings`. */
  def probeSq(spark: SparkSession, indexPath: String, queries: DataFrame,
      embeddings: DataFrame, shortlist: Int, k: Int): DataFrame = {
    graft.functions.VecExpressions.register(spark)
    val g = spark.read.parquet(s"$indexPath/grid").orderBy(col("i")).collect()
    val mns = g.toSeq.map(_.getDouble(1))
    val mxs = g.toSeq.map(_.getDouble(2))
    val q = queries.select(col("query_id"), col("qv"),
      sq8Code(col("qv"), mns, mxs).as("qcv"))
    val codes = spark.read.parquet(s"$indexPath/codes")
    val wp = Window.partitionBy(col("query_id")).orderBy(col("cd").asc, col("vec_id").asc)
    val short = broadcast(q).join(codes, col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("qv"), col("vec_id"),
        longSqDist(col("qcv"), col("cv")).as("cd"))
      .withColumn("__pr", row_number().over(wp))
      .filter(col("__pr") <= shortlist)
      .select(col("query_id"), col("qv"), col("vec_id"))
    val wr = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("vec_id").asc)
    short.join(embeddings, Seq("vec_id"))
      .select(col("query_id"), col("vec_id"),
        cosine(col("qv"), col("embedding")).as("cos"))
      .withColumn("rnk", row_number().over(wr).cast(LongType))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("rnk"))
  }
}
