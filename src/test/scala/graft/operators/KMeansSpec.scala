package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Trained quantizer guarantees: determinism (bit-identical centroids
  * across reruns — the property the oracle gate relies on), objective
  * improvement and occupancy balance vs the degenerate first-k pick
  * that q_ann3/4/5 seed with, and grouped (per-subspace) training for
  * PQ codebooks. */
class KMeansSpec extends SparkSpec {

  private def pts = Tables.embeddings(spark, sf0001)
    .select(lit(0L).as("grp"), col("vec_id"),
      KMeans.quantize(col("embedding")).as("qv"))

  private def degenerate = pts.filter(col("vec_id") < 16)
    .select(col("grp"), col("vec_id").as("cent_id"), col("qv").as("cvec"))

  test("training is deterministic: two runs give identical centroids") {
    val samp = Sampling.deterministicSample(pts, "vec_id", 0.5)
    def run() = KMeans.train(spark, samp, 16, 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Long](2))).sortBy(t => (t._1, t._2))
    assert(run().toSeq == run().toSeq)
  }

  test("trained centroids beat the degenerate first-16 pick on the k-means objective") {
    val samp = Sampling.deterministicSample(pts, "vec_id", 0.5)
    val trained = KMeans.train(spark, samp, 16, 2)
    val w = KMeans.wcss(pts, trained)
    val w0 = KMeans.wcss(pts, degenerate)
    assert(w < w0, s"trained WCSS $w must beat degenerate $w0")
  }

  test("clustered data: training fixes the degenerate pick's occupancy collapse") {
    // The real-data failure mode of first-k seeding: the head of the
    // corpus is one tight cluster, so every degenerate centroid sits in
    // it and distant clusters collapse onto single cells. 8 true
    // clusters, ids 0..15 all in cluster 0; trained centroids must
    // spread occupancy where the degenerate ones concentrate it.
    import spark.implicits._
    val dim = 16
    def point(id: Long): (Long, Long, Seq[Long]) = {
      val cluster = if (id < 16) 0 else (id % 8).toInt
      val qv = (0 until dim).map(j =>
        (if (j == cluster * 2) 5000L else 0L) + ((id * 31 + j) % 7) - 3)
      (0L, id, qv)
    }
    val data = spark.createDataset((0L until 416L).map(point)).toDF("grp", "vec_id", "qv")
    def maxShare(cent: org.apache.spark.sql.DataFrame): Long =
      KMeans.assign(data, cent).groupBy(col("cell")).count()
        .agg(max(col("count"))).collect()(0).getLong(0)
    val deg = data.filter(col("vec_id") < 16)
      .select(col("grp"), col("vec_id").as("cent_id"), col("qv").as("cvec"))
    val trained = KMeans.train(spark, data, 16, 3)
    val (tShare, dShare) = (maxShare(trained), maxShare(deg))
    // 16 cells over 8 clusters: a cell holds at most one cluster (the
    // biggest, cluster 0, has 66 = 16 head + 50 tail members); the
    // collapsed pick strands multiple clusters on single cells (100+)
    assert(tShare < dShare,
      s"trained max occupancy $tShare must beat degenerate $dShare")
    assert(tShare <= 66, s"a trained cell must never hold 2+ clusters ($tShare)")
  }

  test("more Lloyd iterations never increase the objective (on the training sample)") {
    // Lloyd's algorithm monotonically decreases WCSS on its own
    // training set; floor-quantized centroids can add ±1-per-dim noise
    // but must not break the trend from the seed.
    val samp = Sampling.deterministicSample(pts, "vec_id", 0.5).persist()
    try {
      val w0 = KMeans.wcss(samp, KMeans.train(spark, samp, 16, 0))
      val w2 = KMeans.wcss(samp, KMeans.train(spark, samp, 16, 2))
      assert(w2 <= w0, s"iter-2 WCSS $w2 must not exceed seed WCSS $w0")
    } finally samp.unpersist()
  }

  test("grouped training: every subspace gets its own k centroids") {
    val e = Tables.embeddings(spark, sf0001)
    val slices = array((0 until 8).map(i => slice(col("embedding"), i * 8 + 1, 8)): _*)
    val subPts = e.select(col("vec_id"), posexplode(slices).as(Seq("sub", "subvec")))
      .select(col("sub").cast(LongType).as("grp"), col("vec_id"),
        KMeans.quantize(col("subvec")).as("qv"))
    val cents = KMeans.train(spark, Sampling.deterministicSample(subPts, "vec_id", 0.5), 16, 1)
    val perGroup = cents.groupBy(col("grp")).count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(perGroup.keySet == (0L until 8L).toSet)
    assert(perGroup.values.forall(_ == 16L))
    // sub-centroids have subspace dimensionality
    assert(cents.select(size(col("cvec"))).distinct().collect().map(_.getInt(0)).toSeq == Seq(8))
  }

  test("codebook artifact: trainCached equals direct training, hit and miss alike") {
    val samp = Sampling.deterministicSample(pts, "vec_id", 0.5)
    def norm(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Long](2)))
      .sortBy(t => (t._1, t._2)).toSeq
    val direct = norm(KMeans.train(spark, samp, 16, 2))
    val key = s"kmeans-spec|$sf0001"
    val miss = norm(KMeans.trainCached(spark, samp, 16, 2, key))
    // second call must be a pure cache hit: hand it a sample plan that
    // would CHANGE the result if it were rebuilt — identical output
    // proves the stored rows were served, not retrained
    val hit = norm(KMeans.trainCached(spark, samp.filter(col("vec_id") < 8), 16, 2, key))
    assert(miss == direct, "cache miss must train exactly like train()")
    assert(hit == direct, "cache hit must serve the stored codebook")
  }

  test("a cell that wins no points keeps its previous centroid") {
    import spark.implicits._
    // two identical points seed two identical centroids; ties assign
    // both points to the lower cent_id, so the other cell is empty
    // every iteration and must survive via the coalesce (not vanish,
    // not null)
    val tiny = Seq((0L, 1L, Seq(0L, 0L)), (0L, 2L, Seq(0L, 0L)), (0L, 3L, Seq(100L, 100L)))
      .toDF("grp", "vec_id", "qv")
    val cents = KMeans.train(spark, tiny, 3, 2).collect()
    assert(cents.length == 3, s"all 3 cells must survive, got ${cents.length}")
    assert(cents.forall(_.getSeq[Long](2) != null))
  }
}
