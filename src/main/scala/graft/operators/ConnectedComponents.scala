package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Min-label connected components over an undirected edge list —
  * the dedup-cluster primitive: near-dup PAIRS (dd2/dd4/dd5 output)
  * become clusters, and a curation run keeps one representative per
  * cluster instead of greedily dropping pair-members (greedy loses
  * transitivity: a~b, b~c but a!~c drops b and c with pair logic,
  * while the cluster keeps only a).
  *
  * Algorithm: symmetric min-neighbor label propagation — each round
  * every vertex adopts the minimum label in its closed neighborhood.
  * This is the propagation step of Kiveris et al. ("Connected
  * Components in MapReduce and Beyond", SoCC'14) WITHOUT the
  * alternating large/small-star contractions, so it converges in
  * O(diameter) rounds, not O(log n). That trade is deliberate: dedup
  * clusters are near-cliques (diameter ≤ ~2-3), so the simple
  * propagation finishes in 2-4 rounds and each round is one shuffle
  * keyed by vertex. For long-chain graphs the star algorithm would
  * win; for dup graphs it's pure overhead. The loop stops when no
  * label changes (a count action per round, as any iterative fixpoint
  * on Spark requires).
  */
object ConnectedComponents {

  /** edges(srcCol, dstCol) → (vertex, component) with component = min
    * vertex id of the component. Vertex/label type: long.
    *
    * Throws if the fixpoint has not converged after `maxIters` rounds
    * (non-converged labels would silently split clusters — dropSet
    * would then keep several representatives of one cluster); pass
    * `failOnNonConvergence = false` to get best-effort labels instead.
    */
  def components(edges: DataFrame, srcCol: String, dstCol: String,
      maxIters: Int = 50, failOnNonConvergence: Boolean = true,
      edgeDir: Option[String] = None): DataFrame = {
    // Materialize the symmetric edge list ONCE: `sym` is re-joined in
    // every round, and without the checkpoint each round re-executes
    // the whole upstream pipeline (for clusterDedup that is the full
    // LSH candidate+verify chain — ~rounds× redundant corpus scans).
    // The pin follows the GraphEdges policy: localCheckpoint at test
    // scale, TableIO materialize-once (edgeDir) for multi-hour runs.
    val sym = GraphEdges.pin(
      edges.select(col(srcCol).cast("long").as("a"), col(dstCol).cast("long").as("b"))
        .union(edges.select(col(dstCol).cast("long").as("a"), col(srcCol).cast("long").as("b"))),
      edgeDir)
    var labels = sym.select(col("a").as("v")).distinct()
      .select(col("v"), col("v").as("label"))
    var iter = 0
    var changed = 1L
    while (changed > 0 && iter < maxIters) {
      // neighbor labels + own label, take the min per vertex; `own`
      // carries the previous label through the same aggregate so the
      // convergence check needs no join back onto the old frame
      val neighborLabels = sym
        .join(labels.withColumnRenamed("v", "b"), Seq("b"))
        .select(col("a").as("v"), col("label"), lit(false).as("own"))
      // localCheckpoint (eager) truncates the lineage each round —
      // without it every round's plan contains all previous rounds and
      // Catalyst analysis time grows without bound (the iterative-Spark
      // pitfall)
      val next = labels.select(col("v"), col("label"), lit(true).as("own"))
        .union(neighborLabels)
        .groupBy(col("v"))
        .agg(min(col("label")).as("label"),
          min(when(col("own"), col("label"))).as("prev"))
        .localCheckpoint()
      changed = next.filter(col("label") =!= col("prev")).count()
      labels = next.select(col("v"), col("label"))
      iter += 1
    }
    if (changed > 0) {
      val msg = s"connected components did not converge in $maxIters rounds " +
        s"($changed labels still changing) — graph diameter exceeds maxIters"
      if (failOnNonConvergence) throw new IllegalStateException(msg)
      else org.slf4j.LoggerFactory.getLogger(getClass).warn(msg)
    }
    labels.select(col("v").as("vertex"), col("label").as("component"))
  }

  /** Cluster-aware near-dup drop: from (pair) edges over doc ids, keep
    * only the minimum id of every connected component; returns the ids
    * to DROP (everything else in a cluster). */
  def dropSet(pairs: DataFrame, aCol: String, bCol: String): DataFrame =
    components(pairs, aCol, bCol)
      .filter(col("vertex") =!= col("component"))
      .select(col("vertex").as("doc_id"))

  /** Alternating large-star/small-star components (Kiveris et al.,
    * SoCC'14) — O(log n) rounds on ANY graph shape, vs the simple
    * propagation's O(diameter). Use this for long-chain graphs
    * (lineage, sessions); for near-clique dup graphs [[components]]
    * finishes in fewer rounds with one shuffle each.
    *
    * Fully relational: per-node minima come from groupBy/min (partial
    * aggregation absorbs hub skew — no neighbor-list materialization
    * anywhere). Round equality is detected by (count, bit_xor(xxhash64))
    * of the canonical edge set (a distinct set, so XOR is a valid
    * order-insensitive signature that cannot overflow) — probabilistic
    * with collision odds ~2⁻⁶⁴ per round, the standard trade against
    * an extra distinct-based EXCEPT job. */
  def componentsStar(edges: DataFrame, srcCol: String, dstCol: String,
      maxIters: Int = 50, edgeDir: Option[String] = None): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    // only the INITIAL canonical edge set is static (the star rounds
    // rewrite `e`), so the GraphEdges pin applies to it and the node
    // set; per-round frames stay localCheckpoint (the documented
    // iterative exemption — they are rewritten every round)
    val nodes = GraphEdges.pin(edges
      .select(col(srcCol).cast("long").as("v"))
      .union(edges.select(col(dstCol).cast("long").as("v")))
      .distinct(), edgeDir.map(_ + "_nodes"))
    var e = GraphEdges.pin(edges
      .select(col(srcCol).cast("long").as("u"), col(dstCol).cast("long").as("v"))
      .filter(col("u") =!= col("v"))
      .select(greatest(col("u"), col("v")).as("u"), least(col("u"), col("v")).as("v"))
      .distinct(), edgeDir)

    def largeStar(in: DataFrame): DataFrame = {
      val sym = in.union(in.select(col("v").as("u"), col("u").as("v")))
      val mins = sym.groupBy(col("u"))
        .agg(least(min(col("v")), col("u")).as("m"))
      sym.filter(col("v") > col("u"))
        .join(mins, "u")
        .select(col("v").as("u"), col("m").as("v"))
        .filter(col("u") =!= col("v")).distinct()
    }
    def smallStar(in: DataFrame): DataFrame = {
      // edges arrive oriented large→small (largeStar emits v = m < u)
      val mins = in.groupBy(col("u")).agg(min(col("v")).as("m"))
      in.join(mins, "u")
        .select(col("v").as("u"), col("m").as("v"))
        .union(mins.select(col("u"), col("m").as("v")))
        .filter(col("u") =!= col("v")).distinct()
    }
    def signature(in: DataFrame): (Long, Long) = {
      val r = in.agg(count(lit(1)),
          coalesce(expr("bit_xor(xxhash64(u, v))"), lit(0L)))
        .as[(Long, Long)].head()
      r
    }

    var sig = signature(e)
    var iter = 0
    var stable = false
    while (!stable && iter < maxIters) {
      val next = smallStar(largeStar(e)).localCheckpoint()
      val nextSig = signature(next)
      stable = nextSig == sig
      sig = nextSig
      e = next
      iter += 1
    }
    if (!stable) throw new IllegalStateException(
      s"star components did not converge in $maxIters rounds")
    // converged edge set is a star forest u→root; isolated vertices
    // (dropped when self-loops were filtered) root themselves
    nodes.join(e.select(col("u").as("v"), col("v").as("root")), Seq("v"), "left")
      .select(col("v").as("vertex"), coalesce(col("root"), col("v")).as("component"))
  }
}
