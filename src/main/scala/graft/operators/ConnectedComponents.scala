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
  * Algorithm: alternating large/small-star label propagation
  * (Kiveris et al., "Connected Components in MapReduce and Beyond",
  * SoCC'14, simplified to symmetric min-neighbor propagation): each
  * round every vertex adopts the minimum label in its closed
  * neighborhood; converges in O(log n) rounds on real dedup graphs
  * (diameter is tiny — dup clusters are near-cliques). Each round is
  * one shuffle keyed by vertex; the loop stops when no label changes
  * (count of changed labels — an action per round, as any iterative
  * fixpoint on Spark requires).
  */
object ConnectedComponents {

  /** edges(srcCol, dstCol) → (vertex, component) with component = min
    * vertex id of the component. Vertex/label type: long. */
  def components(edges: DataFrame, srcCol: String, dstCol: String,
      maxIters: Int = 50): DataFrame = {
    val sym = edges.select(col(srcCol).cast("long").as("a"), col(dstCol).cast("long").as("b"))
      .union(edges.select(col(dstCol).cast("long").as("a"), col(srcCol).cast("long").as("b")))
    var labels = sym.select(col("a").as("v")).distinct()
      .select(col("v"), col("v").as("label"))
    var iter = 0
    var changed = 1L
    while (changed > 0 && iter < maxIters) {
      // neighbor labels + own label, take the min per vertex
      val neighborLabels = sym
        .join(labels.withColumnRenamed("v", "b"), Seq("b"))
        .select(col("a").as("v"), col("label"))
      // localCheckpoint (eager) truncates the lineage each round —
      // without it every round's plan contains all previous rounds and
      // Catalyst analysis time grows without bound (the iterative-Spark
      // pitfall)
      val next = labels.union(neighborLabels)
        .groupBy(col("v")).agg(min(col("label")).as("label"))
        .localCheckpoint()
      changed = next.join(labels.withColumnRenamed("label", "old"), Seq("v"))
        .filter(col("label") =!= col("old")).count()
      labels = next
      iter += 1
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
}
