package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Degree-ordered triangle counting (Suri & Vassilvitskii 2011,
  * "Counting Triangles and the Curse of the Last Reducer"): the
  * classic graph-analytics operator after connected components.
  *
  * The naive relational form — three self-joins of the edge list —
  * founders on skew: a celebrity vertex of degree d contributes
  * O(d²) wedges to ONE join key (the "last reducer"). The fix is to
  * ORIENT each edge from its lower-(degree, id) endpoint to the
  * higher: every triangle then has exactly one vertex with both
  * out-edges (counted once, no /6 or /3 correction), and out-degree
  * is bounded by O(√m), so per-key wedge work is O(m) total instead
  * of O(d_max²). Wedge generation and the closing-edge check are
  * plain shuffle equi-joins — linear passes, skew-bounded by
  * construction.
  */
object Triangles {

  /** Canonical undirected edge list (va < vb, distinct) → one row
    * (n_vertices, n_edges, n_triangles). */
  def countTriangles(edges: DataFrame, aCol: String, bCol: String): DataFrame = {
    val e = edges.select(
        least(col(aCol), col(bCol)).as("va"),
        greatest(col(aCol), col(bCol)).as("vb"))
      .filter(col("va") =!= col("vb")).distinct()
      .localCheckpoint() // referenced 4× below (degrees, orient, close)
    val deg = e.select(col("va").as("v")).union(e.select(col("vb").as("v")))
      .groupBy(col("v")).agg(count(lit(1)).as("d"))
    // orient low-(d, v) → high-(d, v); total order, so exactly one
    // orientation per edge and one counting vertex per triangle
    val oriented = e
      .join(deg.select(col("v").as("va"), col("d").as("da")), "va")
      .join(deg.select(col("v").as("vb"), col("d").as("db")), "vb")
      .select(
        when(col("da") < col("db") || (col("da") === col("db") && col("va") < col("vb")),
          struct(col("va").as("src"), col("vb").as("dst")))
          .otherwise(struct(col("vb").as("src"), col("va").as("dst"))).as("o"))
      .select(col("o.src").as("src"), col("o.dst").as("dst"))
    // wedges at the (low-degree) apex, closed against the canonical
    // edge list: dst1 < dst2 avoids double-counting the wedge pair
    val wedges = oriented.as("e1")
      .join(oriented.as("e2"), col("e1.src") === col("e2.src"))
      .filter(col("e1.dst") < col("e2.dst"))
      .select(least(col("e1.dst"), col("e2.dst")).as("va"),
        greatest(col("e1.dst"), col("e2.dst")).as("vb"))
    val tri = wedges.join(e, Seq("va", "vb"), "left_semi")
      .agg(count(lit(1)).as("n_triangles"))
    deg.agg(count(lit(1)).as("n_vertices")).crossJoin(
        e.agg(count(lit(1)).as("n_edges")))
      .crossJoin(tri)
  }
}
