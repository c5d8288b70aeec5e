package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import graft.functions.VectorFunctions.intSqDist

/** Greedy k-center coreset selection (Gonzalez 1985; the
  * facility-location/diversity subset selection used for
  * coreset-based data curation — pick the k points that best COVER
  * the embedding space, the complement of dedup's remove-the-close
  * move): start from the lowest-id point, then repeatedly add the
  * point FARTHEST from the chosen set (max-min distance), ties to the
  * lowest id. The greedy result is a 2-approximation of the optimal
  * k-center cover — and, with integer quantized distances and total
  * tie-breaks, fully deterministic, so the whole selection SEQUENCE
  * gates exactly.
  *
  * Scale shape: each of the k rounds is ONE corpus scan — the chosen
  * set (≤ k rows) broadcasts into a map-side min-distance projection,
  * then a global top-1 (TakeOrdered — no full sort shuffle). The
  * chosen set is the only localCheckpointed state (k rows — a bounded
  * artifact, never the corpus). k scans total; at 100 TB pick k on a
  * quantized/JL-projected column and pre-filter with the ANN index.
  */
object KCenter {

  /** (sel_rank, vec_id) — the selection order of the k centers. */
  def select(emb: DataFrame, k: Int): DataFrame = {
    require(k >= 1, "k-center needs k >= 1")
    val pts = emb.select(col("vec_id"), col("embedding"))
    var chosen = pts.orderBy(col("vec_id")).limit(1)
      .select(col("vec_id"), col("embedding"), lit(0L).as("sel_rank"))
      .localCheckpoint()
    for (r <- 1 until k) {
      val next = pts
        .join(chosen.select(col("vec_id").as("cid")),
          col("vec_id") === col("cid"), "left_anti")
        .crossJoin(broadcast(chosen.select(col("embedding").as("cemb"))))
        .select(col("vec_id"), col("embedding"),
          intSqDist(col("embedding"), col("cemb")).cast(LongType).as("d"))
        .groupBy(col("vec_id"), col("embedding"))
        .agg(min(col("d")).as("mind"))
        .orderBy(col("mind").desc, col("vec_id").asc)
        .limit(1)
        .select(col("vec_id"), col("embedding"), lit(r.toLong).as("sel_rank"))
      chosen = chosen.unionByName(next).localCheckpoint()
    }
    chosen.select(col("sel_rank"), col("vec_id"))
  }

  /** Production form for larger k: maintain each point's RUNNING
    * min-distance to the chosen set instead of recomputing against
    * all chosen centers every round — after adding center c, mind' =
    * min(mind, d(x, c)), so round r compares against ONE center
    * instead of r (total O(N·k) distance evaluations vs the gate
    * form's O(N·k²)). The state is the O(N) (vec_id, embedding, mind)
    * frame: deliberately NOT localCheckpoint (corpus-sized pinned
    * blocks are the banned class) — it persists DISK_ONLY per round
    * (the lm3 discipline), the previous round unpersists once the new
    * round is materialized, and the argmax stays a TakeOrdered top-1.
    * Exactly the same selection sequence as [[select]] (integer
    * distances, same tie-break; KCenterSpec proves equality). */
  def selectIncremental(emb: DataFrame, k: Int): DataFrame = {
    require(k >= 1, "k-center needs k >= 1")
    import org.apache.spark.storage.StorageLevel
    val pts = emb.select(col("vec_id"), col("embedding"))
    val first = pts.orderBy(col("vec_id")).limit(1)
      .select(col("vec_id"), col("embedding"), lit(0L).as("sel_rank"))
      .localCheckpoint() // ≤ k rows total — the bounded chosen set
    var chosen = first
    var state = pts
      .join(first.select(col("vec_id").as("cid")), col("vec_id") === col("cid"), "left_anti")
      .crossJoin(broadcast(first.select(col("embedding").as("cemb"))))
      .select(col("vec_id"), col("embedding"),
        intSqDist(col("embedding"), col("cemb")).cast(LongType).as("mind"))
      .persist(StorageLevel.DISK_ONLY)
    for (r <- 1 until k) {
      val next = state.orderBy(col("mind").desc, col("vec_id").asc).limit(1)
        .select(col("vec_id"), col("embedding"), lit(r.toLong).as("sel_rank"))
        .localCheckpoint()
      chosen = chosen.unionByName(next).localCheckpoint()
      if (r < k - 1) {
        val newState = state
          .join(next.select(col("vec_id").as("cid")), col("vec_id") === col("cid"), "left_anti")
          .crossJoin(broadcast(next.select(col("embedding").as("cemb"))))
          .select(col("vec_id"), col("embedding"),
            least(col("mind"), intSqDist(col("embedding"), col("cemb")).cast(LongType)).as("mind"))
          .persist(StorageLevel.DISK_ONLY)
        newState.count() // materialize before dropping the parent
        state.unpersist()
        state = newState
      }
    }
    state.unpersist()
    chosen.select(col("sel_rank"), col("vec_id"))
  }

  /** DuckDB replay of the k rounds as materialized CTEs; expects a
    * `pts` CTE with (vec_id, qv), exposes `c<k-1>`. */
  def sqlCtes(k: Int): String = {
    val init = """c0 AS MATERIALIZED (
                 |  SELECT vec_id, qv, CAST(0 AS BIGINT) AS sel_rank
                 |  FROM pts ORDER BY vec_id LIMIT 1)""".stripMargin
    val steps = (1 until k).map { r =>
      s"""c$r AS MATERIALIZED (
         |  SELECT * FROM c${r - 1}
         |  UNION ALL
         |  SELECT vec_id, qv, CAST($r AS BIGINT) AS sel_rank FROM (
         |    SELECT vec_id, qv,
         |           row_number() OVER (ORDER BY mind DESC, vec_id ASC) AS rn
         |    FROM (
         |      SELECT p.vec_id, p.qv,
         |             min(${KMeans.sqDistQSql("p.qv", "c.qv")}) AS mind
         |      FROM pts p CROSS JOIN c${r - 1} c
         |      WHERE p.vec_id NOT IN (SELECT vec_id FROM c${r - 1})
         |      GROUP BY p.vec_id, p.qv))
         |  WHERE rn = 1)""".stripMargin
    }
    (init +: steps).mkString(",\n")
  }
}

/** The coreset gate: the full 8-center selection sequence over the
  * embeddings table, integer quantized distances, exact cross-engine. */
object KCenterQueries extends graft.QueryModule {
  import graft.{Q, Tables}

  private val s9 = {
    val k = 8
    Q(
      "q_s9_kcenter_coreset",
      s"greedy k-center coreset: the $k-point max-min-distance selection sequence",
      (s, d) => KCenter.select(Tables.embeddings(s, d), k)
        .orderBy(col("sel_rank")),
      Some(s"""
        WITH pts AS MATERIALIZED (
          SELECT vec_id, ${KMeans.quantizeSql("embedding")} AS qv FROM embeddings),
        ${KCenter.sqlCtes(k)}
        SELECT sel_rank, vec_id FROM c${k - 1} ORDER BY sel_rank"""))
  }

  override val all: Seq[graft.Q] = Seq(s9)
}
