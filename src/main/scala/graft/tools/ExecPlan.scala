package graft.tools

import graft.{GraftSession, SparkEntry}

/** Execute a gate once and print its FINAL adaptive plan (with runtime
  * AQEShuffleRead decisions) plus per-node numOutputRows — the view the
  * Spark UI's SQL tab would give (the sandbox runs UI-less).
  *
  *   sbt "runMain graft.tools.ExecPlan q_dd8_semantic_dedup"
  */
object ExecPlan {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q_dd8_semantic_dedup")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.build(s"local[$cpus]", cpus.toInt)
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.write.format("noop").mode("overwrite").save()
    val ep = df.queryExecution.executedPlan
    println("==== FINAL PLAN ====")
    println(ep.toString.take(20000))
    println("==== NODE METRICS ====")
    def walk(p: org.apache.spark.sql.execution.SparkPlan, depth: Int): Unit = {
      val rows = p.metrics.get("numOutputRows").map(_.value).getOrElse(-1L)
      val extra = p.metrics.collect {
        case (k, m) if Set("numPartitions", "dataSize", "shuffleRecordsWritten").contains(k) =>
          s"$k=${m.value}"
      }.mkString(" ")
      println(f"${"  " * depth}${p.nodeName}%-40s rows=$rows%-10d $extra")
      p.children.foreach(walk(_, depth + 1))
      p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          walk(a.executedPlan, depth + 1)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          walk(q.plan, depth + 1)
        case _ =>
      }
    }
    walk(ep, 0)
    spark.stop()
  }
}
