package graft

import graft.plans.CardinalityAudit

/** Full-corpus cardinality sweep INSIDE sbt test — the round-14 gap:
  * the 9-gate join-family sweep left the other ~210 gates audited
  * only by bench/verify runs, so a freshly-authored hazard surfaced
  * at the round's bench instead of at authoring time. This spec runs
  * EVERY SparkEntry gate at sf0.001 under the same session listener
  * the bench registers (so the fuzz harnesses' inner spark.sql
  * frames are covered too — where the fz28 first cut actually
  * lived), with floors reduced to sf0.001 signal levels:
  *
  *  - join: 1,000 output rows (the JoinFanoutAuditSpec sweep floor —
  *    the planted fz28 control reads 750k rows / 500× there)
  *  - generate: 1,000 output rows (legit corpus max ~306× char
  *    histograms vs the 4096 bound; the planted 30 kb control reads
  *    30,000×)
  *  - skew: 10 kB max-partition bytes (the planted 90%-one-key
  *    control reads ~40 kB hot / ratio ≫ 16; corpus max measured
  *    5.1× at sf0.001)
  *
  * Cost: one noop materialization per gate at sf0.001 (~2 min on the
  * test session) — the authoring-time insurance the bench-only wire
  * couldn't give. */
class CardinalityCorpusSweepSpec extends SparkSpec {

  test("all registered gates are cardinality-clean at sf0.001 reduced floors") {
    val cfg = CardinalityAudit.Config(
      joinMinRows = 1000L, generateMinRows = 1000L, skewMinBytes = 10000L)
    val listener = new CardinalityAudit.Listener(cfg)
    spark.listenerManager.register(listener)
    try {
      for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
        listener.gate = name
        fn(spark, sf0001).write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
      }
      // listener callbacks are asynchronous: wait for two quiet seconds
      // (bounded) before reading the verdict
      val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
      var last = -1
      var quietSince = System.nanoTime()
      while (System.nanoTime() < deadline &&
          (System.nanoTime() - quietSince) < 2L * 1000 * 1000 * 1000) {
        val n = listener.snapshot.size
        if (n != last) { last = n; quietSince = System.nanoTime() }
        Thread.sleep(100)
      }
      val bad = listener.snapshot
      assert(bad.isEmpty, s"${bad.size} cardinality violations:\n" +
        bad.map { case (g, f) => s"  [$g] ${f.render}" }.mkString("\n"))
    } finally spark.listenerManager.unregister(listener)
  }
}
