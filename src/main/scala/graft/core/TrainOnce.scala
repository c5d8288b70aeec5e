package graft.core

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.StructType

/** JVM-lifetime train-once memo for small trained artifacts (k-means
  * codebooks, hashed LM models): the keyed result is computed once,
  * held as collected rows (the artifacts are KB–MB by construction —
  * bucket-bounded models, sample-trained codebooks), and re-enters
  * every consumer's plan as a fresh local DataFrame. One
  * implementation of the double-checked per-key locking instead of a
  * copy per operator family ([[graft.operators.KMeans.trainCached]]
  * and the NgramLm gate models both delegate here; the BPE tokenizer
  * keeps its own path-based variant because its artifact is two
  * persisted parquet DIRECTORIES, not rows).
  *
  * The key must capture everything that determines the result (table
  * dir, parameters, variant). Locking is per-key: concurrent misses
  * on DIFFERENT keys train in parallel instead of queueing behind one
  * training job. `train` is by-name — on a cache hit its plan is
  * never built.
  */
object TrainOnce {

  private val cache = scala.collection.concurrent.TrieMap[String, Seq[Row]]()
  private val locks = scala.collection.concurrent.TrieMap[String, Object]()

  def cached(spark: SparkSession, key: String, schema: StructType)
      (train: => DataFrame): DataFrame = {
    val rows = cache.get(key) match {
      case Some(v) => v
      case None => locks.getOrElseUpdate(key, new Object).synchronized {
        cache.getOrElseUpdate(key, train.collect().toSeq)
      }
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
  }
}
