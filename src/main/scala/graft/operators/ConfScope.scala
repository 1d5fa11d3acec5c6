package graft.operators

import org.apache.spark.sql.SparkSession

/**
 * Run a block under temporary session confs, restoring the PRIOR state
 * afterwards — including "unset" (restoring a literal default would
 * silently pin a conf the session never set). Used by operators that
 * right-size their internal shuffles to measured input volume
 * (ConnectedComponents' loop, SuffixSpans' small-input fast path): Spark's
 * session-wide `spark.sql.shuffle.partitions` and AQE re-planning are tuned
 * for the BIG stages; an operator whose stages are provably tiny pays pure
 * scheduling latency for them.
 */
object ConfScope {

  // conf.get falls back to the registered default, so it cannot distinguish
  // "explicitly set" from "defaulted"; conf.getAll holds only explicit sets
  private def getIfSet(spark: SparkSession, key: String): Option[String] =
    spark.conf.getAll.get(key)

  private def restore(spark: SparkSession, key: String, v: Option[String]): Unit =
    v match {
      case Some(x) => spark.conf.set(key, x)
      case None => spark.conf.unset(key)
    }

  /** Evaluate `body` with `confs` set, then restore each key's prior state. */
  def withConfs[T](spark: SparkSession, confs: (String, String)*)(body: => T): T =
    restoring(spark, confs.map(_._1): _*) {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      body
    }

  /** Snapshot `keys`, evaluate `body` (which may set them to values it
    * computes from its input), restore each key's prior state. */
  def restoring[T](spark: SparkSession, keys: String*)(body: => T): T = {
    val prior = keys.map(k => k -> getIfSet(spark, k))
    try body
    finally prior.foreach { case (k, v) => restore(spark, k, v) }
  }
}
