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

  /**
   * Right-size shuffle width to a SMALL local input (round-6 finding): in
   * the bench session shape every map task opens one shuffle writer PER
   * REDUCE PARTITION (1 MB file buffer + zstd stream + file open ≈ 8 ms
   * each — microbenched via graft.tools.TaskCost2), so a 32-map × 32-reduce
   * exchange costs ~8-10 core-SECONDS before it moves a single row. A 64k-row
   * groupBy measured 9.3 core-s / 0.52 s wall at 32 reduce partitions vs
   * 1.8 core-s / 0.22 s at 4 — identical results. Operators whose whole
   * input is provably small therefore plan their shuffles at
   * ~bytes / graft.local.bytesPerPartition (default 2 MB, floor 8, capped
   * at the session width) instead of the session's cluster-sized default.
   *
   * Gates: local mode; non-streaming; plan-statistics input size at or
   * below graft.local.smallJobBytes (default 64 MB — warehouse-scale scans
   * sit orders of magnitude above it and are untouched; 0 disables). AQE
   * stays as configured — runtime coalescing composes with a smaller
   * initial width. EAGER operators only: the conf must be in force when
   * the physical plan is made, i.e. the body must materialize its result.
   */
  def smallInputScope[T](spark: SparkSession,
      input: org.apache.spark.sql.DataFrame)(body: => T): T = {
    if (!spark.sparkContext.isLocal || input.isStreaming) return body
    val all = spark.conf.getAll
    val gate = all.getOrElse("graft.local.smallJobBytes", (64L << 20).toString).toLong
    if (gate <= 0) return body
    val bytes = input.queryExecution.optimizedPlan.stats.sizeInBytes
    if (bytes > gate) return body
    val perPart = math.max(1L,
      all.getOrElse("graft.local.bytesPerPartition", (2L << 20).toString).toLong)
    val session = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val parts = (bytes / perPart + 1).min(BigInt(session)).max(BigInt(8))
    withConfs(spark, "spark.sql.shuffle.partitions" -> parts.toString)(body)
  }
}
