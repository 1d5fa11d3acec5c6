package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/**
 * Table-format seam (SURVEY.md §7; north rule "Iceberg tables"): the
 * pipeline and entry points read/write NAMED TABLES through this interface
 * instead of raw paths, so a production deployment swaps the storage
 * backend without touching any operator.
 *
 * The sandbox implementation is [[ParquetTables]] (path-per-table parquet +
 * a completion marker file). An Iceberg deployment implements the same four
 * methods with the catalog API:
 *
 * {{{
 * class IcebergTables(spark: SparkSession, db: String) extends TableIO {
 *   def read(t: String)              = spark.table(s"$db.$t")
 *   def write(df: DataFrame, t: String, mode: SaveMode) =
 *     df.writeTo(s"$db.$t").using("iceberg").createOrReplace()
 *   def isComplete(t: String)        = spark.catalog.tableExists(s"$db.$t")
 *   def markComplete(t: String)      = () // snapshot commit is atomic:
 *                                         // a visible table IS complete
 * }
 * }}}
 *
 * The marker split exists because plain parquet directories are not atomic:
 * a killed writer leaves a partial directory, so completion is a separate
 * `_GRAFT_OK` flag written AFTER the data (resume contract,
 * pipeline.DedupPipeline). Transactional formats collapse both into the
 * snapshot commit.
 */
trait TableIO {
  def read(table: String): DataFrame
  def write(df: DataFrame, table: String,
      mode: SaveMode = SaveMode.Overwrite): Unit
  /** Append rows (metrics/lineage side sinks). */
  def append(df: DataFrame, table: String): Unit = write(df, table, SaveMode.Append)
  /** True iff the table exists AND its write completed. */
  def isComplete(table: String): Boolean
  /** Flag a finished write (no-op for transactional backends). */
  def markComplete(table: String): Unit
}

/**
 * Path-per-table parquet backend: table `t` lives at `root/t[suffix]`,
 * completion = `_GRAFT_OK` marker inside the directory.
 * `suffix` lets the same seam read the driver's `<table>.parquet` layouts.
 */
final class ParquetTables(spark: SparkSession, root: String,
    suffix: String = "") extends TableIO {

  private def path(table: String) = s"$root/$table$suffix"
  private def fs(p: org.apache.hadoop.fs.Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  override def read(table: String): DataFrame =
    spark.read.parquet(path(table))

  override def write(df: DataFrame, table: String, mode: SaveMode): Unit =
    df.write.mode(mode).parquet(path(table))

  override def isComplete(table: String): Boolean = {
    val ok = new org.apache.hadoop.fs.Path(s"${path(table)}/_GRAFT_OK")
    fs(ok).exists(ok)
  }

  override def markComplete(table: String): Unit = {
    val ok = new org.apache.hadoop.fs.Path(s"${path(table)}/_GRAFT_OK")
    fs(ok).create(ok, true).close()
  }
}
