package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Storage-layout helpers — the 100 TB on-disk posture (SURVEY §4's
  * partition-pruning row): data is WRITTEN partitioned by its hot filter
  * key so reads become partition pruning at the scan, and sinks coalesce
  * to bounded file counts instead of one-file-per-task dust.
  */
object Layout {

  /** Write `df` as a hive-style partitioned parquet layout
    * (`path/col=value/...`). At 100 TB this is the difference between
    * scanning everything and scanning one directory. */
  def writePartitioned(df: DataFrame, path: String, partitionCol: String,
                       filesPerPartition: Int = 1): Unit =
    df.repartition(filesPerPartition, col(partitionCol))
      .write.mode(SaveMode.Overwrite)
      .partitionBy(partitionCol)
      .parquet(path)

  /** Read a partitioned layout back; filters on the partition column prune
    * directories before any IO (verify via PartitionFilters in the scan
    * node — asserted in LayoutSpec). */
  def readPartitioned(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
