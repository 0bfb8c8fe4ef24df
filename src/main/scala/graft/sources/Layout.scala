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
    * scanning everything and scanning one directory.
    *
    * Shuffle shape: rows are redistributed by (partitionCol, bucket) where
    * bucket = row-hash mod filesPerPartition — full cluster parallelism
    * (numPartitions stays at spark.sql.shuffle.partitions) with at most
    * `filesPerPartition` files per partition directory. (A naive
    * `repartition(n, col)` would funnel everything through n tasks.) */
  def writePartitioned(df: DataFrame, path: String, partitionCol: String,
                       filesPerPartition: Int = 1,
                       mode: SaveMode = SaveMode.Overwrite): Unit = {
    val bucket = pmod(
      xxhash64(struct(df.columns.map(col).toSeq: _*)), lit(filesPerPartition))
    df.repartition(col(partitionCol), bucket)
      .write.mode(mode)
      .partitionBy(partitionCol)
      .parquet(path)
  }

  /** Read a partitioned layout back; filters on the partition column prune
    * directories before any IO (verify via PartitionFilters in the scan
    * node — asserted in LayoutSpec). */
  def readPartitioned(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Compact a directory of small files into ~targetBytes outputs — the
    * table-maintenance pass every long-lived 100 TB layout needs: streaming
    * and incremental writers accrete small files, and file-count growth
    * degrades scan planning, footer reading and shuffle fan-in. The output
    * file count comes from the ACTUAL on-disk byte size (not row counts —
    * compression ratios vary), and the rewrite is a full-width round-robin
    * shuffle, so every executor writes. Returns the output file count. */
  def compact(spark: SparkSession, inPath: String, outPath: String,
              targetBytes: Long = 128L * 1024 * 1024): Int = {
    val p = new org.apache.hadoop.fs.Path(inPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // Only *.parquet data files count toward the size — a content summary
    // would also include _SUCCESS markers and local-FS .crc checksums,
    // inflating the computed file count relative to actual data bytes.
    val bytes = fs.listStatus(p).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .map(_.getLen).sum
    val n = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
    spark.read.parquet(inPath).repartition(n)
      .write.mode(SaveMode.Overwrite).parquet(outPath)
    n
  }
}
