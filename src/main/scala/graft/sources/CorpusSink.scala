package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** The write path of the curated-corpus pipeline: partitioned parquet
  * with explicit file-count control.
  *
  * At 100 TB the naive `df.write.partitionBy("lang")` is a small-files
  * bomb: every task holds a writer per partition value, producing
  * (tasks × partitions) files — millions of KB-sized parquet footers
  * that throttle the next job's planning. The fix is the standard one:
  * repartition on the partition columns (plus a bounded salt when one
  * partition dominates) BEFORE the write, so each output partition is
  * written by a bounded number of tasks, and cap rows per file so a hot
  * partition still splits into scannable chunks.
  */
object CorpusSink {

  /** Write `df` partitioned by `partCol`, with at most `filesPerPart`
    * writer tasks per partition value and `maxRecordsPerFile` rows per
    * file. The salt keeps a skewed partition value from serializing into
    * a single writer task while still bounding its file count. The salt
    * derives from a per-row id, NOT a hash of the row — hashing full
    * rows would push every payload byte (document bodies, at corpus
    * scale) through the hash just to pick one of `filesPerPart` writers. */
  def writePartitioned(df: DataFrame, path: String, partCol: String,
      filesPerPart: Int = 4, maxRecordsPerFile: Long = 1000000L): Unit = {
    val salt = "__graft_salt"
    df.withColumn(salt, pmod(monotonically_increasing_id(), lit(filesPerPart.toLong)))
      .repartition(col(partCol), col(salt))
      .drop(salt)
      .write
      .mode(SaveMode.Overwrite)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partCol)
      .parquet(path)
  }

  /** Read side of the same layout: partition pruning on `partCol` is free
    * (directory-level), so a per-language job touches only its slice. */
  def readPartition(spark: org.apache.spark.sql.SparkSession, path: String,
      partCol: String, value: String): DataFrame =
    spark.read.parquet(path).filter(col(partCol) === value)

  /** RANGE layout for scan skipping on an ordering key (typically event
    * time): `repartitionByRange` + `sortWithinPartitions` gives every
    * output file a DISJOINT key range and every parquet row group tight
    * min/max statistics. A time-bounded query then skips whole files
    * from the footer stats alone — on a 100 TB history table this is
    * the difference between scanning a day and scanning everything.
    * (Same mechanics Delta's OPTIMIZE ZORDER exploits; one dimension
    * needs no space-filling curve.) */
  def writeRangeLayout(df: DataFrame, path: String, keyCol: String,
      nFiles: Int): Unit =
    df.repartitionByRange(nFiles, col(keyCol))
      .sortWithinPartitions(keyCol)
      .write.mode(SaveMode.Overwrite).parquet(path)
}
