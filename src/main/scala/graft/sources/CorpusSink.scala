package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SaveMode}
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

  /** Z-ORDER (Morton) layout for scan skipping on TWO dimensions: each
    * key linear-bins into `bits` bits between its min and max, the bins
    * interleave into one Morton key, and range-partition + sort on that
    * key tiles the file set across BOTH dimensions — every file covers
    * ~1/√nFiles of each key's range instead of all of one and a sliver
    * of the other, so predicates on EITHER dimension skip most files
    * from parquet footer stats alone (the multi-dimension counterpart
    * of writeRangeLayout; what Delta's OPTIMIZE ZORDER does).
    *
    * The min/max pre-pass is one 4-scalar aggregate (bounded driver
    * state, like annIvf's centroids); production replaces linear bins
    * with sampled quantile boundaries for skewed keys — the interleave
    * and layout are unchanged. The Morton key is a pure expression
    * passed straight to repartitionByRange/sortWithinPartitions, so the
    * written schema carries no extra column. */
  def writeZOrder(df: DataFrame, path: String, c1: String, c2: String,
      nFiles: Int, bits: Int = 10): Unit = {
    // interleaved shifts reach 2*bits-1, and the bin arithmetic stays in
    // LONG throughout — an int bin shifted by >=31 silently wraps
    // negative and scrambles the curve (advice r4)
    require(bits >= 1 && bits <= 30, s"bits must be in [1,30], got $bits")
    val r = df.agg(min(col(c1)).cast("double"), max(col(c1)).cast("double"),
      min(col(c2)).cast("double"), max(col(c2)).cast("double")).head()
    if (r.isNullAt(0) || r.isNullAt(2)) {
      // empty or all-null key frame: no range to tile — write as-is
      df.write.mode(SaveMode.Overwrite).parquet(path)
      return
    }
    def bin(c: String, lo: Double, hi: Double): Column = {
      val span = math.max(hi - lo, java.lang.Double.MIN_NORMAL)
      least(lit((1L << bits) - 1), greatest(lit(0L),
        floor((col(c).cast("double") - lit(lo)) / lit(span) * (1L << bits))
          .cast("long")))
    }
    val b1 = bin(c1, r.getDouble(0), r.getDouble(1))
    val b2 = bin(c2, r.getDouble(2), r.getDouble(3))
    writeMorton(df, path, b1, b2, nFiles, bits)
  }

  private def writeMorton(df: DataFrame, path: String, b1: Column, b2: Column,
      nFiles: Int, bits: Int): Unit = {
    val morton = (0 until bits).map { i =>
      shiftleft(shiftright(b1, i).bitwiseAND(lit(1L)), 2 * i + 1) +
        shiftleft(shiftright(b2, i).bitwiseAND(lit(1L)), 2 * i)
    }.reduce(_ + _)
    df.repartitionByRange(nFiles, morton)
      .sortWithinPartitions(morton)
      .write.mode(SaveMode.Overwrite).parquet(path)
  }

  /** Z-order with QUANTILE bin boundaries — the skew-proof variant the
    * linear-bin scaladoc points to: cut points come from approxQuantile
    * (one sketch pass), so every bin holds ≈ equal ROWS rather than
    * equal value-range; a heavy-tailed key no longer collapses most of
    * the data into one or two bins (where the interleave degenerates to
    * a single-dimension sort and the other key's files stop tightening).
    *
    * The per-row bin lookup compiles to a BALANCED when-TREE binary
    * search over the cut points — O(bits) codegen'd comparisons per
    * row, no interpreted array walk, no join. Cut-point count is
    * (2^bits)-1 plan-time constants; default 8 bits = 255 cuts per key
    * keeps the expression tree comfortably inside codegen limits while
    * 256×256 bins is far finer than any practical file count. */
  def writeZOrderQuantile(df: DataFrame, path: String, c1: String, c2: String,
      nFiles: Int, bits: Int = 8): Unit = {
    require(bits >= 1 && bits <= 12, s"bits must be in [1,12], got $bits")
    val nb = 1 << bits
    val probs = (1 until nb).map(_.toDouble / nb).toArray
    val cuts = df.na.drop(Seq(c1, c2))
      .select(col(c1).cast("double").as(c1), col(c2).cast("double").as(c2))
      .stat.approxQuantile(Array(c1, c2), probs, 0.001)
    if (cuts(0).isEmpty || cuts(1).isEmpty) {
      df.write.mode(SaveMode.Overwrite).parquet(path)
      return
    }
    // balanced binary search: bin(x) = number of cuts <= x, as a
    // log-depth conditional tree (duplicate cuts from discrete data are
    // fine — they only merge adjacent empty bins)
    def tree(c: Column, cut: Array[Double], lo: Int, hi: Int): Column =
      if (lo > hi) lit((lo).toLong)
      else {
        val mid = (lo + hi) >>> 1
        when(c < cut(mid), tree(c, cut, lo, mid - 1))
          .otherwise(tree(c, cut, mid + 1, hi))
      }
    val b1 = tree(col(c1).cast("double"), cuts(0), 0, cuts(0).length - 1)
    val b2 = tree(col(c2).cast("double"), cuts(1), 0, cuts(1).length - 1)
    writeMorton(df, path, b1, b2, nFiles, bits)
  }
}
