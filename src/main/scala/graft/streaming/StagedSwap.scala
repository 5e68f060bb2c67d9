package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** The staged-rewrite swap idiom shared by every disk store in this
  * package (SnapshotMaintain migrate/resize, Scd2Maintain.compactLog,
  * VectorIndex.compact): a maintenance rewrite lands BESIDE the live
  * directory, then swaps in via delete + rename. The crash contract:
  *
  *  - before the swap: the live store is untouched — abort is free;
  *  - between delete and rename (live gone, stage present): the next
  *    entry point calls `resume` and completes the rename — the
  *    window self-heals with no operator action.
  *
  * ONE implementation because the sequence is crash-safety-critical:
  * the three stores previously carried near-identical copies, and an
  * entry point probing existence BEFORE resuming (the drift this
  * invites) silently no-ops on a mid-swap store. */
private[streaming] object StagedSwap {

  private def fsOf(spark: SparkSession, path: String) =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Delete any stale stage left by an earlier aborted rewrite (a
    * crash BEFORE the swap — the live store is still authoritative). */
  def clearStale(spark: SparkSession, stage: String): Unit = {
    val fs = fsOf(spark, stage)
    val p = new Path(stage)
    if (fs.exists(p)) fs.delete(p, true)
    ()
  }

  /** Swap a completed stage into place: delete live, rename stage. */
  def commit(spark: SparkSession, live: String, stage: String): Unit = {
    val fs = fsOf(spark, live)
    fs.delete(new Path(live), true)
    fs.rename(new Path(stage), new Path(live))
    ()
  }

  /** Complete an interrupted swap: if live is MISSING and one of the
    * candidate stages exists, rename it into place. Returns true when
    * a swap was completed. Safe to probe on every batch — two
    * existence checks when nothing is pending. MUST run before any
    * live-dir existence probe in an entry point: checking existence
    * first silently no-ops on a mid-swap store. */
  def resume(spark: SparkSession, live: String,
      stages: Seq[String]): Boolean = {
    val fs = fsOf(spark, live)
    val livePath = new Path(live)
    if (fs.exists(livePath)) return false
    stages.exists { s =>
      val stage = new Path(s)
      fs.exists(stage) && fs.rename(stage, livePath)
    }
  }
}
