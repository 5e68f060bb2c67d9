package graft.streaming

import org.apache.spark.sql.SparkSession

/** Torn-write-safe persisted counter file — the shared low-level IO
  * behind the maintenance cadences ([[IngestPipeline]]'s
  * `_compact_ctr`, [[Scd2Maintain]]'s `_maintain_ctr`). Format: one
  * line of space-separated longs. Writes go to a `.tmp` sibling and
  * replace the live file with FileContext.rename(OVERWRITE) — the
  * FS-contract atomic replacement (true on HDFS; best-effort
  * single-call on local fs) — so a reader always sees either the old
  * or the new value, never an absent or half-written one (r10 ADVICE
  * #1: the original delete-then-rename had a window with no live file
  * at all). A read of a missing or unparseable file returns None; each
  * caller maps that to its all-zero state and documents the safe-
  * direction consequence (a delayed — never skipped — sweep). */
private[graft] object CtrFile {

  def read(spark: SparkSession, path: String): Option[Array[Long]] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return None
    scala.util.Try {
      val in = fs.open(p)
      val s = try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
        finally in.close()
      s.split("\\s+").map(_.toLong)
    }.toOption
  }

  def write(spark: SparkSession, path: String, vs: Seq[Long]): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new org.apache.hadoop.fs.Path(s"$path.tmp")
    val out = fs.create(tmp, true)
    try out.write(vs.mkString(" ").getBytes("UTF-8")) finally out.close()
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(
      fs.getUri, spark.sparkContext.hadoopConfiguration)
    fc.rename(tmp, p, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    ()
  }
}
