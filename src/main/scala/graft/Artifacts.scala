package graft

import org.apache.spark.sql.DataFrame

/** Registry for the handful of CACHED derived frames the query library
  * shares across queries (normalized embeddings, shingle/posting tables
  * — the "materialized artifact" pattern, see BASELINE.md).
  *
  * Lifecycle (ADVICE r2): `.cache()` alone never unpersists, so a long
  * multi-query session would accumulate every derivation for its
  * lifetime. Every shared cache now registers here and harness mains
  * (Bench, Verify) call `unpersistAll()` when the run finishes.
  *
  * MID-run the caches stay resident on purpose — the four ANN/near-dup
  * queries share ONE normalized-embedding materialization, which is the
  * point — and that reliance is safe: DataFrame.cache() is
  * MEMORY_AND_DISK, so under pressure Spark's BlockManager evicts LRU
  * blocks to disk (or drops them and recomputes) rather than OOM-ing.
  * The registry bounds the tail, not the steady state.
  */
object Artifacts {
  private val registered =
    java.util.Collections.synchronizedList(new java.util.ArrayList[DataFrame]())
  private val memos = scala.collection.concurrent.TrieMap.empty[String, Any]

  /** Cache a shared derived frame and track it for end-of-run release. */
  def shared(df: DataFrame): DataFrame = {
    df.cache()
    registered.add(df)
    df
  }

  /** Memoize a DRIVER-side derived artifact — e.g. the decontamination
    * bloom filter's broadcast — under an explicit key (callers key by
    * session + input dir). Same lifecycle as the cached frames: built
    * once, reused across queries and bench reps, released by
    * unpersistAll. */
  def memo[T](key: String)(build: => T): T =
    memos.getOrElseUpdate(key, build).asInstanceOf[T]

  /** Release every tracked cache (idempotent; safe on dead sessions). */
  def unpersistAll(): Unit = {
    val it = registered.iterator()
    while (it.hasNext) {
      try it.next().unpersist(blocking = false)
      catch { case _: Throwable => () }
    }
    registered.clear()
    memos.clear()
  }
}
